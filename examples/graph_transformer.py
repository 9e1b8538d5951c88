"""A transformer decoder built PURELY through the ggml-style graph API.

The reference declares GET_ROWS/DIAG_MASK_INF/SOFT_MAX/ROPE in its op enum
but stubs them all (SURVEY §2.6), so a GGMLSharp user could never express
attention. Here they are first-class graph builders: this example builds a
2-layer GPT-style decoder as a ggml expression DAG (build once → set leaf
data → Graph.compute, the Test1 "re-run with new inputs" workflow) and
greedy-decodes a few tokens by recomputing the fixed-window graph.

    python examples/graph_transformer.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

import numpy as np
import jax
import jax.numpy as jnp


def build_model(rng, V=96, S=16, E=32, H=4, L=2):
    """Returns (token_leaf, n_past_is_static_graph, logits_node, params)."""
    from ggmlsharp_tpu.graph import Graph, build_forward, leaf
    from ggmlsharp_tpu.graph import builders as B

    ks = iter(jax.random.split(rng, 4 + 8 * L))
    w = lambda *shape: leaf(
        jax.random.normal(next(ks), shape, jnp.float32) * 0.08)

    tok = leaf(jnp.zeros((S,), jnp.int32), name="tokens")
    wte = w(V, E)
    x = B.get_rows(wte, tok)  # [S, E]
    hd = E // H
    for _ in range(L):
        h = B.rms_norm(x)
        q = B.reshape(B.mul_mat(w(E, E), h), (S, H, hd))
        k = B.reshape(B.mul_mat(w(E, E), h), (S, H, hd))
        v = B.reshape(B.mul_mat(w(E, E), h), (S, H, hd))
        # [S, H, hd] -> [H, S, hd], rope over positions 0..S-1
        q = B.rope(B.permute(q, (1, 0, 2)), 0)
        k = B.rope(B.permute(k, (1, 0, 2)), 0)
        v = B.permute(v, (1, 0, 2))
        att = B.scale_const(
            B.mul_mat(k, q), 1.0 / float(np.sqrt(hd)))  # [H, S, S]
        att = B.soft_max(B.diag_mask_inf(att, 0))
        o = B.mul_mat(B.cont(B.transpose(v)), att)  # [H, S, hd]
        o = B.reshape(B.cont(B.permute(o, (1, 0, 2))), (S, E))
        x = B.add(x, B.mul_mat(w(E, E), o))
        h2 = B.rms_norm(x)
        x = B.add(x, B.mul_mat(w(E, 4 * E), B.gelu(B.mul_mat(w(4 * E, E), h2))))
    logits = B.mul_mat(wte, B.rms_norm(x))  # [S, V] tied head
    return tok, build_forward(logits), logits


def main():
    from ggmlsharp_tpu.graph import set_data

    rng = jax.random.PRNGKey(0)
    S = 16
    tok, graph, logits = build_model(rng, S=S)

    prompt = [5, 17, 33]
    toks = list(prompt)
    for _ in range(8):
        padded = np.zeros((S,), np.int32)
        padded[: len(toks)] = toks[-S:]
        set_data(tok, padded)
        graph.compute()
        row = np.asarray(logits.data)[min(len(toks), S) - 1]
        toks.append(int(row.argmax()))
    print("graph-API transformer greedy decode:", toks[len(prompt):])


if __name__ == "__main__":
    main()
