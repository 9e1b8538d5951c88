"""INT8-KV decode-path quality (r5): the serving default's price tag.

Serving r5 defaults to the INT8 flat KV cache + flash-decode v2 (6.2 ms
b=8 step vs 9.1 einsum-bf16, diag_serve5) — this script measures what
that costs in QUALITY, on the decode path the serving engine actually
runs (prefill-style perplexity never reads quantized cache rows, so
eval.perplexity cannot see KV quantization at all).

Teacher-forced decode scoring: the held-out half of the ppl-chain corpus
is split into chunks; every chunk decodes token-by-token through a real
KV cache (positions advancing, batched over chunks), and the per-step
logits score the next token. Caches compared:

  f32 head-major (exact reference) | bf16 flat + flash-decode v2 |
  int8 flat + flash-decode v2 (in-kernel dequant)

Reports decode-path ppl + dppl and per-step argmax agreement vs f32.
Uses the trained GGUF from scripts/ppl_chain.py (seed 0; set KVQ_GGUF to
point elsewhere) so the weights are realistic, and appends the table to
docs/PPL_CHAIN.md.

Run: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/kv_quality.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo/")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, flush=True)


def main():
    from gen_corpus import make_text

    from ggmlsharp_tpu.io.gguf import GGUFReader, load_gguf_llama
    from ggmlsharp_tpu.io.tokenizer import from_gguf
    from ggmlsharp_tpu.models import kv_cache as kvc, llama

    t0 = time.time()
    path = os.environ.get("KVQ_GGUF", "/tmp/ppl_chain_s0.gguf")
    if not os.path.exists(path):
        log(f"{path} missing — run scripts/ppl_chain.py first")
        sys.exit(1)
    cfg, params = load_gguf_llama(path)
    params = jax.tree.map(jnp.asarray, params)
    tk = from_gguf(GGUFReader(path))
    n_sent = int(os.environ.get("PPL_SENT", "3000"))
    text = make_text(n_sent, seed=20260820)
    ids = np.asarray(tk.encode(text), np.int32)
    heldout = ids[len(ids) // 3 :]  # ppl_chain trains on the first third

    S = 128
    B = min(int(os.environ.get("KVQ_CHUNKS", "96")),
            (len(heldout) - 1) // S)
    X = heldout[: B * S].reshape(B, S)
    Y = heldout[1 : B * S + 1].reshape(B, S)
    log(f"model {cfg.n_layer}L/{cfg.n_embd}E vocab={cfg.n_vocab}; "
        f"decode-scoring {B} chunks x {S} tokens")

    def step_fn():
        @jax.jit
        def step(params, tok, cache, pos):
            logits, cache = llama.forward(params, cfg, tok, cache,
                                          pos[:, None])
            return logits[:, -1, :], cache

        return step

    def run(name, dtype, int8, flat):
        cache = kvc.init_cache(cfg.n_layer, B, cfg.n_head_kv, S,
                               cfg.head_dim, dtype=dtype, int8=int8,
                               flat=flat)
        step = step_fn()
        nll_sum, n = 0.0, 0
        agree = []
        tops = []
        toks = jnp.asarray(X)
        for t in range(S - 1):
            pos = jnp.full((B,), t, jnp.int32)
            logits, cache = step(params, toks[:, t : t + 1], cache, pos)
            lg = np.asarray(logits, np.float32)
            lg = lg - lg.max(-1, keepdims=True)
            lse = np.log(np.exp(lg).sum(-1))
            tgt = Y[:, t]
            nll_sum += float((lse - lg[np.arange(B), tgt]).sum())
            n += B
            tops.append(lg.argmax(-1))
        ppl = float(np.exp(nll_sum / n))
        log(f"[{name}] decode-path ppl={ppl:.4f} ({n} scored) "
            f"at t={time.time()-t0:.0f}s")
        return ppl, np.stack(tops)

    rows = []
    ppl_f32, top_ref = run("f32 head-major", jnp.float32, False, False)
    rows.append(("f32 head-major (ref)", ppl_f32, 0.0, 1.0))
    for name, dtype, int8 in [("bf16 flat flash-v2", jnp.bfloat16, False),
                              ("int8 flat flash-v2", jnp.bfloat16, True)]:
        ppl, top = run(name, dtype, int8, True)
        ag = float((top == top_ref).mean())
        rows.append((name, ppl, ppl - ppl_f32, ag))
        log(f"[{name}] dppl={ppl-ppl_f32:+.4f} argmax-agree={ag:.4f}")

    here = os.path.dirname(os.path.abspath(__file__))
    doc = os.path.join(here, "..", "docs", "PPL_CHAIN.md")
    with open(doc, "a") as fh:
        fh.write(
            "\n## KV-cache quality on the DECODE path "
            "(scripts/kv_quality.py)\n\n"
            "Teacher-forced decode scoring of the held-out half through a "
            "real KV cache\n(batched chunks, one token per step — the "
            "path the serving engine runs; the\nprefill-style table above "
            "never reads quantized cache rows). fp32 weights\n(seed-0 "
            "chain model); cache is the only variable.\n\n"
            "| Cache | decode ppl | dppl vs f32 | argmax agree |\n"
            "|---|---|---|---|\n")
        for name, p, d, ag in rows:
            fh.write(f"| {name} | {p:.4f} | {d:+.4f} | {ag:.4f} |\n")
        fh.write(
            "\nThe int8 row is the r5 serving default "
            "(`Engine(int8_kv=...)` <- `GGML_TPU_INT8_KV`; bench serve "
            "discloses `kv=` in its metric).\n")
    log(f"appended KV table to {doc}")


if __name__ == "__main__":
    main()
