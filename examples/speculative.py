"""Speculative decoding: a small draft model accelerates a larger target
with bit-identical greedy output (models/speculative.py).

    python examples/speculative.py [--tokens 48] [--k 4] \
        [--target-gguf big.gguf] [--draft-gguf small.gguf]

Without GGUFs this runs two random tiny models (same vocab): the machinery
— draft chain, one-forward verification, per-slot accept counts, O(1)
cache rollback — is demonstrated, but random drafts rarely agree with a
random target, so the amortization factor stays near 1. With a real
draft/target pair (e.g. TinyLlama drafting Llama-7B) acceptance typically
amortizes each full weight read over 2-4 tokens.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=48)
    ap.add_argument("--k", type=int, default=4, help="draft tokens per round")
    ap.add_argument("--target-gguf")
    ap.add_argument("--draft-gguf")
    args = ap.parse_args()

    from ggmlsharp_tpu.models import llama, sampling
    from ggmlsharp_tpu.models.speculative import speculative_generate

    if args.target_gguf:
        from ggmlsharp_tpu.io.gguf import load_gguf_llama

        tcfg, tp = load_gguf_llama(args.target_gguf)
        dcfg, dp = load_gguf_llama(args.draft_gguf or args.target_gguf)
    else:
        tcfg = dcfg = llama.TINY_LLAMA
        tp = llama.init_params(jax.random.PRNGKey(0), tcfg, jnp.float32)
        dp = llama.init_params(jax.random.PRNGKey(1), dcfg, jnp.float32)

    prompt = jnp.asarray([[1, 12, 7, 99, 4, 25]], jnp.int32)

    ref, _ = sampling.generate(
        llama.forward, tcfg, tp, prompt,
        llama.new_cache(tcfg, 1, dtype=jnp.float32), args.tokens)
    toks, rate = speculative_generate(
        llama.forward, tcfg, tp, llama.forward, dcfg, dp, prompt,
        llama.new_cache(tcfg, 1, dtype=jnp.float32),
        llama.new_cache(dcfg, 1, dtype=jnp.float32), args.tokens, k=args.k)

    exact = np.array_equal(np.asarray(toks), np.asarray(ref))
    print(f"tokens: {np.asarray(toks)[0].tolist()}")
    print(f"greedy-exact vs target-only decode: {exact}")
    print(f"amortization: {rate:.2f} tokens emitted per target dispatch "
          f"(max {args.k + 1})")
    assert exact


if __name__ == "__main__":
    main()
