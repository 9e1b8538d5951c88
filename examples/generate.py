"""Greedy/temperature text generation with a quantized model.

    python examples/generate.py [--model gpt2-124m] [--format q8_0] \
        [--tokens 64] [--gguf path.gguf] [--hf path.safetensors]

Without --gguf/--hf, uses random weights (demonstrates the pipeline; output
tokens are meaningless).
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
    ap.add_argument("--model", default="gpt2-124m")
    ap.add_argument("--format", default="q8_0")
    ap.add_argument("--tokens", type=int, default=32)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--gguf")
    ap.add_argument("--hf")
    args = ap.parse_args()

    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.models import gpt2, llama, sampling

    gt = GType[args.format.upper()]
    if args.gguf:
        from ggmlsharp_tpu.io.gguf import load_gguf_llama

        cfg, params = load_gguf_llama(args.gguf)
        params = jax.tree.map(jnp.asarray, params)
        mod = llama
    elif args.hf:
        from ggmlsharp_tpu.io.hf import load_hf_gpt2

        cfg, params = load_hf_gpt2(args.hf)
        params = gpt2.quantize_params(jax.tree.map(jnp.asarray, params), gt)
        mod = gpt2
    else:
        mod, cfg = {
            "gpt2-124m": (gpt2, gpt2.GPT2_124M),
            "llama-7b": (llama, llama.LLAMA_7B),
        }[args.model]
        params = mod.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        params = jax.jit(lambda p: mod.quantize_params(p, gt))(params)

    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cache = mod.new_cache(cfg, 1)
    toks, _ = sampling.generate(
        mod.forward, cfg, params, prompt, cache, args.tokens,
        temperature=args.temperature, top_k=40,
        rng=jax.random.PRNGKey(1) if args.temperature > 0 else None,
    )
    print("generated token ids:", np.asarray(toks)[0].tolist())


if __name__ == "__main__":
    main()
