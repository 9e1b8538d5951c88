"""Quantize a model and export it as a llama.cpp-compatible GGUF.

    python examples/quantize_model.py --out /tmp/model-q4_0.gguf \
        [--format q4_0] [--hf path.safetensors]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--format", default="q4_0")
    ap.add_argument("--hf", help="HF llama safetensors path (else tiny random)")
    args = ap.parse_args()

    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.io.gguf import save_gguf_llama
    from ggmlsharp_tpu.models import llama

    gt = GType[args.format.upper()]
    if args.hf:
        from ggmlsharp_tpu.io.hf import load_hf_llama

        cfg, params = load_hf_llama(args.hf)
        params = jax.tree.map(jnp.asarray, params)
    else:
        cfg = llama.LlamaConfig(n_vocab=512, n_ctx=128, n_embd=256, n_head=8,
                                n_head_kv=4, n_layer=2, n_ff=512)
        params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = jax.jit(
        lambda p: llama.quantize_params(p, gt, pad_rows_to=0, fuse=False)
    )(params)

    save_gguf_llama(args.out, cfg, qparams)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.2f} MB, {gt.name})")


if __name__ == "__main__":
    main()
