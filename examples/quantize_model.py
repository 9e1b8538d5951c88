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
    from ggmlsharp_tpu.io.gguf import GGUFWriter
    from ggmlsharp_tpu.models import llama
    from ggmlsharp_tpu.quant.formats import QTensor

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

    w = GGUFWriter()
    w.add_meta("general.architecture", 8, "llama")
    for key, t, v in [("block_count", 4, cfg.n_layer),
                      ("context_length", 4, cfg.n_ctx),
                      ("embedding_length", 4, cfg.n_embd),
                      ("attention.head_count", 4, cfg.n_head),
                      ("attention.head_count_kv", 4, cfg.n_head_kv),
                      ("feed_forward_length", 4, cfg.n_ff)]:
        w.add_meta(f"llama.{key}", t, v)

    def np_of(x):
        if isinstance(x, QTensor):
            return QTensor(x.gtype, x.shape,
                           {k: np.asarray(v) for k, v in x.planes.items()})
        return np.asarray(x, np.float32)

    names = [("token_embd.weight", qparams["tok_embd"]),
             ("output_norm.weight", qparams["norm"])]
    if qparams["output"] is not None:
        names.append(("output.weight", qparams["output"]))
    for i, b in enumerate(qparams["blocks"]):
        for nm, key in [("attn_norm", "attn_norm"), ("attn_q", "wq"),
                        ("attn_k", "wk"), ("attn_v", "wv"),
                        ("attn_output", "wo"), ("ffn_norm", "ffn_norm"),
                        ("ffn_gate", "w_gate"), ("ffn_up", "w_up"),
                        ("ffn_down", "w_down")]:
            names.append((f"blk.{i}.{nm}.weight", b[key]))
    for name, t in names:
        w.add_tensor(name, np_of(t))
    w.write(args.out)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.2f} MB, {gt.name})")


if __name__ == "__main__":
    main()
