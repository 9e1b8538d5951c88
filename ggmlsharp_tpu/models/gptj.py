"""GPT-J family: parallel-residual decoder with partial rotary embeddings.

The ggml ecosystem the reference snapshots (upstream ggml's flagship
examples in the May-2023 llama.cpp era) shipped GPT-J alongside GPT-2; it
is architecturally distinct from both families here: ONE pre-LayerNorm per
block feeds attention AND the MLP in parallel (x + attn(h) + mlp(h) — a
single residual join per block), rotary embeddings cover only the first
`rotary_dim` head dims (interleaved GPT-J convention = ops.rope mode 0,
exactly the reference era's "rope"), attention projections carry no bias,
the MLP and LM head do. Weights may be dense arrays or QTensor planes.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import ops
from ..dtypes import GType
from ..quant.formats import QTensor
from ..quant.quantize import quantize
from . import kv_cache as kvc
from .common import cached_attention, linear, merge_heads, split_heads
from .gpt2 import _layer_norm


@dataclass(frozen=True)
class GPTJConfig:
    n_vocab: int = 50400
    n_ctx: int = 2048
    n_embd: int = 4096
    n_head: int = 16
    n_layer: int = 28
    rotary_dim: int = 64  # rotary over the first dims of each head only
    ln_eps: float = 1e-5

    @property
    def head_dim(self):
        return self.n_embd // self.n_head

    @property
    def n_head_kv(self):  # no GQA in the family; engine/cache helpers read it
        return self.n_head

    @property
    def n_ff(self):
        return 4 * self.n_embd


GPTJ_6B = GPTJConfig()
TINY_GPTJ = GPTJConfig(n_vocab=128, n_ctx=64, n_embd=64, n_head=4,
                       n_layer=2, rotary_dim=8)


def init_params(rng, cfg: GPTJConfig, dtype=jnp.bfloat16):
    ks = jax.random.split(rng, 3 + cfg.n_layer)
    sd = 0.02

    def w(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * sd).astype(dtype)

    blocks = []
    for i in range(cfg.n_layer):
        sub = jax.random.split(ks[3 + i], 6)
        blocks.append({
            "ln_1": {"g": jnp.ones((cfg.n_embd,), dtype),
                     "b": jnp.zeros((cfg.n_embd,), dtype)},
            "attn": {
                "wq": w(sub[0], cfg.n_embd, cfg.n_embd),
                "wk": w(sub[1], cfg.n_embd, cfg.n_embd),
                "wv": w(sub[2], cfg.n_embd, cfg.n_embd),
                "wo": w(sub[3], cfg.n_embd, cfg.n_embd),
            },
            "mlp": {
                "fc_in_w": w(sub[4], cfg.n_ff, cfg.n_embd),
                "fc_in_b": jnp.zeros((cfg.n_ff,), dtype),
                "fc_out_w": w(sub[5], cfg.n_embd, cfg.n_ff),
                "fc_out_b": jnp.zeros((cfg.n_embd,), dtype),
            },
        })
    return {
        "wte": w(ks[0], cfg.n_vocab, cfg.n_embd),
        "ln_f": {"g": jnp.ones((cfg.n_embd,), dtype),
                 "b": jnp.zeros((cfg.n_embd,), dtype)},
        "lm_head": {"w": w(ks[1], cfg.n_vocab, cfg.n_embd),
                    "b": jnp.zeros((cfg.n_vocab,), dtype)},
        "blocks": blocks,
    }


def quantize_params(params, gtype: GType, min_cols: int = 256,
                    search: bool = False, swar: bool | None = None):
    """Weight-only quantization of every matmul weight; biases/layernorms
    stay float (llama.cpp policy). wte stays row-layout (get_rows)."""
    from .llama import _swar_default
    from ..quant.formats import swar_supported, to_swar

    use_swar = swar if swar is not None else _swar_default()

    def q(t, allow_swar=True):
        if isinstance(t, QTensor) or t.ndim != 2 or t.shape[-1] % 256 \
                or t.shape[-1] < min_cols:
            return t
        qt = quantize(jnp.asarray(t, jnp.float32), gtype, search=search)
        if allow_swar and use_swar and swar_supported(qt):
            qt = to_swar(qt)
        return qt

    blocks = []
    for blk in params["blocks"]:
        blocks.append({
            "ln_1": blk["ln_1"],
            "attn": {k: q(v) for k, v in blk["attn"].items()},
            "mlp": {
                "fc_in_w": q(blk["mlp"]["fc_in_w"]),
                "fc_in_b": blk["mlp"]["fc_in_b"],
                "fc_out_w": q(blk["mlp"]["fc_out_w"]),
                "fc_out_b": blk["mlp"]["fc_out_b"],
            },
        })
    return {
        "wte": q(params["wte"], allow_swar=False),
        "ln_f": params["ln_f"],
        "lm_head": {"w": q(params["lm_head"]["w"], allow_swar=use_swar),
                    "b": params["lm_head"]["b"]},
        "blocks": blocks,
    }


def forward(params, cfg: GPTJConfig, tokens, cache: kvc.KVCache, positions,
            prefix_bound: int | None = None,
            cached_prefix: bool | None = None):
    """tokens/positions: int32 [B, S]. Returns (logits f32 [B,S,V], cache).
    Head-major cache only (cached_prefix accepted for engine-signature
    compatibility; the flat wire-order fast path is a GPT-2/llama
    specialization)."""
    del cached_prefix
    x = ops.get_rows(params["wte"], tokens)
    compute_dtype = params["ln_f"]["g"].dtype
    x = x.astype(compute_dtype)

    rot = lambda t: jax.vmap(  # per batch row (positions differ per slot)
        lambda tb, pb: ops.rope(tb, pb, n_dims=cfg.rotary_dim, mode=0),
        in_axes=(0, 0),
    )(t, positions)

    for i, blk in enumerate(params["blocks"]):
        h = _layer_norm(x, blk["ln_1"]["g"], blk["ln_1"]["b"], cfg.ln_eps)
        q = rot(split_heads(linear(blk["attn"]["wq"], h), cfg.n_head))
        k = rot(split_heads(linear(blk["attn"]["wk"], h), cfg.n_head))
        v = split_heads(linear(blk["attn"]["wv"], h), cfg.n_head)
        a, cache = cached_attention(q, k, v, cache, i, positions,
                                    prefix_bound=prefix_bound)
        attn_out = linear(blk["attn"]["wo"], merge_heads(a))
        mlp_out = linear(
            blk["mlp"]["fc_out_w"],
            ops.gelu(linear(blk["mlp"]["fc_in_w"], h,
                            blk["mlp"]["fc_in_b"])),
            blk["mlp"]["fc_out_b"])
        # parallel residual: one join per block
        x = x + attn_out.astype(x.dtype) + mlp_out.astype(x.dtype)

    x = _layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], cfg.ln_eps)
    logits = linear(params["lm_head"]["w"], x, params["lm_head"]["b"])
    return logits.astype(jnp.float32), kvc.advance(cache, tokens.shape[1])


def new_cache(cfg: GPTJConfig, batch: int, dtype=jnp.bfloat16, int8=False,
              max_len: int | None = None, flat: bool | None = None):
    del flat  # head-major only
    return kvc.init_cache(cfg.n_layer, batch, cfg.n_head,
                          max_len or cfg.n_ctx, cfg.head_dim,
                          dtype=dtype, int8=int8)
