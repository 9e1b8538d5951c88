"""Shared model building blocks (dense/quantized linear, cached attention).

The reference has no model layer at all (SURVEY §1: "no model layer, no
file/checkpoint format, no CLI"); these are the TPU-native blocks GPT-2 and
Llama are assembled from. Weights may be jnp arrays (f32/bf16/f16) or
QTensor block-quantized planes — `ops.mul_mat` dispatches, and the fused
Pallas dequant-matmul kernel picks up QTensor weights on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import ops
from ..quant.formats import QTensor
from . import kv_cache as kvc


def linear(w, x, b=None, quantize_acts: bool = True):
    """y = x·wᵀ (+ b). w: [n_out, k] array or QTensor; x: [..., k].

    quantize_acts defaults True: ggml quantizes activations into the weight
    format's companion Q8 type before every quantized matmul (the INIT-phase
    trick) — required for perplexity parity, and what routes b=1 decode onto
    the exact integer-dot kernel."""
    if isinstance(w, QTensor):
        y = ops.mul_mat(w, x, quantize_acts=quantize_acts)
    else:
        y = ops.mul_mat_f(w, x)
    if b is not None:
        y = y + b
    return y


def split_heads(x, n_head):
    """[B, S, H*D] → [B, H, S, D]"""
    B, S, HD = x.shape
    return x.reshape(B, S, n_head, HD // n_head).transpose(0, 2, 1, 3)


def merge_heads(x):
    """[B, H, S, D] → [B, S, H*D]"""
    B, H, S, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * D)


def cached_attention(q, k_new, v_new, cache, layer, positions,
                     n_rep: int = 1, attn_softcap: float | None = None):
    """Causal attention against the full KV cache for one layer.

    q, k_new, v_new: [B, H(q|kv), S, D]; positions: int32 [B, S] absolute
    positions of the S new tokens. Writes k/v into the cache, then attends
    q over all cached positions with the mask kpos ≤ qpos. Returns
    ([B, Hq, S, D], cache).
    """
    cache = kvc.update_layer(cache, layer, k_new, v_new, positions)
    k_all, v_all = kvc.read_layer(cache, layer, compute_dtype=q.dtype)
    if n_rep > 1:  # GQA: repeat kv heads to match q heads
        k_all = jnp.repeat(k_all, n_rep, axis=1)
        v_all = jnp.repeat(v_all, n_rep, axis=1)

    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum(
        "bhsd,bhtd->bhst", q, k_all, preferred_element_type=jnp.float32
    ) * scale
    if attn_softcap:
        scores = jnp.tanh(scores / attn_softcap) * attn_softcap
    T = k_all.shape[2]
    kpos = jnp.arange(T, dtype=jnp.int32)
    mask = kpos[None, None, None, :] <= positions[:, None, :, None]  # [B,1,S,T]
    scores = jnp.where(mask, scores, ops.attention.NEG_INF)
    p = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
    out = jnp.einsum("bhst,bhtd->bhsd", p, v_all,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out, cache
