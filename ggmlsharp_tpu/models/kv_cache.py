"""KV cache: static-shape ring of attention keys/values, fp16/bf16 or INT8.

The reference has no KV cache (no attention at all — SURVEY §2.6); BASELINE
config 3 requires an INT8 cache. Design:

  * static [layers, 2, batch, n_head_kv, n_ctx, head_dim] buffers — XLA needs
    static shapes; `length` masks the live prefix (continuous batching keeps
    per-slot lengths, see ggmlsharp_tpu.serving).
  * INT8 mode stores per-(token, head) absmax scales alongside int8 lanes:
    q = round(x * 127 / amax), dequantized inside attention. The scale
    granularity matches one cache row (a head_dim vector), the same shape
    ggml's Q8_0 would give at head_dim ≤ 32·k.
  * functional updates (`.at[...].set`) + donation at the jit boundary make
    the update in-place on TPU.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: jnp.ndarray  # [L, B, H_kv, T, D] (storage dtype or int8)
    v: jnp.ndarray
    k_scale: jnp.ndarray | None  # [L, B, H_kv, T, 1] f32, int8 mode only
    v_scale: jnp.ndarray | None
    length: jnp.ndarray  # [B] int32 — tokens filled per batch slot

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def int8(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def init_cache(n_layer, batch, n_head_kv, n_ctx, head_dim,
               dtype=jnp.bfloat16, int8: bool = False) -> KVCache:
    shape = (n_layer, batch, n_head_kv, n_ctx, head_dim)
    # k/v (and scales) must be DISTINCT buffers — aliased zeros break
    # donation ("attempt to donate the same buffer twice")
    if int8:
        sshape = (n_layer, batch, n_head_kv, n_ctx, 1)
        return KVCache(
            jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32),
            jnp.zeros((batch,), jnp.int32),
        )
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   None, None, jnp.zeros((batch,), jnp.int32))


def _quant_rows(x):
    """[..., D] → int8 values + f32 scale per row (absmax/127)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
    return q, scale


def update_layer(cache: KVCache, layer: int, k_new, v_new, positions) -> KVCache:
    """Write new K/V rows at `positions` (int32 [B, S]) for one layer.

    k_new/v_new: [B, H_kv, S, D]. Positions must be CONTIGUOUS per batch row
    (positions[b] = start_b + arange(S), which prefill/decode guarantee) —
    the write is then a per-batch dynamic_update_slice, which XLA performs
    in-place; a general 4-D scatter here costs ~50x on TPU decode."""
    B, H, S, D = k_new.shape

    def scatter(buf, rows):
        # buf: [B, H, T, D]; rows: [B, H, S, D]; start = positions[:, 0]
        def upd(buf_b, rows_b, start_b):
            return jax.lax.dynamic_update_slice(
                buf_b, rows_b.astype(buf_b.dtype), (0, start_b, 0)
            )

        return jax.vmap(upd)(buf, rows, positions[:, 0])

    if cache.int8:
        kq, ks = _quant_rows(k_new)
        vq, vs = _quant_rows(v_new)
        k = cache.k.at[layer].set(scatter(cache.k[layer], kq))
        v = cache.v.at[layer].set(scatter(cache.v[layer], vq))
        k_scale = cache.k_scale.at[layer].set(scatter(cache.k_scale[layer], ks))
        v_scale = cache.v_scale.at[layer].set(scatter(cache.v_scale[layer], vs))
        return KVCache(k, v, k_scale, v_scale, cache.length)
    k = cache.k.at[layer].set(scatter(cache.k[layer], k_new))
    v = cache.v.at[layer].set(scatter(cache.v[layer], v_new))
    return KVCache(k, v, None, None, cache.length)


def read_layer(cache: KVCache, layer: int, compute_dtype=jnp.float32):
    """Return dequantized K, V for a layer: [B, H_kv, T, D]."""
    if cache.int8:
        k = cache.k[layer].astype(jnp.float32) * cache.k_scale[layer]
        v = cache.v[layer].astype(jnp.float32) * cache.v_scale[layer]
        return k.astype(compute_dtype), v.astype(compute_dtype)
    return (cache.k[layer].astype(compute_dtype),
            cache.v[layer].astype(compute_dtype))


def advance(cache: KVCache, n: int | jnp.ndarray) -> KVCache:
    return KVCache(cache.k, cache.v, cache.k_scale, cache.v_scale,
                   cache.length + n)
