"""KV cache: static-shape ring of attention keys/values, fp16/bf16 or INT8.

The reference has no KV cache (no attention at all — SURVEY §2.6); BASELINE
config 3 requires an INT8 cache. Design:

  * **per-layer buffers** (tuples of [B, H_kv, T, D]), NOT one stacked
    [L, B, H_kv, T, D] array: profiling the stacked form showed XLA
    ping-ponging the whole stack between two tile layouts every decode step
    (the layer-indexed dynamic-update-slice fusion and the attention einsum
    prefer different layouts) — ~42 ms/step of pure copies on a 7B cache.
    Separate buffers give XLA one layout per buffer and make each update
    touch only its own layer.
  * static T with `length` masking the live prefix (continuous batching
    keeps per-slot lengths, see ggmlsharp_tpu.serving).
  * INT8 mode stores per-(token, head) absmax scales alongside int8 lanes.
  * functional updates (per-batch dynamic_update_slice) + donation at the
    jit boundary make the update in-place on TPU.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: tuple  # L × [B, H_kv, T, D] (storage dtype or int8)
    v: tuple
    k_scale: tuple | None  # L × [B, H_kv, T, 1] f32, int8 mode only
    v_scale: tuple | None
    length: jnp.ndarray  # [B] int32 — tokens filled per batch slot

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.length), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def int8(self) -> bool:
        return self.k[0].dtype == jnp.int8

    @property
    def n_layer(self) -> int:
        return len(self.k)

    @property
    def batch(self) -> int:
        return self.k[0].shape[0]

    @property
    def max_len(self) -> int:
        # flat wire-order caches are [B, T, E]; head caches [B, H, T, D]
        return self.k[0].shape[1 if self.k[0].ndim == 3 else 2]


def init_cache(n_layer, batch, n_head_kv, n_ctx, head_dim,
               dtype=jnp.bfloat16, int8: bool = False,
               flat: bool = False) -> KVCache:
    """flat=True: per-layer [B, T, H·D] buffers holding WIRE-ORDER rows for
    the whole-layer decode megakernel (kernels.gpt2_layer) — one dynamic
    row write per step, no head axis. Mutually exclusive with int8."""
    if flat:
        fshape = (batch, n_ctx, n_head_kv * head_dim)
        if int8:
            sshape = (batch, n_ctx, n_head_kv)  # per (token, head) scales
            return KVCache(
                tuple(jnp.zeros(fshape, jnp.int8) for _ in range(n_layer)),
                tuple(jnp.zeros(fshape, jnp.int8) for _ in range(n_layer)),
                tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n_layer)),
                tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n_layer)),
                jnp.zeros((batch,), jnp.int32),
            )
        return KVCache(
            tuple(jnp.zeros(fshape, dtype) for _ in range(n_layer)),
            tuple(jnp.zeros(fshape, dtype) for _ in range(n_layer)),
            None, None, jnp.zeros((batch,), jnp.int32),
        )
    shape = (batch, n_head_kv, n_ctx, head_dim)
    # distinct buffers per layer and per k/v — aliased zeros break donation
    if int8:
        sshape = (batch, n_head_kv, n_ctx, 1)
        return KVCache(
            tuple(jnp.zeros(shape, jnp.int8) for _ in range(n_layer)),
            tuple(jnp.zeros(shape, jnp.int8) for _ in range(n_layer)),
            tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n_layer)),
            tuple(jnp.zeros(sshape, jnp.float32) for _ in range(n_layer)),
            jnp.zeros((batch,), jnp.int32),
        )
    return KVCache(
        tuple(jnp.zeros(shape, dtype) for _ in range(n_layer)),
        tuple(jnp.zeros(shape, dtype) for _ in range(n_layer)),
        None, None, jnp.zeros((batch,), jnp.int32),
    )


def _quant_rows(x):
    """[..., D] → int8 values + f32 scale per row (absmax/127)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
    return q, scale


def _replace(t: tuple, i: int, v):
    return t[:i] + (v,) + t[i + 1 :]


def _unroll_writes(buf) -> bool:
    """Pick the per-slot write formulation for this buffer.

    UNROLLED chain of B plain DUS ops (static batch index, traced row
    start): 0.45 ms per 32-layer step at B=8 on v5e, allocation-size
    independent — the fast path (scripts/diag_kv.py r4). vmap'd per-batch
    DUS: lowers to a batched select costing 1.94 ms/step, but is the only
    form XLA compiles cleanly when the cache pushes HBM occupancy (at
    max_len=2048 x 8 slots x 7B the unrolled chain makes the multi-step
    while_loop flip cache layouts — 4x-padded 512 MB remat copies per
    buffer, compile-time OOM). Auto: unroll iff the buffer is under 64 MB;
    GGML_TPU_KV_UNROLL=1|0 forces."""
    env = os.environ.get("GGML_TPU_KV_UNROLL")
    if env is not None:
        return env == "1"
    return buf.size * buf.dtype.itemsize <= 64 * 1024 * 1024


def _write_rows(buf, rows, positions):
    """buf [B, H, T, D]; rows [B, H, S, D]; positions int32 [B, S] CONTIGUOUS
    per batch row → unrolled per-slot DUS chain or vmap'd per-batch DUS
    (see _unroll_writes for the measured tradeoff)."""
    B = buf.shape[0]
    starts = positions[:, 0]
    rows = rows.astype(buf.dtype)
    if B == 1:
        return jax.lax.dynamic_update_slice(
            buf, rows, (0, 0, starts[0], 0))
    if _unroll_writes(buf):
        for b in range(B):
            buf = jax.lax.dynamic_update_slice(
                buf, jax.lax.dynamic_slice_in_dim(rows, b, 1, axis=0),
                (b, 0, starts[b], 0))
        return buf

    def upd(buf_b, rows_b, start_b):
        return jax.lax.dynamic_update_slice(buf_b, rows_b, (0, start_b, 0))

    return jax.vmap(upd)(buf, rows, starts)


def update_layer(cache: KVCache, layer: int, k_new, v_new, positions) -> KVCache:
    """Write new K/V rows at `positions` (int32 [B, S]) for one layer.
    k_new/v_new: [B, H_kv, S, D]. Returns the updated cache (functional)."""
    if cache.int8:
        kq, ks = _quant_rows(k_new)
        vq, vs = _quant_rows(v_new)
        return KVCache(
            _replace(cache.k, layer, _write_rows(cache.k[layer], kq, positions)),
            _replace(cache.v, layer, _write_rows(cache.v[layer], vq, positions)),
            _replace(cache.k_scale, layer,
                     _write_rows(cache.k_scale[layer], ks, positions)),
            _replace(cache.v_scale, layer,
                     _write_rows(cache.v_scale[layer], vs, positions)),
            cache.length,
        )
    return KVCache(
        _replace(cache.k, layer, _write_rows(cache.k[layer], k_new, positions)),
        _replace(cache.v, layer, _write_rows(cache.v[layer], v_new, positions)),
        None, None, cache.length,
    )


def read_layer(cache: KVCache, layer: int, compute_dtype=jnp.float32):
    """Return dequantized K, V for a layer: [B, H_kv, T, D]."""
    if cache.int8:
        k = cache.k[layer].astype(jnp.float32) * cache.k_scale[layer]
        v = cache.v[layer].astype(jnp.float32) * cache.v_scale[layer]
        return k.astype(compute_dtype), v.astype(compute_dtype)
    return (cache.k[layer].astype(compute_dtype),
            cache.v[layer].astype(compute_dtype))


def is_flat(cache: KVCache) -> bool:
    return cache.k[0].ndim == 3


def update_layer_flat(cache: KVCache, layer: int, k_rows, v_rows,
                      positions) -> KVCache:
    """Write flat-layout rows into a flat cache. k_rows/v_rows: [B, S, E]
    float; positions int32 [B, S] contiguous per batch row. INT8 caches
    quantize per (token, head) — same granularity as the head-major INT8
    path — storing scales [B, S, H]. Writes use the unrolled per-slot DUS
    chain (see _write_rows: the vmap'd batched-start DUS lowering costs
    ~6x on v5e decode)."""

    def upd(buf, rows, starts):
        rows = rows.astype(buf.dtype)
        B = buf.shape[0]
        if B == 1:
            return jax.lax.dynamic_update_slice(
                buf, rows, (0, starts[0], 0))
        if _unroll_writes(buf):
            for b in range(B):
                buf = jax.lax.dynamic_update_slice(
                    buf, jax.lax.dynamic_slice_in_dim(rows, b, 1, axis=0),
                    (b, starts[b], 0))
            return buf
        return jax.vmap(
            lambda bb, rb, sb: jax.lax.dynamic_update_slice(bb, rb, (sb, 0))
        )(buf, rows, starts)

    starts = positions[:, 0]
    if cache.int8:
        H = cache.k_scale[layer].shape[-1]
        B, S, E = k_rows.shape

        def qrows(rows):
            rh = rows.astype(jnp.float32).reshape(B, S, H, E // H)
            q, s = _quant_rows(rh)
            return q.reshape(B, S, E), s.reshape(B, S, H)

        kq, ks = qrows(k_rows)
        vq, vs = qrows(v_rows)
        k = upd(cache.k[layer], kq, starts)
        v = upd(cache.v[layer], vq, starts)
        kss = upd(cache.k_scale[layer], ks, starts)
        vss = upd(cache.v_scale[layer], vs, starts)
        return KVCache(
            _replace(cache.k, layer, k), _replace(cache.v, layer, v),
            _replace(cache.k_scale, layer, kss),
            _replace(cache.v_scale, layer, vss), cache.length)

    k = upd(cache.k[layer], k_rows, starts)
    v = upd(cache.v[layer], v_rows, starts)
    return KVCache(_replace(cache.k, layer, k), _replace(cache.v, layer, v),
                   None, None, cache.length)


def advance(cache: KVCache, n: int | jnp.ndarray) -> KVCache:
    return KVCache(cache.k, cache.v, cache.k_scale, cache.v_scale,
                   cache.length + n)
