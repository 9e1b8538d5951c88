"""Attention-family ops — the set the reference DECLARES but stubs.

GGML_OP_{SOFT_MAX, DIAG_MASK_INF, ROPE, ALIBI, FLASH_ATTN, FLASH_FF} exist in
the reference's op enum and scheduler work-size budget but have no builder and
no kernel (dispatch cases commented out, Ggml.cs:8689-8748; flash work-size
formulas survive at Ggml.cs:3454-3500). They are exactly the transformer
set, implemented here first-class. `flash_attn` here is the jnp reference
(materialized scores); the speed path is the Pallas online-softmax kernel in
``ggmlsharp_tpu.kernels.flash``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite sentinel: keeps masked softmax NaN-free under jit


def soft_max(a, axis: int = -1):
    """ggml_soft_max: numerically-stable softmax over rows."""
    m = jnp.max(a, axis=axis, keepdims=True)
    e = jnp.exp(a - jax.lax.stop_gradient(m))
    return e / jnp.sum(e, axis=axis, keepdims=True)


def diag_mask_inf(a, n_past: int = 0):
    """ggml_diag_mask_inf: causal mask on score matrices [..., n_q, n_k]:
    position (i, j) is masked when j > n_past + i."""
    n_q, n_k = a.shape[-2], a.shape[-1]
    i = jax.lax.broadcasted_iota(jnp.int32, (n_q, n_k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n_q, n_k), 1)
    mask = j > (i + n_past)
    return jnp.where(mask, jnp.asarray(NEG_INF, a.dtype), a)


def rope(a, positions, n_dims: int | None = None, mode: int = 0, base: float = 10000.0):
    """ggml_rope: rotary position embedding.

    a: [..., seq, head_dim] (apply per head; callers vmap/ reshape heads in).
    positions: int32 [seq] absolute positions (the reference-era API passes
    n_past and derives p = n_past + i; pass positions explicitly for
    continuous batching).
    n_dims: rotate only the first n_dims features (rest pass through).
    mode 0: interleaved pairs (2i, 2i+1) — GPT-J/llama.cpp legacy "rope".
    mode 2: NeoX half-split pairs (i, i + n_dims/2).
    """
    d = a.shape[-1]
    nd = d if n_dims is None else n_dims
    half = nd // 2
    pos = positions.astype(jnp.float32)[..., :, None]  # [seq, 1]
    inv_freq = base ** (-jnp.arange(half, dtype=jnp.float32) * 2.0 / nd)
    theta = pos * inv_freq  # [seq, half]
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    rot = a[..., :nd].astype(jnp.float32)
    if mode & 2:  # NeoX: halves
        x1, x2 = rot[..., :half], rot[..., half:nd]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.concatenate([r1, r2], axis=-1)
    else:  # interleaved pairs
        x1, x2 = rot[..., 0::2], rot[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.stack([r1, r2], axis=-1).reshape(rot.shape)
    out = out.astype(a.dtype)
    if nd == d:
        return out
    return jnp.concatenate([out, a[..., nd:]], axis=-1)


def rope_n_past(a, n_past: int, n_dims: int | None = None, mode: int = 0,
                base: float = 10000.0):
    """Reference-style entry point: positions = n_past + arange(seq)."""
    seq = a.shape[-2]
    positions = n_past + jnp.arange(seq, dtype=jnp.int32)
    return rope(a, positions, n_dims=n_dims, mode=mode, base=base)


def alibi_slopes(n_head: int, bias_max: float = 8.0):
    """Standard ALiBi head slopes: 2^(-bias_max * h / n_head_pow2) with the
    interpolated tail for non-power-of-two head counts."""
    import math

    n = 2 ** math.floor(math.log2(n_head))
    m0 = 2.0 ** (-bias_max / n)
    slopes = [m0 ** (i + 1) for i in range(n)]
    if n < n_head:
        m1 = 2.0 ** (-bias_max / (2 * n))
        slopes += [m1 ** (2 * i + 1) for i in range(n_head - n)]
    return jnp.asarray(slopes, jnp.float32)


def alibi(scores, n_past: int, n_head: int, bias_max: float = 8.0):
    """GGML_OP_ALIBI: add per-head linear position bias to score matrices
    [..., n_head, n_q, n_k]: bias[h, i, j] = slope_h * j."""
    n_k = scores.shape[-1]
    slopes = alibi_slopes(n_head, bias_max)
    j = jnp.arange(n_k, dtype=jnp.float32)
    bias = slopes[:, None, None] * j[None, None, :]
    return scores + bias.astype(scores.dtype)


def _flash_dense(q, k, v, masked, sc, n_past):
    """Materialized-scores reference (and the VJP recompute path)."""
    scores = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    ) * sc
    if masked:
        scores = diag_mask_inf(scores, n_past=n_past)
    p = soft_max(scores)
    return jnp.einsum(
        "...qk,...kd->...qd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_pallas(q, k, v, masked, sc, n_past):
    """Pallas online-softmax forward; backward recomputes through the
    dense reference (pallas_call has no autodiff) — same pattern as
    kernels.flash._flash_cached. Keeps the graph layer's flash_attn both
    fast on TPU and differentiable (Test1-style autodiff parity)."""
    from ..kernels.flash import flash_attention

    return flash_attention(q, k, v, causal=masked, n_past=n_past, scale=sc)


def _flash_pallas_fwd(q, k, v, masked, sc, n_past):
    return _flash_pallas(q, k, v, masked, sc, n_past), (q, k, v)


def _flash_pallas_bwd(masked, sc, n_past, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _flash_dense(q, k, v, masked, sc, n_past), q, k, v)
    return vjp(g)


_flash_pallas.defvjp(_flash_pallas_fwd, _flash_pallas_bwd)


def flash_attn(q, k, v, masked: bool = True, scale_override: float | None = None,
               n_past: int = 0, use_pallas: bool | None = None):
    """GGML_OP_FLASH_ATTN: softmax(q·kᵀ/√d [+mask])·v.

    q: [..., n_q, d], k: [..., n_k, d], v: [..., n_k, d] → [..., n_q, d].
    `masked` applies the causal mask with n_past offset (diag_mask_inf
    semantics). Dispatches to the Pallas online-softmax kernel when enabled
    (differentiable via a dense-recompute custom VJP).
    """
    if use_pallas is None:
        from ..kernels.config import pallas_enabled

        use_pallas = pallas_enabled()
    sc = scale_override if scale_override is not None else 1.0 / (q.shape[-1] ** 0.5)
    if use_pallas:
        return _flash_pallas(q, k, v, bool(masked), float(sc), int(n_past))
    return _flash_dense(q, k, v, masked, sc, n_past)


def flash_ff(x, w0, b0, w1, b1):
    """GGML_OP_FLASH_FF: fused two-layer GELU MLP
    (work-size budget at Ggml.cs:3478-3500; kernel absent in the reference).
    x [..., d_in] → gelu(x·w0ᵀ+b0)·w1ᵀ+b1. XLA fuses this chain on TPU; no
    hand fusion needed."""
    from .basic import gelu
    from .matmul import mul_mat_f

    h = gelu(mul_mat_f(w0, x) + b0)
    return mul_mat_f(w1, h) + b1
