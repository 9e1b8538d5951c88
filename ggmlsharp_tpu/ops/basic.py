"""Element-wise / reduction / normalization ops (ggml op-builder parity).

Covers the reference's implemented op set (SURVEY §2.6; builders at
Ggml.cs:6846-7225): add/sub/mul/div, sqr/sqrt/abs/sgn/neg/step/relu/gelu/silu,
sum/mean, repeat, norm/rms_norm, scale, cpy/cont, transpose — as plain
functions on jnp arrays. Layout mapping: ggml's ne[0] (the "row") is the LAST
jnp axis; ggml ne[i] = jnp shape[-1-i]. On TPU these all lower to VPU code and
XLA fuses them into neighboring matmuls, replacing the reference's scalar
ggml_vec_* loops (Ggml.cs:2566-2800) and its per-op thread-splitting
(Ggml.cs:3260-3519).

Activation functions use native VPU transcendentals instead of the reference's
64K-entry f16 lookup tables (Ggml.cs:44-53, 2705-2753) — the tables exist
because scalar CPU exp is slow, which does not apply here; `gelu` keeps ggml's
tanh approximation so numerics line up.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_COEF = 0.044715

# ggml hard-codes these (kernels at Ggml.cs:5800 / 5888)
NORM_EPS_DEFAULT = 1e-5
RMS_NORM_EPS_DEFAULT = 1e-6


# --- binary (same-shape; ggml has no implicit broadcasting — use repeat) --

def add(a, b):
    return a + b


def sub(a, b):
    return a - b


def mul(a, b):
    return a * b


def div(a, b):
    return a / b


# --- unary ----------------------------------------------------------------

def dup(a):
    return jnp.asarray(a)


def sqr(a):
    return a * a


def sqrt(a):
    return jnp.sqrt(a)


def abs_(a):
    return jnp.abs(a)


def sgn(a):
    return jnp.sign(a)


def neg(a):
    return -a


def step(a):
    """1 where a > 0 else 0 (ggml_vec_step semantics)."""
    return (a > 0).astype(a.dtype)


def relu(a):
    return jnp.maximum(a, 0)


def gelu(a):
    """ggml tanh-approx GELU (the f16-LUT path's underlying formula,
    Ggml.cs:2683-2703)."""
    x = a
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + _GELU_COEF * x * x * x)))


def silu(a):
    return a * jax.nn.sigmoid(a)


# --- reductions -----------------------------------------------------------

def sum_(a):
    """ggml_sum: reduce to scalar. The reference accumulates in double
    (ggml_vec_sum_ggf, Ggml.cs:2641-2651); on TPU we accumulate f32 which is
    what XLA's tree reduction gives."""
    return jnp.sum(a).reshape(1)


def mean(a):
    """ggml_mean: mean over rows (ne0 → 1), per Ggml.cs:5267-5338."""
    return jnp.mean(a, axis=-1, keepdims=True)


def max_(a):
    return jnp.max(a).reshape(1)


# --- broadcast ------------------------------------------------------------

def repeat(a, target_shape):
    """ggml_repeat: tile `a` up to `target_shape` (ggml_can_repeat
    requires each target dim be a multiple, Ggml.cs:8395-8406)."""
    a = jnp.asarray(a)
    if a.shape == tuple(target_shape):
        return a
    reps = []
    tshape = tuple(target_shape)
    ashape = (1,) * (len(tshape) - a.ndim) + a.shape
    for t, s in zip(tshape, ashape):
        assert t % s == 0, (tshape, a.shape)
        reps.append(t // s)
    return jnp.tile(a.reshape(ashape), reps)


def repeat_back(a, target_shape):
    """VJP of repeat: fold tiles back down by summation."""
    a = jnp.asarray(a)
    tshape = tuple(target_shape)
    if a.shape == tshape:
        return a
    full = (1,) * (len(a.shape) - len(tshape)) + tshape
    for ax, (t, s) in enumerate(zip(a.shape, full)):
        if t != s:
            a = a.reshape(a.shape[:ax] + (t // s, s) + a.shape[ax + 1 :]).sum(axis=ax)
    return a.reshape(tshape)


# --- normalization --------------------------------------------------------

def norm(a, eps: float = NORM_EPS_DEFAULT):
    """Per-row zero-mean/unit-variance, no affine (Ggml.cs:5770-5855)."""
    mu = jnp.mean(a, axis=-1, keepdims=True)
    xc = a - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps)


def rms_norm(a, eps: float = RMS_NORM_EPS_DEFAULT):
    """Per-row RMS normalization, no affine (Ggml.cs:5857-5940)."""
    ms = jnp.mean(a * a, axis=-1, keepdims=True)
    return a * jax.lax.rsqrt(ms + eps)


# --- misc -----------------------------------------------------------------

def scale(a, s):
    """ggml_scale: multiply by scalar (passed as 1-element tensor in the
    reference, Ggml.cs:7153-7168)."""
    return a * jnp.reshape(s, ())


def cpy(a, dtype):
    """ggml_cpy's cast half: copy/cast into a destination dtype. The
    quantize-on-copy path (f32 → Q blocks, Ggml.cs:4339+) is
    `quant.quantize`."""
    return a.astype(dtype)


def cont(a):
    """ggml_cont: force contiguity. XLA owns layout; identity at trace level."""
    return jnp.asarray(a)


def transpose(a):
    """ggml_transpose: swap ne[0]/ne[1] = last two jnp axes
    (stride-swap view in the reference, Ggml.cs:7199-7225)."""
    return jnp.swapaxes(a, -1, -2)


def reshape(a, shape):
    return jnp.reshape(a, shape)


def permute(a, axes):
    return jnp.transpose(a, axes)


def view(a, shape, offset_elems: int = 0):
    """ggml_view_*: window into a flat buffer (the reference shares data
    pointers, Ggml.cs:3751-3763; functionally a slice+reshape here)."""
    flat = jnp.ravel(a)
    n = 1
    for s in shape:
        n *= s
    return flat[offset_elems : offset_elems + n].reshape(shape)


def map_unary(a, fn):
    """GGML_OP_MAP_UNARY (declared but stubbed in the reference,
    Ggml.cs:8744-8748): user callback over elements, staged into the graph."""
    return fn(a)


def map_binary(a, b, fn):
    return fn(a, b)
