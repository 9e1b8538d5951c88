"""Op builders: the public graph-construction surface (ggml_add …
ggml_flash_attn parity, Ggml.cs:6846-7225 + the stubbed set).

Each builder wraps a function from ``ggmlsharp_tpu.ops`` into a GTensor node.
Builders validate nothing beyond what the op itself asserts — shape errors
surface at trace time via jax.eval_shape in GTensor.__init__.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import ops as O
from ..quant.formats import QTensor
from .core import GTensor, leaf


def as_node(x):
    return x if isinstance(x, GTensor) else leaf(x)


def _node(op, fwd, *srcs, name=None, **kwargs):
    return GTensor(op, srcs=[as_node(s) for s in srcs], kwargs=kwargs, fwd=fwd, name=name)


# --- binary ---------------------------------------------------------------

def add(a, b):
    return _node("add", O.add, a, b)


def sub(a, b):
    return _node("sub", O.sub, a, b)


def mul(a, b):
    return _node("mul", O.mul, a, b)


def div(a, b):
    return _node("div", O.div, a, b)


# --- unary ----------------------------------------------------------------

def dup(a):
    return _node("dup", O.dup, a)


def sqr(a):
    return _node("sqr", O.sqr, a)


def sqrt(a):
    return _node("sqrt", O.sqrt, a)


def abs_(a):
    return _node("abs", O.abs_, a)


def sgn(a):
    return _node("sgn", O.sgn, a)


def neg(a):
    return _node("neg", O.neg, a)


def step(a):
    return _node("step", O.step, a)


def relu(a):
    return _node("relu", O.relu, a)


def gelu(a):
    return _node("gelu", O.gelu, a)


def silu(a):
    return _node("silu", O.silu, a)


# --- reductions / broadcast ----------------------------------------------

def sum(a):  # noqa: A001 - ggml name
    return _node("sum", O.sum_, a)


def mean(a):
    return _node("mean", O.mean, a)


def repeat(a, shape):
    return _node("repeat", O.repeat, a, target_shape=tuple(shape))


def repeat_back(a, shape):
    return _node("repeat_back", O.repeat_back, a, target_shape=tuple(shape))


# --- normalization --------------------------------------------------------

def norm(a, eps: float = 1e-5):
    return _node("norm", O.norm, a, eps=eps)


def rms_norm(a, eps: float = 1e-6):
    return _node("rms_norm", O.rms_norm, a, eps=eps)


# --- matmul ---------------------------------------------------------------

def mul_mat(a, b):
    """ggml_mul_mat: a [n_out, k] (float or QTensor leaf), b [..., k]."""
    return _node("mul_mat", O.mul_mat, a, b)


def mat_tb(g, b):
    """Σ over batch of g ⊗ b: [..., n] x [..., k] → [n, k] (mul_mat src0 VJP)."""

    def fwd(gv, bv):
        gn = gv.reshape(-1, gv.shape[-1])
        bn = bv.reshape(-1, bv.shape[-1])
        return jnp.matmul(gn.T, bn, preferred_element_type=jnp.float32)

    return _node("mat_tb", fwd, g, b)


def mat_nn(g, a):
    """g[..., n] @ a[n, k] → [..., k] (mul_mat src1 VJP)."""

    def fwd(gv, av):
        if isinstance(av, QTensor):
            from ..quant.quantize import dequantize

            av = dequantize(av)
        return jnp.matmul(gv, av, preferred_element_type=jnp.float32)

    return _node("mat_nn", fwd, g, a)


def out_prod(a, b):
    return _node("out_prod", O.out_prod, a, b)


# --- misc -----------------------------------------------------------------

def scale(a, s):
    return _node("scale", O.scale, a, s)


def scale_const(a, c: float):
    return _node("scale_const", lambda v, c: v * c, a, c=float(c))


def cpy(a, dtype):
    return _node("cpy", O.cpy, a, dtype=dtype)


def cont(a):
    return _node("cont", O.cont, a)


def transpose(a):
    return _node("transpose", O.transpose, a)


def reshape(a, shape):
    return _node("reshape", O.reshape, a, shape=tuple(shape))


def permute(a, axes):
    return _node("permute", O.permute, a, axes=tuple(axes))


def view(a, shape, offset_elems: int = 0):
    return _node("view", O.view, a, shape=tuple(shape), offset_elems=offset_elems)


def map_unary(a, fn):
    return _node("map_unary", O.map_unary, a, fn=fn)


def map_binary(a, b, fn):
    return _node("map_binary", O.map_binary, a, b, fn=fn)


# --- transformer set (reference-stubbed ops) ------------------------------

def get_rows(table, ids):
    return _node("get_rows", O.get_rows, table, ids)


def diag_mask_inf(a, n_past: int = 0):
    return _node("diag_mask_inf", O.diag_mask_inf, a, n_past=n_past)


def soft_max(a):
    return _node("soft_max", O.soft_max, a)


def rope(a, n_past: int, n_dims: int | None = None, mode: int = 0):
    return _node("rope", O.rope_n_past, a, n_past=n_past, n_dims=n_dims, mode=mode)


def alibi(a, n_past: int, n_head: int):
    return _node("alibi", O.alibi, a, n_past=n_past, n_head=n_head)


def conv_1d_1s(x, w):
    return _node("conv_1d_1s", lambda xv, wv: O.conv_1d_1s(xv, wv), x, w)


def conv_1d_2s(x, w):
    return _node("conv_1d_2s", lambda xv, wv: O.conv_1d_2s(xv, wv), x, w)


def flash_attn(q, k, v, masked: bool = True):
    # auto-dispatch: Pallas online-softmax kernel on TPU (differentiable
    # via dense-recompute custom VJP — ops.attention._flash_pallas),
    # materialized-scores jnp elsewhere
    return _node(
        "flash_attn",
        lambda qv, kv, vv, masked: O.flash_attn(qv, kv, vv, masked=masked),
        q, k, v, masked=masked,
    )


def flash_ff(x, w0, b0, w1, b1):
    return _node("flash_ff", O.flash_ff, x, w0, b0, w1, b1)
