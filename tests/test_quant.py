"""Quantization numerics tests.

What the reference never had (SURVEY §4 notes upstream ggml's
test-quantize*.c was dropped by the port): round-trip error bounds per
format, an independent scalar NumPy oracle for the legacy formats, packing
invertibility, and wire-size parity with the ggml block tables.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ggmlsharp_tpu import GType, quantize, dequantize, block_size
from ggmlsharp_tpu.dtypes import row_size_bytes
from ggmlsharp_tpu.quant.formats import (
    pack_nibbles,
    unpack_nibbles,
)

RNG = np.random.default_rng(12345)

import jax
from functools import lru_cache


@lru_cache(maxsize=None)
def _rt(gtype):
    """jitted quantize→dequantize round trip (eager per-op dispatch is slow)."""
    return jax.jit(lambda a: dequantize(quantize(a, gtype)))


@lru_cache(maxsize=None)
def _q(gtype):
    return jax.jit(lambda a: quantize(a, gtype))

ALL_FORMATS = [
    GType.Q4_0,
    GType.Q4_1,
    GType.Q4_2,
    GType.Q4_3,
    GType.Q5_0,
    GType.Q5_1,
    GType.Q8_0,
    GType.Q8_1,
    GType.Q4_K,
    GType.Q6_K,
    GType.Q8_K,
]

# worst-case relative round-trip error per element, vs block absmax:
# half a quantization step relative to full range, plus f16 scale rounding.
# note the symmetric formats (Q4_0/Q4_2/Q5_0/Q6_K) have an asymmetric code
# range ([-8,7] etc.): extremes of the sign opposite the block max clamp to
# the last code, so the worst case is a FULL step, not half a step.
MAX_REL_ERR = {
    GType.Q4_0: 1.0 / 8,
    GType.Q4_1: 1.0 / 14,  # affine range ≤ 2·absmax → half-step ≤ absmax/15
    GType.Q4_2: 1.0 / 8,
    GType.Q4_3: 1.0 / 14,
    GType.Q5_0: 1.0 / 16,
    GType.Q5_1: 1.0 / 30,
    GType.Q8_0: 1.0 / 250,
    GType.Q8_1: 1.0 / 250,
    GType.Q4_K: 1.0 / 12,  # + 6-bit scale/min quantization error
    GType.Q6_K: 1.0 / 30,
    GType.Q8_K: 1.0 / 250,
}


def _rand(shape, scale=4.0):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


# --- packing --------------------------------------------------------------

def test_pack_unpack_nibbles_roundtrip():
    vals = RNG.integers(0, 16, size=(3, 64)).astype(np.int32)
    packed = pack_nibbles(jnp.asarray(vals))
    assert packed.shape == (3, 8)
    assert packed.dtype == jnp.uint32
    out = unpack_nibbles(packed, 64)
    np.testing.assert_array_equal(np.asarray(out), vals)


# --- round trip per format -----------------------------------------------

@pytest.mark.parametrize("gtype", ALL_FORMATS)
def test_roundtrip_error_bound(gtype):
    n = 1024
    x = _rand((4, n))
    y = np.asarray(_rt(gtype)(jnp.asarray(x)))
    assert y.shape == x.shape
    bs = block_size(gtype)
    xb = x.reshape(4, n // bs, bs)
    yb = y.reshape(4, n // bs, bs)
    absmax = np.abs(xb).max(axis=-1, keepdims=True) + 1e-30
    rel = np.abs(xb - yb) / absmax
    assert rel.max() <= MAX_REL_ERR[gtype] + 1e-3, (gtype, rel.max())


@pytest.mark.parametrize("gtype", ALL_FORMATS)
def test_zero_block_is_exact(gtype):
    x = jnp.zeros((2, 512), jnp.float32)
    y = _rt(gtype)(x)
    np.testing.assert_array_equal(np.asarray(y), 0.0)


@pytest.mark.parametrize("gtype", ALL_FORMATS)
def test_constant_block(gtype):
    # a constant block must be representable to ~f16 scale precision
    x = jnp.full((1, 256), 3.0, jnp.float32)
    y = np.asarray(_rt(gtype)(x))
    np.testing.assert_allclose(y, 3.0, rtol=2e-3)


def test_quantize_is_idempotent_q8_0():
    # quantizing already-quantized values must be lossless (fixed point)
    x = _rand((2, 256))
    y1 = np.asarray(_rt(GType.Q8_0)(jnp.asarray(x)))
    y2 = np.asarray(_rt(GType.Q8_0)(jnp.asarray(y1)))
    np.testing.assert_allclose(y1, y2, atol=1e-6)


# --- independent scalar oracle for the legacy formats ---------------------

def _oracle_q4_0(x):
    """Scalar reimplementation of ggml quantize/dequantize_row_q4_0
    (d = signed_max / -8; q = min(15, floor(v + 8.5)); f16 scale)."""
    n = x.shape[-1]
    out = np.zeros_like(x)
    for r in range(x.shape[0]):
        for b in range(n // 32):
            blk = x[r, b * 32 : (b + 1) * 32]
            mx = 0.0
            amax = 0.0
            for v in blk:
                if abs(v) > amax:
                    amax = abs(v)
                    mx = v
            d = np.float32(mx / np.float32(-8.0))
            idv = np.float32(1.0) / d if d != 0 else np.float32(0.0)
            d16 = np.float32(np.float16(d))
            for l in range(32):
                q = min(15, int(np.floor(np.float32(blk[l] * idv) + np.float32(8.5))))
                q = max(0, q)
                out[r, b * 32 + l] = (q - 8) * d16
    return out


def _oracle_q8_0(x):
    n = x.shape[-1]
    out = np.zeros_like(x)
    for r in range(x.shape[0]):
        for b in range(n // 32):
            blk = x[r, b * 32 : (b + 1) * 32]
            amax = np.abs(blk).max()
            d = np.float32(amax / np.float32(127.0))
            idv = np.float32(1.0) / d if d != 0 else np.float32(0.0)
            d16 = np.float32(np.float16(d))
            for l in range(32):
                v = np.float32(blk[l] * idv)
                q = int(np.sign(v) * np.floor(np.float32(abs(v) + np.float32(0.5))))
                q = max(-128, min(127, q))
                out[r, b * 32 + l] = q * d16
    return out


def test_q4_0_matches_scalar_oracle():
    x = _rand((3, 128))
    got = np.asarray(_rt(GType.Q4_0)(jnp.asarray(x)))
    want = _oracle_q4_0(x)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_q8_0_matches_scalar_oracle():
    x = _rand((3, 128))
    got = np.asarray(_rt(GType.Q8_0)(jnp.asarray(x)))
    want = _oracle_q8_0(x)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_q8_1_sum_correction():
    from ggmlsharp_tpu.quant.formats import from_storage_order

    x = _rand((2, 64))
    qt = _q(GType.Q8_1)(jnp.asarray(x))
    qs_elem = np.asarray(from_storage_order(qt["qs"], 32), dtype=np.int32)
    qs = qs_elem.reshape(2, 2, 32)
    d = np.asarray(qt["d"])
    s = np.asarray(qt["s"])
    np.testing.assert_allclose(s, d * qs.sum(axis=-1), rtol=1e-5)


# --- wire-size parity -----------------------------------------------------

@pytest.mark.parametrize(
    "gtype,bpw",
    [
        (GType.Q4_0, 18 / 32),  # 2B f16 d + 16B nibbles per 32
        (GType.Q4_1, 20 / 32),
        (GType.Q5_0, 22 / 32),
        (GType.Q8_0, 34 / 32),
        (GType.Q4_K, 144 / 256),
        (GType.Q6_K, 210 / 256),
    ],
)
def test_row_size(gtype, bpw):
    assert row_size_bytes(gtype, 512) == int(512 * bpw)


# --- jit / vmap friendliness ---------------------------------------------

def test_quantize_under_jit_and_batch_dims():
    import jax

    x = jnp.asarray(_rand((2, 3, 128)))
    f = jax.jit(lambda a: dequantize(quantize(a, GType.Q4_0)))
    y = f(x)
    assert y.shape == x.shape
    # same result as unjitted
    y2 = _rt(GType.Q4_0)(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)


def test_q4_k_search_improves_reconstruction():
    """make_qkx2-style search (quantize(..., search=True)) must beat the
    fast min/max fit on weighted AND plain reconstruction error for
    realistic (outlier-bearing) weights."""
    import jax

    rng = np.random.default_rng(17)
    base = rng.standard_normal((32, 1024)).astype(np.float32) * 0.05
    base[:, ::37] *= 6.0
    x = jnp.asarray(base)
    errs = {}
    for search in (False, True):
        qt = jax.jit(
            lambda a, s=search: quantize(a, GType.Q4_K, search=s))(x)
        d = np.asarray(jax.jit(dequantize)(qt))
        w = np.sqrt((base ** 2).mean(-1, keepdims=True)) + np.abs(base)
        errs[search] = ((d - base) ** 2).mean(), (w * (d - base) ** 2).mean()
    assert errs[True][0] < errs[False][0] * 0.97, errs
    assert errs[True][1] < errs[False][1] * 0.97, errs


def test_q6_k_search_improves_reconstruction():
    """make_qx-style signed scale search for Q6_K (quantize(...,
    search=True)) must beat the fast absmax fit on x²-weighted
    reconstruction error (the search's own objective) for outlier-bearing
    weights, and must stay wire-compatible (round-trips dequantize)."""
    import jax

    rng = np.random.default_rng(23)
    base = rng.standard_normal((32, 1024)).astype(np.float32) * 0.05
    base[:, ::41] *= 5.0
    x = jnp.asarray(base)
    errs = {}
    for search in (False, True):
        qt = jax.jit(
            lambda a, s=search: quantize(a, GType.Q6_K, search=s))(x)
        d = np.asarray(jax.jit(dequantize)(qt))
        w = base ** 2  # rmse_type-1 weighting (make_qx_quants)
        errs[search] = ((d - base) ** 2).mean(), (w * (d - base) ** 2).mean()
    assert errs[True][1] < errs[False][1] * 0.98, errs


@pytest.mark.slow
def test_q4_k_search_improves_model_kl():
    """Model-level evidence (eval.compare_quantizers): the search quantizer
    lowers logits-KL vs fp32 on a small GPT-2."""
    import jax
    from ggmlsharp_tpu.eval import compare_quantizers
    from ggmlsharp_tpu.models import gpt2

    cfg = gpt2.GPT2Config(n_vocab=512, n_ctx=128, n_embd=256, n_head=4,
                          n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    res = compare_quantizers(
        gpt2.forward, cfg, params,
        {
            "fast": lambda p: gpt2.quantize_params(p, GType.Q4_K),
            "search": lambda p: gpt2.quantize_params(p, GType.Q4_K,
                                                     search=True),
        },
        n_tokens=96, chunk_len=64,
    )
    assert res["search"]["mean_kl"] < res["fast"]["mean_kl"], res
