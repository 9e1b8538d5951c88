"""Pallas kernel correctness vs the jnp reference path (interpret mode on
CPU; the same kernels compile natively on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggmlsharp_tpu import GType, quantize
from ggmlsharp_tpu.kernels.matmul_q import fused_supported, mul_mat_q_fused
from ggmlsharp_tpu.ops.matmul import mul_mat_q

RNG = np.random.default_rng(11)

# exact mode for bitwise-comparable fused-vs-reference checks
from ggmlsharp_tpu.kernels import config as kcfg

kcfg.set_mm_dot("f32")

FORMATS = [GType.Q8_0, GType.Q4_0, GType.Q4_1, GType.Q4_K, GType.Q6_K]


@pytest.mark.parametrize("gtype", FORMATS)
@pytest.mark.parametrize("batch", [1, 5])
def test_fused_matches_reference(gtype, batch):
    n, k = 256, 512
    w = jnp.asarray(RNG.standard_normal((n, k)).astype(np.float32) * 0.1)
    x = jnp.asarray(RNG.standard_normal((batch, k)).astype(np.float32))
    qw = quantize(w, gtype)
    assert fused_supported(qw)
    got = np.asarray(jax.jit(
        lambda xv: mul_mat_q_fused(qw, xv, quantize_acts=False)
    )(x))
    want = np.asarray(jax.jit(
        lambda xv: mul_mat_q(qw, xv, quantize_acts=False)
    )(x))
    if gtype in (GType.Q4_K, GType.Q6_K):
        # kernels use the f16 fused-scale planes (≤2^-11 relative deviation
        # from the exact d*sc dequant the jnp path computes)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)
    else:
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_with_activation_quantization():
    n, k = 128, 256
    w = jnp.asarray(RNG.standard_normal((n, k)).astype(np.float32) * 0.1)
    x = jnp.asarray(RNG.standard_normal((2, k)).astype(np.float32))
    qw = quantize(w, GType.Q4_0)
    got = np.asarray(jax.jit(
        lambda xv: mul_mat_q_fused(qw, xv, quantize_acts=True)
    )(x))
    want = np.asarray(jax.jit(
        lambda xv: mul_mat_q(qw, xv, quantize_acts=True)
    )(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_fallback_on_odd_shapes():
    # n not a TILE_N multiple → silently uses the jnp path
    n, k = 96, 256
    w = jnp.asarray(RNG.standard_normal((n, k)).astype(np.float32) * 0.1)
    x = jnp.asarray(RNG.standard_normal((1, k)).astype(np.float32))
    qw = quantize(w, GType.Q8_0)
    assert not fused_supported(qw)
    got = np.asarray(jax.jit(lambda xv: mul_mat_q_fused(qw, xv, False))(x))
    want = np.asarray(jax.jit(lambda xv: mul_mat_q(qw, xv, False))(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_3d_batch_dims():
    n, k = 128, 256
    w = jnp.asarray(RNG.standard_normal((n, k)).astype(np.float32) * 0.1)
    x = jnp.asarray(RNG.standard_normal((2, 3, k)).astype(np.float32))
    qw = quantize(w, GType.Q8_0)
    got = np.asarray(jax.jit(lambda xv: mul_mat_q_fused(qw, xv, False))(x))
    assert got.shape == (2, 3, n)
    want = np.asarray(jax.jit(lambda xv: mul_mat_q(qw, xv, False))(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_flash_attention_kernel_matches_naive():
    from ggmlsharp_tpu.kernels.flash import flash_attention
    from ggmlsharp_tpu import ops

    q = jnp.asarray(RNG.standard_normal((2, 3, 40, 32)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((2, 3, 40, 32)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((2, 3, 40, 32)).astype(np.float32))
    got = np.asarray(jax.jit(
        lambda a, b, c: flash_attention(a, b, c, causal=True, block_q=16, block_k=16)
    )(q, k, v))
    want = np.asarray(jax.jit(
        lambda a, b, c: ops.flash_attn(a, b, c, masked=True, use_pallas=False)
    )(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_attention_non_causal_and_n_past():
    from ggmlsharp_tpu.kernels.flash import flash_attention
    from ggmlsharp_tpu import ops

    q = jnp.asarray(RNG.standard_normal((1, 8, 16)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((1, 24, 16)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((1, 24, 16)).astype(np.float32))
    got = np.asarray(jax.jit(
        lambda a, b, c: flash_attention(a, b, c, causal=False, block_q=8, block_k=8)
    )(q, k, v))
    want = np.asarray(jax.jit(
        lambda a, b, c: ops.flash_attn(a, b, c, masked=False, use_pallas=False)
    )(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # causal with n_past: queries attend to 16 past keys + causal window
    got2 = np.asarray(jax.jit(
        lambda a, b, c: flash_attention(a, b, c, causal=True, n_past=16, block_q=8, block_k=8)
    )(q, k, v))
    want2 = np.asarray(jax.jit(
        lambda a, b, c: ops.flash_attn(a, b, c, masked=True, n_past=16, use_pallas=False)
    )(q, k, v))
    np.testing.assert_allclose(got2, want2, rtol=2e-4, atol=2e-5)


def test_fused_bf16_mode_close():
    """Production bf16 dot mode: ~2^-9 product rounding, well under quant
    noise."""
    kcfg.set_mm_dot("bf16")
    try:
        n, k = 128, 512
        w = jnp.asarray(RNG.standard_normal((n, k)).astype(np.float32) * 0.1)
        x = jnp.asarray(RNG.standard_normal((1, k)).astype(np.float32))
        qw = quantize(w, GType.Q4_0)
        got = np.asarray(jax.jit(lambda xv: mul_mat_q_fused(qw, xv, False))(x))
        want = np.asarray(jax.jit(lambda xv: mul_mat_q(qw, xv, False))(x))
        denom = np.abs(want).mean() + 1e-6
        assert np.abs(got - want).mean() / denom < 0.01
    finally:
        kcfg.set_mm_dot("f32")


def test_int_dot_matches_reference_exactly():
    """Integer-dot decode path: identical math to ggml's vec_dot_q (acts
    quantized per-32, int MACs, per-block scale products)."""
    from ggmlsharp_tpu.kernels.matmul_q import (
        int_dot_supported, mul_mat_q_int_dot,
    )

    for gtype in (GType.Q8_0, GType.Q4_0):
        n, k = 256, 512
        w = jnp.asarray(RNG.standard_normal((n, k)).astype(np.float32) * 0.1)
        x = jnp.asarray(RNG.standard_normal((1, k)).astype(np.float32))
        qw = quantize(w, gtype)
        assert int_dot_supported(qw, 1)
        got = np.asarray(jax.jit(lambda v: mul_mat_q_int_dot(qw, v))(x))
        want = np.asarray(jax.jit(
            lambda v: mul_mat_q(qw, v, quantize_acts=True)
        )(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4,
                                   err_msg=str(gtype))
