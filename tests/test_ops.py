"""Op-surface tests: ggml semantics of every op, incl. the reference-stubbed
transformer set, against NumPy oracles. All computations jitted (eager
dispatch is slow on this host)."""
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggmlsharp_tpu import GType, quantize
from ggmlsharp_tpu import ops

RNG = np.random.default_rng(7)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


@lru_cache(maxsize=None)
def J(fn, **kw):
    return jax.jit(lambda *a: fn(*a, **kw))


def test_elementwise_family():
    x = jnp.asarray(_rand(4, 8))
    y = jnp.asarray(_rand(4, 8))
    f = jax.jit(
        lambda a, b: (
            ops.add(a, b), ops.sub(a, b), ops.mul(a, b), ops.div(a, b),
            ops.sqr(a), ops.abs_(a), ops.sgn(a), ops.neg(a), ops.step(a),
            ops.relu(a), ops.sqrt(ops.abs_(a)),
        )
    )
    r = [np.asarray(v) for v in f(x, y)]
    xn, yn = np.asarray(x), np.asarray(y)
    np.testing.assert_allclose(r[0], xn + yn, rtol=1e-6)
    np.testing.assert_allclose(r[1], xn - yn, rtol=1e-6)
    np.testing.assert_allclose(r[2], xn * yn, rtol=1e-6)
    np.testing.assert_allclose(r[3], xn / yn, rtol=1e-5)
    np.testing.assert_allclose(r[4], xn * xn, rtol=1e-6)
    np.testing.assert_allclose(r[5], np.abs(xn), rtol=1e-6)
    np.testing.assert_allclose(r[6], np.sign(xn))
    np.testing.assert_allclose(r[7], -xn)
    np.testing.assert_allclose(r[8], (xn > 0).astype(np.float32))
    np.testing.assert_allclose(r[9], np.maximum(xn, 0))
    np.testing.assert_allclose(r[10], np.sqrt(np.abs(xn)), rtol=1e-6)


def test_gelu_matches_tanh_formula():
    x = jnp.linspace(-4, 4, 64)
    got = np.asarray(J(ops.gelu)(x))
    xn = np.asarray(x, np.float64)
    want = 0.5 * xn * (1 + np.tanh(np.sqrt(2 / np.pi) * (xn + 0.044715 * xn**3)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_silu():
    x = jnp.asarray(_rand(16))
    got = np.asarray(J(ops.silu)(x))
    xn = np.asarray(x)
    np.testing.assert_allclose(got, xn / (1 + np.exp(-xn)), rtol=1e-5)


def test_reductions_and_mean():
    x = jnp.asarray(_rand(3, 5))
    s, m = jax.jit(lambda a: (ops.sum_(a), ops.mean(a)))(x)
    assert s.shape == (1,)
    np.testing.assert_allclose(np.asarray(s)[0], np.asarray(x).sum(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m), np.asarray(x).mean(-1, keepdims=True), rtol=1e-5
    )


def test_repeat_and_repeat_back_are_adjoint():
    # <repeat(a), b> == <a, repeat_back(b)> — the VJP identity
    a = jnp.asarray(_rand(2, 3))
    b = jnp.asarray(_rand(4, 6))
    f = jax.jit(lambda a, b: (ops.repeat(a, (4, 6)), ops.repeat_back(b, (2, 3))))
    ra, rb = f(a, b)
    assert ra.shape == (4, 6) and rb.shape == (2, 3)
    lhs = float(jnp.sum(ra * b))
    rhs = float(jnp.sum(a * rb))
    assert abs(lhs - rhs) < 1e-4


def test_norm_and_rms_norm():
    x = jnp.asarray(_rand(4, 32) * 3 + 1)
    n, r = jax.jit(lambda a: (ops.norm(a), ops.rms_norm(a)))(x)
    xn = np.asarray(x)
    mu = xn.mean(-1, keepdims=True)
    var = ((xn - mu) ** 2).mean(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(n), (xn - mu) / np.sqrt(var + 1e-5), rtol=2e-4, atol=2e-5)
    ms = (xn**2).mean(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(r), xn / np.sqrt(ms + 1e-6), rtol=2e-4, atol=2e-5)


def test_mul_mat_float_matches_numpy():
    a = jnp.asarray(_rand(16, 32))  # weights [n_out, k]
    b = jnp.asarray(_rand(5, 32))
    got = np.asarray(J(ops.mul_mat_f)(a, b))
    np.testing.assert_allclose(got, np.asarray(b) @ np.asarray(a).T, rtol=1e-4)


@pytest.mark.parametrize("gtype", [GType.Q8_0, GType.Q4_0, GType.Q4_K])
def test_mul_mat_q_close_to_float(gtype):
    k = 512
    a = jnp.asarray(_rand(8, k) * 0.1)
    b = jnp.asarray(_rand(3, k))
    f = jax.jit(
        lambda w, x: ops.mul_mat(quantize(w, gtype), x, use_pallas=False)
    )
    got = np.asarray(f(a, b))
    want = np.asarray(b) @ np.asarray(a).T
    # quantization noise: 4-bit formats carry ~1/16 per-element noise that
    # partially cancels in the k=512 dot; 12% mean bound is the empirical
    # envelope (Q8_0 stays under 1%)
    denom = np.abs(want).mean() + 1e-6
    err = np.abs(got - want).mean() / denom
    limit = 0.01 if gtype == GType.Q8_0 else 0.15
    assert err < limit, (gtype, err)


def test_mul_mat_q_weight_only_vs_act_quant():
    k = 256
    a = quantize(jnp.asarray(_rand(4, k)), GType.Q8_0)
    b = jnp.asarray(_rand(2, k))
    f = jax.jit(lambda x: (ops.mul_mat(a, x, quantize_acts=True, use_pallas=False),
                           ops.mul_mat(a, x, quantize_acts=False, use_pallas=False)))
    y1, y2 = f(b)
    # act-quant adds small extra noise but must stay close
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=0.02, atol=0.05)


def test_soft_max():
    x = jnp.asarray(_rand(3, 10) * 5)
    got = np.asarray(J(ops.soft_max)(x))
    xn = np.asarray(x, np.float64)
    e = np.exp(xn - xn.max(-1, keepdims=True))
    np.testing.assert_allclose(got, e / e.sum(-1, keepdims=True), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_diag_mask_inf():
    x = jnp.zeros((4, 6))
    got = np.asarray(J(ops.diag_mask_inf, n_past=2)(x))
    for i in range(4):
        for j in range(6):
            if j > i + 2:
                assert got[i, j] < -1e29
            else:
                assert got[i, j] == 0.0


def test_rope_interleaved_oracle():
    seq, d = 5, 8
    x = _rand(seq, d)
    pos = np.arange(seq)
    got = np.asarray(J(ops.rope_n_past, n_past=0, mode=0)(jnp.asarray(x)))
    want = np.zeros_like(x)
    for s in range(seq):
        for i in range(d // 2):
            theta = pos[s] * (10000.0 ** (-2.0 * i / d))
            c, sn = np.cos(theta), np.sin(theta)
            x0, x1 = x[s, 2 * i], x[s, 2 * i + 1]
            want[s, 2 * i] = x0 * c - x1 * sn
            want[s, 2 * i + 1] = x0 * sn + x1 * c
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rope_neox_mode():
    seq, d = 4, 8
    x = _rand(seq, d)
    got = np.asarray(J(ops.rope_n_past, n_past=3, mode=2)(jnp.asarray(x)))
    half = d // 2
    want = np.zeros_like(x)
    for s in range(seq):
        p = s + 3
        for i in range(half):
            theta = p * (10000.0 ** (-2.0 * i / d))
            c, sn = np.cos(theta), np.sin(theta)
            want[s, i] = x[s, i] * c - x[s, i + half] * sn
            want[s, i + half] = x[s, i] * sn + x[s, i + half] * c
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rope_partial_dims_passthrough():
    x = jnp.asarray(_rand(3, 8))
    got = np.asarray(J(ops.rope_n_past, n_past=0, n_dims=4)(x))
    np.testing.assert_array_equal(got[:, 4:], np.asarray(x)[:, 4:])


def test_alibi_slopes_power_of_two():
    s = np.asarray(ops.alibi_slopes(8))
    np.testing.assert_allclose(s, [2 ** (-i) for i in range(1, 9)], rtol=1e-6)


def test_get_rows_float_and_quantized():
    table = _rand(64, 128)
    ids = jnp.asarray([3, 0, 63, 3])
    got_f = np.asarray(J(ops.get_rows)(jnp.asarray(table), ids))
    np.testing.assert_array_equal(got_f, table[[3, 0, 63, 3]])

    qt = quantize(jnp.asarray(table), GType.Q8_0)
    from ggmlsharp_tpu.quant import dequantize

    f = jax.jit(lambda i: ops.get_rows(qt, i))
    got_q = np.asarray(f(ids))
    full = np.asarray(jax.jit(dequantize)(qt))
    np.testing.assert_allclose(got_q, full[[3, 0, 63, 3]], atol=1e-6)


def test_flash_attn_matches_naive():
    q = jnp.asarray(_rand(2, 4, 6, 16))  # [b, h, n, d]
    k = jnp.asarray(_rand(2, 4, 6, 16))
    v = jnp.asarray(_rand(2, 4, 6, 16))
    f = jax.jit(lambda q, k, v: ops.flash_attn(q, k, v, masked=True, use_pallas=False))
    got = np.asarray(f(q, k, v))
    qn, kn, vn = (np.asarray(t, np.float64) for t in (q, k, v))
    scores = qn @ kn.swapaxes(-1, -2) / np.sqrt(16)
    ninf = np.triu(np.ones((6, 6), bool), k=1)
    scores = np.where(ninf, -1e30, scores)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, p @ vn, rtol=1e-4, atol=1e-5)


def test_flash_ff():
    x = jnp.asarray(_rand(3, 8))
    w0, b0 = jnp.asarray(_rand(16, 8)), jnp.asarray(_rand(16))
    w1, b1 = jnp.asarray(_rand(8, 16)), jnp.asarray(_rand(8))
    got = np.asarray(J(ops.flash_ff)(x, w0, b0, w1, b1))
    h = np.asarray(J(ops.gelu)(ops.mul_mat_f(w0, x) + b0))
    want = h @ np.asarray(w1).T + np.asarray(b1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_conv_1d_shapes_and_identity_kernel():
    L, cin, cout = 12, 3, 5
    x = jnp.asarray(_rand(L, cin))
    w = jnp.asarray(_rand(cout, cin, 3))
    y1 = np.asarray(J(ops.conv_1d_1s)(x, w))
    assert y1.shape == (L, cout)
    y2 = np.asarray(J(ops.conv_1d_2s)(x, w))
    assert y2.shape == (L // 2, cout)
    # identity kernel (kw=1, cin=cout, eye) reproduces input
    wid = jnp.asarray(np.eye(cin, dtype=np.float32)[:, :, None])
    yid = np.asarray(J(ops.conv_1d_1s)(x, wid))
    np.testing.assert_allclose(yid, np.asarray(x), rtol=1e-5, atol=1e-6)


def test_scale_transpose_views():
    x = jnp.asarray(_rand(3, 4))
    f = jax.jit(
        lambda a: (
            ops.scale(a, jnp.asarray([2.0])),
            ops.transpose(a),
            ops.reshape(a, (4, 3)),
            ops.permute(a, (1, 0)),
            ops.view(a, (2, 3), offset_elems=1),
        )
    )
    s, t, r, p, v = f(x)
    xn = np.asarray(x)
    np.testing.assert_allclose(np.asarray(s), xn * 2)
    np.testing.assert_array_equal(np.asarray(t), xn.T)
    np.testing.assert_array_equal(np.asarray(r), xn.reshape(4, 3))
    np.testing.assert_array_equal(np.asarray(p), xn.T)
    np.testing.assert_array_equal(np.asarray(v), xn.ravel()[1:7].reshape(2, 3))


def test_map_unary_binary():
    x = jnp.asarray(_rand(4))
    y = jnp.asarray(_rand(4))
    f = jax.jit(
        lambda a, b: (
            ops.map_unary(a, lambda t: t * 3),
            ops.map_binary(a, b, lambda t, u: t - 2 * u),
        )
    )
    u, w = f(x, y)
    np.testing.assert_allclose(np.asarray(u), np.asarray(x) * 3, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(x) - 2 * np.asarray(y), rtol=1e-6)
