"""Test2/Test3 parity: optimizer convergence oracles.

Test2 (/root/reference/Test2/Program.cs): Adam on 4 objectives — least-squares
line fit (t0=5, t1=10 within 1e-3), L1 line fit (1e-2), convex quadratic,
Booth function. Test3 (/root/reference/Test3/Program.cs): L-BFGS on a
4096×256 regularized linear classifier with deterministic LCG data, every
weight within 1e-2 of ±1. Both via the graph facade AND the functional path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggmlsharp_tpu.graph import builders as B, leaf, set_param
from ggmlsharp_tpu.optim import (
    OptParams,
    OptResult,
    opt,
    opt_default_params,
    opt_fn,
)


from ggmlsharp_tpu.optim.params import OptType


def _adam_params():
    # Test2 overrides alpha to 0.01 (Test2/Program.cs:17)
    p = OptParams()
    p.adam.alpha = 0.01
    return p

XI = jnp.asarray([1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10], jnp.float32)
YI = jnp.asarray([15.0, 25, 35, 45, 55, 65, 75, 85, 95, 105], jnp.float32)
N = 10


def test2_adam_least_squares_graph():
    # f = sum((t0 + t1*x - y)^2) / (2n), start (0,0)
    t0 = set_param(leaf(jnp.zeros((1,), jnp.float32)))
    t1 = set_param(leaf(jnp.zeros((1,), jnp.float32)))
    x, y = leaf(XI), leaf(YI)
    f = B.div(
        B.sum(
            B.sqr(
                B.sub(B.add(B.mul(x, B.repeat(t1, (N,))), B.repeat(t0, (N,))), y)
            )
        ),
        leaf(jnp.asarray([2.0 * N], jnp.float32)),
    )
    res, fx = opt(f, _adam_params())
    assert res == OptResult.OK
    assert abs(float(t0.data[0]) - 5.0) < 1e-3
    assert abs(float(t1.data[0]) - 10.0) < 1e-3


def test2_adam_l1_fit():
    # f = 0.5*sum(abs(t0 + t1*x - y))/n, start (-1, 9), tol 1e-2
    def fun(p):
        t0, t1 = p
        return 0.5 * jnp.sum(jnp.abs(t0 + t1 * XI - YI)) / N

    (t0, t1), fx, res, _ = opt_fn(fun, (jnp.float32(-1.0), jnp.float32(9.0)), _adam_params())
    assert res == OptResult.OK
    assert abs(float(t0) - 5.0) < 1e-2
    assert abs(float(t1) - 10.0) < 1e-2


def test2_adam_quadratic():
    # f = (5t0 + t1 - 35)^2 + (t0 + 8t1 - 42)^2  → minimum f=0
    def fun(p):
        t0, t1 = p
        return (5 * t0 + t1 - 35.0) ** 2 + (t0 + 8 * t1 - 42.0) ** 2

    (t0, t1), fx, res, _ = opt_fn(fun, (jnp.float32(1.0), jnp.float32(1.0)), _adam_params())
    assert res == OptResult.OK
    assert fx < 1e-3


def test2_adam_booth():
    # Booth: (x+2y-7)^2 + (2x+y-5)^2, min at (1,3)
    def fun(p):
        x, y = p
        return (x + 2 * y - 7.0) ** 2 + (2 * x + y - 5.0) ** 2

    (x, y), fx, res, _ = opt_fn(fun, (jnp.float32(0.0), jnp.float32(0.0)), _adam_params())
    assert res == OptResult.OK
    assert abs(float(x) - 1.0) < 1e-2
    assert abs(float(y) - 3.0) < 1e-2


def _test3_data(np_, nf):
    """Test3's deterministic data (Test3/Program.cs:33-42, 98-106): MSVC-LCG
    noise over a block-indicator design; least-squares solution ≈ ±1."""
    state = np.uint64(0)
    a, c = np.uint64(214013), np.uint64(2531011)

    def xrand():
        nonlocal state
        state = np.uint64((a * state + c) & np.uint64(0xFFFFFFFF))
        return int((state >> np.uint64(16)) & np.uint64(0x7FFF))

    F = np.zeros((np_, nf), np.float32)
    l = np.zeros(np_, np.float32)
    for j in range(np_):
        ll = 1.0 if j < np_ // 2 else -1.0
        l[j] = ll
        for i in range(nf):
            ind = 1.0 if (ll > 0 and i < nf // 2) or (ll < 0 and i >= nf // 2) else 0.0
            F[j, i] = (ind + (xrand() / 32767.0 - 0.5) * 0.1) / (0.5 * nf)
    return F, l


@pytest.mark.slow
def test3_lbfgs_linear_classifier():
    # full-scale Test3 (Test3/Program.cs:20-23): NP=4096, NF=256 L-BFGS +
    # mul_mat fit with L2 reg; first-half weights → +1, rest → -1 within 1e-2
    NP_, NF = 4096, 256
    Fn, ln = _test3_data(NP_, NF)
    F, l = jnp.asarray(Fn), jnp.asarray(ln)

    def fun(w):
        pred = F @ w
        return jnp.sum((pred - l) ** 2) / NP_ + 1e-5 * jnp.sum(w * w)

    p = opt_default_params(OptType.LBFGS)
    w0 = jnp.zeros((NF,), jnp.float32)
    w, fx, res, iters = opt_fn(fun, w0, p)
    assert res in (OptResult.OK, OptResult.DID_NOT_CONVERGE)
    w_true = np.where(np.arange(NF) < NF // 2, 1.0, -1.0)
    np.testing.assert_allclose(np.asarray(w), w_true, atol=1e-2)


def test_lbfgs_jit_matches_host():
    """The jit-resident while_loop form must reach the same optimum and
    result code as the host-driven loop (same stopping rules) on a convex
    quadratic and on Rosenbrock, for all three line-search kinds."""
    from ggmlsharp_tpu.optim.lbfgs import opt_lbfgs_host, opt_lbfgs_jit
    from ggmlsharp_tpu.optim.params import LineSearch

    def quad(x):
        return jnp.sum((x - jnp.arange(4, dtype=jnp.float32)) ** 2)

    def rosen(p):
        x, y = p[0], p[1]
        return (1 - x) ** 2 + 100.0 * (y - x * x) ** 2

    for fun, x0 in [
        (quad, jnp.zeros((4,), jnp.float32)),
        (rosen, jnp.asarray([-1.2, 1.0], jnp.float32)),
    ]:
        for ls in (LineSearch.ARMIJO, LineSearch.WOLFE,
                   LineSearch.STRONG_WOLFE):
            prm = opt_default_params(OptType.LBFGS)
            prm.lbfgs.n_iter = 200
            prm.lbfgs.linesearch = ls
            vg = jax.value_and_grad(fun)
            xh, fh, rh, ih = opt_lbfgs_host(lambda t: vg(t), x0, prm)
            xj, fj, rj, ij = opt_lbfgs_jit(lambda t: vg(t), x0, prm)
            assert rj == rh, (ls, rj, rh)
            np.testing.assert_allclose(np.asarray(xj), np.asarray(xh),
                                       rtol=1e-3, atol=1e-3)


def test_lbfgs_rosenbrock():
    # beyond-reference: classic curvature stress test
    def fun(p):
        x, y = p
        return (1 - x) ** 2 + 100.0 * (y - x * x) ** 2

    prm = opt_default_params(OptType.LBFGS)
    prm.lbfgs.n_iter = 200
    (x, y), fx, res, _ = opt_fn(fun, (jnp.float32(-1.2), jnp.float32(1.0)), prm)
    assert abs(float(x) - 1.0) < 1e-3
    assert abs(float(y) - 1.0) < 1e-3


def test_adam_past_window_stops_early():
    p = OptParams()
    p.past = 3
    p.delta = 1e-3
    p.adam.n_iter = 5000

    def fun(t):
        return jnp.sum(t * t)

    t, fx, res, iters = opt_fn(fun, jnp.asarray([1.0, -2.0], jnp.float32), p)
    assert res == OptResult.OK
    assert iters < 5000


def test_adamw_weight_decay_and_gclip():
    # pure decay: zero gradient direction still shrinks weights
    p = OptParams()
    p.adam.n_iter = 50
    p.adam.alpha = 0.1
    p.adam.weight_decay = 0.1
    p.adam.gclip = 1.0
    p.max_no_improvement = 0
    p.past = 0

    def fun(w):
        return jnp.sum(w * 0.0)  # zero loss, zero grad

    w, fx, res, _ = opt_fn(fun, jnp.ones((3,)), p)
    assert float(jnp.max(jnp.abs(w))) < 1.0  # decayed toward zero

    # gclip bounds the step for a huge gradient
    p2 = OptParams()
    p2.adam.n_iter = 1
    p2.adam.alpha = 0.5
    p2.adam.gclip = 1e-3
    w2, _, _, _ = opt_fn(lambda w: 1e6 * jnp.sum(w), jnp.zeros((2,)), p2)
    # with clipping the normalized Adam step is still ~alpha; just finite
    assert bool(jnp.all(jnp.isfinite(w2)))


def test_as_optax_matches_opt_adam_trajectory():
    """Our Adam exposed as an optax GradientTransformation follows the
    exact same trajectory as opt_adam's jitted step (same math, same
    order: gclip -> moments -> bias-corrected update + decoupled wd)."""
    import optax

    from ggmlsharp_tpu.optim import as_optax
    from ggmlsharp_tpu.optim.adam import _adam_step
    from ggmlsharp_tpu.optim.params import AdamParams

    a = AdamParams(alpha=0.05, weight_decay=0.01, gclip=1.0)

    def fun_vg(x):
        f = jnp.sum((x["w"] - 3.0) ** 2) + jnp.sum(jnp.abs(x["b"]))
        return f, jax.grad(lambda y: jnp.sum((y["w"] - 3.0) ** 2)
                           + jnp.sum(jnp.abs(y["b"])))(x)

    x1 = {"w": jnp.zeros((4,)), "b": jnp.ones((3,))}
    x2 = jax.tree.map(jnp.copy, x1)
    m = jax.tree.map(jnp.zeros_like, x1)
    v = jax.tree.map(jnp.zeros_like, x1)
    tx = as_optax(a)
    st = tx.init(x2)
    for t in range(1, 6):
        x1, m, v, f, _ = _adam_step(fun_vg, x1, m, v, float(t), a.alpha,
                                    a.beta1, a.beta2, a.eps,
                                    a.weight_decay, a.gclip)
        _, g = fun_vg(x2)
        upd, st = tx.update(g, st, x2)
        x2 = optax.apply_updates(x2, upd)
    for k in x1:
        # XLA fuses the jitted step differently from the eager optax
        # path — identical math, f32 rounding differs in the last ulps
        np.testing.assert_allclose(np.asarray(x1[k]), np.asarray(x2[k]),
                                   rtol=3e-5, atol=3e-6)


def test_opt_optax_with_stock_optimizer_converges():
    """ggml stopping rules drive a stock optax optimizer to the Test2
    least-squares solution."""
    import optax

    from ggmlsharp_tpu.optim import opt_optax
    from ggmlsharp_tpu.optim.params import OptParams, OptResult

    xs = jnp.linspace(-1, 1, 32)
    ys = 5.0 * xs + 10.0

    def fun_vg(p):
        def loss(p):
            return jnp.mean((p["t0"] * xs + p["t1"] - ys) ** 2)

        return loss(p), jax.grad(loss)(p)

    x0 = {"t0": jnp.zeros(()), "t1": jnp.zeros(())}
    x, f, res, it = opt_optax(fun_vg, x0, optax.adam(0.1),
                              OptParams())
    assert res == OptResult.OK or f < 1e-6
    assert abs(float(x["t0"]) - 5.0) < 1e-2
    assert abs(float(x["t1"]) - 10.0) < 1e-2
