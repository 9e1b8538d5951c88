"""L-BFGS with backtracking line search (ggml_opt_lbfgs parity,
Ggml.cs:1939-2189; linesearch_backtracking, Ggml.cs:1812-1937).

m-history two-loop recursion; Armijo / Wolfe / strong-Wolfe backtracking;
convergence on ‖g‖/max(1,‖x‖) < eps plus the shared `past`-window delta test.

Two execution forms:
  * `opt_lbfgs_jit` — TPU-native (SURVEY §7 "hard parts"): the ENTIRE
    optimization (outer iterations, line search, two-loop recursion,
    stopping rules) runs inside one `lax.while_loop` under jit — zero host
    round-trips per probe. History lives in fixed [m, n] circular buffers.
  * `opt_lbfgs_host` — host-driven loop, one jitted evaluation per probe
    (the reference's probes are full graph recomputes, Ggml.cs:1862-1873);
    supports per-iteration callbacks.

`opt_lbfgs` dispatches: jit-resident unless a callback is given.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .params import LineSearch, OptParams, OptResult


def _flatten(x):
    leaves, treedef = jax.tree.flatten(x)
    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    flat = jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])
    def unflatten(v):
        out, off = [], 0
        for s, n in zip(shapes, sizes):
            out.append(v[off : off + n].reshape(s))
            off += n
        return jax.tree.unflatten(treedef, out)
    return flat, unflatten


# in-graph status codes (mapped to OptResult on exit)
_RUNNING, _OK, _FAIL, _MAXLS, _NOCONV = 0, 1, 2, 3, 4
_STATUS_MAP = {
    _OK: OptResult.OK,
    _FAIL: OptResult.FAIL,
    _MAXLS: OptResult.LBFGS_MAX_LINESEARCH,
    _NOCONV: OptResult.DID_NOT_CONVERGE,
}


def opt_lbfgs_jit(fun_vg, x0, params: OptParams | None = None):
    """Jit-resident L-BFGS: outer iterations + line search + two-loop all
    inside one `lax.while_loop` — zero host syncs per probe (SURVEY §7; the
    reference host-loops with a full graph recompute per probe,
    Ggml.cs:1862-1873, 2067). History in [m, n] circular buffers indexed
    with traced offsets. Semantics match `opt_lbfgs_host` (same stopping
    rules, same result codes)."""
    p = params or OptParams()
    lp = p.lbfgs
    m = lp.m
    past = p.past
    mni = p.max_no_improvement
    f32 = jnp.float32

    x_flat, unflatten = _flatten(x0)
    n = x_flat.shape[0]

    def vg(xf):
        f, g = fun_vg(unflatten(xf))
        gf, _ = _flatten(g)
        return f.astype(f32), gf

    def two_loop(g, s_buf, y_buf, hlen, hpos):
        """−H·g via the m-history two-loop recursion (Ggml.cs:2159-2183).
        Logical entry i (newest-first) lives at (hpos − 1 − i) mod m."""
        alphas = jnp.zeros((m,), f32)
        rhos = jnp.zeros((m,), f32)

        def bwd(i, carry):
            q, alphas, rhos = carry
            live = i < hlen
            idx = (hpos - 1 - i) % m
            s, y = s_buf[idx], y_buf[idx]
            ys = jnp.vdot(y, s)
            rho = jnp.where(ys != 0, 1.0 / jnp.where(ys != 0, ys, 1.0), 0.0)
            alpha = rho * jnp.vdot(s, q)
            upd = live & (rho != 0)
            q = jnp.where(upd, q - alpha * y, q)
            alphas = alphas.at[idx].set(jnp.where(upd, alpha, 0.0))
            rhos = rhos.at[idx].set(jnp.where(upd, rho, 0.0))
            return q, alphas, rhos

        q, alphas, rhos = lax.fori_loop(0, m, bwd, (g, alphas, rhos))
        last = (hpos - 1) % m
        yy = jnp.vdot(y_buf[last], y_buf[last])
        ys = jnp.vdot(y_buf[last], s_buf[last])
        gamma = jnp.where(yy > 0, ys / jnp.where(yy > 0, yy, 1.0), 1.0)
        q = q * gamma

        def fwd(i, q):
            live = i < hlen
            idx = (hpos - hlen + i) % m
            rho = rhos[idx]
            beta = rho * jnp.vdot(y_buf[idx], q)
            return jnp.where(live & (rho != 0),
                             q + s_buf[idx] * (alphas[idx] - beta), q)

        return -lax.fori_loop(0, m, fwd, q)

    def linesearch(xp, gp, fxp, d, step0):
        """Backtracking Armijo/Wolfe/strong-Wolfe (Ggml.cs:1812-1937) as a
        while_loop. Returns (step, x, f, g, ok, fail_range, count)."""
        dginit = jnp.vdot(gp, d)
        dgtest = lp.ftol * dginit
        dec, inc = f32(0.5), f32(2.1)

        def cond(c):
            step, count, x_t, f_t, g_t, ok, fail = c
            return (~ok) & (~fail) & (count < lp.max_linesearch)

        def body(c):
            step, count, _, _, _, _, _ = c
            x_t = xp + step * d
            f_t, g_t = vg(x_t)
            count = count + 1
            armijo_fail = f_t > fxp + step * dgtest
            dg = jnp.vdot(g_t, d)
            if lp.linesearch == LineSearch.ARMIJO:
                ok = ~armijo_fail
                width = dec
            elif lp.linesearch == LineSearch.WOLFE:
                curv_low = dg < lp.wolfe * dginit
                ok = (~armijo_fail) & (~curv_low)
                width = jnp.where(armijo_fail, dec, inc)
            else:  # strong Wolfe
                curv_low = dg < lp.wolfe * dginit
                curv_high = dg > -lp.wolfe * dginit
                ok = (~armijo_fail) & (~curv_low) & (~curv_high)
                width = jnp.where(armijo_fail, dec,
                                  jnp.where(curv_low, inc, dec))
            new_step = jnp.where(ok, step, step * width)
            fail = (~ok) & ((new_step < lp.min_step) | (new_step > lp.max_step))
            return new_step, count, x_t, f_t, g_t, ok, fail

        init = (jnp.asarray(step0, f32), jnp.int32(0), xp, jnp.asarray(fxp, f32),
                gp, jnp.array(False), jnp.array(False))
        step, count, x_t, f_t, g_t, ok, fail = lax.while_loop(cond, body, init)
        return step, x_t, f_t, g_t, ok, fail, dginit

    def run(x0f):
        fx0, g0 = vg(x0f)
        xnorm0 = jnp.linalg.norm(x0f)
        gnorm0 = jnp.linalg.norm(g0)
        converged0 = gnorm0 / jnp.maximum(1.0, xnorm0) <= lp.eps

        state0 = dict(
            x=x0f, g=g0, fx=fx0,
            d=-g0, step=1.0 / jnp.maximum(gnorm0, 1e-30),
            it=jnp.int32(0),
            status=jnp.where(converged0, jnp.int32(_OK), jnp.int32(_RUNNING)),
            s_buf=jnp.zeros((m, n), f32), y_buf=jnp.zeros((m, n), f32),
            hlen=jnp.int32(0), hpos=jnp.int32(0),
            pf=jnp.zeros((max(past, 1),), f32), pf_len=jnp.int32(0),
            fx_best=fx0, n_noimp=jnp.int32(0),
        )

        def cond(st):
            return (st["status"] == _RUNNING) & (st["it"] < lp.n_iter)

        def body(st):
            xp, gp, fxp = st["x"], st["g"], st["fx"]
            it = st["it"] + 1
            step, x_t, f_t, g_t, ok, fail_rng, dginit = linesearch(
                xp, gp, fxp, st["d"], st["step"])
            fail_dir = dginit > 0
            accepted = ok & ~fail_dir

            x = jnp.where(accepted, x_t, xp)
            g = jnp.where(accepted, g_t, gp)
            fx = jnp.where(accepted, f_t, fxp)

            status = jnp.where(
                fail_dir | fail_rng, jnp.int32(_FAIL),
                jnp.where(~ok, jnp.int32(_MAXLS), st["status"]))

            # convergence tests (Ggml.cs:2086-2123)
            xnorm = jnp.linalg.norm(x)
            gnorm = jnp.linalg.norm(g)
            conv = gnorm / jnp.maximum(1.0, xnorm) <= lp.eps

            pf, pf_len = st["pf"], st["pf_len"]
            if past > 0:
                window_full = pf_len == past
                rate = (pf[0] - fx) / past
                delta_stop = window_full & (jnp.abs(rate) < p.delta)
                pf = jnp.where(window_full, jnp.roll(pf, -1), pf)
                pf_len2 = jnp.where(window_full, pf_len, pf_len + 1)
                pf = pf.at[jnp.minimum(pf_len2 - 1, past - 1)].set(fx)
                conv = conv | delta_stop
            else:
                pf_len2 = pf_len

            improved = fx < st["fx_best"]
            fx_best = jnp.where(improved, fx, st["fx_best"])
            n_noimp = jnp.where(improved, jnp.int32(0), st["n_noimp"] + 1)
            if mni > 0:
                conv = conv | (n_noimp >= mni)

            status = jnp.where((status == _RUNNING) & accepted & conv,
                               jnp.int32(_OK), status)

            # history + new direction (only when accepted and still running)
            s_new = x - xp
            y_new = g - gp
            hpos, hlen = st["hpos"], st["hlen"]
            s_buf = st["s_buf"].at[hpos].set(
                jnp.where(accepted, s_new, st["s_buf"][hpos]))
            y_buf = st["y_buf"].at[hpos].set(
                jnp.where(accepted, y_new, st["y_buf"][hpos]))
            hpos2 = jnp.where(accepted, (hpos + 1) % m, hpos)
            hlen2 = jnp.where(accepted, jnp.minimum(hlen + 1, m), hlen)
            d = jnp.where(accepted,
                          two_loop(g, s_buf, y_buf, hlen2, hpos2), st["d"])

            return dict(
                x=x, g=g, fx=fx, d=d,
                step=jnp.where(accepted, f32(1.0), step),
                it=it, status=status,
                s_buf=s_buf, y_buf=y_buf, hlen=hlen2, hpos=hpos2,
                pf=pf, pf_len=pf_len2, fx_best=fx_best, n_noimp=n_noimp,
            )

        st = lax.while_loop(cond, body, state0)
        final_status = jnp.where(st["status"] == _RUNNING,
                                 jnp.int32(_NOCONV), st["status"])
        return st["x"], st["fx"], final_status, st["it"]

    xf, fx, status, it = jax.jit(run)(x_flat)
    return (unflatten(xf), float(fx),
            _STATUS_MAP[int(status)], int(it))


def opt_lbfgs(fun_vg, x0, params: OptParams | None = None, callback=None):
    """Minimize fun(x). fun_vg: x -> (f, grad) (jittable pytree fn).
    Returns (x, f, OptResult, n_iters). Dispatches to the jit-resident form
    unless a per-iteration callback is requested."""
    if callback is None:
        return opt_lbfgs_jit(fun_vg, x0, params)
    return opt_lbfgs_host(fun_vg, x0, params, callback)


def opt_lbfgs_host(fun_vg, x0, params: OptParams | None = None, callback=None):
    """Minimize fun(x). fun_vg: x -> (f, grad) (jittable pytree fn).
    Returns (x, f, OptResult, n_iters)."""
    p = params or OptParams()
    lp = p.lbfgs
    m = lp.m

    x_flat, unflatten = _flatten(x0)

    @jax.jit
    def vg(xf):
        f, g = fun_vg(unflatten(xf))
        gf, _ = _flatten(g)
        return f.astype(jnp.float32), gf

    fx, g = vg(x_flat)
    fx = float(fx)
    if callback:
        callback(0, fx)

    xnorm = float(jnp.linalg.norm(x_flat))
    gnorm = float(jnp.linalg.norm(g))
    if gnorm / max(1.0, xnorm) <= lp.eps:
        return unflatten(x_flat), fx, OptResult.OK, 0

    d = -g  # initial direction: steepest descent (Ggml.cs:2007)
    step = 1.0 / max(gnorm, 1e-30)

    s_hist = []  # x_{k+1} - x_k
    y_hist = []  # g_{k+1} - g_k
    pf = []
    fx_best = fx
    n_no_improvement = 0

    for it in range(1, lp.n_iter + 1):
        xp, gp, fxp = x_flat, g, fx

        # --- backtracking line search (Ggml.cs:1812-1937) ---------------
        dginit = float(jnp.vdot(gp, d))
        if dginit > 0:
            return unflatten(x_flat), fx, OptResult.FAIL, it
        dec, inc = 0.5, 2.1
        count = 0
        finit = fxp
        dgtest = lp.ftol * dginit
        ok = False
        while count < lp.max_linesearch:
            x_try = xp + step * d
            f_try, g_try = vg(x_try)
            f_try = float(f_try)
            count += 1
            if f_try > finit + step * dgtest:
                width = dec
            else:
                if lp.linesearch == LineSearch.ARMIJO:
                    ok = True
                else:
                    dg = float(jnp.vdot(g_try, d))
                    if dg < lp.wolfe * dginit:
                        width = inc
                    elif lp.linesearch == LineSearch.WOLFE:
                        ok = True
                    elif dg > -lp.wolfe * dginit:
                        width = dec
                    else:
                        ok = True
            if ok:
                break
            step *= width
            if step < lp.min_step or step > lp.max_step:
                return unflatten(xp), fxp, OptResult.FAIL, it
        if not ok:
            return unflatten(xp), fxp, OptResult.LBFGS_MAX_LINESEARCH, it

        x_flat, g, fx = x_try, g_try, f_try
        if callback:
            callback(it, fx)

        # --- convergence (Ggml.cs:2086-2123) ----------------------------
        xnorm = float(jnp.linalg.norm(x_flat))
        gnorm = float(jnp.linalg.norm(g))
        if gnorm / max(1.0, xnorm) <= lp.eps:
            return unflatten(x_flat), fx, OptResult.OK, it
        if p.past > 0:
            if len(pf) == p.past:
                rate = (pf[0] - fx) / p.past
                if abs(rate) < p.delta:
                    return unflatten(x_flat), fx, OptResult.OK, it
                pf.pop(0)
            pf.append(fx)
        if p.max_no_improvement > 0:
            if fx < fx_best:
                fx_best = fx
                n_no_improvement = 0
            else:
                n_no_improvement += 1
                if n_no_improvement >= p.max_no_improvement:
                    return unflatten(x_flat), fx, OptResult.OK, it

        # --- history + two-loop recursion (Ggml.cs:2131-2183) -----------
        s_hist.append(x_flat - xp)
        y_hist.append(g - gp)
        if len(s_hist) > m:
            s_hist.pop(0)
            y_hist.pop(0)

        q = g
        alphas = []
        for s, y in zip(reversed(s_hist), reversed(y_hist)):
            ys = float(jnp.vdot(y, s))
            if ys == 0.0:
                alphas.append((0.0, 0.0))
                continue
            rho = 1.0 / ys
            alpha = rho * float(jnp.vdot(s, q))
            q = q - alpha * y
            alphas.append((rho, alpha))
        s_last, y_last = s_hist[-1], y_hist[-1]
        yy = float(jnp.vdot(y_last, y_last))
        ys = float(jnp.vdot(y_last, s_last))
        gamma = ys / yy if yy > 0 else 1.0
        q = q * gamma
        for (rho, alpha), (s, y) in zip(reversed(alphas), zip(s_hist, y_hist)):
            if rho == 0.0:
                continue
            beta = rho * float(jnp.vdot(y, q))
            q = q + s * (alpha - beta)

        d = -q
        step = 1.0

    return unflatten(x_flat), fx, OptResult.DID_NOT_CONVERGE, lp.n_iter
