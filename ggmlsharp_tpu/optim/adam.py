"""Adam (ggml_opt_adam parity, Ggml.cs:1610-1794).

Classic bias-corrected Adam with ggml's three stopping rules
(Ggml.cs:1738-1780): relative Δf < eps_f, `past`-window delta test, and
max-no-improvement patience. The update itself runs as one jitted step over
the parameter pytree (the reference flattens params into f32 workspaces via
element-wise copies it itself marks "TODO: this is slow", Ggml.cs:3130-3170 —
a pytree of device arrays needs no flattening).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .params import OptParams, OptResult


@partial(jax.jit, static_argnums=(0, 9, 10))
def _adam_step(fun_vg, x, m, v, t, alpha, beta1, beta2, eps, wd, gclip):
    f, g = fun_vg(x)
    if gclip > 0:  # global-norm clip (later-ggml gclip); static knob
        gn = jnp.sqrt(sum(jnp.sum(gi.astype(jnp.float32) ** 2)
                          for gi in jax.tree.leaves(g)))
        scale = jnp.minimum(1.0, gclip / jnp.maximum(gn, 1e-30))
        g = jax.tree.map(lambda gi: gi * scale, g)
    m = jax.tree.map(lambda mi, gi: beta1 * mi + (1 - beta1) * gi, m, g)
    v = jax.tree.map(lambda vi, gi: beta2 * vi + (1 - beta2) * gi * gi, v, g)
    bc1 = 1 - beta1**t
    bc2 = 1 - beta2**t
    x = jax.tree.map(
        lambda xi, mi, vi: xi - alpha * (
            (mi / bc1) / (jnp.sqrt(vi / bc2) + eps) + wd * xi
        ),
        x, m, v,
    )
    gnorm = jnp.sqrt(
        sum(jnp.sum(gi.astype(jnp.float32) ** 2) for gi in jax.tree.leaves(g))
    )
    return x, m, v, f, gnorm


def opt_adam(fun_vg, x0, params: OptParams | None = None, callback=None):
    """Minimize fun(x) with Adam.

    fun_vg: x -> (f, grad_pytree) (jittable).
    Returns (x, f, OptResult, n_iters).
    """
    p = params or OptParams()
    a = p.adam
    x = jax.tree.map(jnp.asarray, x0)
    m = jax.tree.map(jnp.zeros_like, x)
    v = jax.tree.map(jnp.zeros_like, x)

    fx_prev = None
    fx_best = None
    n_no_improvement = 0
    pf = []  # past-window of f values (Ggml.cs:1664-1669)

    for it in range(1, a.n_iter + 1):
        x_new, m, v, f, gnorm = _adam_step(
            fun_vg, x, m, v, float(it), a.alpha, a.beta1, a.beta2, a.eps,
            a.weight_decay, a.gclip,
        )
        f = float(f)
        if callback:
            callback(it, f)

        # convergence checks mirror Ggml.cs:1738-1780 (checked on the f
        # BEFORE the step was applied, like the reference's re-eval order)
        if fx_prev is not None:
            if abs(f - fx_prev) / max(abs(f), 1e-30) < a.eps_f:
                x = x_new
                return x, f, OptResult.OK, it
        if p.past > 0:
            if len(pf) == p.past:
                rate = (pf[0] - f) / p.past
                if abs(rate) < p.delta:
                    x = x_new
                    return x, f, OptResult.OK, it
                pf.pop(0)
            pf.append(f)
        if p.max_no_improvement > 0:
            if fx_best is None or f < fx_best:
                fx_best = f
                n_no_improvement = 0
            else:
                n_no_improvement += 1
                if n_no_improvement >= p.max_no_improvement:
                    x = x_new
                    return x, f, OptResult.OK, it

        fx_prev = f
        x = x_new

    return x, fx_prev, OptResult.DID_NOT_CONVERGE, a.n_iter
