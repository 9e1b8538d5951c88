"""optax interop for the ggml-parity optimizers.

Two directions (SURVEY §7.5: "Adam ... as optax-style transforms"):

  * `as_optax(adam_params)` — this framework's Adam (the exact
    `_adam_step` math: optional global-norm grad clip, bias-corrected
    moments, decoupled weight decay inside the update) as an
    `optax.GradientTransformation`, drop-in for any optax training loop.
  * `opt_optax(fun_vg, x0, tx, params)` — ggml's stopping rules
    (relative Δf < eps_f, `past`-window delta test, max-no-improvement
    patience; Ggml.cs:1738-1780) driving ANY optax transformation.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .params import AdamParams, OptParams, OptResult


class _AdamState(NamedTuple):
    count: jnp.ndarray
    m: object
    v: object


def as_optax(a: AdamParams | None = None) -> optax.GradientTransformation:
    """This framework's Adam as an optax GradientTransformation — update
    math identical to optim.adam._adam_step (trajectory-equal, tested)."""
    a = a or AdamParams()

    def init(params):
        return _AdamState(
            jnp.zeros((), jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        if a.gclip > 0:
            gn = jnp.sqrt(sum(jnp.sum(gi.astype(jnp.float32) ** 2)
                              for gi in jax.tree.leaves(grads)))
            scale = jnp.minimum(1.0, a.gclip / jnp.maximum(gn, 1e-30))
            grads = jax.tree.map(lambda gi: gi * scale, grads)
        t = state.count + 1
        m = jax.tree.map(lambda mi, gi: a.beta1 * mi + (1 - a.beta1) * gi,
                         state.m, grads)
        v = jax.tree.map(
            lambda vi, gi: a.beta2 * vi + (1 - a.beta2) * gi * gi,
            state.v, grads)
        tf = t.astype(jnp.float32)
        bc1 = 1 - a.beta1 ** tf
        bc2 = 1 - a.beta2 ** tf
        if params is None and a.weight_decay > 0:
            raise ValueError("weight_decay needs params passed to update()")
        updates = jax.tree.map(
            lambda mi, vi, xi: -a.alpha * (
                (mi / bc1) / (jnp.sqrt(vi / bc2) + a.eps)
                + a.weight_decay * xi
            ),
            m, v,
            params if params is not None
            else jax.tree.map(jnp.zeros_like, m),
        )
        return updates, _AdamState(t, m, v)

    return optax.GradientTransformation(init, update)


def opt_optax(fun_vg, x0, tx: optax.GradientTransformation,
              params: OptParams | None = None, callback=None):
    """Minimize fun with any optax transformation under ggml's stopping
    rules. fun_vg: x -> (f, grads). Returns (x, f, OptResult, n_iters) —
    the same contract as optim.opt_adam."""
    p = params or OptParams()
    a = p.adam  # stopping knobs (n_iter/eps_f/past/max_no_improvement)
    x = jax.tree.map(jnp.asarray, x0)
    state = tx.init(x)

    @partial(jax.jit, static_argnums=())
    def step(x, state):
        f, g = fun_vg(x)
        updates, state = tx.update(g, state, x)
        return optax.apply_updates(x, updates), state, f

    fx_prev = fx_best = None
    n_no_improvement = 0
    pf = []
    result = OptResult.DID_NOT_CONVERGE
    it = 0
    for it in range(1, a.n_iter + 1):
        x_new, state_new, f = step(x, state)
        f = float(f)
        if callback:
            callback(it, f)
        if fx_prev is not None:
            if abs(f - fx_prev) / max(abs(f), 1e-30) < a.eps_f:
                x, state = x_new, state_new
                result = OptResult.OK
                break
        if p.past > 0:  # identical to opt_adam's window-rate test
            if len(pf) == p.past:
                if abs((pf[0] - f) / p.past) < p.delta:
                    x, state = x_new, state_new
                    result = OptResult.OK
                    break
                pf.pop(0)
            pf.append(f)
        if p.max_no_improvement > 0:
            if fx_best is None or f < fx_best:
                fx_best, n_no_improvement = f, 0
            else:
                n_no_improvement += 1
                if n_no_improvement >= p.max_no_improvement:
                    x, state = x_new, state_new
                    result = OptResult.OK
                    break
        x, state, fx_prev = x_new, state_new, f
    f_final = float(fun_vg(x)[0])
    return x, f_final, result, it
