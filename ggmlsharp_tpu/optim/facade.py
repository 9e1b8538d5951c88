"""ggml_opt facade (Ggml.cs:2263-2325): optimize a graph-layer scalar
objective w.r.t. its `set_param`-marked tensors, or any pytree objective
function. Unlike the reference (which rebuilds nothing but re-executes the
fused fwd+bwd graph per iteration), the staged objective is differentiated
with jax.value_and_grad and jitted once."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.core import Graph, GTensor, build_forward
from .adam import opt_adam
from .lbfgs import opt_lbfgs
from .params import OptParams, OptResult, OptType


def opt_fn(fun, x0, params: OptParams | None = None, callback=None):
    """Functional entry: minimize scalar fun(pytree)."""
    p = params or OptParams()
    vg = jax.value_and_grad(fun)
    if p.type == OptType.ADAM:
        return opt_adam(vg, x0, p, callback)
    return opt_lbfgs(vg, x0, p, callback)


def _stage_objective(f: GTensor):
    """Stage f's forward graph into fun(param_values_dict) -> scalar."""
    gf = build_forward(f)
    order = gf.leafs + gf.nodes
    param_nodes = [n for n in order if n.is_param]
    const_nodes = [n for n in order if n.op == "none" and not n.is_param]

    def fun(pvals):
        env = {n.uid: v for n, v in zip(param_nodes, pvals)}
        for n in const_nodes:
            env[n.uid] = n.data
        for n in order:
            if n.op != "none":
                env[n.uid] = n._fwd(*[env[s.uid] for s in n.srcs], **n.kwargs)
        out = env[f.uid]
        return jnp.reshape(out, ())

    return fun, param_nodes


def opt(f: GTensor, params: OptParams | None = None, callback=None):
    """Graph entry (ggml_opt parity): minimize scalar node f over its params;
    optimized values are written back into the param nodes' .data."""
    p = params or OptParams()
    fun, param_nodes = _stage_objective(f)
    if not param_nodes:
        return OptResult.FAIL, None
    x0 = [n.data for n in param_nodes]
    x, fx, res, iters = opt_fn(fun, x0, p, callback)
    for n, v in zip(param_nodes, x):
        n.data = v
    return res, fx
