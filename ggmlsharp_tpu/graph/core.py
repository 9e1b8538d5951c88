"""Compute-graph layer: ggml's expression-DAG API, TPU-native.

Parity with the reference's L3/L4 (SURVEY §1): tensors as DAG nodes with
``op/srcs/grad/is_param`` links (ggml_tensor, TypeDefinitions.cs:65-99),
``build_forward`` topo sort (Ggml.cs:7559-7673), and ``build_backward`` as
source-to-source VJP construction — gradients are NEW graph nodes
(Ggml.cs:7227-7557, 7675-7719), which is what makes backward-of-backward
(Hessian-vector products, Test1/Program.cs:99-110) work unchanged.

Execution is the TPU-native replacement for the reference's 3-phase
spin-barrier thread pool (Ggml.cs:3209-3736): the whole DAG stages into ONE
jitted XLA computation (compiled once per graph topology, cached), with
intermediate node values returned for inspection. XLA owns scheduling,
fusion, and memory planning — there is no n_tasks planner, no work buffer,
no arena.

Differences from the reference by design (SURVEY §7 idiomatic mapping):
  * grads exist for every differentiable op (the reference asserts-false on
    mean/gelu/silu/norm/rms_norm/scale/cpy/transpose and mul_mat-wrt-src0);
  * no 4096-node cap, no 64-context cap, no arena sizing;
  * quantized tensors (QTensor) are first-class leaf values.

Seeding protocol matches ggml: ``graph_reset`` zeros every grad seed, the
caller sets ``f.grad.data = 1`` then computes the backward graph
(cf. Test1/Program.cs:35-44).
"""
from __future__ import annotations

import itertools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..quant.formats import QTensor

_counter = itertools.count()


class GTensor:
    """A DAG node. Leaf (op == 'none') holds a concrete value in ``.data``;
    interior nodes hold op + sources + static kwargs. After a Graph.compute,
    ``.data`` on every evaluated node holds its value."""

    __slots__ = (
        "uid", "op", "srcs", "kwargs", "data", "grad", "is_param", "name",
        "_fwd", "shape", "dtype",
    )

    def __init__(self, op, srcs=(), kwargs=None, data=None, name=None, fwd=None):
        self.uid = next(_counter)
        self.op = op
        self.srcs = tuple(srcs)
        self.kwargs = dict(kwargs or {})
        self.data = data
        self.grad = None
        self.is_param = False
        self.name = name or f"{op}_{self.uid}"
        self._fwd = fwd
        self.shape, self.dtype = _infer_shape(self)

    # graph-building sugar
    def __add__(self, o):
        from . import builders as B

        return B.add(self, B.as_node(o))

    def __mul__(self, o):
        from . import builders as B

        return B.mul(self, B.as_node(o))

    def __sub__(self, o):
        from . import builders as B

        return B.sub(self, B.as_node(o))

    def __neg__(self):
        from . import builders as B

        return B.neg(self)

    def __repr__(self):
        return f"GTensor({self.name}, op={self.op}, shape={self.shape})"


def _eval_shape(node: "GTensor"):
    def fake(t):
        if isinstance(t, QTensor):
            return t
        return jax.ShapeDtypeStruct(t.shape, t.dtype)

    srcs = [fake(s) for s in node.srcs]
    out = jax.eval_shape(lambda *a: node._fwd(*a, **node.kwargs), *srcs)
    return out.shape, out.dtype


def _infer_shape(node: "GTensor"):
    if node.op == "none":
        d = node.data
        if isinstance(d, QTensor):
            return d.shape, "quant:" + str(int(d.gtype))
        if d is None:
            return None, None
        return tuple(jnp.shape(d)), jnp.result_type(d)
    try:
        return _eval_shape(node)
    except Exception as e:
        # Fail at BUILDER time with the op and operand shapes, matching
        # the reference's build-time asserts (Ggml.cs:8228-8229) — a
        # swallowed error here used to resurface at stage time as an
        # opaque shape=None failure.
        srcs = ", ".join(str(getattr(s, "shape", None)) for s in node.srcs)
        raise ValueError(
            f"ggml op '{node.op}' rejected operand shapes [{srcs}]: {e}"
        ) from e


def leaf(value, name=None) -> GTensor:
    """ggml_new_tensor analog: a concrete leaf."""
    if not isinstance(value, QTensor):
        value = jnp.asarray(value)
    return GTensor("none", data=value, name=name)


def set_param(t: GTensor) -> GTensor:
    """ggml_set_param (Ggml.cs:3787-3795): mark trainable, allocate grad seed."""
    t.is_param = True
    if t.grad is None:
        t.grad = leaf(jnp.zeros(t.shape, t.dtype), name=f"grad[{t.name}]")
    return t


class Graph:
    """ggml_cgraph analog: topo-ordered nodes + leafs (Ggml.cs:7625-7673)."""

    def __init__(self):
        self.nodes: list[GTensor] = []
        self.leafs: list[GTensor] = []
        self._seen: set[int] = set()
        self._compiled = None
        self._key = None
        # perf counters (ggml perf parity, TypeDefinitions.cs:118-121)
        self.perf_runs = 0
        self.perf_time_us = 0.0

    def visit(self, t: GTensor):
        """ggml_visit_parents (Ggml.cs:7559-7623): post-order DFS, O(1) dedup
        via set (the reference's linear scan is O(n²), Ggml.cs:7572-7587).
        Iterative — backward-of-backward graphs get deep."""
        stack = [(t, False)]
        while stack:
            n, expanded = stack.pop()
            if expanded:
                if n.op == "none" and not n.is_param and n.grad is None:
                    self.leafs.append(n)
                else:
                    self.nodes.append(n)
                continue
            if n.uid in self._seen:
                continue
            self._seen.add(n.uid)
            stack.append((n, True))
            for s in reversed(n.srcs):
                stack.append((s, False))

    def build_expand(self, t: GTensor):
        """ggml_build_forward_expand: add another output to this graph."""
        self.visit(t)
        self._compiled = None

    # --- execution -------------------------------------------------------
    def _stage(self):
        """Build fun(leaf_values, node_seed_values) -> all node values."""
        order = self.leafs + [n for n in self.nodes if n.op == "none"] + [
            n for n in self.nodes if n.op != "none"
        ]
        inputs = [n for n in order if n.op == "none"]
        computed = [n for n in order if n.op != "none"]
        uid_pos = {n.uid: i for i, n in enumerate(inputs)}

        def fun(in_vals):
            env = {n.uid: in_vals[uid_pos[n.uid]] for n in inputs}
            outs = []
            for n in computed:
                val = n._fwd(*[env[s.uid] for s in n.srcs], **n.kwargs)
                env[n.uid] = val
                outs.append(val)
            return outs

        return inputs, computed, fun

    def compute(self):
        """ggml_graph_compute analog: jit the staged DAG (cached on topology),
        run, and store per-node values back into ``.data``."""
        import time

        t0 = time.perf_counter()
        inputs, computed, fun = self._stage()
        key = tuple(n.uid for n in inputs + computed)
        if self._compiled is None or self._key != key:
            self._compiled = jax.jit(fun)
            self._key = key
        vals = self._compiled([n.data for n in inputs])
        for n, v in zip(computed, vals):
            n.data = v
        self.perf_runs += 1
        self.perf_time_us += (time.perf_counter() - t0) * 1e6
        return self

    def reset(self):
        """ggml_graph_reset (Ggml.cs:3738-3749): zero every grad SEED leaf."""
        for n in self.nodes + self.leafs:
            g = n.grad
            if g is not None and g.op == "none" and g.data is not None:
                g.data = jnp.zeros_like(g.data)
        return self


def set_f32(t: GTensor, v) -> GTensor:
    """ggml_set_f32 analog: fill a leaf/param with a scalar (Ggml.cs:2436)."""
    t.data = jnp.full(t.shape, v, t.dtype)
    return t


def set_data(t: GTensor, value) -> GTensor:
    value = jnp.asarray(value)
    assert tuple(value.shape) == tuple(t.shape), (value.shape, t.shape)
    t.data = value
    return t


def get_f32_1d(t: GTensor, i: int) -> float:
    """ggml_get_f32_1d analog (Ggml.cs:2802)."""
    return float(jnp.ravel(t.data)[i])


def build_forward(t: GTensor) -> Graph:
    g = Graph()
    g.visit(t)
    return g


def build_backward(gf: Graph, keep: bool = False) -> Graph:
    """ggml_build_backward (Ggml.cs:7675-7719).

    Walks the forward graph in reverse accumulating VJP expression nodes into
    ``src.grad``. With ``keep=True`` the original grad seeds stay referenced
    as inputs of the new expressions (detached), enabling
    backward-of-backward / HVPs exactly as Test1 exercises.
    """
    from .op_defs import VJP_TABLE
    from . import builders as B

    gb = Graph()
    gb.nodes = list(gf.nodes)
    gb.leafs = list(gf.leafs)
    gb._seen = set(gf._seen)
    walk = list(gf.nodes)

    # nodes on a path from a param to an output need grads (ggml gets this
    # from builders allocating result.grad whenever a src has grad)
    need = {n.uid for n in walk if n.is_param}
    changed = True
    while changed:
        changed = False
        for n in walk:
            if n.uid not in need and any(s.uid in need for s in n.srcs):
                need.add(n.uid)
                changed = True

    if keep:
        # detach: every grad becomes a FRESH seed so the previous backward
        # graph's grad tensors survive (Ggml.cs:7682-7694) — this is what
        # lets gbb = build_backward(gb, keep=True) compute HVPs
        for n in walk:
            if n.grad is not None:
                n.grad = leaf(jnp.zeros(n.shape, n.dtype), name=f"grad[{n.name}]")

    for n in walk:
        if n.uid in need and n.grad is None:
            n.grad = leaf(jnp.zeros(n.shape, n.dtype), name=f"grad[{n.name}]")

    for n in reversed(walk):
        if n.grad is None or n.op == "none":
            continue
        vjp = VJP_TABLE.get(n.op) or _generic_vjp
        gsrcs = vjp(n, n.grad)
        for s, gs in zip(n.srcs, gsrcs):
            if gs is None:
                continue
            if isinstance(s.data, QTensor):
                continue  # quantized leafs are not differentiable
            if s.uid not in need and s.grad is None:
                continue  # constants (ggml: src without grad is skipped)
            if s.grad is None:
                s.grad = leaf(jnp.zeros(s.shape, s.dtype), name=f"grad[{s.name}]")
            s.grad = B.add(s.grad, gs)

    for n in walk:
        if n.is_param and n.grad is not None:
            gb.build_expand(n.grad)
    return gb


def _generic_vjp(node: GTensor, g: GTensor):
    """Fallback VJP: stage jax.vjp of the node's forward fn as one graph node
    per differentiable source. Higher-order diff works because jax
    differentiates through vjp closures."""
    fwd = node._fwd
    kwargs = dict(node.kwargs)
    outs = []
    for i, s in enumerate(node.srcs):
        if isinstance(s.data, QTensor) or (isinstance(s.dtype, str)):
            outs.append(None)
            continue

        def make(i):
            def vjp_i(*vals):
                *src_vals, gval = vals

                def f(x):
                    sv = list(src_vals)
                    sv[i] = x
                    return fwd(*sv, **kwargs)

                _, pull = jax.vjp(f, src_vals[i])
                return pull(gval)[0]

            return vjp_i

        outs.append(
            GTensor(
                f"vjp{i}[{node.op}]",
                srcs=(*node.srcs, g),
                fwd=make(i),
                name=f"vjp{i}[{node.name}]",
            )
        )
    return outs
