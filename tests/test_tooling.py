"""Observability parity tests: graph_print, dot export, per-op profiler."""
import os

import jax.numpy as jnp

from ggmlsharp_tpu.graph import builders as B, build_backward, build_forward, leaf, set_param
from ggmlsharp_tpu.utils import OpProfiler, graph_dump_dot, graph_print


def _small_graph():
    x = set_param(leaf(jnp.ones((4,), jnp.float32)))
    a = leaf(jnp.full((4,), 2.0, jnp.float32))
    f = B.sum(B.mul(B.sqr(x), a))
    return x, f


def test_graph_print_contains_structure():
    x, f = _small_graph()
    gf = build_forward(f)
    out = graph_print(gf)
    assert "n_nodes" in out and "sqr" in out and "mul" in out and "sum" in out
    assert "param" in out


def test_dump_dot(tmp_path):
    x, f = _small_graph()
    gf = build_forward(f)
    gb = build_backward(gf, keep=False)
    p = str(tmp_path / "g.dot")
    out = graph_dump_dot(gb, gf, p)
    assert os.path.exists(p)
    assert "digraph G" in out
    assert "yellow" in out  # param coloring
    assert "->" in out


def test_op_profiler_rollup():
    x, f = _small_graph()
    gf = build_forward(f)
    prof = OpProfiler(iters=2)
    prof.compute(gf)
    rep = prof.report()
    assert "per-op rollup" in rep
    assert "mul" in rep and "sum" in rep
    assert float(jnp.ravel(f.data)[0]) == 8.0  # values computed correctly
