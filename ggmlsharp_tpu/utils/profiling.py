"""Per-op profiling rollup (ggml_graph_print parity, Ggml.cs:2888-2936).

The reference accumulates per-node cycles/us in its node loop and prints a
per-op rollup — the one profiling idea BASELINE says to keep. Here:

  * `graph_print(graph)` — the graph-layer analog: per-node table + per-op
    totals, using real wall timings when the graph was computed with
    `OpProfiler` (un-jitted per-node timing), otherwise shape/op structure.
  * `OpProfiler` — times each node's op eagerly (accurate per-op attribution
    at the cost of fusion) — the moral equivalent of GGML_PERF builds.
  * For production profiles use `jax.profiler.trace` around jitted calls —
    XLA fusion makes per-op host timing meaningless there, which is exactly
    why the reference's counters don't map 1:1 onto TPU.
"""
from __future__ import annotations

import time
from collections import defaultdict

import jax

from ..graph.core import Graph


class OpProfiler:
    """Compute a Graph node-by-node (no whole-graph jit) collecting per-op
    wall time. Each node's fwd is jitted individually and timed over `iters`
    runs after a warmup."""

    def __init__(self, iters: int = 3):
        self.iters = iters
        self.per_node: list[tuple[str, str, float]] = []  # (name, op, us)

    def compute(self, graph: Graph):
        env = {}
        order = graph.leafs + graph.nodes
        for n in order:
            if n.op == "none":
                env[n.uid] = n.data
                continue
            fn = jax.jit(lambda *a, _n=n: _n._fwd(*a, **_n.kwargs))
            args = [env[s.uid] for s in n.srcs]
            out = jax.block_until_ready(fn(*args))  # warmup/compile
            t0 = time.perf_counter()
            for _ in range(self.iters):
                out = jax.block_until_ready(fn(*args))
            us = (time.perf_counter() - t0) / self.iters * 1e6
            env[n.uid] = out
            n.data = out
            self.per_node.append((n.name, n.op, us))
        graph.perf_runs += 1
        return graph

    def report(self) -> str:
        lines = ["=== per-node profile ==="]
        for name, op, us in self.per_node:
            lines.append(f"  {name:<32} {op:<14} {us:10.1f} us")
        totals = defaultdict(float)
        for _, op, us in self.per_node:
            totals[op] += us
        lines.append("=== per-op rollup ===")
        for op, us in sorted(totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {op:<14} {us:10.1f} us")
        return "\n".join(lines)


def graph_print(graph: Graph) -> str:
    """ggml_graph_print analog: structure + perf counters."""
    lines = [f"=== GRAPH ===",
             f"n_nodes = {len(graph.nodes)}",
             f"n_leafs = {len(graph.leafs)}",
             f"perf_runs = {graph.perf_runs}, total_us = {graph.perf_time_us:.0f}"]
    for i, n in enumerate(graph.nodes):
        lines.append(
            f" - {i:3}: {str(n.shape):<20} {n.op:<14} "
            f"{'param' if n.is_param else ''}{' grad' if n.grad is not None else ''}"
        )
    for i, n in enumerate(graph.leafs):
        lines.append(f" - leaf {i:3}: {str(n.shape):<20} {n.name}")
    out = "\n".join(lines)
    print(out)
    return out
