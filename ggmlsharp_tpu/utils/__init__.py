"""Observability & tooling (reference L7 parity, SURVEY §2.10)."""

from .profiling import OpProfiler, graph_print
from .graphviz import graph_dump_dot

__all__ = ["OpProfiler", "graph_dump_dot", "graph_print"]
