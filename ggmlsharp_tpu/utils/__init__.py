"""Observability & tooling (reference L7 parity, SURVEY §2.10)."""

from .profiling import OpProfiler, graph_print
from .graphviz import graph_dump_dot
from .debug import assert_all_finite, check, checked, print_objects

__all__ = [
    "OpProfiler", "assert_all_finite", "check", "checked",
    "graph_dump_dot", "graph_print", "print_objects",
]
