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


def test_print_objects_summary():
    import jax
    from ggmlsharp_tpu.utils.debug import print_objects
    from ggmlsharp_tpu import quantize, GType

    tree = {
        "w": jnp.ones((4, 256)),
        "q": quantize(jnp.ones((4, 256)), GType.Q4_0),
        "none": None,
    }
    out = print_objects(tree, "test")
    assert "QTensor[Q4_0]" in out and "total:" in out and "None" in out


def test_checked_assertions():
    import jax.numpy as jnp
    import pytest
    from ggmlsharp_tpu.utils.debug import check, checked

    @checked
    def f(x):
        check(jnp.all(x > 0), "x must be positive")
        return jnp.log(x)

    f(jnp.ones((3,)))  # fine
    with pytest.raises(Exception, match="positive"):
        f(jnp.asarray([-1.0, 1.0, 1.0]))


def test_assert_all_finite():
    import pytest
    from ggmlsharp_tpu.utils.debug import assert_all_finite

    assert_all_finite({"a": jnp.ones((2,))})
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.asarray([jnp.nan])})


def test_runtime_config_env_and_apply(monkeypatch):
    from ggmlsharp_tpu.config import RuntimeConfig, set_config
    from ggmlsharp_tpu.kernels import config as kcfg

    monkeypatch.setenv("GGML_TPU_BATCH_SLOTS", "9")
    cfg = RuntimeConfig()
    assert cfg.batch_slots == 9
    prev = kcfg.mm_dot_mode()
    try:
        cfg.mm_dot = "f32"
        set_config(cfg)
        assert kcfg.mm_dot_mode() == "f32"
    finally:
        kcfg.set_mm_dot(prev)
        kcfg.set_pallas(None)
