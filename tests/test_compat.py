"""ggml-naming compat layer: run Test0-style shape checks and a Test1/Test2
case verbatim through the ggml_* API surface."""
import jax.numpy as jnp

from ggmlsharp_tpu.compat import *  # noqa: F401,F403 - the point of the test
from ggmlsharp_tpu.dtypes import GType


def test0_shape_parity():
    ctx = ggml_init()
    t1 = ggml_new_tensor_1d(ctx, GType.F32, 10)
    assert t1.shape == (10,)
    t2 = ggml_new_tensor_2d(ctx, GType.F32, 10, 20)  # ne0=10, ne1=20
    assert t2.shape == (20, 10)  # ne0 is the fastest (last) axis
    t3 = ggml_new_tensor_3d(ctx, GType.I16, 10, 20, 30)
    assert t3.shape == (30, 20, 10) and t3.dtype == jnp.int16
    ggml_free(ctx)


def test1_case1_via_compat():
    ctx = ggml_init()
    x = ggml_new_tensor_1d(ctx, GType.F32, 1)
    ggml_set_param(ctx, x)
    a = ggml_new_tensor_1d(ctx, GType.F32, 1)
    b = ggml_mul(ctx, x, x)
    f = ggml_mul(ctx, b, a)

    gf = ggml_build_forward(f)
    gb = ggml_build_backward(ctx, gf, False)

    ggml_set_f32(x, 2.0)
    ggml_set_f32(a, 3.0)
    ggml_graph_reset(gf)
    ggml_set_f32(f.grad, 1.0)
    ggml_graph_compute(ctx, gb)

    assert ggml_get_f32_1d(f, 0) == 12.0
    assert ggml_get_f32_1d(x.grad, 0) == 12.0


def test2_line_fit_via_compat():
    ctx = ggml_init()
    xi = [1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    yi = [15.0, 25, 35, 45, 55, 65, 75, 85, 95, 105]
    n = len(xi)
    from ggmlsharp_tpu.graph import leaf, set_data

    x = set_data(ggml_new_tensor_1d(ctx, GType.F32, n), jnp.asarray(xi))
    y = set_data(ggml_new_tensor_1d(ctx, GType.F32, n), jnp.asarray(yi))
    t0 = ggml_new_f32(ctx, 0.0)
    t1 = ggml_new_f32(ctx, 0.0)
    ggml_set_param(ctx, t0)
    ggml_set_param(ctx, t1)
    f = ggml_div(
        ctx,
        ggml_sum(
            ctx,
            ggml_sqr(
                ctx,
                ggml_sub(
                    ctx,
                    ggml_add(
                        ctx,
                        ggml_mul(ctx, x, ggml_repeat(ctx, t1, x)),
                        ggml_repeat(ctx, t0, x),
                    ),
                    y,
                ),
            ),
        ),
        ggml_new_f32(ctx, 2.0 * n),
    )
    params = ggml_opt_default_params(GGML_OPT_ADAM)
    params.adam.alpha = 0.01  # Test2/Program.cs:17
    res = ggml_opt(ctx, params, f)
    assert abs(ggml_get_f32_1d(t0, 0) - 5.0) < 1e-3
    assert abs(ggml_get_f32_1d(t1, 0) - 10.0) < 1e-3


def test_predicates_and_accessors():
    from ggmlsharp_tpu.compat import (
        ggml_are_same_shape, ggml_can_mul_mat, ggml_dup_tensor,
        ggml_is_matrix, ggml_is_quantized, ggml_is_scalar, ggml_is_vector,
        ggml_nbytes, ggml_nelements, ggml_nrows, ggml_set_f32_1d,
    )
    ctx = ggml_init()
    t = ggml_new_tensor_2d(ctx, GType.F32, 10, 4)  # shape (4, 10)
    assert ggml_nelements(t) == 40
    assert ggml_nrows(t) == 4
    assert ggml_nbytes(t) == 160
    assert not ggml_is_scalar(t) and ggml_is_matrix(t)
    s = ggml_new_f32(ctx, 3.0)
    assert ggml_is_scalar(s) and ggml_is_vector(s)
    t2 = ggml_new_tensor_2d(ctx, GType.F32, 10, 7)
    assert ggml_can_mul_mat(t, t2)
    assert not ggml_are_same_shape(t, t2)
    d = ggml_dup_tensor(ctx, t)
    assert d.shape == t.shape
    assert not ggml_is_quantized(t)
    ggml_set_f32_1d(t, 3, 9.0)
    assert ggml_get_f32_1d(t, 3) == 9.0


def test_quant_registry_complete():
    from ggmlsharp_tpu.quant.registry import registry
    from ggmlsharp_tpu.dtypes import GType as G

    reg = registry()
    assert reg[G.Q4_0].has_fused_matmul and reg[G.Q4_0].has_int_dot
    assert reg[G.Q4_3].quantize_row is not None  # empty in the reference
    assert reg[G.Q8_1].dequantize_row is not None  # null TODO in the reference
    assert reg[G.Q4_K].vec_dot_type == G.Q8_K


def test_graph_api_transformer_decodes():
    """The ggml-style graph API expresses a full transformer (the ops the
    reference stubbed are first-class): build once, re-set leaf data,
    recompute — greedy decode is deterministic across rebuilds."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graph_transformer",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "graph_transformer.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import numpy as np
    import jax
    from ggmlsharp_tpu.graph import set_data

    def decode(seed):
        tok, graph, logits = mod.build_model(jax.random.PRNGKey(seed), S=16)
        toks = [5, 17, 33]
        for _ in range(4):
            padded = np.zeros((16,), np.int32)
            padded[: len(toks)] = toks[-16:]
            set_data(tok, padded)
            graph.compute()
            row = np.asarray(logits.data)[len(toks) - 1]
            assert np.isfinite(row).all()
            toks.append(int(row.argmax()))
        return toks[3:]

    a = decode(0)
    b = decode(0)  # fresh graph, same weights → same decode
    c = decode(1)  # different weights → (almost surely) different path
    assert a == b
    assert len(a) == 4 and all(0 <= t < 96 for t in a)
    assert a != c or True  # c only sanity-executes
