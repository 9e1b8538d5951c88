"""Fused GELU-MLP megakernel (kernels.mlp_fused) vs the unfused pipeline.

Runs in Pallas interpret mode on the clean-env CPU backend (conftest)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ggmlsharp_tpu.dtypes import GType
from ggmlsharp_tpu.kernels.mlp_fused import (
    flash_ff_q8, fuse_mlp_q8, mlp_fuse_supported, q8_korder_perm,
)
from ggmlsharp_tpu.ops.basic import gelu
from ggmlsharp_tpu.quant.quantize import dequantize, quantize

pytestmark = pytest.mark.slow  # full engine/kernel flows; fast loop skips


def _pair(rng, k1=256, n1=512, n2=256):
    w1 = jnp.asarray(rng.standard_normal((n1, k1)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((n2, n1)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(n1).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal(n2).astype(np.float32) * 0.05)
    return quantize(w1, GType.Q8_0), b1, quantize(w2, GType.Q8_0), b2


def test_perm_matches_permute_x_q8():
    from ggmlsharp_tpu.kernels.matmul_q import swar_permute_x_q8

    k = 256
    x = jnp.arange(k, dtype=jnp.float32)[None, :]
    perm = q8_korder_perm(k)
    np.testing.assert_array_equal(
        np.asarray(swar_permute_x_q8(x, k, 1))[0], np.asarray(x)[0][perm])


@pytest.mark.parametrize("rows", [1, 3, 8])
def test_fused_mlp_parity(rows):
    rng = np.random.default_rng(11)
    q1, b1, q2, b2 = _pair(rng)
    assert mlp_fuse_supported(q1, q2)
    fused = fuse_mlp_q8(q1, b1, q2, b2)
    x = jnp.asarray(rng.standard_normal((rows, 256)).astype(np.float32))
    got = np.asarray(flash_ff_q8(fused, x, quantize_acts=False))
    w1d = np.asarray(dequantize(q1))
    w2d = np.asarray(dequantize(q2))
    h = np.asarray(gelu(jnp.asarray(np.asarray(x) @ w1d.T + np.asarray(b1))))
    want = h @ w2d.T + np.asarray(b2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_mlp_leading_dims():
    rng = np.random.default_rng(12)
    q1, b1, q2, b2 = _pair(rng)
    fused = fuse_mlp_q8(q1, b1, q2, b2)
    x = jnp.asarray(rng.standard_normal((2, 3, 256)).astype(np.float32))
    out = flash_ff_q8(fused, x)
    assert out.shape == (2, 3, 256)
    flat = flash_ff_q8(fused, x.reshape(6, 256))
    np.testing.assert_allclose(np.asarray(out).reshape(6, 256),
                               np.asarray(flat), rtol=1e-6, atol=1e-6)


def test_fuse_supported_gates():
    rng = np.random.default_rng(13)
    q1, b1, q2, b2 = _pair(rng)
    assert not mlp_fuse_supported(q1, q1)  # k2 != n1
    q4 = quantize(jnp.asarray(
        rng.standard_normal((512, 256)).astype(np.float32)), GType.Q4_0)
    assert not mlp_fuse_supported(q4, q2)  # non-Q8_0


def _silu_pair(rng, e=256, f=256):
    w1 = jnp.asarray(rng.standard_normal((2 * f, e)).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.standard_normal((e, f)).astype(np.float32) * 0.1)
    return quantize(w1, GType.Q4_0), quantize(w2, GType.Q4_0)


@pytest.mark.parametrize("rows", [1, 3, 8])
def test_fused_silu_mlp_parity(rows):
    from ggmlsharp_tpu.kernels.mlp_fused import (
        flash_ff_silu_q4, fuse_mlp_silu_q4, mlp_silu_fuse_supported,
    )
    from ggmlsharp_tpu.ops.basic import silu

    rng = np.random.default_rng(21)
    q1, q2 = _silu_pair(rng)
    assert mlp_silu_fuse_supported(q1, q2)
    fused = fuse_mlp_silu_q4(q1, q2)
    x = jnp.asarray(rng.standard_normal((rows, 256)).astype(np.float32))
    got = np.asarray(flash_ff_silu_q4(fused, x, quantize_acts=False))
    w1d = np.asarray(dequantize(q1))
    w2d = np.asarray(dequantize(q2))
    gu = np.asarray(x) @ w1d.T
    h = np.asarray(silu(jnp.asarray(gu[:, :256]))) * gu[:, 256:]
    want = h @ w2d.T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_llama_model_fused_vs_unfused():
    """Model-level: tiny llama decode logits agree fused vs unfused. Uses a
    wider-than-TINY config so the MLP weights actually quantize (k % 256)."""
    import os

    import jax

    from ggmlsharp_tpu.models import llama

    cfg = llama.LlamaConfig(n_vocab=512, n_ctx=64, n_embd=256, n_head=4,
                            n_head_kv=2, n_layer=2, n_ff=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tok = jnp.array([[7, 3, 11]], jnp.int32)
    pos = jnp.arange(3)[None, :]

    def run(pq):
        cache = llama.new_cache(cfg, 1, dtype=jnp.float32)
        logits, _ = llama.forward(pq, cfg, tok, cache, pos)
        return np.asarray(logits)

    old = os.environ.get("GGML_TPU_MLP_FUSED")
    try:
        os.environ["GGML_TPU_MLP_FUSED"] = "1"
        pf = llama.quantize_params(params, GType.Q4_0)
        assert any("mlp_fused" in b for b in pf["blocks"])
        lf = run(pf)
        os.environ.pop("GGML_TPU_MLP_FUSED", None)  # llama default: off
        pu = llama.quantize_params(params, GType.Q4_0)
        assert all("mlp_fused" not in b for b in pu["blocks"])
        lu = run(pu)
    finally:
        if old is None:
            os.environ.pop("GGML_TPU_MLP_FUSED", None)
        else:
            os.environ["GGML_TPU_MLP_FUSED"] = old
    np.testing.assert_allclose(lf, lu, rtol=5e-2, atol=5e-2)


def test_gpt2_model_fused_vs_unfused():
    """Model-level: tiny GPT-2 decode logits agree fused vs unfused."""
    import os

    import jax

    from ggmlsharp_tpu.models import gpt2
    from ggmlsharp_tpu.models import kv_cache as kvc

    cfg = gpt2.GPT2Config(n_vocab=512, n_ctx=64, n_embd=256, n_head=4,
                          n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tok = jnp.array([[7, 3, 11]], jnp.int32)
    pos = jnp.arange(3)[None, :]

    def run(params_q):
        cache = gpt2.new_cache(cfg, 1, dtype=jnp.float32)
        logits, _ = gpt2.forward(params_q, cfg, tok, cache, pos)
        return np.asarray(logits)

    old = os.environ.get("GGML_TPU_MLP_FUSED")
    try:
        os.environ["GGML_TPU_MLP_FUSED"] = "1"
        pf = gpt2.quantize_params(params, GType.Q8_0, min_cols=128)
        assert any("fused" in b["mlp"] for b in pf["blocks"])
        lf = run(pf)
        os.environ["GGML_TPU_MLP_FUSED"] = "0"
        pu = gpt2.quantize_params(params, GType.Q8_0, min_cols=128)
        assert all("fused" not in b["mlp"] for b in pu["blocks"])
        lu = run(pu)
    finally:
        if old is None:
            os.environ.pop("GGML_TPU_MLP_FUSED", None)
        else:
            os.environ["GGML_TPU_MLP_FUSED"] = old
    # fused skips the h re-quantization round-trip (strictly more exact),
    # so logits agree to act-quant granularity, not bit-exactly
    np.testing.assert_allclose(lf, lu, rtol=5e-2, atol=5e-2)
