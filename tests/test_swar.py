"""SWAR transposed-layout kernel parity (quant.formats.to_swar +
kernels.matmul_q.mul_mat_swar) — CPU interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggmlsharp_tpu import GType, dequantize, quantize
from ggmlsharp_tpu.kernels.matmul_q import (
    _call_kernel_swar, mul_mat_q_fused, swar_permute_x,
)
from ggmlsharp_tpu.ops.matmul import mul_mat_q
from ggmlsharp_tpu.quant.formats import (
    swar_pack_qh1, swar_pack_qh2, swar_pack_scales, swar_pack_values,
    swar_pack_values_q8, swar_supported, swar_unpack_qh1, swar_unpack_qh2,
    swar_unpack_values, swar_unpack_values_q8, to_swar,
)


@pytest.mark.parametrize("nc", [1, 2, 4])
def test_pack_unpack_roundtrip(nc):
    rng = np.random.default_rng(0)
    n, k = 64, 512
    vals = jnp.asarray(rng.integers(0, 16, (n, k)), jnp.int32)
    plane = swar_pack_values(vals, nc)
    assert plane.shape == (k // 8, n) and plane.dtype == jnp.uint32
    back = swar_unpack_values(plane, n, k, nc)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


@pytest.mark.parametrize("nc", [1, 2, 4])
def test_pack_unpack_roundtrip_q8(nc):
    rng = np.random.default_rng(4)
    n, k = 64, 512
    vals = jnp.asarray(rng.integers(-128, 128, (n, k)), jnp.int32)
    plane = swar_pack_values_q8(vals, nc)
    assert plane.shape == (k // 4, n) and plane.dtype == jnp.uint32
    back = swar_unpack_values_q8(plane, n, k, nc)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


@pytest.mark.parametrize("nc", [1, 2])
def test_pack_unpack_roundtrip_qh2(nc):
    rng = np.random.default_rng(5)
    n, k = 64, 512
    vals = jnp.asarray(rng.integers(0, 4, (n, k)), jnp.int32)
    plane = swar_pack_qh2(vals, nc)
    assert plane.shape == (k // 16, n) and plane.dtype == jnp.uint32
    back = swar_unpack_qh2(plane, n, k, nc)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


@pytest.mark.parametrize("nc", [1, 2])
def test_pack_unpack_roundtrip_qh1(nc):
    rng = np.random.default_rng(7)
    n, k = 64, 512
    vals = jnp.asarray(rng.integers(0, 2, (n, k)), jnp.int32)
    plane = swar_pack_qh1(vals, nc)
    assert plane.shape == (k // 32, n) and plane.dtype == jnp.uint32
    back = swar_unpack_qh1(plane, n, k, nc)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


@pytest.mark.parametrize("gtype", [GType.Q5_0, GType.Q5_1])
def test_to_swar_dequant_identity_q5(gtype):
    rng = np.random.default_rng(8)
    w = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32) * 0.1)
    qt = quantize(w, gtype)
    assert swar_supported(qt)
    sw = to_swar(qt)
    assert "qs_t" in sw.planes and "qh_t" in sw.planes
    # Q5 scales are plain f16 planes — swar dequant is bit-exact vs original
    np.testing.assert_array_equal(
        np.asarray(dequantize(sw)), np.asarray(dequantize(qt)))


def test_to_swar_dequant_identity_q6_k():
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32) * 0.1)
    qt = quantize(w, GType.Q6_K)
    assert swar_supported(qt)
    sw = to_swar(qt)
    assert "qs_t" in sw.planes and "qh_t" in sw.planes
    got = np.asarray(dequantize(sw))
    # swar rides the f16-FUSED kd plane; the reference reconstructs from
    # exact f32 d*sc — ~2^-11 apart. Exact vs the kd reconstruction:
    from ggmlsharp_tpu.quant.formats import (
        from_storage_order, unpack_2bit, unpack_nibbles,
    )

    k = qt.shape[-1]
    flat = np.asarray(unpack_nibbles(qt["ql"], k)) \
        | (np.asarray(unpack_2bit(qt["qh"], k)) << 4)
    v = np.asarray(from_storage_order(jnp.asarray(flat), 16)) - 32
    kd = np.repeat(np.asarray(qt["kd"]).astype(np.float32), 16, axis=-1)
    np.testing.assert_allclose(got, v * kd, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        got, np.asarray(dequantize(qt)), rtol=2e-3, atol=5e-4)


@pytest.mark.parametrize(
    "gtype", [GType.Q4_0, GType.Q4_1, GType.Q4_K, GType.Q8_0])
def test_to_swar_dequant_identity(gtype):
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32) * 0.1)
    qt = quantize(w, gtype)
    ref = np.asarray(dequantize(qt))
    sw = to_swar(qt)
    assert "qs_t" in sw.planes and "qs" not in sw.planes
    got = np.asarray(dequantize(sw))
    if gtype == GType.Q4_K:
        # swar rides the f16-FUSED kd/km planes (like the fused kernels);
        # the reference reconstructs from exact f32 d*sc — ~2^-11 apart.
        # Compare exactly against the kd/km reconstruction instead.
        from ggmlsharp_tpu.quant.formats import (
            from_storage_order, unpack_nibbles,
        )

        k = qt.shape[-1]
        v = np.asarray(from_storage_order(unpack_nibbles(qt["qs"], k), 32))
        kd = np.repeat(np.asarray(qt["kd"]).astype(np.float32), 32, axis=-1)
        km = np.repeat(np.asarray(qt["km"]).astype(np.float32), 32, axis=-1)
        np.testing.assert_allclose(got, v * kd - km, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=5e-4)
    else:
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "gtype", [GType.Q4_0, GType.Q4_1, GType.Q4_K, GType.Q8_0, GType.Q5_0,
              GType.Q5_1, GType.Q6_K])
@pytest.mark.parametrize("rows", [1, 3, 16])
def test_swar_matmul_parity(gtype, rows):
    rng = np.random.default_rng(2)
    n, k = 512, 256
    w = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((rows, k)).astype(np.float32))
    qt = quantize(w, gtype)
    assert swar_supported(qt)
    sw = to_swar(qt)
    got = np.asarray(mul_mat_q_fused(sw, x, quantize_acts=False))
    want = np.asarray(mul_mat_q(qt, x, quantize_acts=False))
    # exact reference for the values the kernel actually consumes (Q4_K's
    # kd/km f16-fused scales differ ~2^-11 from the d*sc reconstruction)
    want_kd = np.asarray(x) @ np.asarray(dequantize(sw)).T
    np.testing.assert_allclose(got, want_kd, rtol=2e-5, atol=2e-5)
    tol = 2e-2 if gtype in (GType.Q4_K, GType.Q6_K) else 2e-5
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_swar_chunked_kernel_parity():
    """Force multi-chunk accumulation (the k=11008 path) at small shapes."""
    rng = np.random.default_rng(3)
    n, k, nc, tile = 256, 512, 2, 128
    w = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    qt = quantize(w, GType.Q4_0)
    from ggmlsharp_tpu.quant.formats import (
        from_storage_order, unpack_nibbles,
    )

    raw = from_storage_order(unpack_nibbles(qt.planes["qs"], k), 32)
    planes = {
        "qs_t": swar_pack_values(raw, nc),
        "d_t": swar_pack_scales(qt.planes["d"], nc),
    }
    xlo, xhi = swar_permute_x(x, k, nc)
    xs = x.reshape(4, k // 32, 32).sum(axis=-1)  # (b, C) block order
    got = np.asarray(_call_kernel_swar(
        xlo, xhi, xs, planes, GType.Q4_0, n, k, tile, nc, 4))
    want = np.asarray(mul_mat_q(qt, x, quantize_acts=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # host-chunk mode: one pallas call per chunk over the SAME planes
    # (chunk-offset BlockSpecs), summed in XLA — must match exactly
    got_hc = np.asarray(_call_kernel_swar(
        xlo, xhi, xs, planes, GType.Q4_0, n, k, tile, nc, 4,
        host_chunks=True))
    np.testing.assert_allclose(got_hc, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "gtype", [GType.Q4_1, GType.Q4_K, GType.Q8_0, GType.Q5_0, GType.Q5_1,
              GType.Q6_K])
def test_swar_hostchunk_all_formats(gtype, monkeypatch):
    """GGML_TPU_SWAR_HOSTCHUNK routes every chunked format through
    per-chunk kernel calls; parity vs the reference path at a forced
    2-chunk layout."""
    from ggmlsharp_tpu.quant import formats as F

    monkeypatch.setenv("GGML_TPU_SWAR_HOSTCHUNK", "1")
    rng = np.random.default_rng(5)
    n, k = 256, 1024
    real_layout = F.swar_layout
    monkeypatch.setattr(
        F, "swar_layout",
        lambda nn, kk, budget=0, kt_bytes=6, gtype=None: (128, 2, kk)
        if kk == k else real_layout(nn, kk, kt_bytes=kt_bytes,
                                    gtype=gtype))
    w = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((3, k)).astype(np.float32))
    qt = quantize(w, gtype)
    sw = to_swar(qt)
    assert sw.planes["qs_t"].shape[0] in (k // 8, k // 4)  # 2-chunk pack
    got = np.asarray(mul_mat_q_fused(sw, x, quantize_acts=False))
    want = np.asarray(x) @ np.asarray(dequantize(sw)).T
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_gpt2_quantize_params_swar_forward_parity(monkeypatch):
    from ggmlsharp_tpu.models import gpt2

    # layout-parity only: the MLP megakernel (tested in test_mlp_fused)
    # legitimately skips the h requantization round-trip, moving logits
    # beyond this test's layout-noise bar
    monkeypatch.setenv("GGML_TPU_MLP_FUSED", "0")
    cfg = gpt2.GPT2Config(n_vocab=512, n_ctx=64, n_embd=256, n_head=4,
                          n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    qp_ref = gpt2.quantize_params(params, GType.Q8_0, swar=False)
    qp_swar = gpt2.quantize_params(params, GType.Q8_0, swar=True)
    assert any(
        "qs_t" in b["attn"]["c_attn_w"].planes for b in qp_swar["blocks"]
    )
    assert "qs_t" not in qp_swar["wte"].planes  # embedding table stays rows
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cache_a = gpt2.new_cache(cfg, 1)
    cache_b = gpt2.new_cache(cfg, 1)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    la, _ = gpt2.forward(qp_ref, cfg, tokens, cache_a, pos)
    lb, _ = gpt2.forward(qp_swar, cfg, tokens, cache_b, pos)
    np.testing.assert_allclose(
        np.asarray(la), np.asarray(lb), rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_quantize_params_swar_forward_parity():
    from ggmlsharp_tpu.models import llama

    cfg = llama.LlamaConfig(
        n_vocab=256, n_ctx=64, n_embd=256, n_head=4, n_head_kv=2,
        n_layer=2, n_ff=512,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qp_ref = llama.quantize_params(params, GType.Q4_0, swar=False)
    qp_swar = llama.quantize_params(params, GType.Q4_0, swar=True)
    assert any(
        "qs_t" in b["wqkv"].planes for b in qp_swar["blocks"]
    )
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cache_a = llama.new_cache(cfg, 1)
    cache_b = llama.new_cache(cfg, 1)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    la, _ = llama.forward(qp_ref, cfg, tokens, cache_a, pos)
    lb, _ = llama.forward(qp_swar, cfg, tokens, cache_b, pos)
    np.testing.assert_allclose(
        np.asarray(la), np.asarray(lb), rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_swar_k_padding_parity():
    """K with no 512-divisible chunking (4544) pads to 4608 so the layout
    rides lane tile 512 (the 7B w_down k=11008 → 11264 case, shrunk);
    zero pad blocks (d=0) + zero-padded activations leave results exact."""
    from ggmlsharp_tpu.quant.formats import swar_layout

    n, k = 512, 4544
    tile, nc, kp = swar_layout(n, k)
    assert kp == 4608 and tile == 512 and kp % nc == 0
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32))
    qt = quantize(w, GType.Q4_0)
    sw = to_swar(qt)
    assert sw.planes["qs_t"].shape == (kp // 8, n)
    np.testing.assert_allclose(
        np.asarray(dequantize(sw)), np.asarray(dequantize(qt)),
        rtol=1e-6, atol=1e-6)
    got = np.asarray(mul_mat_q_fused(sw, x, quantize_acts=False))
    want = np.asarray(mul_mat_q(qt, x, quantize_acts=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_swar_layout_tune_table(tmp_path, monkeypatch):
    """A measured (tile, nc, kp) entry overrides the layout heuristic; a
    corrupt entry falls back to it (kernels/tune.py)."""
    import json

    from ggmlsharp_tpu.kernels import tune
    from ggmlsharp_tpu.quant.formats import swar_layout

    path = tmp_path / "tune.json"
    path.write_text(json.dumps({
        "kt6:512x4096": [128, 8, 4096],
        "kt6:512x256": [999, 1, 256],  # illegal tile -> ignored
    }))
    monkeypatch.setenv("GGML_TPU_TUNE", str(path))
    tune._load.cache_clear()
    assert swar_layout(512, 4096) == (128, 8, 4096)
    assert swar_layout(512, 256)[0] != 999
    monkeypatch.delenv("GGML_TPU_TUNE")
    tune._load.cache_clear()


@pytest.mark.slow
def test_swar_non_pow2_chunks_parity():
    """k=5632 admits only nc=11 (kc=512) at tile 512 — the non-power-of-two
    chunk count the 7B w_down padded layout (11264 → nc=11·2) rides."""
    from ggmlsharp_tpu.quant.formats import swar_layout

    n, k = 512, 5632
    tile, nc, kp = swar_layout(n, k)
    assert (tile, nc, kp) == (512, 11, 5632), (tile, nc, kp)
    rng = np.random.default_rng(17)
    w = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((2, k)).astype(np.float32))
    for gtype in (GType.Q4_0, GType.Q8_0):
        qt = quantize(w, gtype)
        sw = to_swar(qt)
        got = np.asarray(mul_mat_q_fused(sw, x, quantize_acts=False))
        want = np.asarray(mul_mat_q(qt, x, quantize_acts=False))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
