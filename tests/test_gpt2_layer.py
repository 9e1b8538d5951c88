"""Whole-layer GPT-2 decode megakernel (kernels.gpt2_layer) — CPU interpret
mode. Kernel-level parity against a jnp reference over the same dequantized
weights, plus end-to-end flat-wire-cache decode vs the unfused path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggmlsharp_tpu import GType, quantize, dequantize
from ggmlsharp_tpu.kernels.gpt2_layer import (
    fuse_gpt2_layer, gpt2_layer_step,
)
from ggmlsharp_tpu.kernels.mlp_fused import q8_korder_perm
from ggmlsharp_tpu.models import gpt2, kv_cache as kvc, sampling

pytestmark = pytest.mark.slow  # full engine/kernel flows; fast loop skips

E, H, F, T = 256, 4, 1024, 64
EPS = 1e-5


def _rand_block(rng):
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * .1)
    return {
        "ln_1": {"g": 1.0 + 0.1 * r(E), "b": 0.05 * r(E)},
        "attn": {"c_attn_w": r(3 * E, E), "c_attn_b": 0.1 * r(3 * E),
                 "c_proj_w": r(E, E), "c_proj_b": 0.1 * r(E)},
        "ln_2": {"g": 1.0 + 0.1 * r(E), "b": 0.05 * r(E)},
        "mlp": {"c_fc_w": r(F, E), "c_fc_b": 0.1 * r(F),
                "c_proj_w": r(E, F), "c_proj_b": 0.1 * r(E)},
    }


def _ref_layer(blk, x, kv_rows, npast):
    """jnp reference over the SAME dequantized weights, element order.
    x: (1, E); kv_rows: dict with k/v (T, E) element-order cache contents
    (rows > npast ignored). Returns y (1, E), k_new, v_new (1, E)."""
    dq = lambda w: dequantize(quantize(jnp.asarray(w, jnp.float32),
                                       GType.Q8_0))
    ln = lambda v, g, b: ((v - v.mean(-1, keepdims=True))
                          / jnp.sqrt(v.var(-1, keepdims=True) + EPS)) * g + b
    xn = ln(x, blk["ln_1"]["g"], blk["ln_1"]["b"])
    qkv = xn @ dq(blk["attn"]["c_attn_w"]).T + blk["attn"]["c_attn_b"]
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    D = E // H
    ks = kv_rows["k"].at[npast].set(k_new[0])
    vs = kv_rows["v"].at[npast].set(v_new[0])
    qh = q.reshape(H, D)
    kh = ks.reshape(T, H, D).transpose(1, 0, 2)
    vh = vs.reshape(T, H, D).transpose(1, 0, 2)
    s = jnp.einsum("hd,htd->ht", qh, kh) / np.sqrt(D)
    mask = jnp.arange(T) <= npast
    s = jnp.where(mask[None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    a = jnp.einsum("ht,htd->hd", p, vh).reshape(1, E)
    x2 = x + a @ dq(blk["attn"]["c_proj_w"]).T + blk["attn"]["c_proj_b"]
    x2n = ln(x2, blk["ln_2"]["g"], blk["ln_2"]["b"])
    from ggmlsharp_tpu.ops.basic import gelu

    h = gelu(x2n @ dq(blk["mlp"]["c_fc_w"]).T + blk["mlp"]["c_fc_b"])
    y = x2 + h @ dq(blk["mlp"]["c_proj_w"]).T + blk["mlp"]["c_proj_b"]
    return y, k_new, v_new


def test_layer_kernel_parity():
    rng = np.random.default_rng(0)
    blk = _rand_block(rng)
    fused = fuse_gpt2_layer(blk)
    sig = q8_korder_perm(E)
    inv = np.argsort(sig)
    x = jnp.asarray(rng.standard_normal((1, E)).astype(np.float32) * 0.5)
    k_elem = jnp.asarray(rng.standard_normal((T, E)).astype(np.float32) * .3)
    v_elem = jnp.asarray(rng.standard_normal((T, E)).astype(np.float32) * .3)
    npast = 5

    y, kn, vn = gpt2_layer_step(
        fused, x[:, sig], k_elem[:, sig], v_elem[:, sig],
        jnp.int32(npast), H, EPS)
    y_ref, kn_ref, vn_ref = _ref_layer(
        blk, x, {"k": k_elem, "v": v_elem}, npast)
    np.testing.assert_allclose(np.asarray(kn[:, inv]), np.asarray(kn_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vn[:, inv]), np.asarray(vn_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y[:, inv]), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)


def test_layer_kernel_first_token():
    """npast = 0: attention must see ONLY the fresh token (stale cache rows
    masked), reducing to a = v_new."""
    rng = np.random.default_rng(1)
    blk = _rand_block(rng)
    fused = fuse_gpt2_layer(blk)
    sig = q8_korder_perm(E)
    inv = np.argsort(sig)
    x = jnp.asarray(rng.standard_normal((1, E)).astype(np.float32) * 0.5)
    garbage = jnp.asarray(rng.standard_normal((T, E)).astype(np.float32) * 9)
    y, kn, vn = gpt2_layer_step(fused, x[:, sig], garbage[:, sig],
                                garbage[:, sig], jnp.int32(0), H, EPS)
    zeros = jnp.zeros((T, E), jnp.float32)
    y_ref, _, _ = _ref_layer(blk, x, {"k": zeros, "v": zeros}, 0)
    np.testing.assert_allclose(np.asarray(y[:, inv]), np.asarray(y_ref),
                               rtol=2e-3, atol=2e-3)


def test_gpt2_flat_decode_matches_unfused(monkeypatch):
    """End-to-end: flat wire cache + megakernel decode produces the same
    greedy tokens as the unfused per-matmul path (both without the ggml
    activation round-trip, which the megakernel legitimately skips)."""
    monkeypatch.setenv("GGML_TPU_QUANT_ACTS", "0")
    import ggmlsharp_tpu.config as cfgmod

    monkeypatch.setattr(cfgmod, "_config", None)  # re-read env
    cfg = gpt2.GPT2Config(n_vocab=512, n_ctx=128, n_embd=E, n_head=H,
                          n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray([[3, 14, 15, 92, 6]], jnp.int32)

    def run(flat):
        monkeypatch.setenv("GGML_TPU_LAYER_FUSED", "1" if flat else "0")
        qp = gpt2.quantize_params(params, GType.Q8_0)
        assert ("layer_fused" in qp["blocks"][0]) == flat
        cache = gpt2.new_cache(cfg, 1, flat=flat)
        toks, _ = sampling.generate(gpt2.forward, cfg, qp, prompt, cache, 8)
        return np.asarray(toks)

    a = run(False)
    b = run(True)
    np.testing.assert_array_equal(a, b)


def test_gpt2_flat_prefill_logits_match(monkeypatch):
    """Prefill (S > 1) through the flat cache path matches the head cache
    path bit-for-bit in logits (same math, different cache layout)."""
    monkeypatch.setenv("GGML_TPU_QUANT_ACTS", "0")
    import ggmlsharp_tpu.config as cfgmod

    monkeypatch.setattr(cfgmod, "_config", None)
    monkeypatch.setenv("GGML_TPU_ATTN", "legacy")  # same einsum both sides
    cfg = gpt2.GPT2Config(n_vocab=512, n_ctx=64, n_embd=E, n_head=H,
                          n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(1), cfg)
    qp = gpt2.quantize_params(params, GType.Q8_0)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    la, ca = gpt2.forward(qp, cfg, tokens, gpt2.new_cache(cfg, 1, flat=False),
                          pos)
    lb, cb = gpt2.forward(qp, cfg, tokens, gpt2.new_cache(cfg, 1, flat=True),
                          pos)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-4, atol=2e-4)
    # cache contents agree through the wire permutation
    sig = q8_korder_perm(E)
    kf = np.asarray(cb.k[0][0, :4])  # (S, E) wire
    kh = np.asarray(ca.k[0][0])[:, :4]  # (H, S, D)
    kh = kh.transpose(1, 0, 2).reshape(4, E)[:, sig]
    np.testing.assert_allclose(kf, kh, rtol=2e-2, atol=2e-2)  # bf16 store


def test_gpt2_flat_long_prefill_decode(monkeypatch):
    """16-token prompt exercises the flat-cache FLASH prefill branch, then
    megakernel decode — tokens match the unfused path."""
    monkeypatch.setenv("GGML_TPU_QUANT_ACTS", "0")
    import ggmlsharp_tpu.config as cfgmod

    monkeypatch.setattr(cfgmod, "_config", None)
    cfg = gpt2.GPT2Config(n_vocab=512, n_ctx=128, n_embd=E, n_head=H,
                          n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(9), cfg)
    prompt = jnp.asarray([list(range(3, 19))], jnp.int32)

    def run(flat):
        monkeypatch.setenv("GGML_TPU_LAYER_FUSED", "1" if flat else "0")
        qp = gpt2.quantize_params(params, GType.Q8_0)
        cache = gpt2.new_cache(cfg, 1, flat=flat)
        toks, _ = sampling.generate(gpt2.forward, cfg, qp, prompt, cache, 6)
        return np.asarray(toks)

    np.testing.assert_array_equal(run(False), run(True))


def test_gpt2_flat_scan_decode_agrees(monkeypatch):
    """Fully-jitted while_loop decode (generate_scan) over the flat cache +
    megakernel path matches host-stepped generate."""
    monkeypatch.setenv("GGML_TPU_LAYER_FUSED", "1")
    cfg = gpt2.GPT2Config(n_vocab=512, n_ctx=64, n_embd=E, n_head=H,
                          n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(2), cfg)
    qp = gpt2.quantize_params(params, GType.Q8_0)
    assert "layer_fused" in qp["blocks"][0]
    prompt = jnp.asarray([[5, 17, 99]], jnp.int32)
    t1, _ = sampling.generate(gpt2.forward, cfg, qp, prompt,
                              gpt2.new_cache(cfg, 1), 6)
    t2, _ = sampling.generate_scan(gpt2.forward, cfg, qp, prompt,
                                   gpt2.new_cache(cfg, 1), 6)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
