"""Fused flat-cache flash-decode kernel (kernels.attn_decode) — CPU
interpret mode. Kernel parity vs explicit softmax attention (incl. GQA and
multi-chunk online softmax), plus end-to-end llama decode flat vs head
cache."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggmlsharp_tpu.kernels.attn_decode import flash_decode_flat
from ggmlsharp_tpu.models import llama, sampling
from ggmlsharp_tpu.dtypes import GType

pytestmark = pytest.mark.slow  # full engine/kernel flows; fast loop skips


def _ref(q_heads, k_rows, v_rows, npast, Hkv, D):
    """Explicit attention: q (Hq, D); k/v_rows (T, E_kv) with row npast
    ALREADY holding the fresh token."""
    Hq = q_heads.shape[0]
    n_rep = Hq // Hkv
    T = k_rows.shape[0]
    kh = k_rows.reshape(T, Hkv, D)
    vh = v_rows.reshape(T, Hkv, D)
    out = np.zeros((Hq, D), np.float32)
    for hq in range(Hq):
        hkv = hq // n_rep
        s = (kh[:, hkv] @ q_heads[hq]) / np.sqrt(D)
        s = np.where(np.arange(T) <= npast, s, -np.inf)
        p = np.exp(s - s.max())
        p /= p.sum()
        out[hq] = p @ vh[:, hkv]
    return out


@pytest.mark.parametrize("B,Hq,Hkv,D,T,npasts", [
    (1, 4, 4, 64, 64, [5]),          # MHA
    (1, 4, 2, 64, 64, [0]),          # GQA, first token
    (1, 8, 2, 32, 128, [63]),        # GQA n_rep=4
    (1, 4, 2, 64, 1024, [600]),      # multi-chunk online softmax (Tc=512)
    (4, 4, 2, 64, 128, [5, 0, 99, 127]),  # batched, per-slot lengths
])
def test_flash_decode_parity(B, Hq, Hkv, D, T, npasts):
    rng = np.random.default_rng(Hq * 100 + T + B)
    E = Hkv * D
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    kr = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    vr = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((B, E)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((B, E)).astype(np.float32))
    got = np.asarray(flash_decode_flat(
        q, kn, vn, kr, vr, jnp.asarray(npasts, jnp.int32), Hkv, D))
    for b, npast in enumerate(npasts):
        # reference sees the fresh row in place (kernel masks the stale row)
        kref = np.asarray(kr[b]).copy()
        vref = np.asarray(vr[b]).copy()
        kref[npast] = np.asarray(kn)[b]
        vref[npast] = np.asarray(vn)[b]
        want = _ref(np.asarray(q[b]), kref, vref, npast, Hkv, D)
        np.testing.assert_allclose(got[b], want, rtol=2e-5, atol=2e-5)


def test_llama_flat_decode_matches_head_cache(monkeypatch):
    """End-to-end greedy decode: flat cache + fused flash-decode kernel vs
    the head-major einsum path — same tokens (GQA tiny config). f32 caches:
    the fused kernel's bf16 score dots vs the einsum's f32 carry an
    inherent ~1e-2 logit noise (bounded by the kernel-level allclose tests
    above), and random-weight logits have top-2 gaps below that — exact
    token equality is only a meaningful invariant when noise << tie gaps,
    which f32 KV provides."""
    cfg = llama.LlamaConfig(n_vocab=256, n_ctx=128, n_embd=256, n_head=4,
                            n_head_kv=2, n_layer=2, n_ff=512)
    params = llama.init_params(jax.random.PRNGKey(3), cfg)
    qp = llama.quantize_params(params, GType.Q4_0)
    prompt = jnp.asarray([[7, 3, 99, 12]], jnp.int32)

    def run(flat):
        cache = llama.new_cache(cfg, 1, dtype=jnp.float32, flat=flat)
        assert (cache.k[0].ndim == 3) == flat
        toks, _ = sampling.generate(llama.forward, cfg, qp, prompt, cache, 8)
        return np.asarray(toks)

    a = run(False)
    b = run(True)
    np.testing.assert_array_equal(a, b)


def test_llama_flat_batched_decode(monkeypatch):
    """B=2 batched decode over the flat cache matches the head-cache path."""
    cfg = llama.LlamaConfig(n_vocab=256, n_ctx=64, n_embd=256, n_head=4,
                            n_head_kv=2, n_layer=2, n_ff=512)
    params = llama.init_params(jax.random.PRNGKey(5), cfg)
    qp = llama.quantize_params(params, GType.Q4_0)
    prompt = jnp.asarray([[7, 3, 99, 12], [1, 8, 2, 200]], jnp.int32)

    def run(flat):
        cache = llama.new_cache(cfg, 2, flat=flat)
        toks, _ = sampling.generate(llama.forward, cfg, qp, prompt, cache, 6)
        return np.asarray(toks)

    np.testing.assert_array_equal(run(False), run(True))


@pytest.mark.parametrize("mode", ["f32", "bf16"])
def test_flash_decode_int8_kernel_parity(mode):
    """INT8 flat cache. Exact mode (GGML_TPU_MM_DOT=f32): in-kernel
    per-(token, head) scale expansion matches explicit dequantized
    attention bit-comparably. Fast mode (default bf16): scales fold into
    scores/softmax-weights and the P·V dot rides bf16 — bounded by the
    bf16 rounding of the attention weights (2^-8 relative on a convex
    combination of |v|<=127·s values), NOT a parity bar (CLAUDE.md:
    fixed atol on DEFAULT-precision kernels is a trap)."""
    rng = np.random.default_rng(21)
    B, Hq, Hkv, D, T = 2, 4, 2, 64, 128
    E = Hkv * D
    q = jnp.asarray(rng.standard_normal((B, Hq, D)).astype(np.float32))
    kf = rng.standard_normal((B, T, E)).astype(np.float32)
    vf = rng.standard_normal((B, T, E)).astype(np.float32)

    def quant(rows):
        rh = rows.reshape(B, T, Hkv, D)
        s = np.abs(rh).max(-1) / 127.0
        qv = np.clip(np.round(rh / s[..., None]), -127, 127).astype(np.int8)
        return (jnp.asarray(qv.reshape(B, T, E)),
                jnp.asarray(s.astype(np.float32)))

    kq, ks = quant(kf)
    vq, vs = quant(vf)
    kn = jnp.asarray(rng.standard_normal((B, E)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((B, E)).astype(np.float32))
    npasts = [17, 99]
    from ggmlsharp_tpu.kernels.config import mm_dot_mode, set_mm_dot

    prev = mm_dot_mode()
    set_mm_dot(mode)
    try:
        got = np.asarray(flash_decode_flat(
            q, kn, vn, kq, vq, jnp.asarray(npasts, jnp.int32), Hkv, D,
            k_scale=ks, v_scale=vs))
    finally:
        set_mm_dot(prev)
    kdq = np.asarray(kq).reshape(B, T, Hkv, D) * np.asarray(ks)[..., None]
    vdq = np.asarray(vq).reshape(B, T, Hkv, D) * np.asarray(vs)[..., None]
    tol = dict(rtol=2e-5, atol=2e-5) if mode == "f32" else \
        dict(rtol=2e-2, atol=2e-2)  # bf16 weight rounding, |out| ~ |v|
    for b, npast in enumerate(npasts):
        kr = kdq[b].reshape(T, E).copy()
        vr = vdq[b].reshape(T, E).copy()
        kr[npast] = np.asarray(kn)[b]
        vr[npast] = np.asarray(vn)[b]
        want = _ref(np.asarray(q[b]), kr, vr, npast, Hkv, D)
        np.testing.assert_allclose(got[b], want, **tol)


def test_llama_flat_int8_decode_matches_head_cache():
    """INT8 KV: flat cache + fused flash-decode (in-kernel dequant) equals
    the head-major einsum path — same per-(token, head) quantization."""
    cfg = llama.LlamaConfig(n_vocab=256, n_ctx=64, n_embd=256, n_head=4,
                            n_head_kv=2, n_layer=2, n_ff=512)
    params = llama.init_params(jax.random.PRNGKey(8), cfg)
    qp = llama.quantize_params(params, GType.Q4_0)
    prompt = jnp.asarray([[7, 3, 99, 12]], jnp.int32)

    def run(flat):
        cache = llama.new_cache(cfg, 1, int8=True, flat=flat)
        assert cache.int8
        toks, _ = sampling.generate(llama.forward, cfg, qp, prompt, cache, 8)
        return np.asarray(toks)

    np.testing.assert_array_equal(run(False), run(True))
