"""Real-TPU kernel verification (VERDICT r1 item 5 — committed, not /tmp).

Runs every fused dequant-matmul format, the exact integer-dot kernel, and
the flash-attention kernel (static + dynamic-npast/GQA forms) on the actual
chip, checking VALUES against the jnp reference path. Uses the shared
compile cache — warm runs finish in well under 5 minutes; a cold first run
compiles ~12 small executables through the remote-compile endpoint.

Run (one JAX process at a time):  python scripts/tpu_smoke.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, got, want, rtol, atol):
    got = np.asarray(got)
    want = np.asarray(want)
    err = np.max(np.abs(got - want) / (np.abs(want) + atol))
    ok = np.allclose(got, want, rtol=rtol, atol=atol) and np.isfinite(got).all()
    print(f"  {'ok ' if ok else 'FAIL'} {name:28s} max-rel-err {err:.2e}",
          flush=True)
    if not ok:
        FAILURES.append(name)


def _bf16(a):
    import jax.numpy as jnp
    return np.asarray(jnp.asarray(np.asarray(a), jnp.float32)
                      .astype(jnp.bfloat16).astype(jnp.float32))


def _swar_caff(qt):
    """The SWAR kernel's per-block affine coefficient (N, C) — voff·d
    and/or ±m (kernels.matmul_q._call_kernel_swar) — for the bf16-sim
    oracle. None for Q8_0 (no affine term)."""
    from ggmlsharp_tpu import GType as G

    def f32(name):
        return np.asarray(qt.planes[name]).astype(np.float32)

    g = qt.gtype
    if g == G.Q4_0:
        return -8.0 * f32("d")
    if g == G.Q5_0:
        return -16.0 * f32("d")
    if g == G.Q6_K:
        return -32.0 * f32("kd")
    if g in (G.Q4_1, G.Q5_1):
        return f32("m")
    if g == G.Q4_K:
        return -f32("km")
    return None


def check_noise(name, got, x_np, wd, caff=None, block=32):
    """Bar for DEFAULT-precision (single-pass bf16) kernels: compare against
    a host simulation of the kernel's OWN bf16 roundings — positive-biased
    q·d products plus the affine-fold xs·caff dot (caff: per-block
    coefficient (N, C) = voff·d and/or ±m; wd = dequantize = q·d + rep(caff))
    — with a tight residual bar (only f32 summation-order differences
    remain; scripts/diag_chunked11.py measured ~2e-4 at K=11264). bf16 dot
    noise is sigma ~ 2^-8·|x·w|·sqrt(K): it GROWS with K, so no fixed atol
    can serve every shape."""
    got = np.asarray(got)
    exact = x_np.astype(np.float64) @ wd.astype(np.float64).T
    if caff is not None:
        caff = np.asarray(caff, np.float32)
        wplus = wd - np.repeat(caff, block, axis=1)
        xs = x_np.reshape(x_np.shape[0], -1, block).sum(axis=-1,
                                                        dtype=np.float32)
        sim = _bf16(x_np).astype(np.float64) @ _bf16(wplus).astype(
            np.float64).T + _bf16(xs).astype(np.float64) @ _bf16(caff).astype(
            np.float64).T
    else:
        sim = _bf16(x_np).astype(np.float64) @ _bf16(wd).astype(np.float64).T
    noise = np.abs(sim - exact).max()
    err = np.abs(got - exact).max()
    resid = np.abs(got - sim).max()
    bar = 2e-3 * (np.abs(exact).max() + 1.0)
    ok = resid <= bar and np.isfinite(got).all()
    print(f"  {'ok ' if ok else 'FAIL'} {name:28s} dev {err:.2e} "
          f"(bf16-sim dev {noise:.2e}, resid {resid:.2e})", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    t0 = time.time()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    from ggmlsharp_tpu import GType, dequantize, quantize
    from ggmlsharp_tpu.kernels.matmul_q import (
        _DEQUANT_TILE, int_dot_supported, mul_mat_q_fused, mul_mat_q_int_dot,
    )
    from ggmlsharp_tpu.ops.matmul import mul_mat_q

    rng = np.random.default_rng(11)
    N, K = 512, 1024
    w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))

    # --- fused dequant-matmul, every registered format ----------------
    # f32/HIGHEST mode: tight parity vs the jnp reference. bf16 mode (the
    # perf path): loose check — bf16 product rounding of K-long sums is a
    # few 1e-2 absolute at these magnitudes, still ~4x under the formats'
    # own quantization noise.
    from ggmlsharp_tpu.kernels import config as kcfg

    for mode, rtol, atol in (("f32", 1e-4, 1e-4), ("bf16", 5e-2, 2e-1)):
        kcfg.set_mm_dot(mode)
        for g in _DEQUANT_TILE:
            if mode == "f32" and g in (GType.Q4_K, GType.Q6_K):
                # k-quant kernels ride f16 FUSED scale planes (kd=f16(d*sc),
                # quant.quantize._kq_fused_scales) — by design ~2^-11 off
                # the reference's exact f32 d*sc product
                rt, at = 5e-2, 5e-2
            else:
                rt, at = rtol, atol
            qw = jax.jit(lambda a, g=g: quantize(a, g))(w)
            got = jax.jit(
                lambda v, qw=qw: mul_mat_q_fused(qw, v, quantize_acts=False)
            )(x)
            want = jax.jit(
                lambda v, qw=qw: mul_mat_q(qw, v, quantize_acts=False)
            )(x)
            check(f"fused {g.name} [{mode}]", got, want, rtol=rt, atol=at)
    kcfg.set_mm_dot("bf16")

    # --- SWAR transposed-layout kernels (quant.formats.to_swar) --------
    # Layout conversion is bit-exact, so the bf16-mode tolerance is the
    # same DEFAULT-dot rounding bar as the fused kernels above.
    from ggmlsharp_tpu.quant.formats import swar_supported, to_swar

    for g in (GType.Q4_0, GType.Q4_1, GType.Q4_K, GType.Q8_0, GType.Q5_0,
              GType.Q5_1, GType.Q6_K):
        qw = jax.jit(lambda a, g=g: quantize(a, g))(w)
        assert swar_supported(qw), g
        qs = jax.jit(to_swar)(qw)
        # layout round-trip: dequantize(swar) must equal dequantize(orig).
        # Q4_K/Q6_K swar dequant rides the fused f16 kd(/km) planes (~2^-11
        # off the exact f32 d*sc product) — same bar as the fused kernels.
        dtol = ((5e-2, 1e-3) if g in (GType.Q4_K, GType.Q6_K)
                else (1e-6, 1e-6))
        dq_s = jax.jit(dequantize)(qs)
        dq_o = jax.jit(dequantize)(qw)
        check(f"swar dequant {g.name}", dq_s, dq_o, rtol=dtol[0],
              atol=dtol[1])
        # f32/HIGHEST mode: hardware-exact parity vs the host f64 reference
        wd = np.asarray(dq_s)
        x_np = np.asarray(x)
        kcfg.set_mm_dot("f32")
        got = jax.jit(
            lambda v, qs=qs: mul_mat_q_fused(qs, v, quantize_acts=False)
        )(x)
        check(f"swar mm {g.name} [f32]", got,
              x_np.astype(np.float64) @ wd.astype(np.float64).T,
              rtol=1e-4, atol=1e-4)
        # bf16/DEFAULT mode (the perf path): noise-calibrated bar
        kcfg.set_mm_dot("bf16")
        got = jax.jit(
            lambda v, qs=qs: mul_mat_q_fused(qs, v, quantize_acts=False)
        )(x)
        check_noise(f"swar mm {g.name} [bf16]", got, x_np, wd,
                    caff=_swar_caff(qs), block=16 if g == GType.Q6_K else 32)

    # --- SWAR chunked-K layout (nc > 1): k=11008 pads to 11264 and chunks
    # (the 7B w_down layout). Exercises the in-kernel k-chunk loop and the
    # chunk-major affine-fold xs ride. bf16-mode noise at this K is ~0.2
    # absolute on unit-scale data (2^-8·|x·w|·sqrt(K)) — the f32/HIGHEST
    # pass is the exactness check; the bf16 pass uses the noise bar
    # (the round-2/3 "chunked-K corruption" was exactly this noise tripping
    # a fixed atol — scripts/diag_chunked11.py).
    w_ck = jnp.asarray(
        rng.standard_normal((256, 11008)).astype(np.float32) * 0.5)
    x_ck = jnp.asarray(rng.standard_normal((8, 11008)).astype(np.float32))
    x_ck_np = np.asarray(x_ck)
    for g in (GType.Q4_0, GType.Q4_1):  # voff-only + min-plane affine folds
        qw = jax.jit(lambda a, g=g: quantize(a, g))(w_ck)
        qs = jax.jit(to_swar)(qw)
        wd_ck = np.asarray(jax.jit(dequantize)(qs))
        kcfg.set_mm_dot("f32")
        got = jax.jit(
            lambda v, qs=qs: mul_mat_q_fused(qs, v, quantize_acts=False)
        )(x_ck)
        check(f"swar chunked-K {g.name} [f32]", got,
              x_ck_np.astype(np.float64) @ wd_ck.astype(np.float64).T,
              rtol=1e-4, atol=1e-3)
        kcfg.set_mm_dot("bf16")
        got = jax.jit(
            lambda v, qs=qs: mul_mat_q_fused(qs, v, quantize_acts=False)
        )(x_ck)
        check_noise(f"swar chunked-K {g.name} [bf16]", got, x_ck_np, wd_ck,
                    caff=_swar_caff(qs))

    # --- fused GELU-MLP megakernel (kernels.mlp_fused) ------------------
    from ggmlsharp_tpu.kernels.mlp_fused import (
        flash_ff_q8, fuse_mlp_q8, mlp_fuse_supported,
    )
    from ggmlsharp_tpu.ops.basic import gelu

    w1 = jnp.asarray(rng.standard_normal((2048, 512)).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.standard_normal((512, 2048)).astype(np.float32) * .1)
    b1 = jnp.asarray(rng.standard_normal(2048).astype(np.float32) * .05)
    b2 = jnp.asarray(rng.standard_normal(512).astype(np.float32) * .05)
    q1 = jax.jit(lambda a: quantize(a, GType.Q8_0))(w1)
    q2 = jax.jit(lambda a: quantize(a, GType.Q8_0))(w2)
    assert mlp_fuse_supported(q1, q2)
    fused = jax.jit(lambda a, b, c, d: fuse_mlp_q8(a, b, c, d))(q1, b1, q2, b2)
    xm = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
    got = jax.jit(
        lambda v: flash_ff_q8(fused, v, quantize_acts=False))(xm)
    want = jax.jit(lambda v: mul_mat_q(
        q2, gelu(mul_mat_q(q1, v, quantize_acts=False) + b1),
        quantize_acts=False) + b2)(xm)
    check("mlp megakernel Q8_0", got, want, rtol=5e-2, atol=2e-1)

    # --- SwiGLU megakernel (llama MLP, 4-bit SWAR planes) ---------------
    from ggmlsharp_tpu.kernels.mlp_fused import (
        flash_ff_silu_q4, fuse_mlp_silu_q4, mlp_silu_fuse_supported,
    )
    from ggmlsharp_tpu.ops.basic import silu

    wg = jnp.asarray(rng.standard_normal((2048, 512)).astype(np.float32) * .1)
    wd = jnp.asarray(rng.standard_normal((512, 1024)).astype(np.float32) * .1)
    qg = jax.jit(lambda a: quantize(a, GType.Q4_0))(wg)
    qd = jax.jit(lambda a: quantize(a, GType.Q4_0))(wd)
    assert mlp_silu_fuse_supported(qg, qd)
    sfused = jax.jit(lambda a, b: fuse_mlp_silu_q4(a, b))(qg, qd)
    got = jax.jit(
        lambda v: flash_ff_silu_q4(sfused, v, quantize_acts=False))(xm)
    def silu_ref(v):
        gu = mul_mat_q(qg, v, quantize_acts=False)
        h = silu(gu[:, :1024]) * gu[:, 1024:]
        return mul_mat_q(qd, h, quantize_acts=False)
    want = jax.jit(silu_ref)(xm)
    check("mlp megakernel SwiGLU Q4_0", got, want, rtol=5e-2, atol=2e-1)

    # --- exact integer-dot kernel (b=1) -------------------------------
    x1 = x[:1]
    for g in (GType.Q4_0, GType.Q8_0):
        qw = jax.jit(lambda a, g=g: quantize(a, g))(w)
        assert int_dot_supported(qw, 1)
        got = jax.jit(lambda v, qw=qw: mul_mat_q_int_dot(qw, v))(x1)
        want = jax.jit(
            lambda v, qw=qw: mul_mat_q(qw, v, quantize_acts=True)
        )(x1)
        check(f"int-dot {g.name}", got, want, rtol=1e-3, atol=1e-3)

    # --- flash attention ----------------------------------------------
    # The honest bar on this hardware: the kernel's deviation from an
    # exact (HIGHEST-precision) f32 oracle must not exceed what XLA's own
    # idiomatic einsum attention produces at DEFAULT (bf16 MXU) precision.
    # A fixed atol mis-fires here: softmax on mostly-masked causal rows
    # amplifies the ~2^-9 score rounding BOTH paths share (measured:
    # flash 1.0e-2 vs einsum 1.2e-2 max-abs dev at B2/H4/S256/D128).
    from ggmlsharp_tpu.kernels.flash import (
        flash_attention, flash_attention_cached,
    )

    B, H, S, D = 2, 4, 256, 128
    q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))

    def ref_attn(q, k, v, npast, precision, round_p=False):
        s = jnp.einsum("bhsd,bhtd->bhst", q, k, precision=precision) / (
            D ** 0.5)
        kpos = jnp.arange(k.shape[2])
        qpos = npast[:, None] + jnp.arange(q.shape[2])
        mask = kpos[None, None, None, :] <= qpos[:, None, :, None]
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        if round_p:
            # what the flash-decode kernel (and XLA's own einsum when V is
            # bf16: p.astype(v.dtype)) does to the softmax weights — the
            # baseline must model it or its deviation floor is "luckier"
            # than any real consumer of a bf16/int8 cache
            p = p.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.einsum("bhst,bhtd->bhsd", p, v, precision=precision)

    def check_vs_oracle(name, got, exact, baseline, floor=1e-3):
        """floor: the minimum bar. 1e-3 suits HIGHEST-dot kernels; pass
        ~2^-8·|out| (4e-3 here) for DEFAULT/bf16-mode kernels, whose own
        roundings are independent of the baseline einsum's — the
        structural-correctness guarantee for those paths is their
        GGML_TPU_MM_DOT=f32 exact-mode case (measured 2.4e-07), not this
        noise-class bound (CLAUDE.md: fixed tight atol on a
        DEFAULT-precision kernel is a trap)."""
        got, exact, baseline = map(np.asarray, (got, exact, baseline))
        dev = np.abs(got - exact).max()
        bar = max(1.5 * np.abs(baseline - exact).max(), floor)
        ok = dev <= bar and np.isfinite(got).all()
        print(f"  {'ok ' if ok else 'FAIL'} {name:28s} "
              f"dev-vs-exact {dev:.2e} (bar {bar:.2e})", flush=True)
        if not ok:
            FAILURES.append(name)

    np0 = jnp.zeros((B,), jnp.int32)
    got = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))(
        q, k, v)
    exact = jax.jit(functools.partial(
        ref_attn, precision=jax.lax.Precision.HIGHEST))(q, k, v, np0)
    base = jax.jit(functools.partial(
        ref_attn, precision=jax.lax.Precision.DEFAULT))(q, k, v, np0)
    check_vs_oracle("flash static causal", got, exact, base)

    # --- flash cached: dynamic npast + GQA (n_rep=2) -------------------
    kg = k[:, ::2]  # 2 kv heads
    vg = v[:, ::2]
    npast = jnp.asarray([37, 101], jnp.int32)
    got = jax.jit(
        lambda q, kk, vv, np_: flash_attention_cached(q, kk, vv, np_)
    )(q[:, :, :8, :], kg, vg, npast)
    exact, base = (
        jax.jit(
            lambda q, kk, vv, np_, p=p: ref_attn(
                q, jnp.repeat(kk, 2, axis=1), jnp.repeat(vv, 2, axis=1),
                np_, p)
        )(q[:, :, :8, :], kg, vg, npast)
        for p in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT)
    )
    check_vs_oracle("flash cached GQA dyn-npast", got, exact, base)

    # --- fused flash-decode over the flat cache (kernels.attn_decode) ---
    from ggmlsharp_tpu.kernels.attn_decode import flash_decode_flat

    for Hq, Hkv, label in ((4, 4, "flash-decode flat MHA"),
                           (8, 2, "flash-decode flat GQA4")):
        Dd, Tt = 128, 512
        E = Hkv * Dd
        qd_ = jnp.asarray(
            rng.standard_normal((2, Hq, Dd)).astype(np.float32))
        kr = jnp.asarray(rng.standard_normal((2, Tt, E)).astype(np.float32))
        vr = jnp.asarray(rng.standard_normal((2, Tt, E)).astype(np.float32))
        knr = jnp.asarray(rng.standard_normal((2, E)).astype(np.float32))
        vnr = jnp.asarray(rng.standard_normal((2, E)).astype(np.float32))
        npd = jnp.asarray([73, 422], jnp.int32)
        got = jax.jit(lambda a, b, c, d, e, f: flash_decode_flat(
            a, b, c, d, e, f, Hkv, Dd))(qd_, knr, vnr, kr, vr, npd)

        def fd_ref(qh, kn, vn, kc, vc, npast, precision, round_p=False):
            nrep = Hq // Hkv
            kk = kc.at[jnp.arange(2), npast].set(kn)
            vv = vc.at[jnp.arange(2), npast].set(vn)
            k4 = jnp.repeat(kk.reshape(2, Tt, Hkv, Dd).transpose(0, 2, 1, 3),
                            nrep, axis=1)
            v4 = jnp.repeat(vv.reshape(2, Tt, Hkv, Dd).transpose(0, 2, 1, 3),
                            nrep, axis=1)
            # q head hq = hkv*nrep + r  →  kv head hq // nrep (kernel order)
            o = ref_attn(qh[:, :, None, :], k4, v4, npast, precision,
                         round_p=round_p)
            return o[:, :, 0, :]

        exact = jax.jit(functools.partial(
            fd_ref, precision=jax.lax.Precision.HIGHEST))(
            qd_, knr, vnr, kr, vr, npd)
        base = jax.jit(functools.partial(
            fd_ref, precision=jax.lax.Precision.DEFAULT))(
            qd_, knr, vnr, kr, vr, npd)
        check_vs_oracle(label, got, exact, base)

        # bf16 cache (the serving flat-cache dtype): scores + P·V ride
        # single-pass bf16 MXU dots (Mosaic rejects bf16×HIGHEST — r5) —
        # bar is the DEFAULT-precision einsum's own deviation
        got_bf = jax.jit(lambda a, b, c, d, e, f: flash_decode_flat(
            a, b, c, d, e, f, Hkv, Dd))(
            qd_, knr, vnr, kr.astype(jnp.bfloat16),
            vr.astype(jnp.bfloat16), npd)
        exact_bf = jax.jit(functools.partial(
            fd_ref, precision=jax.lax.Precision.HIGHEST))(
            qd_, knr, vnr, kr.astype(jnp.bfloat16).astype(jnp.float32),
            vr.astype(jnp.bfloat16).astype(jnp.float32), npd)
        base_bf = jax.jit(functools.partial(
            fd_ref, precision=jax.lax.Precision.DEFAULT, round_p=True))(
            qd_, knr, vnr, kr.astype(jnp.bfloat16).astype(jnp.float32),
            vr.astype(jnp.bfloat16).astype(jnp.float32), npd)
        check_vs_oracle(label + " bf16-cache", got_bf, exact_bf, base_bf,
                        floor=4e-3)

        if Hq != Hkv:
            continue
        # INT8 KV: per-(token, head) scales expanded to lanes in-kernel via
        # the one-hot MXU dot — the BASELINE config-3 decode path
        rh = np.asarray(kr).reshape(2, Tt, Hkv, Dd)
        ks_np = np.abs(rh).max(-1) / 127.0 + 1e-8
        kq = np.clip(np.round(rh / ks_np[..., None]), -127, 127)
        rhv = np.asarray(vr).reshape(2, Tt, Hkv, Dd)
        vs_np = np.abs(rhv).max(-1) / 127.0 + 1e-8
        vq = np.clip(np.round(rhv / vs_np[..., None]), -127, 127)
        got8 = jax.jit(lambda a, b, c, d, e, f, g, h: flash_decode_flat(
            a, b, c, d, e, f, Hkv, Dd, k_scale=g, v_scale=h))(
            qd_, knr, vnr,
            jnp.asarray(kq.reshape(2, Tt, E), jnp.int8),
            jnp.asarray(vq.reshape(2, Tt, E), jnp.int8),
            npd, jnp.asarray(ks_np, jnp.float32),
            jnp.asarray(vs_np, jnp.float32))
        kdq = jnp.asarray((kq * ks_np[..., None]).reshape(2, Tt, E),
                          jnp.float32)
        vdq = jnp.asarray((vq * vs_np[..., None]).reshape(2, Tt, E),
                          jnp.float32)
        exact8 = jax.jit(functools.partial(
            fd_ref, precision=jax.lax.Precision.HIGHEST))(
            qd_, knr, vnr, kdq, vdq, npd)
        base8 = jax.jit(functools.partial(
            fd_ref, precision=jax.lax.Precision.DEFAULT, round_p=True))(
            qd_, knr, vnr, kdq, vdq, npd)
        check_vs_oracle("flash-decode flat INT8 KV", got8, exact8, base8,
                        floor=4e-3)

    # --- GPT-2 whole-layer megakernel (kernels.gpt2_layer) --------------
    from ggmlsharp_tpu.kernels.gpt2_layer import (
        fuse_gpt2_layer, gpt2_layer_step,
    )
    from ggmlsharp_tpu.kernels.mlp_fused import q8_korder_perm
    from ggmlsharp_tpu.quant.quantize import dequantize

    E, H, F, T = 256, 4, 1024, 128
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * .1)
    blk = {
        "ln_1": {"g": 1.0 + 0.1 * r(E), "b": 0.05 * r(E)},
        "attn": {"c_attn_w": r(3 * E, E), "c_attn_b": 0.1 * r(3 * E),
                 "c_proj_w": r(E, E), "c_proj_b": 0.1 * r(E)},
        "ln_2": {"g": 1.0 + 0.1 * r(E), "b": 0.05 * r(E)},
        "mlp": {"c_fc_w": r(F, E), "c_fc_b": 0.1 * r(F),
                "c_proj_w": r(E, F), "c_proj_b": 0.1 * r(E)},
    }
    fusedl = jax.jit(fuse_gpt2_layer)(blk)
    sig = q8_korder_perm(E)
    inv = np.argsort(sig)
    xl = jnp.asarray(rng.standard_normal((1, E)).astype(np.float32) * 0.5)
    ke = jnp.asarray(rng.standard_normal((T, E)).astype(np.float32) * 0.3)
    ve = jnp.asarray(rng.standard_normal((T, E)).astype(np.float32) * 0.3)
    npl = 17
    yv, knv, vnv = jax.jit(
        lambda a, b, c: gpt2_layer_step(fusedl, a, b, c, jnp.int32(npl),
                                        H, 1e-5)
    )(xl[:, sig], ke[:, sig], ve[:, sig])

    def layer_ref(x):
        dq = lambda t: dequantize(quantize(t, GType.Q8_0))
        ln = lambda u, g, b: ((u - u.mean(-1, keepdims=True))
                              / jnp.sqrt(u.var(-1, keepdims=True) + 1e-5)
                              ) * g + b
        xn = ln(x, blk["ln_1"]["g"], blk["ln_1"]["b"])
        qkv = xn @ dq(blk["attn"]["c_attn_w"]).T + blk["attn"]["c_attn_b"]
        qq, kn, vn = jnp.split(qkv, 3, axis=-1)
        D = E // H
        ks = ke.at[npl].set(kn[0])
        vs = ve.at[npl].set(vn[0])
        s = jnp.einsum("hd,htd->ht", qq.reshape(H, D),
                       ks.reshape(T, H, D).transpose(1, 0, 2)) / (D ** 0.5)
        s = jnp.where(jnp.arange(T)[None] <= npl, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        a = jnp.einsum("ht,htd->hd", p,
                       vs.reshape(T, H, D).transpose(1, 0, 2)).reshape(1, E)
        x2 = x + a @ dq(blk["attn"]["c_proj_w"]).T + blk["attn"]["c_proj_b"]
        x2n = ln(x2, blk["ln_2"]["g"], blk["ln_2"]["b"])
        from ggmlsharp_tpu.ops.basic import gelu

        hh = gelu(x2n @ dq(blk["mlp"]["c_fc_w"]).T + blk["mlp"]["c_fc_b"])
        return x2 + hh @ dq(blk["mlp"]["c_proj_w"]).T + blk["mlp"]["c_proj_b"]

    want = jax.jit(layer_ref)(xl)
    check("gpt2 layer megakernel", yv[:, inv], want, rtol=5e-2, atol=2e-1)

    # --- llama whole-layer megakernel (kernels.llama_layer) -------------
    from ggmlsharp_tpu.kernels.llama_layer import (
        a2e_map, fuse_llama_layer, llama_layer_step,
    )
    from ggmlsharp_tpu.kernels.mlp_fused import q4_korder_perm as q4perm
    from ggmlsharp_tpu.ops.attention import rope as rope_op

    El, Hl, Dl, Fl, Tl = 256, 4, 64, 704, 128

    class _LCfg:
        n_embd, n_head, n_head_kv, head_dim, n_ff = El, Hl, Hl, Dl, Fl
        rms_eps, rope_base, rope_mode = 1e-6, 10000.0, 0

    lcfg = _LCfg()
    lblk = {
        "attn_norm": 1.0 + 0.1 * r(El), "ffn_norm": 1.0 + 0.1 * r(El),
        "wq": r(El, El), "wk": r(El, El), "wv": r(El, El), "wo": r(El, El),
        "w_gate": r(Fl, El), "w_up": r(Fl, El), "w_down": r(El, Fl),
    }
    lfused = jax.jit(lambda b: fuse_llama_layer(b, lcfg))(lblk)
    sigl = q4perm(El)
    invl = np.argsort(sigl)
    a2e = a2e_map(El, Dl, 0)
    xw = jnp.asarray(rng.standard_normal((1, El)).astype(np.float32) * 0.5)
    katt = jnp.asarray(rng.standard_normal((Tl, El)).astype(np.float32) * .3)
    vatt = jnp.asarray(rng.standard_normal((Tl, El)).astype(np.float32) * .3)
    npll = 29
    yl, _, _ = jax.jit(lambda a, b, c: llama_layer_step(
        lfused, a, b, c, jnp.int32(npll), lcfg))(
        xw[:, sigl], katt, vatt)

    def llayer_ref(x):
        dq = lambda t: dequantize(quantize(t, GType.Q4_0))
        rms = lambda v, g: v / jnp.sqrt(
            jnp.mean(v * v, -1, keepdims=True) + 1e-6) * g
        xn = rms(x, lblk["attn_norm"])
        wqkv = jnp.concatenate(
            [dq(lblk["wq"]), dq(lblk["wk"]), dq(lblk["wv"])], 0)
        qkv = wqkv @ xn[0]
        rp = lambda v: jax.vmap(lambda t: rope_op(
            t, jnp.asarray([npll], jnp.int32), mode=0))(
            v.reshape(Hl, 1, Dl)).reshape(El)
        qq, knl, vnl = rp(qkv[:El]), rp(qkv[El:2*El]), qkv[2*El:]
        inva = np.argsort(a2e)
        ks = katt[:, inva].at[npll].set(knl)
        vs = vatt[:, inva].at[npll].set(vnl)
        s = jnp.einsum("hd,thd->ht", qq.reshape(Hl, Dl),
                       ks.reshape(Tl, Hl, Dl)) / (Dl ** 0.5)
        s = jnp.where(jnp.arange(Tl)[None] <= npll, s, -1e30)
        p_ = jax.nn.softmax(s, axis=-1)
        att = jnp.einsum("ht,thd->hd", p_,
                         vs.reshape(Tl, Hl, Dl)).reshape(El)
        colperm = a2e[np.argsort(sigl)]
        wo_eff = dq(jnp.asarray(np.asarray(lblk["wo"])[:, colperm])
                    )[:, np.argsort(colperm)]
        x2 = x[0] + wo_eff @ att
        x2n = rms(x2, lblk["ffn_norm"])
        g_ = dq(lblk["w_gate"]) @ x2n
        u_ = dq(lblk["w_up"]) @ x2n
        kpl = -(-Fl // 512) * 512
        wdnp = dq(jnp.pad(lblk["w_down"], ((0, 0), (0, kpl - Fl))))
        return (x2 + wdnp[:, :Fl] @ (g_ * jax.nn.sigmoid(g_) * u_))[None]

    check("llama layer megakernel", yl[:, invl], jax.jit(llayer_ref)(xw),
          rtol=5e-2, atol=2e-1)

    # --- speculative decode: greedy-exact on-chip ----------------------
    # (models/speculative.py) spec rounds ride the same forward paths the
    # kernels above verified; this checks the accept/rollback machinery
    # end-to-end on hardware: output must be bit-identical to plain greedy.
    from ggmlsharp_tpu.models import llama, sampling
    from ggmlsharp_tpu.models.speculative import speculative_generate

    scfg = llama.TINY_LLAMA
    stp = llama.init_params(jax.random.PRNGKey(2), scfg, dtype=jnp.float32)
    sdp = llama.init_params(jax.random.PRNGKey(3), scfg, dtype=jnp.float32)
    sprompt = jnp.asarray([[4, 8, 15, 16, 23, 42]], jnp.int32)
    sref, _ = sampling.generate(
        llama.forward, scfg, stp, sprompt,
        llama.new_cache(scfg, 1, dtype=jnp.float32), 12)
    stoks, _ = speculative_generate(
        llama.forward, scfg, stp, llama.forward, scfg, sdp, sprompt,
        llama.new_cache(scfg, 1, dtype=jnp.float32),
        llama.new_cache(scfg, 1, dtype=jnp.float32), 12, k=3)
    sok = np.array_equal(np.asarray(stoks), np.asarray(sref))
    print(f"  {'ok ' if sok else 'FAIL'} {'speculative greedy-exact':28s}",
          flush=True)
    if not sok:
        FAILURES.append("speculative greedy-exact")

    # --- graph/compat layer on the chip (VERDICT r3 #6) -----------------
    # The reference-parity API (graph builders + build_backward) staged
    # through the real remote compile: forward value, first-order grads,
    # and the builder flash_attn (now Pallas-routed on TPU) against the
    # materialized-scores oracle.
    from ggmlsharp_tpu.graph import (build_backward, build_forward,
                                     builders as B, leaf, set_param)
    from ggmlsharp_tpu import ops as O

    xg = set_param(leaf(jnp.full((8, 128), 0.5, jnp.float32)))
    wg = leaf(jnp.full((128, 128), 0.02, jnp.float32))
    fg = B.sum(B.sqr(B.mul_mat(wg, B.gelu(xg))))
    gfwd = build_forward(fg)
    gbwd = build_backward(gfwd)
    gfwd.compute()
    # f = sum((gelu(x) @ w.T)^2); closed form on constant inputs
    gelu_half = 0.5 * 0.5 * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (0.5 + 0.044715 * 0.5 ** 3)))
    row = gelu_half * 0.02 * 128  # each output element
    want_f = row * row * 128 * 8
    got_f = float(np.asarray(fg.data).reshape(-1)[0])
    gok = abs(got_f - want_f) / max(abs(want_f), 1e-9) < 2e-2
    print(f"  {'ok ' if gok else 'FAIL'} {'graph fwd on-chip':28s} "
          f"f={got_f:.4f} want~{want_f:.4f}", flush=True)
    if not gok:
        FAILURES.append("graph fwd on-chip")
    from ggmlsharp_tpu.graph import set_f32

    gfwd.reset()
    set_f32(fg.grad, 1.0)
    gbwd.compute()
    gnorm = float(np.abs(np.asarray(xg.grad.data)).mean())
    bok = np.isfinite(gnorm) and gnorm > 0
    print(f"  {'ok ' if bok else 'FAIL'} {'graph bwd on-chip':28s} "
          f"|dx|={gnorm:.3e}", flush=True)
    if not bok:
        FAILURES.append("graph bwd on-chip")

    qf = jnp.asarray(rng.standard_normal((4, 128, 64)), jnp.float32) * 0.3
    kf = jnp.asarray(rng.standard_normal((4, 128, 64)), jnp.float32) * 0.3
    vf = jnp.asarray(rng.standard_normal((4, 128, 64)), jnp.float32) * 0.3
    fa = B.flash_attn(leaf(qf), leaf(kf), leaf(vf), masked=True)
    gfa = build_forward(fa)
    gfa.compute()
    want_fa = np.asarray(jax.jit(
        lambda q, k, v: O.flash_attn(q, k, v, masked=True,
                                     use_pallas=False))(qf, kf, vf))
    fok = np.allclose(np.asarray(fa.data), want_fa, rtol=2e-2, atol=2e-2)
    print(f"  {'ok ' if fok else 'FAIL'} {'builder flash_attn==pallas':28s}",
          flush=True)
    if not fok:
        FAILURES.append("builder flash_attn pallas")

    dt = time.time() - t0
    print(f"{'SMOKE FAILED: ' + ', '.join(FAILURES) if FAILURES else 'SMOKE OK'}"
          f"  ({dt:.0f}s)", flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
