"""Discriminating real-TPU diagnostic for the chunked-K SWAR failure
(smoke: "swar chunked-K Q4_0/Q4_1" wrong by rel-err ~2 on real Mosaic while
interpret mode passes — post-d3b0c77).

Isolates WHERE the miscompile lives on the 7B w_down shape
(k=11008 → kp=11264, nc=11, kc=1024, cc=32):
  T1  Q8_0 chunked       — chunk BlockSpec indexing + output accumulation,
                           NO affine fold (no xs operand at all)
  T2  Q4_0 linear part   — same kernel, xs forced to ZERO on device, affine
                           term added back HOST-side from the d plane
  T3  Q4_0 full (current)— the failing smoke case, for reference
  T4  Q4_1 full (current)

If T1+T2 pass and T3 fails, the (nc, b, cc) xs ride / in-kernel xs·caff dot
is the miscompiled piece. Run: python scripts/diag_chunked.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, want, rtol=5e-2, atol=2e-1):
    got = np.asarray(got)
    want = np.asarray(want)
    err = np.max(np.abs(got - want) / (np.abs(want) + atol))
    ok = np.allclose(got, want, rtol=rtol, atol=atol) \
        and np.isfinite(got).all()
    print(f"  {'ok ' if ok else 'FAIL'} {name:32s} max-rel-err {err:.2e}",
          flush=True)
    return ok


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    from ggmlsharp_tpu import GType, quantize
    from ggmlsharp_tpu.kernels.matmul_q import (
        _MAX_XB_BYTES, _call_kernel_swar, mul_mat_q_fused, swar_permute_x,
    )
    from ggmlsharp_tpu.ops.matmul import mul_mat_q
    from ggmlsharp_tpu.quant.formats import (
        swar_kt_bytes, swar_layout, to_swar,
    )

    rng = np.random.default_rng(7)
    N, K = 256, 11008
    w_np = rng.standard_normal((N, K)).astype(np.float32) * 0.5
    x_np = rng.standard_normal((8, K)).astype(np.float32)
    w = jnp.asarray(w_np)
    x = jnp.asarray(x_np)

    # --- T1: Q8_0 chunked (no affine path at all) -----------------------
    qw8 = jax.jit(lambda a: quantize(a, GType.Q8_0))(w)
    qs8 = jax.jit(to_swar)(qw8)
    got8 = jax.jit(lambda v: mul_mat_q_fused(qs8, v, quantize_acts=False))(x)
    want8 = jax.jit(lambda v: mul_mat_q(qw8, v, quantize_acts=False))(x)
    check("T1 Q8_0 chunked", got8, want8)

    # --- T3/T4: the failing smoke cases, for magnitudes -----------------
    results = {}
    for g in (GType.Q4_0, GType.Q4_1):
        qw = jax.jit(lambda a, g=g: quantize(a, g))(w)
        qs = jax.jit(to_swar)(qw)
        got = jax.jit(
            lambda v, qs=qs: mul_mat_q_fused(qs, v, quantize_acts=False))(x)
        want = jax.jit(
            lambda v, qw=qw: mul_mat_q(qw, v, quantize_acts=False))(x)
        check(f"T3 {g.name} full (current)", got, want)
        results[g] = (qw, qs, np.asarray(want))

    # --- T2: Q4_0 linear part (xs = 0 on device, affine added host-side)
    qw, qs, want = results[GType.Q4_0]
    tile, nc, kp = swar_layout(N, K, kt_bytes=swar_kt_bytes(GType.Q4_0))
    print(f"  layout: tile={tile} nc={nc} kp={kp} kc={kp//nc} "
          f"cc={(kp//nc)//32}", flush=True)
    x2 = jnp.pad(x, ((0, 0), (0, kp - K)))
    b = 8
    cap = max(8, _MAX_XB_BYTES // (kp * 4))
    tile_b = b
    while tile_b > cap and tile_b % 2 == 0:
        tile_b //= 2

    @jax.jit
    def linear_part(x2):
        xlo, xhi = swar_permute_x(x2, kp, nc, block=32)
        xs0 = jnp.zeros((b, kp // 32), jnp.float32)
        return _call_kernel_swar(xlo, xhi, xs0, dict(qs.planes),
                                 GType.Q4_0, N, kp, tile, nc, tile_b)

    got_lin = np.asarray(linear_part(x2))
    # host affine: sum per 32-block of x  ·  (-8 · d)   (d plane: (N, K/32))
    d = np.asarray(qw.planes["d"]).astype(np.float32)  # (N, C_real)
    C = kp // 32
    d_pad = np.zeros((N, C), np.float32)
    d_pad[:, : d.shape[1]] = d
    xs_host = np.asarray(x2).reshape(b, C, 32).sum(-1)  # element order
    affine = xs_host @ (-8.0 * d_pad).T
    check("T2 Q4_0 linear + host affine", got_lin + affine, want)

    # --- T2b: xs as ones — measures what the kernel ACTUALLY multiplies
    @jax.jit
    def ones_part(x2):
        xlo, xhi = swar_permute_x(x2, kp, nc, block=32)
        xs1 = jnp.ones((b, kp // 32), jnp.float32)
        return _call_kernel_swar(xlo, xhi, xs1, dict(qs.planes),
                                 GType.Q4_0, N, kp, tile, nc, tile_b)

    got_ones = np.asarray(ones_part(x2))
    # expected: linear + Σ_c (-8 d_c)  per chunk → with xs==1 everywhere the
    # affine dot adds Σ over the chunk's cc blocks of -8·d
    want_ones = got_lin + np.ones_like(xs_host) @ (-8.0 * d_pad).T
    check("T2b Q4_0 xs=1 in-kernel affine", got_ones, want_ones,
          rtol=1e-3, atol=1e-1)


if __name__ == "__main__":
    main()
