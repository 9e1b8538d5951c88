"""Chunked-K miscompile fingerprinting: fetch the WRONG device output of the
Q8_0 chunked kernel (cache-hit, no new compiles) and match it against
host-simulated mis-indexing hypotheses:

    true   = c0 + c1                  (chunk contributions, element order)
    H_2c0  = 2·c0        (every jc reads chunk 0)
    H_2c1  = 2·c1
    H_c0   = c0          (chunk-1 step lost / final write stale)
    H_c1   = c1          (init overwrote chunk 0)
    H_xq   = x0·w1 + x1·w0 (x and weights indexed oppositely)
    H_d0   = qs per chunk, d always chunk 0
    H_d1   = qs per chunk, d always chunk 1

Run: python scripts/diag_chunked2.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    from ggmlsharp_tpu import GType, quantize, dequantize
    from ggmlsharp_tpu.kernels.matmul_q import mul_mat_q_fused
    from ggmlsharp_tpu.quant.formats import (
        swar_kt_bytes, swar_layout, to_swar,
    )

    rng = np.random.default_rng(7)
    N, K = 256, 11008
    w_np = rng.standard_normal((N, K)).astype(np.float32) * 0.5
    x_np = rng.standard_normal((8, K)).astype(np.float32)
    w = jnp.asarray(w_np)
    x = jnp.asarray(x_np)

    qw8 = jax.jit(lambda a: quantize(a, GType.Q8_0))(w)
    qs8 = jax.jit(to_swar)(qw8)
    got = np.asarray(jax.jit(
        lambda v: mul_mat_q_fused(qs8, v, quantize_acts=False))(x))

    # host side: dequantized padded weights + chunk split
    tile, nc, kp = swar_layout(N, K, kt_bytes=swar_kt_bytes(GType.Q8_0))
    kc = kp // nc
    print(f"layout: tile={tile} nc={nc} kp={kp} kc={kc}", flush=True)
    wd = np.zeros((N, kp), np.float32)
    wd[:, :K] = np.asarray(jax.jit(dequantize)(qw8))
    xp = np.zeros((8, kp), np.float32)
    xp[:, :K] = x_np

    cs = [xp[:, j * kc : (j + 1) * kc] @ wd[:, j * kc : (j + 1) * kc].T
          for j in range(nc)]
    # d-swap hypotheses: dequant wd with chunk j's values but chunk f's
    # scales ≈ too fiddly at q8 granularity; approximate by value swap only
    hyps = {
        "true c0+c1": sum(cs),
        "2*c0": 2 * cs[0],
        "2*c1": 2 * cs[1],
        "c0 only": cs[0],
        "c1 only": cs[1],
        "x0w1+x1w0": (xp[:, :kc] @ wd[:, kc:].T
                      + xp[:, kc:] @ wd[:, :kc].T),
        "x0(w0+w1)": xp[:, :kc] @ (wd[:, :kc] + wd[:, kc:]).T,
        "x1(w0+w1)": xp[:, kc:] @ (wd[:, :kc] + wd[:, kc:]).T,
        "(x0+x1)w0": (xp[:, :kc] + xp[:, kc:]) @ wd[:, :kc].T,
        "(x0+x1)w1": (xp[:, :kc] + xp[:, kc:]) @ wd[:, kc:].T,
    }
    scale = np.abs(hyps["true c0+c1"]).max()
    for name, h in hyps.items():
        err = np.max(np.abs(got - h)) / scale
        print(f"  vs {name:12s} max-abs-err/scale {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
