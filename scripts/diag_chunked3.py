"""Chunked-K Q4_0 operand-indexing truth table (no new kernels — reuses the
deployed fused entry with chunk-zeroed INPUT VALUES):

    x0 only  (x chunk 1 zeroed): expect c0.  got x0·(w0+w1)? → x mis-indexed
    x1 only: expect c1.
    w0 only  (w chunk 1 zeroed before quantize): expect c0.  got (x0+x1)·w0?
             → weight planes mis-indexed
    w1 only: expect c1.
    full: expect c0+c1 (the failing case, for reference)

Run: python scripts/diag_chunked3.py
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

    tile, nc, kp = swar_layout(N, K, kt_bytes=swar_kt_bytes(GType.Q4_0))
    kc = kp // nc
    print(f"layout: tile={tile} nc={nc} kp={kp} kc={kc}", flush=True)
    kc_real = min(kc, K)

    def run(wv, xv):
        qw = jax.jit(lambda a: quantize(a, GType.Q4_0))(jnp.asarray(wv))
        qs = jax.jit(to_swar)(qw)
        got = np.asarray(jax.jit(
            lambda v, qs=qs: mul_mat_q_fused(qs, v, quantize_acts=False))(
            jnp.asarray(xv)))
        wd = np.zeros((N, kp), np.float32)
        wd[:, :K] = np.asarray(jax.jit(dequantize)(qw))
        xpad = np.zeros((8, kp), np.float32)
        xpad[:, :K] = xv
        cs = [xpad[:, j * kc : (j + 1) * kc] @ wd[:, j * kc : (j + 1) * kc].T
              for j in range(nc)]
        return got, cs

    def report(label, got, hyps):
        scale = max(np.abs(h).max() for h in hyps.values()) + 1e-6
        best = min(hyps, key=lambda n: np.max(np.abs(got - hyps[n])))
        line = "  ".join(f"{n}={np.max(np.abs(got - h)) / scale:.2e}"
                         for n, h in hyps.items())
        print(f"  {label:10s} best={best:12s} {line}", flush=True)

    # full (reference failing case)
    got, cs = run(w_np, x_np)
    report("full", got, {"c0+c1": cs[0] + cs[1], "2c0": 2 * cs[0],
                         "2c1": 2 * cs[1], "c0": cs[0], "c1": cs[1]})

    # x chunk zeroing
    x0 = x_np.copy(); x0[:, kc_real:] = 0.0
    got, cs = run(w_np, x0)
    report("x0-only", got, {"c0": cs[0], "2c0": 2 * cs[0],
                            "c0+c1": cs[0] + cs[1]})
    x1 = x_np.copy(); x1[:, :kc_real] = 0.0
    got, cs = run(w_np, x1)
    report("x1-only", got, {"c1": cs[1], "2c1": 2 * cs[1],
                            "c0+c1": cs[0] + cs[1]})

    # w chunk zeroing
    w0 = w_np.copy(); w0[:, kc_real:] = 0.0
    got, cs = run(w0, x_np)
    report("w0-only", got, {"c0": cs[0], "2c0": 2 * cs[0],
                            "c0+c1": cs[0] + cs[1]})
    w1 = w_np.copy(); w1[:, :kc_real] = 0.0
    got, cs = run(w1, x_np)
    report("w1-only", got, {"c1": cs[1], "2c1": 2 * cs[1],
                            "c0+c1": cs[0] + cs[1]})


if __name__ == "__main__":
    main()
