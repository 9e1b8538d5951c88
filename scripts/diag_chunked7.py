"""Where is the corruption? Stage EVERYTHING except the pallas kernel on
the host CPU backend, upload the finished planes, and run only the fused
kernel on the TPU. Also fetch the TPU-computed planes and diff them against
the CPU-computed ones.

    P1  CPU-staged planes → TPU kernel → vs host matmul   (kernel-only)
    P2  TPU quantize/to_swar planes fetched → vs CPU planes (staging chain)
    P3  TPU kernel on TPU-staged planes (the failing original)

If P1 passes while P3 fails and P2 shows plane diffs, the corruption is in
the on-device quantize/to_swar/upload chain, not the kernel.
Run: python scripts/diag_chunked7.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(f"devices: {jax.devices()} + cpu {jax.devices('cpu')}", flush=True)
    from ggmlsharp_tpu import GType, quantize, dequantize
    from ggmlsharp_tpu.kernels.matmul_q import mul_mat_q_fused
    from ggmlsharp_tpu.quant.formats import to_swar

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    rng = np.random.default_rng(7)
    N, K = 256, 11008
    w_np = rng.standard_normal((N, K)).astype(np.float32) * 0.5
    x_np = rng.standard_normal((8, K)).astype(np.float32)

    # --- CPU staging: quantize + to_swar + dequant truth, all on host ----
    with jax.default_device(cpu):
        qw_c = jax.jit(lambda a: quantize(a, GType.Q4_0))(jnp.asarray(w_np))
        qs_c = jax.jit(to_swar)(qw_c)
        wd_c = np.asarray(jax.jit(dequantize)(qw_c))
        qs_host = jax.tree.map(np.asarray, qs_c)
    want = x_np @ wd_c.T

    # --- P1: upload CPU planes, kernel-only on TPU -----------------------
    qs_t = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a), tpu), qs_host)
    x = jax.device_put(x_np, tpu)
    got1 = np.asarray(jax.jit(
        lambda v: mul_mat_q_fused(qs_t, v, quantize_acts=False))(x))
    err1 = np.max(np.abs(got1 - want) / (np.abs(want) + 2e-1))
    print(f"  P1 kernel-only (CPU-staged planes)  err {err1:.3e}",
          flush=True)

    # --- P3: the original failing path (TPU-staged) ----------------------
    qw_d = jax.jit(lambda a: quantize(a, GType.Q4_0))(
        jax.device_put(w_np, tpu))
    qs_d = jax.jit(to_swar)(qw_d)
    got3 = np.asarray(jax.jit(
        lambda v: mul_mat_q_fused(qs_d, v, quantize_acts=False))(x))
    err3 = np.max(np.abs(got3 - want) / (np.abs(want) + 2e-1))
    print(f"  P3 TPU-staged planes                err {err3:.3e}",
          flush=True)

    # --- P2: fetch TPU planes, diff vs CPU planes ------------------------
    for name in qs_host.planes:
        a = np.asarray(qs_d.planes[name])
        b = np.asarray(qs_host.planes[name])
        n_diff = int((a != b).sum())
        print(f"  P2 plane {name:6s} shape {a.shape} "
              f"diffs {n_diff}/{a.size}", flush=True)
    # and the raw wire planes from quantize itself
    for name in ("qs", "d"):
        a = np.asarray(qw_d.planes[name])
        b = np.asarray(qw_c.planes[name])
        n_diff = int((a != b).sum())
        print(f"  P2 qw    {name:6s} shape {a.shape} "
              f"diffs {n_diff}/{a.size}", flush=True)


if __name__ == "__main__":
    main()
