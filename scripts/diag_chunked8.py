"""diag8: the kernel in total isolation + effective-map recovery.

diag7 exonerated plane staging (CPU/TPU planes bit-identical, kernel fails
on both). Remaining suspects: the Pallas kernel execution itself, the
TPU-side x permute, or the relay. This probe removes the x permute too —
EVERY operand (planes, xlo/xhi, xs) is computed on the host CPU backend and
uploaded, so the TPU runs exactly one Pallas executable on known-good bits.

  A  config scan: does a SMALL-k nc=2 kernel fail? (fast repro hunt)
  B  one batched execution holding: full x, chunk-0-only x, chunk-1-only x,
     and per-block indicator rows → tests linearity INSIDE one execution
     and recovers which k-blocks the kernel misroutes.

Run: python scripts/diag_chunked8.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def stage_cpu(w_np, nc, cpu):
    """Quantize Q4_0 + build swar planes with explicit nc, all on host."""
    from ggmlsharp_tpu import GType, quantize, dequantize
    from ggmlsharp_tpu.quant.formats import (
        swar_pack_values, swar_pack_scales, unpack_nibbles,
        from_storage_order)

    n, k = w_np.shape
    with jax.default_device(cpu):
        qw = jax.jit(lambda a: quantize(a, GType.Q4_0))(jnp.asarray(w_np))
        wd = np.asarray(jax.jit(dequantize)(qw))

        def pack(qs, d):
            vals = from_storage_order(unpack_nibbles(qs, k), 32)
            return swar_pack_values(vals, nc), swar_pack_scales(d, nc)

        qs_t, d_t = jax.jit(pack)(qw.planes["qs"], qw.planes["d"])
        planes = {"qs_t": np.asarray(qs_t), "d_t": np.asarray(d_t)}
    return planes, wd


def permute_cpu(x_np, k, nc, cpu):
    from ggmlsharp_tpu.kernels.matmul_q import swar_permute_x

    with jax.default_device(cpu):
        xlo, xhi = jax.jit(
            lambda a: swar_permute_x(a, k, nc))(jnp.asarray(x_np))
        return np.asarray(xlo), np.asarray(xhi)


def run_case(name, w_np, x_np, nc, tile, tile_b, cpu, tpu):
    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.kernels.matmul_q import _call_kernel_swar

    n, k = w_np.shape
    planes, wd = stage_cpu(w_np, nc, cpu)
    xlo, xhi = permute_cpu(x_np, k, nc, cpu)
    xs = x_np.reshape(x_np.shape[0], k // 32, 32).sum(axis=-1)
    want = x_np @ wd.T

    dev = {kk: jax.device_put(v, tpu) for kk, v in planes.items()}
    got = np.asarray(_call_kernel_swar(
        jax.device_put(xlo, tpu), jax.device_put(xhi, tpu),
        jax.device_put(xs.astype(np.float32), tpu), dev,
        GType.Q4_0, n, k, tile, nc, tile_b))
    err = np.abs(got - want) / (np.abs(want) + 2e-1)
    print(f"  {name:34s} err {err.max():.3e}", flush=True)
    return got, want, err


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.default_rng(7)
    N = 256

    # --- A: config scan (small-k repro hunt) -----------------------------
    print("=== A config scan (all operands CPU-staged)", flush=True)
    for k, nc, tile in ((1024, 1, 256), (1024, 2, 256), (2048, 2, 256),
                        (2048, 4, 256), (11264, 2, 256), (11264, 1, 128)):
        w_np = rng.standard_normal((N, k)).astype(np.float32) * 0.5
        x_np = rng.standard_normal((8, k)).astype(np.float32)
        try:
            run_case(f"k={k} nc={nc} tile={tile}", w_np, x_np, nc, tile, 8,
                     cpu, tpu)
        except Exception as e:  # noqa: BLE001
            print(f"  k={k} nc={nc} tile={tile}  EXC {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # --- B: one-execution linearity + block probe at the failing shape ---
    print("=== B linearity + block probe, k=11264 nc=2", flush=True)
    k, nc, tile = 11264, 2, 256
    C = k // 32
    w_np = rng.standard_normal((N, k)).astype(np.float32) * 0.5
    xf = rng.standard_normal(k).astype(np.float32)
    rows = [xf]
    x0 = xf.copy(); x0[k // 2:] = 0.0; rows.append(x0)   # chunk 0 only
    x1 = xf.copy(); x1[: k // 2] = 0.0; rows.append(x1)  # chunk 1 only
    blk = np.zeros((C, k), np.float32)
    for c in range(C):
        blk[c, c * 32 : (c + 1) * 32] = xf[c * 32 : (c + 1) * 32]
    x_np = np.concatenate([np.stack(rows), blk,
                           np.zeros((5, k), np.float32)])  # b=360
    got, want, err = run_case("b=360 probe", w_np, x_np, nc, tile, 8,
                              cpu, tpu)

    g_full, g_c0, g_c1 = got[0], got[1], got[2]
    w_full = want[0]
    scale = np.abs(w_full) + 2e-1
    print(f"  full vs want        {np.max(np.abs(g_full - w_full)/scale):.3e}",
          flush=True)
    print(f"  c0+c1 vs full(got)  {np.max(np.abs(g_c0 + g_c1 - g_full)/scale):.3e}",
          flush=True)
    print(f"  c0 vs want-c0       {np.max(np.abs(g_c0 - want[1])/scale):.3e}",
          flush=True)
    print(f"  c1 vs want-c1       {np.max(np.abs(g_c1 - want[2])/scale):.3e}",
          flush=True)
    bsum = got[3 : 3 + C].sum(axis=0)
    print(f"  sum(blocks) vs full(got) {np.max(np.abs(bsum - g_full)/scale):.3e}",
          flush=True)

    # which blocks are wrong, and do they match some OTHER block's truth?
    be = np.abs(got[3 : 3 + C] - want[3 : 3 + C]).max(axis=1) / (
        np.abs(want[3 : 3 + C]).max(axis=1) + 1e-3)
    bad = np.nonzero(be > 0.2)[0]
    print(f"  bad blocks: {len(bad)}/{C}  first 20: {bad[:20].tolist()}",
          flush=True)
    if len(bad):
        W = want[3 : 3 + C]
        for c in bad[:8]:
            g = got[3 + c]
            d = np.abs(W - g[None]).max(axis=1)
            j = int(np.argmin(d))
            print(f"    block {c:4d} best-matches want-block {j:4d} "
                  f"(err {d[j]:.3e}; self {d[c]:.3e})", flush=True)


if __name__ == "__main__":
    main()
