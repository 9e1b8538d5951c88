"""diag9: operand PROVENANCE vs shape — the same executable fed
(a) on-device-computed operands vs (b) jax.device_put-uploaded operands.

diag8 (CPU-verified harness) showed even small nc=1 configs computing
~100%-wrong results on hardware when every operand was uploaded, while the
committed smoke test — same kernel class, operands produced by on-device
jit computations — passes. If the relay mislays uploaded buffers (raw
row-major bytes where the executable expects a tiled layout), a kernel fed
uploaded planes fails while the identical executable fed device-computed
planes succeeds, and upload→fetch round trips still look bit-perfect
(symmetric mislay). This probe factorizes all of it at one shape.

Run: python scripts/diag_chunked9.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from ggmlsharp_tpu import GType, quantize, dequantize
    from ggmlsharp_tpu.kernels.matmul_q import (
        _call_kernel_swar, swar_permute_x)
    from ggmlsharp_tpu.quant.formats import (
        swar_pack_values, swar_pack_scales, unpack_nibbles,
        from_storage_order)

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.default_rng(7)
    N, K, NC, TILE, B = 256, 1024, 1, 256, 8
    w_np = rng.standard_normal((N, K)).astype(np.float32) * 0.5
    x_np = rng.standard_normal((B, K)).astype(np.float32)

    def pack(qs, d):
        vals = from_storage_order(unpack_nibbles(qs, K), 32)
        return {"qs_t": swar_pack_values(vals, NC),
                "d_t": swar_pack_scales(d, NC)}

    def xops(x):
        xlo, xhi = swar_permute_x(x, K, NC)
        xs = x.reshape(x.shape[0], K // 32, 32).sum(axis=-1)
        return xlo, xhi, xs

    # host truth
    with jax.default_device(cpu):
        qw_c = jax.jit(lambda a: quantize(a, GType.Q4_0))(jnp.asarray(w_np))
        wd = np.asarray(jax.jit(dequantize)(qw_c))
        pl_c = jax.tree.map(np.asarray, jax.jit(pack)(
            qw_c.planes["qs"], qw_c.planes["d"]))
        xlo_c, xhi_c, xs_c = jax.tree.map(np.asarray, jax.jit(xops)(
            jnp.asarray(x_np)))
    want = x_np @ wd.T

    # on-device staging (the smoke-test provenance)
    w_d = jax.device_put(w_np, tpu)
    x_d = jax.device_put(x_np, tpu)
    qw_d = jax.jit(lambda a: quantize(a, GType.Q4_0))(w_d)
    pl_d = jax.jit(pack)(qw_d.planes["qs"], qw_d.planes["d"])
    xlo_d, xhi_d, xs_d = jax.jit(xops)(x_d)

    # uploaded operands (the diag7/diag8 provenance)
    pl_u = {k: jax.device_put(v, tpu) for k, v in pl_c.items()}
    xlo_u = jax.device_put(xlo_c, tpu)
    xhi_u = jax.device_put(xhi_c, tpu)
    xs_u = jax.device_put(xs_c, tpu)

    def run(tag, xlo, xhi, xs, planes):
        got = np.asarray(_call_kernel_swar(
            xlo, xhi, xs, dict(planes), GType.Q4_0, N, K, TILE, NC, B))
        err = np.abs(got - want) / (np.abs(want) + 2e-1)
        print(f"  {tag:44s} max {err.max():.3e} med {np.median(err):.3e}",
              flush=True)
        return got

    print("=== same executable, operand provenance matrix", flush=True)
    ga = run("A dev-planes + dev-x", xlo_d, xhi_d, xs_d, pl_d)
    gb = run("B uploaded-planes + dev-x", xlo_d, xhi_d, xs_d, pl_u)
    gc = run("C dev-planes + uploaded-x", xlo_u, xhi_u, xs_u, pl_d)
    gd = run("D uploaded-planes + uploaded-x", xlo_u, xhi_u, xs_u, pl_u)

    print("=== value checks", flush=True)
    for name in ("qs_t", "d_t"):
        diff_dev = int((np.asarray(pl_d[name]) != pl_c[name]).sum())
        rt = int((np.asarray(pl_u[name]) != pl_c[name]).sum())
        print(f"  plane {name}: dev-vs-cpu diffs {diff_dev}, "
              f"upload-roundtrip diffs {rt}", flush=True)
    for name, dev, host in (("xlo", xlo_d, xlo_c), ("xhi", xhi_d, xhi_c),
                            ("xs", xs_d, xs_c)):
        dd = float(np.abs(np.asarray(dev) - host).max())
        print(f"  {name}: dev-vs-cpu max abs diff {dd:.3e}", flush=True)

    # structure of the error on the worst case
    worst = max(((ga, "A"), (gb, "B"), (gc, "C"), (gd, "D")),
                key=lambda t: np.abs(t[0] - want).max())
    g, tag = worst
    print(f"=== error structure, case {tag}", flush=True)
    print(f"  got[0,:6]  {g[0, :6]}", flush=True)
    print(f"  want[0,:6] {want[0, :6]}", flush=True)
    r = g[0] / np.where(np.abs(want[0]) < 1e-6, np.nan, want[0])
    print(f"  ratio quantiles {np.nanpercentile(r, [5, 25, 50, 75, 95])}",
          flush=True)


if __name__ == "__main__":
    main()
