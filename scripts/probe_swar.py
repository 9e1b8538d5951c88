"""Probe: SWAR nibble unpack via u32->int8 bitcast + transposed-layout dot.

The planewise v2 kernel spends ~4 VPU ops per weight element
(shift, mask, int->f32 cast, scale mul). This probes a cheaper unpack:

  P (K/8, N) u32, word (r, n) packs nibbles k=8r+j of weight row n
  lo = P & 0x0F0F0F0F          # 1 op per 8 elements
  hi = (P >> 4) & 0x0F0F0F0F   # 2 ops per 8 elements
  v  = pltpu.bitcast(lo, int8) # (K/2, N), free-ish
  w  = (v.astype(f32) - 8) * d16   # cast + sub + mul per element (dense)
  y  = x_lo @ w_lo + x_hi @ w_hi   # standard (b,K2)x(K2,N) dots

Total ~3.4 VPU ops/element vs ~4, and the 8-iteration plane loop becomes
2 dense ops — fewer, wider ops. Needs: Mosaic bitcast 32->8 on sublanes,
int8->f32 convert, sublane repeat for scales. This script empirically
determines the bitcast byte order, checks exactness vs a host oracle, and
slope-times against the current planewise v2 kernel.

Run on the real chip: python scripts/probe_swar.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, "/root/repo/")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import ggmlsharp_tpu.kernels.matmul_q as mq
from ggmlsharp_tpu import GType
from ggmlsharp_tpu.quant.formats import QTensor, to_storage_order

TILE = 256
LOOP = 64


def log(m):
    print(m, flush=True)


# ---------------------------------------------------------------- step 1
def probe_bitcast_order():
    """Write known bytes, read bitcast rows: which row gets which byte?"""

    def kernel(p_ref, o_ref):
        v = pltpu.bitcast(p_ref[:], jnp.int8)  # (32, 128) expected
        o_ref[:] = v.astype(jnp.int32)

    p = np.zeros((8, 128), np.uint32)
    # word at (r, lane) = bytes [4r+0, 4r+1, 4r+2, 4r+3] little-endian value
    for r in range(8):
        p[r, :] = (4 * r + 0) | ((4 * r + 1) << 8) | ((4 * r + 2) << 16) | (
            (4 * r + 3) << 24)

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
        interpret=mq.interpret_mode(),
    )(jnp.asarray(p))
    col = np.asarray(out)[:, 0]
    log(f"bitcast row->byte map (lane 0): {col.tolist()}")
    # contiguous little-endian would be [0,1,2,...,31]
    if (col == np.arange(32)).all():
        return "4r+b"
    # interleaved: row b*8+r = byte b of word r
    interleave = np.array([4 * r + b for b in range(4) for r in range(8)])
    if (col == interleave).all():
        return "b*R+r"
    return "unknown"


# ---------------------------------------------------------------- step 2
def swar_kernel(xlo_ref, xhi_ref, p_ref, d_ref, o_ref):
    p = p_ref[:]
    mask = jnp.uint32(0x0F0F0F0F)
    lo = p & mask
    hi = (p >> jnp.uint32(4)) & mask
    vlo = pltpu.bitcast(lo, jnp.int8)
    vhi = pltpu.bitcast(hi, jnp.int8)
    d16 = pltpu.repeat(d_ref[:], 16, axis=0)  # (K/32,N)->(K/2,N)
    wlo = (vlo.astype(jnp.float32) - 8.0) * d16
    whi = (vhi.astype(jnp.float32) - 8.0) * d16
    acc = jax.lax.dot_general(
        xlo_ref[:], wlo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    acc = acc + jax.lax.dot_general(
        xhi_ref[:], whi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("n", "k", "tile"))
def swar_mm(xlo, xhi, p, d, n, k, tile=TILE):
    b = xlo.shape[0]
    return pl.pallas_call(
        swar_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((b, k // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k // 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 32, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        interpret=mq.interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * k,
            bytes_accessed=p.size * 4 + d.size * 4 + b * k * 4 + b * n * 4,
            transcendentals=0),
    )(xlo, xhi, p, d)


def perms(k, order):
    """host-side k-permutations: x_lo[i] = x[perm_lo[i]].

    pltpu.repeat is TILE (concat) semantics, so the scale row for int8 row
    i is d[i mod C]: rows must interleave blocks — int8 row i ↔ block
    c = i mod C, slot t = i // C, k = 32c + 2t (+1 for hi)."""
    assert order == "4r+b"
    C = k // 32
    rows = np.arange(k // 2)
    c, t = rows % C, rows // C
    return 32 * c + 2 * t, 32 * c + 2 * t + 1  # lo (even), hi (odd)


def pack_plane(V):
    """V (K, N) ints 0..15 → u32 plane (K/8, N) in block-interleaved
    sublane storage order (see perms)."""
    k, n = V.shape
    C = k // 32
    P = np.zeros((k // 8, n), np.uint32)
    for r in range(k // 8):
        for b in range(4):
            i = 4 * r + b
            c, t = i % C, i // C
            P[r] |= V[32 * c + 2 * t].astype(np.uint32) << (8 * b)
            P[r] |= V[32 * c + 2 * t + 1].astype(np.uint32) << (8 * b + 4)
    return P


def check_correct(order, n=512, k=1024, b=8):
    rng = np.random.default_rng(0)
    V = rng.integers(0, 16, (k, n)).astype(np.int64)
    D = (rng.random((k // 32, n)).astype(np.float32) + 0.5) * 0.01
    x = rng.standard_normal((b, k)).astype(np.float32)

    P = pack_plane(V)

    y_ref = x @ ((V - 8).astype(np.float32) * np.repeat(D, 32, axis=0))

    plo, phi = perms(k, order)
    y = np.asarray(swar_mm(jnp.asarray(x[:, plo]), jnp.asarray(x[:, phi]),
                           jnp.asarray(P), jnp.asarray(D), n, k, 256))
    err = np.abs(y - y_ref).max() / max(np.abs(y_ref).max(), 1e-9)
    log(f"swar correctness (order {order}): rel err {err:.3e}")
    return err < 2e-2  # DEFAULT bf16 dot rounding


# ---------------------------------------------------------------- step 3
@functools.partial(jax.jit, static_argnames=("n", "k", "b", "tile"))
def loop_swar(p, d, n, k, b, tile=TILE):
    xlo = jnp.ones((b, k // 2), jnp.float32) * 0.01

    def body(i, xlo):
        y = swar_mm(xlo, xlo, p, d, n, k, tile)
        reps = (k // 2 + n - 1) // n
        return jnp.tile(y, (1, reps))[:, : k // 2] * 1e-3 + 1e-6 * i

    return jax.lax.fori_loop(0, LOOP, body, xlo)


@functools.partial(jax.jit, static_argnames=("n", "k", "v2", "b"))
def loop_v2(qs, d_p, n, k, v2, b):
    planes = {"qs": qs, "d_p": d_p}
    x0 = jnp.ones((b, k), jnp.float32) * 0.01

    def body(i, x):
        y = mq._call_kernel_planes(
            to_storage_order(x, 32), planes, GType.Q4_0, n, k, "bf16", v2)
        reps = (k + n - 1) // n
        return jnp.tile(y, (1, reps))[:, :k] * 1e-3 + 1e-6 * i

    return jax.lax.fori_loop(0, LOOP, body, x0)


def slope(fn, *args, n1=3, n2=9):
    np.asarray(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        return time.perf_counter() - t0

    run(2)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    log(f"device: {jax.devices()[0].device_kind}")
    order = probe_bitcast_order()
    log(f"bitcast order: {order}")
    if order == "unknown":
        log("ABORT: unexpected bitcast layout")
        return
    if not check_correct(order):
        log("ABORT: swar kernel mismatch")
        return

    shapes = ((4096, 4096), (12288, 4096), (22016, 4096), (32256, 4096))
    for (n, k) in shapes:
        rng = np.random.default_rng(1)
        P = jnp.asarray(rng.integers(0, 2**32, (k // 8, n), np.uint64)
                        .astype(np.uint32))
        D = jnp.asarray((rng.random((k // 32, n)).astype(np.float32)) * 0.01)
        wire = P.size * 4 + D.size * 4
        for tile in (128, 256, 512):
            if (k // 2) * tile * 4 * 3 > 12 * 1024 * 1024 or n % tile:
                continue
            dt = slope(loop_swar, P, D, n, k, 1, tile, n1=4, n2=12) / LOOP
            log(f"  swar {n}x{k} T{tile}: {dt*1e3:7.3f} ms  "
                f"{wire/dt/1e9:6.1f} GB/s")

        h = np.float16(0.01).view(np.uint16)
        word = np.uint32(h) | (np.uint32(h) << 16)
        qs = jnp.asarray(rng.integers(0, 2**32, (n, k // 8), np.uint64)
                         .astype(np.uint32))
        d_p = jnp.full((n, k // 64), word, jnp.uint32)
        wire2 = qs.size * 4 + d_p.size * 4
        dt2 = slope(loop_v2, qs, d_p, n, k, True, 1, n1=4, n2=12) / LOOP
        log(f"  v2   {n}x{k}: {dt2*1e3:7.3f} ms  {wire2/dt2/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
