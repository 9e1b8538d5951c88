"""A/B inner-loop variants of the planewise Q4_0 dequant-matmul on the real
chip: where exactly the VPU ops/element floor is.

  a: (q>>s & 0xF) int32 -> bf16 cast, *d4(bf16), bf16 MXU dot   [current v2]
  b: ((q>>s & 0xF) | 0x4B000000) bitcast f32, fma(v, d4, -2^23*d4),
     f32 operands into DEFAULT-precision dot (hardware converts)
  c: (q>>s & 0xF) int32 -> f32 cast, *d4, f32 DEFAULT dot
  dma: pure-copy kernel on the same qs plane = bandwidth ceiling

b's numerics REQUIRE a fused multiply-add (single rounding); the printed
max-err vs the exact computation detects whether Mosaic fused it.
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

from ggmlsharp_tpu.kernels.matmul_q import _decode_f16x2, _tile

N, K = 4096, 4096
TILE = int(os.environ.get("GGML_TPU_TILE_N", "256"))
W = K // 8
LOOP = 64


def kernel_body(variant, x_ref, qs_ref, dp_ref, o_ref):
    d4 = _tile(_decode_f16x2(dp_ref), 4)  # f32 (TN, W)
    q_all = qs_ref[:]
    x = x_ref[:]
    if variant == "a":
        d4b = d4.astype(jnp.bfloat16)
        xb = x.astype(jnp.bfloat16)
        acc = jnp.zeros((x.shape[0], TILE), jnp.float32)
        for j in range(8):
            vj = ((q_all >> jnp.uint32(4 * j)) & jnp.uint32(0xF)
                  ).astype(jnp.int32).astype(jnp.bfloat16)
            wj = vj * d4b
            acc += jax.lax.dot_general(
                xb[:, j * W : (j + 1) * W], wj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc
    elif variant == "b":
        c4 = d4 * jnp.float32(-8388608.0)
        acc = jnp.zeros((x.shape[0], TILE), jnp.float32)
        for j in range(8):
            bits = ((q_all >> jnp.uint32(4 * j)) & jnp.uint32(0xF)
                    ) | jnp.uint32(0x4B000000)
            vf = pltpu.bitcast(bits, jnp.float32)
            wj = vf * d4 + c4  # needs FMA for exactness
            acc += jax.lax.dot_general(
                x[:, j * W : (j + 1) * W], wj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        o_ref[:] = acc
    else:  # "c"
        acc = jnp.zeros((x.shape[0], TILE), jnp.float32)
        for j in range(8):
            vj = ((q_all >> jnp.uint32(4 * j)) & jnp.uint32(0xF)
                  ).astype(jnp.int32).astype(jnp.float32)
            wj = vj * d4
            acc += jax.lax.dot_general(
                x[:, j * W : (j + 1) * W], wj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("variant",))
def mm(x, qs, d_p, variant):
    body = functools.partial(kernel_body, variant)
    b = x.shape[0]
    return pl.pallas_call(
        body,
        grid=(N // TILE,),
        in_specs=[
            pl.BlockSpec((b, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, K // 64), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, qs, d_p)


def copy_kernel(qs_ref, o_ref):
    o_ref[:] = qs_ref[:]


@jax.jit
def dma_copy(qs):
    return pl.pallas_call(
        copy_kernel,
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(qs)


@functools.partial(jax.jit, static_argnames=("variant",))
def loop_mm(x, qs, d_p, variant):
    def body(i, x):
        y = mm(x, qs, d_p, variant)
        return y * 1e-3 + 1e-6 * i

    return jax.lax.fori_loop(0, LOOP, body, x)


def main():
    print(f"device {jax.devices()[0].device_kind} TILE={TILE}", flush=True)
    h = np.float16(0.01).view(np.uint16)
    word = np.uint32(h) | (np.uint32(h) << 16)

    @jax.jit
    def build():
        qs = jax.random.bits(jax.random.PRNGKey(0), (N, W), jnp.uint32)
        d_p = jnp.full((N, K // 64), word, jnp.uint32)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.float32)
        return qs, d_p, x

    qs, d_p, x = build()

    # correctness: b vs c (same f32 math when fma fuses)
    ya = np.asarray(mm(x, qs, d_p, "a"))
    yb = np.asarray(mm(x, qs, d_p, "b"))
    yc = np.asarray(mm(x, qs, d_p, "c"))
    print(f"maxabs(b-c)={np.abs(yb-yc).max():.3e} (0 => fma fused)  "
          f"maxabs(a-c)={np.abs(ya-yc).max():.3e}", flush=True)

    def slope(fn, n1=4, n2=12):
        np.asarray(fn(x))

        def run(n):
            t0 = time.perf_counter()
            out = x
            for _ in range(n):
                out = fn(out)
            np.asarray(out)
            return time.perf_counter() - t0

        run(2)
        return (run(n2) - run(n1)) / (n2 - n1)

    wire = qs.size * 4 + d_p.size * 4
    for name in ("a", "b", "c"):
        per = slope(lambda v, name=name: loop_mm(v, qs, d_p, name)) / LOOP
        print(f"variant {name}: {per*1e3:7.3f} ms  {wire/per/1e9:6.1f} GB/s",
              flush=True)

    np.asarray(dma_copy(qs))

    def dma_run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = dma_copy(qs)
        np.asarray(out)
        return time.perf_counter() - t0

    dma_run(8)
    per = (dma_run(48) - dma_run(16)) / 32
    print(f"dma copy (rd+wr): {per*1e3:7.3f} ms  "
          f"{2*qs.size*4/per/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
