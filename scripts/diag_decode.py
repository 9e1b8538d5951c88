"""Decode-step cost breakdown on the real TPU (slope-measured).

Measures, at 7B shapes: each fused dequant-matmul (looped 64x INSIDE one
jit so per-execution time dominates relay jitter), a chained all-layers
matmul-only pass (pure kernel floor incl. per-call overhead), and the full
decode step — to locate where the ~14 ms step actually goes.
Run: python scripts/diag_decode.py  (one JAX process at a time!)
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

import ggmlsharp_tpu.kernels.matmul_q as mq
from ggmlsharp_tpu import GType
from ggmlsharp_tpu.quant.formats import QTensor, to_storage_order


def log(msg):
    print(msg, flush=True)


def make_qw(n, k, seed):
    """Synthetic Q4_0 QTensor without f32 staging (constant small scales)."""
    h = np.float16(0.01).view(np.uint16)
    word = np.uint32(h) | (np.uint32(h) << 16)

    @jax.jit
    def build():
        qs = jax.random.bits(jax.random.PRNGKey(seed), (n, k // 8), jnp.uint32)
        d_p = jnp.full((n, k // 64), word, jnp.uint32)
        return qs, d_p

    qs, d_p = build()
    return QTensor(GType.Q4_0, (n, k), {"qs": qs, "d_p": d_p})


def slope(fn, *args, n1=3, n2=9):
    """fn(*args) returns an array; windows end with value fetches; warmup
    fetched too (unfetched warmup leaks compile time into windows)."""
    np.asarray(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        return time.perf_counter() - t0

    run(2)  # absorb post-compile residual stalls
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


LOOP = 64

SHAPES = [  # (label, n, k, count per 7B step)
    ("wqkv 12288x4096", 12288, 4096, 32),
    ("wo    4096x4096", 4096, 4096, 32),
    ("wgu  22016x4096", 22016, 4096, 32),
    ("wdown 4096x11008", 4096, 11008, 32),
    ("head 32256x4096", 32256, 4096, 1),
]


@functools.partial(jax.jit, static_argnames=("n", "k", "v2", "b"))
def loop_kernel(qs, d_p, n, k, v2, b):
    """LOOP dependent kernel invocations inside one executable."""
    planes = {"qs": qs, "d_p": d_p}
    x0 = jnp.ones((b, k), jnp.float32) * 0.01

    def body(i, x):
        y = mq._call_kernel_planes(
            to_storage_order(x, 32), planes, GType.Q4_0, n, k, "bf16", v2)
        reps = (k + n - 1) // n
        return jnp.tile(y, (1, reps))[:, :k] * 1e-3 + 1e-6 * i

    return jax.lax.fori_loop(0, LOOP, body, x0)


@functools.partial(jax.jit, static_argnames=("n", "k", "b"))
def loop_kernel_swar(qs_t, d_t, n, k, b):
    """LOOP dependent swar-kernel invocations inside one executable."""
    from ggmlsharp_tpu.quant.formats import swar_layout

    tile, nc, kp = swar_layout(n, k)
    planes = {"qs_t": qs_t, "d_t": d_t}
    x0 = jnp.ones((b, kp // 2), jnp.float32) * 0.01
    # (nc, b, cc) chunk-major ride (matmul_q.mul_mat_swar's layout)
    xs0 = jnp.ones((b, kp // 32), jnp.float32) * 0.32

    def body(i, xlo):
        y = mq._call_kernel_swar(xlo, xlo, xs0, planes, GType.Q4_0, n, kp,
                                 tile, nc, b)
        reps = (kp // 2 + n - 1) // n
        return jnp.tile(y, (1, reps))[:, : kp // 2] * 1e-3 + 1e-6 * i

    return jax.lax.fori_loop(0, LOOP, body, x0)


def main():
    b = int(os.environ.get("DIAG_BATCH", "1"))
    bsw = max(8, b)  # swar kernel pads decode rows to a sublane
    log(f"device: {jax.devices()[0].device_kind}, batch={b}, loop={LOOP}")

    h = np.float16(0.01).view(np.uint16)
    word = np.uint32(h) | (np.uint32(h) << 16)
    total = {True: 0.0, False: 0.0, "swar": 0.0}
    for label, n, k, cnt in SHAPES:
        qw = make_qw(n, k, n + k)
        wire_mb = (qw["qs"].size * 4 + qw["d_p"].size * 4) / 1e6
        for v2 in (False, True):
            dt = slope(loop_kernel, qw["qs"], qw["d_p"], n, k, v2, b) / LOOP
            eff = wire_mb * 1e6 / dt / 1e9
            total[v2] += dt * cnt
            log(f"  {label} v2={int(v2)}: {dt*1e3:7.3f} ms  {eff:6.1f} GB/s"
                f"  ({wire_mb:.1f} MB wire)")
        from ggmlsharp_tpu.quant.formats import swar_layout

        _, _, kp = swar_layout(n, k)
        qs_t = jax.jit(
            lambda s=n + k: jax.random.bits(
                jax.random.PRNGKey(s), (kp // 8, n), jnp.uint32)
        )()
        d_t = jax.jit(lambda: jnp.full((kp // 64, n), word, jnp.uint32))()
        dt = slope(loop_kernel_swar, qs_t, d_t, n, k, bsw) / LOOP
        eff = (qs_t.size + d_t.size) * 4 / dt / 1e9
        total["swar"] += dt * cnt
        log(f"  {label} swar: {dt*1e3:7.3f} ms  {eff:6.1f} GB/s")
    log(f"matmul-kernel floor per step: v1={total[False]*1e3:.2f} ms  "
        f"v2={total[True]*1e3:.2f} ms  swar={total['swar']*1e3:.2f} ms")

    # --- chained all-layers matmul-only pass (params as args) ----------
    layers = tuple(
        (make_qw(12288, 4096, i), make_qw(4096, 4096, 100 + i),
         make_qw(22016, 4096, 200 + i), make_qw(4096, 11008, 300 + i))
        for i in range(32)
    )
    head = make_qw(32256, 4096, 999)

    @jax.jit
    def mm_only(layers, head, x):
        for wqkv, wo, wgu, wdn in layers:
            y = mq.mul_mat_q_fused(wqkv, x, quantize_acts=False)
            x = mq.mul_mat_q_fused(wo, y[..., :4096] * 1e-3,
                                   quantize_acts=False) * 1e-3
            g = mq.mul_mat_q_fused(wgu, x, quantize_acts=False)
            x = mq.mul_mat_q_fused(wdn, g[..., :11008] * 1e-3,
                                   quantize_acts=False) * 1e-3
        return mq.mul_mat_q_fused(head, x,
                                  quantize_acts=False)[:, :4096] * 1e-4

    x = jnp.ones((b, 4096), jnp.float32) * 0.01

    def call_all(layers, head, x):
        return mm_only(layers, head, x)

    dt = slope(call_all, layers, head, x, n1=4, n2=12)
    log(f"chained 32-layer matmul-only pass: {dt*1e3:.2f} ms "
        f"(129 pallas calls + glue)")

    # --- full decode step ---------------------------------------------
    from ggmlsharp_tpu.models import llama, sampling
    import bench

    cfg = llama.LLAMA_7B
    params = jax.block_until_ready(
        bench._synthetic_qparams(llama, cfg, GType.Q4_0))
    cache = llama.new_cache(cfg, b)
    prompt = jnp.ones((b, 16), jnp.int32)
    prefill, _ = sampling.make_decode_fns(llama.forward, cfg)
    gstep = sampling.make_greedy_step(llama.forward, cfg)
    logits, cache = prefill(params, prompt, cache)
    tok = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)

    state = [tok, cache]

    def step_once():
        state[0], state[1] = gstep(params, state[0], state[1])
        return state[0]

    dt = slope(step_once, n1=8, n2=32)
    log(f"full decode step: {dt*1e3:.2f} ms  ({1.0/dt:.1f} tok/s)")


if __name__ == "__main__":
    main()
