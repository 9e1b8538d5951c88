"""Decode-step cost breakdown on the real TPU (slope-measured).

Measures, at 7B shapes: each fused dequant-matmul individually, a chained
all-layers matmul-only pass (pure kernel floor incl. per-call overhead),
and the full decode step — to locate where the ~14 ms step actually goes.
Run: python scripts/diag_decode.py  (one JAX process at a time!)
"""
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
from ggmlsharp_tpu.quant.formats import QTensor


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


def slope(fn, n1=4, n2=12):
    """Chained dependent invocations; every window (and the warmup!) ends
    with a VALUE fetch — on axon, dispatch returns before compile/exec
    finishes, so an unfetched warmup leaks compile time into the windows."""
    np.asarray(fn())  # compile/warm, fetched

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(out)
        return time.perf_counter() - t0

    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


SHAPES = [  # (label, n, k, count per 7B step)
    ("wqkv 12288x4096", 12288, 4096, 32),
    ("wo    4096x4096", 4096, 4096, 32),
    ("wgu  22016x4096", 22016, 4096, 32),
    ("wdown 4096x11008", 4096, 11008, 32),
    ("head 32256x4096", 32256, 4096, 1),
]


def main():
    b = int(os.environ.get("DIAG_BATCH", "1"))
    log(f"device: {jax.devices()[0].device_kind}, batch={b}")

    # --- individual matvecs, v1 vs v2 (dependent chain: y feeds x) ----
    total = {True: 0.0, False: 0.0}
    for label, n, k, cnt in SHAPES:
        qw = make_qw(n, k, n + k)
        x0 = jnp.ones((b, k), jnp.float32) * 0.01

        for v2 in (False, True):
            @jax.jit
            def step(x, qw=qw, v2=v2, k=k, n=n):
                y = mq._call_kernel_planes(
                    mq.to_storage_order(x, 32), dict(qw.planes),
                    GType.Q4_0, n, k, "bf16", v2)
                reps = (k + n - 1) // n
                return jnp.tile(y, (1, reps))[:, :k] * 1e-3

            state = [x0]

            def call(step=step, state=state):
                state[0] = step(state[0])
                return state[0]

            dt = slope(call)
            eff = (qw["qs"].size * 4 + qw["d_p"].size * 4) / dt / 1e9
            total[v2] += dt * cnt
            log(f"  {label} v2={int(v2)}: {dt*1e3:7.3f} ms  {eff:6.1f} GB/s eff")
    log(f"matmul-kernel floor per step: v1={total[False]*1e3:.2f} ms  "
        f"v2={total[True]*1e3:.2f} ms")

    # --- chained all-layers matmul-only pass --------------------------
    layers = []
    for i in range(32):
        layers.append((make_qw(12288, 4096, i), make_qw(4096, 4096, 100 + i),
                       make_qw(22016, 4096, 200 + i),
                       make_qw(4096, 11008, 300 + i)))
    head = make_qw(32256, 4096, 999)

    @jax.jit
    def mm_only(x):
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
    st = [x]

    def call_all():
        st[0] = mm_only(st[0])
        return st[0]

    dt = slope(call_all, 2, 6)
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

    dt = slope(step_once, 4, 16)
    log(f"full decode step: {dt*1e3:.2f} ms  ({1.0/dt:.1f} tok/s)")


if __name__ == "__main__":
    main()
