"""Window-path cost attribution for the r5 INT8 serving default.

diag_serve5 measured the INT8 flat b=8 single step at 6.2 ms (1290 tok/s
cap) but BENCH_MODE=serve lands at ~634 — this script attributes the gap
on the engine's ACTUAL dispatch path: the W-token while_loop window
(eng._multi), whose per-step device cost can differ from the plain step
(strict carry aliasing, per-step cache slicing inside the loop), plus
admission prefill and the fetch overhead the pipelining must hide.

Phases: [1] plain step slope; [2] window fit time(W) = F + W*s over
W in {1, W/2, W}; [3] batched admission prefill; [4] full engine loop.

Run: python scripts/diag_win.py   (ONE jax process at a time!)
Env: DIAG_SLOTS (8), DIAG_INT8 (1), DIAG_MAXLEN (256), DIAG_MODEL.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, "/root/repo/")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, flush=True)


def main():
    import bench
    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.models import llama
    from ggmlsharp_tpu.models.sampling import length_bucket
    from ggmlsharp_tpu.serving import Engine, Request

    slots = int(os.environ.get("DIAG_SLOTS", "8"))
    int8 = os.environ.get("DIAG_INT8", "1") == "1"
    ml = int(os.environ.get("DIAG_MAXLEN", "256"))
    model = os.environ.get("DIAG_MODEL", "llama-7b")
    mod, cfg = {"llama-7b": (llama, llama.LLAMA_7B),
                "llama-tiny": (llama, llama.TINY_LLAMA)}[model]

    t0 = time.perf_counter()
    params = jax.block_until_ready(
        bench._synthetic_qparams(mod, cfg, GType.Q4_0, {"cfg": cfg}))
    log(f"device: {jax.devices()[0].device_kind} slots={slots} "
        f"int8={int8} max_len={ml}; params at t={time.perf_counter()-t0:.0f}s")

    rng = np.random.default_rng(7)
    plen = 16
    prompts = [rng.integers(0, cfg.n_vocab, size=plen).tolist()
               for _ in range(slots)]
    eng = Engine(mod.forward, cfg, params, batch_slots=slots,
                 cache_dtype=jnp.bfloat16, int8_kv=int8, max_len=ml)
    log(f"cache: {'flat' if eng.cache.k[0].ndim == 3 else 'head-major'}")
    for i in range(slots):
        eng.submit(Request(id=i, prompt=prompts[i], max_new_tokens=10 ** 6))
    while eng.pending or any(s is None for s in eng.slots):
        eng.step_once()

    t_eff = length_bucket(plen + 40, ml, base=64)
    active = jnp.ones((slots,), bool)
    tok = jnp.ones((slots, 1), jnp.int32)
    reps = 3
    state = {"c": eng.cache, "l": eng._last_logits}

    def window(fn, n):
        t = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(out)
        return time.perf_counter() - t

    def step_once():
        lg, state["c"] = eng._step(eng.params, state["c"], tok, active,
                                   t_eff=t_eff)
        return lg

    np.asarray(step_once())
    window(step_once, 2)
    t1 = min(window(step_once, 4) for _ in range(reps))
    t2 = min(window(step_once, 12) for _ in range(reps))
    s_plain = (t2 - t1) / 8
    log(f"[1] plain step: {s_plain*1e3:.2f} ms ({slots/s_plain:.0f} tok/s cap)")

    if eng._multi is None:
        eng._multi = eng._make_multi_step()
    Wmax = eng.multi_step

    def win(k):
        lg, state["c"], toks, lps = eng._multi(
            eng.params, state["c"], state["l"], active, jnp.int32(k),
            t_eff=t_eff, want_lps=False)
        state["l"] = lg
        return toks

    np.asarray(win(1))

    def timed_win(k):
        t = time.perf_counter()
        np.asarray(win(k))
        return time.perf_counter() - t

    meas = {}
    for k in sorted({1, Wmax // 2, Wmax}):
        meas[k] = min(timed_win(k) for _ in range(5))
    ks = sorted(meas)
    s_dev = (meas[ks[-1]] - meas[ks[0]]) / (ks[-1] - ks[0])
    f_fixed = meas[ks[0]] - ks[0] * s_dev
    for k in ks:
        log(f"[2] window W={k:3d}: {meas[k]*1e3:7.2f} ms "
            f"({meas[k]/k/slots*1e6:6.0f} us/tok)")
    log(f"[2] fit: per-step-in-window {s_dev*1e3:.2f} ms "
        f"(plain was {s_plain*1e3:.2f}) + fixed {f_fixed*1e3:.2f} ms")

    eng.cache, eng._last_logits = state["c"], state["l"]
    for i, r in enumerate(list(eng.slots)):
        if r is not None:
            r.done = True
            eng._finish_slot(r, i)
    for i in range(slots):
        eng.submit(Request(id=100 + i, prompt=prompts[i],
                           max_new_tokens=2))
    ta = time.perf_counter()
    eng._admit()
    jax.block_until_ready(eng.cache.k[0])
    log(f"[3] batched admission prefill ({slots} x len={plen}): "
        f"{(time.perf_counter()-ta)*1e3:.1f} ms")
    eng.run()

    # [4] full engine loop (bench recipe, W default, pipeline default)
    n_new = 24
    for i, p in enumerate(prompts * 3):
        eng.submit(Request(id=200 + i, prompt=p, max_new_tokens=n_new))
    t4 = time.perf_counter()
    res = eng.run()
    dt = time.perf_counter() - t4
    toks = sum(len(r.out_tokens) for r in res)
    log(f"[4] engine loop: {toks} toks in {dt:.2f}s = {toks/dt:.0f} tok/s "
        f"(ticks={eng._n_ticks}, prefills={eng._n_prefills}, "
        f"preadmits={eng._n_preadmits})")


if __name__ == "__main__":
    main()
