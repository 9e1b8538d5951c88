"""Serving per-tick cost breakdown on the real TPU (VERDICT r3 #2).

Attributes the serving gap (BENCH_MODE=serve vs the slots·(HBM/wire)
batched-decode roofline) to its terms:

  1. the batched b=B decode step itself (weight-pass kernels + flash-decode
     cache reads) — slope-measured through the engine's own `_step`
     (single-token) executable, min-of-reps;
  2. the W-token decode window — one dispatch; fitting time(W) = F + W·s
     over two window lengths separates the fixed host/relay dispatch+fetch
     cost F from the per-step device cost s;
  3. batched admission prefill (one weight pass per same-bucket burst);
  4. the full engine loop at several window lengths W (aggregate tok/s,
     the BENCH_MODE=serve contract) — shows how much of the roofline gap
     is amortizable window overhead vs device step time.

Run: python scripts/diag_serve.py   (ONE jax process at a time!)
Env: DIAG_SLOTS (8), DIAG_NEW (24), DIAG_WS ("8,16,24"), DIAG_MODEL
(llama-7b), DIAG_FORMAT (q4_0).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, "/root/repo/")

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    import bench
    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.models import gpt2, llama
    from ggmlsharp_tpu.serving import Engine, Request

    slots = int(os.environ.get("DIAG_SLOTS", "8"))
    n_new = int(os.environ.get("DIAG_NEW", "24"))
    ws = [int(w) for w in os.environ.get("DIAG_WS", "8,16,24").split(",")]
    model = os.environ.get("DIAG_MODEL", "llama-7b")
    fmt = os.environ.get("DIAG_FORMAT", "q4_0")
    mod, cfg = {"llama-7b": (llama, llama.LLAMA_7B),
                "llama-tiny": (llama, llama.TINY_LLAMA),
                "gpt2-124m": (gpt2, gpt2.GPT2_124M)}[model]
    gt = {"q4_0": GType.Q4_0, "q8_0": GType.Q8_0, "q4_k": GType.Q4_K}[fmt]

    log(f"device: {jax.devices()[0].device_kind}  slots={slots} "
        f"model={model} {fmt}")
    t0 = time.perf_counter()
    if cfg.n_embd * cfg.n_layer > 16 * 4096:
        qkw = {"cfg": cfg} if mod is llama else {}
        params = bench._synthetic_qparams(mod, cfg, gt, qkw)
    else:
        p = mod.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        params = jax.jit(lambda p: mod.quantize_params(p, gt))(p)
    params = jax.block_until_ready(params)
    wire_gb = bench._wire_bytes(params) / 1e9
    log(f"params ready ({wire_gb:.2f} GB wire) at "
        f"t={time.perf_counter()-t0:.1f}s")

    rng = np.random.default_rng(7)
    plen = 16
    prompts = [rng.integers(0, cfg.n_vocab, size=plen).tolist()
               for _ in range(slots * 3)]

    eng = Engine(mod.forward, cfg, params, batch_slots=slots,
                 cache_dtype=jnp.bfloat16)
    flat = eng.cache.k[0].ndim == 3
    log(f"cache: {'flat+flash-decode' if flat else 'head-major+einsum'} "
        f"bf16, max_len={eng.max_len}")

    # occupy all slots so _step/_multi see the serving-shaped problem
    for i in range(slots):
        eng.submit(Request(id=i, prompt=prompts[i],
                           max_new_tokens=10 ** 6))
    while eng.pending or any(s is None for s in eng.slots):
        eng.step_once()
    log(f"slots primed at t={time.perf_counter()-t0:.1f}s")

    from ggmlsharp_tpu.models.sampling import length_bucket

    t_eff = length_bucket(plen + n_new + 8, eng.max_len)
    active = jnp.ones((slots,), bool)

    # --- 1. single batched decode step ------------------------------
    tok = jnp.ones((slots, 1), jnp.int32)
    state = {"c": eng.cache, "l": eng._last_logits}

    def window(fn, n):
        t = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(out)
        return time.perf_counter() - t

    reps = 3

    def step_at(te):
        def step_once():
            lg, state["c"] = eng._step(eng.params, state["c"], tok, active,
                                       t_eff=te)
            return lg

        np.asarray(step_once())  # warm
        window(step_once, 2)
        t1 = min(window(step_once, 4) for _ in range(reps))
        t2 = min(window(step_once, 12) for _ in range(reps))
        return (t2 - t1) / 8

    s_step = step_at(t_eff)
    log(f"[1] b={slots} single decode step: {s_step*1e3:.2f} ms "
        f"(weights {wire_gb:.2f} GB -> {wire_gb/s_step:.0f} GB/s eff; "
        f"bucket t_eff={t_eff})")
    # cache-read slope: step cost vs bucket size isolates the flash-decode
    # cache-read term (B·t·E_kv·2(bf16)·2(K,V)·L bytes per step)
    for te in (1024, 2048):
        if te <= eng.max_len:
            s2 = step_at(te)
            log(f"[1] b={slots} step at t_eff={te}: {s2*1e3:.2f} ms "
                f"(+{(s2-s_step)*1e3:.2f} ms vs {t_eff}-bucket)")

    # --- 2. W-window dispatch: time(W) = F + W*s ---------------------
    if eng._multi is None:
        eng._multi = eng._make_multi_step()
    Wmax = eng.multi_step

    def win(k):
        lg, state["c"], toks, lps = eng._multi(
            eng.params, state["c"], state["l"], active, jnp.int32(k),
            t_eff=t_eff)
        state["l"] = lg
        return toks

    np.asarray(win(1))  # warm (one executable for all k)

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
        log(f"[2] window W={k:3d}: {meas[k]*1e3:7.2f} ms  "
            f"({meas[k]/k*1e3:6.2f} ms/tok-row)")
    log(f"[2] fit: per-step device {s_dev*1e3:.2f} ms + fixed "
        f"dispatch/fetch {f_fixed*1e3:.2f} ms per window")

    # --- 3. admission burst prefill ----------------------------------
    # phases 1-2 donate the engine's cache into state — hand it back
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
    t_admit = time.perf_counter() - ta
    log(f"[3] batched admission prefill ({slots} slots, len={plen}): "
        f"{t_admit*1e3:.1f} ms")
    eng.run()  # drain

    # --- 3b. head-major einsum engine step (A/B vs flash-decode) ------
    import gc

    del eng, state
    gc.collect()
    os.environ["GGML_TPU_FLASH_DECODE"] = "0"
    ehm = Engine(mod.forward, cfg, params, batch_slots=slots,
                 cache_dtype=jnp.bfloat16, max_len=512)
    assert ehm.cache.k[0].ndim == 4
    for i in range(slots):
        ehm.submit(Request(id=i, prompt=prompts[i], max_new_tokens=10 ** 6))
    while ehm.pending or any(s is None for s in ehm.slots):
        ehm.step_once()
    st_hm = {"c": ehm.cache}

    def hm_step():
        lg, st_hm["c"] = ehm._step(ehm.params, st_hm["c"], tok, active,
                                   t_eff=t_eff)
        return lg

    np.asarray(hm_step())
    window(hm_step, 2)
    h1 = min(window(hm_step, 4) for _ in range(reps))
    h2 = min(window(hm_step, 12) for _ in range(reps))
    log(f"[3b] b={slots} step, HEAD-MAJOR einsum cache: "
        f"{(h2-h1)/8*1e3:.2f} ms (flash-decode flat was {s_step*1e3:.2f})")
    del ehm, st_hm
    gc.collect()
    os.environ.pop("GGML_TPU_FLASH_DECODE", None)

    # --- 4. full engine loop at several W ----------------------------
    # max_len=512 keeps two engine caches from exhausting HBM between
    # iterations (flat bf16 cache at max_len=2048 is 8.6 GB for 8 slots)
    log(f"[4] full engine A/B (reqs={slots*3} new={n_new}, max_len=512):")
    for W in ws:
        e2 = Engine(mod.forward, cfg, params, batch_slots=slots,
                    cache_dtype=jnp.bfloat16, multi_step=W, max_len=512)
        # warm: group sizes + growth buckets (bench._run_serve_mode's
        # recipe, compressed — jit caches shared within the process)
        sizes, g = [], 1
        while g < slots:
            sizes.append(g)
            g *= 2
        sizes.append(slots)
        wid = 0
        for g in sizes:
            for i in range(g):
                e2.submit(Request(id=-1 - wid, prompt=prompts[i],
                                  max_new_tokens=2))
                wid += 1
            e2.run()
        e2.submit(Request(id=-1 - wid, prompt=prompts[0],
                          max_new_tokens=n_new))
        e2.run()
        for i, p in enumerate(prompts):
            e2.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
        tb = time.perf_counter()
        res = e2.run()
        dt = time.perf_counter() - tb
        toks = sum(len(r.out_tokens) for r in res if r.id >= 0)
        st = e2.stats()
        log(f"    W={W:3d}: {toks/dt:7.1f} tok/s aggregate  "
            f"({toks} toks in {dt:.2f}s, ticks={st['ticks']}, "
            f"prefills={st['prefill_dispatches']})")
        del e2
        gc.collect()


if __name__ == "__main__":
    main()
