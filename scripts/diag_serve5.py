"""Round-5 b=8 decode-step A/B on the real TPU (VERDICT r4 #1).

The serving engine is device-step-bound (r5 diag_serve: the W=32 engine
loop time equals ticks x step time). This script isolates the step and
A/Bs the attention paths on the serving-shaped problem:

  a) head-major einsum cache (the r4 float-cache default);
  b) flat cache + flash-decode v2 (P.V reduction on the MXU, r5 rewrite);
  c) flat INT8 cache + flash-decode v2 (scales folded into scores/weights).

Each at the bench serve shape (slots=8, max_len=512) plus a max_len=2048
row for the allocation-proportional KV-write term, with a one-step
cross-check that flash outputs match the einsum path (bf16-noise bar).

Run: python scripts/diag_serve5.py   (ONE jax process at a time!)
Env: DIAG_SLOTS (8), DIAG_MODEL (llama-7b), DIAG_FORMAT (q4_0),
DIAG_MAXLENS ("512,2048").
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
    from ggmlsharp_tpu.models import llama
    from ggmlsharp_tpu.models.sampling import length_bucket
    from ggmlsharp_tpu.serving import Engine, Request

    slots = int(os.environ.get("DIAG_SLOTS", "8"))
    model = os.environ.get("DIAG_MODEL", "llama-7b")
    fmt = os.environ.get("DIAG_FORMAT", "q4_0")
    maxlens = [int(x) for x in
               os.environ.get("DIAG_MAXLENS", "512,2048").split(",")]
    mod, cfg = {"llama-7b": (llama, llama.LLAMA_7B),
                "llama-tiny": (llama, llama.TINY_LLAMA)}[model]
    gt = {"q4_0": GType.Q4_0, "q8_0": GType.Q8_0, "q4_k": GType.Q4_K}[fmt]

    log(f"device: {jax.devices()[0].device_kind}  slots={slots} "
        f"model={model} {fmt}")
    t0 = time.perf_counter()
    if cfg.n_embd * cfg.n_layer > 16 * 4096:
        params = bench._synthetic_qparams(mod, cfg, gt, {"cfg": cfg})
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
               for _ in range(slots)]
    tok = jnp.ones((slots, 1), jnp.int32)
    active = jnp.ones((slots,), bool)
    reps = 3

    def build(max_len, flash, int8):
        os.environ["GGML_TPU_FLASH_DECODE"] = "1" if flash else "0"
        eng = Engine(mod.forward, cfg, params, batch_slots=slots,
                     cache_dtype=jnp.bfloat16, int8_kv=int8,
                     max_len=max_len)
        got_flat = eng.cache.k[0].ndim == 3
        assert got_flat == flash, (got_flat, flash)
        for i in range(slots):
            eng.submit(Request(id=i, prompt=prompts[i],
                               max_new_tokens=10 ** 6))
        while eng.pending or any(s is None for s in eng.slots):
            eng.step_once()
        return eng

    def step_ms(eng, t_eff):
        state = {"c": eng.cache}

        def once():
            lg, state["c"] = eng._step(eng.params, state["c"], tok,
                                       active, t_eff=t_eff)
            return lg

        def window(n):
            t = time.perf_counter()
            out = None
            for _ in range(n):
                out = once()
            np.asarray(out)
            return time.perf_counter() - t

        np.asarray(once())
        window(2)
        t1 = min(window(4) for _ in range(reps))
        t2 = min(window(12) for _ in range(reps))
        eng.cache = state["c"]
        return (t2 - t1) / 8 * 1e3

    import gc

    results = {}
    logits_ref = {}
    for name, flash, int8 in [("einsum-hm", False, False),
                              ("flash-v2", True, False),
                              ("flash-v2-int8", True, True)]:
        for ml in maxlens:
            eng = build(ml, flash, int8)
            t_eff = length_bucket(plen + 16, ml, base=64)
            ms = step_ms(eng, t_eff)
            results[(name, ml)] = ms
            log(f"[{name}] max_len={ml} t_eff={t_eff}: {ms:.2f} ms/step "
                f"-> {slots/ms*1e3:.0f} tok/s step-bound cap")
            if ml == maxlens[0]:
                # one-step output for the cross-check (same cache state:
                # fresh engines, same prompts/prefill)
                lg, _ = eng._step(eng.params, eng.cache, tok, active,
                                  t_eff=t_eff)
                logits_ref[name] = np.asarray(lg)
            del eng
            gc.collect()

    a = logits_ref.get("einsum-hm")
    b = logits_ref.get("flash-v2")
    if a is not None and b is not None:
        # bf16-class deviation between two DEFAULT-precision paths; the
        # argmax agreement is the serving-relevant check
        dev = np.abs(a - b).max()
        agree = (a.argmax(-1) == b.argmax(-1)).mean()
        log(f"cross-check flash-v2 vs einsum: max|dlogit|={dev:.3e} "
            f"argmax agree={agree:.3f}")
    log("summary:")
    for (name, ml), ms in sorted(results.items()):
        log(f"  {name:14s} max_len={ml:5d}: {ms:6.2f} ms")


if __name__ == "__main__":
    main()
