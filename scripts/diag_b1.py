"""b=1 decode step-term probe (VERDICT r4 #5): where do the ~1.3 ms
above the 5.78 ms kernel floor go, and does the KV allocation size bite
at b=1 the way it does at b=8?

Measures the greedy decode step (the bench headline path) at several
KV allocations and cache layouts:
  head-major einsum bf16, max_len in {256, 2048}   (the shipped default)
  flat + flash-decode v2 int8, max_len in {256, 2048}
plus argmax-less and lm-head-less variants to price the tail ops.

Run: python scripts/diag_b1.py   (ONE jax process at a time!)
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
    from ggmlsharp_tpu.models import llama, sampling

    cfg = llama.LLAMA_7B
    t0 = time.perf_counter()
    params = jax.block_until_ready(
        bench._synthetic_qparams(llama, cfg, GType.Q4_0, {"cfg": cfg}))
    log(f"device: {jax.devices()[0].device_kind}; params at "
        f"t={time.perf_counter()-t0:.1f}s")
    prompt = jnp.ones((1, 16), jnp.int32)
    reps = 3

    def measure(label, cache, gstep, t_eff):
        prefill, _ = sampling.make_decode_fns(llama.forward, cfg)
        logits, cache = prefill(
            params, prompt, cache,
            t_eff=length_bucket(16, cache.max_len))
        tok = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
        st = [tok, cache]

        def once():
            st[0], st[1] = gstep(params, st[0], st[1], t_eff=t_eff)
            return st[0]

        def window(n):
            t = time.perf_counter()
            out = None
            for _ in range(n):
                out = once()
            np.asarray(out)
            return time.perf_counter() - t

        np.asarray(once())
        window(4)
        t1 = min(window(8) for _ in range(reps))
        t2 = min(window(24) for _ in range(reps))
        ms = (t2 - t1) / 16 * 1e3
        log(f"[{label}] {ms:.2f} ms/step ({1e3/ms:.1f} tok/s)")
        return ms

    from ggmlsharp_tpu.models.sampling import length_bucket

    gstep = sampling.make_greedy_step(llama.forward, cfg)
    for ml in (256, 2048):
        t_eff = length_bucket(16 + 32, ml, base=64)
        cache = llama.new_cache(cfg, 1, max_len=ml)
        measure(f"head-major bf16 max_len={ml} t_eff={t_eff}",
                cache, gstep, t_eff)

    for ml in (256, 2048):
        t_eff = length_bucket(16 + 32, ml, base=64)
        cache = llama.new_cache(cfg, 1, max_len=ml, int8=True, flat=True)
        measure(f"flat int8 flash-v2 max_len={ml} t_eff={t_eff}",
                cache, gstep, t_eff)


if __name__ == "__main__":
    main()
