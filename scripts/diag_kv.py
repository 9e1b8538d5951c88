"""Isolate the max_len-proportional cost in the b=8 decode step.

scripts/diag_serve.py r4 measured the head-major b=8 step at 12.11 ms with
max_len=512 but 15.57 ms with max_len=2048 AT THE SAME t_eff bucket — a
+3.5 ms/step cost proportional to the ALLOCATED cache, not the live prefix.
This diag times the two candidate terms in isolation, 64x-looped in one jit
(relay jitter cancels), for T in {512, 2048}:

  1. kv-write chain: 32 layers of kv_cache.update_layer (the vmap'd
     per-batch dynamic_update_slice) on donated [B, H, T, D] buffers —
     if vmap(DUS) lowers to a scatter/copy the cost scales with T;
  2. attention-read chain: 32 layers of bucket-sliced einsum attention
     (read k[:, :, :t_eff] from the T-allocated buffer) — should scale
     with t_eff only.

Run: python scripts/diag_kv.py   (ONE jax process at a time)
Env: DIAG_B (8), DIAG_TEFF (256), DIAG_LOOP (64).
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
    from ggmlsharp_tpu.models import kv_cache as kvc
    from ggmlsharp_tpu.models.common import _einsum_attention

    B = int(os.environ.get("DIAG_B", "8"))
    t_eff = int(os.environ.get("DIAG_TEFF", "256"))
    LOOP = int(os.environ.get("DIAG_LOOP", "64"))
    H, D, L = 32, 128, 32
    log(f"device: {jax.devices()[0].device_kind}  B={B} H={H} D={D} "
        f"L={L} t_eff={t_eff} loop={LOOP}")

    def slope(fn, args):
        """Two-length slope with a value fetch (CLAUDE.md: block_until_ready
        resolves before remote execution finishes). Carries the output
        across windows (donated buffers cannot be reused)."""
        state = {"a": args}

        def window(n):
            out = state["a"]
            t = time.perf_counter()
            for _ in range(n):
                out = fn(*out)
            np.asarray(jax.tree.leaves(out)[0][0, 0])
            state["a"] = out
            return time.perf_counter() - t

        window(1)  # warm/compile
        window(2)
        t1 = min(window(2) for _ in range(3))
        t2 = min(window(6) for _ in range(3))
        return (t2 - t1) / 4, state["a"]

    for T in (512, 2048):
        cache = kvc.init_cache(L, B, H, T, D, dtype=jnp.bfloat16)
        rows = [jax.jit(lambda s=s: jax.random.normal(
            jax.random.PRNGKey(s), (B, H, 1, D), jnp.bfloat16))()
            for s in range(2)]

        # 1. kv-write chain: LOOP steps x 32 update_layer calls, ONE jit
        # (jit-resident fori_loop: per-call relay dispatch jitter would
        # drown a ~1-3 ms signal)
        def write_chain(cache, kr, vr):
            def body(_, c):
                pos = c.length[:, None]
                for i in range(L):
                    c = kvc.update_layer(c, i, kr, vr, pos)
                return kvc.KVCache(c.k, c.v, c.k_scale, c.v_scale,
                                   (c.length + 1) % (T - 2))

            return jax.lax.fori_loop(0, LOOP, body, cache), kr, vr

        wc = jax.jit(write_chain, donate_argnums=(0,))
        s, fin = slope(wc, (cache, rows[0], rows[1]))
        s /= LOOP
        cache = fin[0]  # case-1 donated the original cache buffers
        # bytes actually written per step: L * 2 * (B*H*1*D*2)
        wr_mb = L * 2 * B * H * D * 2 / 1e6
        log(f"T={T:5d} kv-write chain ({L} layers): {s*1e3:7.3f} ms "
            f"({wr_mb:.1f} MB payload)")

        # 1b. scatter-based write (buf.at[arange(B), :, pos].set): does
        # XLA's in-place scatter beat the vmap'd per-batch DUS?
        def write_scatter(cache, kr, vr):
            bidx = jnp.arange(B)

            def wr(buf, rows_b, pos):
                return buf.at[bidx, :, pos].set(
                    rows_b[:, :, 0].astype(buf.dtype))

            def body(_, c):
                pos = c.length
                k = tuple(wr(c.k[i], kr, pos) for i in range(L))
                v = tuple(wr(c.v[i], vr, pos) for i in range(L))
                return kvc.KVCache(k, v, None, None,
                                   (c.length + 1) % (T - 2))

            return jax.lax.fori_loop(0, LOOP, body, cache), kr, vr

        if T <= 512:  # at T=2048 the scatter lowering COPIES all 64
            # cache buffers -> 16G HBM OOM (the finding itself)
            ws = jax.jit(write_scatter, donate_argnums=(0,))
            s1b, fin = slope(ws, (cache, rows[0], rows[1]))
            cache = fin[0]
            log(f"T={T:5d} kv-write scatter chain:     "
                f"{s1b/LOOP*1e3:7.3f} ms")

        # 1c. uniform-position DUS (all slots write the same row — the
        # floor: one non-batched dynamic_update_slice per buffer)
        def write_uniform(cache, kr, vr):
            def body(_, c):
                pos = c.length[0]
                k = tuple(jax.lax.dynamic_update_slice(
                    c.k[i], kr.astype(c.k[i].dtype), (0, 0, pos, 0))
                    for i in range(L))
                v = tuple(jax.lax.dynamic_update_slice(
                    c.v[i], vr.astype(c.v[i].dtype), (0, 0, pos, 0))
                    for i in range(L))
                return kvc.KVCache(k, v, None, None,
                                   (c.length + 1) % (T - 2))

            return jax.lax.fori_loop(0, LOOP, body, cache), kr, vr

        wu = jax.jit(write_uniform, donate_argnums=(0,))
        s1c, fin = slope(wu, (cache, rows[0], rows[1]))
        cache = fin[0]
        log(f"T={T:5d} kv-write uniform-DUS chain: {s1c/LOOP*1e3:7.3f} ms")

        # 2. attention-read chain at fixed bucket
        q = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(9), (B, H, 1, D), jnp.bfloat16))()
        pos = jax.jit(lambda: jnp.full((B, 1), t_eff - 1, jnp.int32))()

        @jax.jit
        def read_chain(cache, q):
            def body(_, out):
                for i in range(L):
                    k_sl = jax.lax.slice_in_dim(cache.k[i], 0, t_eff, axis=2)
                    v_sl = jax.lax.slice_in_dim(cache.v[i], 0, t_eff, axis=2)
                    out = _einsum_attention(out.astype(jnp.bfloat16), k_sl,
                                            v_sl, pos, 1, 0.0)
                return out.astype(jnp.bfloat16)  # stable fori carry dtype

            return jax.lax.fori_loop(0, LOOP, body, q)

        s2, _ = slope(lambda c, q0: (c, read_chain(c, q0)), (cache, q))
        s2 /= LOOP
        rd_gb = L * 2 * B * H * t_eff * D * 2 / 1e9
        log(f"T={T:5d} attn-read chain ({L} layers, bucket {t_eff}): "
            f"{s2*1e3:7.3f} ms ({rd_gb:.2f} GB bucket reads -> "
            f"{rd_gb/max(s2,1e-9):.0f} GB/s)")
        del cache
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
