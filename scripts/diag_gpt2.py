"""GPT-2 124M decode-step cost breakdown on the real TPU.

Sub-ms steps cannot be host-stepped through the relay (CLAUDE.md): every
measurement here is a jit-resident fori_loop chain ending in a value fetch,
timed with the two-length slope. Locates the gap between the 124M Q8_0
decode rate and its HBM roofline: weight-matmul floor (fused + unfused MLP)
vs attention/embedding/layernorm/argmax glue.

Run: python scripts/diag_gpt2.py   (one JAX process at a time!)
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

import bench
from ggmlsharp_tpu import GType, ops
from ggmlsharp_tpu.kernels.mlp_fused import flash_ff_q8
from ggmlsharp_tpu.models import gpt2, sampling


def log(msg):
    print(msg, flush=True)


def slope(fn, n1=16, n2=48):
    """fn(n) runs an n-step chain and fetches a value; returns s/step."""
    fn(n1)  # compile both lengths
    fn(n2)
    best = {n1: None, n2: None}
    for _ in range(3):
        for n in (n1, n2):
            t0 = time.perf_counter()
            fn(n)
            dt = time.perf_counter() - t0
            if best[n] is None or dt < best[n]:
                best[n] = dt
    return (best[n2] - best[n1]) / (n2 - n1)


def main():
    log(f"device: {jax.devices()[0].device_kind}")
    cfg = gpt2.GPT2_124M
    params = jax.block_until_ready(
        bench._synthetic_qparams(gpt2, cfg, GType.Q8_0))
    has_fused = "fused" in params["blocks"][0]["mlp"]
    log(f"params built (mlp fused planes: {has_fused})")

    wire = bench._wire_bytes(params) / 1e6
    log(f"wire: {wire:.0f} MB → roofline {819e9 / (wire * 1e6):.0f} steps/s")

    # --- full greedy decode step, jit-resident chain --------------------
    cache = gpt2.new_cache(cfg, 1)
    prompt = jnp.ones((1, 16), jnp.int32)
    prefill, _ = sampling.make_decode_fns(gpt2.forward, cfg)
    gstep = sampling.make_greedy_step(gpt2.forward, cfg)
    t_eff = sampling.length_bucket(16 + 128, cfg.n_ctx)
    logits, cache = prefill(params, prompt, cache,
                            t_eff=sampling.length_bucket(16, cfg.n_ctx))
    tok0 = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
    len0 = np.asarray(cache.length)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_step(params, tok, cache, n):
        def body(_, c):
            t, cc = c
            return gstep(params, t, cc, t_eff=t_eff)

        return jax.lax.fori_loop(0, n, body, (tok, cache))

    from ggmlsharp_tpu.models.kv_cache import KVCache

    def run_step(n):
        c = KVCache(cache.k, cache.v, cache.k_scale, cache.v_scale,
                    jnp.asarray(len0))
        tok, c2 = chain_step(params, tok0, c, n)
        np.asarray(tok)

    dt = slope(run_step)
    log(f"full step: {dt*1e6:7.1f} us  ({1.0/dt:6.0f} tok/s, "
        f"{wire*1e6/dt/1e9:5.0f} GB/s-equiv)")

    # --- weight-matmul-only chains --------------------------------------
    def mm_pass(params, x, fused: bool):
        for blk in params["blocks"]:
            y = ops.mul_mat(blk["attn"]["c_attn_w"], x, quantize_acts=False)
            x = ops.mul_mat(blk["attn"]["c_proj_w"], y[..., :768] * 1e-3,
                            quantize_acts=False) * 1e-3
            if fused:
                x = flash_ff_q8(blk["mlp"]["fused"], x,
                                quantize_acts=False) * 1e-3
            else:
                h = ops.mul_mat(blk["mlp"]["c_fc_w"], x, quantize_acts=False)
                x = ops.mul_mat(blk["mlp"]["c_proj_w"], h * 1e-3,
                                quantize_acts=False) * 1e-3
        return ops.mul_mat(params.get("lm_head", params["wte"]), x, quantize_acts=False)

    for fused in ([True] if has_fused else []) + [False]:
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain_mm(params, n, fused=fused):
            x0 = jnp.ones((1, 768), jnp.float32) * 0.01

            def body(i, x):
                y = mm_pass(params, x, fused)
                return y[:, :768] * 1e-4 + 1e-6 * i

            return jax.lax.fori_loop(0, n, body, x0)

        def run_mm(n):
            np.asarray(chain_mm(params, n))

        dt = slope(run_mm)
        label = "fused-mlp" if fused else "unfused  "
        log(f"matmul-only pass ({label}): {dt*1e6:7.1f} us  "
            f"({wire*1e6/dt/1e9:5.0f} GB/s-equiv)")

    # --- lm head alone ---------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_head(params, n):
        x0 = jnp.ones((1, 768), jnp.float32) * 0.01

        def body(i, x):
            y = ops.mul_mat(params.get("lm_head", params["wte"]), x, quantize_acts=False)
            return y[:, :768] * 1e-4 + 1e-6 * i

        return jax.lax.fori_loop(0, n, body, x0)

    dt = slope(lambda n: np.asarray(chain_head(params, n)))
    head_mb = 0.0
    from ggmlsharp_tpu.quant.formats import QTensor

    head_w = params.get("lm_head", params["wte"])
    if isinstance(head_w, QTensor):
        head_mb = sum(p.size * p.dtype.itemsize
                      for p in head_w.planes.values()) / 1e6
    log(f"lm-head matvec: {dt*1e6:7.1f} us  ({head_mb*1e6/dt/1e9:5.0f} GB/s)")


if __name__ == "__main__":
    main()
