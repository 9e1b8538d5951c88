"""Benchmark entry point (driver contract: print ONE JSON line).

Measures single-chip quantized decode throughput on the real TPU.
Default workload: BASELINE config 1 — GPT-2 124M, Q8_0 weight-only, batch 1
greedy decode. Weights are random (decode speed is weight-value independent);
correctness/perplexity parity is covered by tests and eval/.

`vs_baseline`: the reference (kant2002/GGMLSharp) publishes no numbers
(BASELINE.md), so this reports the fraction of the chip's HBM-bandwidth
roofline achieved — tokens/s · bytes-touched-per-token / HBM_BW. 1.0 =
speed-of-light decode for the stored bit-width.

Env overrides: BENCH_MODEL=gpt2-124m|gpt2-355m|gpt2-774m|llama-tiny|llama-7b,
BENCH_FORMAT=q8_0|q4_0|q4_k|q6_k|bf16, BENCH_STEPS, BENCH_BATCH,
BENCH_PREFILL, BENCH_INT8_KV=1.
"""
import json
import os
import sys
import time

# remote TPU compiles take minutes; persist them across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# v5e: ~819 GB/s HBM. (v5p ~2765, v4 ~1228.)
HBM_GBPS = {"v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9, "v4": 1228e9}


def _hbm_bw():
    try:
        kind = jax.devices()[0].device_kind.lower()
        for k, v in HBM_GBPS.items():
            if k in kind:
                return v
    except Exception:
        pass
    return 819e9


def _wire_bytes(tree):
    from ggmlsharp_tpu.quant.formats import QTensor

    total = 0
    for leaf in jax.tree.leaves(
        tree, is_leaf=lambda x: isinstance(x, QTensor)
    ):
        if isinstance(leaf, QTensor):
            total += sum(p.size * p.dtype.itemsize for p in leaf.planes.values())
        elif leaf is not None:
            total += leaf.size * leaf.dtype.itemsize
    return total


def _synthetic_qparams(mod, cfg, gtype):
    """Build a quantized param tree with random integer payloads and small
    constant scales, WITHOUT materializing f32 weights (a 7B f32 staging copy
    would not fit HBM alongside the quantized model). Decode throughput is
    weight-value independent, so this benchmarks the same computation."""
    import numpy as np
    from ggmlsharp_tpu.quant.formats import QTensor

    spec = jax.eval_shape(
        lambda: mod.quantize_params(
            mod.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
            gtype,
        )
    )
    key = [jax.random.PRNGKey(1)]

    def mk(leaf):
        if isinstance(leaf, QTensor):
            planes = {}
            for name, p in leaf.planes.items():
                if p.dtype in (jnp.uint32, jnp.int8, jnp.uint8):
                    key[0], sub = jax.random.split(key[0])
                    bits = jax.random.bits(sub, p.shape, jnp.uint32)
                    if p.dtype == jnp.uint32 and name in ("d_p", "m_p", "kd_p", "km_p"):
                        # valid small f16 pairs: 0.01 in both halves
                        h = np.float16(0.01).view(np.uint16)
                        planes[name] = jnp.full(
                            p.shape, np.uint32(h) | (np.uint32(h) << 16), jnp.uint32
                        )
                    elif p.dtype == jnp.uint32:
                        planes[name] = bits
                    else:
                        planes[name] = (bits & 0x7F).astype(p.dtype)
                elif p.dtype == jnp.float16:
                    planes[name] = jnp.full(p.shape, 0.01, jnp.float16)
                else:
                    planes[name] = jnp.full(p.shape, 0.01, p.dtype)
            return QTensor(leaf.gtype, leaf.shape, planes)
        return jnp.zeros(leaf.shape, leaf.dtype) if leaf is not None else None

    return jax.tree.map(
        mk, spec, is_leaf=lambda x: x is None or isinstance(x, QTensor)
    )


def main():
    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.models import gpt2, llama, sampling

    # default workload = the BASELINE north-star: 7B Llama Q4_0 decode
    model = os.environ.get("BENCH_MODEL", "llama-7b")
    fmt = os.environ.get("BENCH_FORMAT", "q4_0")
    steps = int(os.environ.get("BENCH_STEPS", "24"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    prefill_len = int(os.environ.get("BENCH_PREFILL", "16"))

    cfgs = {
        "gpt2-124m": (gpt2, gpt2.GPT2_124M),
        "gpt2-355m": (gpt2, gpt2.GPT2_355M),
        "gpt2-774m": (gpt2, gpt2.GPT2_774M),
        "llama-tiny": (llama, llama.TINY_LLAMA),
        "llama-7b": (llama, llama.LLAMA_7B),
    }
    mod, cfg = cfgs[model]
    gtypes = {
        "q8_0": GType.Q8_0, "q4_0": GType.Q4_0, "q4_1": GType.Q4_1,
        "q4_k": GType.Q4_K, "q6_k": GType.Q6_K, "q5_0": GType.Q5_0,
    }

    rng = jax.random.PRNGKey(0)
    big = cfg.n_embd * cfg.n_layer > 16 * 4096  # 7B-class: avoid f32 staging
    if big and fmt in gtypes:
        params = _synthetic_qparams(mod, cfg, gtypes[fmt])
    else:
        params = mod.init_params(rng, cfg, dtype=jnp.bfloat16)
        if fmt in gtypes:
            params = jax.jit(
                lambda p: mod.quantize_params(p, gtypes[fmt]),
            )(params)
    params = jax.block_until_ready(params)

    int8_kv = os.environ.get("BENCH_INT8_KV") == "1"
    cache = mod.new_cache(cfg, batch, int8=int8_kv)
    prompt = jax.random.randint(
        jax.random.PRNGKey(1), (batch, prefill_len), 0, cfg.n_vocab
    ).astype(jnp.int32)

    mode = os.environ.get("BENCH_MODE", "decode")  # decode | prefill
    # Measurement note: on the axon backend block_until_ready resolves before
    # the remote execution finishes, so every timing window must end with a
    # VALUE fetch (np.asarray), and fixed fetch/dispatch latency is cancelled
    # with a two-length slope: step = (T(n2) - T(n1)) / (n2 - n1).
    import numpy as _np

    prefill, _ = sampling.make_decode_fns(mod.forward, cfg)

    if mode == "prefill":
        # prefill throughput: tokens processed per second at this prompt len.
        # The cache is donated and fed back with its length reset (13 fresh
        # 7B caches would not fit HBM); write offsets differ but cost doesn't.
        import numpy as _np
        from ggmlsharp_tpu.models import kv_cache as kvc

        def reset(c):
            return kvc.KVCache(c.k, c.v, c.k_scale, c.v_scale,
                               jnp.zeros_like(c.length))

        lg, cache2 = prefill(params, prompt, cache)  # compile
        _np.asarray(lg)

        def chain_p(n):
            nonlocal cache2
            t0 = time.perf_counter()
            for _ in range(n):
                lg, cache2 = prefill(params, prompt, reset(cache2))
            _np.asarray(lg)
            return time.perf_counter() - t0

        t_short = chain_p(4)
        t_long = chain_p(8)
        toks_per_s = 4 * batch * prefill_len / (t_long - t_short)
        wbytes = _wire_bytes(params)
        roofline = _hbm_bw() / wbytes * prefill_len  # 1 weight pass / prompt
        print(json.dumps({
            "metric": f"prefill tokens/sec/chip ({model} {fmt} len={prefill_len} b={batch})",
            "value": round(toks_per_s, 2),
            "unit": "tok/s",
            "vs_baseline": round(toks_per_s / roofline, 4),
        }))
        return

    gstep = sampling.make_greedy_step(mod.forward, cfg)
    logits, cache = prefill(params, prompt, cache)
    tok = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
    tok, cache = gstep(params, tok, cache)  # warmup (compile step)
    _np.asarray(tok)

    def timed_chain(n):
        nonlocal tok, cache
        t0 = time.perf_counter()
        for _ in range(n):
            tok, cache = gstep(params, tok, cache)
        _np.asarray(tok)  # forces completion through the relay
        return time.perf_counter() - t0

    n1 = max(4, steps // 4)
    n2 = n1 + steps
    t_short = timed_chain(n1)
    t_long = timed_chain(n2)
    dt = t_long - t_short
    toks_per_s = (n2 - n1) * batch / dt

    # roofline: per decoded token every weight byte is read once (+ KV read)
    wbytes = _wire_bytes(params)
    kv_bytes = 2 * cfg.n_layer * (prefill_len + steps // 2) * (
        cache.k[0].shape[1] * cache.k[0].shape[3]
    ) * cache.k[0].dtype.itemsize
    roofline = _hbm_bw() / (wbytes + kv_bytes)
    vs = toks_per_s / roofline

    print(json.dumps({
        "metric": f"tokens/sec/chip ({model} {fmt} decode b={batch})",
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
