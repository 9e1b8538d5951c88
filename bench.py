"""Benchmark entry point (driver contract: print ONE JSON line).

Measures single-chip quantized decode throughput on the real TPU.
Default workload: the BASELINE north-star — Llama-7B, Q4_0 weight-only,
batch 1 greedy decode. Weights are random (decode speed is weight-value
independent); correctness/perplexity parity is covered by tests and eval/.

`vs_baseline`: the reference (kant2002/GGMLSharp) publishes no numbers
(BASELINE.md), so this reports the fraction of the chip's HBM-bandwidth
roofline achieved — tokens/s · bytes-touched-per-token / HBM_BW. 1.0 =
speed-of-light decode for the stored bit-width.

Robustness contract (round-2): the top-level process is an ORCHESTRATOR. It
runs each workload in a fresh subprocess (a killed/hung TPU client can wedge
the chip claim — a fresh process is the documented recovery) under a time
budget, and falls back down a ladder of smaller workloads until one prints a
JSON line. BENCH_TIME_BUDGET (seconds, default 1500) bounds total wall time;
the final JSON line is ALWAYS printed, worst case with value 0 and an error
note in the metric name.

Env overrides: BENCH_MODEL=gpt2-124m|gpt2-355m|gpt2-774m|llama-tiny|
llama-7b|gptj-6b|gptj-tiny,
BENCH_FORMAT=q8_0|q4_0|q4_k|q6_k|bf16, BENCH_STEPS, BENCH_BATCH,
BENCH_PREFILL, BENCH_INT8_KV=1, BENCH_MODE=decode|prefill|train|serve
(serve: BENCH_SERVE_SLOTS/BENCH_SERVE_REQUESTS/BENCH_SERVE_NEW),
BENCH_TIME_BUDGET, BENCH_NO_FALLBACK=1 (single workload, no ladder).
"""
import json
import os
import sys
import time

# remote TPU compiles take minutes; persist them across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# v5e: ~819 GB/s HBM. (v5p ~2765, v4 ~1228.)
HBM_GBPS = {"v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9, "v4": 1228e9}


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# child: run one workload and print its JSON line
# --------------------------------------------------------------------------

def _hbm_bw():
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
        for k, v in HBM_GBPS.items():
            if k in kind:
                return v
    except Exception:
        pass
    return 819e9


def _wire_bytes(tree):
    import jax

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


def _synthetic_qparams(mod, cfg, gtype, qkw=None):
    """Build a quantized param tree with random integer payloads and small
    constant scales, WITHOUT materializing f32 weights (a 7B f32 staging copy
    would not fit HBM alongside the quantized model). Decode throughput is
    weight-value independent, so this benchmarks the same computation.

    The whole tree is built inside ONE jitted function — a single remote
    compile + single dispatch (round-1's per-plane eager ops caused hundreds
    of remote round-trips and timed the driver out, VERDICT.md item 1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ggmlsharp_tpu.quant.formats import QTensor

    is_leaf = lambda x: x is None or isinstance(x, QTensor)
    spec = jax.eval_shape(
        lambda: mod.quantize_params(
            mod.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
            gtype, **(qkw or {}),
        )
    )
    leaves, treedef = jax.tree.flatten(spec, is_leaf=is_leaf)
    h = np.float16(0.01).view(np.uint16)
    scale_word = np.uint32(h) | (np.uint32(h) << 16)

    @jax.jit
    def build(seed):
        out = []
        for i, leaf in enumerate(leaves):
            if isinstance(leaf, QTensor):
                planes = {}
                for j, (name, p) in enumerate(sorted(leaf.planes.items())):
                    # every uint32 scale plane (f16 pairs) gets a small
                    # constant scale; covers the fused-kernel dicts too
                    # (d1/d2, d_a/d_p/d_f/d_c)
                    if p.dtype == jnp.uint32 and name.split("_")[0] in (
                        "d", "m", "kd", "km", "d1", "d2",
                    ):
                        planes[name] = jnp.full(p.shape, scale_word, jnp.uint32)
                    elif p.dtype in (jnp.uint32, jnp.int8, jnp.uint8):
                        sub = jax.random.fold_in(seed, i * 64 + j)
                        bits = jax.random.bits(sub, p.shape, jnp.uint32)
                        if p.dtype == jnp.uint32:
                            planes[name] = bits
                        else:
                            planes[name] = (bits & 0x7F).astype(p.dtype)
                    elif p.dtype == jnp.float16:
                        planes[name] = jnp.full(p.shape, 0.01, jnp.float16)
                    else:
                        planes[name] = jnp.full(p.shape, 0.01, p.dtype)
                out.append(QTensor(leaf.gtype, leaf.shape, planes))
            elif leaf is None:
                out.append(None)
            else:
                out.append(jnp.zeros(leaf.shape, leaf.dtype))
        return jax.tree.unflatten(treedef, out)

    return build(jax.random.PRNGKey(1))


def _run_train_mode(mod, cfg, model, batch):
    """BENCH_MODE=train: Adam training throughput (tokens/sec/chip) on the
    bf16 model — fwd + bwd + update in ONE jitted, donated step (the
    reference is a training library; its largest workload is a 4096x256
    L-BFGS fit, SURVEY §1). vs_baseline = fraction of bf16 MXU peak at
    6 FLOPs/param/token."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as _np

    from ggmlsharp_tpu.models import kv_cache as kvc

    S = int(os.environ.get("BENCH_TRAIN_SEQ", "128"))
    B = batch
    rng = jax.random.PRNGKey(0)
    params = mod.init_params(rng, cfg, dtype=jnp.bfloat16)
    n_head_kv = getattr(cfg, "n_head_kv", cfg.n_head)
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, S + 1), 0,
                              cfg.n_vocab).astype(jnp.int32)

    def loss_fn(p, toks):
        inp, tgt = toks[:, :-1], toks[:, 1:]
        cache = kvc.init_cache(cfg.n_layer, B, n_head_kv, S, cfg.head_dim,
                               dtype=jnp.bfloat16)
        positions = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None], inp.shape)
        logits, _ = mod.forward(p, cfg, inp, cache, positions,
                                prefix_bound=S)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], -1))

    def adam_update(p, g, m, v, t):
        b1, b2, lr, eps = 0.9, 0.999, 1e-4, 1e-8
        m = jax.tree.map(lambda a, b: b1 * a + (1 - b1) * b, m, g)
        v = jax.tree.map(lambda a, b: b2 * a + (1 - b2) * b * b, v, g)
        corr1, corr2 = 1 - b1 ** t, 1 - b2 ** t
        p = jax.tree.map(
            lambda w, mm, vv: (w.astype(jnp.float32)
                               - lr * (mm / corr1)
                               / (jnp.sqrt(vv / corr2) + eps)).astype(w.dtype),
            p, m, v)
        return p, m, v

    zeros = jax.tree.map(lambda w: jnp.zeros(w.shape, jnp.float32), params)

    @functools.partial(jax.jit, donate_argnums=(0, 2, 3))
    def train_step(p, toks, m, v, t):
        loss, g = jax.value_and_grad(loss_fn)(p, toks)
        p, m, v = adam_update(p, g, m, v, t)
        return loss, p, m, v

    state = [params, zeros, jax.tree.map(jnp.copy, zeros)]
    t_idx = jnp.float32(1.0)
    loss, state[0], state[1], state[2] = train_step(
        state[0], toks, state[1], state[2], t_idx)
    _np.asarray(loss)
    _log("train step compiled")

    def chain(n):
        nonlocal t_idx
        t0 = time.perf_counter()
        loss = None
        for _ in range(n):
            t_idx = t_idx + 1
            loss, state[0], state[1], state[2] = train_step(
                state[0], toks, state[1], state[2], t_idx)
        _np.asarray(loss)
        return time.perf_counter() - t0

    t1 = chain(3)
    t2 = chain(9)
    steps_s = 6.0 / (t2 - t1)
    tok_s = steps_s * B * S
    n_params = sum(x.size for x in jax.tree.leaves(params))
    peak = 197e12  # v5e bf16
    roofline_tok_s = peak / (6.0 * n_params)
    print(json.dumps({
        "metric": f"train tokens/sec/chip ({model} bf16 adam B={B} S={S})",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / roofline_tok_s, 4),
    }), flush=True)


def _run_serve_mode(mod, cfg, model, fmt, params, slots, t_start):
    """BENCH_MODE=serve: continuous-batching engine throughput — aggregate
    generated tokens/sec across `slots` concurrent requests (prefill +
    decode + admission, the full serving stack). vs_baseline = fraction of
    the batched decode roofline: one weight pass serves `slots` tokens per
    tick, so roofline = slots * HBM_BW / wire_bytes."""
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from ggmlsharp_tpu.serving import Engine, Request

    n_new = int(os.environ.get("BENCH_SERVE_NEW", "24"))
    n_req = int(os.environ.get("BENCH_SERVE_REQUESTS", str(slots * 3)))
    plen = int(os.environ.get("BENCH_PREFILL", "16"))
    # serving cache default: bf16 head-major einsum — at the bench
    # workload's short prefixes (t_eff=64) the r5 A/B measured the b=8
    # step at 9.3 ms einsum vs 11.5 int8-flat-flash (the flash win is
    # LONG prefixes: einsum reads grow +4.9 ms by t_eff=1024 vs ~half
    # that for int8 flash; scripts/diag_win.py / probe notes in
    # PERFORMANCE.md). BENCH_INT8_KV=1 opts into the int8 flat cache.
    int8_kv = os.environ.get("BENCH_INT8_KV") == "1"
    rng = _np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.n_vocab, size=plen).tolist()
               for _ in range(n_req)]

    # size the per-slot KV allocation to the workload (BENCH_SERVE_MAXLEN):
    # a serving deployment preallocates KV for its configured context
    # budget, and the decode-step cost has a term proportional to the
    # ALLOCATED rows, not just the live prefix (scripts/diag_kv.py r4:
    # the per-slot-position KV write lowers as a whole-buffer pass) —
    # max_len=2048 cost +3.5 ms/step over max_len=512 at the same bucket
    _pow2 = 1
    while _pow2 < plen + n_new + 8:
        _pow2 *= 2
    max_len = int(os.environ.get("BENCH_SERVE_MAXLEN", "0")) or \
        min(cfg.n_ctx, max(256, _pow2))
    eng = Engine(mod.forward, cfg, params, batch_slots=slots,
                 cache_dtype=jnp.bfloat16, int8_kv=int8_kv,
                 max_len=max_len)
    # warmup: compile the decode step, fused argmax, the single-slot
    # prefill, and every power-of-two batched-admission group size the
    # timed run can hit (admission bursts compile one executable per
    # (bucket, group) — keep those out of the timed window)
    sizes, g = [], 1
    while g < slots:
        sizes.append(g)
        g *= 2
    sizes.append(slots)  # the capped full-burst size (B if not a pow2)
    wid = 0
    for g in sizes:
        for i in range(g):
            eng.submit(Request(id=-1 - wid, prompt=prompts[i % n_req],
                               max_new_tokens=2))
            wid += 1
        eng.run()
    # ... and every cache-length bucket (+ its multi-step windows) the
    # timed span can grow into: decode executables are keyed by bucket, so
    # one full-length request compiles each growth bucket OUTSIDE the
    # timed window (decode always runs the full B-slot array, so a single
    # warm request covers the batched case too)
    eng.submit(Request(id=-1 - wid, prompt=prompts[0],
                       max_new_tokens=n_new))
    eng.run()
    _log(f"serve engine warm at t={time.perf_counter()-t_start:.1f}s")

    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    t0 = time.perf_counter()
    results = eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(r.out_tokens) for r in results if r.id >= 0)
    toks_per_s = toks / dt

    wbytes = _wire_bytes(params)
    roofline = slots * _hbm_bw() / wbytes
    print(json.dumps({
        "metric": f"serving tokens/sec/chip ({model} {fmt} slots={slots} "
                  f"reqs={n_req} new={n_new} max_len={max_len} "
                  f"kv={'int8' if int8_kv else 'bf16'})",
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / roofline, 4),
    }), flush=True)


def run_workload():
    import jax
    import jax.numpy as jnp
    import numpy as _np

    from ggmlsharp_tpu.dtypes import GType
    from ggmlsharp_tpu.models import gpt2, gptj, llama, sampling

    model = os.environ.get("BENCH_MODEL", "llama-7b")
    fmt = os.environ.get("BENCH_FORMAT", "q4_0")
    steps = int(os.environ.get("BENCH_STEPS", "24"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    prefill_len = int(os.environ.get("BENCH_PREFILL", "16"))

    cfgs = {
        "gpt2-124m": (gpt2, gpt2.GPT2_124M),
        "gpt2-355m": (gpt2, gpt2.GPT2_355M),
        "gpt2-774m": (gpt2, gpt2.GPT2_774M),
        "gpt2-tiny": (gpt2, gpt2.GPT2_TINY),
        "llama-tiny": (llama, llama.TINY_LLAMA),
        "llama-7b": (llama, llama.LLAMA_7B),
        "gptj-6b": (gptj, gptj.GPTJ_6B),
        "gptj-tiny": (gptj, gptj.TINY_GPTJ),
    }
    mod, cfg = cfgs[model]
    gtypes = {
        "q8_0": GType.Q8_0, "q4_0": GType.Q4_0, "q4_1": GType.Q4_1,
        "q4_k": GType.Q4_K, "q6_k": GType.Q6_K, "q5_0": GType.Q5_0,
        "q5_1": GType.Q5_1,
    }

    _log(f"workload {model} {fmt} b={batch} steps={steps} — building params")
    t_start = time.perf_counter()
    rng = jax.random.PRNGKey(0)

    if os.environ.get("BENCH_MODE") == "train":
        _run_train_mode(mod, cfg, model, batch)
        return

    qkw = {"cfg": cfg} if mod is llama else {}  # llama layer-fused packing
    big = cfg.n_embd * cfg.n_layer > 16 * 4096  # 7B-class: avoid f32 staging
    if big and fmt in gtypes:
        params = _synthetic_qparams(mod, cfg, gtypes[fmt], qkw)
    else:
        params = mod.init_params(rng, cfg, dtype=jnp.bfloat16)
        if fmt in gtypes:
            params = jax.jit(
                lambda p: mod.quantize_params(p, gtypes[fmt], **qkw),
            )(params)
    params = jax.block_until_ready(params)
    _log(f"params ready at t={time.perf_counter()-t_start:.1f}s")

    if os.environ.get("BENCH_MODE") == "serve":
        slots = batch if batch > 1 else int(
            os.environ.get("BENCH_SERVE_SLOTS", "4"))
        _run_serve_mode(mod, cfg, model, fmt, params, slots, t_start)
        return

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
    prefill, _ = sampling.make_decode_fns(mod.forward, cfg)

    if mode == "prefill":
        # prefill throughput: tokens processed per second at this prompt len.
        # The cache is donated and fed back with its length reset (13 fresh
        # 7B caches would not fit HBM); write offsets differ but cost doesn't.
        from ggmlsharp_tpu.models import kv_cache as kvc

        def reset(c):
            return kvc.KVCache(c.k, c.v, c.k_scale, c.v_scale,
                               jnp.zeros_like(c.length))

        t_eff = sampling.length_bucket(prefill_len,
                                       getattr(cfg, "n_ctx", 2048))
        lg, cache2 = prefill(params, prompt, cache, t_eff=t_eff)  # compile
        _np.asarray(lg)
        _log(f"prefill compiled at t={time.perf_counter()-t_start:.1f}s")

        def chain_p(n):
            nonlocal cache2
            t0 = time.perf_counter()
            for _ in range(n):
                lg, cache2 = prefill(params, prompt, reset(cache2),
                                     t_eff=t_eff)
            _np.asarray(lg)
            return time.perf_counter() - t0

        t_short = chain_p(4)
        t_long = chain_p(8)
        toks_per_s = 4 * batch * prefill_len / (t_long - t_short)
        wbytes = _wire_bytes(params)
        roofline = _hbm_bw() / wbytes * prefill_len  # 1 weight pass / prompt
        # MFU: achieved matmul FLOP/s over the v5e bf16 peak (197 TFLOP/s).
        # 2*params_dense FLOPs per token (weight matmuls; attention FLOPs
        # excluded — negligible at bench prompt lengths) — the VERDICT r3
        # "prefill MFU unquantified" item.
        # lookup-only tables are not matmul FLOPs (ADVICE r4): wpe is a
        # positional lookup; tok_embd(dings) is a lookup whenever a
        # separate output/lm_head matmul exists; lm_head is the SWAR
        # DUPLICATE of gpt2's wte (which IS the lm-head matmul) — skip it
        # so the tied weight counts once
        lookup_only = {"wpe", "lm_head"}
        if isinstance(params, dict) and params.get("output") is not None:
            lookup_only |= {"tok_embd", "tok_embeddings"}
        n_dense = sum(
            int(_np.prod(t.shape))
            for path, t in jax.tree_util.tree_flatten_with_path(
                params, is_leaf=lambda x: hasattr(x, "planes"))[0]
            if len(getattr(t, "shape", ())) == 2
            and not any(getattr(k, "key", None) in lookup_only
                        for k in path))
        flops_per_tok = 2 * n_dense
        kind = jax.devices()[0].device_kind.lower()
        peak = 197e12 if "v5" in kind else None  # unknown kind: skip MFU
        mfu = toks_per_s * flops_per_tok / peak if peak else 0.0
        if peak:
            _log(f"prefill MFU {mfu:.3f} ({toks_per_s:.0f} tok/s x "
                 f"{flops_per_tok/1e9:.2f} GFLOP/tok vs "
                 f"{peak/1e12:.0f} TF peak)")
        print(json.dumps({
            "metric": f"prefill tokens/sec/chip ({model} {fmt} len={prefill_len} b={batch} mfu={mfu:.3f})",
            "value": round(toks_per_s, 2),
            "unit": "tok/s",
            "vs_baseline": round(toks_per_s / roofline, 4),
        }), flush=True)
        return

    gstep = sampling.make_greedy_step(mod.forward, cfg)
    n1 = max(4, steps // 4)
    n2 = n1 + steps
    # one static length bucket covering the whole run → a single decode
    # executable, attention reads only that prefix (no in-graph switch)
    # cache.length is RESET to its post-prefill value before every timed
    # window (the decoded positions repeat; attention cost is identical), so
    # the bucket only needs to cover one window regardless of BENCH_REPS
    # base=64: the run's live prefix is prefill+steps (~60 rows at the
    # default workload) — attention reads the 64-row bucket instead of 256
    # (same one-executable-per-bucket mechanism the serving engine uses;
    # the bucket still covers the whole timed window)
    t_eff = sampling.length_bucket(
        prefill_len + n1 + n2 + 8, getattr(cfg, "n_ctx", 2048), base=64)
    logits, cache = prefill(params, prompt, cache,
                            t_eff=sampling.length_bucket(
                                prefill_len, getattr(cfg, "n_ctx", 2048)))
    tok = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
    tok, cache = gstep(params, tok, cache, t_eff=t_eff)  # warmup (compile)
    _np.asarray(tok)
    _log(f"decode step compiled at t={time.perf_counter()-t_start:.1f}s")

    # BENCH_CHAIN=1 (default for sub-ms steps, i.e. every model except 7B):
    # run the n-step greedy chain as ONE jitted dispatch (lax.fori_loop —
    # the generate_scan while-loop machinery, models/sampling.py) so the
    # measurement resolves device throughput instead of per-step relay
    # round-trips (~ms each, high variance) that swamp a ~0.4 ms step.
    chain_default = "0" if model == "llama-7b" else "1"
    if os.environ.get("BENCH_CHAIN", chain_default) == "1":
        import functools

        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnums=(2,))
        def jit_chain(params, tok, cache, n):
            def body(_, c):
                t, cc = c
                return gstep(params, t, cc, t_eff=t_eff)

            return jax.lax.fori_loop(0, n, body, (tok, cache))

        def run_once(n):
            nonlocal tok, cache
            t0 = time.perf_counter()
            tok, cache = jit_chain(params, tok, cache, n)
            _np.asarray(tok)
            return time.perf_counter() - t0
    else:
        def run_once(n):
            nonlocal tok, cache
            t0 = time.perf_counter()
            for _ in range(n):
                tok, cache = gstep(params, tok, cache, t_eff=t_eff)
            _np.asarray(tok)  # forces completion through the relay
            return time.perf_counter() - t0

    # Each timed window is (true device time + relay dispatch/fetch jitter,
    # which is strictly additive and tens of ms in bad windows). min over
    # BENCH_REPS repetitions estimates the jitter-free window; the two-length
    # slope then cancels the remaining fixed latency. cache.length is reset
    # to the post-prefill value before each window so positions repeat and
    # one t_eff bucket covers every rep.
    from ggmlsharp_tpu.models.kv_cache import KVCache

    reps = int(os.environ.get("BENCH_REPS", "3"))
    len0 = _np.asarray(cache.length)  # host copy — chain mode donates cache

    def reset_len(c):
        return KVCache(c.k, c.v, c.k_scale, c.v_scale,
                       jnp.asarray(len0))

    run_once(n1)  # compile/warm (chain mode compiles the n1 executable)

    def timed_chain(n):
        nonlocal cache
        best = None
        for _ in range(reps):
            cache = reset_len(cache)
            t = run_once(n)
            best = t if best is None else min(best, t)
        return best
    t_short = timed_chain(n1)
    t_long = timed_chain(n2)
    dt = t_long - t_short
    toks_per_s = (n2 - n1) * batch / dt

    # roofline: per decoded token every weight byte is read once (+ KV read)
    wbytes = _wire_bytes(params)
    kbuf = cache.k[0]
    e_kv = (kbuf.shape[-1] if kbuf.ndim == 3  # flat [B, T, E] wire cache
            else kbuf.shape[1] * kbuf.shape[3])
    kv_bytes = 2 * cfg.n_layer * (prefill_len + steps // 2) * e_kv \
        * kbuf.dtype.itemsize
    roofline = _hbm_bw() / (wbytes + kv_bytes)
    vs = toks_per_s / roofline

    print(json.dumps({
        "metric": f"tokens/sec/chip ({model} {fmt} decode b={batch})",
        "value": round(toks_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 4),
    }), flush=True)


# --------------------------------------------------------------------------
# orchestrator: workload ladder under a time budget
# --------------------------------------------------------------------------

def _probe_device(timeout_s):
    """Fresh-process TPU reachability probe: import jax, claim the device,
    run one tiny jit, FETCH the value (axon's block_until_ready lies — only
    a host transfer proves the relay is alive). Returns True/False. A hung
    relay makes jax.devices() block forever, so without this probe every
    ladder rung would burn its full child timeout."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "y = jax.jit(lambda x: x * 2 + 1)(jnp.ones((8, 128), jnp.float32));"
        "print('PROBE_OK', float(np.asarray(y)[0, 0]), flush=True)"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and b"PROBE_OK" in proc.stdout


def _run_child(env_overrides, timeout_s):
    """Run `python bench.py` as a child in BENCH_CHILD mode; return the JSON
    line it printed, or None."""
    import subprocess

    env = dict(os.environ)
    env.update(env_overrides)
    env["BENCH_CHILD"] = "1"
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, timeout=timeout_s,
            stdout=subprocess.PIPE, stderr=None,  # child stderr → our stderr
        )
    except subprocess.TimeoutExpired:
        _log(f"child timed out after {timeout_s:.0f}s: {env_overrides}")
        return None
    _log(f"child rc={proc.returncode} in {time.perf_counter()-t0:.1f}s")
    if proc.returncode != 0:
        return None
    for line in reversed(proc.stdout.decode().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
                if "metric" in obj and "value" in obj:
                    return obj
            except json.JSONDecodeError:
                continue
    return None


def main():
    if os.environ.get("BENCH_CHILD") == "1":
        run_workload()
        return

    budget = float(os.environ.get("BENCH_TIME_BUDGET", "1500"))
    t0 = time.perf_counter()
    remaining = lambda: budget - (time.perf_counter() - t0)

    # gate the ladder on a cheap reachability probe: when the axon relay is
    # wedged (observed outage: jax.devices() hangs indefinitely), fail fast
    # with an honest zero line instead of burning the whole budget — the
    # driver's own kill timeout may be shorter than ours
    if os.environ.get("BENCH_SKIP_PROBE") != "1":
        # a HEALTHY chip can still take minutes on first contact (claim
        # stalls 10-300 s + one tiny remote compile on a cold cache), so
        # each window is 300 s — two failures still leave ~ half the
        # default budget for the honest error line
        probe_t = min(300.0, max(60.0, remaining() - 360.0))
        _log(f"device probe (timeout {probe_t:.0f}s)")
        ok = _probe_device(probe_t)
        if not ok:
            _log("probe failed; one retry in a fresh process "
                 "(killed clients can wedge the claim for ~minutes)")
            ok = _probe_device(min(300.0, max(60.0, remaining() - 30.0)))
        if not ok:
            print(json.dumps({
                "metric": "bench failed (TPU device unreachable: relay "
                          "probe timed out twice)",
                "value": 0.0,
                "unit": "tok/s",
                "vs_baseline": 0.0,
            }), flush=True)
            return
        _log(f"probe ok ({remaining():.0f}s budget left)")

    primary = {
        "BENCH_MODEL": os.environ.get("BENCH_MODEL", "llama-7b"),
        "BENCH_FORMAT": os.environ.get("BENCH_FORMAT", "q4_0"),
    }
    # fallback ladder: smaller models compile/run faster and their kernels
    # are far more likely to be warm in the compile cache
    ladder = [primary]
    if os.environ.get("BENCH_NO_FALLBACK") != "1":
        for cand in (
            {"BENCH_MODEL": "gpt2-124m", "BENCH_FORMAT": "q8_0"},
            {"BENCH_MODEL": "llama-tiny", "BENCH_FORMAT": "q4_0"},
            # last resort: hardware-proven round-2 kernels only (the fused
            # decode/layer kernels off), in case a new kernel fails Mosaic
            {"BENCH_MODEL": "llama-tiny", "BENCH_FORMAT": "q4_0",
             "GGML_TPU_FLASH_DECODE": "0", "GGML_TPU_LAYER_FUSED": "0",
             "GGML_TPU_MLP_FUSED": "0"},
        ):
            if cand != primary:
                ladder.append(cand)

    result = None
    for i, wl in enumerate(ladder):
        # leave at least 120s for each remaining fallback, 30s margin
        reserve = 120 * (len(ladder) - 1 - i) + 30
        t = remaining() - reserve
        if t < 60:
            _log(f"skipping {wl}: only {t:.0f}s usable")
            continue
        _log(f"attempt {i + 1}/{len(ladder)}: {wl} (timeout {t:.0f}s)")
        result = _run_child(wl, t)
        if result is not None:
            break

    if result is None:
        result = {
            "metric": "bench failed (all ladder workloads timed out/errored)",
            "value": 0.0,
            "unit": "tok/s",
            "vs_baseline": 0.0,
        }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
