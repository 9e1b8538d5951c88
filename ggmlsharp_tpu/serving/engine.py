"""Continuous-batching inference engine (BASELINE config 4: "continuous
batching across hosts"; the reference has no serving layer at all, SURVEY §1).

Slot-based design on a static-shape runtime (SURVEY §7 "hard parts"):
  * B fixed slots share one batched KV cache; per-slot lengths live in
    cache.length, so finished requests free their slot without reshaping
    anything.
  * admission = bucketed prefill: same-bucket admission bursts batch into
    ONE forward (a fresh G-row sub-cache, KV/length/logits scattered into
    the slot rows by traced index vectors); single admissions slice the
    slot's cache rows out (lax.dynamic_slice), run a bucketed-length jitted
    prefill (prompt padded up to the bucket; pad K/V rows land at positions
    ≥ len and are progressively overwritten by decode, never attended
    before that), and write the rows back.
  * decode = ONE batched single-token step for all live slots per tick;
    finished/empty slots run with pad tokens and are masked host-side.
  * compiled-function reuse: one decode step executable + one prefill
    executable per length bucket, regardless of traffic.

Under a {data, model} mesh, the cache/batch shard over `data` and the step is
the same jitted function — multi-host continuous batching is this engine with
jax.distributed initialized (each host feeds its data-shard slots).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models import kv_cache as kvc


from .admission import AdmissionMixin
from .common import _bucket
from .prefix import PrefixCacheMixin
from .request import Request, _stopped
from .spec import SpecServingMixin


class Engine(AdmissionMixin, PrefixCacheMixin, SpecServingMixin):
    def __init__(self, forward, cfg, params, batch_slots: int = 4,
                 max_len: int | None = None, cache_dtype=jnp.float32,
                 int8_kv: bool | None = None, rng_seed: int = 0,
                 draft_forward=None, draft_cfg=None, draft_params=None,
                 spec_k: int = 4, mesh=None,
                 prefill_chunk: int | None = None,
                 multi_step: int | None = None,
                 stream_bursts: bool = False):
        """draft_forward/draft_cfg/draft_params: enable SPECULATIVE
        continuous batching — every tick runs one draft-propose/target-verify
        round across all live slots (models.speculative), emitting 1..k+1
        tokens per slot per target dispatch. Greedy-exact: outputs are
        bit-identical to the non-speculative engine; requests with
        temperature > 0 are rejected in spec mode.

        mesh: a jax.sharding.Mesh with a "model" axis for tensor-parallel
        serving — pass params already sharded (parallel.sharding
        .shard_params); the engine shards its KV cache's heads over the
        axis and GSPMD partitions every prefill/decode executable. Forces
        the head-major cache layout (the flat-cache pallas flash-decode
        kernel is single-chip; XLA attention partitions cleanly).

        prefill_chunk: split prompts longer than this into per-tick chunks
        so one long admission cannot head-of-line-block decode for live
        slots (chunked prefill; plain engine only — spec mode prefills
        whole prompts). Chunks ride the suffix-prefill machinery (traced
        start offset, cached-prefix attention).

        multi_step: decode-window length W (default GGML_TPU_SERVE_MULTISTEP,
        32; 1 disables). W is only the STATIC buffer size — the actual
        trip count is traced and clamps to the smallest remaining per-slot
        budget, so a large W costs nothing when budgets are short and
        saves a ~33 ms relay round trip per extra 16 tokens when they are
        long (r4 diag). When every live slot is greedy and penalty-free and
        nothing is pending/prefilling, the engine runs up to W decode steps
        in ONE jit-resident while_loop dispatch and fetches a [B, W] token
        block — amortizing the fixed host dispatch+fetch latency (the
        dominant tick cost for small models) over the window. The actual
        window length is TRACED (one executable regardless): it clamps to
        the SMALLEST remaining budget across live slots, so mixed-budget
        batches never burn device steps a slot can't use. Host-side stop
        sequences / eos still truncate within the window (extra rows in a
        freed slot's cache are dead — the next admission's prefill resets
        them).

        stream_bursts: slots with an on_token streaming callback force the
        single-step path by default, keeping per-token latency and cancel()
        responsiveness for streaming clients (serving.server); pass True to
        let streaming requests ride the window too (callbacks then fire in
        window-sized bursts after each fetch)."""
        self.forward = forward
        self.cfg = cfg
        self.params = params
        self.B = batch_slots
        if batch_slots & (batch_slots - 1):
            # measured on v5e (PERFORMANCE.md r5 concurrency table):
            # non-pow2 batches hit (8,128) tile padding on every [B,...]
            # buffer plus XLA remat copy thrash — slots=24 served at 473
            # tok/s vs 1058 at 16 and 1231 at 32. Warn, don't refuse:
            # tiny-model/CPU uses are unaffected.
            import warnings

            warnings.warn(
                f"batch_slots={batch_slots} is not a power of two; TPU "
                "[B,...] buffers pad to (8,128) tiles and decode-step "
                "throughput degrades sharply (see PERFORMANCE.md). Use "
                f"{1 << (batch_slots - 1).bit_length()} or "
                f"{1 << (batch_slots.bit_length() - 1)}.",
                stacklevel=2)
        n_head_kv = getattr(cfg, "n_head_kv", cfg.n_head)
        self.max_len = max_len or cfg.n_ctx
        self.mesh = mesh
        if int8_kv is None:  # config default (GGML_TPU_INT8_KV)
            from ..config import get_config

            int8_kv = get_config().int8_kv
        self.int8_kv = int8_kv

        # flat cache → batched flash-decode kernel with per-slot prefix
        # lengths (kernels.attn_decode); INT8 KV dequantizes in-kernel.
        # Float caches default HEAD-MAJOR since r4: the einsum step at b=8
        # measured 12.2 ms vs 18.9 ms flash-flat on v5e (the flash kernel
        # is VPU-cast-bound on bf16 cache reads — scripts/diag_serve.py);
        # INT8 keeps flat, where the in-kernel dequant beats XLA's
        # dequant round trip (r3 A/B).
        flat = (mesh is None
                and (n_head_kv * cfg.head_dim) % 128 == 0
                # only forwards that handle the flat [B,T,E] layout (llama)
                and getattr(cfg, "supports_flat_kv", False)
                and os.environ.get("GGML_TPU_FLASH_DECODE",
                                   "1" if int8_kv else "0") == "1")
        self.cache = kvc.init_cache(
            cfg.n_layer, batch_slots, n_head_kv, self.max_len, cfg.head_dim,
            dtype=cache_dtype, int8=int8_kv, flat=flat,
        )
        if mesh is not None:
            self.cache = self._shard_cache(self.cache)
        self.slots: list[Request | None] = [None] * batch_slots
        self.pending: list[Request] = []
        self.finished: list[Request] = []
        self._last_logits = jnp.zeros((batch_slots, cfg.n_vocab), jnp.float32)
        self._rng = jax.random.PRNGKey(rng_seed)
        self._compiled_prefill = {}
        self._prefixes: dict[int, dict] = {}
        self._compiled_install: dict[int, object] = {}
        self._next_prefix_id = 0
        self.prefill_chunk = prefill_chunk
        self._chunking: dict[int, int] = {}  # slot → next prompt offset
        # spec chunking: slot → (phase "t"|"d", next offset); target chunks
        # first, then draft chunks of prompt[:-1], then finalize (a0+seed)
        self._spec_chunking: dict[int, tuple] = {}
        self._n_ticks = self._n_emitted = self._n_prefills = 0
        self._n_preadmits = 0  # slots re-filled behind an in-flight window
        # dispatched-but-undrained pre-admitted requests (removed from
        # slots at dispatch, finished at drain): cancel() consults this so
        # the request stays cancellable in that span (ADVICE r4)
        self._inflight_pre: dict[int, Request] = {}
        self._lat_sum = self._ttft_sum = 0.0
        self._lat_n = self._ttft_n = 0
        self._t_first = None
        self.multi_step = (multi_step if multi_step is not None
                           else int(os.environ.get(
                               "GGML_TPU_SERVE_MULTISTEP", "32")))
        self.stream_bursts = stream_bursts
        self._multi = None  # built on first all-greedy window
        self._chain = None  # host-chained window step (_window_chained)
        self._step = self._make_step()
        self._argmax = jax.jit(
            lambda l: jnp.argmax(l, axis=-1).astype(jnp.int32))

        def _lp(l, toks):  # log-prob of the chosen token per slot
            lp = jax.nn.log_softmax(l.astype(jnp.float32), axis=-1)
            return jnp.take_along_axis(lp, toks[:, None], axis=-1)[:, 0]

        self._logprob_of = jax.jit(_lp)
        self._samplers: dict[tuple, object] = {}

        # --- speculative mode ---------------------------------------------
        self.spec = draft_forward is not None
        if self.spec:
            from ..models.speculative import make_spec_round

            self.d_forward = draft_forward
            self.d_cfg = draft_cfg or cfg
            self.d_params = draft_params
            self.spec_k = spec_k
            d_hkv = getattr(self.d_cfg, "n_head_kv", self.d_cfg.n_head)
            d_flat = (mesh is None
                      and (d_hkv * self.d_cfg.head_dim) % 128 == 0
                      and getattr(self.d_cfg, "supports_flat_kv", False)
                      and os.environ.get("GGML_TPU_FLASH_DECODE",
                                         "1" if int8_kv else "0") == "1")
            self.d_cache = kvc.init_cache(
                self.d_cfg.n_layer, batch_slots, d_hkv, self.max_len,
                self.d_cfg.head_dim, dtype=cache_dtype, int8=int8_kv,
                flat=d_flat,
            )
            if mesh is not None:
                self.d_cache = self._shard_cache(self.d_cache)
            self._spec_round = make_spec_round(
                forward, cfg, draft_forward, self.d_cfg, spec_k)
            self._spec_round_sampled = None  # built on first sampled slot
            self._seed = np.zeros((batch_slots, 2), np.int32)

    def _shard_cache(self, cache):
        """Shard a head-major KV cache's KV heads over the mesh "model"
        axis (slots stay host-addressable: batch axis replicated so the
        per-slot scatters in prefill/install never cross hosts)."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.sharding import shard_cache

        heads = P(None, "model", None, None)
        specs = {"k": heads, "v": heads, "k_scale": heads,
                 "v_scale": heads, "length": P(None)}
        return shard_cache(cache, specs, self.mesh)

    def _slot_sampler(self, req: Request):
        """One jitted sampler per distinct (temperature, top_k, top_p,
        penalty, window) config: slices the slot's logits row on device and
        samples in ONE dispatch (CLAUDE.md: never run eager jnp ops on the
        TPU path). repeat_last_n <= 0 disables the penalty (llama.cpp
        semantics) — and keeps the recent-window shape static."""
        from ..models.sampling import sample_token as _st

        win = (req.repeat_last_n
               if req.repeat_penalty != 1.0 and req.repeat_last_n > 0
               else 0)
        key = (req.temperature, req.top_k, req.top_p,
               req.repeat_penalty if win else 1.0, win)
        fn = self._samplers.get(key)
        if fn is None:
            t, k, p = req.temperature, req.top_k, req.top_p
            rp = req.repeat_penalty

            if win:
                @jax.jit
                def fn(logits, slot, rng, recent):
                    row = jax.lax.dynamic_slice_in_dim(logits, slot, 1, 0)
                    return _st(row, rng, t, k, p, rp, recent)[0, 0]
            else:
                @jax.jit
                def fn(logits, slot, rng):
                    row = jax.lax.dynamic_slice_in_dim(logits, slot, 1, 0)
                    return _st(row, rng, t, k, p)[0, 0]
            self._samplers[key] = fn
        return fn, win

    # --- jitted pieces ---------------------------------------------------
    def _make_step(self):
        fwd, cfg = self.forward, self.cfg

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("t_eff",))
        def step(params, cache, tokens, active, t_eff=None):
            positions = cache.length[:, None]
            logits, cache2 = fwd(params, cfg, tokens, cache, positions,
                                 prefix_bound=t_eff)
            # only active slots advance
            cache2 = kvc.KVCache(
                cache2.k, cache2.v, cache2.k_scale, cache2.v_scale,
                jnp.where(active, cache2.length, cache2.length - 1),
            )
            return logits[:, -1, :], cache2

        return step

    def _make_chain_step(self):
        """One greedy decode step taking LOGITS (not a token): argmax +
        forward in a single dispatch, so a W-token window can be issued as
        W back-to-back host dispatches with every carried value (logits,
        cache, per-step token/logprob columns) staying on-device and ONE
        fetch at drain time. Measured motivation (scripts/diag_win.py +
        /tmp probe, b=64 int8 7B): a jit-resident loop (while_loop AND
        static fori_loop alike) pays ~34.5 ms/step because loop iterations
        serialize on the carry, while host-dispatched plain steps pipeline
        through the relay at ~28.4 ms/step — the dispatch queue overlaps
        the next step's weight DMA with the current step's tail. Host
        chaining buys that overlap without the per-token fetch."""
        fwd, cfg = self.forward, self.cfg

        @partial(jax.jit, donate_argnums=(1,),
                 static_argnames=("t_eff", "want_lps"))
        def cstep(params, cache, logits, active, t_eff=None,
                  want_lps=False):
            tok = jnp.argmax(
                logits, axis=-1, keepdims=True).astype(jnp.int32)
            if want_lps:
                lp = jnp.take_along_axis(
                    jax.nn.log_softmax(logits, axis=-1), tok, axis=-1)
            else:
                lp = jnp.zeros((self.B, 1), jnp.float32)
            positions = cache.length[:, None]
            lg, cache2 = fwd(params, cfg, tok, cache, positions,
                             prefix_bound=t_eff)
            cache2 = kvc.KVCache(
                cache2.k, cache2.v, cache2.k_scale, cache2.v_scale,
                jnp.where(active, cache2.length, cache2.length - 1),
            )
            return lg[:, -1, :], cache2, tok, lp

        return cstep

    def _window_chained(self) -> bool:
        """Window formulation: host-chained dispatches vs jit-resident
        while_loop. GGML_TPU_SERVE_CHAIN=1|0|auto (default auto: chained
        when the KV cache tops 256 MB — big-model/high-slot configs where
        the ~20% loop-carry serialization dwarfs per-dispatch jitter;
        sub-ms models keep the single-dispatch window that exists to
        amortize exactly that jitter)."""
        mode = os.environ.get("GGML_TPU_SERVE_CHAIN", "auto")
        if mode in ("1", "0"):
            return mode == "1"
        try:
            nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in self.cache.k + self.cache.v)
        except Exception:
            return False
        # measured crossover (v5e, 7B Q4_0, PERFORMANCE.md): slots=8 bf16
        # (1.07 GB cache) serves 683 while_loop vs 645 chained — per-step
        # dispatch jitter beats the small carry cost; slots=16 (2.1 GB)
        # 1058 vs 1141 — the carry serialization dominates. Threshold
        # between those two points.
        return nbytes > 1536 * 1024 * 1024

    def _make_multi_step(self):
        """Up to W greedy decode steps in one dispatch (lax.while_loop —
        strict carry aliasing keeps the KV cache in place, models.sampling
        .generate_scan's formulation). The token/logprob buffers are sized
        statically at W = self.multi_step; the trip count `n_steps` is
        TRACED, so shorter windows (clamped to the smallest remaining
        per-slot budget) reuse the SAME executable. Returns (last_logits,
        cache, tokens [B, W], chosen-token logprobs [B, W]) — only the
        first n_steps columns are meaningful."""
        fwd, cfg = self.forward, self.cfg
        B, W = self.B, self.multi_step

        @partial(jax.jit, donate_argnums=(1,),
                 static_argnames=("t_eff", "want_lps"))
        def multi(params, cache, last_logits, active, n_steps, t_eff=None,
                  want_lps=True):
            toks0 = jnp.zeros((B, W), jnp.int32)
            lps0 = jnp.zeros((B, W), jnp.float32)

            def cond(c):
                return c[0] < n_steps

            def body(c):
                i, logits, cache, toks, lps = c
                tok = jnp.argmax(
                    logits, axis=-1, keepdims=True).astype(jnp.int32)
                toks = jax.lax.dynamic_update_slice(toks, tok, (0, i))
                if want_lps:  # static: skip the [B, V] log_softmax pass
                    lp = jnp.take_along_axis(
                        jax.nn.log_softmax(logits, axis=-1), tok, axis=-1)
                    lps = jax.lax.dynamic_update_slice(lps, lp, (0, i))
                positions = cache.length[:, None]
                lg, cache2 = fwd(params, cfg, tok, cache, positions,
                                 prefix_bound=t_eff)
                cache2 = kvc.KVCache(
                    cache2.k, cache2.v, cache2.k_scale, cache2.v_scale,
                    jnp.where(active, cache2.length, cache2.length - 1),
                )
                return i + 1, lg[:, -1, :], cache2, toks, lps

            _, logits, cache, toks, lps = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), last_logits, cache, toks0, lps0))
            return logits, cache, toks, lps

        return multi

    def _window_k(self, ready, greedy) -> int:
        """Decode-window length for this tick: up to the configured
        multi_step when EVERY live slot is greedy/penalty-free, nothing is
        pending or prefilling, and (unless stream_bursts) no live slot
        streams — clamped to the SMALLEST remaining per-slot budget and the
        cache headroom, so no slot ever oversteps its budget inside the
        window. The clamp is a traced argument of one shared executable.
        Returns 1 for the single-token path."""
        W = self.multi_step
        if W <= 1 or self._chunking:
            return 1
        if self.pending and any(s is None for s in self.slots):
            return 1  # a slot is free: admit before windowing
        # pending + FULL slots: window anyway — the min-remaining clamp
        # below ends the window exactly on the earliest budget-finisher, so
        # admission is not delayed (only early stop/eos inside a window
        # trades up to W-1 wasted steps; every tick otherwise pays a full
        # host->device->host round trip, which dominates serving throughput
        # on relay-attached chips)
        if not any(ready) or ready != greedy:
            return 1
        # snapshot: an external cancel() on another thread may null slots
        # mid-scan (ADVICE r4) — a stale entry only costs wasted window
        # steps, never an exception
        occupied = [s for s in list(self.slots) if s is not None]
        if not occupied or any(s.done for s in occupied):
            return 1
        if not self.stream_bursts and \
                any(s.on_token is not None for s in occupied):
            return 1  # streaming wants per-token latency (ADVICE r2)
        L = max(len(s.prompt) + len(s.out_tokens) for s in occupied)
        rem = min(s.max_new_tokens - len(s.out_tokens) for s in occupied)
        return max(1, min(W, rem, self.max_len - L))

    def _dispatch_window(self, k: int) -> dict:
        """Dispatch one W-token decode window (no fetch) + speculative
        admission behind it; returns the drain record."""
        from ..models.sampling import length_bucket

        window_reqs = list(self.slots)  # one snapshot: the requests the
        # window runs for (cancel() on another thread may null slots)
        active = jnp.asarray(
            [s is not None and not s.done for s in window_reqs], bool)
        live = [len(s.prompt) + len(s.out_tokens)
                for s in window_reqs if s is not None]
        t_eff = length_bucket(min(max(live, default=1) + k, self.max_len),
                              self.max_len, base=64)
        want_lps = any(s is not None and s.want_logprobs
                       for s in self.slots)
        if self._window_chained():
            # W host dispatches, all carries on-device, one drain fetch
            if self._chain is None:
                self._chain = self._make_chain_step()
            logits = self._last_logits
            tcols, lcols = [], []
            for _ in range(k):
                # reassign self.cache per dispatch: donation invalidates
                # the previous buffers immediately
                logits, self.cache, tok, lp = self._chain(
                    self.params, self.cache, logits, active,
                    t_eff=t_eff, want_lps=want_lps)
                tcols.append(tok)
                lcols.append(lp)
            toks = jnp.concatenate(tcols, axis=1) if len(tcols) > 1 \
                else tcols[0]
            lps = jnp.concatenate(lcols, axis=1) if len(lcols) > 1 \
                else lcols[0]
        else:
            if self._multi is None:
                self._multi = self._make_multi_step()
            logits, self.cache, toks, lps = self._multi(
                self.params, self.cache, self._last_logits, active,
                jnp.int32(k), t_eff=t_eff, want_lps=want_lps)
        self._last_logits = logits
        pre: dict[int, Request] = {}
        n_live = sum(s is not None and not s.done for s in self.slots)
        if self.pending and not self.spec and not self._chunking:
            for i, req in enumerate(self.slots):
                if req is not None and not req.done and \
                        req.max_new_tokens - len(req.out_tokens) <= k:
                    pre[i] = req
            if pre:
                for i, r in pre.items():
                    self.slots[i] = None
                    self._inflight_pre[r.id] = r
                self._n_preadmits += len(pre)
                self._admit()  # dispatches prefill behind the window
        return {"k": k, "reqs": window_reqs, "toks": toks, "lps": lps,
                "pre": pre, "drained_all": len(pre) == n_live and n_live > 0}

    def _drain_window(self, rec: dict):
        """Fetch one dispatched window's tokens and do the host-side emit/
        stop/budget bookkeeping."""
        import numpy as np

        k, pre = rec["k"], rec["pre"]
        toks = np.asarray(rec["toks"])  # ONE fetch for the whole window
        lps_np = None
        for i, req in enumerate(rec["reqs"]):
            if req is None:
                continue
            for j in range(k):
                if req.done:
                    break
                tok = int(toks[i, j])
                self._emit(req, tok)
                if req.want_logprobs:
                    if lps_np is None:
                        lps_np = np.asarray(rec["lps"])
                    req.out_logprobs.append(float(lps_np[i, j]))
                if _stopped(req) or \
                        len(req.out_tokens) >= req.max_new_tokens:
                    req.done = True
        for i, req in pre.items():
            req.done = True
            self._inflight_pre.pop(req.id, None)
            if req.t_done is None:  # not already finished (e.g. cancelled)
                self._finished(req)
            if self.slots[i] is None:  # pending ran out: free normally
                self._free_slot(i)
            # else: the admitted request's prefill set the slot length
        for i, req in enumerate(self.slots):
            if req is not None and i not in pre and req.done:
                self._finish_slot(req, i)

    def _multi_tick(self, k: int) -> bool:
        """Decode-window tick: dispatch up to GGML_TPU_SERVE_PIPELINE
        windows (default 4) back-to-back BEFORE the first token fetch,
        then drain them in order.

        Speculative admission (r4): a slot whose remaining budget is <= k
        is GUARANTEED free after this window (early stop/eos only frees it
        sooner), so when requests are pending, the next admission burst's
        prefill is dispatched BEHIND the in-flight window — the device runs
        it during the ~30 ms window-fetch relay round trip it would
        otherwise spend idle. When a window provably drains EVERY live slot
        and the admitted wave is again all-greedy, the NEXT wave's window
        is dispatched too (window pipelining) — the device chains
        window -> prefill -> window without a host round trip between
        waves; only the final window's fetch is paid. Early stop inside a
        pipelined window wastes at most that wave's remaining steps (same
        tradeoff as a single window)."""
        depth = max(1, int(os.environ.get("GGML_TPU_SERVE_PIPELINE", "4")))
        records = [self._dispatch_window(k)]
        while len(records) < depth and records[-1]["drained_all"]:
            ready = [s is not None and not s.done and i not in self._chunking
                     for i, s in enumerate(self.slots)]
            if not any(ready):
                break
            greedy = [r and s.temperature <= 0.0 and s.repeat_penalty == 1.0
                      for r, s in zip(ready, self.slots)]
            k2 = self._window_k(ready, greedy)
            if k2 <= 1:
                break
            # provable full drain again: every live slot's whole budget
            # fits this window (fresh admissions have empty out_tokens)
            if not all(s is None or
                       s.max_new_tokens - len(s.out_tokens) <= k2
                       for s in self.slots):
                break
            self._n_ticks += 1
            records.append(self._dispatch_window(k2))
        for rec in records:
            self._drain_window(rec)
        return True

    def _free_slot(self, i: int):
        self.cache = kvc.KVCache(
            self.cache.k, self.cache.v, self.cache.k_scale,
            self.cache.v_scale, self.cache.length.at[i].set(0))
        if self.spec:
            self.d_cache = kvc.KVCache(
                self.d_cache.k, self.d_cache.v, self.d_cache.k_scale,
                self.d_cache.v_scale, self.d_cache.length.at[i].set(0))

    def submit(self, req: Request):
        import time as _time

        req.t_submit = _time.perf_counter()
        self.pending.append(req)

    def _emit(self, req: Request, tok: int):
        """Record one generated token and fire the streaming callback."""
        if req.t_first_token is None:
            import time as _time

            req.t_first_token = _time.perf_counter()
        req.out_tokens.append(tok)
        self._n_emitted += 1
        if req.on_token is not None:
            req.on_token(req, tok)

    def _finished(self, req: Request):
        import time as _time

        req.t_done = _time.perf_counter()
        if req.t_submit is not None:
            self._lat_sum += req.t_done - req.t_submit
            self._lat_n += 1
            if req.t_first_token is not None:
                self._ttft_sum += req.t_first_token - req.t_submit
                self._ttft_n += 1
        self.finished.append(req)

    def _reject(self, req: Request, error: str):
        req.done, req.error = True, error
        self._finished(req)

    def _finish_slot(self, req: Request, slot: int):
        """Retire a done request and free its slot (cache length reset)."""
        req.done = True
        self._finished(req)
        self.slots[slot] = None
        self._free_slot(slot)

    def cancel(self, request_id: int) -> bool:
        """Cancel a pending or live request (error='cancelled'); its slot
        frees at once and the partial output stays on the request."""
        for j, r in enumerate(self.pending):
            if r.id == request_id:
                r.done, r.error = True, "cancelled"
                self._finished(self.pending.pop(j))
                return True
        for i, r in enumerate(self.slots):
            if r is not None and r.id == request_id:
                r.done, r.error = True, "cancelled"
                self._finished(r)
                self.slots[i] = None
                self._free_slot(i)
                return True
        # dispatched-but-undrained pre-admitted request: flag it done so
        # the drain skips its window tokens (drain sees t_done set and
        # does not double-finish)
        r = self._inflight_pre.pop(request_id, None)
        if r is not None and r.t_done is None:
            r.done, r.error = True, "cancelled"
            self._finished(r)
            return True
        return False

    def stats(self) -> dict:
        """Engine counters: ticks, emitted tokens, prefill dispatches,
        queue/slot occupancy, rolling tokens/sec since the first tick."""
        import time as _time

        dt = (_time.perf_counter() - self._t_first) \
            if self._t_first is not None else 0.0
        return {
            "ticks": self._n_ticks,
            "tokens_emitted": self._n_emitted,
            "prefill_dispatches": self._n_prefills,
            "speculative_admissions": self._n_preadmits,
            "queue_depth": len(self.pending),
            "live_slots": sum(s is not None for s in self.slots),
            "finished": len(self.finished),
            "tokens_per_s": (self._n_emitted / dt) if dt > 0 else 0.0,
            "mean_ttft_s": (self._ttft_sum / self._ttft_n)
            if self._ttft_n else None,
            "mean_latency_s": (self._lat_sum / self._lat_n)
            if self._lat_n else None,
        }

    def step_once(self):
        """One engine tick: admit, sample per live slot, batched decode.
        Speculative mode: one draft/verify round instead (1..k+1 tokens)."""
        import time as _time

        if self._t_first is None:
            self._t_first = _time.perf_counter()
        self._n_ticks += 1
        self._admit()
        if self.spec:
            return self._spec_tick()
        if self._chunking:
            self._advance_chunks()
        if all(s is None for s in self.slots):
            return False
        if all(i in self._chunking
               for i, s_ in enumerate(self.slots) if s_ is not None):
            return True  # everything still prefilling; nothing to decode

        # greedy penalty-free slots sample in ONE fused argmax dispatch
        # (a B-int fetch); only slots with sampling params fetch their
        # [V] logits row and sample host-side
        ready = [s is not None and i not in self._chunking
                  for i, s in enumerate(self.slots)]
        greedy = [r and s.temperature <= 0.0 and s.repeat_penalty == 1.0
                  for r, s in zip(ready, self.slots)]
        k = self._window_k(ready, greedy)
        if k > 1:  # all-greedy W-token window: one dispatch, one fetch
            return self._multi_tick(k)
        self._rng, sub = jax.random.split(self._rng)
        toks = np.zeros((self.B, 1), np.int32)
        fancy = [r and not g for r, g in zip(ready, greedy)]
        gtoks = np.asarray(self._argmax(self._last_logits)) \
            if any(greedy) else None
        keys = jax.random.split(sub, self.B) if any(fancy) else None
        for i, req in enumerate(self.slots):
            if req is None or not ready[i]:
                continue
            if req.done:  # cancelled externally: no further tokens
                continue
            if greedy[i]:
                tok = int(gtoks[i])
            else:
                fn, win = self._slot_sampler(req)
                if win:
                    from ..models.sampling import _recent_window

                    recent = _recent_window(np.asarray(
                        [req.prompt + req.out_tokens], np.int32), win)
                    tok = int(np.asarray(fn(
                        self._last_logits, jnp.int32(i), keys[i], recent)))
                else:
                    tok = int(np.asarray(fn(
                        self._last_logits, jnp.int32(i), keys[i])))
            self._emit(req, tok)
            toks[i, 0] = tok
            if _stopped(req) or len(req.out_tokens) >= req.max_new_tokens:
                req.done = True
        if any(s_ is not None and s_.want_logprobs for s_ in self.slots):
            lps = np.asarray(self._logprob_of(
                self._last_logits, jnp.asarray(toks[:, 0])))
            for i, req in enumerate(self.slots):
                if req is not None and req.want_logprobs and \
                        len(req.out_logprobs) < len(req.out_tokens):
                    req.out_logprobs.append(float(lps[i]))

        active = jnp.asarray(
            [[s is not None and not s.done and i not in self._chunking]
             for i, s in enumerate(self.slots)], bool
        )[:, 0]
        # host-side length bucket: attention reads only the live prefix;
        # one decode executable per bucket
        from ..models.sampling import length_bucket

        live = [len(s.prompt) + len(s.out_tokens) + 1
                for s in self.slots if s is not None]
        t_eff = length_bucket(min(max(live, default=1), self.max_len),
                              self.max_len, base=64)
        logits2, self.cache = self._step(
            self.params, self.cache, jnp.asarray(toks), active, t_eff=t_eff
        )
        self._last_logits = logits2

        for i, req in enumerate(self.slots):
            if req is not None and req.done:
                self._finish_slot(req, i)
        return True

    def run(self):
        """Drain all pending/active requests; returns finished list."""
        while self.pending or any(s is not None for s in self.slots):
            self.step_once()
        out, self.finished = self.finished, []
        return sorted(out, key=lambda r: r.id)
