"""Slot admission — bucketed single and batched-burst prefill (one weight
pass per same-bucket admission group), chunked prefill for long prompts,
and the per-tick admission policy. Split from engine.py (r4)."""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models import kv_cache as kvc
from .common import _bucket


class AdmissionMixin:
    def _prefill_slot(self, req: Request, slot: int, tokens=None,
                      start: int = 0, draft: bool = False):
        """Prefill `tokens` (default: req.prompt) into the slot's cache rows
        starting at row `start` (non-zero when a registered prefix was just
        installed — positions and the final slot length are offset by it).
        draft=True targets the speculative draft model's cache."""
        tokens = req.prompt if tokens is None else tokens
        n = len(tokens)
        # cap so the bucketed update always fits the cache rows FROM
        # `start`: dynamic_update_slice would otherwise clamp the write
        # start backwards over the installed prefix tail (admission
        # guarantees start + n < max_len, so the cap stays >= n)
        bucket = min(_bucket(n), self.max_len - start)
        # static live-prefix bound covering installed prefix + this prompt
        total = min(_bucket(start + bucket), self.max_len)
        # non-zero start → queries must attend the installed prefix rows
        # (flat caches would otherwise flash over fresh K/V only)
        cached = start > 0 or None
        key = (bucket, total, cached, draft)
        if key not in self._compiled_prefill:
            fwd = self.d_forward if draft else self.forward
            cfg = self.d_cfg if draft else self.cfg

            # slot AND start are TRACED arguments (dynamic_slice accepts
            # traced starts) → exactly one prefill executable per
            # (length bucket, total bound); making them static would
            # multiply warmup compiles by batch_slots × prefix lengths
            # (each remote TPU compile takes minutes).
            @partial(jax.jit, donate_argnums=(1,))
            def prefill(params, cache, tokens, n_real, slot, start):
                def _slice(t):
                    return None if t is None else tuple(
                        jax.lax.dynamic_slice_in_dim(x, slot, 1, axis=0)
                        for x in t
                    )

                def _unslice(t, sub):
                    return None if t is None else tuple(
                        jax.lax.dynamic_update_slice_in_dim(x, sx, slot, axis=0)
                        for x, sx in zip(t, sub)
                    )

                sub = kvc.KVCache(
                    _slice(cache.k), _slice(cache.v),
                    _slice(cache.k_scale), _slice(cache.v_scale),
                    jnp.zeros((1,), jnp.int32),
                )
                positions = (start
                             + jnp.arange(tokens.shape[1], dtype=jnp.int32)[None])
                # `total` is static per compiled prefill → static prefix;
                # queries at positions ≥ start attend the installed prefix
                # rows below them (mask is kpos <= position)
                logits, sub2 = fwd(params, cfg, tokens, sub, positions,
                                   prefix_bound=total, cached_prefix=cached)
                cache = kvc.KVCache(
                    _unslice(cache.k, sub2.k), _unslice(cache.v, sub2.v),
                    _unslice(cache.k_scale, sub2.k_scale),
                    _unslice(cache.v_scale, sub2.v_scale),
                    cache.length.at[slot].set(start + n_real),
                )
                last = jnp.take_along_axis(
                    logits, (n_real - 1)[None, None, None], axis=1
                )[:, 0, :]
                return last, cache

            self._compiled_prefill[key] = prefill
        prefill = self._compiled_prefill[key]
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = tokens
        params = self.d_params if draft else self.params
        cache = self.d_cache if draft else self.cache
        self._n_prefills += 1
        last, cache = prefill(
            params, cache, jnp.asarray(toks), jnp.int32(n),
            jnp.int32(slot), jnp.int32(start),
        )
        if draft:
            self.d_cache = cache
        else:
            self.cache = cache
            self._last_logits = self._last_logits.at[slot].set(last[0])

    # --- prefix caching ----------------------------------------------------
    def _make_prefill_many(self, bucket: int, G: int, draft: bool = False,
                           full: bool = False):
        """One executable prefilling G same-bucket prompts in ONE forward —
        one weight pass serves the whole admission burst instead of one
        pass per request. Slot rows, real lengths, and last-logit rows are
        scattered by traced index vectors; padded duplicate rows (same
        slot, same values) make the scatter idempotent. full=True: the
        burst covers slots [0..B) in order (G == B) — the install becomes a
        STATIC slice update (in-place under donation) instead of a general
        scatter, which XLA rewrites as a whole-buffer pass over the
        max_len-sized cache (scripts/diag_kv.py r4)."""
        fwd = self.d_forward if draft else self.forward
        cfg = self.d_cfg if draft else self.cfg
        ref_cache = self.d_cache if draft else self.cache
        n_head_kv = getattr(cfg, "n_head_kv", cfg.n_head)
        flat = ref_cache.k[0].ndim == 3
        int8 = ref_cache.k_scale is not None
        dtype = ref_cache.k[0].dtype
        head_dim = cfg.head_dim

        @partial(jax.jit, donate_argnums=(1,))
        def prefill_many(params, cache, tokens, n_real, slots, last_logits):
            # scratch cache sized to the bucket (not max_len): the only
            # rows written/scattered are [:bucket]
            sub = kvc.init_cache(cfg.n_layer, G, n_head_kv, bucket,
                                 head_dim, dtype=dtype, int8=int8, flat=flat)
            positions = jnp.broadcast_to(
                jnp.arange(bucket, dtype=jnp.int32)[None], (G, bucket))
            logits, sub2 = fwd(params, cfg, tokens, sub, positions,
                               prefix_bound=bucket)

            def scatter(bufs, subs):
                if bufs is None:
                    return None
                out = []
                for x, s in zip(bufs, subs):
                    if x.ndim == 3:  # flat [B, T, E] (time axis 1)
                        if full:
                            out.append(x.at[:, :bucket].set(
                                s[:, :bucket].astype(x.dtype)))
                        else:
                            out.append(x.at[slots, :bucket].set(
                                s[:, :bucket].astype(x.dtype)))
                    else:  # head-major [B, H, T, D] (time axis 2)
                        if full:
                            out.append(x.at[:, :, :bucket].set(
                                s[:, :, :bucket].astype(x.dtype)))
                        else:
                            out.append(x.at[slots, :, :bucket].set(
                                s[:, :, :bucket].astype(x.dtype)))
                return tuple(out)

            cache = kvc.KVCache(
                scatter(cache.k, sub2.k), scatter(cache.v, sub2.v),
                scatter(cache.k_scale, sub2.k_scale),
                scatter(cache.v_scale, sub2.v_scale),
                n_real if full else cache.length.at[slots].set(n_real),
            )
            last = jnp.take_along_axis(
                logits, (n_real - 1)[:, None, None], axis=1)[:, 0, :]
            if draft:  # draft logits are never sampled from
                return last_logits, cache
            return (last if full
                    else last_logits.at[slots].set(last)), cache

        return prefill_many

    def _prefill_group(self, admits: list, draft: bool = False,
                       tokens_of=None):
        """Prefill a tick's plain admissions, same-bucket ones batched into
        one dispatch (group size padded to a power of two ≤ batch_slots so
        compile count stays at buckets × log2(B)). draft=True prefills the
        speculative draft model's cache (tokens_of selects the per-request
        token list, e.g. prompt[:-1]); its logits are discarded."""
        from collections import defaultdict

        tokens_of = tokens_of or (lambda r: r.prompt)
        groups = defaultdict(list)
        for req, slot in admits:
            groups[min(_bucket(len(tokens_of(req))), self.max_len)].append(
                (req, slot))
        for bucket, grp in groups.items():
            if len(grp) == 1:
                req, slot = grp[0]
                self._prefill_slot(req, slot, tokens=tokens_of(req),
                                   draft=draft)
                continue
            G = 1
            while G < len(grp):
                G *= 2
            G = min(G, self.B)
            # full burst (every slot, one admission wave): static in-place
            # install — sort rows by slot so row i IS slot i
            full = (len(grp) == self.B
                    and sorted(s for _, s in grp) == list(range(self.B)))
            if full:
                grp = sorted(grp, key=lambda rs: rs[1])
            padded = grp + [grp[-1]] * (G - len(grp))
            key = ("many", bucket, G, draft, full)
            fn = self._compiled_prefill.get(key)
            if fn is None:
                fn = self._make_prefill_many(bucket, G, draft, full)
                self._compiled_prefill[key] = fn
            toks = np.zeros((G, bucket), np.int32)
            n_real = np.zeros((G,), np.int32)
            slots = np.zeros((G,), np.int32)
            for j, (req, slot) in enumerate(padded):
                t = tokens_of(req)
                toks[j, : len(t)] = t
                n_real[j] = len(t)
                slots[j] = slot
            self._n_prefills += 1
            params = self.d_params if draft else self.params
            cache = self.d_cache if draft else self.cache
            last, cache = fn(
                params, cache, jnp.asarray(toks),
                jnp.asarray(n_real), jnp.asarray(slots), self._last_logits)
            if draft:
                self.d_cache = cache
            else:
                self._last_logits, self.cache = last, cache

    def _admit(self):
        plain, spec_plain = [], []
        for i in range(self.B):
            while self.slots[i] is None and self.pending:
                req = self.pending.pop(0)
                if len(req.prompt) >= self.max_len:
                    # would overflow the cache inside the jitted prefill —
                    # reject up front (caller sees done=True, no tokens)
                    self._reject(req, f"prompt length {len(req.prompt)} "
                                 f">= max_len {self.max_len}")
                    continue
                if len(req.prompt) + req.max_new_tokens > self.max_len:
                    req.max_new_tokens = self.max_len - len(req.prompt)
                if self.spec:
                    if (req.prefix_id is not None
                            or req.repeat_penalty != 1.0
                            or req.want_logprobs):
                        # rejection + prefix paths stay per-slot
                        self._admit_spec(req, i)
                    elif self._validate_spec_cap(req):
                        self.slots[i] = req
                        if (self.prefill_chunk
                                and len(req.prompt) > self.prefill_chunk):
                            self._spec_chunking[i] = ("t", 0)
                        else:
                            spec_plain.append((req, i))
                    continue
                if req.prefix_id is not None:
                    pfx = self._prefixes.get(req.prefix_id)
                    if pfx is None:
                        self._reject(req,
                                     f"unknown prefix_id {req.prefix_id}")
                        continue
                    plen = pfx["plen"]
                    if req.prompt[:plen] != pfx["tokens"]:
                        self._reject(req, "prompt does not start with prefix")
                        continue
                    self.slots[i] = req
                    self._install_prefix(pfx["t"], plen, i, plen)
                    suffix = req.prompt[plen:]
                    if (suffix and self.prefill_chunk
                            and len(suffix) > self.prefill_chunk):
                        self._chunking[i] = plen  # chunk the suffix
                    elif suffix:
                        self._prefill_slot(req, i, tokens=suffix, start=plen)
                    else:  # prompt == prefix: reuse its stored last logits
                        self._last_logits = self._last_logits.at[i].set(
                            pfx["t"]["last"])
                    continue
                self.slots[i] = req
                if (self.prefill_chunk
                        and len(req.prompt) > self.prefill_chunk):
                    self._chunking[i] = 0  # chunked prefill, one per tick
                else:
                    plain.append((req, i))
                break  # slot filled; prefill happens batched below
        if plain:
            self._prefill_group(plain)
        if spec_plain:
            self._admit_spec_batch(spec_plain)

    def _advance_chunks(self):
        """Prefill ONE chunk per chunking slot per tick; a slot joins
        decode the tick after its last chunk lands."""
        for i, pos in list(self._chunking.items()):
            req = self.slots[i]
            if req is None or req.done:  # cancelled mid-prefill
                del self._chunking[i]
                continue
            chunk = req.prompt[pos : pos + self.prefill_chunk]
            self._prefill_slot(req, i, tokens=chunk, start=pos)
            pos += len(chunk)
            if pos >= len(req.prompt):
                del self._chunking[i]  # _last_logits[i] now holds the end
            else:
                self._chunking[i] = pos

