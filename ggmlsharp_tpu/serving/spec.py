"""Speculative continuous batching — the Engine's draft/verify machinery
(models.speculative composed with slot admission): one propose/verify round
per tick across all live slots, greedy-exact (and rejection-sampled for
temperature>0 slots), chunked spec prefill. Split from engine.py (r4) —
the mixin only runs when Engine(draft_forward=...) enables spec mode."""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models import kv_cache as kvc
from .common import _bucket, _stopped


class SpecServingMixin:
    def _validate_spec_cap(self, req: Request) -> bool:
        """Cap max_new_tokens to the speculative headroom (verify writes
        k+1 rows past the current history every round); reject prompts that
        leave none."""
        cap = self.max_len - len(req.prompt) - self.spec_k - 2
        if cap <= 0:
            self._reject(req, f"prompt length {len(req.prompt)} leaves no "
                         f"speculative headroom (k={self.spec_k}, "
                         f"max_len={self.max_len})")
            return False
        req.max_new_tokens = min(req.max_new_tokens, cap)
        return True

    def _admit_spec(self, req: Request, slot: int):
        """Speculative admission: target prefill (emits the first token a0
        host-side), draft prefill of prompt[:-1], per-slot seed =
        [prompt[-1], a0] (the models.speculative round invariant). With a
        registered prefix, both models' stored rows are installed and only
        the suffix is prefilled (the draft one token short)."""
        if req.repeat_penalty != 1.0 or req.want_logprobs:
            self._reject(req, "speculative engine supports temperature/"
                         "top_k/top_p but not repeat_penalty/want_logprobs")
            return
        pfx = None
        if req.prefix_id is not None:
            pfx = self._prefixes.get(req.prefix_id)
            if pfx is None:
                self._reject(req, f"unknown prefix_id {req.prefix_id}")
                return
            if req.prompt[: pfx["plen"]] != pfx["tokens"]:
                self._reject(req, "prompt does not start with prefix")
                return
        if not self._validate_spec_cap(req):
            return
        self.slots[slot] = req
        if pfx is not None:
            plen = pfx["plen"]
            suffix = req.prompt[plen:]
            self._install_prefix(pfx["t"], plen, slot, plen)
            if suffix:
                self._prefill_slot(req, slot, tokens=suffix, start=plen)
            else:  # prompt == prefix: stored last logits are the sampler row
                self._last_logits = self._last_logits.at[slot].set(
                    pfx["t"]["last"])
            if req.temperature > 0:
                fn, _ = self._slot_sampler(req)
                self._rng, sub = jax.random.split(self._rng)
                a0 = int(np.asarray(fn(
                    self._last_logits, jnp.int32(slot), sub)))
            else:
                a0 = int(np.asarray(self._argmax(self._last_logits))[slot])
            # draft holds history[0:P-1]: prefix rows, minus the last
            # token when the prompt IS the prefix
            self._install_prefix(pfx["d"], plen, slot,
                                 plen if suffix else plen - 1, draft=True)
            if len(suffix) > 1:
                self._prefill_slot(req, slot, tokens=suffix[:-1],
                                   start=plen, draft=True)
            self._emit(req, a0)
            if _stopped(req) or \
                    len(req.out_tokens) >= req.max_new_tokens:
                self._finish_slot(req, slot)
                return
            self._seed[slot] = (req.prompt[-1], a0)
            return
        # plain (no-prefix) spec admissions never reach here — _admit
        # batches them through _admit_spec_batch
        raise AssertionError("unreachable: plain spec admission")

    def _advance_spec_chunks(self):
        """One chunk per chunking spec slot per tick: target chunks, then
        draft chunks of prompt[:-1], then finalize (first token + seed —
        the round invariants from _admit_spec_batch)."""
        for i, (phase, pos) in list(self._spec_chunking.items()):
            req = self.slots[i]
            if req is None or req.done:  # cancelled mid-prefill
                del self._spec_chunking[i]
                continue
            if phase == "t":
                chunk = req.prompt[pos : pos + self.prefill_chunk]
                self._prefill_slot(req, i, tokens=chunk, start=pos)
                pos += len(chunk)
                if pos < len(req.prompt):
                    self._spec_chunking[i] = ("t", pos)
                    continue
                phase, pos = ("d", 0) if len(req.prompt) > 1 else ("f", 0)
            if phase == "d":
                dtoks = req.prompt[:-1]
                chunk = dtoks[pos : pos + self.prefill_chunk]
                self._prefill_slot(req, i, tokens=chunk, start=pos,
                                   draft=True)
                pos += len(chunk)
                if pos < len(dtoks):
                    self._spec_chunking[i] = ("d", pos)
                    continue
            # finalize: draft prefills never touch _last_logits, so the
            # slot row still holds the last TARGET chunk's logits. Re-pin
            # both cache lengths absolutely: rounds that ran during the
            # draft phase drift the (garbage) lengths of chunking slots
            P = len(req.prompt)
            self.cache = kvc.KVCache(
                self.cache.k, self.cache.v, self.cache.k_scale,
                self.cache.v_scale, self.cache.length.at[i].set(P))
            self.d_cache = kvc.KVCache(
                self.d_cache.k, self.d_cache.v, self.d_cache.k_scale,
                self.d_cache.v_scale, self.d_cache.length.at[i].set(P - 1))
            del self._spec_chunking[i]
            if req.temperature > 0:
                fn, _ = self._slot_sampler(req)
                self._rng, sub = jax.random.split(self._rng)
                a0 = int(np.asarray(fn(
                    self._last_logits, jnp.int32(i), sub)))
            else:
                a0 = int(np.asarray(self._argmax(self._last_logits))[i])
            self._emit(req, a0)
            if _stopped(req) or len(req.out_tokens) >= req.max_new_tokens:
                self._finish_slot(req, i)
                continue
            self._seed[i] = (req.prompt[-1], a0)

    def _spec_tick(self) -> bool:
        """One speculative engine tick: ONE draft-chain + verify round for
        all live slots; each emits 1..k+1 tokens (per-slot accept counts).
        Chunking slots advance one prefill chunk instead and sit out the
        round (their cache rows past the chunk boundary are garbage the
        next chunk/round overwrites — the length-masking design)."""
        from ..models.sampling import length_bucket

        for i, req in enumerate(self.slots):  # externally-cancelled slots
            if req is not None and req.done:
                self._finish_slot(req, i)
        if self._spec_chunking:
            self._advance_spec_chunks()
        live = [r for i, r in enumerate(self.slots)
                if r is not None and i not in self._spec_chunking]
        if not live:
            return bool(self._spec_chunking)
        hmax = max(len(r.prompt) + len(r.out_tokens) for r in live)
        t_eff = length_bucket(min(hmax + self.spec_k + 2, self.max_len),
                              self.max_len, base=64)
        if any(r is not None and r.temperature > 0 for r in self.slots):
            # rejection-sampled round: per-slot traced sampling params;
            # greedy slots ride along with temp 0 (one-hot distributions
            # degenerate to exact greedy prefix matching)
            if self._spec_round_sampled is None:
                from ..models.speculative import make_spec_round_sampled

                self._spec_round_sampled = make_spec_round_sampled(
                    self.forward, self.cfg, self.d_forward, self.d_cfg,
                    self.spec_k)
            temp = np.zeros((self.B,), np.float32)
            topk = np.zeros((self.B,), np.int32)
            topp = np.ones((self.B,), np.float32)
            for i, r in enumerate(self.slots):
                if r is not None and r.temperature > 0:
                    temp[i], topk[i], topp[i] = (r.temperature, r.top_k,
                                                 r.top_p)
            self._rng, sub = jax.random.split(self._rng)
            emitted, n_emit, self.cache, self.d_cache, seed = \
                self._spec_round_sampled(
                    self.params, self.d_params, self.cache, self.d_cache,
                    jnp.asarray(self._seed), sub, jnp.asarray(temp),
                    jnp.asarray(topk), jnp.asarray(topp),
                    t_eff=t_eff, d_eff=t_eff)
        else:
            emitted, n_emit, self.cache, self.d_cache, seed = \
                self._spec_round(
                    self.params, self.d_params, self.cache, self.d_cache,
                    jnp.asarray(self._seed), t_eff=t_eff, d_eff=t_eff)
        em, ne = np.asarray(emitted), np.asarray(n_emit)
        self._seed = np.array(seed)  # writable copy — admits update rows
        for i, req in enumerate(self.slots):
            if req is None or i in self._spec_chunking:
                continue
            for j in range(int(ne[i])):
                tok = int(em[i, j])
                self._emit(req, tok)
                if _stopped(req) or \
                        len(req.out_tokens) >= req.max_new_tokens:
                    req.done = True
                    break
            if req.done:
                self._finish_slot(req, i)
        return True

    # --- host loop -------------------------------------------------------
    def _admit_spec_batch(self, admits: list):
        """Batched speculative admission: ONE grouped target prefill for
        the burst, one fused argmax for every first token, then ONE grouped
        draft prefill of the prompts[:-1] (the models.speculative round
        invariant: draft holds history[0:P-1])."""
        self._prefill_group(admits)
        gtoks = np.asarray(self._argmax(self._last_logits))
        drafts = []
        for req, slot in admits:
            if req.temperature > 0:
                fn, _ = self._slot_sampler(req)
                self._rng, sub = jax.random.split(self._rng)
                a0 = int(np.asarray(fn(
                    self._last_logits, jnp.int32(slot), sub)))
            else:
                a0 = int(gtoks[slot])
            self._emit(req, a0)
            if _stopped(req) or \
                    len(req.out_tokens) >= req.max_new_tokens:
                self._finish_slot(req, slot)
                continue
            self._seed[slot] = (req.prompt[-1], a0)
            if len(req.prompt) > 1:
                drafts.append((req, slot))
        if drafts:
            self._prefill_group(drafts, draft=True,
                                tokens_of=lambda r: r.prompt[:-1])

