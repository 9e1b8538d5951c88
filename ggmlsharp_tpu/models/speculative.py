"""Speculative decoding: a small draft model proposes k tokens per round,
the target model verifies all of them in ONE batched forward, and the
longest matching prefix (plus the target's own correction token) is
emitted. Greedy-exact: output is bit-identical to plain greedy decode on
the target model alone, but each target dispatch amortizes the full weight
read over up to k+1 tokens — the decisive lever on a bandwidth-bound chip
where b=1 decode reads every weight byte per token (PERFORMANCE.md
roofline). The reference has no decode loop at all (SURVEY §2.6 — no
attention ops); this extends the BASELINE serving surface the TPU-native
way: every round is ONE jitted dispatch (draft chain + verify + accept +
cache rollback fused into a single executable), static shapes throughout.

Cache rollback is O(1): caches mask by per-slot `length` (rows beyond it
are causally masked, models/common.py), so rejecting draft tokens is just
resetting `length` — stale rows are overwritten by the next round's writes
at the same positions.

Invariants at each round start (h = index of the newest emitted token a):
  * target cache holds KV for history[0:h]           (length == h)
  * draft  cache holds KV for history[0:h-1]         (length == h-1)
  * seed == [history[h-1], history[h]]
The 2-token draft seed keeps every round shape-identical (ONE executable)
even when all k drafts are accepted and the draft cache is a full token
behind the bonus-token emission.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import kv_cache as kvc
from .sampling import length_bucket, make_decode_fns


def set_length(cache: kvc.KVCache, length) -> kvc.KVCache:
    """Functional per-slot length reset (speculative rollback). Rows beyond
    `length` stay in the buffers but are masked out of attention and will
    be overwritten by subsequent writes at those positions."""
    return kvc.KVCache(cache.k, cache.v, cache.k_scale, cache.v_scale,
                       jnp.asarray(length, jnp.int32))


def make_spec_round(t_forward, t_cfg, d_forward, d_cfg, k: int):
    """Build the jitted speculative round.

    spec_round(t_params, d_params, t_cache, d_cache, seed[B,2],
               t_eff=, d_eff=) ->
        (emitted [B, k+1] int32 (-1 padded), n_emit [B] int32,
         t_cache, d_cache, seed' [B, 2])

    Emits between 1 (no drafts accepted: the target's own next token) and
    k+1 (all accepted + the bonus token) tokens per slot per round.

    Both forwards must accept `cached_prefix=` (models.gpt2 / models.llama
    do): verify and the seed prefill run at positions > 0, so flat-cache
    attention must read the cache's live prefix, not just this call's K/V.
    """
    if t_cfg.n_vocab != d_cfg.n_vocab:
        raise ValueError(
            f"draft/target vocab mismatch: {d_cfg.n_vocab} vs {t_cfg.n_vocab}")

    @partial(jax.jit, donate_argnums=(2, 3),
             static_argnames=("t_eff", "d_eff"))
    def spec_round(t_params, d_params, t_cache, d_cache, seed,
                   t_eff=None, d_eff=None):
        B = seed.shape[0]
        # --- draft chain: 2-token seed prefill, then k-1 greedy steps ----
        pos = d_cache.length[:, None] + jnp.arange(2, dtype=jnp.int32)[None]
        lg, d_cache = d_forward(d_params, d_cfg, seed, d_cache, pos,
                                prefix_bound=d_eff, cached_prefix=True)
        tok = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)
        drafts = [tok]
        for _ in range(k - 1):
            pos = d_cache.length[:, None]
            lg, d_cache = d_forward(d_params, d_cfg, tok, d_cache, pos,
                                    prefix_bound=d_eff)
            tok = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)
            drafts.append(tok)
        d = jnp.concatenate(drafts, axis=1)  # [B, k]

        # --- verify: ONE target forward over [a, d_1..d_k] ---------------
        a = seed[:, 1:2]
        x = jnp.concatenate([a, d], axis=1)  # [B, k+1]
        pos = t_cache.length[:, None] + \
            jnp.arange(k + 1, dtype=jnp.int32)[None]
        logits, t_cache = t_forward(t_params, t_cfg, x, t_cache, pos,
                                    prefix_bound=t_eff, cached_prefix=True)
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, k+1]

        # --- accept longest matching prefix + correction/bonus token -----
        match = (g[:, :-1] == d).astype(jnp.int32)
        m = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [B] in 0..k
        idx = jnp.arange(k + 1, dtype=jnp.int32)[None]
        gm = jnp.take_along_axis(g, m[:, None], axis=1)  # [B, 1]
        d_pad = jnp.concatenate(
            [d, jnp.zeros((B, 1), jnp.int32)], axis=1)
        emitted = jnp.where(
            idx < m[:, None], d_pad,
            jnp.where(idx == m[:, None], gm, jnp.int32(-1)))
        n_emit = m + 1

        # --- O(1) rollback: reset per-slot lengths ------------------------
        # clamped at 0 so inactive slots (continuous-batching engines run
        # every slot through the round) don't drift to negative lengths
        h_new = jnp.maximum(t_cache.length - (k + 1) + n_emit, 0)  # h+m+1
        t_cache = set_length(t_cache, h_new)
        d_cache = set_length(d_cache, jnp.maximum(h_new - 1, 0))
        seed_next = jnp.concatenate(
            [jnp.take_along_axis(x, m[:, None], axis=1), gm], axis=1)
        return emitted, n_emit, t_cache, d_cache, seed_next

    return spec_round


def speculative_generate(t_forward, t_cfg, t_params,
                         d_forward, d_cfg, d_params,
                         prompt, t_cache, d_cache,
                         n_tokens: int, k: int = 4,
                         temperature: float = 0.0, top_k: int = 0,
                         top_p: float = 1.0, rng=None):
    """Speculative decode. prompt: int32 [B, S] (S >= 1); both caches
    fresh (length 0) with max_len >= S + n_tokens + k + 1 headroom.
    temperature <= 0 (default): greedy-exact — identical to plain greedy
    decode on the target. temperature > 0 (requires rng): rejection-sampled
    speculative sampling, distributed exactly as sampling the target alone
    under the same temperature/top_k/top_p. Returns (tokens [B, n_tokens],
    mean tokens emitted per round per slot in [1, k+1] — the
    target-dispatch amortization factor actually achieved)."""
    B, S = prompt.shape
    sampled = temperature > 0.0
    if sampled and rng is None:
        raise ValueError("temperature > 0 requires an rng key")
    need = S + n_tokens + k + 2
    for c, who in ((t_cache, "target"), (d_cache, "draft")):
        if c.max_len < need:
            raise ValueError(
                f"{who} cache max_len {c.max_len} < {need} needed for "
                f"S={S} + n_tokens={n_tokens} + k={k} headroom")

    t_prefill, _ = make_decode_fns(t_forward, t_cfg)
    d_prefill, _ = make_decode_fns(d_forward, d_cfg)
    if sampled:
        spec_round_s = make_spec_round_sampled(
            t_forward, t_cfg, d_forward, d_cfg, k)
        tv = jnp.full((B,), temperature, jnp.float32)
        kv_ = jnp.full((B,), top_k, jnp.int32)
        pv = jnp.full((B,), top_p, jnp.float32)
        # independent streams: a0's key must not correlate with any
        # round's key (both would otherwise derive from the same split)
        rng, rng_loop = jax.random.split(rng)

        def spec_round(tp, dp, tc, dc, seed, t_eff=None, d_eff=None,
                       _r=[rng_loop]):
            _r[0], sub = jax.random.split(_r[0])
            return spec_round_s(tp, dp, tc, dc, seed, sub, tv, kv_, pv,
                                t_eff=t_eff, d_eff=d_eff)
    else:
        spec_round = make_spec_round(t_forward, t_cfg, d_forward, d_cfg, k)

    logits, t_cache = t_prefill(
        t_params, prompt, t_cache, t_eff=length_bucket(S, t_cache.max_len))
    if sampled:
        rng, sub = jax.random.split(rng)
        from .sampling import sample_token

        # one jitted dispatch (CLAUDE.md: no eager primitives on TPU)
        a0 = jax.jit(lambda l, r: sample_token(
            l, r, temperature, top_k, top_p))(logits, sub)
    else:
        a0 = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
    if S > 1:  # draft holds history[0:S-1]; prompt[-1] rides the seed
        _, d_cache = d_prefill(
            d_params, prompt[:, :-1], d_cache,
            t_eff=length_bucket(S - 1, d_cache.max_len))
    seed = jnp.concatenate([prompt[:, -1:], a0], axis=1)

    a0_host = np.asarray(a0)
    out = [[int(a0_host[b, 0])] for b in range(B)]
    h_max = S  # upper bound on any slot's history length
    rounds = 0
    emitted_total = 0
    while min(len(o) for o in out) < n_tokens:
        t_eff = length_bucket(h_max + k + 2, t_cache.max_len)
        d_eff = length_bucket(h_max + k + 2, d_cache.max_len)
        emitted, n_emit, t_cache, d_cache, seed = spec_round(
            t_params, d_params, t_cache, d_cache, seed,
            t_eff=t_eff, d_eff=d_eff)
        em = np.asarray(emitted)
        ne = np.asarray(n_emit)
        for b in range(B):
            out[b].extend(int(t) for t in em[b, : ne[b]])
        h_max += int(ne.max())
        rounds += 1
        emitted_total += int(ne.sum())
    toks = np.stack([o[:n_tokens] for o in out]).astype(np.int32)
    return jnp.asarray(toks), emitted_total / max(1, rounds * B)


def _mod_probs(logits, temp, top_k, top_p):
    """Per-slot modified sampling distribution [B, V] under traced
    temperature/top-k/top-p vectors [B] — the distribution `sample_token`
    samples from. temp <= 0 degenerates to the one-hot argmax (so greedy
    slots ride the same executable and rejection sampling reduces exactly
    to greedy prefix matching)."""
    V = logits.shape[-1]
    greedy = temp <= 0.0
    l = logits / jnp.where(greedy, 1.0, temp)[:, None]
    order = jnp.argsort(-l, axis=-1)
    sl = jnp.take_along_axis(l, order, axis=-1)
    keff = jnp.clip(jnp.where(top_k > 0, top_k, V), 1, V)[:, None]
    kth = jnp.take_along_axis(sl, keff - 1, axis=-1)  # [B, 1]
    sl = jnp.where(sl < kth, -jnp.inf, sl)
    # nucleus: smallest prefix of the sorted probs reaching top_p
    ps = jax.nn.softmax(sl, axis=-1)
    keep_sorted = (jnp.cumsum(ps, axis=-1) - ps) < top_p[:, None]
    inv = jnp.argsort(order, axis=-1)
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    l = jnp.where(keep & (l >= kth), l, -jnp.inf)
    p = jax.nn.softmax(l, axis=-1)
    g = jax.nn.one_hot(jnp.argmax(logits, axis=-1), V, dtype=p.dtype)
    return jnp.where(greedy[:, None], g, p)


def make_spec_round_sampled(t_forward, t_cfg, d_forward, d_cfg, k: int):
    """Sampled speculative round: standard rejection sampling (Leviathan/
    Chen speculative sampling) — draft SAMPLES k tokens from its modified
    distribution q_i, target computes p_i in one forward, token i accepts
    with prob min(1, p_i[d_i]/q_i[d_i]), the first rejection emits a sample
    from norm(max(p_i - q_i, 0)), and a fully-accepted chain emits a bonus
    sample from p_{k+1}. The emitted stream is distributed EXACTLY as
    sampling the target alone; temp<=0 slots degenerate to the greedy round
    (one-hot distributions make acceptance == argmax match).

    spec_round(t_params, d_params, t_cache, d_cache, seed[B,2], rng,
               temp[B], top_k[B], top_p[B], t_eff=, d_eff=) ->
        (emitted [B, k+1] (-1 padded), n_emit [B], t_cache, d_cache,
         seed' [B, 2])
    """
    if t_cfg.n_vocab != d_cfg.n_vocab:
        raise ValueError(
            f"draft/target vocab mismatch: {d_cfg.n_vocab} vs {t_cfg.n_vocab}")

    @partial(jax.jit, donate_argnums=(2, 3),
             static_argnames=("t_eff", "d_eff"))
    def spec_round(t_params, d_params, t_cache, d_cache, seed, rng,
                   temp, top_k, top_p, t_eff=None, d_eff=None):
        B = seed.shape[0]

        def sample(key, probs):  # categorical over a prob vector batch
            return jax.random.categorical(
                key, jnp.log(jnp.maximum(probs, 1e-30)), axis=-1
            ).astype(jnp.int32)

        # --- draft chain: sample each proposal, keep its q_i -------------
        pos = d_cache.length[:, None] + jnp.arange(2, dtype=jnp.int32)[None]
        lg, d_cache = d_forward(d_params, d_cfg, seed, d_cache, pos,
                                prefix_bound=d_eff, cached_prefix=True)
        qs, drafts = [], []
        tok = None
        for i in range(k):
            if i > 0:
                pos = d_cache.length[:, None]
                lg, d_cache = d_forward(d_params, d_cfg, tok, d_cache, pos,
                                        prefix_bound=d_eff)
            q = _mod_probs(lg[:, -1, :].astype(jnp.float32),
                           temp, top_k, top_p)
            tok = sample(jax.random.fold_in(rng, i), q)[:, None]
            qs.append(q)
            drafts.append(tok)
        d = jnp.concatenate(drafts, axis=1)        # [B, k]
        q_all = jnp.stack(qs, axis=1)              # [B, k, V]

        # --- verify: ONE target forward over [a, d_1..d_k] ---------------
        a = seed[:, 1:2]
        x = jnp.concatenate([a, d], axis=1)
        pos = t_cache.length[:, None] + \
            jnp.arange(k + 1, dtype=jnp.int32)[None]
        logits, t_cache = t_forward(t_params, t_cfg, x, t_cache, pos,
                                    prefix_bound=t_eff, cached_prefix=True)
        V = logits.shape[-1]
        flat = _mod_probs(
            logits.astype(jnp.float32).reshape(B * (k + 1), V),
            jnp.repeat(temp, k + 1), jnp.repeat(top_k, k + 1),
            jnp.repeat(top_p, k + 1))
        p_all = flat.reshape(B, k + 1, V)          # [B, k+1, V]

        # --- rejection sampling accept/correct ----------------------------
        p_d = jnp.take_along_axis(p_all[:, :k, :], d[..., None],
                                  axis=-1)[..., 0]           # [B, k]
        q_d = jnp.take_along_axis(q_all, d[..., None], axis=-1)[..., 0]
        u = jax.random.uniform(jax.random.fold_in(rng, 1000), (B, k))
        accept = (u * q_d < p_d).astype(jnp.int32)
        m = jnp.sum(jnp.cumprod(accept, axis=1), axis=1)     # [B] in 0..k
        # residual at the first rejection (or the bonus row when m == k,
        # where q is zero-padded so the residual IS p_{k+1})
        q_pad = jnp.concatenate(
            [q_all, jnp.zeros((B, 1, V), q_all.dtype)], axis=1)
        p_m = jnp.take_along_axis(
            p_all, m[:, None, None], axis=1)[:, 0, :]
        q_m = jnp.take_along_axis(
            q_pad, m[:, None, None], axis=1)[:, 0, :]
        res = jnp.maximum(p_m - q_m, 0.0)
        # numerically-empty residual (p == q) → sample p directly
        res = jnp.where(jnp.sum(res, -1, keepdims=True) > 0, res, p_m)
        gm = sample(jax.random.fold_in(rng, 2000), res)[:, None]

        idx = jnp.arange(k + 1, dtype=jnp.int32)[None]
        d_pad = jnp.concatenate([d, jnp.zeros((B, 1), jnp.int32)], axis=1)
        emitted = jnp.where(
            idx < m[:, None], d_pad,
            jnp.where(idx == m[:, None], gm, jnp.int32(-1)))
        n_emit = m + 1

        h_new = jnp.maximum(t_cache.length - (k + 1) + n_emit, 0)
        t_cache = set_length(t_cache, h_new)
        d_cache = set_length(d_cache, jnp.maximum(h_new - 1, 0))
        seed_next = jnp.concatenate(
            [jnp.take_along_axis(x, m[:, None], axis=1), gm], axis=1)
        return emitted, n_emit, t_cache, d_cache, seed_next

    return spec_round
