"""Decode loops: prefill + greedy/temperature sampling over a KV cache.

Static-shape, donation-friendly: one jitted `step` reused for every decode
token; prefill is one jitted call over the prompt. Works with any model
module exposing forward(params, cfg, tokens, cache, positions).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def length_bucket(n: int, max_len: int, base: int = 256) -> int:
    """Host-side length bucket: smallest geometric chunk bucket ≥ n (see
    common._chunk_buckets). Passing this as the static `t_eff` of the decode
    fns gives one executable per bucket with ZERO in-graph control flow —
    attention reads only the first `t_eff` cache rows. `base` sets the
    smallest bucket: the serving engine uses 64 (short-prompt ticks pay
    64-row cache reads instead of 256 at the cost of two extra
    executables); b=1 decode keeps 256."""
    from .common import _chunk_buckets

    for b in _chunk_buckets(max_len, base=base):
        if n <= b:
            return b
    return max_len


def make_decode_fns(forward, cfg):
    """Returns (prefill, step) jitted functions.

    prefill(params, tokens[B,S], cache, t_eff=None) -> (last_logits, cache)
    step(params, token[B,1], cache, t_eff=None) -> (logits [B,V], cache)
    (cache donated). t_eff: optional STATIC live-prefix bound — compute it
    host-side with `length_bucket(cur_len + S, cache.max_len)`; None keeps
    the in-graph bucket switch (one executable total, a bit slower/step).
    """

    @partial(jax.jit, donate_argnums=(2,), static_argnames=("t_eff",))
    def prefill(params, tokens, cache, t_eff=None):
        B, S = tokens.shape
        positions = cache.length[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        logits, cache = forward(params, cfg, tokens, cache, positions,
                                prefix_bound=t_eff)
        return logits[:, -1, :], cache

    @partial(jax.jit, donate_argnums=(2,), static_argnames=("t_eff",))
    def step(params, token, cache, t_eff=None):
        positions = cache.length[:, None]
        logits, cache = forward(params, cfg, token, cache, positions,
                                prefix_bound=t_eff)
        return logits[:, -1, :], cache

    return prefill, step


def make_greedy_step(forward, cfg):
    """Fused decode step for greedy loops: samples argmax INSIDE the jit so a
    host-driven loop costs one dispatch per token instead of two."""

    @partial(jax.jit, donate_argnums=(2,), static_argnames=("t_eff",))
    def greedy_step(params, token, cache, t_eff=None):
        positions = cache.length[:, None]
        logits, cache = forward(params, cfg, token, cache, positions,
                                prefix_bound=t_eff)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1, keepdims=True).astype(jnp.int32)
        return nxt, cache

    return greedy_step


def apply_repeat_penalty(logits, recent_tokens, penalty: float):
    """CTRL-style repetition penalty over the recent-token window
    (llama.cpp-era semantics: positive logits of seen tokens divide by
    `penalty`, negative multiply). recent_tokens: int32 [B, N], -1 = pad."""
    V = logits.shape[-1]
    ids = jnp.clip(recent_tokens, 0, V - 1)
    valid = recent_tokens >= 0
    hit = jax.vmap(
        lambda i, v: jnp.zeros((V,), bool).at[i].max(v)
    )(ids, valid)
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(hit, pen, logits)


def sample_token(logits, rng=None, temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, repeat_penalty: float = 1.0,
                 recent_tokens=None):
    """logits [B, V] → token [B, 1]. The llama.cpp-era sampler stack:
    repetition penalty over `recent_tokens`, top-k then nucleus top-p
    truncation, temperature sampling. temperature <= 0 is greedy argmax
    (over the penalized logits, so penalty still steers greedy decode)."""
    if repeat_penalty != 1.0 and recent_tokens is not None:
        logits = apply_repeat_penalty(logits, recent_tokens, repeat_penalty)
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -1e30, logits)
    if top_p < 1.0:
        order = jnp.argsort(-logits, axis=-1)
        sl = jnp.take_along_axis(logits, order, axis=-1)
        probs = jax.nn.softmax(sl, axis=-1)
        # keep the smallest prefix whose mass reaches top_p (the first
        # token always survives: exclusive cumsum is 0 there)
        keep = (jnp.cumsum(probs, axis=-1) - probs) < top_p
        sl = jnp.where(keep, sl, -1e30)
        inv = jnp.argsort(order, axis=-1)
        logits = jnp.take_along_axis(sl, inv, axis=-1)
    return jax.random.categorical(rng, logits, axis=-1)[:, None].astype(jnp.int32)


def generate(forward, cfg, params, prompt, cache, n_tokens: int,
             temperature: float = 0.0, top_k: int = 0, rng=None,
             echo_logits: bool = False, top_p: float = 1.0,
             repeat_penalty: float = 1.0, repeat_last_n: int = 64):
    """Host-driven decode: prefill once, then n_tokens single-token steps.

    prompt: int32 [B, S]. Returns (tokens [B, n_tokens], cache)."""
    prefill, step = make_decode_fns(forward, cfg)
    T = cache.max_len
    # host-tracked upper bound on the live prefix (one tiny fetch up front)
    cur = prompt.shape[1] + int(np.max(jax.device_get(cache.length)))
    logits, cache = prefill(params, prompt, cache,
                            t_eff=length_bucket(cur, T))
    out = []
    tok = None
    history = np.asarray(prompt, np.int32)  # [B, S], grows per step
    for i in range(n_tokens):
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        penalize = repeat_penalty != 1.0 and repeat_last_n > 0
        recent = _recent_window(history, repeat_last_n) if penalize else None
        tok = sample_token(logits, sub, temperature, top_k, top_p,
                           repeat_penalty if penalize else 1.0, recent)
        out.append(tok)
        if penalize:
            history = np.concatenate(
                [history, np.asarray(tok, np.int32)], axis=1)
        cur += 1
        logits, cache = step(params, tok, cache,
                             t_eff=length_bucket(cur, T))
    return jnp.concatenate(out, axis=1), cache


def _recent_window(history, repeat_last_n: int):
    """Last `repeat_last_n` tokens of [B, S] history, -1-padded on the left
    to a FIXED width so the sampler compiles once per window size.
    repeat_last_n <= 0 means 'penalty off' (llama.cpp semantics) — callers
    must not reach here with it; guard against the -0: full-slice trap."""
    if repeat_last_n <= 0:
        raise ValueError("repeat_last_n must be positive")
    recent = history[:, -repeat_last_n:]
    if recent.shape[1] < repeat_last_n:
        pad = np.full((recent.shape[0], repeat_last_n - recent.shape[1]),
                      -1, np.int32)
        recent = np.concatenate([pad, recent], axis=1)
    return jnp.asarray(recent)


def generate_scan(forward, cfg, params, prompt, cache, n_tokens: int,
                  temperature: float = 0.0, top_k: int = 0,
                  top_p: float = 1.0, rng=None):
    """Fully-jitted decode: ONE dispatch for the whole generation, greedy
    by default, temperature/top-k/top-p sampling in-loop when rng is given.

    Round-1's lax.scan form made XLA copy the scan-carried KV cache every
    step (~300 ms/tok on GPT-2 124M vs 0.9 ms host loop — the pallas
    custom-calls in the body defeated the scan carry's buffer aliasing).
    This is the lax.while_loop formulation: while-loop carries get strict
    input/output buffer aliasing (XLA requires the loop state in-place), so
    the per-layer cache buffers are updated in place across steps; tokens
    land in a preallocated [B, n_tokens] buffer."""
    prefill, _ = make_decode_fns(forward, cfg)
    B = prompt.shape[0]
    sampled = temperature > 0.0
    if sampled and rng is None:
        raise ValueError("temperature > 0 requires an rng key")
    if not sampled:
        rng = jax.random.PRNGKey(0)  # unused; keeps the carry static

    @jax.jit
    def run(params, prompt, cache, rng):
        logits, cache = prefill(params, prompt, cache)
        toks0 = jnp.zeros((B, n_tokens), jnp.int32)

        def cond(c):
            return c[0] < n_tokens

        def body(c):
            i, logits, cache, toks, key = c
            if sampled:
                key, sub = jax.random.split(key)
                tok = sample_token(logits, sub, temperature, top_k, top_p)
            else:
                tok = jnp.argmax(
                    logits, axis=-1, keepdims=True).astype(jnp.int32)
            toks = jax.lax.dynamic_update_slice(toks, tok, (0, i))
            positions = cache.length[:, None]
            lg, cache = forward(params, cfg, tok, cache, positions)
            return i + 1, lg[:, -1, :], cache, toks, key

        _, logits, cache, toks, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), logits, cache, toks0, rng)
        )
        return toks, cache  # [B, n_tokens]

    return run(params, prompt, cache, rng)
