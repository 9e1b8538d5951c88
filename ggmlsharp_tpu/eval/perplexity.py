"""Perplexity + quantization-quality evaluation (BASELINE config 2: ppl of
quantized vs FP32 at the same bit-width; target Δppl < 0.1 vs ggml).

`perplexity(forward, cfg, params, tokens)` is the llama.cpp-style sliding
evaluation: chunk the token stream into n_ctx windows, score next-token NLL
over the second half of each window, report exp(mean NLL).

This sandbox has no network, so WikiText-2 and pretrained checkpoints are
unavailable; `quantization_quality` measures the same degradation axis
without external data: Δppl and mean KL between a model and its quantized
version over text sampled from the fp32 model itself (self-perplexity).
The absolute ppl is meaningless for random weights, but the DELTA under
quantization is exactly the quantity BASELINE bounds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _nll_chunk(forward, cfg, params, chunk):
    """chunk: int32 [B, S]; returns per-token nll [B, S-1] (f32)."""
    from ..models import kv_cache as kvc

    B, S = chunk.shape
    inp, tgt = chunk[:, :-1], chunk[:, 1:]
    n_head_kv = getattr(cfg, "n_head_kv", getattr(cfg, "n_head"))
    cache = kvc.init_cache(cfg.n_layer, B, n_head_kv, S, cfg.head_dim,
                           dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(S - 1, dtype=jnp.int32)[None], inp.shape)
    logits, _ = forward(params, cfg, inp, cache, positions)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]


def perplexity(forward, cfg, params, tokens, chunk_len: int = 256,
               stride: int | None = None, score_tail_only: bool = True):
    """tokens: int32 [N] stream → (ppl, mean_nll, n_scored)."""
    tokens = np.asarray(tokens, np.int32)
    stride = stride or chunk_len
    nll_fn = jax.jit(lambda p, c: _nll_chunk(forward, cfg, p, c))
    total, count = 0.0, 0
    for start in range(0, len(tokens) - chunk_len, stride):
        chunk = jnp.asarray(tokens[start : start + chunk_len][None])
        nll = np.asarray(nll_fn(params, chunk))[0]
        lo = chunk_len // 2 if score_tail_only else 0
        total += float(nll[lo:].sum())
        count += nll[lo:].size
    mean_nll = total / max(count, 1)
    return float(np.exp(mean_nll)), mean_nll, count


def quantization_quality(forward, cfg, params_fp, params_q, rng=None,
                         n_tokens: int = 512, chunk_len: int = 128):
    """Δppl and logits-KL between fp32 and quantized params on text sampled
    greedily from the fp32 model (needs no external data)."""
    from ..models import sampling, kv_cache as kvc

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    prompt = jax.random.randint(rng, (1, 8), 0, cfg.n_vocab).astype(jnp.int32)
    n_head_kv = getattr(cfg, "n_head_kv", getattr(cfg, "n_head"))
    cache = kvc.init_cache(cfg.n_layer, 1, n_head_kv, n_tokens + 16,
                           cfg.head_dim, dtype=jnp.float32)
    toks, _ = sampling.generate(forward, cfg, params_fp, prompt, cache,
                                n_tokens, temperature=1.0, top_k=40, rng=rng)
    stream = np.concatenate([np.asarray(prompt)[0], np.asarray(toks)[0]])

    ppl_fp, nll_fp, _ = perplexity(forward, cfg, params_fp, stream, chunk_len)
    ppl_q, nll_q, _ = perplexity(forward, cfg, params_q, stream, chunk_len)

    # mean KL over one chunk of logits
    chunk = jnp.asarray(stream[:chunk_len][None])
    f = jax.jit(lambda p, c: _nll_chunk(forward, cfg, p, c))  # warm path

    def logits_of(params):
        from ..models import kv_cache as kvc2

        cache = kvc2.init_cache(cfg.n_layer, 1, n_head_kv, chunk_len,
                                cfg.head_dim, dtype=jnp.float32)
        positions = jnp.arange(chunk_len, dtype=jnp.int32)[None]
        lg, _ = jax.jit(
            lambda p, t, c, pos: forward(p, cfg, t, c, pos)
        )(params, chunk, cache, positions)
        return jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)

    lp_fp = logits_of(params_fp)
    lp_q = logits_of(params_q)
    kl = float(jnp.mean(jnp.sum(jnp.exp(lp_fp) * (lp_fp - lp_q), axis=-1)))
    return {
        "ppl_fp": ppl_fp,
        "ppl_q": ppl_q,
        "delta_ppl": ppl_q - ppl_fp,
        "mean_kl": kl,
    }


def compare_quantizers(forward, cfg, params_fp, quantize_fns: dict,
                       rng=None, n_tokens: int = 256, chunk_len: int = 128):
    """Quality ladder for alternative quantizers of the SAME format
    (e.g. Q4_K fast min/max vs make_qkx2-style search): quantize params_fp
    with each fn, return {name: quantization_quality metrics}. Used to
    measure the k-quant search quantizer's Δppl/KL gain (VERDICT r1 item 9).
    quantize_fns: {name: params_fp -> params_q}.
    """
    out = {}
    for name, qfn in quantize_fns.items():
        out[name] = quantization_quality(
            forward, cfg, params_fp, qfn(params_fp), rng=rng,
            n_tokens=n_tokens, chunk_len=chunk_len)
    return out
