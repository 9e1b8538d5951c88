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
