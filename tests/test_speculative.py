"""Speculative decoding: greedy-exactness vs plain target-only decode
(the invariant that makes it free speedup: a user switching it on must see
bit-identical tokens), all-accept fast path when draft == target, batched
slots, and llama (flat cache / flash-decode default path) coverage."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggmlsharp_tpu.models import gpt2, llama, sampling
from ggmlsharp_tpu.models.speculative import speculative_generate

pytestmark = pytest.mark.slow  # full engine/kernel flows; fast loop skips

CFG = gpt2.GPT2Config(n_vocab=128, n_ctx=128, n_embd=64, n_head=4, n_layer=2)


@pytest.fixture(scope="module")
def target_params():
    return gpt2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


@pytest.fixture(scope="module")
def draft_params():
    # independently-initialized "draft": wrong often enough to exercise
    # every rollback branch, right often enough to exercise acceptance
    return gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)


def _greedy_reference(mod, cfg, params, prompt, n_tokens):
    cache = mod.new_cache(cfg, prompt.shape[0], dtype=jnp.float32)
    toks, _ = sampling.generate(mod.forward, cfg, params, prompt, cache,
                                n_tokens)
    return np.asarray(toks)


@pytest.mark.parametrize("k", [1, 3, 4])
def test_spec_matches_greedy_gpt2(target_params, draft_params, k):
    prompt = jnp.asarray([[5, 17, 99, 3, 42]], jnp.int32)
    n = 24
    ref = _greedy_reference(gpt2, CFG, target_params, prompt, n)
    toks, rate = speculative_generate(
        gpt2.forward, CFG, target_params, gpt2.forward, CFG, draft_params,
        prompt, gpt2.new_cache(CFG, 1, dtype=jnp.float32),
        gpt2.new_cache(CFG, 1, dtype=jnp.float32), n, k=k)
    np.testing.assert_array_equal(np.asarray(toks), ref)
    assert 1.0 <= rate <= k + 1


def test_spec_all_accept_when_draft_is_target(target_params):
    # draft == target: every draft token accepted, k+1 emitted per round
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    n, k = 20, 4
    ref = _greedy_reference(gpt2, CFG, target_params, prompt, n)
    toks, rate = speculative_generate(
        gpt2.forward, CFG, target_params, gpt2.forward, CFG, target_params,
        prompt, gpt2.new_cache(CFG, 1, dtype=jnp.float32),
        gpt2.new_cache(CFG, 1, dtype=jnp.float32), n, k=k)
    np.testing.assert_array_equal(np.asarray(toks), ref)
    assert rate == pytest.approx(k + 1)


def test_spec_batched_slots(target_params, draft_params):
    # two slots diverge immediately → per-slot accept counts differ
    prompt = jnp.asarray([[5, 17, 99, 3], [100, 2, 64, 31]], jnp.int32)
    n = 16
    ref = _greedy_reference(gpt2, CFG, target_params, prompt, n)
    toks, _ = speculative_generate(
        gpt2.forward, CFG, target_params, gpt2.forward, CFG, draft_params,
        prompt, gpt2.new_cache(CFG, 2, dtype=jnp.float32),
        gpt2.new_cache(CFG, 2, dtype=jnp.float32), n, k=3)
    np.testing.assert_array_equal(np.asarray(toks), ref)


def test_spec_single_token_prompt(target_params, draft_params):
    prompt = jnp.asarray([[9]], jnp.int32)
    n = 12
    ref = _greedy_reference(gpt2, CFG, target_params, prompt, n)
    toks, _ = speculative_generate(
        gpt2.forward, CFG, target_params, gpt2.forward, CFG, draft_params,
        prompt, gpt2.new_cache(CFG, 1, dtype=jnp.float32),
        gpt2.new_cache(CFG, 1, dtype=jnp.float32), n, k=2)
    np.testing.assert_array_equal(np.asarray(toks), ref)


def test_spec_llama_flat_cache(monkeypatch):
    # llama SHIPPED-default path (head-major float cache since r3):
    # single-token draft steps + multi-token verify through prefill
    cfg = llama.TINY_LLAMA
    tp = llama.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    dp = llama.init_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    prompt = jnp.asarray([[4, 8, 15, 16, 23, 42]], jnp.int32)
    n = 16
    ref = _greedy_reference(llama, cfg, tp, prompt, n)
    toks, _ = speculative_generate(
        llama.forward, cfg, tp, llama.forward, cfg, dp,
        prompt, llama.new_cache(cfg, 1, dtype=jnp.float32),
        llama.new_cache(cfg, 1, dtype=jnp.float32), n, k=3)
    np.testing.assert_array_equal(np.asarray(toks), ref)


def test_spec_cache_headroom_validated(target_params, draft_params):
    small = gpt2.new_cache(CFG, 1, dtype=jnp.float32, max_len=16)
    with pytest.raises(ValueError, match="max_len"):
        speculative_generate(
            gpt2.forward, CFG, target_params, gpt2.forward, CFG,
            draft_params, jnp.asarray([[1, 2]], jnp.int32), small,
            gpt2.new_cache(CFG, 1, dtype=jnp.float32), 32, k=4)


def test_spec_llama_flat_eligible_cache():
    # E_kv = n_head_kv * head_dim = 128 → the flat [B, T, E] cache + fused
    # flash-decode are ELIGIBLE; since r3 the float default is head-major,
    # so the test opts in with flat=True. Verify/seed calls must attend the
    # LIVE prefix (cached_prefix=True), not just their own fresh K/V.
    # (Head-major spec decode under the shipped default is covered by
    # test_spec_llama_flat_cache above.)
    cfg = llama.LlamaConfig(n_vocab=128, n_ctx=96, n_embd=256, n_head=4,
                            n_head_kv=2, n_layer=2, n_ff=512)
    tp = llama.init_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    dp = llama.init_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    tc = llama.new_cache(cfg, 1, dtype=jnp.float32, flat=True)
    assert tc.k[0].ndim == 3  # flat cache engaged
    prompt = jnp.asarray([[7, 3, 88, 11]], jnp.int32)
    n = 16
    ref = _greedy_reference(llama, cfg, tp, prompt, n)
    toks, _ = speculative_generate(
        llama.forward, cfg, tp, llama.forward, cfg, dp, prompt, tc,
        llama.new_cache(cfg, 1, dtype=jnp.float32), n, k=3)
    np.testing.assert_array_equal(np.asarray(toks), ref)


def test_spec_llama_int8_kv_cache():
    # INT8 KV: spec rounds re-quantize rollback-overwritten rows; output
    # must equal plain greedy decode with the SAME int8 target cache
    cfg = llama.LlamaConfig(n_vocab=128, n_ctx=96, n_embd=256, n_head=4,
                            n_head_kv=2, n_layer=2, n_ff=512)
    tp = llama.init_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    dp = llama.init_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    prompt = jnp.asarray([[7, 3, 88, 11]], jnp.int32)
    n = 12
    cache = llama.new_cache(cfg, 1, int8=True)
    ref, _ = sampling.generate(llama.forward, cfg, tp, prompt, cache, n)
    toks, _ = speculative_generate(
        llama.forward, cfg, tp, llama.forward, cfg, dp, prompt,
        llama.new_cache(cfg, 1, int8=True),
        llama.new_cache(cfg, 1, int8=True), n, k=3)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_sampled_spec_topk1_equals_greedy(target_params, draft_params):
    """top_k=1 truncates both distributions to one-hot argmax, so sampled
    speculative decoding must reproduce greedy decode exactly, for any
    temperature and rng."""
    prompt = jnp.asarray([[5, 17, 99]], jnp.int32)
    n = 12
    ref = _greedy_reference(gpt2, CFG, target_params, prompt, n)
    toks, rate = speculative_generate(
        gpt2.forward, CFG, target_params, gpt2.forward, CFG, draft_params,
        prompt, gpt2.new_cache(CFG, 1, dtype=jnp.float32),
        gpt2.new_cache(CFG, 1, dtype=jnp.float32), n, k=3,
        temperature=0.8, top_k=1, rng=jax.random.PRNGKey(11))
    assert np.asarray(toks).tolist() == np.asarray(ref).tolist()
    assert 1.0 <= rate <= 4.0


def test_sampled_spec_temp0_slots_degenerate_to_greedy(target_params,
                                                       draft_params):
    """The sampled round with temp=0 vectors emits exactly what the greedy
    round emits (one-hot distributions -> acceptance == argmax match)."""
    from ggmlsharp_tpu.models.speculative import (make_spec_round,
                                                  make_spec_round_sampled)

    k = 3
    B = 2
    greedy_round = make_spec_round(gpt2.forward, CFG, gpt2.forward, CFG, k)
    sampled_round = make_spec_round_sampled(gpt2.forward, CFG, gpt2.forward,
                                            CFG, k)

    def fresh():
        tc = gpt2.new_cache(CFG, B, dtype=jnp.float32)
        dc = gpt2.new_cache(CFG, B, dtype=jnp.float32)
        # prefill both with a 4-token history (target) / 3 (draft)
        prompt = jnp.asarray([[5, 17, 99, 2], [7, 1, 3, 4]], jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32)[None],
                               (B, 4))
        lg, tc = gpt2.forward(target_params, CFG, prompt, tc, pos)
        _, dc = gpt2.forward(draft_params, CFG, prompt[:, :3], dc,
                             pos[:, :3])
        a0 = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)
        seed = jnp.stack([prompt[:, -1], a0], axis=1)
        return tc, dc, seed

    tc, dc, seed = fresh()
    em_g, ne_g, *_ = greedy_round(target_params, draft_params, tc, dc, seed)
    tc, dc, seed = fresh()
    zeros = jnp.zeros((B,), jnp.float32)
    em_s, ne_s, *_ = sampled_round(
        target_params, draft_params, tc, dc, seed,
        jax.random.PRNGKey(0), zeros, jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), jnp.float32))
    assert np.asarray(ne_s).tolist() == np.asarray(ne_g).tolist()
    assert np.asarray(em_s).tolist() == np.asarray(em_g).tolist()


def test_sampled_spec_preserves_target_distribution(target_params,
                                                    draft_params):
    """Rejection-sampled speculative decoding must emit the target's
    modified distribution: over many rngs, the FIRST emitted token of one
    round matches direct sampling from the target's softmax (fixed seeds —
    deterministic check of total-variation distance)."""
    from ggmlsharp_tpu.models.speculative import (_mod_probs,
                                                  make_spec_round_sampled)

    k = 2
    temp, nsamp = 0.9, 1500
    sampled_round = make_spec_round_sampled(gpt2.forward, CFG, gpt2.forward,
                                            CFG, k)
    prompt = jnp.asarray([[5, 17, 99, 2]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    tc0 = gpt2.new_cache(CFG, 1, dtype=jnp.float32)
    dc0 = gpt2.new_cache(CFG, 1, dtype=jnp.float32)
    lg, tc0 = gpt2.forward(target_params, CFG, prompt, tc0, pos)
    _, dc0 = gpt2.forward(draft_params, CFG, prompt[:, :3], dc0, pos[:, :3])
    a0 = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)
    seed = jnp.stack([prompt[:, -1], a0], axis=1)

    tv = jnp.full((1,), temp, jnp.float32)
    kv_ = jnp.zeros((1,), jnp.int32)
    pv = jnp.ones((1,), jnp.float32)

    def one(key):
        em, ne, tc, dc, _ = sampled_round(
            target_params, draft_params,
            jax.tree.map(jnp.copy, tc0), jax.tree.map(jnp.copy, dc0),
            seed, key, tv, kv_, pv)
        return em[0, 0]

    keys = jax.random.split(jax.random.PRNGKey(123), nsamp)
    first = np.asarray(jax.lax.map(one, keys, batch_size=64))
    counts = np.bincount(first, minlength=CFG.n_vocab) / nsamp

    # ground truth: the target's modified distribution at this position
    # (the first emitted token of a round is the verify row-0 sample)
    nxt = jnp.asarray([[int(np.asarray(a0)[0])]], jnp.int32)
    lg2, _ = gpt2.forward(target_params, CFG, nxt,
                          jax.tree.map(jnp.copy, tc0),
                          jnp.asarray([[4]], jnp.int32))
    want = np.asarray(_mod_probs(lg2[:, -1, :].astype(jnp.float32),
                                 tv, kv_, pv))[0]
    tvd = 0.5 * np.abs(counts - want).sum()
    assert tvd < 0.12, tvd


def test_spec_gptj_family():
    """Speculative decoding over the GPT-J family (head-major cache,
    parallel-residual forward): greedy-exact vs target-only decode."""
    from ggmlsharp_tpu.models import gptj

    cfg = gptj.TINY_GPTJ
    tp = gptj.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    dp = gptj.init_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    prompt = jnp.asarray([[5, 17, 99]], jnp.int32)
    n = 10
    ref = _greedy_reference(gptj, cfg, tp, prompt, n)
    toks, rate = speculative_generate(
        gptj.forward, cfg, tp, gptj.forward, cfg, dp, prompt,
        gptj.new_cache(cfg, 1, dtype=jnp.float32),
        gptj.new_cache(cfg, 1, dtype=jnp.float32), n, k=3)
    assert np.asarray(toks).tolist() == np.asarray(ref).tolist()
    assert 1.0 <= rate <= 4.0
