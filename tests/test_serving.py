"""Continuous-batching engine tests: engine outputs must equal sequential
single-request greedy decoding; slots recycle; mixed prompt lengths."""
import numpy as np
import jax
import jax.numpy as jnp

from ggmlsharp_tpu.models import gpt2, sampling
from ggmlsharp_tpu.serving import Engine, Request
import pytest

pytestmark = pytest.mark.slow  # full engine/kernel flows; fast loop skips

CFG = gpt2.GPT2Config(n_vocab=128, n_ctx=96, n_embd=64, n_head=4, n_layer=2)


def _params():
    return gpt2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _sequential_greedy(params, prompt, n):
    cache = gpt2.new_cache(CFG, 1, dtype=jnp.float32)
    toks, _ = sampling.generate(
        gpt2.forward, CFG, params, jnp.asarray([prompt], jnp.int32), cache, n
    )
    return np.asarray(toks)[0].tolist()


def test_engine_matches_sequential_greedy():
    params = _params()
    prompts = [[5, 17, 99], [7, 1, 2, 3, 4, 5, 6, 8], [11], [3, 3, 3, 3]]
    n_new = 6

    eng = Engine(gpt2.forward, CFG, params, batch_slots=2)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    results = eng.run()

    assert len(results) == 4
    for i, req in enumerate(results):
        want = _sequential_greedy(params, prompts[i], n_new)
        assert req.out_tokens == want, (i, req.out_tokens, want)


def test_engine_slot_recycling_more_requests_than_slots():
    params = _params()
    eng = Engine(gpt2.forward, CFG, params, batch_slots=2)
    for i in range(5):
        eng.submit(Request(id=i, prompt=[i + 1, i + 2], max_new_tokens=3))
    results = eng.run()
    assert len(results) == 5
    assert all(len(r.out_tokens) == 3 for r in results)


def test_engine_rejects_overlong_prompt():
    """A prompt >= max_len must be rejected up front (done=True, error set),
    not crash inside the jitted prefill; later requests still run."""
    params = _params()
    eng = Engine(gpt2.forward, CFG, params, batch_slots=1, max_len=32)
    eng.submit(Request(id=0, prompt=list(range(1, 41)), max_new_tokens=4))
    eng.submit(Request(id=1, prompt=[5, 17, 99], max_new_tokens=2))
    results = eng.run()
    assert len(results) == 2
    assert results[0].error is not None and results[0].out_tokens == []
    assert results[1].error is None and len(results[1].out_tokens) == 2


def test_engine_bucket_capped_at_max_len():
    """Prompt whose bucket exceeds max_len (but fits the cache) pads only to
    max_len — the dynamic_update into the cache stays in bounds."""
    params = _params()
    # max_len=48: _bucket(40)=64 > 48 → capped to 48
    eng = Engine(gpt2.forward, CFG, params, batch_slots=1, max_len=48)
    prompt = [(i % 100) + 1 for i in range(40)]
    eng.submit(Request(id=0, prompt=prompt, max_new_tokens=4))
    results = eng.run()
    assert results[0].error is None
    assert results[0].out_tokens == _sequential_greedy(params, prompt, 4)


def test_engine_eos_stops_early():
    params = _params()
    # find the first greedy token, use it as eos → stops after 1 token
    first = _sequential_greedy(params, [5, 17, 99], 1)[0]
    eng = Engine(gpt2.forward, CFG, params, batch_slots=1)
    eng.submit(Request(id=0, prompt=[5, 17, 99], max_new_tokens=8, eos_id=first))
    results = eng.run()
    assert results[0].out_tokens == [first]


def test_engine_llama_flat_flash_decode_matches_sequential(monkeypatch):
    """Llama engine on the flat cache + batched flash-decode with
    per-slot prefix lengths; uneven prompts must still match sequential
    greedy decode exactly. (Float caches default head-major since r4 —
    the test opts into the flat path it exercises.)"""
    monkeypatch.setenv("GGML_TPU_FLASH_DECODE", "1")
    from ggmlsharp_tpu.models import llama

    lcfg = llama.LlamaConfig(n_vocab=128, n_ctx=96, n_embd=256, n_head=4,
                             n_head_kv=2, n_layer=2, n_ff=512)
    params = llama.init_params(jax.random.PRNGKey(2), lcfg,
                               dtype=jnp.float32)
    prompts = [[5, 17, 99], [7, 1, 2, 3, 4, 5, 6, 8], [11], [3, 3, 3, 3]]
    n_new = 5

    eng = Engine(llama.forward, lcfg, params, batch_slots=2)
    assert eng.cache.k[0].ndim == 3  # flat cache engaged
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    results = eng.run()
    assert len(results) == 4

    def seq(prompt):
        cache = llama.new_cache(lcfg, 1, dtype=jnp.float32, flat=False)
        toks, _ = sampling.generate(
            llama.forward, lcfg, params, jnp.asarray([prompt], jnp.int32),
            cache, n_new)
        import numpy as np

        return np.asarray(toks)[0].tolist()

    for i, req in enumerate(results):
        assert req.out_tokens == seq(prompts[i]), (i, req.out_tokens)


def test_prefix_caching_matches_full_prefill():
    """Requests sharing a registered prefix must decode IDENTICALLY to full
    prefills of the same prompts (greedy), including prompt == prefix."""
    params = _params()
    prefix = [9, 42, 17, 5, 60, 2, 31]
    suffixes = [[7, 1, 2], [100], [], [55, 44, 33, 22, 11]]
    prompts = [prefix + s for s in suffixes]
    n_new = 6

    eng = Engine(gpt2.forward, CFG, params, batch_slots=2)
    pid = eng.register_prefix(prefix)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new,
                           prefix_id=pid))
    results = eng.run()
    assert len(results) == len(prompts)
    for i, req in enumerate(results):
        assert req.error is None
        want = _sequential_greedy(params, prompts[i], n_new)
        assert req.out_tokens == want, (i, req.out_tokens, want)


def test_prefix_caching_mixed_with_plain_requests():
    params = _params()
    prefix = [3, 14, 15, 92]
    eng = Engine(gpt2.forward, CFG, params, batch_slots=3)
    pid = eng.register_prefix(prefix)
    eng.submit(Request(id=0, prompt=prefix + [6, 5], max_new_tokens=4,
                       prefix_id=pid))
    eng.submit(Request(id=1, prompt=[8, 8, 8], max_new_tokens=4))
    eng.submit(Request(id=2, prompt=prefix + [35], max_new_tokens=4,
                       prefix_id=pid))
    results = eng.run()
    for req in results:
        want = _sequential_greedy(params, req.prompt, 4)
        assert req.out_tokens == want, (req.id, req.out_tokens, want)


def test_prefix_caching_validates_prompt_and_id():
    params = _params()
    eng = Engine(gpt2.forward, CFG, params, batch_slots=2)
    pid = eng.register_prefix([1, 2, 3])
    eng.submit(Request(id=0, prompt=[9, 9, 9, 9], max_new_tokens=4,
                       prefix_id=pid))       # wrong prefix
    eng.submit(Request(id=1, prompt=[1, 2, 3, 4], max_new_tokens=4,
                       prefix_id=pid + 99))  # unknown id
    r = eng.run()
    assert r[0].error == "prompt does not start with prefix"
    assert "unknown prefix_id" in r[1].error
    eng.drop_prefix(pid)
    eng.submit(Request(id=2, prompt=[1, 2, 3, 4], max_new_tokens=4,
                       prefix_id=pid))
    assert "unknown prefix_id" in eng.run()[0].error


def test_prefix_caching_llama_flat_cache(monkeypatch):
    """Prefix install over the flat [B, T, E] cache layout (time axis 1) +
    batched flash-decode must equal full-prefill decoding. (Opt-in since
    the r4 head-major float default.)"""
    monkeypatch.setenv("GGML_TPU_FLASH_DECODE", "1")
    from ggmlsharp_tpu.models import llama

    lcfg = llama.LlamaConfig(n_vocab=128, n_ctx=96, n_embd=256, n_head=4,
                             n_head_kv=2, n_layer=2, n_ff=512)
    params = llama.init_params(jax.random.PRNGKey(2), lcfg,
                               dtype=jnp.float32)
    prefix = [9, 42, 17, 5, 60]
    suffixes = [[7, 1], [], [55, 44, 33]]
    n_new = 5

    eng = Engine(llama.forward, lcfg, params, batch_slots=2)
    assert eng.cache.k[0].ndim == 3  # flat cache engaged
    pid = eng.register_prefix(prefix)
    for i, s in enumerate(suffixes):
        eng.submit(Request(id=i, prompt=prefix + s, max_new_tokens=n_new,
                           prefix_id=pid))
    results = eng.run()

    eng2 = Engine(llama.forward, lcfg, params, batch_slots=2)
    for i, s in enumerate(suffixes):
        eng2.submit(Request(id=i, prompt=prefix + s, max_new_tokens=n_new))
    want = eng2.run()
    for r, w in zip(results, want):
        assert r.error is None
        assert r.out_tokens == w.out_tokens, (r.id, r.out_tokens, w.out_tokens)


def test_prefix_caching_long_suffix():
    """Suffix longer than 8 tokens rides the flash-with-npast path (flat
    llama) / flash_attention_cached (head-major gpt2); both must equal full
    prefill."""
    from ggmlsharp_tpu.models import llama

    # llama flat cache
    lcfg = llama.LlamaConfig(n_vocab=128, n_ctx=96, n_embd=256, n_head=4,
                             n_head_kv=2, n_layer=2, n_ff=512)
    lp = llama.init_params(jax.random.PRNGKey(2), lcfg, dtype=jnp.float32)
    prefix = [9, 42, 17, 5, 60]
    suffix = [7, 1, 3, 8, 2, 99, 55, 44, 33, 22, 11, 6]  # 12 > 8
    for fwd, cfg, params in ((llama.forward, lcfg, lp),
                             (gpt2.forward, CFG, _params())):
        eng = Engine(fwd, cfg, params, batch_slots=1)
        pid = eng.register_prefix(prefix)
        eng.submit(Request(id=0, prompt=prefix + suffix, max_new_tokens=5,
                           prefix_id=pid))
        got = eng.run()[0]
        eng2 = Engine(fwd, cfg, params, batch_slots=1)
        eng2.submit(Request(id=0, prompt=prefix + suffix, max_new_tokens=5))
        want = eng2.run()[0]
        assert got.error is None
        assert got.out_tokens == want.out_tokens, (got.out_tokens,
                                                   want.out_tokens)


def test_spec_engine_matches_plain_engine():
    """Speculative continuous batching: engine with a draft model emits
    BIT-IDENTICAL tokens to the plain engine (greedy), across slot
    recycling and uneven prompt lengths."""
    params = _params()
    draft = gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    prompts = [[5, 17, 99], [7, 1, 2, 3, 4, 5, 6, 8], [11], [3, 3, 3, 3],
               [42, 42]]
    n_new = 7

    eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                 draft_forward=gpt2.forward, draft_cfg=CFG,
                 draft_params=draft, spec_k=3)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    got = eng.run()

    eng2 = Engine(gpt2.forward, CFG, params, batch_slots=2)
    for i, p in enumerate(prompts):
        eng2.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    want = eng2.run()
    assert len(got) == len(want) == len(prompts)
    for g, w in zip(got, want):
        assert g.error is None
        assert g.out_tokens == w.out_tokens, (g.id, g.out_tokens,
                                              w.out_tokens)


def test_spec_engine_draft_is_target_all_accept():
    params = _params()
    eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                 draft_forward=gpt2.forward, draft_cfg=CFG,
                 draft_params=params, spec_k=4)
    eng.submit(Request(id=0, prompt=[5, 17, 99], max_new_tokens=16))
    got = eng.run()[0]
    assert got.out_tokens == _sequential_greedy(params, [5, 17, 99], 16)


def test_spec_engine_eos_and_validation():
    params = _params()
    draft = gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                 draft_forward=gpt2.forward, draft_cfg=CFG,
                 draft_params=draft, spec_k=3)
    # repeat_penalty unsupported in spec mode: clear rejection
    eng.submit(Request(id=0, prompt=[1, 2], max_new_tokens=4,
                       repeat_penalty=1.3))
    # eos mid-round truncates: run the plain engine first to find a token
    # that actually appears, then use it as eos
    probe = Engine(gpt2.forward, CFG, params, batch_slots=1)
    probe.submit(Request(id=0, prompt=[5, 17, 99], max_new_tokens=8))
    seq = probe.run()[0].out_tokens
    eos = seq[3]
    eng.submit(Request(id=1, prompt=[5, 17, 99], max_new_tokens=8,
                       eos_id=eos))
    got = eng.run()
    assert "repeat_penalty" in got[0].error
    want = seq[: seq.index(eos) + 1]
    assert got[1].out_tokens == want, (got[1].out_tokens, want)


def test_spec_engine_with_prefix_caching():
    """Speculative mode + registered prefix: both models' rows installed,
    suffix-only prefill (draft one behind); output equals the plain engine
    on the full prompts, including prompt == prefix."""
    params = _params()
    draft = gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    prefix = [9, 42, 17, 5, 60]
    suffixes = [[7, 1, 2], [100], [], [55, 44]]
    prompts = [prefix + s for s in suffixes]
    n_new = 6

    eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                 draft_forward=gpt2.forward, draft_cfg=CFG,
                 draft_params=draft, spec_k=3)
    pid = eng.register_prefix(prefix)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new,
                           prefix_id=pid))
    got = eng.run()

    eng2 = Engine(gpt2.forward, CFG, params, batch_slots=2)
    for i, p in enumerate(prompts):
        eng2.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    want = eng2.run()
    for g, w in zip(got, want):
        assert g.error is None
        assert g.out_tokens == w.out_tokens, (g.id, g.out_tokens,
                                              w.out_tokens)


def test_sampler_top_p_and_repeat_penalty():
    """Sampler-stack semantics: nucleus truncation keeps exactly the
    smallest prefix reaching top_p mass; repetition penalty shrinks seen
    tokens' logits (divide if positive, multiply if negative); greedy
    argmax respects the penalty."""
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0, -2.0]])

    # top_p: probs ~ [.64, .23, .086, .032, .012]; top_p=.7 keeps {0, 1}
    seen = set()
    for s in range(200):
        t = int(np.asarray(sampling.sample_token(
            logits, jax.random.PRNGKey(s), temperature=1.0, top_p=0.7,
        ))[0, 0])
        seen.add(t)
    assert seen == {0, 1}, seen

    # repeat penalty: token 0 seen -> 2.0/2=1.0 ties token 1; token 3 seen
    # (negative logit) -> -1*2=-2.0
    recent = jnp.asarray([[0, 3, -1, -1]], jnp.int32)
    pen = sampling.apply_repeat_penalty(logits, recent, 2.0)
    np.testing.assert_allclose(
        np.asarray(pen)[0], [1.0, 1.0, 0.0, -2.0, -2.0])

    # greedy argmax over penalized logits: 0 penalized below 1
    logits2 = jnp.asarray([[2.0, 1.5, 0.0, -1.0, -2.0]])
    tok = sampling.sample_token(
        logits2, temperature=0.0, repeat_penalty=3.0,
        recent_tokens=jnp.asarray([[0, -1]], jnp.int32))
    assert int(np.asarray(tok)[0, 0]) == 1


def test_engine_repeat_penalty_blocks_loops():
    """A harsh repetition penalty in the engine must forbid emitting any
    token twice within the window (greedy path), and generate() with the
    same params must agree exactly."""
    params = _params()
    prompt = [5, 17, 99]
    n_new = 8

    eng = Engine(gpt2.forward, CFG, params, batch_slots=2)
    eng.submit(Request(id=0, prompt=prompt, max_new_tokens=n_new,
                       repeat_penalty=1e9, repeat_last_n=32))
    got = eng.run()[0].out_tokens
    hist = prompt + got
    # every emitted token is new w.r.t. its preceding window
    for i in range(len(prompt), len(hist)):
        assert hist[i] not in hist[:i], (i, hist)

    cache = gpt2.new_cache(CFG, 1, dtype=jnp.float32)
    toks, _ = sampling.generate(
        gpt2.forward, CFG, params, jnp.asarray([prompt], jnp.int32), cache,
        n_new, repeat_penalty=1e9, repeat_last_n=32)
    assert np.asarray(toks)[0].tolist() == got


def test_batched_admission_prefill_matches_sequential():
    """A burst of same-bucket admissions rides ONE batched prefill
    executable (padded to a power of two via idempotent duplicate rows);
    outputs must still equal sequential greedy decoding."""
    params = _params()
    # 3 same-bucket prompts (pad to G=4) + 1 in a larger bucket
    prompts = [[5, 17, 99], [7, 1], [11, 4, 9, 2],
               list(range(1, 20))]  # bucket 32
    n_new = 6

    eng = Engine(gpt2.forward, CFG, params, batch_slots=4)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    results = eng.run()

    assert any(isinstance(k, tuple) and k and k[0] == "many"
               for k in eng._compiled_prefill), eng._compiled_prefill.keys()
    for i, req in enumerate(sorted(results, key=lambda r: r.id)):
        want = _sequential_greedy(params, prompts[i], n_new)
        assert req.out_tokens == want, (i, req.out_tokens, want)


def test_streaming_cancel_and_stats():
    """on_token streams every emitted token in order; cancel() frees a live
    slot (partial output kept, error='cancelled') and drops a pending
    request; stats() counts ticks/tokens/prefills."""
    params = _params()
    streamed = []
    eng = Engine(gpt2.forward, CFG, params, batch_slots=2)
    eng.submit(Request(id=0, prompt=[5, 17, 99], max_new_tokens=6,
                       on_token=lambda r, t: streamed.append((r.id, t))))
    eng.submit(Request(id=1, prompt=[7, 1], max_new_tokens=4))
    eng.submit(Request(id=2, prompt=[9], max_new_tokens=4))  # queued

    # run a few ticks, then cancel one live and the queued request
    eng.step_once()
    eng.step_once()
    live_id = next(r.id for r in eng.slots if r is not None)
    assert eng.cancel(live_id)
    assert eng.cancel(2)
    assert not eng.cancel(99)
    results = {r.id: r for r in eng.run()}

    assert results[live_id].error == "cancelled"
    assert results[2].error == "cancelled" and results[2].out_tokens == []
    done = [r for r in results.values() if r.error is None]
    assert done and all(len(r.out_tokens) > 0 for r in done)
    assert streamed == [(0, t) for t in results[0].out_tokens]

    st = eng.stats()
    assert st["tokens_emitted"] == sum(
        len(r.out_tokens) for r in results.values())
    # both initial admissions share a bucket -> ONE batched prefill
    assert st["ticks"] > 0 and st["prefill_dispatches"] == 1
    assert st["live_slots"] == 0 and st["queue_depth"] == 0


def test_prefix_suffix_near_max_len():
    """Regression: suffix prefill over an installed prefix whose start +
    suffix-bucket exceeds max_len must not clamp the write back over the
    prefix tail (code-review finding: dynamic_update_slice clamps)."""
    params = _params()
    max_len = 32
    prefix = list(np.arange(1, 21))  # plen=20; suffix bucket would be 16
    suffix = [7, 3, 9, 1, 4]
    prompt = [int(t) for t in prefix] + suffix
    n_new = 4

    want = _sequential_greedy(params, prompt, n_new)

    eng = Engine(gpt2.forward, CFG, params, batch_slots=2, max_len=max_len)
    pid = eng.register_prefix([int(t) for t in prefix])
    eng.submit(Request(id=0, prompt=prompt, max_new_tokens=n_new,
                       prefix_id=pid))
    got = eng.run()[0]
    assert got.error is None
    assert got.out_tokens == want, (got.out_tokens, want)

    # speculative mode takes the same path for target AND draft prefills
    draft = gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    eng2 = Engine(gpt2.forward, CFG, params, batch_slots=2, max_len=max_len,
                  draft_forward=gpt2.forward, draft_cfg=CFG,
                  draft_params=draft, spec_k=2)
    pid2 = eng2.register_prefix([int(t) for t in prefix])
    eng2.submit(Request(id=0, prompt=prompt, max_new_tokens=n_new,
                        prefix_id=pid2))
    got2 = eng2.run()[0]
    assert got2.error is None
    # spec-mode capacity guard caps max_new at max_len-plen-k-2 = 3
    assert got2.out_tokens == want[:3], (got2.out_tokens, want)


def test_repeat_last_n_zero_disables_penalty():
    """llama.cpp semantics: repeat_last_n <= 0 turns the penalty off (the
    -0: slice trap must not penalize the whole history)."""
    params = _params()
    prompt = [5, 17, 99]
    n_new = 5
    want = _sequential_greedy(params, prompt, n_new)

    eng = Engine(gpt2.forward, CFG, params, batch_slots=1)
    eng.submit(Request(id=0, prompt=prompt, max_new_tokens=n_new,
                       repeat_penalty=5.0, repeat_last_n=0))
    assert eng.run()[0].out_tokens == want

    cache = gpt2.new_cache(CFG, 1, dtype=jnp.float32)
    toks, _ = sampling.generate(
        gpt2.forward, CFG, params, jnp.asarray([prompt], jnp.int32), cache,
        n_new, repeat_penalty=5.0, repeat_last_n=0)
    assert np.asarray(toks)[0].tolist() == want


def test_spec_batched_admission_executables():
    """A speculative admission burst rides grouped prefills for BOTH models
    (target prompts, draft prompts[:-1]) and stays greedy-exact."""
    params = _params()
    draft = gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    prompts = [[5, 17, 99], [7, 1, 2], [11, 4], [3, 3, 3, 3]]
    n_new = 6

    eng = Engine(gpt2.forward, CFG, params, batch_slots=4,
                 draft_forward=gpt2.forward, draft_cfg=CFG,
                 draft_params=draft, spec_k=3)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    got = eng.run()

    keys = set(eng._compiled_prefill)
    # ("many", bucket, G, draft, full) since the r4 full-burst install
    assert any(k[0] == "many" and k[3] is False for k in keys
               if isinstance(k, tuple) and len(k) == 5), keys
    assert any(k[0] == "many" and k[3] is True for k in keys
               if isinstance(k, tuple) and len(k) == 5), keys
    for i, req in enumerate(sorted(got, key=lambda r: r.id)):
        want = _sequential_greedy(params, prompts[i], n_new)
        assert req.out_tokens == want, (i, req.out_tokens, want)


def test_http_server_end_to_end():
    """EngineServer: concurrent /v1/generate requests through the real
    HTTP stack match sequential greedy; stats and health respond."""
    import json as _json
    import threading
    import urllib.request

    from ggmlsharp_tpu.serving import EngineServer

    params = _params()
    eng = Engine(gpt2.forward, CFG, params, batch_slots=2)
    srv = EngineServer(eng, port=0).start()
    base = f"http://127.0.0.1:{srv.port}"

    def post(path, obj):
        req = urllib.request.Request(
            base + path, data=_json.dumps(obj).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return _json.loads(r.read())

    try:
        with urllib.request.urlopen(base + "/health", timeout=30) as r:
            assert _json.loads(r.read()) == {"ok": True}

        prompts = [[5, 17, 99], [7, 1, 2], [11, 4]]
        outs = [None] * len(prompts)

        def hit(i):
            outs[i] = post("/v1/generate",
                           {"prompt": prompts[i], "max_new_tokens": 5})

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(prompts))]
        [t.start() for t in threads]
        [t.join(timeout=180) for t in threads]

        for i, out in enumerate(outs):
            assert out is not None and out["error"] is None, out
            assert out["tokens"] == _sequential_greedy(params, prompts[i], 5)

        with urllib.request.urlopen(base + "/v1/stats", timeout=30) as r:
            st = _json.loads(r.read())
        assert st["tokens_emitted"] == 15 and "uptime_s" in st
        assert post("/v1/cancel", {"id": 12345}) == {"cancelled": False}
        assert post("/v1/generate",
                    {"prompt": [1], "max_new_tokens": 1})["tokens"]
    finally:
        srv.stop()


def test_http_server_streaming():
    """stream=true returns chunked NDJSON: one token line per emitted
    token, then a done line whose tokens equal the streamed sequence."""
    import json as _json
    import urllib.request

    from ggmlsharp_tpu.serving import EngineServer

    params = _params()
    srv = EngineServer(Engine(gpt2.forward, CFG, params, batch_slots=2),
                       port=0).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/generate",
            data=_json.dumps({"prompt": [5, 17, 99], "max_new_tokens": 5,
                              "stream": True}).encode())
        with urllib.request.urlopen(req, timeout=120) as r:
            lines = [_json.loads(ln) for ln in r.read().splitlines() if ln]
        assert "id" in lines[0]  # engine id first, for /v1/cancel
        toks = [ln["token"] for ln in lines[1:-1]]
        done = lines[-1]
        assert done["done"] is True and done["error"] is None
        assert toks == done["tokens"]
        assert toks == _sequential_greedy(params, [5, 17, 99], 5)
    finally:
        srv.stop()


def test_http_server_text_api():
    """With a tokenizer, /v1/generate accepts "text" and returns decoded
    "text" alongside the token ids."""
    import json as _json
    import urllib.request

    from ggmlsharp_tpu.io.tokenizer import SPMTokenizer
    from ggmlsharp_tpu.serving import EngineServer

    # vocab sized to CFG.n_vocab=128: specials + pieces + padding
    tokens = ["<unk>", "<s>", "</s>", "▁", "▁hi", "hi", "h", "i"]
    tokens += [f"<p{j}>" for j in range(128 - len(tokens))]
    scores = [0.0, 0.0, 0.0, -1.0, -0.5, -2.0, -9.0, -9.0]
    scores += [-30.0] * (128 - len(scores))
    tok = SPMTokenizer(tokens, scores)

    params = _params()
    srv = EngineServer(Engine(gpt2.forward, CFG, params, batch_slots=2),
                       port=0, tokenizer=tok).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/generate",
            data=_json.dumps({"text": "hi", "max_new_tokens": 4}).encode())
        with urllib.request.urlopen(req, timeout=120) as r:
            out = _json.loads(r.read())
        assert out["error"] is None
        assert out["tokens"] == _sequential_greedy(
            params, tok.encode("hi"), 4)
        assert out["text"] == tok.decode(out["tokens"])
    finally:
        srv.stop()


def test_http_server_robustness_and_cancel():
    """Malformed bodies get 400s (not a dead tick thread); server-side
    engine errors fail the request instead of hanging the handler; cancel
    works via client-supplied request_id on an in-flight request."""
    import json as _json
    import urllib.error
    import urllib.request

    from ggmlsharp_tpu.serving import EngineServer

    # Determinism of the cancel subtest (ADVICE r4): the engine budget is
    # silently capped at n_ctx, and a W=32 × pipeline=4 window wave can
    # cover a whole 94-token generation inside ONE tick-thread lock hold —
    # on a fast host the "unbounded" request then finishes before any
    # /v1/cancel poll can land. multi_step=1 gives one lock boundary per
    # token and the 1024-token context gives the poll loop thousands of
    # chances; the cancel lands on the first tick boundary after it.
    cfg = gpt2.GPT2Config(n_vocab=128, n_ctx=1024, n_embd=64, n_head=4,
                          n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    srv = EngineServer(Engine(gpt2.forward, cfg, params, batch_slots=2,
                              multi_step=1),
                       port=0).start()
    base = f"http://127.0.0.1:{srv.port}"

    def post(path, obj, timeout=120):
        req = urllib.request.Request(
            base + path, data=_json.dumps(obj).encode())
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return _json.loads(r.read())

    try:
        # malformed prompts → 400, server stays up
        for bad in ["nope", ["a"], [True], None]:
            try:
                post("/v1/generate", {"prompt": bad})
                assert False, "expected 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        assert post("/v1/generate",
                    {"prompt": [5, 17], "max_new_tokens": 3})["tokens"]

        # cancel by client request_id: park the target request behind two
        # slot-filling blockers so it is deterministically still pending
        # when the cancel lands (live-slot cancel shares the same flag
        # path, exercised by test_streaming_cancel_and_stats)
        import threading as _t
        out = {}

        def req(key, body):
            out[key] = post("/v1/generate", body)

        threads = [
            _t.Thread(target=req, args=("b0", {"prompt": [5],
                                               "max_new_tokens": 40})),
            _t.Thread(target=req, args=("b1", {"prompt": [6],
                                               "max_new_tokens": 40})),
        ]
        [t.start() for t in threads]
        import time as _time
        for _ in range(1500):  # wait until both blockers occupy the slots
            if all(s is not None for s in srv.engine.slots):
                break
            _time.sleep(0.02)
        # the budget is capped at n_ctx (1024 here), NOT truly unbounded —
        # but at multi_step=1 "c" stays visible to /v1/cancel (pending,
        # live in a slot, or pre-admitted in engine._inflight_pre) for
        # ~1000 tick boundaries, so the first poll after admission lands
        th = _t.Thread(target=req, args=("c", {"prompt": [5, 17],
                                               "max_new_tokens": 10 ** 6,
                                               "request_id": "abc"}))
        th.start()
        ok = False
        for _ in range(1500):  # queued (or just-admitted): flag it
            if post("/v1/cancel", {"request_id": "abc"})["cancelled"]:
                ok = True
                break
            _time.sleep(0.02)
        assert ok, "cancel never landed"
        th.join(timeout=180)
        [t.join(timeout=180) for t in threads]
        assert out["c"]["error"] == "cancelled"
        assert len(out["c"]["tokens"]) < 10 ** 6
        assert out["b0"]["error"] is None and out["b1"]["error"] is None

        # server still healthy afterwards
        assert post("/v1/generate",
                    {"prompt": [9], "max_new_tokens": 2})["error"] is None
    finally:
        srv.stop()


def test_spec_engine_sampled_requests():
    """Sampled requests in the speculative engine: top_k=1 forces the
    greedy sequence exactly (any rng), and mixed greedy+sampled slots run
    one round together (greedy slots stay bit-exact)."""
    params = _params()
    draft = gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    n_new = 6

    eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                 draft_forward=gpt2.forward, draft_cfg=CFG,
                 draft_params=draft, spec_k=3, rng_seed=42)
    eng.submit(Request(id=0, prompt=[5, 17, 99], max_new_tokens=n_new,
                       temperature=0.9, top_k=1))  # == greedy
    eng.submit(Request(id=1, prompt=[7, 1], max_new_tokens=n_new))  # greedy
    eng.submit(Request(id=2, prompt=[9, 4], max_new_tokens=n_new,
                       temperature=1.2, top_p=0.9))  # truly sampled
    got = {r.id: r for r in eng.run()}

    assert got[0].error is None
    assert got[0].out_tokens == _sequential_greedy(params, [5, 17, 99],
                                                   n_new)
    assert got[1].error is None
    assert got[1].out_tokens == _sequential_greedy(params, [7, 1], n_new)
    assert got[2].error is None and len(got[2].out_tokens) == n_new
    assert all(0 <= t < CFG.n_vocab for t in got[2].out_tokens)


def test_engine_logprobs():
    """want_logprobs fills per-token log-probabilities of the chosen
    tokens (greedy: log-softmax at the argmax), one per emitted token,
    matching a direct forward recomputation."""
    params = _params()
    prompt = [5, 17, 99]
    n_new = 5
    eng = Engine(gpt2.forward, CFG, params, batch_slots=2)
    eng.submit(Request(id=0, prompt=prompt, max_new_tokens=n_new,
                       want_logprobs=True))
    eng.submit(Request(id=1, prompt=[7, 1], max_new_tokens=3))
    got = {r.id: r for r in eng.run()}
    r0 = got[0]
    assert len(r0.out_logprobs) == len(r0.out_tokens) == n_new
    assert got[1].out_logprobs == []

    # recompute: logprob of each emitted token from scratch
    cache = gpt2.new_cache(CFG, 1, dtype=jnp.float32)
    toks = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, cache = gpt2.forward(params, CFG, toks, cache, pos)
    cur = logits[:, -1, :]
    for j, t in enumerate(r0.out_tokens):
        lp = float(jax.nn.log_softmax(cur.astype(jnp.float32))[0, t])
        assert abs(lp - r0.out_logprobs[j]) < 1e-4, (j, lp,
                                                     r0.out_logprobs[j])
        nxt = jnp.asarray([[t]], jnp.int32)
        p = jnp.asarray([[len(prompt) + j]], jnp.int32)
        logits, cache = gpt2.forward(params, CFG, nxt, cache, p)
        cur = logits[:, -1, :]


def test_gptj_engine_stays_head_major():
    """Regression: GPT-J configs whose KV width is a multiple of 128 must
    NOT get the flat cache (gptj.forward is head-major only; the flat gate
    keys on supports_flat_kv, not on hasattr(n_head_kv))."""
    from ggmlsharp_tpu.models import gptj

    cfg = gptj.GPTJConfig(n_vocab=128, n_ctx=64, n_embd=128, n_head=4,
                          n_layer=2, rotary_dim=8)
    assert (cfg.n_head_kv * cfg.head_dim) % 128 == 0  # the trap condition
    params = gptj.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    eng = Engine(gptj.forward, cfg, params, batch_slots=2,
                 cache_dtype=jnp.float32)
    assert eng.cache.k[0].ndim == 4  # head-major
    for i, p in enumerate([[5, 17, 99], [7, 1]]):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=4))
    results = eng.run()
    for req in results:
        cache = gptj.new_cache(cfg, 1, dtype=jnp.float32)
        want, _ = sampling.generate(gptj.forward, cfg, params,
                                    jnp.asarray([req.prompt], jnp.int32),
                                    cache, 4)
        assert req.out_tokens == np.asarray(want)[0].tolist(), req.id


def test_gguf_export_rejects_swar_layout():
    """SWAR-layout QTensors cannot ride the GGUF wire; the export API must
    say so clearly instead of KeyError'ing."""
    import pytest

    from ggmlsharp_tpu import GType
    from ggmlsharp_tpu.io.gguf import save_gguf_gptj
    from ggmlsharp_tpu.models import gptj

    cfg = gptj.GPTJConfig(n_vocab=128, n_ctx=64, n_embd=256, n_head=4,
                          n_layer=1, rotary_dim=8)
    params = gptj.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    q = gptj.quantize_params(params, GType.Q4_0, swar=True)
    with pytest.raises(ValueError, match="swar=False"):
        save_gguf_gptj("/tmp/never-written.gguf", cfg, q)


def test_http_server_concurrent_mixed_load():
    """Stress the threading model: 12 concurrent clients mixing blocking,
    streaming, sampled, and logprob requests; every response is complete
    and greedy ones match sequential decode."""
    import json as _json
    import threading
    import urllib.request

    from ggmlsharp_tpu.serving import EngineServer

    params = _params()
    srv = EngineServer(Engine(gpt2.forward, CFG, params, batch_slots=3),
                       port=0).start()
    base = f"http://127.0.0.1:{srv.port}"
    out = [None] * 12

    def hit(i):
        body = {"prompt": [1 + i % 5, 17], "max_new_tokens": 4 + i % 3}
        if i % 4 == 1:
            body["stream"] = True
        if i % 4 == 2:
            body.update(temperature=0.8, top_p=0.9)
        if i % 4 == 3:
            body["logprobs"] = True
        req = urllib.request.Request(base + "/v1/generate",
                                     data=_json.dumps(body).encode())
        with urllib.request.urlopen(req, timeout=300) as r:
            raw = r.read()
        if body.get("stream"):
            lines = [_json.loads(ln) for ln in raw.splitlines() if ln]
            out[i] = lines[-1]
        else:
            out[i] = _json.loads(raw)

    try:
        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(12)]
        [t.start() for t in threads]
        [t.join(timeout=300) for t in threads]
        assert all(o is not None and o["error"] is None for o in out), out
        for i, o in enumerate(out):
            want_n = 4 + i % 3
            assert len(o["tokens"]) == want_n, (i, o)
            if i % 4 == 0:  # plain greedy: deterministic
                assert o["tokens"] == _sequential_greedy(
                    params, [1 + i % 5, 17], want_n)
            if i % 4 == 3:
                assert len(o["logprobs"]) == want_n
    finally:
        srv.stop()


def test_stop_sequences():
    """Multi-token stop sequences end generation at the matching suffix,
    in both the plain and speculative engines."""
    params = _params()
    base = _sequential_greedy(params, [5, 17, 99], 8)
    stop = [base[2], base[3]]

    def cut(seq, stops):  # expected output: truncate at first suffix hit
        out = []
        for t in seq:
            out.append(t)
            if any(len(out) >= len(x) and out[-len(x):] == x
                   for x in stops):
                return out
        return out

    want = cut(base, [stop])
    assert len(want) < len(base)  # the stop actually fires

    eng = Engine(gpt2.forward, CFG, params, batch_slots=1)
    eng.submit(Request(id=0, prompt=[5, 17, 99], max_new_tokens=8,
                       stop=[stop]))
    got = eng.run()[0].out_tokens
    assert got == want, (got, want)

    draft = gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    eng2 = Engine(gpt2.forward, CFG, params, batch_slots=1,
                  draft_forward=gpt2.forward, draft_cfg=CFG,
                  draft_params=draft, spec_k=3)
    eng2.submit(Request(id=0, prompt=[5, 17, 99], max_new_tokens=8,
                        stop=[stop]))
    got2 = eng2.run()[0].out_tokens
    assert got2 == want, (got2, want)


def test_spec_sampled_with_prefix_caching():
    """Sampled speculative requests over a registered prefix: top_k=1
    collapses to greedy, so output must equal the plain prefix-cached
    engine — including prompt == prefix."""
    params = _params()
    draft = gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    prefix = [9, 42, 17, 5, 60]
    prompts = [prefix + [7, 1], prefix, prefix + [3]]
    n_new = 5

    eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                 draft_forward=gpt2.forward, draft_cfg=CFG,
                 draft_params=draft, spec_k=2)
    pid = eng.register_prefix(prefix)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new,
                           prefix_id=pid, temperature=0.9, top_k=1))
    got = {r.id: r for r in eng.run()}

    for i, p in enumerate(prompts):
        assert got[i].error is None, got[i].error
        want = _sequential_greedy(params, p, n_new)
        assert got[i].out_tokens == want, (i, got[i].out_tokens, want)


def test_prefix_caching_int8_kv():
    """Prefix rows install into INT8 KV caches (quantized values + scale
    planes both scattered); decode matches the no-prefix INT8 engine."""
    from ggmlsharp_tpu.models import llama

    lcfg = llama.LlamaConfig(n_vocab=128, n_ctx=96, n_embd=256, n_head=4,
                             n_head_kv=2, n_layer=2, n_ff=512)
    params = llama.init_params(jax.random.PRNGKey(2), lcfg,
                               dtype=jnp.float32)
    prefix = [9, 42, 17, 5, 60]
    prompts = [prefix + [7, 1], prefix + [3, 3, 3]]
    n_new = 5

    def run(use_prefix):
        eng = Engine(llama.forward, lcfg, params, batch_slots=2,
                     cache_dtype=jnp.float32, int8_kv=True)
        pid = eng.register_prefix(prefix) if use_prefix else None
        for i, p in enumerate(prompts):
            eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new,
                               prefix_id=pid))
        return {r.id: r.out_tokens for r in eng.run()}

    plain = run(False)
    cached = run(True)
    assert cached == plain, (cached, plain)


def test_chunked_prefill_matches_full():
    """prefill_chunk splits long admissions across ticks (decode for live
    slots keeps progressing); outputs equal the unchunked engine."""
    params = _params()
    prompts = [[(i % 90) + 1 for i in range(11)], [5, 17],
               [(i % 80) + 2 for i in range(9)], [7]]
    n_new = 5

    eng0 = Engine(gpt2.forward, CFG, params, batch_slots=2)
    for i, p in enumerate(prompts):
        eng0.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    want = {r.id: r.out_tokens for r in eng0.run()}

    eng = Engine(gpt2.forward, CFG, params, batch_slots=2, prefill_chunk=4)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
    got = {r.id: r.out_tokens for r in eng.run()}
    assert got == want, (got, want)
    # long prompts took multiple prefill dispatches
    assert eng.stats()["prefill_dispatches"] > eng0.stats(
    )["prefill_dispatches"]


def test_chunked_prefill_interleaves_decode():
    """While slot A chunks a long prompt, slot B must keep emitting —
    the whole point of chunked prefill."""
    params = _params()
    order = []
    eng = Engine(gpt2.forward, CFG, params, batch_slots=2, prefill_chunk=2)
    eng.submit(Request(id=0, prompt=[5, 17], max_new_tokens=6,
                       on_token=lambda r, t: order.append(("short", t))))
    eng.submit(Request(
        id=1, prompt=[(i % 90) + 1 for i in range(12)], max_new_tokens=3,
        on_token=lambda r, t: order.append(("long", t))))
    got = {r.id: r for r in eng.run()}
    assert got[0].error is None and got[1].error is None
    # the short request emitted at least one token BEFORE the long one's
    # first token (its 6-chunk prefill spans ~6 ticks)
    kinds = [k for k, _ in order]
    assert "short" in kinds[: kinds.index("long")], order
    want1 = _sequential_greedy(params, got[1].prompt, 3)
    assert got[1].out_tokens == want1


def test_latency_stamps():
    """Requests carry submit/first-token/done timestamps; stats
    accumulates mean TTFT and latency across completed requests (drain-
    independent)."""
    params = _params()
    eng = Engine(gpt2.forward, CFG, params, batch_slots=1)
    eng.submit(Request(id=0, prompt=[5, 17], max_new_tokens=3))
    while eng.step_once():
        pass
    r = eng.run()[0]  # drains finished; stats must survive the drain
    st = eng.stats()
    assert st["mean_ttft_s"] is not None and st["mean_ttft_s"] > 0
    assert st["mean_latency_s"] >= st["mean_ttft_s"]
    assert r.t_submit < r.t_first_token <= r.t_done


def test_chunked_prefill_with_prefix():
    """Long suffixes over a registered prefix chunk across ticks; parity
    with the unchunked prefix-cached engine."""
    params = _params()
    prefix = [9, 42, 17, 5, 60]
    prompts = [prefix + [(i % 80) + 1 for i in range(11)], prefix + [7]]
    n_new = 4

    def run(chunk):
        eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                     prefill_chunk=chunk)
        pid = eng.register_prefix(prefix)
        for i, p in enumerate(prompts):
            eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new,
                               prefix_id=pid))
        return {r.id: r.out_tokens for r in eng.run()}

    want = run(None)
    got = run(4)
    assert got == want, (got, want)
    for i, p in enumerate(prompts):  # and vs plain full prefill
        assert want[i] == _sequential_greedy(params, p, n_new)


def test_spec_chunked_prefill():
    """Speculative engine with prefill_chunk: long prompts chunk (target
    then draft) while other slots keep speculating; greedy output equals
    the unchunked spec engine AND plain greedy."""
    params = _params()
    draft = gpt2.init_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    prompts = [[(i % 90) + 1 for i in range(13)], [5, 17],
               [(i % 70) + 3 for i in range(9)]]
    n_new = 5

    def run(chunk):
        eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                     draft_forward=gpt2.forward, draft_cfg=CFG,
                     draft_params=draft, spec_k=3, prefill_chunk=chunk)
        for i, p in enumerate(prompts):
            eng.submit(Request(id=i, prompt=p, max_new_tokens=n_new))
        return {r.id: r.out_tokens for r in eng.run()}

    want = run(None)
    got = run(4)
    assert got == want, (got, want)
    for i, p in enumerate(prompts):
        assert want[i] == _sequential_greedy(params, p, n_new), i
