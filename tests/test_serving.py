"""Continuous-batching engine tests: engine outputs must equal sequential
single-request greedy decoding; slots recycle; mixed prompt lengths."""
import numpy as np
import jax
import jax.numpy as jnp

from ggmlsharp_tpu.models import gpt2, sampling
from ggmlsharp_tpu.serving import Engine, Request

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


def test_engine_eos_stops_early():
    params = _params()
    # find the first greedy token, use it as eos → stops after 1 token
    first = _sequential_greedy(params, [5, 17, 99], 1)[0]
    eng = Engine(gpt2.forward, CFG, params, batch_slots=1)
    eng.submit(Request(id=0, prompt=[5, 17, 99], max_new_tokens=8, eos_id=first))
    results = eng.run()
    assert results[0].out_tokens == [first]
