"""Multi-step decode window tests (serving.engine multi_step): the W-token
jit-resident window must be token-for-token identical to single-step ticks —
including eos / stop-sequence truncation mid-window, mixed per-slot budgets
(the traced clamp), logprobs, streaming gating, and admission interaction.

The reference has no serving layer (SURVEY §1); this covers the round-2
VERDICT item 3 / ADVICE findings on the previously-untested window path.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ggmlsharp_tpu.models import gpt2
from ggmlsharp_tpu.serving import Engine, Request
import pytest

pytestmark = pytest.mark.slow  # full engine/kernel flows; fast loop skips

CFG = gpt2.GPT2Config(n_vocab=128, n_ctx=96, n_embd=64, n_head=4, n_layer=2)


def _params():
    return gpt2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _run(params, reqs, multi_step, **kw):
    eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                 multi_step=multi_step, **kw)
    for r in reqs:
        eng.submit(r)
    return eng.run(), eng


def _mk_reqs(**overrides):
    prompts = [[5, 17, 99], [7, 1, 2, 3, 4, 5, 6, 8], [11], [3, 3, 3, 3]]
    return [Request(id=i, prompt=p, max_new_tokens=24, **overrides)
            for i, p in enumerate(prompts)]


def test_window_matches_single_step_greedy():
    """multi_step=8 output (tokens AND logprobs) must be bit-identical to
    multi_step=1 across slot recycling (4 requests, 2 slots)."""
    params = _params()
    base, _ = _run(params, _mk_reqs(want_logprobs=True), multi_step=1)
    win, eng = _run(params, _mk_reqs(want_logprobs=True), multi_step=8)
    # the window path actually ran (while_loop or host-chained machinery)
    assert eng._multi is not None or eng._chain is not None
    for a, b in zip(base, win):
        assert a.out_tokens == b.out_tokens, (a.id, a.out_tokens, b.out_tokens)
        np.testing.assert_allclose(a.out_logprobs, b.out_logprobs,
                                   rtol=1e-5, atol=1e-6)


def test_window_eos_truncates_mid_window():
    """A slot hitting eos inside a window stops exactly there (same place
    single-step stops) and frees its slot for the next pending request."""
    params = _params()
    # discover the greedy stream, then pick an eos whose FIRST occurrence
    # lands strictly inside a window (not on an 8-boundary)
    probe, _ = _run(params, [Request(id=0, prompt=[5, 17, 99],
                                     max_new_tokens=24)], multi_step=1)
    stream = probe[0].out_tokens
    pos = next(p for p, t in enumerate(stream)
               if stream.index(t) == p and (p + 1) % 8 != 0)
    eos = stream[pos]

    def reqs():
        return [Request(id=0, prompt=[5, 17, 99], max_new_tokens=24,
                        eos_id=eos),
                Request(id=1, prompt=[11], max_new_tokens=24),
                Request(id=2, prompt=[3, 3, 3, 3], max_new_tokens=24)]

    base, _ = _run(params, reqs(), multi_step=1)
    win, _ = _run(params, reqs(), multi_step=8)
    for a, b in zip(base, win):
        assert a.out_tokens == b.out_tokens, (a.id, a.out_tokens, b.out_tokens)
    assert win[0].out_tokens[-1] == eos
    assert len(win[0].out_tokens) == pos + 1


def test_window_stop_sequence_mid_window():
    """Stop sequences spanning a window boundary truncate identically to
    single-step ticks."""
    params = _params()
    probe, _ = _run(params, [Request(id=0, prompt=[7, 1, 2, 3],
                                     max_new_tokens=24)], multi_step=1)
    stream = probe[0].out_tokens

    def first_match(seq):
        n = len(seq)
        return next(p for p in range(len(stream) - n + 1)
                    if stream[p : p + n] == list(seq))

    # first 3-gram whose FIRST occurrence ends strictly inside a window
    pos, stop = next(
        (p, stream[p : p + 3]) for p in range(2, len(stream) - 3)
        if first_match(stream[p : p + 3]) == p and (p + 3) % 8 != 0)

    def reqs():
        return [Request(id=0, prompt=[7, 1, 2, 3], max_new_tokens=24,
                        stop=[stop])]

    base, _ = _run(params, reqs(), multi_step=1)
    win, _ = _run(params, reqs(), multi_step=8)
    assert base[0].out_tokens == win[0].out_tokens
    assert win[0].out_tokens[-3:] == stop
    assert len(win[0].out_tokens) == pos + 3


def test_window_clamps_to_smallest_budget():
    """Mixed budgets: the window clamps to the smallest remaining budget
    (traced — ONE executable), no slot overshoots, outputs match
    single-step."""
    params = _params()

    def reqs():
        return [Request(id=0, prompt=[5, 17, 99], max_new_tokens=3),
                Request(id=1, prompt=[11], max_new_tokens=21)]

    base, _ = _run(params, reqs(), multi_step=1)
    win, eng = _run(params, reqs(), multi_step=8)
    for a, b in zip(base, win):
        assert a.out_tokens == b.out_tokens
        assert len(b.out_tokens) == b.max_new_tokens  # exactly the budget
    # the traced clamp means windows of length 3, 8, ... share executables:
    # at most one compile per t_eff length-bucket, never per window length
    # (the host-chained formulation shares ONE step executable by design,
    # so the bound only needs checking on the while_loop machinery)
    if eng._multi is not None:
        from ggmlsharp_tpu.models.sampling import length_bucket
        n_buckets = len({length_bucket(n, eng.max_len)
                         for n in range(1, 30 + eng.multi_step)})
        assert eng._multi._cache_size() <= n_buckets


def test_window_streaming_gating():
    """Slots with on_token force single-step (per-token latency) unless
    stream_bursts=True; both produce identical tokens, and the callback
    sees every token in order either way."""
    params = _params()

    def reqs(seen):
        return [Request(id=0, prompt=[5, 17, 99], max_new_tokens=12,
                        on_token=lambda r, t: seen.append(t))]

    seen1, seen2 = [], []
    r1, e1 = _run(params, reqs(seen1), multi_step=8)
    r2, e2 = _run(params, reqs(seen2), multi_step=8, stream_bursts=True)
    assert r1[0].out_tokens == r2[0].out_tokens
    assert seen1 == r1[0].out_tokens and seen2 == r2[0].out_tokens
    assert e1._multi is None and e1._chain is None  # gated: no window
    # opt-in bursts rode the window (either machinery)
    assert e2._multi is not None or e2._chain is not None


def test_window_interacts_with_admission():
    """Pending requests force single-step ticks until admitted; the window
    resumes after. Submitting mid-run (between ticks) must not corrupt
    outputs vs the same schedule on a single-step engine."""
    params = _params()

    def drive(multi_step):
        eng = Engine(gpt2.forward, CFG, params, batch_slots=2,
                     multi_step=multi_step)
        eng.submit(Request(id=0, prompt=[5, 17, 99], max_new_tokens=16))
        out = []
        ticks = 0
        while eng.pending or any(s is not None for s in eng.slots):
            eng.step_once()
            ticks += 1
            if ticks == 2:  # arrives while slot 0 is mid-window cadence
                eng.submit(Request(id=1, prompt=[11], max_new_tokens=16))
        out, eng.finished = eng.finished, []
        return sorted(out, key=lambda r: r.id)

    base = drive(1)
    win = drive(8)
    for a, b in zip(base, win):
        assert a.out_tokens == b.out_tokens, (a.id, a.out_tokens, b.out_tokens)


def test_window_respects_cache_headroom():
    """Near max_len the window clamps so decode never writes past the
    cache; output equals single-step and stops at the budget cap."""
    params = _params()

    def reqs():
        # prompt 3 + budget 29 = 32 = max_len exactly
        return [Request(id=0, prompt=[5, 17, 99], max_new_tokens=40)]

    base_eng = Engine(gpt2.forward, CFG, params, batch_slots=1, max_len=32,
                      multi_step=1)
    win_eng = Engine(gpt2.forward, CFG, params, batch_slots=1, max_len=32,
                     multi_step=8)
    for eng in (base_eng, win_eng):
        for r in reqs():
            eng.submit(r)
    base = base_eng.run()
    win = win_eng.run()
    assert base[0].out_tokens == win[0].out_tokens
    assert len(win[0].out_tokens) == 29  # clamped to max_len - len(prompt)


def test_window_stats_count_every_token():
    """Engine stats must count window-emitted tokens identically to
    single-step (tokens_emitted, finished, ticks decrease)."""
    params = _params()
    base, be = _run(params, _mk_reqs(), multi_step=1)
    win, we = _run(params, _mk_reqs(), multi_step=8)
    bs, ws = be.stats(), we.stats()
    assert ws["tokens_emitted"] == bs["tokens_emitted"] == \
        sum(len(r.out_tokens) for r in win)
    assert len(win) == len(base) == 4
    assert ws["ticks"] < bs["ticks"]  # the whole point of the window


def test_speculative_admission_behind_window():
    """When every live slot's remaining budget fits the window, the next
    admission wave's prefill is dispatched BEFORE the window fetch
    (speculative admission). Outputs stay token-identical to single-step;
    the stats counter proves the overlapped path actually ran."""
    params = _params()
    base, _ = _run(params, _mk_reqs(), multi_step=1)
    # multi_step >= budget: the first window drains the whole wave with
    # requests still pending -> both slots pre-admit behind the fetch
    win, eng = _run(params, _mk_reqs(), multi_step=32)
    st = eng.stats()
    assert st["speculative_admissions"] > 0, st
    for a, b in zip(base, win):
        assert a.out_tokens == b.out_tokens, (a.id, a.out_tokens, b.out_tokens)


def test_speculative_admission_early_stop_inside_window():
    """A pre-admitted slot whose request stops EARLY inside the window
    (stop sequence) still truncates at the right token and the next
    request's output is unaffected (its prefill overwrote the dead rows)."""
    params = _params()
    probe, _ = _run(params, [Request(id=0, prompt=[5, 17, 99],
                                     max_new_tokens=24)], multi_step=1)
    stream = probe[0].out_tokens
    stop_tok = stream[10]  # stops strictly inside the 24-token budget
    reqs = lambda: [
        Request(id=0, prompt=[5, 17, 99], max_new_tokens=24,
                stop=[[stop_tok]]),
        Request(id=1, prompt=[7, 1, 2, 3, 4, 5, 6, 8], max_new_tokens=24),
        Request(id=2, prompt=[11], max_new_tokens=24),
        Request(id=3, prompt=[3, 3, 3, 3], max_new_tokens=24),
    ]
    base, _ = _run(params, reqs(), multi_step=1)
    win, eng = _run(params, reqs(), multi_step=32)
    assert eng.stats()["speculative_admissions"] > 0
    for a, b in zip(base, win):
        assert a.out_tokens == b.out_tokens, (a.id, a.out_tokens, b.out_tokens)


def test_window_pipelining_multi_wave():
    """Six admission waves through the depth-4 window pipeline (every wave
    drains fully -> windows chain device-side): outputs token-identical to
    single-step, all requests complete."""
    params = _params()
    prompts = [[5, 17, 99], [7, 1, 2], [11], [3, 3, 3, 3],
               [9, 9], [2, 4, 6], [1], [8, 8, 8], [13, 21], [34, 55],
               [6, 7], [10, 20, 30]]
    mk = lambda: [Request(id=i, prompt=p, max_new_tokens=12)
                  for i, p in enumerate(prompts)]
    base, _ = _run(params, mk(), multi_step=1)
    win, eng = _run(params, mk(), multi_step=16)
    assert eng.stats()["speculative_admissions"] >= 8, eng.stats()
    assert len(win) == len(base) == 12
    for a, b in zip(base, win):
        assert a.out_tokens == b.out_tokens, (a.id, a.out_tokens, b.out_tokens)
