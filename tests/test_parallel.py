"""Multi-device tests on the 8-device virtual CPU mesh: sharded matmul
parity, ring attention vs single-device flash, dryrun entry, distributed
helpers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ggmlsharp_tpu.parallel import make_mesh, ring_attention
from ggmlsharp_tpu import ops

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    m = make_mesh(data=2, model=4)
    assert m.shape == {"data": 2, "model": 4}
    m2 = make_mesh()
    assert m2.shape["model"] == 8


def test_sharded_matmul_matches_single():
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    want = np.asarray(ops.mul_mat_f(w, x))
    with mesh:
        ws = jax.device_put(w, NamedSharding(mesh, P("model", None)))
        xs = jax.device_put(x, NamedSharding(mesh, P(None, None)))
        got = np.asarray(jax.jit(ops.mul_mat_f)(ws, xs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ring_attention_matches_flash():
    from ggmlsharp_tpu.parallel.ring_attention import ring_attention

    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(1)
    B, H, S, D = 2, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))

    got = np.asarray(ring_attention(q, k, v, mesh, seq_axis="model",
                                    causal=True))
    want = np.asarray(
        jax.jit(lambda a, b, c: ops.flash_attn(a, b, c, masked=True,
                                               use_pallas=False))(q, k, v)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ring_attention_non_causal():
    mesh = make_mesh(data=1, model=8)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 2, 32, 8)).astype(np.float32))
    got = np.asarray(ring_attention(q, q, q, mesh, causal=False))
    want = np.asarray(
        jax.jit(lambda a: ops.flash_attn(a, a, a, masked=False,
                                         use_pallas=False))(q)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_checkpointed_loop_resume(tmp_path):
    from ggmlsharp_tpu.parallel.distributed import CheckpointedLoop

    def step_fn(state, step):
        return jax.tree.map(lambda x: x + 1.0, state)

    d = str(tmp_path / "ck")
    loop = CheckpointedLoop(step_fn, d, every=5)
    state = loop.resume({"w": jnp.zeros((3,))})
    state = loop.run(state, 12)
    assert float(state["w"][0]) == 12.0

    # simulate a crash+relaunch: fresh loop resumes from the final checkpoint
    loop2 = CheckpointedLoop(step_fn, d, every=5)
    state2 = loop2.resume({"w": jnp.zeros((3,))})
    assert loop2.step == 12
    assert float(state2["w"][0]) == 12.0
    state2 = loop2.run(state2, 3)
    assert float(state2["w"][0]) == 15.0


def test_distributed_initialize_noop_single_process():
    from ggmlsharp_tpu.parallel.distributed import initialize

    assert initialize() is False  # single process → no-op


def test_pipeline_forward_matches_sequential():
    from ggmlsharp_tpu.parallel.pipeline import pipeline_forward
    from ggmlsharp_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, model=4)
    rng = np.random.default_rng(5)
    L, D, B = 8, 16, 8
    Ws = jnp.asarray(rng.standard_normal((L, D, D)).astype(np.float32) * 0.3)
    bs = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    def stage_fn(lp, h):
        W, b = lp
        return jnp.tanh(h @ W + b)

    got = np.asarray(
        pipeline_forward(stage_fn, (Ws, bs), x, mesh, axis="model", n_micro=4)
    )

    want = np.asarray(x)
    for l in range(L):
        want = np.tanh(want @ np.asarray(Ws[l]) + np.asarray(bs[l]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_pipeline_single_microbatch():
    from ggmlsharp_tpu.parallel.pipeline import pipeline_forward
    from ggmlsharp_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, model=2)
    rng = np.random.default_rng(6)
    Ws = jnp.asarray(rng.standard_normal((2, 8, 8)).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))

    def stage_fn(W, h):
        return h @ W

    got = np.asarray(pipeline_forward(stage_fn, Ws, x, mesh, n_micro=1))
    want = np.asarray(x) @ np.asarray(Ws[0]) @ np.asarray(Ws[1])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_ring_attention_model_integration():
    """Model-level sequence-parallel prefill: llama forward with
    GGML_TPU_ATTN=ring + a 4-device sequence mesh must match the legacy
    full-cache attention path (empty-cache prefill, GQA model)."""
    import os

    import numpy as np
    from jax.sharding import Mesh

    from ggmlsharp_tpu.models import llama, sampling
    from ggmlsharp_tpu.parallel import set_sequence_mesh

    cfg = llama.TINY_LLAMA
    params = llama.init_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(10), (2, 32), 0,
                              cfg.n_vocab).astype(jnp.int32)

    def prefill_logits():
        cache = llama.new_cache(cfg, 2, dtype=jnp.float32)
        prefill, _ = sampling.make_decode_fns(llama.forward, cfg)
        lg, _ = prefill(params, toks, cache)
        return np.asarray(lg)

    os.environ["GGML_TPU_ATTN"] = "legacy"
    try:
        want = prefill_logits()
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("seq",))
        set_sequence_mesh(mesh, "seq")
        os.environ["GGML_TPU_ATTN"] = "ring"
        got = prefill_logits()
    finally:
        os.environ.pop("GGML_TPU_ATTN", None)
        set_sequence_mesh(None)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pipeline_1f1b_train_step_matches_sequential():
    """1F1B pipelined (loss, grads) == sequential value_and_grad, for
    M == S and M > S microbatches."""
    import numpy as np
    from jax.sharding import Mesh

    from ggmlsharp_tpu.parallel.pipeline import pipeline_train_step

    L, D = 8, 16
    rng = np.random.default_rng(23)
    params = {
        "w": jnp.asarray(rng.standard_normal((L, D, D)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.standard_normal((L, D)).astype(np.float32) * 0.1),
    }

    def stage_fn(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    def loss_fn(out, y):
        return jnp.mean((out - y) ** 2)

    def sequential(params, x, y):
        def apply(x):
            h = x
            for i in range(L):
                h = stage_fn({"w": params["w"][i], "b": params["b"][i]}, h)
            return h

        M = x.shape[0] // mbs
        xm = x.reshape(M, mbs, D)
        ym = y.reshape(M, mbs, D)
        def tot(params):
            h = x
            for i in range(L):
                h = stage_fn({"w": params["w"][i], "b": params["b"][i]}, h)
            hm = h.reshape(M, mbs, D)
            return jnp.mean(
                jnp.stack([loss_fn(hm[m], ym[m]) for m in range(M)]))
        return jax.value_and_grad(tot)(params)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("model",))
    for M in (4, 8):
        B = 2 * M
        mbs = 2
        x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        want_l, want_g = sequential(params, x, y)
        got_l, got_g = pipeline_train_step(
            stage_fn, loss_fn, params, x, y, mesh, n_micro=M)
        np.testing.assert_allclose(float(got_l), float(want_l),
                                   rtol=1e-5, atol=1e-6)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(got_g[k]), np.asarray(want_g[k]),
                rtol=1e-4, atol=1e-5, err_msg=f"{k} M={M}")


@pytest.mark.slow
def test_pipeline_llama_forward_matches_sequential():
    """Model-level PP integration: llama.forward_pp (blocks staged over a
    4-way pipe mesh, microbatched GPipe schedule) must match the sequential
    cached forward's prefill logits."""
    import numpy as np
    from jax.sharding import Mesh

    from ggmlsharp_tpu.models import llama

    cfg = llama.LlamaConfig(
        n_vocab=256, n_ctx=64, n_embd=128, n_head=4, n_head_kv=2,
        n_layer=4, n_ff=256)
    params = llama.init_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    B, S = 4, 16
    toks = jax.random.randint(jax.random.PRNGKey(6), (B, S), 0,
                              cfg.n_vocab).astype(jnp.int32)

    cache = llama.new_cache(cfg, B, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    want, _ = llama.forward(params, cfg, toks, cache, pos)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("pipe",))
    got = llama.forward_pp(params, cfg, toks, mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # fused-qkv layout stacks and pipelines too (2-stage split)
    fused = llama.fuse_params(params)
    mesh2 = Mesh(np.array(jax.devices()[:2]).reshape(2), ("pipe",))
    got2 = llama.forward_pp(fused, cfg, toks, mesh2, n_micro=4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_engine_tensor_parallel_serving():
    """Engine(mesh=...): TP-sharded params + KV heads sharded over the
    model axis produce bit-identical outputs to the single-device engine,
    and the cache is actually distributed."""
    from ggmlsharp_tpu.models import llama
    from ggmlsharp_tpu.parallel import sharding as shd
    from ggmlsharp_tpu.serving import Engine, Request

    cfg = llama.TINY_LLAMA  # n_head_kv=2 divides the model axis below
    params = llama.init_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32)
    prompts = [[3, 7, 11], [5, 2], [9, 9, 9, 9, 1]]

    eng0 = Engine(llama.forward, cfg, params, batch_slots=2,
                  cache_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        eng0.submit(Request(id=i, prompt=p, max_new_tokens=6))
    want = {r.id: r.out_tokens for r in eng0.run()}

    mesh = make_mesh(data=4, model=2)
    sp = shd.shard_params(params, shd.llama_param_specs(), mesh)
    eng = Engine(llama.forward, cfg, sp, batch_slots=2,
                 cache_dtype=jnp.float32, mesh=mesh)
    k0 = eng.cache.k[0]
    assert not k0.sharding.is_fully_replicated, k0.sharding
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=6))
    got = {r.id: r.out_tokens for r in eng.run()}
    assert got == want, (got, want)


@pytest.mark.slow
def test_engine_tensor_parallel_gpt2():
    """GPT-2 TP serving: vocab-sharded embedding/lm-head + fused argmax
    over sharded logits matches the single-device engine."""
    from ggmlsharp_tpu.models import gpt2
    from ggmlsharp_tpu.parallel import sharding as shd
    from ggmlsharp_tpu.serving import Engine, Request

    cfg = gpt2.GPT2Config(n_vocab=128, n_ctx=64, n_embd=64, n_head=4,
                          n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    prompts = [[5, 17, 99], [7, 1]]

    eng0 = Engine(gpt2.forward, cfg, params, batch_slots=2,
                  cache_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        eng0.submit(Request(id=i, prompt=p, max_new_tokens=5))
    want = {r.id: r.out_tokens for r in eng0.run()}

    mesh = make_mesh(data=2, model=4)
    sp = shd.shard_params(params, shd.gpt2_param_specs(), mesh)
    eng = Engine(gpt2.forward, cfg, sp, batch_slots=2,
                 cache_dtype=jnp.float32, mesh=mesh)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=5))
    got = {r.id: r.out_tokens for r in eng.run()}
    assert got == want, (got, want)


@pytest.mark.slow
def test_engine_tensor_parallel_speculative():
    """Speculative continuous batching under a TP mesh: target + draft
    params sharded, both KV caches' heads sharded, greedy output equals
    the single-device spec engine."""
    from ggmlsharp_tpu.models import llama
    from ggmlsharp_tpu.parallel import sharding as shd
    from ggmlsharp_tpu.serving import Engine, Request

    cfg = llama.TINY_LLAMA
    tp = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    dp = llama.init_params(jax.random.PRNGKey(9), cfg, dtype=jnp.float32)
    prompts = [[3, 7, 11], [5, 2, 8, 1]]

    eng0 = Engine(llama.forward, cfg, tp, batch_slots=2,
                  cache_dtype=jnp.float32, draft_forward=llama.forward,
                  draft_cfg=cfg, draft_params=dp, spec_k=2)
    for i, p in enumerate(prompts):
        eng0.submit(Request(id=i, prompt=p, max_new_tokens=5))
    want = {r.id: r.out_tokens for r in eng0.run()}

    mesh = make_mesh(data=4, model=2)
    stp = shd.shard_params(tp, shd.llama_param_specs(), mesh)
    sdp = shd.shard_params(dp, shd.llama_param_specs(), mesh)
    eng = Engine(llama.forward, cfg, stp, batch_slots=2,
                 cache_dtype=jnp.float32, draft_forward=llama.forward,
                 draft_cfg=cfg, draft_params=sdp, spec_k=2, mesh=mesh)
    for i, p in enumerate(prompts):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=5))
    got = {r.id: r.out_tokens for r in eng.run()}
    assert got == want, (got, want)


@pytest.mark.slow
def test_engine_tp_prefix_caching():
    """Prefix rows install into the model-axis-sharded KV cache; decode
    parity with the unsharded prefix-cached engine."""
    from ggmlsharp_tpu.models import llama
    from ggmlsharp_tpu.parallel import sharding as shd
    from ggmlsharp_tpu.serving import Engine, Request

    cfg = llama.TINY_LLAMA
    params = llama.init_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32)
    prefix = [3, 7, 11, 2]
    prompts = [prefix + [5], prefix]

    def run(mesh, p):
        eng = Engine(llama.forward, cfg, p, batch_slots=2,
                     cache_dtype=jnp.float32, mesh=mesh)
        pid = eng.register_prefix(prefix)
        for i, pr in enumerate(prompts):
            eng.submit(Request(id=i, prompt=pr, max_new_tokens=4,
                               prefix_id=pid))
        return {r.id: r.out_tokens for r in eng.run()}

    want = run(None, params)
    mesh = make_mesh(data=4, model=2)
    sp = shd.shard_params(params, shd.llama_param_specs(), mesh)
    got = run(mesh, sp)
    assert got == want, (got, want)
