"""Multichip dry-run: compile + execute one sharded training step AND one
sharded quantized decode step on an n-device mesh with tiny shapes.

Exercises the real production shardings (TP column/row-parallel weights, TP
KV-cache heads, DP batch) so the driver can validate the multi-chip path on
virtual CPU devices without hardware.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..dtypes import GType
from ..models import llama, sampling
from . import sharding as shd
from .mesh import make_mesh


def _tiny_cfg():
    return llama.LlamaConfig(
        n_vocab=512, n_ctx=64, n_embd=256, n_head=8, n_head_kv=4,
        n_layer=2, n_ff=512,
    )


def run(n_devices: int) -> None:
    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    data = 2 if n_devices % 2 == 0 and n_devices > 2 else 1
    mesh = make_mesh(data=data, model=n_devices // data, devices=devices)
    cfg = _tiny_cfg()
    B, S = data * 2, 16

    with mesh:
        params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        params = shd.shard_params(params, shd.llama_param_specs(), mesh)
        tokens = jax.device_put(
            jax.random.randint(jax.random.PRNGKey(1), (B, S + 1), 0, cfg.n_vocab),
            NamedSharding(mesh, P("data", None)),
        )

        # --- one TP+DP training step (loss → grads → adam-style update) ---
        def loss_fn(p, toks):
            inp, tgt = toks[:, :-1], toks[:, 1:]
            cache = llama.new_cache(cfg, B, dtype=jnp.float32)
            positions = jnp.broadcast_to(
                jnp.arange(S, dtype=jnp.int32)[None, :], inp.shape
            )
            logits, _ = llama.forward(p, cfg, inp, cache, positions)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
            return jnp.mean(nll)

        @jax.jit
        def train_step(p, toks):
            loss, g = jax.value_and_grad(loss_fn)(p, toks)
            new_p = jax.tree.map(lambda w, gw: w - 1e-3 * gw, p, g)
            return loss, new_p

        loss, params2 = train_step(params, tokens)
        loss = float(loss)
        assert loss == loss, "training-step loss is NaN"
        print(f"[dryrun] sharded train step ok on {n_devices} devices "
              f"(mesh data={data}, model={n_devices//data}): loss={loss:.4f}")

        # --- one TP+DP quantized decode step over a sharded INT8 KV cache ---
        # swar=False: TP shards the (N, ·)-oriented planes (llama_param_specs)
        qparams = llama.quantize_params(params, GType.Q4_0, swar=False)
        qparams = shd.shard_params(qparams, shd.llama_param_specs(), mesh)
        cache = llama.new_cache(cfg, B, int8=True, flat=False)  # TP shards the head-major layout
        cache = shd.shard_cache(cache, shd.kv_cache_spec(), mesh)
        prefill, step = sampling.make_decode_fns(llama.forward, cfg)
        logits, cache = prefill(qparams, tokens[:, :S], cache)
        tok = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
        logits, cache = step(qparams, tok, cache)
        jax.block_until_ready(logits)
        print(f"[dryrun] sharded Q4_0 decode step ok: logits {logits.shape}")

        # --- overlapped ring reduce-scatter matmul (comm/compute overlap) --
        from ..quant.quantize import quantize
        from .overlap import row_parallel_mul_mat_overlapped

        w = jax.random.normal(jax.random.PRNGKey(3), (256, 32 * n_devices * 8),
                              jnp.float32) * 0.1
        qw = quantize(w, GType.Q4_0)
        xx = jax.random.normal(jax.random.PRNGKey(4), (2, w.shape[1]),
                               jnp.float32)
        y = row_parallel_mul_mat_overlapped(qw, xx, mesh, axis="model",
                                            use_pallas=False)
        jax.block_until_ready(y)
        print(f"[dryrun] overlapped ring reduce-scatter matmul ok: {y.shape}")

        # --- 1F1B pipelined training step over the model axis -------------
        from .pipeline import pipeline_train_step

        S_pp = mesh.shape["model"]
        Lpp, Dpp = 2 * S_pp, 16
        pp_params = {
            "w": jax.random.normal(jax.random.PRNGKey(5), (Lpp, Dpp, Dpp),
                                   jnp.float32) * 0.3,
        }

        def stage_fn(p, h):
            return jnp.tanh(h @ p["w"])

        def pp_loss(o, y):
            return jnp.mean((o - y) ** 2)

        xpp = jax.random.normal(jax.random.PRNGKey(6), (2 * S_pp, Dpp),
                                jnp.float32)
        ypp = jax.random.normal(jax.random.PRNGKey(7), (2 * S_pp, Dpp),
                                jnp.float32)
        lpp, gpp = pipeline_train_step(stage_fn, pp_loss, pp_params,
                                       xpp, ypp, mesh)
        assert float(lpp) == float(lpp), "1F1B loss is NaN"
        print(f"[dryrun] 1F1B pipeline train step ok: loss={float(lpp):.4f}")

    # --- model-level pipeline-parallel scoring forward (llama blocks
    # staged over a dedicated pipe mesh, GPipe microbatching) -------------
    from jax.sharding import Mesh
    import numpy as np

    pipe_mesh = Mesh(np.array(devices).reshape(n_devices), ("pipe",))
    pp_cfg = llama.LlamaConfig(
        n_vocab=512, n_ctx=64, n_embd=256, n_head=8, n_head_kv=4,
        n_layer=n_devices, n_ff=512)
    fp = llama.init_params(jax.random.PRNGKey(8), pp_cfg, dtype=jnp.float32)
    pp_toks = jax.random.randint(jax.random.PRNGKey(9), (4, 16), 0,
                                 pp_cfg.n_vocab).astype(jnp.int32)
    pp_logits = llama.forward_pp(fp, pp_cfg, pp_toks, pipe_mesh, n_micro=2)
    jax.block_until_ready(pp_logits)
    print(f"[dryrun] PP llama forward ok: logits {pp_logits.shape} "
          f"over {n_devices} stages")

    # --- TP continuous-batching serving over the same mesh ---------------
    _run_serving(mesh, cfg)


def _run_serving(mesh, cfg):
    """Tensor-parallel continuous-batching engine on the mesh: admits a
    burst (grouped prefill), runs a few ticks, and checks outputs."""
    from ..serving import Engine, Request

    params = llama.init_params(jax.random.PRNGKey(1), cfg,
                               dtype=jnp.float32)
    params = shd.shard_params(params, shd.llama_param_specs(), mesh)
    eng = Engine(llama.forward, cfg, params, batch_slots=2,
                 cache_dtype=jnp.float32, mesh=mesh)
    for i, p in enumerate([[3, 7, 11], [5, 2], [9, 9, 9, 1]]):
        eng.submit(Request(id=i, prompt=p, max_new_tokens=3))
    results = eng.run()
    assert len(results) == 3 and all(
        len(r.out_tokens) == 3 and r.error is None for r in results)
    print(f"[dryrun] TP serving engine ok: "
          f"{[r.out_tokens for r in results]}")
