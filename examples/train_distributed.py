"""Sharded training with checkpoint-resume: TP+DP GPT-2 on a device mesh
driven by the CheckpointedLoop (fault-tolerant loop; SURVEY §5 recovery).

    python examples/train_distributed.py [--steps 30] [--ckpt /tmp/ck]

Runs on whatever devices exist (8 virtual CPU devices in tests; a pod slice
in production after parallel.distributed.initialize()).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--ckpt", default="/tmp/ggml_tpu_train_ck")
    ap.add_argument("--data", type=int, default=None)
    ap.add_argument("--model", type=int, default=None)
    args = ap.parse_args()

    from ggmlsharp_tpu.models import gpt2, kv_cache as kvc
    from ggmlsharp_tpu.parallel import gpt2_param_specs, make_mesh, shard_params
    from ggmlsharp_tpu.parallel.distributed import CheckpointedLoop, initialize

    initialize()  # multi-host no-op when single process
    mesh = make_mesh(data=args.data, model=args.model)
    print("mesh:", dict(mesh.shape))

    cfg = gpt2.GPT2Config(n_vocab=512, n_ctx=64, n_embd=256, n_head=8, n_layer=2)
    B, S = 2 * mesh.shape["data"], 32

    with mesh:
        params = gpt2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        params = shard_params(params, gpt2_param_specs(), mesh)
        data = jax.random.randint(jax.random.PRNGKey(1), (B, S + 1), 0, cfg.n_vocab)

        def loss_fn(p, toks):
            inp, tgt = toks[:, :-1], toks[:, 1:]
            cache = gpt2.new_cache(cfg, B, dtype=jnp.float32)
            pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], inp.shape)
            logits, _ = gpt2.forward(p, cfg, inp, cache, pos)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], axis=-1))

        @jax.jit
        def sgd_step(p, toks):
            loss, g = jax.value_and_grad(loss_fn)(p, toks)
            return jax.tree.map(lambda w, gw: w - 0.1 * gw, p, g), loss

        losses = []

        def step_fn(state, step):
            state, loss = sgd_step(state, data)
            losses.append(float(loss))
            return state

        loop = CheckpointedLoop(step_fn, args.ckpt, every=10)
        state = loop.resume(params)
        print(f"resumed at step {loop.step}")
        state = loop.run(state, args.steps)
        print(f"step {loop.step}: loss {losses[0]:.4f} -> {losses[-1]:.4f}")
        print(f"checkpoints in {args.ckpt}: {sorted(os.listdir(args.ckpt))[-1]}")


if __name__ == "__main__":
    main()
