"""Pipeline parallelism: GPipe-style microbatched layer-stage sharding.

SURVEY §2.11 marks PP as absent from the reference ("layer-stage sharding via
shard_map + collective-permute microbatching"). Implementation: the layer
stack is split into S contiguous stages sharded over a mesh axis; the batch
splits into M microbatches; at tick i stage s runs microbatch i−s and
forwards its activations to stage s+1 with jax.lax.ppermute. The schedule is
a lax.scan over S+M−1 ticks, so XLA overlaps each tick's compute with the
permute of the previous tick's activations.

`pipeline_forward` is the inference/forward pipeline (decode pipelining
composes with the TP/DP shardings in `sharding.py`). `pipeline_train_step`
is the 1F1B training schedule: stage s runs the forward of microbatch
i−s and the backward of microbatch i−2(S−1)+s at tick i, so the last stage
backpropagates each microbatch immediately after its forward and every
stage keeps at most 2(S−1−s)+1 activations in flight — the 1F1B memory
bound, vs GPipe's M.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipeline_forward(stage_fn, stacked_params, x, mesh, axis: str = "model",
                     n_micro: int | None = None):
    """Run x through a stack of L layers pipelined over `axis`.

    stage_fn(layer_params, h) -> h: applies ONE layer (vmapped-free, single
    microbatch). stacked_params: pytree whose leaves have leading dim L
    (L divisible by the axis size). x: [B, ...] with B divisible by n_micro.
    Returns [B, ...] (replicated), identical to applying the layers
    sequentially.
    """
    from jax import shard_map

    n_stages = mesh.shape[axis]
    B = x.shape[0]
    n_micro = n_micro or n_stages
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % n_stages == 0, (L, n_stages)

    param_specs = jax.tree.map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), stacked_params
    )

    def body(params_local, x_full):
        # params_local leaves: [L/S, ...]; x_full replicated [B, ...]
        s = jax.lax.axis_index(axis)
        x_mb = x_full.reshape(n_micro, mb, *x_full.shape[1:])
        ticks = n_stages + n_micro - 1

        def run_stage(h):
            def layer(h, lp):
                return stage_fn(lp, h), None

            h, _ = jax.lax.scan(layer, h, params_local)
            return h

        def tick(carry, i):
            recv, results = carry
            m = i - s  # microbatch index this stage works on
            active = (m >= 0) & (m < n_micro)
            inp = jnp.where(
                s == 0,
                x_mb[jnp.clip(m, 0, n_micro - 1)],
                recv,
            )
            out = run_stage(inp)
            out = jnp.where(active, out, jnp.zeros_like(out))
            # last stage collects finished microbatches
            is_last = s == n_stages - 1
            results = jax.lax.cond(
                active & is_last,
                lambda r: jax.lax.dynamic_update_slice_in_dim(
                    r, out[None], jnp.clip(m, 0, n_micro - 1), axis=0
                ),
                lambda r: r,
                results,
            )
            # forward to next stage (ring; last→0 link carries zeros)
            perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]
            nxt = jax.lax.ppermute(out, axis, perm)
            return (nxt, results), None

        recv0 = jnp.zeros((mb, *x_full.shape[1:]), x_full.dtype)
        res0 = jnp.zeros((n_micro, mb, *x_full.shape[1:]), x_full.dtype)
        (recv, results), _ = jax.lax.scan(
            tick, (recv0, res0), jnp.arange(ticks)
        )
        # only the last stage holds real results (zeros elsewhere) → psum
        results = jax.lax.psum(results, axis)
        return results.reshape(B, *x_full.shape[1:])

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, x)


def pipeline_train_step(stage_fn, loss_fn, stacked_params, x, y, mesh,
                        axis: str = "model", n_micro: int | None = None):
    """1F1B pipelined (loss, grads): equals the sequential computation.

    stage_fn(layer_params, h) -> h (one layer); loss_fn(out_mb, y_mb) ->
    scalar per microbatch (total = mean over microbatches). stacked_params
    leaves have leading dim L (divisible by the stage count); x/y: [B, ...]
    with B divisible by n_micro. Returns (loss, grads) with grads in the
    same stage-sharded layout as stacked_params.

    Schedule: tick i, stage s → forward of microbatch mf = i−s, backward of
    microbatch mb = i−2(S−1)+s. At the last stage mf == mb: the loss VJP is
    applied the same tick the microbatch finishes its forward (the "1F" and
    first "1B" coincide). Backward recomputes the stage forward from the
    stashed stage INPUT (activation-recompute 1F1B — stash depth 2(S−1)+1,
    independent of M). Activations flow with ppermute (+1 ring); gradients
    with the reverse ring.
    """
    from jax import shard_map

    S = mesh.shape[axis]
    B = x.shape[0]
    M = n_micro or S
    assert B % M == 0, (B, M)
    mb = B // M
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % S == 0, (L, S)
    depth = 2 * (S - 1) + 1

    param_specs = jax.tree.map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), stacked_params
    )

    def body(params_local, x_full, y_full):
        s = jax.lax.axis_index(axis)
        x_mb = x_full.reshape(M, mb, *x_full.shape[1:])
        y_mb = y_full.reshape(M, mb, *y_full.shape[1:])
        ticks = M + 2 * (S - 1)

        def run_stage(lp, h):
            def layer(h, p):
                return stage_fn(p, h), None

            h, _ = jax.lax.scan(layer, h, lp)
            return h

        perm_f = [(j, (j + 1) % S) for j in range(S)]
        perm_b = [(j, (j - 1) % S) for j in range(S)]
        gz = jax.tree.map(jnp.zeros_like, params_local)

        def tick(carry, i):
            recv_f, recv_g, stash, gacc, loss_sum = carry
            mf = i - s
            mb_i = i - 2 * (S - 1) + s
            act_f = (mf >= 0) & (mf < M)
            act_b = (mb_i >= 0) & (mb_i < M)

            # ---- forward of microbatch mf --------------------------------
            h_in = jnp.where(s == 0, x_mb[jnp.clip(mf, 0, M - 1)], recv_f)
            out_f = run_stage(params_local, h_in)
            # write gated on act_f: a clamped index on cooldown ticks would
            # clobber a slot whose backward hasn't run yet
            upd = jax.lax.dynamic_update_slice_in_dim(
                stash, h_in[None], mf % depth, axis=0)
            stash = jnp.where(act_f, upd, stash)

            # ---- backward of microbatch mb_i -----------------------------
            h_b = jax.lax.dynamic_index_in_dim(
                stash, mb_i % depth, axis=0, keepdims=False)
            # incoming cotangent: last stage takes the loss VJP of the
            # forward it JUST ran (mf == mb_i there); others take the ring
            is_last = s == S - 1

            def loss_cotangent():
                yb = y_mb[jnp.clip(mb_i, 0, M - 1)]
                _, lvjp = jax.vjp(
                    lambda o: loss_fn(o, yb) / M, out_f)
                return lvjp(jnp.float32(1.0))[0]

            g_in = jnp.where(is_last, loss_cotangent(), recv_g)
            _, svjp = jax.vjp(run_stage, params_local, h_b)
            gp, gh = svjp(g_in.astype(out_f.dtype))
            gacc = jax.tree.map(
                lambda a, g: a + jnp.where(act_b, g, jnp.zeros_like(g)),
                gacc, gp)

            # loss bookkeeping at the last stage
            lval = jnp.where(
                act_f & is_last,
                loss_fn(out_f, y_mb[jnp.clip(mf, 0, M - 1)]), 0.0)
            loss_sum = loss_sum + lval

            # ---- rings ---------------------------------------------------
            out_f = jnp.where(act_f, out_f, jnp.zeros_like(out_f))
            gh = jnp.where(act_b, gh, jnp.zeros_like(gh))
            nxt_f = jax.lax.ppermute(out_f, axis, perm_f)
            nxt_g = jax.lax.ppermute(gh, axis, perm_b)
            return (nxt_f, nxt_g, stash, gacc, loss_sum), None

        recv0 = jnp.zeros((mb, *x_full.shape[1:]), x_full.dtype)
        stash0 = jnp.zeros((depth, mb, *x_full.shape[1:]), x_full.dtype)
        (rf, rg, stash, gacc, loss_sum), _ = jax.lax.scan(
            tick, (recv0, jnp.zeros_like(recv0), stash0, gz,
                   jnp.float32(0.0)),
            jnp.arange(M + 2 * (S - 1)))
        loss = jax.lax.psum(loss_sum, axis) / M  # only last stage nonzero
        return loss, gacc

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, P(), P()),
        out_specs=(P(), param_specs),
        check_vma=False,
    )
    return fn(stacked_params, x, y)
