"""Pipeline parallelism: GPipe-style microbatched layer-stage sharding.

SURVEY §2.11 marks PP as absent from the reference ("layer-stage sharding via
shard_map + collective-permute microbatching"). Implementation: the layer
stack is split into S contiguous stages sharded over a mesh axis; the batch
splits into M microbatches; at tick i stage s runs microbatch i−s and
forwards its activations to stage s+1 with jax.lax.ppermute. The schedule is
a lax.scan over S+M−1 ticks, so XLA overlaps each tick's compute with the
permute of the previous tick's activations.

This is the inference/forward pipeline (decode pipelining composes with the
TP/DP shardings in `sharding.py`); the same schedule reversed gives 1F1B for
training — future work.
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
    from jax.experimental.shard_map import shard_map

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
        check_rep=False,
    )
    return fn(stacked_params, x)
