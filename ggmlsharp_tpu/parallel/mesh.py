"""Device mesh construction over {data, model} axes.

Axis convention (scaling-book style): `model` rides ICI within a host/slice
(tensor parallelism for weights + KV heads); `data` spans hosts/DCN
(batch/data parallelism, continuous-batching slots).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_hybrid_mesh(model_per_host: int | None = None) -> Mesh:
    """DCN-aware {data, model} mesh for multi-host runs (after
    `distributed.initialize`): the `model` axis stays WITHIN a host/slice so
    its collectives (all-gather/reduce-scatter in the TP matmuls) ride ICI,
    and `data` spans hosts so only batch-grain traffic (none at decode
    steady-state) crosses DCN. Uses mesh_utils.create_hybrid_device_mesh
    when multiple processes are present; falls back to make_mesh on one."""
    n_proc = jax.process_count()
    local = jax.local_device_count()
    model = model_per_host or local
    if n_proc <= 1:
        return make_mesh(model=model)
    from jax.experimental import mesh_utils

    # host (process) granules: `data` crosses hosts, `model` stays local.
    # (On a multi-SLICE pod, drop process_is_granule so DCN granules are
    # slices — each slice's ICI then carries the model axis.)
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, model),
        dcn_mesh_shape=(n_proc, 1),
        process_is_granule=True,
    )
    return Mesh(arr, ("data", "model"))


def make_mesh(data: int | None = None, model: int | None = None,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and model is None:
        model = n
        data = 1
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    assert data * model <= n, (data, model, n)
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))
