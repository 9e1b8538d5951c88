"""Device mesh construction over {data, model} axes.

Axis convention (scaling-book style): `model` rides ICI within a host/slice
(tensor parallelism for weights + KV heads); `data` spans hosts/DCN
(batch/data parallelism, continuous-batching slots).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


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
