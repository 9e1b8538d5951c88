"""Checkpoint save/load for param trees (incl. QTensor planes) + optimizer
state. The reference has zero serialization (SURVEY §5).

Format: a self-contained npz layout (plane-flattened pytree) that round-trips
QTensors exactly (single-host, dependency-free), plus an orbax-backed
`save_checkpoint_sharded`/`load_checkpoint_sharded` pair for multi-host
sharded trees: each jax.Array is written per-shard by orbax and restored
with the shardings of a `like` tree — no host gather, no resharding copy.
"""
from __future__ import annotations

import json
import os

import numpy as np
import jax

from ..dtypes import GType
from ..quant.formats import QTensor


def _flatten_tree(tree, prefix="", materialize=True):
    """→ dict[path → numpy array], with QTensor planes as path/__q__/...
    materialize=False keeps jax.Arrays as-is (sharded saves must not
    gather to host)."""
    out = {}
    meta = {}
    mat = (lambda x: np.asarray(x)) if materialize else (lambda x: x)

    def walk(node, path):
        if isinstance(node, QTensor):
            meta[path] = {"gtype": int(node.gtype), "shape": list(node.shape)}
            for k, v in node.planes.items():
                out[f"{path}/__q__/{k}"] = mat(v)
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}" if path else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}/{i}")
            meta.setdefault("__lists__", []).append([path, len(node)])
        elif node is None:
            meta.setdefault("__none__", []).append(path)
        else:
            out[path] = mat(node)

    walk(tree, prefix)
    return out, meta


def _unflatten_tree(flat: dict, meta: dict):
    tree: dict = {}
    lists = {p: n for p, n in meta.get("__lists__", [])}
    nones = set(meta.get("__none__", []))
    qmeta = {k: v for k, v in meta.items() if k not in ("__lists__", "__none__")}

    def insert(path, value):
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    qplanes: dict[str, dict] = {}
    for key, arr in flat.items():
        if "/__q__/" in key:
            qpath, plane = key.split("/__q__/")
            qplanes.setdefault(qpath, {})[plane] = arr
        else:
            insert(key, arr)
    for qpath, planes in qplanes.items():
        m = qmeta[qpath]
        insert(qpath, QTensor(GType(m["gtype"]), tuple(m["shape"]), planes))
    for path in nones:
        insert(path, None)

    def listify(node, path=""):
        if isinstance(node, dict):
            keys = list(node.keys())
            if path in lists:
                return [listify(node[str(i)], f"{path}/{i}") for i in range(lists[path])]
            return {k: listify(v, f"{path}/{k}" if path else k) for k, v in node.items()}
        return node

    return listify(tree)


def save_checkpoint(path: str, tree, step: int | None = None):
    os.makedirs(path, exist_ok=True)
    flat, meta = _flatten_tree(tree)
    np.savez(os.path.join(path, "arrays.npz"), **flat)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"meta": meta, "step": step}, f)


def load_checkpoint(path: str):
    with open(os.path.join(path, "meta.json")) as f:
        m = json.load(f)
    z = np.load(os.path.join(path, "arrays.npz"))
    flat = {k: z[k] for k in z.files}
    return _unflatten_tree(flat, m["meta"]), m.get("step")


def save_checkpoint_sharded(path: str, tree, step: int | None = None):
    """Multi-host/sharded save via orbax: every jax.Array leaf (QTensor
    planes included) is written per-shard from its owning devices — no
    host gather. Structure/QTensor metadata rides the same meta.json as
    the npz format."""
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    flat, meta = _flatten_tree(tree, materialize=False)
    if jax.process_index() == 0:  # orbax coordinates the array save; the
        # sidecar file must not be written concurrently by every host
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"meta": meta, "step": step, "orbax": True}, f)
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(os.path.abspath(path), "arrays")
    ckptr.save(target, flat, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_sharded(path: str, like=None):
    """Restore an orbax checkpoint. `like`: optional tree with the same
    structure whose leaves supply restore shardings/dtypes (pass the
    freshly-sharded init tree for a resume-in-place on a mesh); without
    it, arrays restore unsharded."""
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "meta.json")) as f:
        m = json.load(f)
    ckptr = ocp.StandardCheckpointer()
    target = os.path.join(os.path.abspath(path), "arrays")
    if like is not None:
        flat_like, _ = _flatten_tree(like, materialize=False)
        abstract = {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype,
                                    sharding=getattr(v, "sharding", None))
            for k, v in flat_like.items()
        }
        flat = ckptr.restore(target, abstract)
    else:
        flat = ckptr.restore(target)
    return _unflatten_tree(flat, m["meta"]), m.get("step")
