"""Sharding rules: PartitionSpecs for model params, QTensor planes, KV cache.

Megatron-style tensor parallelism expressed as GSPMD annotations:
  * column-parallel (shard n_out over `model`): qkv projections, gate/up/fc —
    XLA all-gathers nothing; each shard computes its output slice.
  * row-parallel (shard k over `model`): wo / down / c_proj — XLA inserts the
    psum/reduce-scatter on the output.
  * KV cache shards its head axis over `model`, batch over `data`
    (BASELINE: "weights and KV-cache tensor-sharded over ICI").

QTensor planes inherit the logical weight's spec: a [n_out, k] weight packs
to qs[n_out, k/8] / d[n_out, k/32] etc. — same rank, same axis meaning, so
the spec carries over per-plane unchanged (all block formats pack along the
LAST axis only, and 256-multiples keep every plane divisible).
"""
from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..quant.formats import QTensor

COL = P("model", None)  # shard output features
ROW = P(None, "model")  # shard input features (psum on output)
REP = P()  # replicated


def shard_qtensor_spec(qt: QTensor, spec: P) -> dict:
    """Per-plane specs for a quantized 2-D weight sharded by `spec`."""
    return {k: spec for k in qt.planes}


def gpt2_param_specs():
    """PartitionSpec tree matching models.gpt2.init_params."""
    blk = {
        "ln_1": {"g": REP, "b": REP},
        "attn": {
            "c_attn_w": COL,
            "c_attn_b": P("model"),
            "c_proj_w": ROW,
            "c_proj_b": REP,
        },
        "ln_2": {"g": REP, "b": REP},
        "mlp": {
            "c_fc_w": COL,
            "c_fc_b": P("model"),
            "c_proj_w": ROW,
            "c_proj_b": REP,
        },
    }
    return {
        "wte": P("model", None),  # vocab-sharded embedding/lm-head
        "wpe": REP,
        "ln_f": {"g": REP, "b": REP},
        "blocks": blk,  # broadcast over the blocks list
        # SWAR lm-head copy (models.gpt2.quantize_params, swar=True):
        # replicated — SWAR planes are storage-order and cannot be
        # plane-sharded; TP runs document swar=False as the supported mode
        "lm_head": REP,
    }


def llama_param_specs():
    blk = {
        "attn_norm": REP,
        "wq": COL,
        "wk": COL,
        "wv": COL,
        "wqkv": COL,  # fused layout (models.llama.fuse_params)
        "wo": ROW,
        "ffn_norm": REP,
        "w_gate": COL,
        "w_up": COL,
        "w_gate_up": COL,
        "w_down": ROW,
    }
    return {
        "tok_embd": P("model", None),
        "norm": REP,
        "output": P("model", None),
        "blocks": blk,
    }


def kv_cache_spec():
    """Per-layer buffers [B, H_kv, T, D] — heads over model, batch over
    data; per-layer scales [B, H_kv, T, 1] likewise."""
    main = P("data", "model", None, None)
    return {
        "k": main,
        "v": main,
        "k_scale": main,
        "v_scale": main,
        "length": P("data"),
    }


def shard_cache(cache, specs, mesh):
    """device_put a models.kv_cache.KVCache according to kv_cache_spec()."""
    from ..models.kv_cache import KVCache

    def place(t, spec):
        if t is None:
            return None
        return tuple(
            jax.device_put(x, NamedSharding(mesh, spec)) for x in t
        )

    return KVCache(
        place(cache.k, specs["k"]),
        place(cache.v, specs["v"]),
        place(cache.k_scale, specs["k_scale"]),
        place(cache.v_scale, specs["v_scale"]),
        jax.device_put(cache.length, NamedSharding(mesh, specs["length"])),
    )


def _spec_for(path_spec, value):
    if isinstance(value, QTensor):
        return QTensor(
            value.gtype, value.shape,
            {k: path_spec for k in value.planes},
        )
    return path_spec


def shard_params(params, specs, mesh):
    """device_put a param tree according to a spec tree. The specs tree may
    use a single `blocks` dict broadcast across the blocks list. QTensor
    leaves get their logical spec applied to every plane."""

    def place(p, s):
        if isinstance(p, QTensor):
            planes = {
                k: jax.device_put(v, NamedSharding(mesh, s))
                for k, v in p.planes.items()
            }
            return QTensor(p.gtype, p.shape, planes)
        if p is None:
            return None
        return jax.device_put(p, NamedSharding(mesh, s))

    def walk(p, s):
        if isinstance(p, dict):
            # keys absent from the spec tree replicate (e.g. aux params a
            # model's quantize_params adds after the spec was written) —
            # an opaque KeyError here is never the right failure mode
            return {k: walk(v, (s.get(k, REP) if isinstance(s, dict)
                                else s))
                    for k, v in p.items()}
        if isinstance(p, list):
            return [walk(v, s) for v in p]
        return place(p, s)

    return walk(params, specs)
