"""GPT-2 (BASELINE configs 1-2: 124M Q8_0 single-chip decode; 774M Q4 ppl).

Classic architecture: learned position embeddings, pre-LN blocks, fused-QKV
attention, GELU MLP, weight-tied LM head. Built from ggmlsharp_tpu ops so
weight tensors can be dense arrays or QTensor block-quant planes.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import ops
from ..quant.formats import QTensor
from ..quant.quantize import dequantize, quantize
from ..dtypes import GType
from . import kv_cache as kvc
from ..kernels.mlp_fused import _MAX_FUSED_B
from .common import cached_attention, linear, merge_heads, split_heads


@dataclass(frozen=True)
class GPT2Config:
    n_vocab: int = 50257
    n_ctx: int = 1024
    n_embd: int = 768
    n_head: int = 12
    n_layer: int = 12
    ln_eps: float = 1e-5

    @property
    def head_dim(self):
        return self.n_embd // self.n_head


GPT2_124M = GPT2Config()
GPT2_355M = GPT2Config(n_embd=1024, n_head=16, n_layer=24)
GPT2_774M = GPT2Config(n_embd=1280, n_head=20, n_layer=36)
GPT2_TINY = GPT2Config(  # test-scale config
    n_vocab=256, n_ctx=128, n_embd=128, n_head=4, n_layer=2)
GPT2_1558M = GPT2Config(n_embd=1600, n_head=25, n_layer=48)


def init_params(rng, cfg: GPT2Config, dtype=jnp.bfloat16):
    """Random init (for benchmarking and tests; real weights via io.gguf /
    io.hf)."""
    ks = jax.random.split(rng, 4 + cfg.n_layer)
    sd = 0.02

    def w(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * sd).astype(dtype)

    p = {
        "wte": w(ks[0], cfg.n_vocab, cfg.n_embd),
        "wpe": w(ks[1], cfg.n_ctx, cfg.n_embd),
        "ln_f": {"g": jnp.ones((cfg.n_embd,), dtype), "b": jnp.zeros((cfg.n_embd,), dtype)},
        "blocks": [],
    }
    for i in range(cfg.n_layer):
        kk = jax.random.split(ks[4 + i], 4)
        p["blocks"].append(
            {
                "ln_1": {"g": jnp.ones((cfg.n_embd,), dtype), "b": jnp.zeros((cfg.n_embd,), dtype)},
                "attn": {
                    "c_attn_w": w(kk[0], 3 * cfg.n_embd, cfg.n_embd),
                    "c_attn_b": jnp.zeros((3 * cfg.n_embd,), dtype),
                    "c_proj_w": w(kk[1], cfg.n_embd, cfg.n_embd),
                    "c_proj_b": jnp.zeros((cfg.n_embd,), dtype),
                },
                "ln_2": {"g": jnp.ones((cfg.n_embd,), dtype), "b": jnp.zeros((cfg.n_embd,), dtype)},
                "mlp": {
                    "c_fc_w": w(kk[2], 4 * cfg.n_embd, cfg.n_embd),
                    "c_fc_b": jnp.zeros((4 * cfg.n_embd,), dtype),
                    "c_proj_w": w(kk[3], cfg.n_embd, 4 * cfg.n_embd),
                    "c_proj_b": jnp.zeros((cfg.n_embd,), dtype),
                },
            }
        )
    return p


def quantize_params(params, gtype: GType, min_cols: int = 256,
                    pad_rows_to: int | None = None, search: bool = False,
                    swar: bool | None = None):
    """Weight-only quantization of every matmul weight (embeddings included).
    Biases/layernorms stay float (matching llama.cpp's policy). Weights whose
    row count is not a multiple of the kernel tile (the 50257-row LM head)
    are zero-padded so the fused Pallas path applies — forward slices the
    padded logits back to n_vocab. swar (default: env GGML_TPU_SWAR, on)
    converts eligible BLOCK weights to the SWAR kernel layout — never wte,
    which doubles as the embedding table (get_rows needs row layout)."""
    if pad_rows_to is None:
        from ..kernels.matmul_q import TILE_N as pad_rows_to  # match kernel tile
    from .llama import _swar_default
    from ..quant.formats import swar_supported, to_swar

    use_swar = swar if swar is not None else _swar_default()

    def q(name, t, pad_rows=False):
        if isinstance(t, QTensor) or t.ndim != 2 or t.shape[-1] % 256:
            return t
        if t.shape[-1] < min_cols:
            return t
        # only the LM head may be row-padded (its padded logits are sliced
        # off in forward); interior weights feed residual adds directly
        if pad_rows and pad_rows_to and t.shape[0] % pad_rows_to:
            pad = pad_rows_to - t.shape[0] % pad_rows_to
            t = jnp.concatenate(
                [t, jnp.zeros((pad, t.shape[1]), t.dtype)], axis=0
            )
        qt = quantize(t.astype(jnp.float32), gtype, search=search)
        if use_swar and not pad_rows and swar_supported(qt):
            qt = to_swar(qt)
        return qt

    out = {
        "wte": q("wte", params["wte"], pad_rows=True),
        "wpe": params["wpe"],
        "ln_f": params["ln_f"],
        "blocks": [],
    }
    # Dedicated SWAR lm-head: wte must stay in ROW layout for get_rows, but
    # the logits matvec over it is the single largest weight read of a
    # GPT-2 decode step (50257x768 = 41 MB wire) and the row-layout kernel
    # grids it in (TILE_N=256, 768) tiles — 197 grid steps whose per-step
    # overhead caps it at ~165 GB/s on v5e (diag_gpt2). A SWAR copy padded
    # to a lane-tile-divisible row count streams it at the packed-bytes
    # roofline instead; forward prefers params["lm_head"] when present and
    # slices the padded logits. Costs one duplicate of the lm-head in HBM.
    if use_swar and not isinstance(params["wte"], QTensor) \
            and params["wte"].ndim == 2 and params["wte"].shape[-1] % 256 == 0:
        wte = params["wte"]
        pad = (-wte.shape[0]) % 1024  # 50257 -> 51200: tile-1024 eligible
        wpad = jnp.concatenate(
            [wte, jnp.zeros((pad, wte.shape[1]), wte.dtype)], axis=0) \
            if pad else wte
        qh = quantize(wpad.astype(jnp.float32), gtype, search=search)
        if swar_supported(qh):
            out["lm_head"] = to_swar(qh)
    import os

    layer_fuse = (gtype == GType.Q8_0
                  and os.environ.get("GGML_TPU_LAYER_FUSED", "1") == "1")
    for b in params["blocks"]:
        qb = {
            "ln_1": b["ln_1"],
            "attn": {
                "c_attn_w": q("attn", b["attn"]["c_attn_w"]),
                "c_attn_b": b["attn"]["c_attn_b"],
                "c_proj_w": q("attn", b["attn"]["c_proj_w"]),
                "c_proj_b": b["attn"]["c_proj_b"],
            },
            "ln_2": b["ln_2"],
            "mlp": _q_mlp(b["mlp"], q, gtype, use_swar),
        }
        if layer_fuse:
            from ..kernels.gpt2_layer import (
                fuse_gpt2_layer, gpt2_layer_fuse_supported,
            )

            def _fusable(w):  # raw floats, or pre-SWAR Q8_0 planes
                if not isinstance(w, QTensor):
                    return True
                return w.gtype == GType.Q8_0 and "qs" in w.planes

            ws = (b["attn"]["c_attn_w"], b["attn"]["c_proj_w"],
                  b["mlp"]["c_fc_w"], b["mlp"]["c_proj_w"])
            E = b["attn"]["c_proj_w"].shape[0]
            F = b["mlp"]["c_fc_w"].shape[0]
            if (all(_fusable(w) for w in ws)
                    and gpt2_layer_fuse_supported(E, F)):
                qb["layer_fused"] = fuse_gpt2_layer(b)
        out["blocks"].append(qb)
    return out


def _q_mlp(mlp, q, gtype, use_swar):
    """Quantize one MLP. When the pair qualifies for the fused megakernel
    (Q8_0, SWAR on, fits VMEM — kernels.mlp_fused), ALSO pack both matmuls
    plus the GELU into one pallas-call's planes (same payload bits, W1 lanes
    permuted); decode-sized row counts ride it, prefill keeps the per-matmul
    SWAR kernels (forward picks by row count)."""
    import os

    from ..kernels.mlp_fused import fuse_mlp_q8, mlp_fuse_supported

    out = {"c_fc_b": mlp["c_fc_b"], "c_proj_b": mlp["c_proj_b"]}
    if (use_swar and gtype == GType.Q8_0
            and os.environ.get("GGML_TPU_MLP_FUSED", "1") == "1"):
        from ..quant.quantize import quantize

        def pre(w):  # pre-SWAR Q8_0 planes reused as-is (GGUF import)
            if isinstance(w, QTensor):
                return w if w.gtype == gtype and "qs" in w.planes else None
            return quantize(w.astype(jnp.float32), gtype)

        fc, pj = pre(mlp["c_fc_w"]), pre(mlp["c_proj_w"])
        if fc is not None and pj is not None and mlp_fuse_supported(fc, pj):
            out["fused"] = fuse_mlp_q8(fc, mlp["c_fc_b"], pj,
                                       mlp["c_proj_b"])
    out["c_fc_w"] = q("mlp", mlp["c_fc_w"])
    out["c_proj_w"] = q("mlp", mlp["c_proj_w"])
    return out


def _layer_norm(x, g, b, eps):
    return ops.norm(x.astype(jnp.float32), eps=eps).astype(x.dtype) * g + b


def _wire_perm(E):
    """Wire (Q8 SWAR k-order) lane permutation + inverse, as static arrays."""
    import numpy as np

    from ..kernels.mlp_fused import q8_korder_perm

    sig = q8_korder_perm(E)
    return sig, np.argsort(sig)


def _forward_wire_decode(params, cfg: GPT2Config, tokens, cache, positions,
                         prefix_bound):
    """Single-token decode through whole-layer megakernels
    (kernels.gpt2_layer): one pallas call per block, activations in wire
    order end to end, flat wire-order KV cache (one row write per layer).
    The ggml activation round-trip is skipped inside blocks (intermediates
    never leave VMEM — strictly less quantization noise than unfused)."""
    from ..kernels.gpt2_layer import gpt2_layer_step

    E = cfg.n_embd
    sig, inv = _wire_perm(E)
    x = ops.get_rows(params["wte"], tokens)
    x = x + jnp.take(params["wpe"], jnp.clip(positions, 0, cfg.n_ctx - 1),
                     axis=0)
    xw = x.reshape(1, E).astype(jnp.float32)[:, sig]
    npast = positions[0, 0]
    T = cache.max_len
    if prefix_bound is not None:
        T = min(int(prefix_bound), T)
    for i, blk in enumerate(params["blocks"]):
        kc = jax.lax.slice(cache.k[i][0], (0, 0), (T, E))
        vc = jax.lax.slice(cache.v[i][0], (0, 0), (T, E))
        xw, kn, vn = gpt2_layer_step(blk["layer_fused"], xw, kc, vc, npast,
                                     cfg.n_head, cfg.ln_eps)
        cache = kvc.update_layer_flat(cache, i, kn[None], vn[None],
                                      positions)
    x = xw[:, inv]
    x = _layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], cfg.ln_eps)
    wte = params.get("lm_head", params["wte"])  # SWAR copy when present
    if isinstance(wte, QTensor):
        logits = ops.mul_mat(wte, x, quantize_acts=False)
    else:
        logits = ops.mul_mat_f(wte, x.astype(wte.dtype))
    logits = logits[..., : cfg.n_vocab]
    return (logits.reshape(1, 1, -1).astype(jnp.float32),
            kvc.advance(cache, 1))


def _flat_read_heads(cache, layer, n_head, t):
    """Fallback view of a flat wire cache as [B, H, t, D] (element order) —
    correctness path for configs the megakernel doesn't cover."""
    E = cache.k[layer].shape[-1]
    _, inv = _wire_perm(E)
    B = cache.k[layer].shape[0]

    def view(buf):
        rows = jax.lax.slice(buf, (0, 0, 0), (B, t, E))[..., inv]
        return rows.reshape(B, t, n_head, E // n_head).transpose(0, 2, 1, 3)

    return view(cache.k[layer]), view(cache.v[layer])


def forward(params, cfg: GPT2Config, tokens, cache: kvc.KVCache, positions,
            prefix_bound: int | None = None,
            cached_prefix: bool | None = None):
    """tokens: int32 [B, S]; positions: int32 [B, S] absolute positions.
    Returns (logits [B, S, n_vocab] f32, updated cache). cached_prefix:
    flat-cache multi-token calls attend the cache's live prefix (True —
    required when positions don't start at 0) vs flash over this call's
    fresh K/V only (False); None = auto: True for S <= 8."""
    B, S = tokens.shape
    flat = kvc.is_flat(cache)
    if (flat and S == 1 and B == 1
            and all("layer_fused" in b for b in params["blocks"])):
        return _forward_wire_decode(params, cfg, tokens, cache, positions,
                                    prefix_bound)
    x = ops.get_rows(params["wte"], tokens)
    x = x + jnp.take(params["wpe"], jnp.clip(positions, 0, cfg.n_ctx - 1), axis=0)
    compute_dtype = params["wpe"].dtype
    x = x.astype(compute_dtype)
    sig = _wire_perm(cfg.n_embd)[0] if flat else None

    for i, blk in enumerate(params["blocks"]):
        h = _layer_norm(x, blk["ln_1"]["g"], blk["ln_1"]["b"], cfg.ln_eps)
        qkv = linear(blk["attn"]["c_attn_w"], h, blk["attn"]["c_attn_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if flat:
            # flat wire cache: write wire-order rows; attend over the live
            # prefix read back as heads (prefill) — decode (S == 1) normally
            # rides _forward_wire_decode instead and never lands here
            cache = kvc.update_layer_flat(
                cache, i, k.reshape(B, S, -1)[..., sig],
                v.reshape(B, S, -1)[..., sig], positions)
            if S > 8 and not cached_prefix:
                # prefill: flash over the fresh K/V (prefix starts empty —
                # generate/engine prefill contract), scores never in HBM
                from ..kernels.flash import flash_attention_cached

                a = merge_heads(flash_attention_cached(
                    split_heads(q, cfg.n_head), split_heads(k, cfg.n_head),
                    split_heads(v, cfg.n_head),
                    positions[:, 0])).astype(q.dtype)
            else:
                t = cache.max_len
                if prefix_bound is not None:
                    t = min(int(prefix_bound), t)
                k_all, v_all = _flat_read_heads(cache, i, cfg.n_head, t)
                from .common import _einsum_attention

                a = merge_heads(_einsum_attention(
                    split_heads(q, cfg.n_head), k_all.astype(q.dtype),
                    v_all.astype(q.dtype), positions, 1,
                    0.0)).astype(q.dtype)
        else:
            q = split_heads(q, cfg.n_head)
            k = split_heads(k, cfg.n_head)
            v = split_heads(v, cfg.n_head)
            a, cache = cached_attention(q, k, v, cache, i, positions,
                                        prefix_bound=prefix_bound)
            a = merge_heads(a)
        x = x + linear(blk["attn"]["c_proj_w"], a, blk["attn"]["c_proj_b"])

        h = _layer_norm(x, blk["ln_2"]["g"], blk["ln_2"]["b"], cfg.ln_eps)
        rows = 1
        for s in h.shape[:-1]:
            rows *= s
        if "fused" in blk["mlp"] and rows <= _MAX_FUSED_B:
            from ..config import get_config
            from ..kernels.mlp_fused import flash_ff_q8

            x = x + flash_ff_q8(
                blk["mlp"]["fused"], h,
                quantize_acts=get_config().quantize_activations,
            ).astype(x.dtype)
        else:
            h = ops.gelu(
                linear(blk["mlp"]["c_fc_w"], h, blk["mlp"]["c_fc_b"]))
            x = x + linear(blk["mlp"]["c_proj_w"], h,
                           blk["mlp"]["c_proj_b"])

    x = _layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], cfg.ln_eps)
    wte = params.get("lm_head", params["wte"]) \
        if isinstance(params, dict) else params["wte"]
    if isinstance(wte, QTensor):
        logits = ops.mul_mat(wte, x.astype(jnp.float32), quantize_acts=False)
    else:
        logits = ops.mul_mat_f(wte, x)
    logits = logits[..., : cfg.n_vocab]  # drop tile padding rows, if any
    return logits.astype(jnp.float32), kvc.advance(cache, tokens.shape[1])


def new_cache(cfg: GPT2Config, batch: int, dtype=jnp.bfloat16, int8=False,
              max_len: int | None = None, flat: bool | None = None):
    """flat=None: auto — the flat wire-order cache (one [B, T, E] buffer per
    layer, feeding the whole-layer decode megakernel) when layer fusion is
    on (GGML_TPU_LAYER_FUSED, default) and the workload is single-slot
    float decode; head-major [B, H, T, D] otherwise."""
    if flat is None:
        import os

        flat = (batch == 1 and not int8
                and os.environ.get("GGML_TPU_LAYER_FUSED", "1") == "1")
    return kvc.init_cache(cfg.n_layer, batch, cfg.n_head,
                          max_len or cfg.n_ctx, cfg.head_dim,
                          dtype=dtype, int8=int8, flat=flat)
