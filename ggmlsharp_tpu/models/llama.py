"""Llama family (BASELINE configs 3-5: 7B with k-quants, INT8 KV cache,
multi-host tensor sharding).

RMSNorm pre-norm, rotary position embeddings (interleaved ggml mode by
default), SwiGLU MLP, optional GQA, untied or tied LM head. Weight tensors
may be dense arrays or QTensor block-quant planes.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import ops
from ..dtypes import GType
from ..kernels.mlp_fused import _MAX_FUSED_B
from ..quant.formats import QTensor
from ..quant.quantize import quantize
from . import kv_cache as kvc
from .common import cached_attention, linear, merge_heads, split_heads


@dataclass(frozen=True)
class LlamaConfig:
    n_vocab: int = 32000
    n_ctx: int = 2048
    n_embd: int = 4096
    n_head: int = 32
    n_head_kv: int = 32  # < n_head → GQA
    n_layer: int = 32
    n_ff: int = 11008
    rms_eps: float = 1e-6
    rope_base: float = 10000.0
    rope_mode: int = 0  # 0 = ggml interleaved, 2 = neox halves
    tie_lm_head: bool = False

    @property
    def head_dim(self):
        return self.n_embd // self.n_head

    @property
    def supports_flat_kv(self):  # forward handles the flat [B,T,E] cache
        return True


LLAMA_7B = LlamaConfig()
LLAMA_13B = LlamaConfig(n_embd=5120, n_head=40, n_head_kv=40, n_layer=40, n_ff=13824)
TINY_LLAMA = LlamaConfig(  # test-scale config
    n_vocab=256, n_ctx=128, n_embd=128, n_head=4, n_head_kv=2, n_layer=2, n_ff=256
)


def init_params(rng, cfg: LlamaConfig, dtype=jnp.bfloat16):
    ks = jax.random.split(rng, 3 + cfg.n_layer)
    sd = 0.02
    hd = cfg.head_dim

    def w(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * sd).astype(dtype)

    p = {
        "tok_embd": w(ks[0], cfg.n_vocab, cfg.n_embd),
        "norm": jnp.ones((cfg.n_embd,), dtype),
        "output": None if cfg.tie_lm_head else w(ks[1], cfg.n_vocab, cfg.n_embd),
        "blocks": [],
    }
    for i in range(cfg.n_layer):
        kk = jax.random.split(ks[3 + i], 7)
        p["blocks"].append(
            {
                "attn_norm": jnp.ones((cfg.n_embd,), dtype),
                "wq": w(kk[0], cfg.n_head * hd, cfg.n_embd),
                "wk": w(kk[1], cfg.n_head_kv * hd, cfg.n_embd),
                "wv": w(kk[2], cfg.n_head_kv * hd, cfg.n_embd),
                "wo": w(kk[3], cfg.n_embd, cfg.n_head * hd),
                "ffn_norm": jnp.ones((cfg.n_embd,), dtype),
                "w_gate": w(kk[4], cfg.n_ff, cfg.n_embd),
                "w_up": w(kk[5], cfg.n_ff, cfg.n_embd),
                "w_down": w(kk[6], cfg.n_embd, cfg.n_ff),
            }
        )
    return p


def fuse_params(params):
    """Fuse per-block wq/wk/wv → wqkv and w_gate/w_up → w_gate_up (row
    concat — bit-identical numerics, quantization is row-independent; see
    quant.formats.concat_qtensors). One kernel launch instead of three/two:
    a 7B decode step drops from 225 to ~130 pallas calls. `forward` accepts
    both layouts."""
    from ..quant.formats import concat_qtensors

    out = {k: v for k, v in params.items() if k != "blocks"}
    out["blocks"] = []
    for b in params["blocks"]:
        nb = {k: v for k, v in b.items()
              if k not in ("wq", "wk", "wv", "w_gate", "w_up")}
        nb["wqkv"] = concat_qtensors([b["wq"], b["wk"], b["wv"]])
        nb["w_gate_up"] = concat_qtensors([b["w_gate"], b["w_up"]])
        out["blocks"].append(nb)
    return out


def swar_params(params):
    """Convert eligible matmul weights (NOT embeddings — get_rows needs row
    layout) to the SWAR transposed layout (quant.formats.to_swar): the
    fastest single-chip decode kernels (617-660 GB/s effective vs 530-550
    planewise, scripts/probe_swar.py). Bit-identical values/scales."""
    from ..quant.formats import swar_supported, to_swar

    def conv(t):
        return to_swar(t) if isinstance(t, QTensor) and swar_supported(t) \
            else t

    out = {k: v for k, v in params.items() if k != "blocks"}
    out["output"] = conv(out.get("output"))
    out["blocks"] = [
        {k: (conv(v) if k in ("wqkv", "wo", "w_gate_up", "w_down", "wq",
                              "wk", "wv", "w_gate", "w_up") else v)
         for k, v in b.items()}
        for b in params["blocks"]
    ]
    return out


def _swar_default() -> bool:
    import os

    return os.environ.get("GGML_TPU_SWAR", "1") != "0"


def quantize_params(params, gtype: GType, embd_gtype: GType | None = None,
                    pad_rows_to: int | None = None, fuse: bool = True,
                    search: bool = False, swar: bool | None = None,
                    cfg: "LlamaConfig | None" = None):
    """Weight-only quantize all matmul weights. llama.cpp policy analog:
    token embedding / output may use a different (often higher-bit) format.
    Row counts are padded to the kernel tile so the fused path applies
    (forward slices padded logits back to n_vocab). fuse=True additionally
    merges qkv and gate/up weights (see fuse_params). swar (default: env
    GGML_TPU_SWAR, on) converts eligible weights to the SWAR kernel layout —
    pass False for layouts that must keep (N, ·)-oriented planes (GGUF
    export, tensor-parallel plane sharding)."""
    embd_gtype = embd_gtype or gtype
    if pad_rows_to is None:
        from ..kernels.matmul_q import TILE_N as pad_rows_to  # match kernel tile

    def q(t, g, pad_rows=False):
        if t is None or isinstance(t, QTensor) or t.ndim != 2:
            return t
        if t.shape[-1] % 256:
            return t
        # only embedding/LM-head rows may be padded (logits sliced after)
        if pad_rows and pad_rows_to and t.shape[0] % pad_rows_to:
            pad = pad_rows_to - t.shape[0] % pad_rows_to
            t = jnp.concatenate(
                [t, jnp.zeros((pad, t.shape[1]), t.dtype)], axis=0
            )
        return quantize(t.astype(jnp.float32), g, search=search)

    out = {
        "tok_embd": q(params["tok_embd"], embd_gtype, pad_rows=True),
        "norm": params["norm"],
        "output": q(params["output"], embd_gtype, pad_rows=True),
        "blocks": [
            {
                "attn_norm": b["attn_norm"],
                "wq": q(b["wq"], gtype),
                "wk": q(b["wk"], gtype),
                "wv": q(b["wv"], gtype),
                "wo": q(b["wo"], gtype),
                "ffn_norm": b["ffn_norm"],
                "w_gate": q(b["w_gate"], gtype),
                "w_up": q(b["w_up"], gtype),
                "w_down": q(b["w_down"], gtype),
            }
            for b in params["blocks"]
        ],
    }
    if fuse:
        out = fuse_params(out)
        use_swar = swar if swar is not None else _swar_default()
        if use_swar:
            import os

            if (gtype == GType.Q4_0
                    and os.environ.get("GGML_TPU_MLP_FUSED", "0") == "1"):
                # SwiGLU megakernel planes (kernels.mlp_fused): built from
                # the pre-SWAR [gate;up]/down pair; decode-sized row counts
                # ride ONE pallas call per MLP, prefill keeps the per-matmul
                # SWAR kernels below. OPT-IN for llama: measured perf-neutral
                # on 7B decode (123.1 vs 122.7 tok/s — launches already
                # pipeline) while the planes duplicate ~2.3 GB HBM at 7B.
                from ..kernels.mlp_fused import (
                    fuse_mlp_silu_q4, mlp_silu_fuse_supported,
                )

                for blk in out["blocks"]:
                    if mlp_silu_fuse_supported(blk.get("w_gate_up"),
                                               blk.get("w_down")):
                        blk["mlp_fused"] = fuse_mlp_silu_q4(
                            blk["w_gate_up"], blk["w_down"])
            out = swar_params(out)
    import os

    if (cfg is not None and gtype == GType.Q4_0
            and os.environ.get("GGML_TPU_LLAMA_FUSED", "0") == "1"):
        # whole-layer decode megakernel planes (kernels.llama_layer):
        # packed from the RAW f32 block — opt-in until hardware-measured
        from ..kernels.llama_layer import (
            fuse_llama_layer, llama_layer_fuse_supported,
        )

        def _fusable(w, via_dequant=False):
            if w is None:
                return False
            if not isinstance(w, QTensor):
                return True  # raw floats quantize at pack time
            return w.gtype == GType.Q4_0 and (via_dequant or
                                              "qs" in w.planes)

        if llama_layer_fuse_supported(cfg):
            for ob, rb in zip(out["blocks"], params["blocks"]):
                ok = all(_fusable(rb.get(n)) for n in
                         ("wq", "wk", "wv", "w_gate", "w_up", "w_down"))
                if ok and _fusable(rb.get("wo"), via_dequant=True):
                    ob["layer_fused"] = fuse_llama_layer(rb, cfg)
    return out


def _rms(x, g, eps):
    return ops.rms_norm(x.astype(jnp.float32), eps=eps).astype(x.dtype) * g


def _forward_llama_fused(params, cfg: LlamaConfig, tokens, cache, positions,
                         prefix_bound):
    """Single-token decode through whole-layer megakernels
    (kernels.llama_layer): one pallas call per block, wire-order
    activations end to end, attn-space flat KV cache. The ggml activation
    round-trip is skipped inside blocks (intermediates never leave VMEM)."""
    import numpy as np

    from ..kernels.llama_layer import llama_layer_step
    from ..kernels.mlp_fused import q4_korder_perm

    E = cfg.n_embd
    Ekv = cfg.n_head_kv * cfg.head_dim
    sig = q4_korder_perm(E)
    inv = np.argsort(sig)
    x = ops.get_rows(params["tok_embd"], tokens)
    xw = x.reshape(1, E).astype(jnp.float32)[:, sig]
    npast = positions[0, 0]
    T = cache.max_len
    if prefix_bound is not None:
        T = min(int(prefix_bound), T)
    for i, blk in enumerate(params["blocks"]):
        kc = jax.lax.slice(cache.k[i][0], (0, 0), (T, Ekv))
        vc = jax.lax.slice(cache.v[i][0], (0, 0), (T, Ekv))
        xw, kn, vn = llama_layer_step(blk["layer_fused"], xw, kc, vc,
                                      npast, cfg)
        cache = kvc.update_layer_flat(cache, i, kn[None], vn[None],
                                      positions)
    x = xw[:, inv]
    x = _rms(x, params["norm"], cfg.rms_eps)
    w_out = params["output"] if params["output"] is not None else \
        params["tok_embd"]
    if isinstance(w_out, QTensor):
        logits = ops.mul_mat(w_out, x, quantize_acts=False)
    else:
        logits = ops.mul_mat_f(w_out, x.astype(w_out.dtype))
    logits = logits[..., : cfg.n_vocab]
    return (logits.reshape(1, 1, -1).astype(jnp.float32),
            kvc.advance(cache, 1))


def forward(params, cfg: LlamaConfig, tokens, cache: kvc.KVCache, positions,
            prefix_bound: int | None = None,
            cached_prefix: bool | None = None):
    """tokens/positions: int32 [B, S]. Returns (logits f32 [B,S,V], cache).
    prefix_bound: optional STATIC upper bound on the live cache prefix
    (host-side length bucketing — see common.cached_attention).
    cached_prefix: multi-token calls over a flat cache attend the cache's
    live prefix (True — required when positions don't start at 0, e.g.
    speculative verify or prefix-cached suffix prefill) vs flash over this
    call's own fresh K/V only (False). None = auto: True for S <= 8."""
    if (kvc.is_flat(cache) and tokens.shape == (1, 1) and not cache.int8
            and all("layer_fused" in b for b in params["blocks"])):
        return _forward_llama_fused(params, cfg, tokens, cache, positions,
                                    prefix_bound)
    x = ops.get_rows(params["tok_embd"], tokens)
    compute_dtype = params["norm"].dtype
    x = x.astype(compute_dtype)
    n_rep = cfg.n_head // cfg.n_head_kv
    B, S = tokens.shape

    hd = cfg.head_dim
    nq = cfg.n_head * hd
    nkv = cfg.n_head_kv * hd
    for i, blk in enumerate(params["blocks"]):
        h = _rms(x, blk["attn_norm"], cfg.rms_eps)
        if "wqkv" in blk:  # fused layout (fuse_params)
            qkv = linear(blk["wqkv"], h)
            q = split_heads(qkv[..., :nq], cfg.n_head)
            k = split_heads(qkv[..., nq : nq + nkv], cfg.n_head_kv)
            v = split_heads(qkv[..., nq + nkv :], cfg.n_head_kv)
        else:
            q = split_heads(linear(blk["wq"], h), cfg.n_head)
            k = split_heads(linear(blk["wk"], h), cfg.n_head_kv)
            v = split_heads(linear(blk["wv"], h), cfg.n_head_kv)
        # rope over [B, H, S, D] — positions broadcast per batch row
        rope = lambda t: jax.vmap(  # over batch (positions differ per slot)
            lambda tb, pb: ops.rope(tb, pb, mode=cfg.rope_mode, base=cfg.rope_base),
            in_axes=(0, 0),
        )(t, positions)
        q = rope(q)
        k = rope(k)
        if kvc.is_flat(cache):
            # flat [B, T, E_kv] cache: decode rides the fused flash-decode
            # kernel — one pallas call replaces the einsum/mask/softmax
            # chain (kernels.attn_decode). Rows are element order
            # (merge_heads) normally; ATTN-SPACE when the params carry
            # whole-layer megakernel planes (kernels.llama_layer — its b=1
            # fast path bypasses this loop entirely, but prefill and
            # batched decode share its cache layout).
            lf = "layer_fused" in blk and not cache.int8
            if lf:
                import numpy as _np

                from ..kernels.llama_layer import a2e_map

                a2e = a2e_map(nkv, hd, cfg.rope_mode)
                # composite q map: n_rep consecutive Ekv blocks (GQA)
                a2e_q = _np.concatenate([
                    (a2e // hd * n_rep + r) * hd + a2e % hd
                    for r in range(n_rep)])
                kn = merge_heads(k)[..., a2e]
                vn = merge_heads(v)[..., a2e]
            else:
                kn, vn = merge_heads(k), merge_heads(v)
            cache = kvc.update_layer_flat(cache, i, kn, vn, positions)
            t = cache.max_len
            if prefix_bound is not None:
                t = min(int(prefix_bound), t)
            if S == 1:
                kc = jax.lax.slice(cache.k[i], (0, 0, 0), (B, t, nkv))
                vc = jax.lax.slice(cache.v[i], (0, 0, 0), (B, t, nkv))
                if lf:
                    from ..kernels.attn_decode import flash_decode_flat_attn

                    out = flash_decode_flat_attn(
                        merge_heads(q)[:, 0][..., a2e_q], kn[:, 0],
                        vn[:, 0], kc, vc, positions[:, 0], cfg.n_head,
                        cfg.n_head_kv, hd)
                    inv = __import__("numpy").argsort(a2e_q)
                    a = out[..., inv].reshape(B, 1, nq).astype(q.dtype)
                else:
                    from ..kernels.attn_decode import flash_decode_flat

                    scales = {}
                    if cache.int8:
                        scales = {
                            "k_scale": jax.lax.slice(
                                cache.k_scale[i], (0, 0, 0),
                                (B, t, cfg.n_head_kv)),
                            "v_scale": jax.lax.slice(
                                cache.v_scale[i], (0, 0, 0),
                                (B, t, cfg.n_head_kv)),
                        }
                    out = flash_decode_flat(
                        merge_heads(q)[:, 0].reshape(B, cfg.n_head, hd),
                        kn[:, 0], vn[:, 0], kc, vc, positions[:, 0],
                        cfg.n_head_kv, hd, **scales)
                    a = out.reshape(B, 1, nq).astype(q.dtype)
            elif (cached_prefix if cached_prefix is not None else S <= 8):
                # multi-token step over a possibly NON-EMPTY prefix
                # (speculative verify, prefix-cached suffix prefill):
                # exact GQA einsum over the live cache rows — the fresh-KV
                # flash below only sees this call's own K/V and is correct
                # solely when positions start at 0
                from .common import _einsum_attention

                kc = jax.lax.slice(cache.k[i], (0, 0, 0), (B, t, nkv))
                vc = jax.lax.slice(cache.v[i], (0, 0, 0), (B, t, nkv))
                if cache.int8:
                    ksl = jax.lax.slice(cache.k_scale[i], (0, 0, 0),
                                        (B, t, cfg.n_head_kv))
                    vsl = jax.lax.slice(cache.v_scale[i], (0, 0, 0),
                                        (B, t, cfg.n_head_kv))
                    kc = (kc.astype(jnp.float32).reshape(B, t, cfg.n_head_kv, hd)
                          * ksl[..., None]).reshape(B, t, nkv)
                    vc = (vc.astype(jnp.float32).reshape(B, t, cfg.n_head_kv, hd)
                          * vsl[..., None]).reshape(B, t, nkv)
                if lf:
                    inv = __import__("numpy").argsort(a2e)
                    kc, vc = kc[..., inv], vc[..., inv]
                # cache rows up-cast to q.dtype — the same convention as
                # the head-major path (kv_cache.read_layer), so flat and
                # head-major decode stay numerically aligned
                k_all = (kc.reshape(B, t, cfg.n_head_kv, hd)
                         .transpose(0, 2, 1, 3).astype(q.dtype))
                v_all = (vc.reshape(B, t, cfg.n_head_kv, hd)
                         .transpose(0, 2, 1, 3).astype(q.dtype))
                if S > 8:
                    # long suffix over a live prefix: flash kernel with a
                    # per-slot npast (GQA via block index maps) — einsum
                    # would materialize [B, H, S, t] scores in HBM
                    from ..kernels.flash import flash_attention_cached

                    a = merge_heads(flash_attention_cached(
                        q, k_all, v_all, positions[:, 0])).astype(q.dtype)
                else:
                    a = merge_heads(_einsum_attention(
                        q, k_all, v_all, positions, n_rep,
                        0.0)).astype(q.dtype)
            else:
                # prefill from the empty prefix over the fresh K/V:
                # sequence-parallel ring when a sequence mesh is installed
                # (GGML_TPU_ATTN=ring), flash otherwise
                from .common import _attn_impl

                a = None
                if _attn_impl() == "ring":
                    from ..parallel.ring_attention import (
                        ring_attention, sequence_mesh,
                    )

                    mesh, seq_axis = sequence_mesh()
                    if mesh is not None and S % mesh.shape[seq_axis] == 0:
                        kr, vr = k, v
                        if n_rep > 1:
                            kr = jnp.repeat(kr, n_rep, axis=1)
                            vr = jnp.repeat(vr, n_rep, axis=1)
                        a = merge_heads(ring_attention(
                            q, kr, vr, mesh, seq_axis=seq_axis,
                            causal=True)).astype(q.dtype)
                if a is None:
                    from ..kernels.flash import flash_attention_cached

                    a = merge_heads(flash_attention_cached(
                        q, k, v, positions[:, 0])).astype(q.dtype)
            x = x + linear(blk["wo"], a)
        else:
            a, cache = cached_attention(q, k, v, cache, i, positions,
                                        n_rep=n_rep,
                                        prefix_bound=prefix_bound)
            x = x + linear(blk["wo"], merge_heads(a))

        h = _rms(x, blk["ffn_norm"], cfg.rms_eps)
        if "mlp_fused" in blk and B * S <= _MAX_FUSED_B:
            from ..config import get_config
            from ..kernels.mlp_fused import flash_ff_silu_q4

            x = x + flash_ff_silu_q4(
                blk["mlp_fused"], h,
                quantize_acts=get_config().quantize_activations,
            ).astype(x.dtype)
        elif "w_gate_up" in blk:
            gu = linear(blk["w_gate_up"], h)
            gate, up = gu[..., : cfg.n_ff], gu[..., cfg.n_ff :]
            x = x + linear(blk["w_down"], ops.silu(gate) * up)
        else:
            gate = ops.silu(linear(blk["w_gate"], h))
            x = x + linear(blk["w_down"], gate * linear(blk["w_up"], h))

    x = _rms(x, params["norm"], cfg.rms_eps)
    w_out = params["output"] if params["output"] is not None else params["tok_embd"]
    if isinstance(w_out, QTensor):
        logits = ops.mul_mat(w_out, x.astype(jnp.float32), quantize_acts=False)
    else:
        logits = ops.mul_mat_f(w_out, x)
    logits = logits[..., : cfg.n_vocab]  # drop tile padding rows, if any
    return logits.astype(jnp.float32), kvc.advance(cache, S)


def new_cache(cfg: LlamaConfig, batch: int, dtype=jnp.bfloat16, int8=False,
              max_len: int | None = None, flat: bool | None = None):
    """flat=None: auto — flat [B, T, E_kv] element-order cache feeding the
    fused flash-decode kernel (kernels.attn_decode) vs head-major + einsum
    attention. Default: head-major (GGML_TPU_FLASH_DECODE=0) — the r3 A/B
    on v5e measured single-slot decode at 128.5 tok/s (einsum) vs 119.5
    (flash) at 7B Q4_0; the flash path's win is BATCHED serving with
    per-slot prefix lengths, where serving.Engine opts into the flat cache
    itself (its own env default) — and INT8 caches, where the in-kernel
    dequant beats the einsum path's XLA dequant round trip (113.5 vs 112.3
    tok/s, 7B Q4_K+INT8KV, r3 A/B), so int8 defaults to flat."""
    if flat is None:
        import os

        flat = ((cfg.n_head_kv * cfg.head_dim) % 128 == 0
                and os.environ.get("GGML_TPU_FLASH_DECODE",
                                   "1" if int8 else "0") == "1")
    return kvc.init_cache(cfg.n_layer, batch, cfg.n_head_kv,
                          max_len or cfg.n_ctx, cfg.head_dim,
                          dtype=dtype, int8=int8, flat=flat)


def _apply_block(blk, h_in, cfg: LlamaConfig):
    """One llama block over a fresh sequence (positions 0..S-1, no cache):
    the stage function for pipeline-parallel scoring/prefill. Math matches
    the cached `forward` loop exactly (rms -> qkv -> rope -> causal
    attention -> wo residual -> rms -> SwiGLU residual)."""
    B, S = h_in.shape[0], h_in.shape[1]
    positions = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    n_rep = cfg.n_head // cfg.n_head_kv
    hd = cfg.head_dim
    nq, nkv = cfg.n_head * hd, cfg.n_head_kv * hd
    h = _rms(h_in, blk["attn_norm"], cfg.rms_eps)
    if "wqkv" in blk:
        qkv = linear(blk["wqkv"], h)
        q = split_heads(qkv[..., :nq], cfg.n_head)
        k = split_heads(qkv[..., nq : nq + nkv], cfg.n_head_kv)
        v = split_heads(qkv[..., nq + nkv :], cfg.n_head_kv)
    else:
        q = split_heads(linear(blk["wq"], h), cfg.n_head)
        k = split_heads(linear(blk["wk"], h), cfg.n_head_kv)
        v = split_heads(linear(blk["wv"], h), cfg.n_head_kv)
    rope = lambda t: jax.vmap(
        lambda tb, pb: ops.rope(tb, pb, mode=cfg.rope_mode,
                                base=cfg.rope_base),
        in_axes=(0, 0))(t, positions)
    q, k = rope(q), rope(k)
    from .common import _einsum_attention

    a = _einsum_attention(q, k, v, positions, n_rep, 0.0)
    x = h_in + linear(blk["wo"], merge_heads(a).astype(q.dtype))
    h = _rms(x, blk["ffn_norm"], cfg.rms_eps)
    if "w_gate_up" in blk:
        gu = linear(blk["w_gate_up"], h)
        gate, up = gu[..., : cfg.n_ff], gu[..., cfg.n_ff :]
        x = x + linear(blk["w_down"], ops.silu(gate) * up)
    else:
        gate = ops.silu(linear(blk["w_gate"], h))
        x = x + linear(blk["w_down"], gate * linear(blk["w_up"], h))
    return x


def forward_pp(params, cfg: LlamaConfig, tokens, mesh, axis: str = "pipe",
               n_micro: int | None = None):
    """Pipeline-parallel scoring/prefill forward: the L blocks split into
    mesh.shape[axis] contiguous stages, the batch into microbatches, and
    activations flow stage-to-stage over the ICI ppermute ring
    (parallel.pipeline.pipeline_forward — GPipe schedule; the 1F1B training
    schedule over the same stage layout is pipeline_train_step). No KV
    cache: every row attends its own fresh sequence from position 0, which
    is the scoring/throughput-prefill regime PP targets — latency-bound
    decode composes better with TP (parallel.sharding). Returns logits
    f32 [B, S, n_vocab], identical to the sequential `forward`.

    Requires uniform block structure (all-dense or all-fused layouts stack
    along a leading L axis; cfg.n_layer divisible by the stage count, B by
    n_micro)."""
    from ..parallel.pipeline import pipeline_forward

    x = ops.get_rows(params["tok_embd"], tokens)
    x = x.astype(params["norm"].dtype)
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *params["blocks"])
    x = pipeline_forward(
        lambda blk, h: _apply_block(blk, h, cfg), stacked, x, mesh,
        axis=axis, n_micro=n_micro)
    x = _rms(x, params["norm"], cfg.rms_eps)
    w_out = params["output"] if params["output"] is not None else \
        params["tok_embd"]
    if isinstance(w_out, QTensor):
        logits = ops.mul_mat(w_out, x.astype(jnp.float32),
                             quantize_acts=False)
    else:
        logits = ops.mul_mat_f(w_out, x)
    return logits[..., : cfg.n_vocab].astype(jnp.float32)
