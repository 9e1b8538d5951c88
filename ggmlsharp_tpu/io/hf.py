"""HuggingFace checkpoint import (safetensors) → model param trees.

Complements the GGUF importer: GGUF carries pre-quantized llama.cpp blocks;
HF safetensors carry float weights which we then quantize with our own
quantize_params. Name mappings cover the stock `gpt2` and `LlamaForCausalLM`
layouts.
"""
from __future__ import annotations

import json
import os

import numpy as np


def _load_safetensors(path: str) -> dict:
    from safetensors import safe_open

    out = {}
    files = [path]
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".safetensors")
        )
    for f in files:
        with safe_open(f, framework="numpy") as st:
            for key in st.keys():
                out[key] = st.get_tensor(key)
    return out


def load_hf_gpt2(path: str, config: dict | None = None):
    """path: .safetensors file or directory (with config.json).
    Returns (GPT2Config, params) — numpy arrays; HF's Conv1D stores weights
    transposed ([in, out]) relative to our [out, in] linears."""
    from ..models.gpt2 import GPT2Config

    t = _load_safetensors(path)
    if config is None and os.path.isdir(path):
        with open(os.path.join(path, "config.json")) as f:
            config = json.load(f)
    config = config or {}

    def g(name):
        for k in (name, "transformer." + name):
            if k in t:
                return t[k]
        raise KeyError(name)

    n_layer = config.get("n_layer") or max(
        int(k.split(".")[1 + k.startswith("transformer.")]) for k in t if ".h." in k or k.startswith("h.")
    ) + 1
    wte = g("wte.weight")
    cfg = GPT2Config(
        n_vocab=wte.shape[0],
        n_ctx=config.get("n_positions", g("wpe.weight").shape[0]),
        n_embd=wte.shape[1],
        n_head=config.get("n_head", 12),
        n_layer=n_layer,
    )
    params = {
        "wte": wte,
        "wpe": g("wpe.weight"),
        "ln_f": {"g": g("ln_f.weight"), "b": g("ln_f.bias")},
        "blocks": [],
    }
    for i in range(cfg.n_layer):
        p = f"h.{i}."
        params["blocks"].append({
            "ln_1": {"g": g(p + "ln_1.weight"), "b": g(p + "ln_1.bias")},
            "attn": {
                "c_attn_w": np.ascontiguousarray(g(p + "attn.c_attn.weight").T),
                "c_attn_b": g(p + "attn.c_attn.bias"),
                "c_proj_w": np.ascontiguousarray(g(p + "attn.c_proj.weight").T),
                "c_proj_b": g(p + "attn.c_proj.bias"),
            },
            "ln_2": {"g": g(p + "ln_2.weight"), "b": g(p + "ln_2.bias")},
            "mlp": {
                "c_fc_w": np.ascontiguousarray(g(p + "mlp.c_fc.weight").T),
                "c_fc_b": g(p + "mlp.c_fc.bias"),
                "c_proj_w": np.ascontiguousarray(g(p + "mlp.c_proj.weight").T),
                "c_proj_b": g(p + "mlp.c_proj.bias"),
            },
        })
    return cfg, params


def load_hf_llama(path: str, config: dict | None = None):
    """LlamaForCausalLM safetensors → (LlamaConfig, params).

    NOTE on rope convention: HF Llama checkpoints lay q/k head dims out for
    half-split (NeoX-style) rotary. No weight permutation is performed here;
    instead the returned config sets rope_mode=2 so the model applies the
    matching half-split rope. (llama.cpp's GGUF importer instead unpermutes
    the weights and uses interleaved rope — both give identical logits.)
    """
    from ..models.llama import LlamaConfig

    t = _load_safetensors(path)
    if config is None and os.path.isdir(path):
        with open(os.path.join(path, "config.json")) as f:
            config = json.load(f)
    config = config or {}

    def g(name):
        for k in (name, "model." + name):
            if k in t:
                return t[k]
        raise KeyError(name)

    emb = g("embed_tokens.weight")
    n_layer = config.get("num_hidden_layers") or max(
        int(k.split("layers.")[1].split(".")[0]) for k in t if "layers." in k
    ) + 1
    n_head = config.get("num_attention_heads", 32)
    n_kv = config.get("num_key_value_heads", n_head)
    cfg = LlamaConfig(
        n_vocab=emb.shape[0],
        n_ctx=config.get("max_position_embeddings", 2048),
        n_embd=emb.shape[1],
        n_head=n_head,
        n_head_kv=n_kv,
        n_layer=n_layer,
        n_ff=config.get("intermediate_size", 11008),
        rms_eps=config.get("rms_norm_eps", 1e-6),
        rope_base=config.get("rope_theta", 10000.0),
        rope_mode=2,  # HF layout pairs (i, i+half) — NeoX-style halves
        tie_lm_head="lm_head.weight" not in t,
    )
    params = {
        "tok_embd": emb,
        "norm": g("norm.weight"),
        "output": t.get("lm_head.weight"),
        "blocks": [],
    }
    for i in range(cfg.n_layer):
        p = f"layers.{i}."
        params["blocks"].append({
            "attn_norm": g(p + "input_layernorm.weight"),
            "wq": g(p + "self_attn.q_proj.weight"),
            "wk": g(p + "self_attn.k_proj.weight"),
            "wv": g(p + "self_attn.v_proj.weight"),
            "wo": g(p + "self_attn.o_proj.weight"),
            "ffn_norm": g(p + "post_attention_layernorm.weight"),
            "w_gate": g(p + "mlp.gate_proj.weight"),
            "w_up": g(p + "mlp.up_proj.weight"),
            "w_down": g(p + "mlp.down_proj.weight"),
        })
    return cfg, params


def load_hf_gptj(path: str, config: dict | None = None):
    """GPTJForCausalLM safetensors → (GPTJConfig, params). HF GPT-J uses
    rotate_every_two rotary (interleaved pairs) over rotary_dim dims —
    exactly models.gptj's mode-0 partial rope, so weights map 1:1."""
    from ..models.gptj import GPTJConfig

    t = _load_safetensors(path)
    if config is None and os.path.isdir(path):
        with open(os.path.join(path, "config.json")) as f:
            config = json.load(f)
    config = config or {}

    def g(name):
        for k in (name, "transformer." + name):
            if k in t:
                return t[k]
        raise KeyError(name)

    emb = g("wte.weight")
    n_layer = config.get("n_layer") or max(
        int(k.split("h.")[1].split(".")[0]) for k in t
        if ".h." in k or k.startswith("h.")
    ) + 1
    cfg = GPTJConfig(
        n_vocab=emb.shape[0],
        n_ctx=config.get("n_positions", 2048),
        n_embd=emb.shape[1],
        n_head=config.get("n_head", 16),
        n_layer=n_layer,
        rotary_dim=config.get("rotary_dim", 64),
        ln_eps=config.get("layer_norm_epsilon", 1e-5),
    )
    params = {
        "wte": emb,
        "ln_f": {"g": g("ln_f.weight"), "b": g("ln_f.bias")},
        "lm_head": {
            "w": t.get("lm_head.weight", emb),
            "b": t.get("lm_head.bias",
                       np.zeros((emb.shape[0],), emb.dtype)),
        },
        "blocks": [],
    }
    for i in range(cfg.n_layer):
        p = f"h.{i}."
        params["blocks"].append({
            "ln_1": {"g": g(p + "ln_1.weight"), "b": g(p + "ln_1.bias")},
            "attn": {
                "wq": g(p + "attn.q_proj.weight"),
                "wk": g(p + "attn.k_proj.weight"),
                "wv": g(p + "attn.v_proj.weight"),
                "wo": g(p + "attn.out_proj.weight"),
            },
            "mlp": {
                "fc_in_w": g(p + "mlp.fc_in.weight"),
                "fc_in_b": g(p + "mlp.fc_in.bias"),
                "fc_out_w": g(p + "mlp.fc_out.weight"),
                "fc_out_b": g(p + "mlp.fc_out.bias"),
            },
        })
    return cfg, params
