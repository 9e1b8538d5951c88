"""HF safetensors import: write a synthetic checkpoint in HF layout, load it,
and check the imported model's forward matches the one built directly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggmlsharp_tpu.models import gpt2

CFG = gpt2.GPT2Config(n_vocab=96, n_ctx=32, n_embd=48, n_head=4, n_layer=2)


def _save_hf_gpt2(params, path):
    from safetensors.numpy import save_file

    t = {
        "wte.weight": np.asarray(params["wte"], np.float32),
        "wpe.weight": np.asarray(params["wpe"], np.float32),
        "ln_f.weight": np.asarray(params["ln_f"]["g"], np.float32),
        "ln_f.bias": np.asarray(params["ln_f"]["b"], np.float32),
    }
    for i, b in enumerate(params["blocks"]):
        p = f"h.{i}."
        t[p + "ln_1.weight"] = np.asarray(b["ln_1"]["g"], np.float32)
        t[p + "ln_1.bias"] = np.asarray(b["ln_1"]["b"], np.float32)
        t[p + "attn.c_attn.weight"] = np.asarray(b["attn"]["c_attn_w"], np.float32).T.copy()
        t[p + "attn.c_attn.bias"] = np.asarray(b["attn"]["c_attn_b"], np.float32)
        t[p + "attn.c_proj.weight"] = np.asarray(b["attn"]["c_proj_w"], np.float32).T.copy()
        t[p + "attn.c_proj.bias"] = np.asarray(b["attn"]["c_proj_b"], np.float32)
        t[p + "ln_2.weight"] = np.asarray(b["ln_2"]["g"], np.float32)
        t[p + "ln_2.bias"] = np.asarray(b["ln_2"]["b"], np.float32)
        t[p + "mlp.c_fc.weight"] = np.asarray(b["mlp"]["c_fc_w"], np.float32).T.copy()
        t[p + "mlp.c_fc.bias"] = np.asarray(b["mlp"]["c_fc_b"], np.float32)
        t[p + "mlp.c_proj.weight"] = np.asarray(b["mlp"]["c_proj_w"], np.float32).T.copy()
        t[p + "mlp.c_proj.bias"] = np.asarray(b["mlp"]["c_proj_b"], np.float32)
    save_file(t, path)


def test_hf_gpt2_roundtrip(tmp_path):
    pytest.importorskip("safetensors")
    from ggmlsharp_tpu.io.hf import load_hf_gpt2

    params = gpt2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    path = str(tmp_path / "model.safetensors")
    _save_hf_gpt2(params, path)

    cfg2, params2 = load_hf_gpt2(path, config={"n_head": CFG.n_head})
    assert cfg2.n_embd == CFG.n_embd and cfg2.n_layer == CFG.n_layer

    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    positions = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    f = jax.jit(lambda p, t, c, pos: gpt2.forward(p, CFG, t, c, pos)[0])
    want = np.asarray(f(params, tokens, gpt2.new_cache(CFG, 1, dtype=jnp.float32), positions))
    got = np.asarray(f(jax.tree.map(jnp.asarray, params2), tokens,
                       gpt2.new_cache(CFG, 1, dtype=jnp.float32), positions))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hf_gptj_roundtrip(tmp_path):
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    from ggmlsharp_tpu.io.hf import load_hf_gptj
    from ggmlsharp_tpu.models import gptj, sampling

    cfg = gptj.TINY_GPTJ
    params = gptj.init_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)

    t = {
        "transformer.wte.weight": np.asarray(params["wte"], np.float32),
        "transformer.ln_f.weight": np.asarray(params["ln_f"]["g"], np.float32),
        "transformer.ln_f.bias": np.asarray(params["ln_f"]["b"], np.float32),
        "lm_head.weight": np.asarray(params["lm_head"]["w"], np.float32),
        "lm_head.bias": np.asarray(params["lm_head"]["b"], np.float32),
    }
    for i, b in enumerate(params["blocks"]):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = np.asarray(b["ln_1"]["g"], np.float32)
        t[p + "ln_1.bias"] = np.asarray(b["ln_1"]["b"], np.float32)
        t[p + "attn.q_proj.weight"] = np.asarray(b["attn"]["wq"], np.float32)
        t[p + "attn.k_proj.weight"] = np.asarray(b["attn"]["wk"], np.float32)
        t[p + "attn.v_proj.weight"] = np.asarray(b["attn"]["wv"], np.float32)
        t[p + "attn.out_proj.weight"] = np.asarray(b["attn"]["wo"], np.float32)
        t[p + "mlp.fc_in.weight"] = np.asarray(b["mlp"]["fc_in_w"], np.float32)
        t[p + "mlp.fc_in.bias"] = np.asarray(b["mlp"]["fc_in_b"], np.float32)
        t[p + "mlp.fc_out.weight"] = np.asarray(b["mlp"]["fc_out_w"], np.float32)
        t[p + "mlp.fc_out.bias"] = np.asarray(b["mlp"]["fc_out_b"], np.float32)
    save_file(t, str(tmp_path / "model.safetensors"))

    cfg2, p2 = load_hf_gptj(
        str(tmp_path / "model.safetensors"),
        config={"n_layer": cfg.n_layer, "n_head": cfg.n_head,
                "n_positions": cfg.n_ctx, "rotary_dim": cfg.rotary_dim})
    assert cfg2 == cfg
    p2 = jax.tree.map(jnp.asarray, p2)

    toks = jnp.asarray([[5, 17, 99, 2]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    la, _ = gptj.forward(params, cfg, toks,
                         gptj.new_cache(cfg, 1, dtype=jnp.float32), pos)
    lb, _ = gptj.forward(p2, cfg2, toks,
                         gptj.new_cache(cfg2, 1, dtype=jnp.float32), pos)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-5, atol=1e-5)
