"""IO tests: GGUF wire round-trips (our writer → our reader, bit-exact
planes), llama name-mapped load, checkpoint save/load with QTensors."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggmlsharp_tpu import GType, quantize, dequantize
from ggmlsharp_tpu.io.gguf import (
    GGUFReader,
    GGUFWriter,
    qtensor_from_wire,
    qtensor_to_wire,
)
from ggmlsharp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

RNG = np.random.default_rng(21)
WIRE_FORMATS = [GType.Q4_0, GType.Q4_1, GType.Q5_0, GType.Q5_1, GType.Q8_0,
                GType.Q4_K, GType.Q6_K]


@pytest.mark.parametrize("gtype", WIRE_FORMATS)
def test_wire_roundtrip_bit_exact(gtype):
    x = jnp.asarray(RNG.standard_normal((4, 512)).astype(np.float32))
    qt = jax.jit(lambda a: quantize(a, gtype))(x)
    g, raw = qtensor_to_wire(qt)
    qt2 = qtensor_from_wire(g, raw, qt.shape)
    for k in qt.planes:
        np.testing.assert_array_equal(
            np.asarray(qt[k]), np.asarray(qt2[k]), err_msg=f"plane {k}"
        )
    # and dequantized values identical
    d1 = np.asarray(jax.jit(dequantize)(qt))
    d2 = np.asarray(jax.jit(dequantize)(jax.tree.map(jnp.asarray, qt2)))
    np.testing.assert_array_equal(d1, d2)


def test_wire_roundtrip_q8_1():
    """Q8_1 wire {f16 d, f16 s, i8 qs[32]}: qs bit-exact; d/s rounded to f16
    on the wire (modern GGUF convention; canonical planes keep f32)."""
    x = jnp.asarray(RNG.standard_normal((4, 512)).astype(np.float32))
    qt = jax.jit(lambda a: quantize(a, GType.Q8_1))(x)
    g, raw = qtensor_to_wire(qt)
    qt2 = qtensor_from_wire(g, raw, qt.shape)
    np.testing.assert_array_equal(np.asarray(qt["qs"]), qt2["qs"])
    for k in ("d", "s"):
        np.testing.assert_array_equal(
            np.asarray(qt[k]).astype(np.float16).astype(np.float32), qt2[k]
        )


def test_wire_roundtrip_q8_k():
    """Q8_K wire {f32 d, i8 qs[256], i16 bsums[16]}: fully bit-exact."""
    x = jnp.asarray(RNG.standard_normal((4, 512)).astype(np.float32))
    qt = jax.jit(lambda a: quantize(a, GType.Q8_K))(x)
    g, raw = qtensor_to_wire(qt)
    qt2 = qtensor_from_wire(g, raw, qt.shape)
    for k in qt.planes:
        np.testing.assert_array_equal(
            np.asarray(qt[k]), np.asarray(qt2[k]), err_msg=f"plane {k}"
        )


def test_gguf_container_roundtrip(tmp_path):
    x = jnp.asarray(RNG.standard_normal((8, 256)).astype(np.float32))
    qt = jax.jit(lambda a: quantize(a, GType.Q4_0))(x)
    f32 = RNG.standard_normal((3, 7)).astype(np.float32)

    w = GGUFWriter()
    w.add_meta("general.architecture", 8, "llama")  # _T_STR
    w.add_meta("llama.block_count", 4, 2)  # _T_U32
    w.add_tensor("test.q4", qt)
    w.add_tensor("test.f32", f32)
    path = str(tmp_path / "test.gguf")
    w.write(path)

    r = GGUFReader(path)
    assert r.metadata["general.architecture"] == "llama"
    assert r.metadata["llama.block_count"] == 2
    assert r.tensors["test.q4"].gtype == GType.Q4_0
    assert r.tensors["test.q4"].shape == (8, 256)
    back = r.load("test.q4")
    for k in qt.planes:
        np.testing.assert_array_equal(np.asarray(qt[k]), back[k])
    np.testing.assert_array_equal(r.load("test.f32"), f32)


def test_gguf_llama_model_load(tmp_path):
    from ggmlsharp_tpu.io.gguf import load_gguf_llama
    from ggmlsharp_tpu.models import llama

    cfg = llama.TINY_LLAMA
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    w = GGUFWriter()
    w.add_meta("general.architecture", 8, "llama")
    w.add_meta("llama.block_count", 4, cfg.n_layer)
    w.add_meta("llama.context_length", 4, cfg.n_ctx)
    w.add_meta("llama.embedding_length", 4, cfg.n_embd)
    w.add_meta("llama.attention.head_count", 4, cfg.n_head)
    w.add_meta("llama.attention.head_count_kv", 4, cfg.n_head_kv)
    w.add_meta("llama.feed_forward_length", 4, cfg.n_ff)
    w.add_tensor("token_embd.weight", np.asarray(params["tok_embd"]))
    w.add_tensor("output_norm.weight", np.asarray(params["norm"]))
    w.add_tensor("output.weight", np.asarray(params["output"]))
    for i, b in enumerate(params["blocks"]):
        for name, key in [
            ("attn_norm", "attn_norm"), ("attn_q", "wq"), ("attn_k", "wk"),
            ("attn_v", "wv"), ("attn_output", "wo"), ("ffn_norm", "ffn_norm"),
            ("ffn_gate", "w_gate"), ("ffn_up", "w_up"), ("ffn_down", "w_down"),
        ]:
            w.add_tensor(f"blk.{i}.{name}.weight", np.asarray(b[key]))
    path = str(tmp_path / "model.gguf")
    w.write(path)

    cfg2, params2 = load_gguf_llama(path)
    assert cfg2.n_embd == cfg.n_embd
    assert cfg2.n_head_kv == cfg.n_head_kv
    assert cfg2.n_layer == cfg.n_layer
    np.testing.assert_array_equal(params2["tok_embd"], np.asarray(params["tok_embd"]))
    np.testing.assert_array_equal(
        params2["blocks"][1]["w_down"], np.asarray(params["blocks"][1]["w_down"])
    )


def test_checkpoint_roundtrip(tmp_path):
    x = jnp.asarray(RNG.standard_normal((4, 256)).astype(np.float32))
    tree = {
        "dense": jnp.arange(6.0).reshape(2, 3),
        "quant": quantize(x, GType.Q4_K),
        "nested": {"a": jnp.ones((3,)), "lst": [jnp.zeros((2,)), jnp.ones((2,))]},
        "missing": None,
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree, step=7)
    back, step = load_checkpoint(path)
    assert step == 7
    np.testing.assert_array_equal(back["dense"], np.asarray(tree["dense"]))
    assert back["missing"] is None
    assert isinstance(back["nested"]["lst"], list)
    np.testing.assert_array_equal(back["nested"]["lst"][1], 1.0)
    for k in tree["quant"].planes:
        np.testing.assert_array_equal(
            back["quant"][k], np.asarray(tree["quant"][k])
        )
    assert back["quant"].gtype == GType.Q4_K


def test_native_repack_matches_numpy():
    """C++ repacker must produce bit-identical planes to the numpy path."""
    from ggmlsharp_tpu.io import native

    if not native.available():
        pytest.skip("native repack library not built")
    for gtype in [GType.Q8_0, GType.Q4_0, GType.Q4_K, GType.Q6_K]:
        x = jnp.asarray(RNG.standard_normal((6, 512)).astype(np.float32))
        qt = jax.jit(lambda a, g=gtype: quantize(a, g))(x)
        g, raw = qtensor_to_wire(qt)
        want = qtensor_from_wire(g, raw, qt.shape)
        got = native.repack_from_wire(g, raw, qt.shape)
        assert got is not None
        assert set(got.planes) == set(want.planes), (
            gtype, set(got.planes) ^ set(want.planes))
        for key in want.planes:
            a = np.asarray(want[key])
            b = np.asarray(got[key])
            if a.dtype == np.float16:
                a, b = a.view(np.uint16), b.view(np.uint16)
            np.testing.assert_array_equal(a, b, err_msg=f"{gtype} {key}")


def test_spm_tokenizer_roundtrip_and_merge_order():
    """SPM greedy score-merge: higher-score pair merges first; byte
    fallback covers out-of-vocab characters; decode round-trips."""
    from ggmlsharp_tpu.io.tokenizer import SPMTokenizer

    tokens = ["<unk>", "<s>", "</s>", "▁", "▁he", "he", "ll", "llo", "o",
              "▁hello", "h", "e", "l"] + [f"<0x{b:02X}>" for b in range(256)]
    scores = [0.0, 0.0, 0.0, -1.0, -2.0, -3.0, -4.0, -5.0, -6.0, -0.5,
              -9.0, -9.0, -9.0] + [-20.0] * 256
    tok = SPMTokenizer(tokens, scores)
    ids = tok.encode("hello", bos=True)
    assert ids[0] == tok.bos_id
    assert ids[1:] == [tokens.index("▁hello")]  # best-score full merge
    assert tok.decode(ids) == "hello"
    # out-of-vocab char → utf-8 byte tokens
    ids2 = tok.encode("héllo", bos=False)
    assert tok.decode(ids2) == "héllo"


def test_bpe_tokenizer_roundtrip():
    from ggmlsharp_tpu.io.tokenizer import BPETokenizer, _B2U

    # tiny byte-level vocab: all single mapped bytes + two merges
    singles = sorted(set(_B2U.values()))
    tokens = singles + ["he", "hel"]
    merges = ["h e", "he l"]
    tok = BPETokenizer(tokens, merges)
    ids = tok.encode("hello")
    assert tok.decode(ids) == "hello"
    assert tokens[ids[0]] == "hel"  # merges applied in rank order


def test_tokenizer_from_gguf_metadata(tmp_path):
    from ggmlsharp_tpu.io.gguf import GGUFReader, GGUFWriter
    from ggmlsharp_tpu.io.tokenizer import SPMTokenizer, from_gguf

    tokens = ["<unk>", "<s>", "</s>", "▁", "▁hi", "hi", "h", "i"] + \
        [f"<0x{b:02X}>" for b in range(256)]
    scores = [0.0, 0.0, 0.0, -1.0, -0.5, -2.0, -9.0, -9.0] + [-20.0] * 256
    w = GGUFWriter()
    w.add_meta("tokenizer.ggml.model", 8, "llama")
    w.add_meta("tokenizer.ggml.tokens", 9, (8, tokens))   # arr of str
    w.add_meta("tokenizer.ggml.scores", 9, (6, scores))   # arr of f32
    w.add_meta("tokenizer.ggml.bos_token_id", 4, 1)
    w.add_tensor("dummy", np.zeros((2, 2), np.float32))
    path = str(tmp_path / "tok.gguf")
    w.write(path)

    tok = from_gguf(GGUFReader(path))
    assert isinstance(tok, SPMTokenizer)
    ids = tok.encode("hi")
    assert tok.decode(ids) == "hi"


def test_spm_native_matches_python_fuzz():
    """Native C++ SPM encode (native/tokenize.cpp) is id-identical to the
    pure-Python greedy rescan on fuzzed vocabs and texts (multi-byte UTF-8,
    byte fallback, tied scores)."""
    import random

    from ggmlsharp_tpu.io import native as na
    from ggmlsharp_tpu.io.tokenizer import SPMTokenizer

    if not na.tokenizer_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = random.Random(0)
    pieces = ["a", "b", "c", "▁", "ab", "bc", "abc", "▁a", "▁ab", "ç", "aç",
              "日", "本", "日本", "e", "he", "hello", "▁the", "th", "the"]
    texts = ["hello abc", "the quick ç brown 日本", "aaaa bbbb abab",
             "▁already prefixed", "日本日本日本", "", "   spaces   ",
             "mixed日本and ascii ç end"]
    for trial in range(20):
        vocab = ["<unk>", "<s>", "</s>"] + \
            rng.sample(pieces, rng.randint(5, len(pieces))) + \
            [f"<0x{b:02X}>" for b in range(256)]
        scores = [0.0] * 3 + [
            round(rng.choice([-1.0, -2.0, -2.0, -3.0, rng.uniform(-9, 0)]), 3)
            for _ in range(len(vocab) - 259)
        ] + [-20.0] * 256
        tok = SPMTokenizer(list(vocab), list(scores))
        nat = tok._native()
        assert nat is not None
        for text in texts:
            got = tok.encode(text, bos=True)  # native path
            tok2 = SPMTokenizer(list(vocab), list(scores))
            tok2._native_h = None  # force pure-Python greedy
            want = tok2.encode(text, bos=True)
            assert got == want, (trial, text, got, want)


def test_bpe_native_matches_python_fuzz():
    """Native C++ BPE piece encode is id-identical to the Python merge
    loop on fuzzed merge tables and pieces."""
    import random

    from ggmlsharp_tpu.io import native as na
    from ggmlsharp_tpu.io.tokenizer import BPETokenizer, _B2U

    if not na.tokenizer_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    import os

    os.environ["GGML_TPU_NATIVE_BPE"] = "1"
    rng = random.Random(3)
    singles = sorted(set(_B2U.values()))
    for trial in range(10):
        extras = ["he", "hel", "ll", "llo", "lo", "the", "th", "ab", "abc"]
        picked = rng.sample(extras, rng.randint(3, len(extras)))
        tokens = singles + picked
        merge_cands = ["h e", "he l", "l l", "ll o", "l o", "t h", "th e",
                       "a b", "ab c"]
        merges = [m for m in merge_cands
                  if "".join(m.split(" ", 1)) in picked]
        rng.shuffle(merges)
        tok = BPETokenizer(list(tokens), list(merges))
        assert tok._native() is not None
        tok2 = BPETokenizer(list(tokens), list(merges))
        tok2._native_h = None  # force pure Python
        for text in ["hello the abc", "abcabc ll o", "the the he",
                     "xyzzy hello"]:
            got = tok.encode(text)
            want = tok2.encode(text)
            assert got == want, (trial, text, got, want)
            assert tok.decode(got) == tok2.decode(want)


@pytest.mark.slow
def test_orbax_sharded_checkpoint_roundtrip(tmp_path):
    """save_checkpoint_sharded writes sharded jax.Arrays per-shard via
    orbax and restores them WITH the `like` tree's shardings; QTensor
    planes round-trip exactly."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ggmlsharp_tpu import GType, quantize
    from ggmlsharp_tpu.io.checkpoint import (load_checkpoint_sharded,
                                             save_checkpoint_sharded)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("model",))
    sh = NamedSharding(mesh, P("model", None))
    w = jax.device_put(
        jnp.arange(64 * 32, dtype=jnp.float32).reshape(64, 32) / 100.0, sh)
    tree = {"w": w, "q": quantize(np.ones((16, 64), np.float32) * 0.03,
                                  GType.Q4_0), "step_scalar": jnp.float32(3)}

    save_checkpoint_sharded(str(tmp_path / "ck"), tree, step=7)
    like = {"w": jax.device_put(jnp.zeros((64, 32), jnp.float32), sh),
            "q": tree["q"], "step_scalar": jnp.float32(0)}
    got, step = load_checkpoint_sharded(str(tmp_path / "ck"), like=like)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(w))
    assert got["w"].sharding.is_equivalent_to(sh, 2)
    assert got["q"].gtype == tree["q"].gtype
    for k in tree["q"].planes:
        np.testing.assert_array_equal(np.asarray(got["q"].planes[k]),
                                      np.asarray(tree["q"].planes[k]))


@pytest.mark.slow
def test_gguf_gptj_roundtrip(tmp_path):
    """gptj-arch GGUF export → import round trip: quantized planes ride the
    wire bit-exactly and the reloaded model's logits match."""
    import jax
    import jax.numpy as jnp

    from ggmlsharp_tpu import GType
    from ggmlsharp_tpu.io.gguf import load_gguf_gptj, save_gguf_gptj
    from ggmlsharp_tpu.models import gptj

    cfg = gptj.GPTJConfig(n_vocab=256, n_ctx=64, n_embd=256, n_head=4,
                          n_layer=2, rotary_dim=16)
    params = gptj.init_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    # GGUF wire wants (N, .)-row layouts → swar off for the export copy
    qparams = gptj.quantize_params(params, GType.Q4_0, swar=False)

    path = str(tmp_path / "gptj-q4_0.gguf")
    save_gguf_gptj(path, cfg, qparams)
    cfg2, p2 = load_gguf_gptj(path)
    # ln_eps rides the wire as f32 — compare it with tolerance
    assert abs(cfg2.ln_eps - cfg.ln_eps) < 1e-9
    import dataclasses

    assert dataclasses.replace(cfg2, ln_eps=cfg.ln_eps) == cfg

    p2 = jax.tree.map(jnp.asarray, p2)  # QTensor planes are pytree leaves

    toks = jnp.asarray([[5, 17, 99, 2]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    la, _ = gptj.forward(qparams, cfg, toks,
                         gptj.new_cache(cfg, 1, dtype=jnp.float32), pos)
    lb, _ = gptj.forward(p2, cfg2, toks,
                         gptj.new_cache(cfg2, 1, dtype=jnp.float32), pos)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-4, atol=2e-4)
