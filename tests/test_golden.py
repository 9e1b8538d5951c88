"""Golden-vector parity vs an independent C oracle (tests/golden/gen_golden.c
— scalar C implementing upstream ggml/llama.cpp GGUF-era wire semantics,
written from the format definitions; shares no code with the JAX side).

Anchors beyond the self-referential round-trip oracles (VERDICT r1 item 6):
  * quantize → wire bytes BIT-EXACT per legacy format,
  * wire → dequantize BIT-EXACT (f16 scale round-trips included),
  * k-quant wire import dequant BIT-EXACT (random valid blocks),
  * the exact integer-dot kernel vs C vec_dot within f32-summation-order
    tolerance.
"""
import os
import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ggmlsharp_tpu import GType, dequantize, quantize
from ggmlsharp_tpu.io.gguf import qtensor_from_wire, qtensor_to_wire

ROWS, K = 4, 256
GOLD = os.path.join(os.path.dirname(__file__), "golden", "golden.bin")


@pytest.fixture(scope="module")
def gold():
    sections = {}
    with open(GOLD, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (nl,) = struct.unpack_from("<I", data, off)
        off += 4
        name = data[off : off + nl].decode()
        off += nl
        (pb,) = struct.unpack_from("<I", data, off)
        off += 4
        sections[name] = data[off : off + pb]
        off += pb
    return sections


LEGACY = {
    "q4_0": GType.Q4_0, "q4_1": GType.Q4_1,
    "q5_0": GType.Q5_0, "q5_1": GType.Q5_1, "q8_0": GType.Q8_0,
}


@pytest.mark.parametrize("name", sorted(LEGACY))
def test_quantize_wire_bytes_bit_exact(gold, name):
    g = LEGACY[name]
    x = np.frombuffer(gold[f"{name}.input"], np.float32).reshape(ROWS, K)
    qt = jax.jit(lambda a: quantize(a, g))(jnp.asarray(x))
    _, wire = qtensor_to_wire(qt)
    assert wire == gold[f"{name}.wire"], f"{name}: wire bytes differ"


@pytest.mark.parametrize("name", sorted(LEGACY))
def test_wire_dequant_bit_exact(gold, name):
    g = LEGACY[name]
    qt = qtensor_from_wire(g, gold[f"{name}.wire"], (ROWS, K))
    got = np.asarray(jax.jit(dequantize)(jax.tree.map(jnp.asarray, qt)))
    want = np.frombuffer(gold[f"{name}.dequant"], np.float32).reshape(ROWS, K)
    np.testing.assert_array_equal(got, want, err_msg=name)


@pytest.mark.parametrize("name,g", [("q4_k", GType.Q4_K),
                                    ("q6_k", GType.Q6_K)])
def test_kquant_wire_dequant_bit_exact(gold, name, g):
    qt = qtensor_from_wire(g, gold[f"{name}.wire"], (ROWS, K))
    got = np.asarray(jax.jit(dequantize)(jax.tree.map(jnp.asarray, qt)))
    want = np.frombuffer(gold[f"{name}.dequant"], np.float32).reshape(ROWS, K)
    np.testing.assert_array_equal(got, want, err_msg=name)


@pytest.mark.parametrize("name,g", [("dot_q4_0_q8_0", GType.Q4_0),
                                    ("dot_q8_0_q8_0", GType.Q8_0),
                                    ("dot_q4_1_q8_1", GType.Q4_1),
                                    ("dot_q5_0_q8_0", GType.Q5_0),
                                    ("dot_q5_1_q8_1", GType.Q5_1)])
def test_integer_dot_vs_c_oracle(gold, name, g, monkeypatch):
    """ggml vec_dot semantics (int8 MACs × block-scale products; Q8_1
    s-corrections for the min-bearing formats, Q5 high-bit reinsertion —
    the classic parity-drift sites, Ggml.cs:1165-1381). The C oracle
    accumulates blocks in f32 serially; the kernel sums per-block f32
    terms in a different order — tolerance covers exactly that."""
    import ggmlsharp_tpu.kernels.matmul_q as mq
    from ggmlsharp_tpu.kernels.matmul_q import mul_mat_q_int_dot

    monkeypatch.setattr(mq, "TILE_N", ROWS)  # 4-row fixture < default tile
    wire_name = name[4:].rsplit("_q8", 1)[0] + ".wire"  # dot_q4_1_… → q4_1
    qt = qtensor_from_wire(g, gold[wire_name], (ROWS, K))
    qt = jax.tree.map(jnp.asarray, qt)
    x = jnp.asarray(np.frombuffer(gold["dot.x"], np.float32))
    got = np.asarray(mul_mat_q_int_dot(qt, x[None, :]))[0]
    want = np.frombuffer(gold[f"{name}.y"], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
