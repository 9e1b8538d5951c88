"""Comm/compute overlap: correctness of the ring reduce-scatter matmul on
the 8-device CPU mesh, and an HLO-schedule assertion on AOT-compiled v5e
TPU code proving XLA interleaves each collective-permute hop with the next
tile's compute (BASELINE "collectives overlapped with the fused
dequant-matmul"; the single sandbox chip cannot run true multi-chip, so the
schedule of the real TPU executable is the evidence)."""
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from ggmlsharp_tpu import GType, quantize
from ggmlsharp_tpu.parallel.overlap import row_parallel_mul_mat_overlapped

pytestmark = pytest.mark.slow  # full engine/kernel flows; fast loop skips

N, K = 512, 1024


def _data():
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    return w, x


def test_ring_overlap_matches_dense():
    w, x = _data()
    qw = jax.jit(lambda a: quantize(a, GType.Q4_0))(w)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
    got = row_parallel_mul_mat_overlapped(qw, x, mesh)
    from ggmlsharp_tpu.ops.matmul import mul_mat_q

    want = mul_mat_q(qw, x, quantize_acts=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_ring_overlap_dense_weights():
    w, x = _data()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("model",))
    got = row_parallel_mul_mat_overlapped(w, x, mesh)
    want = x @ w.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_tpu_hlo_schedule_overlaps_permute_with_compute(use_pallas):
    """AOT-compile for a deviceless 2x4 v5e topology and assert the
    optimized schedule starts each collective-permute asynchronously and
    runs real compute between the start and its matching done — i.e. the
    hop rides ICI while the MXU/VPU work on the next tile. use_pallas=True
    compiles the REAL fused dequant-matmul kernel (the Mosaic custom call)
    into the schedule — BASELINE's "collectives overlapped with the fused
    dequant-matmul" verbatim; False covers the jnp-dequant fallback."""
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x4")
        devices = np.array(topo.devices).reshape(8)
    except Exception as e:  # pragma: no cover - older libtpu
        pytest.skip(f"deviceless TPU topology unavailable: {e}")

    w, x = _data()
    qw = jax.jit(lambda a: quantize(a, GType.Q4_0))(w)
    mesh = Mesh(devices, ("model",))

    def f(qw, x):
        return row_parallel_mul_mat_overlapped(qw, x, mesh,
                                               use_pallas=use_pallas)

    lowered = jax.jit(f).lower(qw, x)
    hlo = lowered.compile().as_text()

    starts = [m.start() for m in re.finditer(r"collective-permute-start", hlo)]
    dones = [m.start() for m in re.finditer(r"collective-permute-done", hlo)]
    assert len(starts) >= 7 and len(dones) >= 7, (len(starts), len(dones))

    # at least one async window must contain real compute (the schedule is
    # linear text of the entry computation in order). With pallas the
    # compute IS the Mosaic custom call ("tpu_custom_call").
    pat = r"custom-call|fusion|dot\(" if use_pallas else \
        r"fusion|dot\(|convolution"
    compute = [m.start() for m in re.finditer(pat, hlo)]
    overlapped = 0
    for s, d in zip(starts, dones):
        if any(s < c < d for c in compute):
            overlapped += 1
    assert overlapped >= 4, (
        f"only {overlapped} of {len(starts)} permute windows contain compute")
    if use_pallas:
        assert "tpu_custom_call" in hlo or "custom-call" in hlo
