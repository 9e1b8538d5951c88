"""diag10: (1) exhaustive hardware test of the in-kernel f16-pair scale
decode over all 65536 bit patterns (+ the pltpu.repeat expansion); (2) the
bad-entry map of the failing matmul — are wrong outputs column-structured
(i.e. tied to specific weight rows / scale blocks)?

diag9 showed sparse value-dependent corruption (median err = bf16 noise,
max 0.89) independent of operand provenance and kernel formulation. The one
component every failing formulation shares is _decode_f16x2_arr.

Run: python scripts/diag_chunked10.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    print(f"devices: {jax.devices()}", flush=True)
    from ggmlsharp_tpu.kernels.matmul_q import (
        _decode_f16x2_arr, _call_kernel_swar, swar_permute_x)
    from ggmlsharp_tpu.kernels.config import interpret_mode

    # --- 1: exhaustive decode ------------------------------------------
    # plane (128, 256) uint32 = 32768 words = 65536 f16 patterns
    pats = np.arange(65536, dtype=np.uint32).reshape(2, 128, 256)
    plane = pats[0] | (pats[1] << 16)  # lo half: 0..32767, hi: 32768..65535

    def decode_kernel(p_ref, o_ref):
        o_ref[:] = _decode_f16x2_arr(p_ref[:])

    def rep_kernel(p_ref, o_ref):
        o_ref[:] = pltpu.repeat(_decode_f16x2_arr(p_ref[:]), 4, axis=0)

    got = np.asarray(jax.jit(lambda p: pl.pallas_call(
        decode_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        interpret=interpret_mode(),
    )(p))(plane))
    want = np.concatenate([
        pats[0].astype(np.uint16).view(np.float16).astype(np.float32),
        pats[1].astype(np.uint16).view(np.float16).astype(np.float32)],
        axis=0)
    finite = np.isfinite(want)
    bad = (got != want) & finite
    # exclude -0.0 vs 0.0 style equality issues
    bad &= ~((got == 0) & (want == 0))
    print(f"  decode: {int(bad.sum())}/{int(finite.sum())} finite patterns "
          f"wrong", flush=True)
    if bad.any():
        idx = np.argwhere(bad)[:10]
        for r, c in idx:
            pat = int(want[r, c].astype(np.float16).view(np.uint16)) \
                if False else (r * 256 + c if r < 128 else
                               32768 + (r - 128) * 256 + c)
            # recover the original u16 pattern from position
            u = (r * 256 + c) if r < 128 else (32768 + (r - 128) * 256 + c)
            print(f"    pattern 0x{u:04x}: got {got[r, c]!r} "
                  f"want {want[r, c]!r}", flush=True)

    gotr = np.asarray(jax.jit(lambda p: pl.pallas_call(
        rep_kernel,
        out_shape=jax.ShapeDtypeStruct((1024, 256), jnp.float32),
        interpret=interpret_mode(),
    )(p))(plane))
    wantr = np.repeat(want, 4, axis=0).reshape(256, 4, 256).reshape(1024, 256)
    # pltpu.repeat(axis=0) semantics: tile-wise repeat [x; x; x; x]
    wantr2 = np.concatenate([want] * 4, axis=0)
    m1 = float(np.abs(gotr - wantr)[np.isfinite(wantr)].max())
    m2 = float(np.abs(gotr - wantr2)[np.isfinite(wantr2)].max())
    print(f"  repeat: interleaved-diff {m1:.3e}  tiled-diff {m2:.3e}",
          flush=True)

    # --- 2: bad-entry map of the failing matmul -------------------------
    from ggmlsharp_tpu import GType, quantize, dequantize
    from ggmlsharp_tpu.quant.formats import (
        swar_pack_values, swar_pack_scales, unpack_nibbles,
        from_storage_order)

    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(7)
    N, K, NC, TILE, B = 256, 1024, 1, 256, 8
    w_np = rng.standard_normal((N, K)).astype(np.float32) * 0.5
    x_np = rng.standard_normal((B, K)).astype(np.float32)
    with jax.default_device(cpu):
        qw_c = jax.jit(lambda a: quantize(a, GType.Q4_0))(jnp.asarray(w_np))
        wd = np.asarray(jax.jit(dequantize)(qw_c))
        planes = {
            "qs_t": np.asarray(swar_pack_values(
                from_storage_order(unpack_nibbles(qw_c.planes["qs"], K), 32),
                NC)),
            "d_t": np.asarray(swar_pack_scales(qw_c.planes["d"], NC)),
        }
        xlo, xhi = jax.tree.map(np.asarray, swar_permute_x(
            jnp.asarray(x_np), K, NC))
    xs = x_np.reshape(B, K // 32, 32).sum(axis=-1)
    want_mm = x_np @ wd.T
    got_mm = np.asarray(_call_kernel_swar(
        jnp.asarray(xlo), jnp.asarray(xhi), jnp.asarray(xs),
        planes, GType.Q4_0, N, K, TILE, NC, B))
    err = np.abs(got_mm - want_mm) / (np.abs(want_mm) + 2e-1)
    badm = err > 0.1
    bad_cols = np.nonzero(badm.any(axis=0))[0]
    print(f"  matmul: bad entries {int(badm.sum())}/{badm.size}; "
          f"bad cols {len(bad_cols)}/{N}", flush=True)
    print(f"  per-bad-col row counts: "
          f"{[int(badm[:, c].sum()) for c in bad_cols[:16]]}", flush=True)
    print(f"  bad cols: {bad_cols[:24].tolist()}", flush=True)
    if len(bad_cols):
        c = int(bad_cols[0])
        print(f"  col {c}: got {got_mm[:, c]}", flush=True)
        print(f"  col {c}: want {want_mm[:, c]}", flush=True)
        d_col = np.asarray(qw_c.planes["d"])[c]  # (C,) f16 scales, row c
        print(f"  col {c} d-plane u16: "
              f"{[hex(int(v)) for v in d_col.view(np.uint16)[:32]]}",
              flush=True)


if __name__ == "__main__":
    main()
