"""diag11: is the 'chunked-K corruption' just bf16 MXU input rounding?

Prediction: the kernel's DEFAULT-precision dots round both operands to
bf16 (8-bit mantissa) before a single MXU pass with f32 accumulation. At
K=11008 and unit-scale test tensors the resulting noise is
sigma ~ 2^-8 * |x·w| * sqrt(K) ~ 0.2 absolute — precisely the magnitude the
failing diags flagged with their (|want|+0.2)-denominator metrics. If a
CPU-side simulation of that rounding reproduces the TPU output elementwise
(residual at f32 summation-order level), the kernel was never wrong — the
test tolerances were.

Run: python scripts/diag_chunked11.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bf16(a):
    return np.asarray(jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
                      .astype(jnp.float32))


def run_config(K, NC, TILE, cpu, tpu, rng):
    from ggmlsharp_tpu import GType, quantize, dequantize
    from ggmlsharp_tpu.kernels.matmul_q import (
        _call_kernel_swar, swar_permute_x)
    from ggmlsharp_tpu.quant.formats import (
        swar_pack_values, swar_pack_scales, unpack_nibbles,
        from_storage_order)

    N, B = 256, 8
    w_np = rng.standard_normal((N, K)).astype(np.float32) * 0.5
    x_np = rng.standard_normal((B, K)).astype(np.float32)
    with jax.default_device(cpu):
        qw = jax.jit(lambda a: quantize(a, GType.Q4_0))(jnp.asarray(w_np))
        wd = np.asarray(jax.jit(dequantize)(qw))  # (q-8)*d exact
        planes = {
            "qs_t": np.asarray(swar_pack_values(
                from_storage_order(unpack_nibbles(qw.planes["qs"], K), 32),
                NC)),
            "d_t": np.asarray(swar_pack_scales(qw.planes["d"], NC)),
        }
        xlo, xhi = jax.tree.map(np.asarray, jax.jit(
            lambda a: swar_permute_x(a, K, NC))(jnp.asarray(x_np)))
        d = np.asarray(qw.planes["d"]).astype(np.float32)  # (N, C)
    xs = x_np.reshape(B, K // 32, 32).sum(axis=-1)
    want = (x_np.astype(np.float64) @ wd.astype(np.float64).T)

    got = np.asarray(_call_kernel_swar(
        jnp.asarray(xlo), jnp.asarray(xhi), jnp.asarray(xs), planes,
        GType.Q4_0, N, K, TILE, NC, B))

    # --- bf16 MXU simulation (per chunk, matching the kernel's dots) ----
    # kernel: dot(x, q*d) per lo/hi half per chunk + dot(xs, -8d) per chunk
    C = K // 32
    wplus = wd + 8.0 * np.repeat(d, 32, axis=1)  # q*d, exact in f32
    sim = np.zeros((B, N), np.float64)
    kc = K // NC
    cc = kc // 32
    for t in range(NC):
        sl = slice(t * kc, (t + 1) * kc)
        sim += bf16(x_np[:, sl]).astype(np.float64) @ \
            bf16(wplus[:, sl]).astype(np.float64).T
        slc = slice(t * cc, (t + 1) * cc)
        sim += bf16(xs[:, slc]).astype(np.float64) @ \
            bf16(-8.0 * d[:, slc]).astype(np.float64).T

    scale = np.abs(want) + 2e-1
    e_got = np.abs(got - want) / scale
    e_sim = np.abs(sim - want) / scale
    resid = np.abs(got - sim) / scale
    print(f"  K={K} nc={NC}:", flush=True)
    print(f"    tpu-vs-exact   max {e_got.max():.3e} med "
          f"{np.median(e_got):.3e}", flush=True)
    print(f"    bf16sim-vs-exact max {e_sim.max():.3e} med "
          f"{np.median(e_sim):.3e}", flush=True)
    print(f"    tpu-vs-bf16sim max {resid.max():.3e} med "
          f"{np.median(resid):.3e}", flush=True)
    corr = np.corrcoef((got - want).ravel(), (sim - want).ravel())[0, 1]
    print(f"    error-pattern correlation {corr:.4f}", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rng = np.random.default_rng(7)
    run_config(1024, 1, 256, cpu, tpu, rng)
    rng = np.random.default_rng(7)
    run_config(11264, 2, 256, cpu, tpu, rng)


if __name__ == "__main__":
    main()
