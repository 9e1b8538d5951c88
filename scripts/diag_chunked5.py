"""Determinism probe: same fused chunked-K Q4_0 computation repeated in one
process + across data seeds. Distinguishes a DMA race (run-to-run variance)
from a value-dependent kernel bug (stable wrong answer for one seed)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    from ggmlsharp_tpu import GType, quantize, dequantize
    from ggmlsharp_tpu.kernels.matmul_q import mul_mat_q_fused
    from ggmlsharp_tpu.quant.formats import to_swar

    for seed in (7, 11):
        rng = np.random.default_rng(seed)
        w_np = rng.standard_normal((256, 11008)).astype(np.float32) * 0.5
        x_np = rng.standard_normal((8, 11008)).astype(np.float32)
        x = jnp.asarray(x_np)
        qw = jax.jit(lambda a: quantize(a, GType.Q4_0))(jnp.asarray(w_np))
        qs = jax.jit(to_swar)(qw)
        wd = np.asarray(jax.jit(dequantize)(qw))
        want = x_np @ wd.T
        f = jax.jit(lambda v: mul_mat_q_fused(qs, v, quantize_acts=False))
        runs = [np.asarray(f(x)) for _ in range(4)]
        errs = [np.max(np.abs(r - want) / (np.abs(want) + 2e-1)) for r in runs]
        spread = max(np.max(np.abs(runs[0] - r)) for r in runs[1:])
        print(f"  seed {seed}: errs {['%.2e' % e for e in errs]} "
              f"run-to-run spread {spread:.2e}", flush=True)

if __name__ == "__main__":
    main()
