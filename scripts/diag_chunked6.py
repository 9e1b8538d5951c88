"""Order-dependence probe: in ONE process, run the fused chunked-K Q4_0
call (seed 7) FIRST (diag3's order — passed), then again after other
device work (diag5's order — failed). If correctness flips with order,
the corruption is in relay execution/fetch ordering, not kernel logic."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    from ggmlsharp_tpu import GType, quantize, dequantize
    from ggmlsharp_tpu.kernels.matmul_q import mul_mat_q_fused
    from ggmlsharp_tpu.quant.formats import to_swar

    rng = np.random.default_rng(7)
    w_np = rng.standard_normal((256, 11008)).astype(np.float32) * 0.5
    x_np = rng.standard_normal((8, 11008)).astype(np.float32)
    x = jnp.asarray(x_np)
    qw = jax.jit(lambda a: quantize(a, GType.Q4_0))(jnp.asarray(w_np))
    qs = jax.jit(to_swar)(qw)
    f = jax.jit(lambda v: mul_mat_q_fused(qs, v, quantize_acts=False))

    # A: fused first (diag3 order)
    got_a = np.asarray(f(x))
    wd = np.asarray(jax.jit(dequantize)(qw))
    want = x_np @ wd.T
    err_a = np.max(np.abs(got_a - want) / (np.abs(want) + 2e-1))
    print(f"  A fused-first            err {err_a:.3e}", flush=True)

    # B: fused after the dequantize fetch (diag5 order)
    got_b = np.asarray(f(x))
    err_b = np.max(np.abs(got_b - want) / (np.abs(want) + 2e-1))
    print(f"  B fused-after-dequant    err {err_b:.3e}", flush=True)

    # C: fused with a settle delay before the fetch
    out = f(x)
    jax.block_until_ready(out)
    time.sleep(10)
    got_c = np.asarray(out)
    err_c = np.max(np.abs(got_c - want) / (np.abs(want) + 2e-1))
    print(f"  C fused + 10s settle     err {err_c:.3e}", flush=True)

    # D: A repeated — does the FIRST-dispatch slot stay special?
    got_d = np.asarray(f(x))
    err_d = np.max(np.abs(got_d - want) / (np.abs(want) + 2e-1))
    print(f"  D fused again            err {err_d:.3e}", flush=True)
    print(f"  A==B: {np.array_equal(got_a, got_b)}  "
          f"B==C: {np.array_equal(got_b, got_c)}  "
          f"C==D: {np.array_equal(got_c, got_d)}", flush=True)

if __name__ == "__main__":
    main()
