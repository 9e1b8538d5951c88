"""Isolate the smoke chunked-K 'want' path: is plain jnp.matmul (HIGHEST,
f32) wrong on this backend at (8, 11008) x (11008, 256)?"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(11)
    w_np = rng.standard_normal((256, 11008)).astype(np.float32) * 0.5
    x_np = rng.standard_normal((8, 11008)).astype(np.float32)
    for prec in ("HIGHEST", "DEFAULT"):
        f = jax.jit(lambda x, w, p=getattr(jax.lax.Precision, prec):
                    jnp.matmul(x, w.T, preferred_element_type=jnp.float32,
                               precision=p))
        got = np.asarray(f(jnp.asarray(x_np), jnp.asarray(w_np)))
        want = x_np @ w_np.T
        err = np.max(np.abs(got - want) / (np.abs(want) + 2e-1))
        print(f"  jnp.matmul {prec:8s} max-rel-err {err:.3e}", flush=True)
    # and the exact smoke comparison: fused vs mul_mat_q for rng(11)
    from ggmlsharp_tpu import GType, quantize, dequantize
    from ggmlsharp_tpu.kernels.matmul_q import mul_mat_q_fused
    from ggmlsharp_tpu.ops.matmul import mul_mat_q
    from ggmlsharp_tpu.quant.formats import to_swar
    x = jnp.asarray(x_np)
    for g in (GType.Q4_0, GType.Q4_1):
        qw = jax.jit(lambda a, g=g: quantize(a, g))(jnp.asarray(w_np))
        qs = jax.jit(to_swar)(qw)
        got = np.asarray(jax.jit(
            lambda v, qs=qs: mul_mat_q_fused(qs, v, quantize_acts=False))(x))
        want_dev = np.asarray(jax.jit(
            lambda v, qw=qw: mul_mat_q(qw, v, quantize_acts=False))(x))
        wd = np.asarray(jax.jit(dequantize)(qw))
        want_host = x_np @ wd.T
        for nm, w_ in (("mul_mat_q(dev)", want_dev), ("host", want_host)):
            err = np.max(np.abs(got - w_) / (np.abs(w_) + 2e-1))
            print(f"  {g.name} fused vs {nm:14s} max-rel-err {err:.3e}",
                  flush=True)
        errw = np.max(np.abs(want_dev - want_host) / (np.abs(want_host) + 2e-1))
        print(f"  {g.name} mul_mat_q(dev) vs host  max-rel-err {errw:.3e}",
              flush=True)

if __name__ == "__main__":
    main()
