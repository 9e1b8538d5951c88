"""ggml-style graph training (the reference's Test2 workflow, verbatim
through the compat layer) + the functional optimizer API.

    python examples/train_graph.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from ggmlsharp_tpu.compat import *  # noqa: F403
from ggmlsharp_tpu.dtypes import GType
from ggmlsharp_tpu.graph import set_data
from ggmlsharp_tpu.optim import OptParams, opt_fn
from ggmlsharp_tpu.optim.params import OptType


def main():
    # --- graph API: least-squares line fit (Test2 case 1) ------------------
    ctx = ggml_init()  # noqa: F405
    xi = [1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    yi = [15.0, 25, 35, 45, 55, 65, 75, 85, 95, 105]
    n = len(xi)
    x = set_data(ggml_new_tensor_1d(ctx, GType.F32, n), jnp.asarray(xi))  # noqa: F405
    y = set_data(ggml_new_tensor_1d(ctx, GType.F32, n), jnp.asarray(yi))  # noqa: F405
    t0 = ggml_new_f32(ctx, 0.0)  # noqa: F405
    t1 = ggml_new_f32(ctx, 0.0)  # noqa: F405
    ggml_set_param(ctx, t0)  # noqa: F405
    ggml_set_param(ctx, t1)  # noqa: F405
    pred = ggml_add(ctx, ggml_mul(ctx, x, ggml_repeat(ctx, t1, x)),  # noqa: F405
                    ggml_repeat(ctx, t0, x))  # noqa: F405
    f = ggml_div(ctx, ggml_sum(ctx, ggml_sqr(ctx, ggml_sub(ctx, pred, y))),  # noqa: F405
                 ggml_new_f32(ctx, 2.0 * n))  # noqa: F405
    params = ggml_opt_default_params(GGML_OPT_ADAM)  # noqa: F405
    params.adam.alpha = 0.01
    ggml_opt(ctx, params, f)  # noqa: F405
    print(f"adam line fit: t0={ggml_get_f32_1d(t0, 0):.4f} "  # noqa: F405
          f"t1={ggml_get_f32_1d(t1, 0):.4f}  (expect 5, 10)")  # noqa: F405

    # --- functional API: L-BFGS on Rosenbrock ------------------------------
    def rosen(p):
        a, b = p
        return (1 - a) ** 2 + 100.0 * (b - a * a) ** 2

    prm = OptParams(type=OptType.LBFGS)
    prm.lbfgs.n_iter = 200
    (a, b), fx, res, iters = opt_fn(
        rosen, (jnp.float32(-1.2), jnp.float32(1.0)), prm
    )
    print(f"lbfgs rosenbrock: ({float(a):.4f}, {float(b):.4f}) "
          f"f={float(fx):.2e} in {iters} iters ({res.name})")


if __name__ == "__main__":
    main()
