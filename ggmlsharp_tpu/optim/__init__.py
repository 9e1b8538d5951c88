"""Optimizers: Adam and L-BFGS with backtracking line search (ggml_opt
parity, Ggml.cs:1604-2325)."""

from .params import (
    AdamParams,
    LBFGSParams,
    LineSearch,
    OptParams,
    OptResult,
    opt_default_params,
)
from .adam import opt_adam
from .lbfgs import opt_lbfgs
from .facade import opt, opt_fn

try:  # optax interop is optional — the core optimizers stay optax-free
    from .optax_compat import as_optax, opt_optax
except ImportError:  # pragma: no cover
    as_optax = opt_optax = None

__all__ = [
    "AdamParams",
    "LBFGSParams",
    "LineSearch",
    "OptParams",
    "OptResult",
    "as_optax",
    "opt",
    "opt_adam",
    "opt_default_params",
    "opt_fn",
    "opt_lbfgs",
    "opt_optax",
]
