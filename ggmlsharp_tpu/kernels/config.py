"""Kernel dispatch config.

Pallas kernels compile natively on TPU; on the CPU test mesh they run in
interpreter mode (slow) — so the default policy is: use Pallas on TPU,
use the unfused jnp reference path elsewhere. Override globally with
`set_pallas(True/False)` or per-call via the ops' `use_pallas=` argument;
env var GGML_TPU_FORCE_PALLAS=1 forces Pallas+interpret everywhere (used by
kernel-correctness tests).
"""
from __future__ import annotations

import os

import jax

_FORCE = os.environ.get("GGML_TPU_FORCE_PALLAS") == "1"
_override: bool | None = True if _FORCE else None


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def pallas_enabled() -> bool:
    if _override is not None:
        return _override
    return _on_tpu()


def set_pallas(enabled: bool | None):
    """True/False to force; None to restore auto (TPU-only)."""
    global _override
    _override = enabled


def interpret_mode() -> bool:
    """Whether pallas_call must use the interpreter (non-TPU backends)."""
    return not _on_tpu()


# --- matmul dot mode ------------------------------------------------------
# "bf16" (default): dequantize to bf16, single-pass MXU dot with f32
#   accumulation — per-product rounding 2^-9, far below any quant format's
#   own noise, and ~6x fewer MXU passes than exact-f32.
# "f32": dequantize to f32, Precision.HIGHEST dot — bit-comparable to the
#   jnp reference path; used by parity tests and exact evals.
_mm_dot = os.environ.get("GGML_TPU_MM_DOT", "bf16")


def mm_dot_mode() -> str:
    return _mm_dot


def set_mm_dot(mode: str):
    global _mm_dot
    assert mode in ("bf16", "f32"), mode
    _mm_dot = mode
