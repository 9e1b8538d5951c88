"""Single typed runtime-config object with env overrides (SURVEY §5 config
system: the reference's config is compile-time DefineConstants + one env var;
parity here is one dataclass read once from GGML_TPU_* env vars).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_bool(name, default):
    v = os.environ.get(name)
    return default if v is None else v not in ("0", "false", "False", "")


@dataclass
class RuntimeConfig:
    # kernel dispatch
    use_pallas: bool | None = None  # None = auto (TPU only)
    mm_dot: str = field(
        default_factory=lambda: os.environ.get("GGML_TPU_MM_DOT", "bf16")
    )
    # parallelism defaults
    mesh_data: int | None = field(
        default_factory=lambda: _opt_int("GGML_TPU_MESH_DATA")
    )
    mesh_model: int | None = field(
        default_factory=lambda: _opt_int("GGML_TPU_MESH_MODEL")
    )
    # serving
    batch_slots: int = field(
        default_factory=lambda: int(os.environ.get("GGML_TPU_BATCH_SLOTS", "4"))
    )
    int8_kv: bool = field(
        default_factory=lambda: _env_bool("GGML_TPU_INT8_KV", False)
    )
    # numerics
    quantize_activations: bool = field(
        default_factory=lambda: _env_bool("GGML_TPU_QUANT_ACTS", True)
    )

    def apply(self):
        """Push settings into the per-subsystem knobs."""
        from .kernels import config as kcfg

        kcfg.set_pallas(self.use_pallas)
        kcfg.set_mm_dot(self.mm_dot)
        return self


def _opt_int(name):
    v = os.environ.get(name)
    return int(v) if v else None


_config: RuntimeConfig | None = None


def get_config() -> RuntimeConfig:
    global _config
    if _config is None:
        _config = RuntimeConfig()
    return _config


def set_config(cfg: RuntimeConfig) -> RuntimeConfig:
    global _config
    _config = cfg
    return cfg.apply()
