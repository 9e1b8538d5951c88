"""Shared serving helpers (split from engine.py, r4)."""
from __future__ import annotations

from .request import Request, _stopped


def _bucket(n: int, buckets=(16, 32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]
