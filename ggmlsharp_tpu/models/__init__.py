"""Model families (absent from the reference; required by BASELINE)."""

from . import gpt2, llama, kv_cache, sampling
from .kv_cache import KVCache, init_cache

__all__ = ["KVCache", "gpt2", "init_cache", "kv_cache", "llama", "sampling"]
