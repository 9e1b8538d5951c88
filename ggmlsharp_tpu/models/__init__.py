"""Model families (absent from the reference; required by BASELINE)."""

from . import gpt2, gptj, llama, kv_cache, sampling, speculative
from .kv_cache import KVCache, init_cache
from .speculative import speculative_generate

__all__ = ["KVCache", "gpt2", "gptj", "init_cache", "kv_cache", "llama", "sampling",
           "speculative", "speculative_generate"]
