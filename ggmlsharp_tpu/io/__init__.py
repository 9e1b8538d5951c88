"""Model/tensor IO: GGUF import/export, checkpoint save/load.

The reference has NO serialization of any kind (SURVEY §5: "no model-file
loader; upstream's gguf/ggml file format is absent") — this subsystem is new,
per the build requirement (GGUF importer for perplexity parity + orbax-style
sharded checkpoints).
"""

from .gguf import GGUFReader, GGUFWriter, load_gguf_llama, qtensor_from_wire, qtensor_to_wire
from .checkpoint import load_checkpoint, save_checkpoint
from .tokenizer import BPETokenizer, SPMTokenizer
from .tokenizer import from_gguf as tokenizer_from_gguf

__all__ = [
    "BPETokenizer",
    "GGUFReader",
    "GGUFWriter",
    "load_checkpoint",
    "load_gguf_llama",
    "qtensor_from_wire",
    "qtensor_to_wire",
    "save_checkpoint",
    "SPMTokenizer",
    "tokenizer_from_gguf",
]
