"""ggmlsharp_tpu — a TPU-native tensor & quantized-inference framework.

Re-implements (from scratch, TPU-first) the capability set of the
kant2002/GGMLSharp reference (a C# ggml port): block-quantized tensor formats,
a compute-graph API with reverse-mode (and second-order) autodiff, the full
transformer op set, Adam/L-BFGS optimizers, and profiling tooling — plus
models (GPT-2, Llama), fused Pallas dequant-matmul kernels, INT8 KV cache,
and multi-chip sharding the reference lacks. See SURVEY.md.
"""

from .dtypes import GType, TYPE_TRAITS, block_size, is_quantized, type_name, type_size
from .quant.formats import QTensor
from .quant.quantize import dequantize, quantize

__version__ = "0.1.0"

__all__ = [
    "GType",
    "TYPE_TRAITS",
    "QTensor",
    "block_size",
    "dequantize",
    "is_quantized",
    "quantize",
    "type_name",
    "type_size",
]
