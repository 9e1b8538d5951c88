from .formats import QTensor, pack_nibbles, unpack_nibbles
from .quantize import dequantize, quantize

__all__ = ["QTensor", "dequantize", "pack_nibbles", "quantize", "unpack_nibbles"]
