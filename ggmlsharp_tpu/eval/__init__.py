from .perplexity import (compare_quantizers, perplexity,
                         quantization_quality)

__all__ = ["compare_quantizers", "perplexity", "quantization_quality"]
