from .perplexity import perplexity, quantization_quality

__all__ = ["perplexity", "quantization_quality"]
