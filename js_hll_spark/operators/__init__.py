from . import ann, dedup, multimodal, sample, text

__all__ = ["ann", "dedup", "multimodal", "sample", "text"]
