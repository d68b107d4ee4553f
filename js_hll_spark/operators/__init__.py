from . import ann, dedup, multimodal, text

__all__ = ["ann", "dedup", "multimodal", "text"]
