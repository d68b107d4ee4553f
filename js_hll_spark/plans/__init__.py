from .checkpoint import StageRunner

__all__ = ["StageRunner"]
