from .ndv import streaming_ndv

__all__ = ["streaming_ndv"]
