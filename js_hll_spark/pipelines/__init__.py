from .webtext import webtext_ndv_pipeline

__all__ = ["webtext_ndv_pipeline"]
