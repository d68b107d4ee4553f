from .webtext import extract_text, webtext_table

__all__ = ["extract_text", "webtext_table"]
