from . import dedup, relational, search, similarity, text, tswindow

__all__ = ["relational", "tswindow", "dedup", "search", "similarity", "text"]
