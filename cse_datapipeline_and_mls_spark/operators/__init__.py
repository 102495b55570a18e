from . import dedup, relational, similarity, text, tswindow

__all__ = ["relational", "tswindow", "dedup", "similarity", "text"]
