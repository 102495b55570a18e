"""Scalar function library (SURVEY §2.8).

Pure-Column helpers shared by queries, streaming, and ML: the sanitizer
and date parsers live in :mod:`..schemas`; text/vector functions in
:mod:`..operators.text` / :mod:`..operators.similarity`.
"""

from ..schemas import parse_date_multi, parse_filename_date, sanitize_column_name, sanitize_columns

__all__ = [
    "parse_date_multi",
    "parse_filename_date",
    "sanitize_column_name",
    "sanitize_columns",
]
