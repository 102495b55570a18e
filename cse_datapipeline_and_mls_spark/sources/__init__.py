from .ingest import (
    flatten_envelope,
    read_csv_with_schema,
    read_snapshot_json,
)
from .loader import load_table, load_tables, register_views

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_csv_with_schema",
    "flatten_envelope",
    "read_snapshot_json",
]
