"""PySpark-native analytics engine with the query/data-processing surface of
tigerkitty78/CSE_DataPipeline-and-MLs, re-expressed Spark-first.

The reference (read-only at /root/reference) is a stock-analytics system:
time-series window features per instrument, fact->dim broadcast joins,
streaming ingest with dedup + threshold alerting, and GBT model pipelines.
This package implements that surface — plus large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing) —
as declarative DataFrame/SQL plans compiled by Catalyst.

Layout:
    session     SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
    schemas     explicit StructTypes + ingest-boundary helpers
    sources     table loaders for the driver testdata + reference-shaped data
    functions   scalar function library (SURVEY §2.8)
    operators   relational / window / dedup / similarity / text operators
    streaming   Structured Streaming pipelines (SURVEY §2.9)
    ml          MLlib pipelines replacing the reference's sklearn/XGB path
    queries     the driver-facing query registry + DuckDB oracle SQL
"""

__version__ = "0.1.0"
