"""Explicit schemas + ingest-boundary helpers.

The reference infers schemas twice per table (spark.read.csv inferSchema=True
at reference ml-algorithms/regression.py:48 and classifier.py:12 — an extra
full scan each) and sanitizes column names dynamically at scrape time
(reference data-pipeline/scraper/main.py:57). The engine pins explicit
StructTypes — at 100 TB an inference pass is a full extra read of the
dataset — and applies one canonical sanitizer at the ingest boundary only.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.column import Column

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/; see TESTDATA.md / FIXTURES.md §5)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# ---------------------------------------------------------------------------
# Reference-shaped tables (FIXTURES.md §1-4; mirrors the reference's CSV inputs)
# ---------------------------------------------------------------------------

PRICES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("quantity", T.LongType()),
        T.StructField("percentageChange", T.DoubleType()),
        T.StructField("change", T.DoubleType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("previousClose", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("lastTradedTime", T.LongType()),
        T.StructField("turnover", T.DoubleType()),
        T.StructField("sharevolume", T.LongType()),
        T.StructField("tradevolume", T.LongType()),
        T.StructField("Date", T.StringType()),
    ]
)

FINANCIALS_SCHEMA = T.StructType(
    [
        T.StructField("Symbol", T.StringType(), False),
        T.StructField("Quarter", T.StringType()),
        T.StructField("Total_Revenue", T.DoubleType()),
        T.StructField("Net_Income", T.DoubleType()),
        T.StructField("Basic_EPS", T.DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Ingest-boundary helpers
# ---------------------------------------------------------------------------

_SANITIZE_RE = re.compile(r"[\$#\[\]\/\. \t\n\r]")


def sanitize_column_name(name: str) -> str:
    """Canonical column-name sanitizer.

    Reproduces the reference's scrape-time cleanup
    (reference data-pipeline/scraper/main.py:57:
    ``df.columns.str.replace(r'[\\$#\\[\\]\\/\\. \\t\\n\\r]', '_', regex=True)``)
    as a pure function applied once at the ingest boundary.
    """
    return _SANITIZE_RE.sub("_", name)


def sanitize_columns(df: DataFrame) -> DataFrame:
    return df.toDF(*[sanitize_column_name(c) for c in df.columns])


def parse_date_multi(col: Column | str) -> Column:
    """Multi-format date parse: ISO first, then compact yyyyMMdd.

    The reference retries formats imperatively per value
    (reference ml-algorithms/ml_impl.py:22-30); here it is one declarative
    coalesce that Catalyst evaluates JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    # try_to_date, not to_date: ANSI mode (Spark 4 default) makes to_date
    # THROW on unparseable text; the reference returns NaT (ml_impl.py:30).
    return F.coalesce(F.try_to_date(c, "yyyy-MM-dd"), F.try_to_date(c, "yyyyMMdd"))


def parse_filename_date(col: Column | str) -> Column:
    """``'20230310.csv'`` → DATE — reference ml-algorithms/regression.py:55."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_date(F.regexp_replace(c, r"\.csv$", ""), "yyyyMMdd")
