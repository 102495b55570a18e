"""The SQL front door: spark-graft is a full ANSI-SQL engine, not just a
DataFrame library. ``register_views`` exposes any scale factor's tables
as temp views; everything after that is plain ``spark.sql`` — same
Catalyst plans, same optimizations (predicate pushdown, broadcast
joins, AQE) as the DataFrame API, verified identical in
tests/test_sql_frontdoor.py.

Run: python examples/sql_frontdoor.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402
from cse_datapipeline_and_mls_spark.sources import register_views  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sql-frontdoor")
    register_views(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem",
        "events", "documents",
    )

    print("== Revenue by region (joins + agg, all SQL) ==")
    spark.sql(
        """
        SELECT r.r_name AS region,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY revenue DESC
        """
    ).show(truncate=False)

    print("== Per-user session anomaly score (window functions) ==")
    spark.sql(
        """
        SELECT * FROM (
          SELECT event_id, user_id, value,
                 round((value - avg(value) OVER w) /
                       nullif(stddev_pop(value) OVER w, 0), 3) AS zscore
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
        )
        ORDER BY abs(zscore) DESC
        LIMIT 5
        """
    ).show(truncate=False)

    print("== Corpus stats (text processing in SQL) ==")
    spark.sql(
        """
        SELECT source,
               count(*)                                   AS n_docs,
               round(avg(size(split(trim(text), '[ \\t\\n\\r]+'))), 1) AS avg_words
        FROM documents
        GROUP BY source
        ORDER BY source
        LIMIT 10
        """
    ).show(truncate=False)

    # DataFrame-API operators compose with SQL views: any registered
    # query result can itself become a view for further SQL.
    from cse_datapipeline_and_mls_spark.queries import QUERIES

    QUERIES["x_text_token_stats"](spark, sf_dir).createOrReplaceTempView(
        "token_stats"
    )
    print("== SQL over a DataFrame-operator result ==")
    spark.sql(
        """
        SELECT count(*) AS docs, sum(n_tokens) AS corpus_tokens
        FROM token_stats
        """
    ).show()


if __name__ == "__main__":
    main()
