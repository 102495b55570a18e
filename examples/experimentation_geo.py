"""Experimentation + geospatial tour — the r10 families end to end.
Every leg is an oracle-checked registry query (hash-compared against a
DuckDB twin at driver time); this script just narrates them.

    python examples/experimentation_geo.py [sf_dir]

Experimentation (the A/B readout stack, in the order a real experiment
runs it):
1. SRM gate       — ab_srm_check: is the 50/50 hash assignment intact?
2. Sequential     — ab_msprt_sequential: the always-valid daily monitor
                    (peeking-proof; a streaming twin carries the same
                    four int64s of state live).
3. CUPED          — ab_cuped_adjusted: variance reduction from the
                    pre-period covariate.
4. DiD            — ab_diff_in_diff: the two-period counterfactual.
5. Log-rank       — t_logrank_test: cohort survival comparison.

Attribution (who gets conversion credit):
6. Last-touch / time-decay / U-shaped / Markov removal — four models
   over the same 30-minute-session journeys.

Geospatial (never a cross join):
7. Radius join    — geo_radius_pairs: 3x3 grid-bucketed candidates;
                    the brute-force O(n^2) form exists only as oracle.
8. Spatial k-NN   — geo_knn_within_radius.
9. DBSCAN         — geo_dbscan_clusters: core/border/noise roles.
10. Hot spots     — geo_grid_hotspots; containment —
                    geo_point_in_rect_join (broadcast non-equi).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cse_datapipeline_and_mls_spark.queries import QUERIES  # noqa: E402
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("experimentation-geo-tour")

    print("== 1. Sample-ratio-mismatch gate (per segment) ==")
    QUERIES["ab_srm_check"](spark, sf_dir).show()

    print("== 2. Always-valid sequential monitor (last 8 days shown) ==")
    print("order-grain (REJECTS on the null at sf0.01 — the clustered-")
    print("variance artifact: randomization per customer, observations")
    print("per order):")
    QUERIES["ab_msprt_sequential"](spark, sf_dir).orderBy(
        "day", ascending=False
    ).show(8)
    print("customer-grain twin (unit of analysis == unit of")
    print("randomization — stays under the boundary):")
    QUERIES["ab_msprt_customer_grain"](spark, sf_dir).orderBy(
        "day", ascending=False
    ).show(8)

    print("== 3. CUPED variance reduction ==")
    QUERIES["ab_cuped_adjusted"](spark, sf_dir).show()

    print("== 4. Difference-in-differences ==")
    QUERIES["ab_diff_in_diff"](spark, sf_dir).show(vertical=True)

    print("== 5. Log-rank survival comparison (null split) ==")
    QUERIES["t_logrank_test"](spark, sf_dir).show(vertical=True)

    print("== 6. Attribution: four models, one journey definition ==")
    QUERIES["t_attribution_last_touch"](spark, sf_dir).show()
    QUERIES["t_attribution_time_decay"](spark, sf_dir).show()
    QUERIES["t_attribution_position"](spark, sf_dir).show()
    QUERIES["t_attribution_markov_removal"](spark, sf_dir).show()

    print("== 7. Grid-bucketed radius join (first 8 pairs) ==")
    QUERIES["geo_radius_pairs"](spark, sf_dir).show(8)

    print("== 8. Spatial k-NN within radius ==")
    QUERIES["geo_knn_within_radius"](spark, sf_dir).show(8)

    print("== 9. DBSCAN roles ==")
    QUERIES["geo_dbscan_clusters"](spark, sf_dir).groupBy("role").count().show()

    print("== 10. Hot spots + rectangle containment ==")
    QUERIES["geo_grid_hotspots"](spark, sf_dir).show(5)
    QUERIES["geo_point_in_rect_join"](spark, sf_dir).show(5)

    print(
        "Every table above is an oracle-checked registry query; the\n"
        "geo legs' oracles are the brute-force twins, so the bucketed\n"
        "candidate structure is PROVEN lossless, not assumed."
    )


if __name__ == "__main__":
    main()
