"""Model-evaluation tour — the distributed metrics toolbox between
"features built" and "model shipped", all oracle-checked queries
(queries/mleval_q.py). The score column here is the module's fixed
deterministic squash; swap in any model's score column and every
shape below works unchanged.

    python examples/model_evaluation.py [sf_dir]

1. Calibration     — 10 equal-width score bins: mean predicted
                     probability vs realized positive rate.
2. Brier (Murphy)  — reliability − resolution + uncertainty: WHY the
                     Brier score is what it is.
3. Exact rank-AUC  — the Mann-Whitney identity on distributed
                     midranks; no sampling, no sort funnel.
4. Average precision — PR-curve area, one threshold per distinct
                     score; head-weighted where AUC is not.
5. Lift / gain     — equal-count score deciles without a single-task
                     ntile (prefix-sum deciling).
6. Threshold sweep — confusion matrix + P/R/F1 at 0.1…0.9 from ONE
                     10-row bucket aggregate.
7. MRR by segment  — first-relevant rank via two aggregates; no
                     per-segment sort to skew.
8. Leakage-safe features — leave-one-out target encoding (mean-
                     preserving, self-excluded) and seeded k-folds.
9. Conformal interval — split-conformal radius from pure order
                     statistics, with measured test coverage.
10. Recommenders   — exact item-kNN top-3 (truncated neighborhoods)
                     and the seeded ALS factorization contract.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.queries import QUERIES  # noqa: E402
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("mleval-tour")

    print("== Calibration bins (predicted vs realized) ==")
    QUERIES["ml_calibration_bins"](spark, sf_dir).show(10)

    print("== Brier decomposition ==")
    QUERIES["ml_brier_decomposition"](spark, sf_dir).show()

    print("== Exact rank-AUC / Gini ==")
    QUERIES["ml_auc_rank_exact"](spark, sf_dir).show()

    print("== Average precision (PR-curve area) ==")
    QUERIES["ml_average_precision"](spark, sf_dir).show()

    print("== Lift / cumulative gain by score decile ==")
    QUERIES["ml_lift_gain_deciles"](spark, sf_dir).show(10)

    print("== Threshold sweep (operating points) ==")
    QUERIES["ml_threshold_sweep"](spark, sf_dir).show(9)

    print("== Reciprocal rank of the first positive, per segment ==")
    QUERIES["ml_mrr_by_segment"](spark, sf_dir).show()

    print("== Leave-one-out target encoding (sample) ==")
    QUERIES["ml_target_encoding_loo"](spark, sf_dir).orderBy("event_id").show(5)

    print("== Seeded 5-fold assignment (size + label balance) ==")
    QUERIES["ml_kfold_assignment"](spark, sf_dir).show()

    print("== Split-conformal prediction interval ==")
    QUERIES["ml_conformal_interval"](spark, sf_dir).show()

    print("== Item-kNN recommendations (first customers) ==")
    QUERIES["ml_item_cooccurrence_recs"](spark, sf_dir).orderBy(
        "custkey", "rnk"
    ).show(9)

    print("== ALS factorization contract ==")
    QUERIES["ml_als_factorization"](spark, sf_dir).show()

    print("== Feature hashing (heaviest buckets) ==")
    QUERIES["ml_feature_hashing"](spark, sf_dir).orderBy(F.desc("n")).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
