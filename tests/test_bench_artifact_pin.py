"""Committed-bench-artifact pin (VERDICT r9 #1).

BENCH_r09.json arrived `parsed: null` — the full 308-row per-query map
overflowed the driver's tail capture, so per-query round-over-round
comparison was impossible from driver artifacts alone. The fix is
two-part: bench.py now prints a COMPACT summary (≤1.5 KB) as the last
line and writes the full map to the committed `BENCH_local.json`. This
pin makes a stale or registry-lagging artifact a suite failure, exactly
as test_registry_sweep_pin.py does for the correctness sweep.

Regenerate with:

    python bench.py   # writes BENCH_local.json as a side effect
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

from cse_datapipeline_and_mls_spark.queries import QUERIES  # noqa: E402

_ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "BENCH_local.json")


def _artifact() -> dict:
    assert os.path.exists(_ARTIFACT), (
        "BENCH_local.json is missing — run `python bench.py` to regenerate"
    )
    with open(_ARTIFACT) as fh:
        return json.load(fh)


def test_artifact_covers_every_registered_query():
    art = _artifact()
    benched = set(art["queries"]) | set(art["coverage_queries"])
    missing = sorted(set(QUERIES) - benched)
    stale = sorted(benched - set(QUERIES))
    assert not missing, (
        f"{len(missing)} registered queries have no committed bench row "
        f"(run `python bench.py`): {missing}"
    )
    assert not stale, (
        f"artifact records queries no longer registered (regenerate): {stale}"
    )
    assert art["n_registry"] == len(QUERIES)
    assert art["n_benched"] == len(benched)


def test_artifact_partition_matches_bench_plan():
    art = _artifact()
    headline, coverage = bench.bench_plan()
    assert set(art["queries"]) == set(headline)
    assert set(art["coverage_queries"]) == set(coverage)


def test_compact_line_fits_driver_window_and_parses():
    """The driver captures the LAST stdout line; r9's overflowed. The
    compact summary built from the committed full artifact must stay
    within the asserted budget and round-trip through json."""
    line = bench.compact_summary_line(_artifact())
    assert len(line) <= 1536, f"compact bench line too long: {len(line)}"
    parsed = json.loads(line)
    assert parsed["n_registry"] == len(QUERIES)
    assert len(parsed["queries"]) <= 10
    assert parsed["full_artifact"] == "BENCH_local.json"
