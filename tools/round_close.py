"""Round-close gate (VERDICT r10 item 3): the r9->r10 lesson is that
pin tests only help if they RUN at close. This script is the literal
last step of every round — it regenerates every committed evidence
artifact against the CURRENT registry and refuses a dirty exit:

  1. lint_oracles (static + schema pass at sf0.001)
  2. full correctness sweep -> CORRECTNESS_local.json (the pin test's
     evidence file — ALL registered queries green or fail; the count
     is whatever len(QUERIES) is at close, never a hardcoded number)
  3. plan audit vs tools/plan_baseline.json (0 flagged or fail)
  4. full bench regen -> BENCH_local.json
  5. full pytest (includes the sweep/bench/coverage pin tests, which
     now see the artifacts written in steps 2 and 4)

Run it, then commit the artifacts it wrote IN THE SAME CHANGE as any
registry edits:

    python tools/round_close.py            # ~45 min end to end
    python tools/round_close.py --skip-bench --skip-pytest  # fast gate

A non-zero exit from ANY step aborts immediately (later steps would
just bury the failure). Nothing here mutates query code — only the
evidence artifacts (CORRECTNESS_local.json, BENCH_local.json,
tools/plan_baseline.json is NOT rewritten: a plan regression should
fail loudly, not be silently re-pinned).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> None:
    t0 = time.time()
    print(f"\n=== round_close: {label} ===\n    {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    dt = time.time() - t0
    if proc.returncode != 0:
        print(
            f"\nround_close FAILED at step '{label}' "
            f"(exit {proc.returncode}, {dt:.0f}s) — fix it, then re-run; "
            "do NOT commit evidence from a red gate",
            file=sys.stderr,
        )
        raise SystemExit(proc.returncode)
    print(f"=== {label}: OK ({dt:.0f}s)", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-pytest", action="store_true")
    ap.add_argument(
        "--skip-lint", action="store_true", help="skip the oracle lint pass"
    )
    args = ap.parse_args()

    py = sys.executable
    if not args.skip_lint:
        run("lint_oracles", [py, "tools/lint_oracles.py"])
    run(
        "correctness sweep (writes CORRECTNESS_local.json)",
        [
            py,
            "tools/check_correctness.py",
            "--keep-going",
            "--json",
            "CORRECTNESS_local.json",
        ],
    )
    run("plan audit vs baseline", [py, "tools/audit_plans.py", "--check-baseline"])
    if not args.skip_bench:
        run("bench regen (writes BENCH_local.json)", [py, "bench.py"])
    if not args.skip_pytest:
        run("pytest", [py, "-m", "pytest", "tests/", "-x", "-q"])
    print(
        "\nround_close: ALL GREEN — commit CORRECTNESS_local.json and "
        "BENCH_local.json now (same change as any registry edits)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
