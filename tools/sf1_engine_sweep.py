"""Engine-side sf1 timing sweep (no oracle): run registry queries
against an sf1 dir with a per-query watchdog and report seconds, to
hunt serial/superlinear classes that only show above sf0.1 — the
j_fellegi_sunter_parts single-task finding came from exactly this kind
of pass (SCALE.md r13).

Usage:
    python tools/sf1_engine_sweep.py [--sf /tmp/sf1d] [--cap 150] [name ...]

A query that exceeds the cap has its Spark jobs cancelled and is
reported as TIMEOUT — at 10x sf0.1 data, cap/10 per query is already a
generous bound for a plan that scales linearly on 32 cores.
"""

from __future__ import annotations

import argparse
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1d")
    ap.add_argument("--cap", type=float, default=150.0)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from cse_datapipeline_and_mls_spark.queries import QUERIES
    from cse_datapipeline_and_mls_spark.session import get_spark

    spark = get_spark("sf1sweep")
    sc = spark.sparkContext
    names = args.names or list(QUERIES)
    results: dict[str, float | str] = {}
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered", flush=True)
            continue
        fired = threading.Event()
        cancelled = threading.Event()

        # Cancellation is scoped to THIS query's job group, and TIMEOUT
        # is classified on whether the watchdog actually fired — never
        # inferred from elapsed time (ADVICE r13: a genuine failure
        # surfacing after cap seconds was misreported as TIMEOUT, and a
        # racing cancelAllJobs could kill the NEXT query's jobs).
        sc.setJobGroup(name, f"sf1 sweep: {name}", interruptOnCancel=True)

        def watchdog(group: str = name) -> None:
            if not fired.wait(args.cap):
                cancelled.set()
                # cancelJobGroup kills only ACTIVE jobs; an iterative
                # algorithm just launches its next job — keep cancelling
                # until the query thread has actually errored out
                while not fired.is_set():
                    sc.cancelJobGroup(group)
                    fired.wait(2.0)

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        try:
            QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 1)
            results[name] = dt
            note = " (watchdog fired but query completed)" if cancelled.is_set() else ""
            print(f"OK      {name}: {dt}s{note}", flush=True)
        except Exception as exc:  # cancelled or genuine failure
            dt = round(time.time() - t0, 1)
            kind = "TIMEOUT" if cancelled.is_set() else "ERROR"
            results[name] = f"{kind}@{dt}s"
            print(f"{kind} {name}: {dt}s {str(exc).splitlines()[0][:160]}", flush=True)
        finally:
            fired.set()
            # full join: a watchdog mid-cancel must finish before the
            # next query starts (its cancel is group-scoped anyway)
            w.join()
    slow = {k: v for k, v in results.items() if not isinstance(v, float) or v > args.cap / 3}
    print("\nworst rows:", dict(sorted(slow.items(), key=lambda kv: str(kv[1]), reverse=True)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
