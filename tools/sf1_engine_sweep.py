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

        def watchdog() -> None:
            if not fired.wait(args.cap):
                sc.cancelAllJobs()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        try:
            QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 1)
            results[name] = dt
            print(f"OK      {name}: {dt}s", flush=True)
        except Exception as exc:  # cancelled or genuine failure
            dt = round(time.time() - t0, 1)
            kind = "TIMEOUT" if dt >= args.cap else "ERROR"
            results[name] = f"{kind}@{dt}s"
            print(f"{kind} {name}: {dt}s {str(exc).splitlines()[0][:160]}", flush=True)
        finally:
            fired.set()
            w.join(timeout=1)
    slow = {k: v for k, v in results.items() if not isinstance(v, float) or v > args.cap / 3}
    print("\nworst rows:", dict(sorted(slow.items(), key=lambda kv: str(kv[1]), reverse=True)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
