#!/usr/bin/env python
"""Measure the scaling curve for the two headline heavy queries
(user_activity_flagship over events, dedup_minhash_lsh over documents)
across sf0.001 / sf0.01 / sf0.1 / the self-generated 10x stack
(tools/gen_scale.py). Prints one JSON line per SF point with wall
seconds (best of 2, caches cleared between runs, JIT warmed at
sf0.001) — the data behind SCALING.md's measured-slope table.

Usage: python tools/scaling_run.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from firefox_public_data_report_etl_spark import get_spark
    from firefox_public_data_report_etl_spark.plans import QUERIES

    names = [
        "user_activity_flagship",
        "dedup_minhash_lsh",
        # round-4 additions (events/documents-backed, so the self-stacks
        # exercise them too)
        "user_sessions",
        "session_window_rollup",
        "sequence_packing",
        "train_eval_contamination",
    ]
    points = [
        ("/root/testdata/sf0.001", 0.001),
        ("/root/testdata/sf0.01", 0.01),
        ("/root/testdata/sf0.1", 0.1),
        (".scale/sf1", 1.0),
        (".scale/sf10", 10.0),
    ]
    if len(sys.argv) > 1:
        points = [(d, -1.0) for d in sys.argv[1:]]

    spark = get_spark(app_name="scaling-run")
    for _ in range(2):  # JIT/codegen warm
        for n in names:
            QUERIES[n](spark, "/root/testdata/sf0.001").collect()
        spark.catalog.clearCache()

    def best_of(fn, n: int = 3) -> float:
        best = float("inf")
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    for sf_dir, sf in points:
        row = {"sf": sf, "dir": sf_dir}
        # Per-point drift control: the same fixed-size query measured
        # alongside every point. This sandbox's absolute speed swings
        # 2-3x between minutes; slopes are only meaningful after
        # normalizing each point by its control.
        row["control"] = best_of(
            lambda: QUERIES[names[0]](spark, "/root/testdata/sf0.01").collect()
        )
        for n in names:
            row[n] = best_of(lambda: QUERIES[n](spark, sf_dir).collect())
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
