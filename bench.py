#!/usr/bin/env python
"""Headline-query benchmark.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" {name: sec},
"sf"}.

Timing excludes JVM/session startup (paid once before the first
measurement) and includes full execution to a collected result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "user_activity_flagship",
    "mau_wau_weekly",
    "pricing_summary",
    "regional_revenue",
    "late_ship_priority",
    "top_customers_per_nation",
    "hardware_dims_grouping_sets",
    "bucket_collapse_ptype",
    "dedup_exact",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "text_quality_scores",
    "user_sessions",
    "tumbling_window_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from firefox_public_data_report_etl_spark import get_spark
    from firefox_public_data_report_etl_spark.plans import QUERIES

    spark = get_spark(app_name="fpdr-bench")
    # Warm JVM JIT + whole-stage-codegen compilation on the smallest SF
    # so sf0.1 timings measure steady-state execution, not first-call
    # compilation. Caches are cleared so no data is reused.
    for name in HEADLINE:
        if name in QUERIES:
            QUERIES[name](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()

    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
