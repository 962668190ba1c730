#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to text files.

Usage:
    python tools/explain_dump.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query. SUFFIX is normally
``before`` or ``after`` (the round's plan-evidence convention:
plans/r<N>/<query>_before.txt / _after.txt). Run it from the repo
whose plans you want (a git worktree of an older commit gives the
"before" side). Queries whose construction runs driver actions (model
fits, size-gated broadcasts) execute those during planning — expected.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from firefox_public_data_report_etl_spark import get_spark
    from firefox_public_data_report_etl_spark.plans import QUERIES

    spark = get_spark(
        app_name="explain-dump",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    jvm = spark._jvm
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not in registry")
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001 — one file, not the run
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
