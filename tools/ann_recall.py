#!/usr/bin/env python
"""Measure recall@k of every ANN variant against the exact brute-force
top-k ground truth (embedding_cosine_topk) on the same corpus — the
quality axis of the speed/recall trade SCALING.md's timing tables only
half-describe. In particular: does Lloyd-refining the seed codebook
(ann_ivf_trained) buy recall at identical probe cost vs the raw seed
codebook (ann_ivf)?

Usage: python tools/ann_recall.py [sf_dir ...]   (default sf0.1)
Prints one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pairs(df) -> set[tuple[int, int]]:
    return {(r["q_id"], r["n_id"]) for r in df.collect()}


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]

    from pyspark.sql import functions as F

    from firefox_public_data_report_etl_spark import get_spark
    from firefox_public_data_report_etl_spark.operators.similarity import (
        quantized,
    )
    from firefox_public_data_report_etl_spark.operators.vectorized import (
        cosine_topk_ivf,
    )
    from firefox_public_data_report_etl_spark.plans import QUERIES
    from firefox_public_data_report_etl_spark.plans.similarity import (
        QUERY_MOD,
        TOP_K,
        ann_ivf_scaled,
    )
    from firefox_public_data_report_etl_spark.sources import load_table

    spark = get_spark(app_name="ann-recall")
    for sf_dir in dirs:
        truth = pairs(QUERIES["embedding_cosine_topk"](spark, sf_dir))
        emb = quantized(load_table(spark, sf_dir, "embeddings")).cache()
        variants = {
            "ann_ivf": QUERIES["ann_ivf"](spark, sf_dir),
            "ann_ivf_nprobe2": cosine_topk_ivf(
                emb, TOP_K, QUERY_MOD, 100, nprobe=2
            ),
            "ann_ivf_scaled": ann_ivf_scaled(spark, sf_dir),
            "ann_ivf_trained": QUERIES["ann_ivf_trained"](spark, sf_dir),
            "ann_lsh_single": QUERIES["ann_lsh"](spark, sf_dir).filter(
                F.col("mode") == "single"
            ),
            "ann_lsh_multi": QUERIES["ann_lsh"](spark, sf_dir).filter(
                F.col("mode") == "multi"
            ),
        }
        row = {"sf_dir": sf_dir, "truth_pairs": len(truth)}
        for name, df in variants.items():
            got = pairs(df)
            row[name] = round(len(got & truth) / len(truth), 4)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
