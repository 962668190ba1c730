"""Arrow pandas-UDF cosine must agree with the pure-expression form."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.vectorized import (
    cosine_to_query,
    cosine_topk_matmul,
)
from firefox_public_data_report_etl_spark.sources import load_table


def test_matmul_topk_matches_expression_form(spark, sf_dir):
    """The Arrow integer-matmul top-k must be BIT-identical to the
    pure-expression quantized form (same int64 dots, same single FP
    division)."""
    from firefox_public_data_report_etl_spark.operators.similarity import (
        cosine_topk,
        quantized,
    )

    emb = quantized(load_table(spark, sf_dir, "embeddings")).cache()
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    a = sorted(map(tuple, cosine_topk(queries, emb, 3).collect()))
    b = sorted(map(tuple, cosine_topk_matmul(queries, emb, 3).collect()))
    assert a == b
    assert len(a) > 0
    emb.unpersist()


def test_pandas_udf_cosine_matches_expression(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).first()
    qvec = [float(x) for x in qrow["embedding"]]

    udf_cos = cosine_to_query(qvec)
    got = {
        r["vec_id"]: r["c"]
        for r in emb.select("vec_id", udf_cos(F.col("embedding")).alias("c"))
        .collect()
    }

    # cross-check: recompute driver-side for a sample
    qn = math.sqrt(sum(x * x for x in qvec))
    rows = emb.limit(50).collect()
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        dot = sum(a * b for a, b in zip(v, qvec))
        vn = math.sqrt(sum(x * x for x in v))
        expected = dot / (vn * qn)
        assert abs(got[r["vec_id"]] - expected) < 1e-9
