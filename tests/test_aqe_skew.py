"""AQE skew-join demonstration — pins the README claim that skewed
fact joins are handled by Spark's runtime re-plan, with the conf
interplay that actually makes it fire at test scale documented:
``coalescePartitions.minPartitionSize`` (default 1m) CLAMPS the skew
split target, so a test-scale threshold must lower it too — at
production sizes the defaults (256m threshold, 1m min) relate the
same way and no override is needed."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, kv: dict):
    prev = {}
    for k, v in kv.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # test-scale sizes: ~100KB hot partition vs 256MB default threshold
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "20000",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "20000",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1000",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
}


def _skewed_join(spark):
    # hot key 0 carries 50x the median partition's rows
    fact = spark.range(110_000).select(
        F.when(F.col("id") < 100_000, 0)
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("p"),
    )
    dim = spark.range(10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    # sum(length(p)) keeps the payload ALIVE through the shuffle —
    # with it pruned, the hot partition is 100k RLE'd longs (~KBs of
    # compressed shuffle bytes) and never crosses the skew threshold;
    # that pruning interplay is itself worth pinning
    return fact.join(dim, "k").select(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.length("p")).alias("sp"),
    )


def test_aqe_splits_the_skewed_partition(spark):
    with _confs(spark, _SKEW_CONFS):
        q = _skewed_join(spark)
        rows_on = q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead skewed" in plan
    # identical answer with the skew optimization off
    with _confs(
        spark,
        {**_SKEW_CONFS, "spark.sql.adaptive.skewJoin.enabled": "false"},
    ):
        q2 = _skewed_join(spark)
        rows_off = q2.collect()
        plan_off = q2._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan_off
    assert rows_on == rows_off


def test_skew_split_respects_downstream_partitioning(spark):
    """The negative case that explains when AQE can NOT help: a
    downstream aggregation ON THE JOIN KEY requires hash distribution,
    so splitting the skewed partition would need an extra shuffle and
    the rule declines (forceOptimizeSkewedJoin default false) — this
    is exactly the shape the engine's SALTING operators
    (operators/skew.py) exist for."""
    with _confs(spark, _SKEW_CONFS):
        fact = spark.range(110_000).select(
            F.when(F.col("id") < 100_000, 0)
            .otherwise(F.col("id") % 100)
            .alias("k"),
        )
        dim = spark.range(10_000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("v")
        )
        q = fact.join(dim, "k").groupBy("k").agg(F.count("*").alias("n"))
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan
