"""Dynamic partition pruning over the partitioned-layout writer
(sources/bucketing.py:write_partitioned): the fact scan must read
only the partitions the filtered dim selects — asserted BOTH in the
plan (dynamicpruningexpression) and in the executed scan metrics
(files actually read), plus the constraint-propagation negative case
that makes DPP unnecessary."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Window, functions as F

from firefox_public_data_report_etl_spark.sources.bucketing import (
    scan_file_stats,
    write_partitioned,
)


@contextmanager
def _confs(spark, **kv):
    prev = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        prev[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in prev.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _layout(spark, sf_dir, tmp):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "week", F.date_trunc("week", F.col("ts")).cast("date")
    )
    write_partitioned(ev, f"{tmp}/ev", ["week"])
    fact = spark.read.parquet(f"{tmp}/ev")
    # stored dim with a NON-key attribute (week_seq) — the filter DPP
    # exists for; a key-derivable filter is the negative case below
    wk = fact.select("week").distinct().withColumn(
        "week_seq", F.row_number().over(Window.orderBy("week"))
    )
    wk.write.mode("overwrite").parquet(f"{tmp}/weeks")
    dim = spark.read.parquet(f"{tmp}/weeks")
    return fact, dim


def test_dpp_plan_and_measured_file_cut(spark, sf_dir, tmp_path):
    fact, dim = _layout(spark, sf_dir, str(tmp_path))
    total_parts = fact.select("week").distinct().count()
    assert total_parts >= 3

    def q():
        return (
            fact.join(dim.filter(F.col("week_seq") <= 2), "week")
            .groupBy("week")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        )

    with _confs(spark, **{"spark.sql.adaptive.enabled": "false"}):
        with _confs(
            spark,
            **{
                "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true"
            },
        ):
            df_on = q()
            rows_on = sorted(
                (r["week"], r["n"], round(r["v"], 6)) for r in df_on.collect()
            )
            plan = df_on._jdf.queryExecution().toString()
            assert "dynamicpruning" in plan
            files_on = max(f for f, _ in scan_file_stats(df_on))
        with _confs(
            spark,
            **{
                "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false"
            },
        ):
            df_off = q()
            rows_off = sorted(
                (r["week"], r["n"], round(r["v"], 6)) for r in df_off.collect()
            )
            files_off = max(f for f, _ in scan_file_stats(df_off))

    assert rows_on == rows_off  # pruning never changes the answer
    assert len(rows_on) == 2
    # the measured cut: DPP reads only the 2 matched partitions; the
    # unpruned scan reads every partition directory
    assert files_on < files_off
    assert files_off >= total_parts


def test_key_derivable_dim_filter_is_statically_propagated(
    spark, sf_dir, tmp_path
):
    """Negative case pinned as documentation: when the dim predicate
    is a function of the join key, constraint propagation pushes it to
    the fact scan STATICALLY — same files read with DPP disabled, so
    reaching for DPP there is cargo cult."""
    fact, _ = _layout(spark, sf_dir, str(tmp_path))
    dim = fact.select("week").distinct().filter(F.dayofmonth("week") <= 7)
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
        },
    ):
        df = fact.join(dim, "week").groupBy("week").agg(
            F.count("*").alias("n")
        )
        df.collect()
        # even with DPP off, the fact scan is pruned below the full
        # partition count by the propagated static filter
        total_parts = fact.select("week").distinct().count()
        fact_files = max(f for f, _ in scan_file_stats(df))
        assert fact_files < total_parts
