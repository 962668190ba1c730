"""Training-loader order queries: scale-safe global enumeration,
deterministic epoch shuffles, and the shard manifest a resumable
dataloader reads.

The reference exports report-grain JSON (main.py); a training
pipeline additionally needs to hand the loader (a) dense global row
ids (sample indexing, loss masking by position), (b) a reproducible
per-epoch visitation order (the "global shuffle" — but executed as
per-shard sorts, never a single-task global window), and (c) a
per-shard manifest with an order-sensitive checksum so a resumed run
can verify it is reading the same order it checkpointed under.

All arithmetic is integer multiply-add-mod with intermediates < 2^63
(operators/ordering.py) so the DuckDB oracle interpolates the same
constants and matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.operators.ordering import (
    _EPOCH_STRIDE,
    _MIX_A,
    _MIX_B,
    _MIX_C,
    _MOD,
    assign_contiguous_ids,
    epoch_training_order,
)
from firefox_public_data_report_etl_spark.sources import load_table

N_EPOCHS = 2
N_SHARDS = 8  # registry binding; corpus-proportional at scale (the
# window is partitioned by shard, so n_shards = rows / shard_rows
# keeps every sort task file-sized — see epoch_training_order)


def documents_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0..N-1 ids over documents in doc_id order — the two-pass
    range-partition device (operators/ordering.py): no partition-less
    window anywhere in the plan; the one collect moves num_partitions
    COUNT rows, never data."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return assign_contiguous_ids(docs, ["doc_id"], id_name="row_id").select(
        "doc_id", "lang", "row_id"
    )


def training_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch shuffle: shard assignment + within-shard
    position from the pure (doc_id, epoch) mix — every epoch visits
    every document exactly once (pinned by tests/test_loader_order.py)
    and no two epochs share an order."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_training_order(
        docs, "doc_id", n_epochs=N_EPOCHS, n_shards=N_SHARDS
    )


def loader_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(epoch, shard) manifest: row count, max position (==
    n_rows-1, i.e. positions are dense — the contiguity a seeking
    reader relies on), and an ORDER-SENSITIVE checksum
    sum(doc_id * (pos+1)) % (2^31-1) — two shards with the same ids in
    a different order checksum differently, so a resumed loader can
    verify order, not just membership."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    order = epoch_training_order(
        docs, "doc_id", n_epochs=N_EPOCHS, n_shards=N_SHARDS
    )
    return order.groupBy("epoch", "shard_id").agg(
        F.count("*").alias("n_rows"),
        F.max("pos").alias("max_pos"),
        (
            F.sum(
                (F.col("doc_id") % F.lit(_MOD))
                * ((F.col("pos") + F.lit(1)) % F.lit(_MOD))
                % F.lit(_MOD)
            )
            % F.lit(_MOD)
        ).alias("order_checksum"),
    )


def packing_window_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-window span manifest `sequence_packing` (plans/text.py)
    stops short of: every (shard, window) × document span with
    in-window offset, length, and is_start — continuations of
    straddling documents included, which is what EOD insertion and
    block-diagonal attention masks consume. Same constants as
    sequence_packing so the two manifests describe one layout."""
    from firefox_public_data_report_etl_spark.operators.text import (
        pack_window_spans,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    return pack_window_spans(
        load_table(spark, sf_dir, "documents"),
        capacity=PACK_CAPACITY,
        n_shards=PACK_SHARDS,
    )


def _packing_spans_oracle() -> str:
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    cap = PACK_CAPACITY
    return f"""
WITH toks AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(length(text) // {CHARS_PER_TOKEN_EST} AS BIGINT) AS tokens
  FROM documents
), cum AS (
  SELECT doc_id, shard, tokens,
         sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS c
  FROM toks
), iv AS (
  -- window SUM promotes to HUGEINT; generate_series needs BIGINT
  SELECT doc_id, shard, CAST(c - tokens AS BIGINT) AS s,
         CAST(c AS BIGINT) AS e
  FROM cum WHERE tokens > 0
)
SELECT shard,
       CAST(b AS BIGINT) AS bin_id,
       doc_id,
       CAST(GREATEST(s, b * {cap}) - b * {cap} AS BIGINT) AS tok_offset,
       CAST(LEAST(e, (b + 1) * {cap}) - GREATEST(s, b * {cap}) AS BIGINT)
         AS span_len,
       (b = s // {cap}) AS is_start
FROM iv, UNNEST(generate_series(s // {cap}, (e - 1) // {cap})) AS t(b)
"""


# Shared CTE: the exact mix arithmetic, interpolated from the same
# constants the Spark side uses (operators/ordering.py).
_ORDER_CTE = f"""
WITH epochs AS (
  SELECT 0 AS epoch UNION ALL SELECT 1
), mixed AS (
  SELECT e.epoch, d.doc_id,
         ((d.doc_id * {_MIX_A} + e.epoch * {_EPOCH_STRIDE} + {_MIX_C})
          % {_MOD}) AS h1
  FROM documents d CROSS JOIN epochs e
), keyed AS (
  SELECT epoch, doc_id, (h1 * {_MIX_B}) % {_MOD} AS k
  FROM mixed
), ordered AS (
  SELECT CAST(epoch AS BIGINT) AS epoch,
         CAST(k % {N_SHARDS} AS BIGINT) AS shard_id,
         doc_id,
         CAST(ROW_NUMBER() OVER (
               PARTITION BY epoch, k % {N_SHARDS}
               ORDER BY k, doc_id) - 1 AS BIGINT) AS pos
  FROM keyed
)
"""

QUERIES = {
    "documents_row_ids": documents_row_ids,
    "training_epoch_order": training_epoch_order,
    "loader_shard_manifest": loader_shard_manifest,
    "packing_window_spans": packing_window_spans,
}

ORACLES = {
    "packing_window_spans": _packing_spans_oracle(),
    "documents_row_ids": """
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT)
                 AS row_id
        FROM documents
    """,
    "training_epoch_order": _ORDER_CTE
    + """
        SELECT epoch, shard_id, doc_id, pos FROM ordered
    """,
    "loader_shard_manifest": _ORDER_CTE
    + f"""
        SELECT epoch, shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MAX(pos) AS BIGINT) AS max_pos,
               CAST(SUM((doc_id % {_MOD}) * ((pos + 1) % {_MOD})
                        % {_MOD}) % {_MOD} AS BIGINT) AS order_checksum
        FROM ordered
        GROUP BY epoch, shard_id
    """,
}
