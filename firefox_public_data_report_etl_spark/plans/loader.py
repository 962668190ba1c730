"""Training-loader queries — the last mile between a curated corpus
and a training run. The reference exports report-grain JSON
(main.py); a trainer's dataloader additionally needs everything this
module registers:

- dense global row ids (documents_row_ids) — sample indexing, loss
  masking by position; checkpoint-free ranged numbering;
- a reproducible per-epoch visitation order (training_epoch_order) —
  the "global shuffle" executed as per-shard sorts, never a
  single-task global window — plus its order-checksummed resume
  manifest (loader_shard_manifest) and adjacency decorrelation audit
  (shuffle_quality_audit);
- the packed-window layout (packing_window_spans — per-window doc
  spans incl. straddling continuations, i.e. the EOD/attention-mask
  artifact) and its per-shard KPI rollup (packing_efficiency_report);
- mixture control: epoch-annealed quotas (mixture_schedule_anneal),
  sampling WITH replacement at exact quota (corpus_mixture_upsample),
  token-denominated budgets (corpus_mixture_token_budget);
- padding-aware batch assembly (length_grouped_batches);
- the decontaminated shard export (training_export_decontaminated).

Every deterministic draw/shuffle is integer arithmetic (multiply-add-
mod with intermediates < 2^63, or the portable md5 fragment) so the
DuckDB oracle interpolates the same constants and matches
bit-for-bit. Physical writers live in operators/ordering.py
(write_training_shards) and sources/export.py (write_jsonl_shards);
the streaming id allocator (streaming/idalloc.py) is this module's
ingestion-time twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.operators.ordering import (
    _EPOCH_STRIDE,
    _MIX_A,
    _MIX_B,
    _MIX_C,
    _MOD,
    assign_contiguous_ids_ranged,
    epoch_training_order,
)
from firefox_public_data_report_etl_spark.sources import load_table

N_EPOCHS = 2
N_SHARDS = 8  # registry binding; corpus-proportional at scale (the
# window is partitioned by shard, so n_shards = rows / shard_rows
# keeps every sort task file-sized — see epoch_training_order)


def documents_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0..N-1 ids over documents in doc_id order — the
    checkpoint-free ranged device (operators/ordering.py:
    assign_contiguous_ids_ranged): partition ids are a pure function
    of approxQuantile boundaries, so no materialization, no
    partition-less window anywhere in the plan, and the only collects
    move boundary/count rows (num_partitions each), never data. The
    generic multi-column form (assign_contiguous_ids) stays for
    non-numeric keys; an agreement test pins the two equal."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return assign_contiguous_ids_ranged(
        docs, "doc_id", id_name="row_id"
    ).select("doc_id", "lang", "row_id")


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


def packing_efficiency_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-shard packing KPI over the span manifest: window count,
    token mass, docs started, and the exact fill of the LAST window
    (every earlier window is full by construction — pinned as a
    property test; so per-shard waste = capacity − tail_fill, the
    one number concat-then-chunk packing can waste). Report-grain
    rollup of packing_window_spans: same plan plus one groupBy."""
    from firefox_public_data_report_etl_spark.operators.text import (
        pack_window_spans,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    spans = pack_window_spans(
        load_table(spark, sf_dir, "documents"),
        capacity=PACK_CAPACITY,
        n_shards=PACK_SHARDS,
    )
    per_win = spans.groupBy("shard", "bin_id").agg(
        F.sum("span_len").alias("fill"),
        F.sum(F.when(F.col("is_start"), 1).otherwise(0)).alias("starts"),
    )
    return per_win.groupBy("shard").agg(
        F.count("*").alias("n_windows"),
        F.sum("fill").alias("total_tokens"),
        F.sum("starts").alias("docs_started"),
        F.max(F.col("bin_id")).alias("last_bin"),
        F.max_by(F.col("fill"), F.col("bin_id")).alias("tail_fill"),
    )


def _packing_efficiency_oracle() -> str:
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
  SELECT doc_id, shard, CAST(c - tokens AS BIGINT) AS s,
         CAST(c AS BIGINT) AS e
  FROM cum WHERE tokens > 0
), spans AS (
  SELECT shard, CAST(b AS BIGINT) AS bin_id,
         CAST(LEAST(e, (b + 1) * {cap}) - GREATEST(s, b * {cap}) AS BIGINT)
           AS span_len,
         (b = s // {cap}) AS is_start
  FROM iv, UNNEST(generate_series(s // {cap}, (e - 1) // {cap})) AS t(b)
), per_win AS (
  SELECT shard, bin_id,
         CAST(sum(span_len) AS BIGINT) AS fill,
         CAST(sum(CASE WHEN is_start THEN 1 ELSE 0 END) AS BIGINT)
           AS starts
  FROM spans GROUP BY 1, 2
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(fill) AS BIGINT) AS total_tokens,
       CAST(sum(starts) AS BIGINT) AS docs_started,
       CAST(max(bin_id) AS BIGINT) AS last_bin,
       CAST(max_by(fill, bin_id) AS BIGINT) AS tail_fill
FROM per_win GROUP BY shard
"""


def sequence_packing_nosplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split (SFT-style) packing: whole documents per window, NFD
    walk per shard (operators/text.py:pack_no_split) — the layout for
    training data whose examples must not be truncated. The oracle
    replays the sequential walk as a linear recursive CTE, so the
    per-doc (bin, offset) assignment is hash-pinned bit-for-bit."""
    from firefox_public_data_report_etl_spark.operators.text import (
        pack_no_split,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    return pack_no_split(
        load_table(spark, sf_dir, "documents"),
        capacity=PACK_CAPACITY,
        n_shards=PACK_SHARDS,
    )


def _nosplit_oracle() -> str:
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    cap = PACK_CAPACITY
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(length(text) // {CHARS_PER_TOKEN_EST} AS BIGINT) AS tokens
  FROM documents
), r AS (
  SELECT shard, doc_id, tokens,
         row_number() OVER (PARTITION BY shard
                            ORDER BY tokens DESC, doc_id) AS rn
  FROM t WHERE tokens > 0 AND tokens <= {cap}
), walk(shard, rn, doc_id, tokens, bin_id, fill) AS (
  SELECT shard, rn, doc_id, tokens, CAST(0 AS BIGINT), tokens
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.shard, r.rn, r.doc_id, r.tokens,
         CASE WHEN w.fill + r.tokens <= {cap} THEN w.bin_id
              ELSE w.bin_id + 1 END,
         CASE WHEN w.fill + r.tokens <= {cap} THEN w.fill + r.tokens
              ELSE r.tokens END
  FROM walk w JOIN r ON r.shard = w.shard AND r.rn = w.rn + 1
)
SELECT shard, doc_id, tokens,
       CAST(bin_id AS BIGINT) AS bin_id,
       CAST(fill - tokens AS BIGINT) AS bin_offset
FROM walk
"""


def sft_pack_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT assembly with loss masks (round-10): two-part documents
    packed whole via the no-split NFD walk, one span row per
    (window, doc, part) with loss_mask=true over completion tokens
    only (operators/text.py:sft_pack_loss_mask). The oracle replays
    the walk as the same linear recursive CTE and recomputes the
    prompt boundary closed-form, so spans AND masks are hash-pinned
    bit-for-bit."""
    from firefox_public_data_report_etl_spark.operators.text import (
        sft_pack_loss_mask as _op,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    return _op(
        load_table(spark, sf_dir, "documents"),
        capacity=PACK_CAPACITY,
        n_shards=PACK_SHARDS,
    )


def _sft_mask_oracle() -> str:
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    cap = PACK_CAPACITY
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(length(text) // {CHARS_PER_TOKEN_EST} AS BIGINT) AS tokens
  FROM documents
), r AS (
  SELECT shard, doc_id, tokens,
         row_number() OVER (PARTITION BY shard
                            ORDER BY tokens DESC, doc_id) AS rn
  FROM t WHERE tokens >= 2 AND tokens <= {cap}
), walk(shard, rn, doc_id, tokens, bin_id, fill) AS (
  SELECT shard, rn, doc_id, tokens, CAST(0 AS BIGINT), tokens
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.shard, r.rn, r.doc_id, r.tokens,
         CASE WHEN w.fill + r.tokens <= {cap} THEN w.bin_id
              ELSE w.bin_id + 1 END,
         CASE WHEN w.fill + r.tokens <= {cap} THEN w.fill + r.tokens
              ELSE r.tokens END
  FROM walk w JOIN r ON r.shard = w.shard AND r.rn = w.rn + 1
), packed AS (
  SELECT shard, doc_id, tokens,
         CAST(bin_id AS BIGINT) AS bin_id,
         CAST(fill - tokens AS BIGINT) AS bin_offset,
         CAST(least(tokens - 1,
                    greatest(1, (tokens * ((doc_id % 5) + 3)) // 10))
              AS BIGINT) AS prompt_len
  FROM walk
)
SELECT shard, bin_id, doc_id, 'prompt' AS part,
       bin_offset AS span_offset, prompt_len AS span_len,
       FALSE AS loss_mask
FROM packed
UNION ALL
SELECT shard, bin_id, doc_id, 'completion' AS part,
       bin_offset + prompt_len AS span_offset,
       tokens - prompt_len AS span_len,
       TRUE AS loss_mask
FROM packed
"""


# --- epoch-annealed mixture schedule --------------------------------
#
# Real pretraining runs anneal the data mixture across epochs (start
# broad, finish on the up-weighted high-quality recipe). Quotas for
# every (stratum, epoch) are precomputed in PYTHON integers (floor
# interpolation) and emitted as literals on BOTH sides — no div/floor
# semantics can diverge between engines.
ANNEAL_EPOCHS = 3
ANNEAL_TO = {"en": 60, "de": 60, "es": 40, "fr": 40}


def _anneal_quotas() -> dict[tuple[str, int], int]:
    from firefox_public_data_report_etl_spark.plans.text import (
        MIXTURE_QUOTAS,
    )

    out = {}
    for s in sorted(MIXTURE_QUOTAS):
        a, b = MIXTURE_QUOTAS[s], ANNEAL_TO[s]
        for e in range(ANNEAL_EPOCHS):
            out[(s, e)] = a + ((b - a) * e) // (ANNEAL_EPOCHS - 1)
    return out


def mixture_schedule_anneal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch annealed mixture: epoch 0 trains on the base recipe
    (MIXTURE_QUOTAS), the last epoch on ANNEAL_TO, intermediate epochs
    on the integer-interpolated quotas — and every epoch's draw is the
    PREFIX of one shared rank (mixture_sample's advertised property),
    so annealing never resamples: a document in epoch e's cut is in
    every epoch whose quota is larger. ONE window shuffle total; the
    epoch fan-out is a bounded map-side explode."""
    from firefox_public_data_report_etl_spark.operators.text import (
        mixture_sample,
    )

    q = _anneal_quotas()
    max_q = {}
    for (s, _e), v in q.items():
        max_q[s] = max(max_q.get(s, 0), v)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    ranks = mixture_sample(docs, "lang", max_q)
    fan = ranks.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.lit(ANNEAL_EPOCHS - 1)))
    ).withColumn("epoch", F.col("epoch").cast("long"))
    quota = F.lit(0)
    for (s, e), v in sorted(q.items()):
        quota = F.when(
            (F.col("lang") == s) & (F.col("epoch") == e), F.lit(v)
        ).otherwise(quota)
    return fan.filter(F.col("rank_in_stratum") <= quota).select(
        "epoch", "lang", "doc_id", "rank_in_stratum"
    )


def _anneal_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql

    q = _anneal_quotas()
    cases = " ".join(
        f"WHEN lang = '{s}' AND epoch = {e} THEN {v}"
        for (s, e), v in sorted(q.items())
    )
    epochs = " UNION ALL ".join(
        f"SELECT {e} AS epoch" for e in range(ANNEAL_EPOCHS)
    )
    return f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {md5_int_sql("cast(doc_id as varchar)")}, doc_id
         ) AS rank_in_stratum
  FROM documents
), epochs AS ({epochs})
SELECT CAST(epoch AS BIGINT) AS epoch, lang, doc_id,
       CAST(rank_in_stratum AS BIGINT) AS rank_in_stratum
FROM r CROSS JOIN epochs
WHERE rank_in_stratum <= CASE {cases} ELSE 0 END
"""


# --- token-budget mixture ---------------------------------------------
#
# Real mixture recipes quota TOKENS, not documents. Greedy-prefix
# semantics: walk each stratum in md5-rank order and take every doc
# that STARTS inside the budget (cum − tokens < budget) — total may
# overrun by part of the last doc, never undershoot a doc boundary;
# deterministic, prefix-stable, and exactly the rule a sequential
# budget-filler implements.
TOKEN_BUDGETS = {"en": 12_000, "de": 6_000, "fr": 3_000}


def corpus_mixture_token_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, lang, tokens, cum_tokens) for every doc whose prefix
    cumsum starts inside its stratum's TOKEN budget. One
    stratum-partitioned window (rank + running sum share the
    partitioning); the budget lookup is a literal CASE."""
    from pyspark.sql import Window

    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin(list(TOKEN_BUDGETS)))
        .select(
            "doc_id",
            "lang",
            F.expr(f"length(text) div {CHARS_PER_TOKEN_EST}")
            .cast("long")
            .alias("tokens"),
        )
    )
    h = F.expr(md5_int_spark_sql("cast(doc_id as string)"))
    w = (
        Window.partitionBy("lang")
        .orderBy(h, F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(0)
    for s, b in sorted(TOKEN_BUDGETS.items()):
        budget = F.when(F.col("lang") == s, F.lit(b)).otherwise(budget)
    return (
        docs.withColumn("cum_tokens", F.sum("tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") - F.col("tokens") < budget)
        .select("doc_id", "lang", "tokens", "cum_tokens")
    )


def _token_budget_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )

    langs = ", ".join(f"'{s}'" for s in sorted(TOKEN_BUDGETS))
    cases = " ".join(
        f"WHEN '{s}' THEN {b}" for s, b in sorted(TOKEN_BUDGETS.items())
    )
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(length(text) // {CHARS_PER_TOKEN_EST} AS BIGINT) AS tokens
  FROM documents WHERE lang IN ({langs})
), c AS (
  SELECT doc_id, lang, tokens,
         CAST(sum(tokens) OVER (
                PARTITION BY lang
                ORDER BY {md5_int_sql("cast(doc_id as varchar)")}, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, lang, tokens, cum_tokens
FROM c
WHERE cum_tokens - tokens < CASE lang {cases} ELSE 0 END
"""


# --- shuffle-quality audit ---------------------------------------------


def shuffle_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency audit of the epoch shuffle — the check dataloader
    work audits a shuffle with: for every epoch, how many ADJACENT
    positions (pos, pos+1 within a shard) hold same-language
    documents. A broken shuffle (e.g. sorted by source) shows runs;
    a healthy one sits near the language-frequency-squared baseline.
    Exact integer counts only — the expectation comparison lives in
    the test, not the query, so the oracle stays bit-exact.

    Scale: the order is the shard-partitioned epoch shuffle; the
    adjacency probe is a self equi-join on (epoch, shard, pos+1) —
    shuffle on the composite key, pair volume = corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    order = epoch_training_order(
        docs.select("doc_id"), "doc_id", n_epochs=N_EPOCHS, n_shards=N_SHARDS
    ).join(docs, "doc_id")
    a = order.select(
        "epoch", "shard_id", "pos", F.col("lang").alias("lang_a")
    )
    b = order.select(
        "epoch",
        "shard_id",
        (F.col("pos") - F.lit(1)).alias("pos"),
        F.col("lang").alias("lang_b"),
    )
    pairs = a.join(b, ["epoch", "shard_id", "pos"])
    return pairs.groupBy("epoch").agg(
        F.count("*").alias("n_adjacent"),
        F.sum(
            F.when(F.col("lang_a") == F.col("lang_b"), 1).otherwise(0)
        ).alias("n_same_lang"),
    )


def _shuffle_audit_oracle() -> str:
    return (
        _ORDER_CTE
        + """
, o AS (
  SELECT ordered.epoch, ordered.shard_id, ordered.pos, d.lang
  FROM ordered JOIN documents d ON ordered.doc_id = d.doc_id
)
SELECT a.epoch,
       CAST(count(*) AS BIGINT) AS n_adjacent,
       CAST(sum(CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_lang
FROM o a JOIN o b
  ON a.epoch = b.epoch AND a.shard_id = b.shard_id
 AND a.pos = b.pos - 1
GROUP BY a.epoch
"""
    )


# --- length-grouped batching -----------------------------------------
#
# Padding-aware batch assembly (HF group_by_length / fairseq
# max-tokens batching): sequences batched with near-equal lengths so
# per-batch padding (n·max − Σ len) stays small. Buckets are LINEAR
# integer tiers (tokens div width — exact in any engine, no log2
# boundary drift), ranked by (tokens, doc_id) within (bucket, md5
# shard) so the window is shard-partitioned like the rest of the
# loader family, then cut into fixed-size batches.
LEN_BUCKET_WIDTH = 128
LEN_BATCH_SIZE = 16
LEN_SHARDS = 4


def length_grouped_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(bucket, shard, batch): size, max/sum token lengths, and
    padding waste n·max − Σ — the number a batching strategy is judged
    by. Sorting within the bucket by exact length makes each batch's
    waste ≤ n·(intra-batch length spread); the test compares against
    unsorted arrival-order batching on the same data."""
    from pyspark.sql import Window

    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"length(text) div {CHARS_PER_TOKEN_EST}")
        .cast("long")
        .alias("tokens"),
    )
    shard = (
        F.expr(md5_int_spark_sql("cast(doc_id as string)"))
        % LEN_SHARDS
    ).cast("long")
    keyed = docs.select(
        "doc_id",
        "tokens",
        F.expr(f"tokens div {LEN_BUCKET_WIDTH}").cast("long").alias(
            "bucket"
        ),
        shard.alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy("tokens", "doc_id")
    batched = keyed.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).withColumn(
        "batch_idx", F.expr(f"(rnk - 1) div {LEN_BATCH_SIZE}")
    )
    return batched.groupBy("bucket", "shard", "batch_idx").agg(
        F.count("*").alias("n_seqs"),
        F.max("tokens").alias("max_tokens"),
        F.sum("tokens").alias("sum_tokens"),
        (
            F.count("*") * F.max("tokens") - F.sum("tokens")
        ).alias("padding_waste"),
    )


def _length_batches_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )

    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) // {CHARS_PER_TOKEN_EST} AS BIGINT) AS tokens,
         CAST(length(text) // {CHARS_PER_TOKEN_EST} // {LEN_BUCKET_WIDTH}
              AS BIGINT) AS bucket,
         CAST({md5_int_sql("cast(doc_id as varchar)")} % {LEN_SHARDS}
              AS BIGINT) AS shard
  FROM documents
), b AS (
  SELECT bucket, shard, tokens,
         CAST((row_number() OVER (
                 PARTITION BY bucket, shard
                 ORDER BY tokens, doc_id) - 1) // {LEN_BATCH_SIZE}
              AS BIGINT) AS batch_idx
  FROM t
)
SELECT bucket, shard, batch_idx,
       CAST(count(*) AS BIGINT) AS n_seqs,
       CAST(max(tokens) AS BIGINT) AS max_tokens,
       CAST(sum(tokens) AS BIGINT) AS sum_tokens,
       CAST(count(*) * max(tokens) - sum(tokens) AS BIGINT)
         AS padding_waste
FROM b GROUP BY 1, 2, 3
"""


# --- upsampling mixture (sampling WITH replacement) ------------------
#
# mixture_sample / the anneal draw PREFIXES — they can only
# DOWN-sample a stratum. Small high-value sources are routinely
# UP-sampled past their size (repeated within an epoch); the exact
# deterministic form: with quota k over a stratum of n docs, every doc
# repeats floor(k/n) times and the first k mod n docs by the portable
# md5 rank repeat once more — total exactly k, no RNG, prefix-stable
# under corpus growth like the rest of the mixture family.
UPSAMPLE_QUOTAS = {"es": 900, "fr": 150}


def corpus_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling WITH replacement: (doc_id, lang, copy_idx) rows whose
    per-stratum total is exactly the quota even when the quota exceeds
    the stratum (copy_idx > 1 marks repeats). At small SF the quota
    up-samples (repeats exercised); at large SF the same quota
    down-samples to a prefix — both from one formula, which is the
    honest cross-SF behavior of a FIXED token budget over a growing
    corpus. Scale: one stratum-partitioned window (rank + count fused
    over the same partitioning), a literal quota CASE, and a bounded
    map-side explode."""
    from pyspark.sql import Window

    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .filter(F.col("lang").isin(list(UPSAMPLE_QUOTAS)))
    )
    h = F.expr(md5_int_spark_sql("cast(doc_id as string)"))
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    wn = Window.partitionBy("lang")
    quota = F.lit(0)
    for s, k in sorted(UPSAMPLE_QUOTAS.items()):
        quota = F.when(F.col("lang") == s, F.lit(k)).otherwise(quota)
    r = (
        docs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count("*").over(wn).cast("long"))
        .withColumn("q", quota)
        .withColumn(
            "repeats",
            F.expr("q div n")
            + F.when(F.col("rnk") <= F.col("q") % F.col("n"), 1).otherwise(
                0
            ),
        )
        .filter(F.col("repeats") > 0)
    )
    return r.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(1), F.col("repeats"))).alias("copy_idx"),
    ).withColumn("copy_idx", F.col("copy_idx").cast("long"))


def _upsample_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql

    langs = ", ".join(f"'{s}'" for s in sorted(UPSAMPLE_QUOTAS))
    cases = " ".join(
        f"WHEN '{s}' THEN {k}" for s, k in sorted(UPSAMPLE_QUOTAS.items())
    )
    return f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {md5_int_sql("cast(doc_id as varchar)")}, doc_id
         ) AS rnk,
         count(*) OVER (PARTITION BY lang) AS n,
         CASE lang {cases} ELSE 0 END AS q
  FROM documents
  WHERE lang IN ({langs})
), rep AS (
  SELECT doc_id, lang,
         q // n + CASE WHEN rnk <= q % n THEN 1 ELSE 0 END AS repeats
  FROM r
)
SELECT doc_id, lang, CAST(copy_idx AS BIGINT) AS copy_idx
FROM rep, UNNEST(generate_series(1, CAST(repeats AS BIGINT))) AS t(copy_idx)
WHERE repeats > 0
"""


# --- decontaminated training export ---------------------------------

# drop a train doc when more than this percent of its distinct
# 3-grams appear in the held-out splits (exact integer comparison)
DECON_MAX_PCT = 5


def training_export_decontaminated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The export manifest a release actually ships: the train split
    MINUS eval-contaminated documents. Composes three existing
    primitives end-to-end — the md5 hash split, the shingle-probe
    contamination audit (train_eval_contamination), and the shard
    manifest (sources/export.py:training_manifest) — with the drop
    rule as the exact integer comparison
    n_contaminated * 100 > n_grams * DECON_MAX_PCT. Documents too
    short to shingle have no contamination rows and are kept (the
    oracle's LEFT-probe semantics agree)."""
    from firefox_public_data_report_etl_spark.operators.text import (
        hash_split,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        train_eval_contamination,
    )
    from firefox_public_data_report_etl_spark.sources.export import (
        training_manifest,
    )

    cont = train_eval_contamination(spark, sf_dir)
    flagged = cont.filter(
        F.col("n_contaminated") * 100
        > F.col("n_grams") * F.lit(DECON_MAX_PCT)
    ).select("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    train_docs = hash_split(docs).filter(F.col("split") == "train")
    clean = train_docs.join(flagged, "doc_id", "left_anti")
    return training_manifest(clean)


RESUME_PCT = 40  # the simulated mid-epoch crash point of the cursor
# query: cursor = 40% of each (epoch, shard)'s rows consumed


def loader_resume_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resumable-loader cursor audit (round-11 verdict #7): for a
    mid-epoch checkpoint at cursor = (n_rows * RESUME_PCT) DIV 100
    per (epoch, shard), emit the order-sensitive checksum of the
    CONSUMED prefix (what write_loader_checkpoint persists), the
    checksum and row count of the unseen suffix (what resume_suffix
    yields), and the shard's total — prefix and suffix recombine to
    the loader_shard_manifest checksum mod 2^31-1, so a resumed run
    can verify both what it skipped and what it is about to read
    against the same manifest a cold run would produce.

    Scale: the same shard-partitioned window as the epoch order plus
    one shard-grain aggregate; the checkpoint relation is
    shards-sized."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    order = epoch_training_order(
        docs, "doc_id", n_epochs=N_EPOCHS, n_shards=N_SHARDS
    )
    w = Window.partitionBy("epoch", "shard_id")
    term = (
        (F.col("doc_id") % F.lit(_MOD))
        * ((F.col("pos") + F.lit(1)) % F.lit(_MOD))
        % F.lit(_MOD)
    )
    ann = order.withColumn(
        "n_rows", F.count("*").over(w)
    ).withColumn("cursor", F.expr(f"(n_rows * {RESUME_PCT}) DIV 100"))
    return ann.groupBy("epoch", "shard_id").agg(
        F.max("n_rows").cast("long").alias("n_rows"),
        F.max("cursor").cast("long").alias("cursor"),
        (
            F.coalesce(
                F.sum(F.when(F.col("pos") < F.col("cursor"), term)),
                F.lit(0),
            )
            % F.lit(_MOD)
        )
        .cast("long")
        .alias("prefix_checksum"),
        (
            F.coalesce(
                F.sum(F.when(F.col("pos") >= F.col("cursor"), term)),
                F.lit(0),
            )
            % F.lit(_MOD)
        )
        .cast("long")
        .alias("suffix_checksum"),
        F.sum(
            F.when(F.col("pos") >= F.col("cursor"), 1).otherwise(0)
        )
        .cast("long")
        .alias("resume_n_rows"),
    )


def training_export_decontaminated_composed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The export gate a release should ACTUALLY ship (round-11
    verdict #6): train split minus the UNION of both contamination
    verdicts — the diluted-fraction audit
    (n_contaminated * 100 > n_grams * DECON_MAX_PCT) AND the
    winnowing verdict (>= WINNOW_SHARED_MIN selected fingerprints
    shared with any held-out document). The fraction rule alone has a
    hole the union closes: a long document can carry a VERBATIM
    >= w + k - 1 = 12-char eval passage while its shingle fraction
    stays under DECON_MAX_PCT — diluted below the gram gate but
    guaranteed caught by winnowing (test-pinned with a planted
    diluted leak the fraction-only form misses).

    Scale: both verdicts are existing keyed plans (broadcast-probe
    shingle audit; df-capped bucketed fingerprint join); the union is
    doc-id grain; the manifest aggregate is shard-grain."""
    from firefox_public_data_report_etl_spark.operators.text import (
        hash_split,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        contamination_winnowing,
        train_eval_contamination,
    )
    from firefox_public_data_report_etl_spark.sources.export import (
        training_manifest,
    )

    cont = train_eval_contamination(spark, sf_dir)
    flagged_frac = cont.filter(
        F.col("n_contaminated") * 100
        > F.col("n_grams") * F.lit(DECON_MAX_PCT)
    ).select("doc_id")
    flagged_win = contamination_winnowing(spark, sf_dir).select("doc_id")
    flagged = flagged_frac.union(flagged_win).distinct()
    docs = load_table(spark, sf_dir, "documents")
    train_docs = hash_split(docs).filter(F.col("split") == "train")
    clean = train_docs.join(flagged, "doc_id", "left_anti")
    return training_manifest(clean)


def _decon_export_composed_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql
    from firefox_public_data_report_etl_spark.operators.dedup import (
        DUCK_SHINGLES,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        WINNOW_MAX_DF,
        WINNOW_SHARED_MIN,
        _winnow_sel_ctes,
    )
    from firefox_public_data_report_etl_spark.sources.export import (
        TRAINING_SHARDS,
    )

    bucket = f"{md5_int_sql('cast(doc_id as string)')} % 100"
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
dd AS (SELECT doc_id, t FROM d WHERE len(t) >= 3),
raw AS (SELECT doc_id, unnest(list_distinct({DUCK_SHINGLES})) AS g FROM dd),
sh AS (SELECT DISTINCT doc_id, {md5_int_sql('g')} AS h,
              CASE WHEN {bucket} < 80 THEN 'train'
                   WHEN {bucket} < 90 THEN 'val'
                   ELSE 'test' END AS split
       FROM raw),
held AS (SELECT DISTINCT h FROM sh WHERE split <> 'train'),
cont AS (SELECT s.doc_id, count(*) AS n_grams,
                sum(CASE WHEN held.h IS NOT NULL THEN 1 ELSE 0 END)
                  AS n_contaminated
         FROM sh s LEFT JOIN held ON s.h = held.h
         WHERE s.split = 'train'
         GROUP BY s.doc_id),
flaggedf AS (SELECT doc_id FROM cont
             WHERE n_contaminated * 100 > n_grams * {DECON_MAX_PCT}),
{_winnow_sel_ctes().strip()},
wsd AS (SELECT DISTINCT doc_id, h,
               CASE WHEN {bucket} < 80 THEN 'train' ELSE 'held' END
                 AS split
        FROM sel),
wok AS (SELECT h FROM wsd GROUP BY h
        HAVING count(*) <= {WINNOW_MAX_DF}),
wkept AS (SELECT doc_id, h, split FROM wsd JOIN wok USING (h)),
flaggedw AS (
  SELECT DISTINCT t.doc_id
  FROM wkept t JOIN wkept e ON t.h = e.h
  WHERE t.split = 'train' AND e.split = 'held'
  GROUP BY t.doc_id, e.doc_id
  HAVING count(*) >= {WINNOW_SHARED_MIN}),
flagged AS (SELECT doc_id FROM flaggedf
            UNION SELECT doc_id FROM flaggedw),
clean AS (SELECT doc_id, text FROM documents
          WHERE {bucket} < 80
            AND doc_id NOT IN (SELECT doc_id FROM flagged)),
m AS (SELECT {md5_int_sql("cast(doc_id as varchar)")} % {TRAINING_SHARDS}
        AS shard,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
      {md5_int_sql("text")} AS fp
      FROM clean)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(sum(fp) AS BIGINT) AS content_fp
FROM m GROUP BY shard
"""


def _decon_export_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql
    from firefox_public_data_report_etl_spark.operators.dedup import (
        DUCK_SHINGLES,
    )
    from firefox_public_data_report_etl_spark.sources.export import (
        TRAINING_SHARDS,
    )

    bucket = f"{md5_int_sql('cast(doc_id as string)')} % 100"
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
dd AS (SELECT doc_id, t FROM d WHERE len(t) >= 3),
raw AS (SELECT doc_id, unnest(list_distinct({DUCK_SHINGLES})) AS g FROM dd),
sh AS (SELECT DISTINCT doc_id, {md5_int_sql('g')} AS h,
              CASE WHEN {bucket} < 80 THEN 'train'
                   WHEN {bucket} < 90 THEN 'val'
                   ELSE 'test' END AS split
       FROM raw),
held AS (SELECT DISTINCT h FROM sh WHERE split <> 'train'),
cont AS (SELECT s.doc_id, count(*) AS n_grams,
                sum(CASE WHEN held.h IS NOT NULL THEN 1 ELSE 0 END)
                  AS n_contaminated
         FROM sh s LEFT JOIN held ON s.h = held.h
         WHERE s.split = 'train'
         GROUP BY s.doc_id),
flagged AS (SELECT doc_id FROM cont
            WHERE n_contaminated * 100 > n_grams * {DECON_MAX_PCT}),
clean AS (SELECT doc_id, text FROM documents
          WHERE {bucket} < 80
            AND doc_id NOT IN (SELECT doc_id FROM flagged)),
m AS (SELECT {md5_int_sql("cast(doc_id as varchar)")} % {TRAINING_SHARDS}
        AS shard,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
      {md5_int_sql("text")} AS fp
      FROM clean)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(sum(fp) AS BIGINT) AS content_fp
FROM m GROUP BY shard
"""


# Shared CTE: the exact mix arithmetic, interpolated from the same
# constants the Spark side uses (operators/ordering.py).
_ORDER_CTE = f"""
WITH epochs AS (
  SELECT 0 AS epoch UNION ALL SELECT 1
), mixed AS (
  SELECT e.epoch, d.doc_id,
         (((d.doc_id % {_MOD}) * {_MIX_A}
           + e.epoch * {_EPOCH_STRIDE} + {_MIX_C})
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


_RESUME_ORACLE = (
    _ORDER_CTE
    + f"""
, stats AS (SELECT epoch, shard_id, COUNT(*) AS n
            FROM ordered GROUP BY epoch, shard_id),
ann AS (SELECT o.epoch, o.shard_id, o.doc_id, o.pos, s.n,
               (s.n * {RESUME_PCT}) // 100 AS cursor
        FROM ordered o JOIN stats s USING (epoch, shard_id))
SELECT epoch, shard_id,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(MAX(cursor) AS BIGINT) AS cursor,
       CAST(COALESCE(SUM(CASE WHEN pos < cursor
              THEN (doc_id % {_MOD}) * ((pos + 1) % {_MOD}) % {_MOD}
            END), 0) % {_MOD} AS BIGINT) AS prefix_checksum,
       CAST(COALESCE(SUM(CASE WHEN pos >= cursor
              THEN (doc_id % {_MOD}) * ((pos + 1) % {_MOD}) % {_MOD}
            END), 0) % {_MOD} AS BIGINT) AS suffix_checksum,
       CAST(SUM(CASE WHEN pos >= cursor THEN 1 ELSE 0 END) AS BIGINT)
         AS resume_n_rows
FROM ann GROUP BY epoch, shard_id
"""
)



# --- multi-turn chat assembly ----------------------------------------
#
# Chat-template constants, literal on both sides: synthetic
# conversations of alternating user/assistant turns, a fixed per-turn
# template overhead (role header + end-of-turn marker), and a context
# cap that truncates WHOLE turns greedily from the front — the
# standard chat-SFT assembly rule (a split turn would train on half a
# message).
CHAT_N_CONVS = 40
CHAT_TURN_OVERHEAD = 4
CHAT_CTX_CAP = 1024


def chat_sft_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-turn chat-SFT assembly — the conversation-grain
    complement of `sft_pack_loss_mask` (which masks ONE
    prompt/completion split per document): documents are grouped into
    deterministic conversations (md5 bucket), ordered into turns,
    role-alternated user/assistant, templated with a fixed per-turn
    overhead, and truncated to the context cap by whole turns. Each
    kept turn emits its token span and `loss_mask` = assistant turns
    only — exactly the tensor a chat trainer builds from a rendered
    template.

    Scale: ONE window partitioned by conv_id (conversations are
    bounded — corpus/N_CONVS rows each at the registry binding, and
    per-conversation by construction in a real chat corpus), so the
    assembly parallelizes across conversations with no global sort;
    everything downstream of the scan is integer arithmetic the
    DuckDB oracle replays bit-for-bit."""
    from pyspark.sql import Window

    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )

    t = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.expr(f"length(text) div {CHARS_PER_TOKEN_EST}")
            .cast("long")
            .alias("tokens"),
            (
                F.expr(md5_int_spark_sql("cast(doc_id as string)"))
                % CHAT_N_CONVS
            ).alias("conv_id"),
        )
        .filter(F.col("tokens") >= 1)
    )
    w = Window.partitionBy("conv_id").orderBy("doc_id")
    r = t.select(
        "conv_id",
        "doc_id",
        F.row_number().over(w).cast("long").alias("turn_idx"),
        (F.col("tokens") + CHAT_TURN_OVERHEAD).alias("span_len"),
    )
    ws = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = r.withColumn(
        "span_offset",
        F.coalesce(F.sum("span_len").over(ws), F.lit(0)).cast("long"),
    )
    return s.filter(
        F.col("span_offset") + F.col("span_len") <= CHAT_CTX_CAP
    ).select(
        "conv_id",
        "turn_idx",
        "doc_id",
        F.when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "span_offset",
        "span_len",
        (F.col("turn_idx") % 2 == 0).alias("loss_mask"),
    )


def _chat_assembly_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )

    conv = f"{md5_int_sql('cast(doc_id as string)')} % {CHAT_N_CONVS}"
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) // {CHARS_PER_TOKEN_EST} AS BIGINT) AS tokens,
         {conv} AS conv_id
  FROM documents
  WHERE length(text) // {CHARS_PER_TOKEN_EST} >= 1
), r AS (
  SELECT conv_id, doc_id,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY doc_id)
              AS BIGINT) AS turn_idx,
         tokens + {CHAT_TURN_OVERHEAD} AS span_len
  FROM t
), s AS (
  SELECT *,
         CAST(COALESCE(SUM(span_len) OVER (
                PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS span_offset
  FROM r
)
SELECT conv_id, turn_idx, doc_id,
       CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
       span_offset, span_len,
       (turn_idx % 2 = 0) AS loss_mask
FROM s
WHERE span_offset + span_len <= {CHAT_CTX_CAP}
"""


def training_loader_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end loader capstone — the mixture→packing composition a
    real run executes as one job: the token-budget mixture selects
    this run's documents (greedy start-inside filler per stratum),
    the survivors pack whole via the no-split NFD walk, and the
    output is the per-(shard, window) layout report (docs, token
    mass, fill ppm). Exercises that the stage CONTRACTS compose: the
    budget's doc set is exactly what the packer sees, pinned by a
    chained oracle (budget window CTE feeding the recursive walk
    feeding the rollup) — the same capstone convention as the four
    curation pipelines, for the loader side.

    Scale: one stratum-partitioned window (mixture) + one
    shard-partitioned applyInPandas walk (packing) + a map-side
    rollup; the join between stages is on doc ids only."""
    from firefox_public_data_report_etl_spark.operators.text import (
        pack_no_split,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    taken = corpus_mixture_token_budget(spark, sf_dir).select("doc_id")
    docs = load_table(spark, sf_dir, "documents").join(taken, "doc_id")
    packed = pack_no_split(
        docs, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS
    )
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("long").alias("tokens_filled"),
        F.expr(
            f"(1000000 * sum(tokens)) div {PACK_CAPACITY}"
        ).alias("fill_ppm"),
    )


def _loader_capstone_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql
    from firefox_public_data_report_etl_spark.operators.text import (
        CHARS_PER_TOKEN_EST,
    )
    from firefox_public_data_report_etl_spark.plans.text import (
        PACK_CAPACITY,
        PACK_SHARDS,
    )

    cap = PACK_CAPACITY
    langs = ", ".join(f"'{s}'" for s in sorted(TOKEN_BUDGETS))
    cases = " ".join(
        f"WHEN '{s}' THEN {b}" for s, b in sorted(TOKEN_BUDGETS.items())
    )
    return f"""
WITH RECURSIVE tb AS (
  SELECT doc_id, lang,
         CAST(length(text) // {CHARS_PER_TOKEN_EST} AS BIGINT) AS tokens
  FROM documents WHERE lang IN ({langs})
), c AS (
  SELECT doc_id, tokens,
         CAST(sum(tokens) OVER (
                PARTITION BY lang
                ORDER BY {md5_int_sql("cast(doc_id as varchar)")}, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
         CASE lang {cases} ELSE 0 END AS budget
  FROM tb
), t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard, tokens
  FROM c WHERE cum_tokens - tokens < budget
), r AS (
  SELECT shard, doc_id, tokens,
         row_number() OVER (PARTITION BY shard
                            ORDER BY tokens DESC, doc_id) AS rn
  FROM t WHERE tokens > 0 AND tokens <= {cap}
), walk(shard, rn, doc_id, tokens, bin_id, fill) AS (
  SELECT shard, rn, doc_id, tokens, CAST(0 AS BIGINT), tokens
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.shard, r.rn, r.doc_id, r.tokens,
         CASE WHEN w.fill + r.tokens <= {cap} THEN w.bin_id
              ELSE w.bin_id + 1 END,
         CASE WHEN w.fill + r.tokens <= {cap} THEN w.fill + r.tokens
              ELSE r.tokens END
  FROM walk w JOIN r ON r.shard = w.shard AND r.rn = w.rn + 1
)
SELECT shard, CAST(bin_id AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS tokens_filled,
       CAST((1000000 * sum(tokens)) // {cap} AS BIGINT) AS fill_ppm
FROM walk GROUP BY shard, bin_id
"""


# --- capacity-aware quota refill --------------------------------------
#
# A mixture quota can exceed a stratum's post-dedup capacity (the
# fr=120 vs 64-survivor case below arises naturally whenever a
# recipe up-weights a small language). The standard operational rule
# is to redistribute the shortfall to strata with spare capacity, in
# a DETERMINISTIC order. The greedy in-order fill has a closed form —
# refill_i = clamp(pool − Σ_{j<i} cap_j, 0, cap_i) — so no sequential
# walk or recursion is needed: one cumsum window over the LANG-grain
# rollup (report-sized) computes the whole redistribution.
REFILL_QUOTAS = {"de": 60, "en": 80, "es": 60, "fr": 120, "zh": 60}


def corpus_mixture_capacity_refill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mixture draw with capacity-aware shortfall redistribution:
    quotas are drawn over the EXACT-DEDUP survivor set (keep-min-id
    per content hash — the dedup_exact rule, so a duplicated corpus
    cannot double-count toward a quota), each stratum takes
    ``min(quota, capacity)`` by the portable md5 rank, and the unmet
    shortfall pool refills strata with spare capacity in lang order
    via the closed-form cumsum rule (module comment). Emits the
    doc-grain taken set with ``via_refill`` marking docs admitted by
    redistribution rather than their own stratum's quota.

    Scale: one content-hash aggregate (32-byte keys), one
    lang-partitioned rank window, and the refill arithmetic on the
    LANG-grain rollup — the partition-less windows there run over
    #languages rows by construction (REPORT_EDGE_WINDOWS)."""
    from pyspark.sql import Window

    from firefox_public_data_report_etl_spark.functions import (
        md5_int_spark_sql,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    keep = docs.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surv = docs.join(keep.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", "lang"
    )
    h = F.expr(md5_int_spark_sql("cast(doc_id as string)"))
    wr = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    ranked = surv.withColumn(
        "rnk", F.row_number().over(wr).cast("long")
    )
    quota = F.lit(0)
    for s, q in sorted(REFILL_QUOTAS.items()):
        quota = F.when(F.col("lang") == s, F.lit(q)).otherwise(quota)
    rollup = (
        surv.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .withColumn("quota", quota.cast("long"))
        .withColumn("base", F.least("quota", "n"))
        .withColumn("cap", F.col("n") - F.col("base"))
        .withColumn(
            "shortfall", F.greatest(F.col("quota") - F.col("n"), F.lit(0))
        )
    )
    wall = Window.partitionBy()
    wcum = (
        Window.orderBy("lang")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = (
        rollup.withColumn("pool", F.sum("shortfall").over(wall))
        .withColumn(
            "cumcap",
            F.coalesce(F.sum("cap").over(wcum), F.lit(0)).cast("long"),
        )
        .withColumn(
            "refill",
            F.greatest(
                F.least(
                    F.col("cap"), F.col("pool") - F.col("cumcap")
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("lang", "base", "refill")
    )
    return (
        ranked.join(F.broadcast(filled), "lang")
        .filter(F.col("rnk") <= F.col("base") + F.col("refill"))
        .select(
            "doc_id",
            "lang",
            "rnk",
            (F.col("rnk") > F.col("base")).alias("via_refill"),
        )
    )


def _capacity_refill_oracle() -> str:
    from firefox_public_data_report_etl_spark.functions import md5_int_sql

    cases = " ".join(
        f"WHEN '{s}' THEN {q}" for s, q in sorted(REFILL_QUOTAS.items())
    )
    rank_h = md5_int_sql("cast(doc_id as varchar)")
    return f"""
WITH d AS (SELECT doc_id, lang, text FROM documents),
k AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY md5(text)),
s AS (SELECT d.doc_id, d.lang FROM d JOIN k USING (doc_id)),
r AS (SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
                                     ORDER BY {rank_h}, doc_id)
                  AS BIGINT) AS rnk
      FROM s),
L AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(CASE lang {cases} ELSE 0 END AS BIGINT) AS quota
      FROM s GROUP BY lang),
L2 AS (SELECT lang, n, quota,
              least(quota, n) AS base,
              n - least(quota, n) AS cap,
              greatest(quota - n, 0) AS shortfall
       FROM L),
L3 AS (SELECT lang, base, cap,
              CAST(sum(shortfall) OVER () AS BIGINT) AS pool,
              CAST(COALESCE(sum(cap) OVER (ORDER BY lang
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS BIGINT) AS cumcap
       FROM L2),
L4 AS (SELECT lang, CAST(base AS BIGINT) AS base,
              CAST(greatest(least(cap, pool - cumcap), 0) AS BIGINT)
                AS refill
       FROM L3)
SELECT r.doc_id, r.lang, r.rnk, (r.rnk > base) AS via_refill
FROM r JOIN L4 USING (lang)
WHERE r.rnk <= base + refill
"""


QUERIES = {
    "documents_row_ids": documents_row_ids,
    "chat_sft_assembly": chat_sft_assembly,
    "training_loader_capstone": training_loader_capstone,
    "corpus_mixture_capacity_refill": corpus_mixture_capacity_refill,
    "training_epoch_order": training_epoch_order,
    "loader_shard_manifest": loader_shard_manifest,
    "packing_window_spans": packing_window_spans,
    "mixture_schedule_anneal": mixture_schedule_anneal,
    "training_export_decontaminated": training_export_decontaminated,
    "training_export_decontaminated_composed": training_export_decontaminated_composed,
    "loader_resume_cursor": loader_resume_cursor,
    "corpus_mixture_upsample": corpus_mixture_upsample,
    "length_grouped_batches": length_grouped_batches,
    "corpus_mixture_token_budget": corpus_mixture_token_budget,
    "shuffle_quality_audit": shuffle_quality_audit,
    "packing_efficiency_report": packing_efficiency_report,
    "sequence_packing_nosplit": sequence_packing_nosplit,
    "sft_pack_loss_mask": sft_pack_loss_mask,
}

ORACLES = {
    "sft_pack_loss_mask": _sft_mask_oracle(),
    "chat_sft_assembly": _chat_assembly_oracle(),
    "training_loader_capstone": _loader_capstone_oracle(),
    "corpus_mixture_capacity_refill": _capacity_refill_oracle(),
    "packing_window_spans": _packing_spans_oracle(),
    "mixture_schedule_anneal": _anneal_oracle(),
    "training_export_decontaminated": _decon_export_oracle(),
    "training_export_decontaminated_composed": _decon_export_composed_oracle(),
    "loader_resume_cursor": _RESUME_ORACLE,
    "corpus_mixture_upsample": _upsample_oracle(),
    "length_grouped_batches": _length_batches_oracle(),
    "corpus_mixture_token_budget": _token_budget_oracle(),
    "shuffle_quality_audit": _shuffle_audit_oracle(),
    "packing_efficiency_report": _packing_efficiency_oracle(),
    "sequence_packing_nosplit": _nosplit_oracle(),
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
