"""Broadcastable Bloom-filter membership — the 100 TB
decontamination scale path.

`plans/text.py:train_eval_contamination` probes train shingles with a
hash equi-join against the DISTINCT held-out gram set. That is exact,
but the held-out side of the join grows with the eval corpus: at
100 TB the "small" side of that shuffle is itself a multi-GB relation
that every train partition must see. The standard fix (every public
pretraining recipe — the reference pipelines never need it because
BigQuery owns their joins) is a Bloom filter: the eval-gram set is
folded into a FIXED-size bitset, the bitset is broadcast, and the
train side probes it map-side — no shuffle touches the eval relation
again, at the price of a measurable, one-sided false-positive rate.

Spark ships a bloom (`bloom_filter_agg` / `might_contain` and the
runtime join filters in `operators/runtime_filter.py`), but its
xxhash64 probes cannot be replayed by the DuckDB oracle. This module
implements the bitset itself out of engine-portable pieces so the
WHOLE filter — fold, broadcast, probe, false positives included — is
deterministic and hash-pinned cross-engine:

- k probe positions per key: ``md5_int('bf<i>|<key>') % m_bits``
  (`functions/core.py:md5_int_sql` — identical fragment both
  engines);
- the bitset as a ``(word_idx, word)`` table: position ``p`` sets bit
  ``p % 64`` of word ``p // 64`` via ``bit_or`` — m_bits/64 rows
  TOTAL regardless of how many keys were folded (2^20 bits = 16384
  rows = one broadcast);
- the probe as k broadcast hash joins (one per probe index, added as
  columns — the probed relation is never exploded or re-grouped, so
  membership costs zero shuffles on the big side).

False positives are a deterministic function of (key set, m, k) —
the oracle reproduces them bit-for-bit by replaying the same
positions — and false negatives are impossible (pinned by a test:
every folded key probes true).

Sizing at scale: m_bits is a plan literal here for oracle parity; a
production caller sizes ``m ≈ -k·n / ln(1 - fp^(1/k))`` from an
approx count of the folded side and keeps the 1-bit-per-~2-grams
regime that makes the broadcast ~100 KB per million keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from firefox_public_data_report_etl_spark.functions import (
    md5_int_spark_sql,
)

# Registry defaults: 2^20 bits / 3 probes. At the sf0.01 gate the
# held-out gram set is ~5k keys -> m/n ≈ 200, fp ≈ 2e-6; at sf10
# (~5M keys) the same literal still yields fp ≈ 0.04 — the honest
# degradation a fixed literal buys, documented not hidden.
BLOOM_M_BITS = 1 << 20
BLOOM_K = 3


def _pos_sql(key_sql: str, i: int, m_bits: int) -> str:
    """Spark-SQL fragment for probe position ``i`` of an integer key."""
    return (
        f"({md5_int_spark_sql(f'''concat('bf{i}|', cast({key_sql} as string))''')}"
        f" % {m_bits})"
    )


def bloom_pos_duck_sql(key_sql: str, i: int, m_bits: int) -> str:
    """DuckDB twin of `_pos_sql` — same salt, same md5 fragment, same
    modulus, so the oracle lands on the identical bit positions."""
    from firefox_public_data_report_etl_spark.functions import md5_int_sql

    return (
        f"({md5_int_sql(f'''('bf{i}|' || CAST({key_sql} AS VARCHAR))''')}"
        f" % {m_bits})"
    )


def bloom_word_table(
    keys: DataFrame,
    key_col: str = "h",
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Fold a key relation into the bitset's ``(word_idx, word)``
    rows. Output is at most ``m_bits / 64`` rows however large
    ``keys`` is — the whole point: the eval side collapses to a
    broadcastable constant before any train-side work begins."""
    pos = keys.select(
        F.explode(
            F.array(
                *[F.expr(_pos_sql(key_col, i, m_bits)) for i in range(k)]
            )
        ).alias("pos")
    )
    return pos.groupBy(
        F.expr("pos div 64").alias("word_idx")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))")
        ).alias("word")
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Add ``out_col`` (boolean): all ``k`` probe bits of
    ``df[key_col]`` are set in the broadcast word table. k broadcast
    LEFT joins, one per probe index — the probed relation keeps its
    grain and partitioning (no explode, no re-group, no shuffle)."""
    out = df
    hit_cols = []
    for i in range(k):
        w = F.broadcast(
            words.select(
                F.col("word_idx").alias(f"_bf_wi{i}"),
                F.col("word").alias(f"_bf_w{i}"),
            )
        )
        pos = F.expr(_pos_sql(key_col, i, m_bits))
        out = (
            out.withColumn(f"_bf_p{i}", pos)
            .join(
                w,
                F.expr(f"_bf_p{i} div 64") == F.col(f"_bf_wi{i}"),
                "left",
            )
            .withColumn(
                f"_bf_h{i}",
                # & 1, NOT % 2: a word with bit 63 set is a negative
                # long, and Spark's % keeps the dividend's sign
                # (-9223372036854771711 % 2 = -1) — the probe of any
                # word holding bit 63 would silently false-negative.
                F.coalesce(
                    F.expr(
                        f"(shiftrightunsigned(_bf_w{i},"
                        f" cast(_bf_p{i} % 64 as int)) & 1) = 1"
                    ),
                    F.lit(False),
                ),
            )
        )
        hit_cols.append(F.col(f"_bf_h{i}"))
    hit = hit_cols[0]
    for c in hit_cols[1:]:
        hit = hit & c
    drop = [
        c
        for i in range(k)
        for c in (f"_bf_p{i}", f"_bf_wi{i}", f"_bf_w{i}", f"_bf_h{i}")
    ]
    return out.withColumn(out_col, hit).drop(*drop)
