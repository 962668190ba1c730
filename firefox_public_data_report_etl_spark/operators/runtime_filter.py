"""Runtime join-key filters (semi-join reduction / bloom pushdown).

Spark's own ``InjectRuntimeFilter`` only fires when the CREATION side
has a selective filter directly over a scan; when the selectivity comes
through a join (TPC-H Q5: region→nation→customer→orders prunes orders
to ~40%), no bloom reaches the big fact side automatically. These
operators make that reduction explicit:

- ``semi_prune``: exact broadcast left-semi on the distinct key set.
  Right answer while the pruned key set fits a broadcast (~10s of MB).
- ``bloom_prune``: a pure-expression bloom filter — k xxhash64 probes
  into a bit-array literal. The bitmap is built DISTRIBUTED (explode →
  ``bit_or`` aggregate over 64-bit words) and only the finished bitmap
  (``num_bits/8`` bytes, independent of data size) is collected, then
  re-embedded as an array<long> literal, so the probe side evaluates
  entirely inside whole-stage codegen: two ``get``/shift/AND per hash,
  no Python, no UDF, no shuffle of the fact. False positives only —
  callers keep their exact join afterwards.

At 100 TB: the bitmap cost is fixed by ``num_bits`` (2^27 bits = 16 MB
covers ~10^7 keys at ~3% fpp with k=3); the fact side is pruned at the
SCAN-side Filter, before its shuffle — the same effect as Spark's
injected ``might_contain``, available where the optimizer's heuristic
cannot see the selectivity.

Building the bitmap materializes ``keys`` once (a deliberate barrier,
exactly like the scalar subquery Spark's own runtime filter plans);
pass a cached/cheap keys plan or accept the recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def semi_prune(fact: DataFrame, fact_key: str, keys: DataFrame, key_col: str) -> DataFrame:
    """Exact reduction: broadcast left-semi on the distinct key set."""
    ks = keys.select(F.col(key_col).alias(fact_key)).distinct()
    return fact.join(F.broadcast(ks), on=fact_key, how="left_semi")


def _positions(col, num_bits: int, k: int):
    """k bloom positions for a key column: xxhash64 salted by probe
    index (the extra literal column changes the hash), mod num_bits."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits)) for i in range(k)
    ]


def bloom_build(keys: DataFrame, key_col: str, num_bits: int = 1 << 20, k: int = 3) -> list:
    """Distributed bloom build: explode the k positions, OR bits into
    64-bit words per word-index (one shuffle of ≤ num_bits/64 rows),
    collect the sparse words, densify driver-side. Returns the bitmap
    as a list of num_bits/64 Python ints."""
    assert num_bits % 64 == 0
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), num_bits, k))).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            # call_function: pyspark's shiftleft() only takes a literal
            # int shift amount; the SQL builtin accepts a column.
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(F.col("p"), F.lit(64)).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["word"]
    return bitmap


def bloom_might_contain(col, bitmap: list, num_bits: int, k: int = 3):
    """Probe predicate: AND of k bit tests against the bitmap literal.
    Whole-stage-codegen-friendly (get + shiftright + AND per probe)."""
    arr = F.lit(bitmap)
    cond = None
    for p in _positions(col, num_bits, k):
        word = F.get(arr, (p / 64).cast("int"))
        test = (
            F.call_function("shiftright", word, F.pmod(p, F.lit(64)).cast("int"))
            .bitwiseAND(F.lit(1))
            == F.lit(1)
        )
        cond = test if cond is None else (cond & test)
    return cond


def bloom_prune(
    fact: DataFrame,
    fact_key: str,
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Bloom reduction: build the bitmap from ``keys`` (eager — one
    materialization of the keys plan), filter ``fact`` with the probe
    predicate. Superset-safe: output ⊇ the exact semi-join result."""
    bitmap = bloom_build(keys, key_col, num_bits=num_bits, k=k)
    return fact.filter(bloom_might_contain(F.col(fact_key), bitmap, num_bits, k=k))
