"""Python UDTF (table function) API surface.

The engine's standing rule is that row-at-a-time Python never sits in
an oracle/hot path (Arrow-batched pandas UDFs are the sanctioned
escape hatch — operators/vectorized.py), so no registry query uses a
UDTF. This test pins that the surface itself works on this Spark
build and that a lateral expansion written as a UDTF agrees row-for-
row with the expression twin (split + posexplode) a production plan
would actually use — the demonstration that "custom table-valued
operators" are available when semantics genuinely require imperative
per-row logic, and unnecessary when they don't.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf

_SENT_RE = r"(?<=[.!?])\s+"


@udtf(returnType="pos int, sentence string")
class _SplitSentences:
    def eval(self, text: str):
        for i, p in enumerate(
            s for s in re.split(_SENT_RE, text or "") if s
        ):
            yield i, p


def test_udtf_matches_expression_twin(spark):
    text = "One sentence. Two sentences! Is this three? Yes."
    via_udtf = [
        (r["pos"], r["sentence"])
        for r in _SplitSentences(lit(text)).collect()
    ]
    twin = (
        spark.range(1)
        .select(
            F.posexplode(
                F.filter(
                    F.split(lit(text), _SENT_RE), lambda s: s != ""
                )
            ).alias("pos", "sentence")
        )
        .collect()
    )
    via_expr = [(r["pos"], r["sentence"]) for r in twin]
    assert via_udtf == via_expr
    assert len(via_udtf) == 4


def test_udtf_lateral_join_over_table(spark):
    df = spark.createDataFrame(
        [(1, "A b. C d."), (2, ""), (3, None)], "id int, text string"
    )
    df.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("split_sentences", _SplitSentences)
    out = spark.sql(
        """
        SELECT d.id, s.pos, s.sentence
        FROM _udtf_docs d, LATERAL split_sentences(d.text) s
        ORDER BY d.id, s.pos
        """
    ).collect()
    # empty/NULL texts yield no rows — the UDTF is empty-preserving
    # only via the lateral join's inner semantics, matching posexplode
    assert [(r["id"], r["pos"], r["sentence"]) for r in out] == [
        (1, 0, "A b."),
        (1, 1, "C d."),
    ]
