"""Composed decontaminated export (round-11 verdict #6): a verbatim
>= w+k-1-char eval passage DILUTED below the gram-fraction gate by
document length must still be rejected — the winnow verdict closes
the hole the fraction-only rule leaves."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from firefox_public_data_report_etl_spark.operators.text import hash_split
from firefox_public_data_report_etl_spark.plans.loader import (
    training_export_decontaminated,
    training_export_decontaminated_composed,
)

LEAK = "the secret held-out benchmark passage nobody may train on"


def _write_fixture(spark, tmp_path):
    ids = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    splits = {r.doc_id: r.split for r in hash_split(ids).collect()}
    train_ids = [i for i in range(200) if splits[i] == "train"]
    held_id = next(i for i in range(200) if splits[i] != "train")
    leak_id, clean_ids = train_ids[0], train_ids[1:4]
    filler_a = " ".join(f"alpha{j}ax{j} beta{j}bx{j}" for j in range(800))
    filler_b = " ".join(f"gamma{j}gz{j}" for j in range(800))
    rows = [
        # the diluted leak: verbatim passage buried in ~3200 unique
        # tokens -> shingle fraction << DECON_MAX_PCT
        (leak_id, f"{filler_a} {LEAK} {filler_b}"),
        (held_id, f"held out eval item {LEAK} end"),
    ] + [
        (i, " ".join(f"doc{i}w{j}q{j} {j}uni{i}k" for j in range(40)))
        for i in clean_ids
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "fixture", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    leak_tokens = len(rows[0][1].split(" "))
    return leak_id, leak_tokens


@pytest.mark.full
def test_composed_export_rejects_diluted_verbatim_leak(spark, tmp_path):
    leak_id, leak_tokens = _write_fixture(spark, str(tmp_path))
    frac = training_export_decontaminated(spark, str(tmp_path)).toPandas()
    comp = training_export_decontaminated_composed(
        spark, str(tmp_path)
    ).toPandas()
    # the gram-fraction-only gate KEEPS the diluted leak doc...
    # ...the composed gate drops exactly that document's tokens
    assert (
        int(frac["n_tokens"].sum()) - int(comp["n_tokens"].sum())
        == leak_tokens
    )
    assert int(frac["n_docs"].sum()) - int(comp["n_docs"].sum()) == 1
