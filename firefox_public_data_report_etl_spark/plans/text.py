"""Text-analysis and multimodal-plumbing queries over `documents`."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from firefox_public_data_report_etl_spark.functions import md5_int_sql
from firefox_public_data_report_etl_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    frame_sample_plan,
    resize_plan,
)
from firefox_public_data_report_etl_spark.operators.text import (
    BPE_PRETOKEN_RE,
    CHARS_PER_TOKEN_EST,
    FINGERPRINT_GRAM,
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    hash_split,
    inverted_index,
    langid_heuristic,
    quality_features,
    repetition_features,
    stratified_sample,
    tfidf_top_terms,
    token_counts,
)
from firefox_public_data_report_etl_spark.sources import load_table


def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_features(load_table(spark, sf_dir, "documents"))


def _in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


TEXT_QUALITY_ORACLE = f"""
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t, text AS x FROM documents),
f AS (SELECT doc_id, lang,
        CAST(len(t) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(t)) AS BIGINT) AS n_types,
        CAST(length(replace(x, ' ', '')) AS BIGINT) AS chars,
        CAST(len(list_filter(t, w -> w IN ({_in_list(STOPWORDS)}))) AS BIGINT) AS stops
      FROM d)
SELECT doc_id, lang, n_tokens, n_types,
       CAST(n_types AS DOUBLE) / n_tokens AS ttr,
       CAST(chars AS DOUBLE) / n_tokens AS avg_token_len,
       CAST(stops AS DOUBLE) / n_tokens AS stop_ratio
FROM f
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return langid_heuristic(load_table(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    langs = list(LANG_MARKERS)
    scores = ",\n       ".join(
        f"len(list_filter(t, w -> w IN ({_in_list(LANG_MARKERS[lang])}))) AS s_{lang}"
        for lang in langs
    )
    whens = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"]
        for j, o in enumerate(langs):
            if j == i:
                continue
            op = ">=" if j > i else ">"
            conds.append(f"s_{lang} {op} s_{o}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + " ELSE 'und' END"
    return f"""
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
s AS (SELECT doc_id, lang,
       {scores}
      FROM d)
SELECT doc_id, lang AS labeled_lang, {case} AS pred_lang,
       ({case}) = lang AS is_match
FROM s
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


TEXT_FINGERPRINT_ORACLE = f"""
WITH d AS (SELECT doc_id, text AS x FROM documents WHERE length(text) >= {FINGERPRINT_GRAM}),
g AS (SELECT doc_id,
        unnest(list_transform(range(1, length(x) - {FINGERPRINT_GRAM - 2}),
                              i -> substr(x, i, {FINGERPRINT_GRAM}))) AS g
      FROM d),
hh AS (SELECT doc_id, {md5_int_sql('g')} AS h FROM g)
SELECT doc_id, min(h) AS fp_min, count(*) AS n_grams,
       count(DISTINCT h) AS n_distinct
FROM hh GROUP BY doc_id
"""


def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(load_table(spark, sf_dir, "documents"))


TOKEN_COUNTS_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PRETOKEN_RE}')) AS BIGINT) AS bpe_tokens,
       CAST(length(text) // {CHARS_PER_TOKEN_EST} AS BIGINT) AS est_tokens
FROM documents
"""


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing, JVM side: payload bytes + chunk count
    (the partition-planning input for a decode stage)."""
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.expr("(n_bytes + 255) div 256").alias("n_chunks"),
    )


MULTIMODAL_META_ORACLE = """
SELECT doc_id AS media_id,
       'image/fake' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_chunks
FROM documents
"""


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched mapInPandas decode stage over binary payloads.

    The FakeDecoder (operators.multimodal) is deterministic — a
    31-polynomial byte fold mod 1e9+7 — so the stage has an exact
    DuckDB twin (byte-level fold via hex + list_reduce) even though the
    decode itself runs Python-side."""
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    return decode_media(media)


# DuckDB twin of FakeDecoder.decode: fold utf-8 payload bytes with
# cks = (cks*31 + byte) % 1_000_000_007, then derive fake dims.
MULTIMODAL_DECODE_ORACLE = """
WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n
           FROM documents),
c AS (SELECT doc_id, n,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(0, n),
            i -> CAST(CAST(('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2)) AS INT) AS BIGINT))),
          (acc, b) -> (acc*31 + b) % 1000000007) AS cks
      FROM d)
SELECT doc_id AS media_id,
       'image/fake' AS media_type,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(64 + cks % 128 AS INT) AS width,
       CAST(64 + (cks // 128) % 128 AS INT) AS height,
       cks AS checksum
FROM c
"""


def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over the decoded-media stage: integer-exact
    target dims capped at 96 px on the longest side. The arithmetic is
    all-integer (``div``), so the plan has an exact DuckDB twin on top
    of the decode oracle's checksum fold."""
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    return resize_plan(decode_media(media), max_dim=96)


MULTIMODAL_RESIZE_ORACLE = """
WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n
           FROM documents),
c AS (SELECT doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(0, n),
            i -> CAST(CAST(('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2)) AS INT) AS BIGINT))),
          (acc, b) -> (acc*31 + b) % 1000000007) AS cks
      FROM d),
wh AS (SELECT doc_id AS media_id,
              CAST(64 + cks % 128 AS INT) AS width,
              CAST(64 + (cks // 128) % 128 AS INT) AS height
       FROM c)
SELECT media_id, width, height,
       greatest(width, height) > 96 AS needs_resize,
       CASE WHEN greatest(width, height) > 96
            THEN CAST(width AS BIGINT) * 96 // greatest(width, height)
            ELSE CAST(width AS BIGINT) END AS target_width,
       CASE WHEN greatest(width, height) > 96
            THEN CAST(height AS BIGINT) * 96 // greatest(width, height)
            ELSE CAST(height AS BIGINT) END AS target_height
FROM wh
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan: 4 evenly-spaced fake-frame indices per
    media row (chunk count stands in for frame count), exploded to one
    row per (media, frame) — the work list a video decode stage would
    map over. Pure JVM-side array math; explode drops zero-frame rows
    exactly like DuckDB UNNEST of an empty list."""
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    return frame_sample_plan(media, n_samples=4)


MULTIMODAL_FRAME_SAMPLE_ORACLE = """
WITH m AS (SELECT doc_id AS media_id,
                  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_frames
           FROM documents),
i AS (SELECT media_id, n_frames,
             CASE WHEN n_frames >= 4
                  THEN list_transform(range(0, 4), k -> k * n_frames // 4)
                  ELSE range(0, n_frames) END AS idxs
      FROM m)
SELECT media_id, n_frames, UNNEST(idxs) AS frame_index FROM i
"""


def corpus_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split summary: per-split
    document and token-estimate counts. The assignment itself is a
    narrow projection; the summary aggregate is tiny."""
    split = hash_split(load_table(spark, sf_dir, "documents"))
    return split.groupBy("split").agg(
        F.count("*").alias("docs"),
        F.sum(F.length("text").cast("long")).alias("chars"),
    )


CORPUS_HASH_SPLIT_ORACLE = f"""
WITH b AS (
  SELECT text,
         {md5_int_sql("cast(doc_id as varchar)")} % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS docs,
       CAST(sum(length(text)) AS BIGINT) AS chars
FROM b GROUP BY 1
"""


def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals over the corpus."""
    return repetition_features(load_table(spark, sf_dir, "documents"))


DOC_REPETITION_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
per_tok AS (
  SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(max(c) AS BIGINT) AS top_token_count,
       CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS top_token_dominance,
       CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS distinct_token_ratio
FROM per_tok GROUP BY doc_id
"""


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25 docs per labeled language, hash-ordered (seedless
    reservoir): the balanced-evaluation-set builder."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "lang", 25)


CORPUS_STRATIFIED_SAMPLE_ORACLE = f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {md5_int_sql("cast(doc_id as varchar)")}, doc_id
         ) AS rank_in_stratum
  FROM documents
)
SELECT doc_id, lang, CAST(rank_in_stratum AS BIGINT) AS rank_in_stratum
FROM r WHERE rank_in_stratum <= 25
"""


def corpus_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token → (df, sorted posting list) over the corpus."""
    return inverted_index(load_table(spark, sf_dir, "documents"))


CORPUS_INVERTED_INDEX_ORACLE = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM toks GROUP BY token
"""


def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc (log-free tf-idf)."""
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


CORPUS_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, token),
dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, token, tf, df,
         CAST(tf AS DOUBLE) * (SELECT n_docs FROM n) / df AS score
  FROM tf JOIN dfr USING (token)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, token ASC) AS rnk
  FROM scored
)
SELECT doc_id, token, tf, df, score, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
"""


QUERIES = {
    "text_quality_scores": text_quality_scores,
    "text_langid": text_langid,
    "text_token_counts": text_token_counts,
    "text_fingerprint": text_fingerprint,
    "multimodal_meta": multimodal_meta,
    "multimodal_decode": multimodal_decode,
    "multimodal_resize_plan": multimodal_resize_plan,
    "multimodal_frame_sample": multimodal_frame_sample,
    "corpus_hash_split": corpus_hash_split,
    "corpus_stratified_sample": corpus_stratified_sample,
    "corpus_inverted_index": corpus_inverted_index,
    "corpus_tfidf_top_terms": corpus_tfidf_top_terms,
    "doc_repetition_scores": doc_repetition_scores,
}

ORACLES = {
    "text_quality_scores": TEXT_QUALITY_ORACLE,
    "text_langid": _langid_oracle(),
    "text_token_counts": TOKEN_COUNTS_ORACLE,
    "text_fingerprint": TEXT_FINGERPRINT_ORACLE,
    "multimodal_meta": MULTIMODAL_META_ORACLE,
    "multimodal_decode": MULTIMODAL_DECODE_ORACLE,
    "multimodal_resize_plan": MULTIMODAL_RESIZE_ORACLE,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SAMPLE_ORACLE,
    "corpus_hash_split": CORPUS_HASH_SPLIT_ORACLE,
    "corpus_stratified_sample": CORPUS_STRATIFIED_SAMPLE_ORACLE,
    "corpus_inverted_index": CORPUS_INVERTED_INDEX_ORACLE,
    "corpus_tfidf_top_terms": CORPUS_TFIDF_ORACLE,
    "doc_repetition_scores": DOC_REPETITION_ORACLE,
}
