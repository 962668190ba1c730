"""Binary media source: Spark's ``binaryFile`` reader as the
production path for the multimodal decode stages.

The registry's multimodal queries SYNTHESIZE payloads in-stage (so the
DuckDB oracle can recompute from the logical pixel rule); a real
deployment reads the same payloads from object storage. This module is
that path: ``binaryFile`` gives (path, modificationTime, length,
content) per blob with partition parallelism and predicate pushdown on
path/length, and the loader normalizes it to the engine's MEDIA
contract (media_id, payload, media_type, n_bytes) so every downstream
decode stage (decode_bmp_stats, decode_ppm_stats, decode_wav_stats,
resize/frame stages) runs UNCHANGED on file-sourced media.

Naming contract: blobs are named ``<media_id>.<ext>`` (the id is the
digits before the extension); extension → media type. At 100 TB the
same reader fans out over an object-store listing; pathGlobFilter
prunes by format, and ``spark.sql.files.maxPartitionBytes`` bounds a
task's blob batch exactly as for parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_EXT_TO_TYPE = {
    "bmp": "image/bmp",
    "ppm": "image/x-portable-pixmap",
    "wav": "audio/wav",
}


def load_media_dir(
    spark: SparkSession, path: str, ext: str = "bmp"
) -> DataFrame:
    """Read ``<media_id>.<ext>`` blobs under ``path`` into the MEDIA
    contract columns. One row per file; content never leaves the JVM
    until a decode stage asks for it."""
    if ext not in _EXT_TO_TYPE:
        raise ValueError(
            f"load_media_dir: unknown media extension {ext!r} "
            f"(known: {sorted(_EXT_TO_TYPE)})"
        )
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*.{ext}")
        .load(path)
    )
    stem = F.element_at(F.split(F.element_at(F.split("path", "/"), -1), "\\."), 1)
    return raw.select(
        stem.cast("long").alias("media_id"),
        F.col("content").alias("payload"),
        F.lit(_EXT_TO_TYPE[ext]).alias("media_type"),
        F.col("length").alias("n_bytes"),
    )
