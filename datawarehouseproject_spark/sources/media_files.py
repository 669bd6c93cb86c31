"""File-based media ingestion via Spark's ``binaryFile`` source.

A real multimodal corpus usually lands as FILES (one image/clip per
object), not as payload columns in Parquet. Spark's built-in
``binaryFile`` format reads those distributed — path, mtime, length,
and content per row, with partition-parallel listing and a
``pathGlobFilter`` pushdown — which this wrapper normalizes into the
engine's media frame shape ``(media_id, payload [, meta...])`` so
every multimodal operator (:mod:`..operators.multimodal`) composes
unchanged.

Scale notes: ``binaryFile`` caps per-file size at
``spark.sql.sources.binaryFile.maxLength`` (2 GB default) and one
file never splits across tasks — right for media objects; for
billions of tiny files, pack into Parquet payload columns (the
engine's other ingestion path) to amortize listing. ``media_id`` is
the md5-derived 60-bit id of the file path: stable across re-runs
and clusters, join-able against sidecar metadata keyed the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def read_media_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    keep_path: bool = False,
) -> DataFrame:
    """Read a directory of media files into the media frame shape.

    ``glob`` (e.g. ``*.bmp``) is pushed down as ``pathGlobFilter`` so
    non-matching files are never opened. The returned frame has
    ``media_id`` (md5 of the file path), ``payload`` (file bytes),
    and optionally ``path`` for lineage/debugging.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    cols = [
        md5_long(F.col("path"), salt="media:").alias("media_id"),
        F.col("content").alias("payload"),
    ]
    if keep_path:
        cols.append("path")
    return df.select(*cols)
