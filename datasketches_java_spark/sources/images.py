"""Media ingestion sources → the multimodal binary-column schema.

Two Spark built-in sources cover image ingestion at scale; both are
file-granular-parallel (one task per file split, no driver loop):

- ``binaryFile``: raw bytes + path metadata.  The scale path — media
  bytes stay an opaque ``blob`` column decoded later by the
  Arrow-batched operators in functions/multimodal.py (BMP/PNG/baseline
  JPEG decode pure-numpy in-repo; the JVM never materializes pixels).
- ``image``: the JVM decodes pixels via ImageIO at scan time.  Useful
  for quick exploration and as the independent cross-check decoder
  (tests/test_jpeg_codec.py), but it shuffles decoded pixel buffers —
  at 10^12-document scale prefer ``read_media_binary``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_media_binary(spark: SparkSession, path: str,
                      pattern: str | None = None) -> DataFrame:
    """Recursive binaryFile scan → (url, blob, length, mod_ts).

    ``pattern`` is a glob over file names (e.g. ``"*.jpg"``).  The
    blob column feeds functions/multimodal.decode_image /
    audio_stats / frame_sample directly."""
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    df = reader.option("recursiveFileLookup", "true").load(path)
    return df.select(F.col("path").alias("url"),
                     F.col("content").alias("blob"),
                     F.col("length"),
                     F.col("modificationTime").alias("mod_ts"))


def read_images_jvm(spark: SparkSession, path: str) -> DataFrame:
    """Spark `image` source (JVM ImageIO decode at scan) →
    (url, width, height, channels, mode, pixels_bgr).  Exploration /
    cross-check path; see module docstring for the scale caveat."""
    df = spark.read.format("image").load(path)
    return df.select(F.col("image.origin").alias("url"),
                     F.col("image.width").alias("width"),
                     F.col("image.height").alias("height"),
                     F.col("image.nChannels").alias("channels"),
                     F.col("image.mode").alias("mode"),
                     F.col("image.data").alias("pixels_bgr"))
