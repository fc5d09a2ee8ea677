"""The north-star plan: near-duplicate detection + clustering.

text → shingles → MinHash128/SimHash64 → LSH band buckets → capped
candidate explode → exact-Jaccard verification → connected components
→ cluster assignments, with optional per-stage checkpointing
(operators/checkpoint.py) and skew/cardinality metrics from the sketch
UDAF library.

Every stage is a DataFrame transformation; the only Python in the hot
path is the two Arrow-batched signature UDFs.  On a cluster this file
is the spark-submit job (see bench.py / scripts) — the plan object is
deliberately stateless so the same code runs at any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DUP_JACCARD_THRESHOLD, LSH_BUCKET_CAP
from ..operators.checkpoint import CheckpointStore
from ..operators.connected_components import assign_clusters
from ..operators.lsh import (
    add_signatures,
    band_buckets,
    candidate_pairs,
    hot_buckets,
    verify_pairs,
)
from ..operators.suffix_array import attach_texts, pair_lcs


@dataclass
class DedupResult:
    signatures: DataFrame     # id, shingles, minhash, simhash
    dup_pairs: DataFrame      # id_a, id_b, jaccard
    clusters: DataFrame       # id, cluster_id
    hot_buckets: DataFrame    # band, band_hash, bucket_size


def dedup_pipeline(spark: SparkSession, pages: DataFrame, id_col: str = "url",
                   text_col: str = "text",
                   threshold: float = DUP_JACCARD_THRESHOLD,
                   bucket_cap: int = LSH_BUCKET_CAP,
                   checkpoint_dir: str | None = None,
                   with_lcs: bool = False) -> DedupResult:
    """Run (or resume) the full dedup pipeline."""
    # Guard against under-split sources (one fat parquet row group ⇒
    # one scan task ⇒ the whole signature stage runs serially).  On a
    # real cluster the Iceberg table is split-friendly and this is a
    # no-op; the check is metadata-only.
    cores = spark.sparkContext.defaultParallelism
    if pages.rdd.getNumPartitions() < cores:
        pages = pages.repartition(cores * 2)

    store = CheckpointStore(spark, checkpoint_dir) if checkpoint_dir else None

    def stage(name: str, build, lineage: str | None = None) -> DataFrame:
        if store:
            return store.run_stage(name, build, lineage_col=lineage)
        # no durable checkpoint: persist so multi-consumer stages
        # (signatures feed both banding and verification) are computed
        # once — without this every downstream action recomputes the
        # whole upstream chain
        return build().persist()

    sig = stage(
        "01_signatures",
        lambda: add_signatures(pages.select(id_col, text_col), text_col)
        .drop(text_col),  # text is dead weight downstream of shingling
        lineage=id_col)

    buckets = stage(
        "02_band_buckets", lambda: band_buckets(sig, id_col), lineage=id_col)

    hot = stage(
        "03_hot_buckets",
        lambda: hot_buckets(buckets, min_size=bucket_cap), lineage="bucket_size")

    pairs = stage(
        "04_candidate_pairs",
        lambda: candidate_pairs(buckets, id_col, bucket_cap), lineage="id_a")

    verified = stage(
        "05_verified_pairs",
        lambda: verify_pairs(pairs, sig, id_col, threshold=threshold),
        lineage="id_a")

    if with_lcs:
        verified = stage(
            "05b_pair_lcs",
            lambda: pair_lcs(attach_texts(verified, pages, id_col, text_col)),
            lineage="id_a")

    clusters = stage(
        "06_clusters",
        lambda: assign_clusters(
            pages.select(id_col), verified.select("id_a", "id_b"), id_col),
        lineage=id_col)

    return DedupResult(signatures=sig, dup_pairs=verified,
                       clusters=clusters, hot_buckets=hot)


def dedup_metrics(result: DedupResult, id_col: str = "url") -> DataFrame:
    """One-row summary the checkpoint epoch records: docs, dup pairs,
    clusters, docs-in-clusters, hot buckets."""
    n_docs = result.clusters.count()
    n_pairs = result.dup_pairs.count()
    agg = result.clusters.groupBy("cluster_id").count()
    n_clusters = agg.filter(F.col("count") > 1).count()
    n_clustered = (agg.filter(F.col("count") > 1)
                   .agg(F.sum("count")).collect()[0][0]) or 0
    n_hot = result.hot_buckets.count()
    spark = result.clusters.sparkSession
    return spark.createDataFrame(
        [(n_docs, n_pairs, n_clusters, int(n_clustered), n_hot)],
        "n_docs long, n_dup_pairs long, n_clusters long, "
        "n_clustered_docs long, n_hot_buckets long")
