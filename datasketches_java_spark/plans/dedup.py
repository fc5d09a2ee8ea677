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
from ..operators.connected_components import assign_clusters, connected_components
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

    def unpersist(self) -> None:
        """Release every cached stage (long-lived sessions running many
        pipelines would otherwise accumulate CacheManager entries)."""
        for df in (self.signatures, self.dup_pairs, self.clusters,
                   self.hot_buckets):
            try:
                df.unpersist()
            except Exception:
                pass


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

    # Dense int64 surrogate key for string ids (urls): every banding /
    # candidate / verification / clustering shuffle carries 8-byte sids
    # instead of ~45-char url strings (~5x less shuffle payload on the
    # dominant 32x band explode).  The sid is minted INSIDE the
    # persisted/checkpointed signature stage, so it is stable for the
    # run and resumable; urls are re-attached only to the final small
    # outputs (verified pairs, clusters).
    id_is_string = dict(pages.dtypes).get(id_col) == "string"
    key = "_sid" if id_is_string else id_col

    def build_signatures() -> DataFrame:
        s = add_signatures(pages.select(id_col, text_col), text_col) \
            .drop(text_col)  # text is dead weight downstream of shingling
        if id_is_string:
            s = s.withColumn(key, F.monotonically_increasing_id())
        return s

    sig = stage("01_signatures", build_signatures, lineage=id_col)
    ids = sig.select(key, id_col) if id_is_string else None

    buckets = stage(
        "02_band_buckets", lambda: band_buckets(sig, key), lineage=key)

    hot = stage(
        "03_hot_buckets",
        lambda: hot_buckets(buckets, min_size=bucket_cap), lineage="bucket_size")

    pairs = stage(
        "04_candidate_pairs",
        lambda: candidate_pairs(buckets, key, bucket_cap), lineage="id_a")

    # verified pairs stay in sid space (the persisted/checkpointed
    # artifact); urls are re-attached lazily on top — two equi-joins on
    # the small O(dups) pair table, never on the banded stream
    verified = stage(
        "05_verified_pairs",
        lambda: verify_pairs(pairs, sig, key, threshold=threshold),
        lineage="id_a")

    if id_is_string:
        dup_pairs = (verified
                     .join(ids.withColumnsRenamed({key: "id_a", id_col: "_ua"}),
                           on="id_a")
                     .join(ids.withColumnsRenamed({key: "id_b", id_col: "_ub"}),
                           on="id_b")
                     .select(F.least("_ua", "_ub").alias("id_a"),
                             F.greatest("_ua", "_ub").alias("id_b"), "jaccard"))
    else:
        dup_pairs = verified

    if with_lcs:
        dup_pairs = stage(
            "05b_pair_lcs",
            lambda: pair_lcs(attach_texts(dup_pairs, pages, id_col, text_col)),
            lineage="id_a")

    def build_clusters() -> DataFrame:
        if not id_is_string:
            return assign_clusters(
                pages.select(id_col), verified.select("id_a", "id_b"), id_col)
        # CC runs on int64 sid edges; cluster_id = min member url,
        # recomputed in url space on the (small) component table so the
        # output contract (deterministic min-id cluster labels) is
        # unchanged
        comp = connected_components(verified.select("id_a", "id_b"))
        comp_urls = (comp.join(ids.withColumnsRenamed({key: "id"}), on="id")
                     .select(F.col(id_col), F.col("component")))
        cmin = (comp_urls.groupBy("component")
                .agg(F.min(id_col).alias("cluster_id")))
        members = comp_urls.join(cmin, on="component").select(id_col, "cluster_id")
        return (pages.select(id_col).join(members, on=id_col, how="left")
                .withColumn("cluster_id",
                            F.coalesce("cluster_id", F.col(id_col))))

    clusters = stage("06_clusters", build_clusters, lineage=id_col)

    return DedupResult(signatures=sig, dup_pairs=dup_pairs,
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
