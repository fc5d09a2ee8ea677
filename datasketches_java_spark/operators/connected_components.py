"""Connected components over a DataFrame edge list.

Large-star / small-star alternation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC'14) — the standard
O(log n)-round, shuffle-only CC algorithm; no reference counterpart
(the reference delegates all dataflow to host systems, SURVEY.md
§2.11).

Scale design: each round is two groupBy shuffles on node id; the edge
list monotonically contracts toward star graphs.  The DataFrame
lineage would grow unboundedly across iterations, so every round is
cut with localCheckpoint (cluster deployments should set a checkpoint
dir and use checkpoint(); the dedup plan's parquet stage checkpoints
cover durable resume).  Convergence is detected by an exact
edge-set fixpoint (count of changed edges == 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge list → canonical (src>dst excluded, self-loops
    dropped, deduped)."""
    e = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
    return e.where(F.col("src") != F.col("dst")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the
    minimum of N(u) ∪ {u}."""
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = (sym.groupBy("src")
         .agg(F.collect_set("dst").alias("nbrs")))
    m = m.withColumn("mn", F.least(F.col("src"), F.array_min("nbrs")))
    out = m.select(
        F.explode(F.filter("nbrs", lambda v: v > F.col("src"))).alias("src"),
        F.col("mn").alias("dst"))
    return out.where(F.col("src") != F.col("dst"))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to the larger endpoint; connect all smaller
    neighbors (and self) to the minimum."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
    m = (oriented.groupBy("src")
         .agg(F.collect_set("dst").alias("nbrs")))
    m = m.withColumn("mn", F.array_min("nbrs"))
    out = m.select(
        F.explode(F.array_union("nbrs", F.array("src"))).alias("src"),
        F.col("mn").alias("dst"))
    return out.where(F.col("src") != F.col("dst"))


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iterations: int = 50) -> DataFrame:
    """Edge list → (id, component) with component = min node id of the
    component.  Nodes appearing only in ``edges`` are covered; isolated
    nodes are the caller's concern (left-join and coalesce to self).
    """
    e = _canonical(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    e = e.localCheckpoint()

    def fingerprint(df: DataFrame):
        # one narrow aggregate instead of two exceptAll shuffles; the
        # edge set is canonical+distinct so (count, sum-of-hash)
        # identifies it (collision odds ~2^-64 per iteration)
        row = df.agg(F.count(F.lit(1)).alias("c"),
                     F.expr("bit_xor(xxhash64(src, dst))").alias("h")).first()
        return row["c"], row["h"]

    fp = fingerprint(e)
    for _ in range(max_iterations):
        e2 = _canonical(_small_star(_large_star(e))).localCheckpoint()
        fp2 = fingerprint(e2)
        e = e2
        if fp2 == fp:
            break
        fp = fp2

    # fixpoint: a star forest in canonical (min, member) orientation —
    # src is the component minimum, dst the member
    members = e.select(F.col("dst").alias("id"), F.col("src").alias("component"))
    roots = e.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id"))
    return members.unionByName(roots).groupBy("id").agg(
        F.min("component").alias("component"))


def assign_clusters(df: DataFrame, edges: DataFrame, id_col: str,
                    src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Attach cluster ids to every row of ``df``; singletons get their
    own id (cluster_id = min member id, deterministic)."""
    comp = connected_components(edges, src, dst).withColumnRenamed("id", id_col)
    return (df.join(comp, on=id_col, how="left")
              .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
              .drop("component"))
