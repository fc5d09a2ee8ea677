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
    minimum of N(u) ∪ {u}.

    Aggregate-only formulation: ``mn`` comes from a plain
    ``groupBy(src).agg(min(dst))`` (map-side combinable, constant-size
    buffer) and is joined back to the edge list — no row ever holds a
    neighbor array, so a mega-degree hub (the salted LSH path's global
    hub for a 1e6-page template bucket) costs O(degree) rows spread
    across tasks instead of one multi-GB aggregation buffer."""
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # the agg side goes through toDF so its attributes get fresh ids —
    # the self-join over a shared union subtree otherwise trips
    # Catalyst's resolver ("key not found" during optimization)
    mins = (sym.toDF("_u", "_d").groupBy("_u").agg(F.min("_d").alias("_mnb"))
            .select("_u", F.least(F.col("_u"), F.col("_mnb")).alias("mn")))
    out = (sym.join(mins, sym["src"] == mins["_u"])
           .where(F.col("dst") > F.col("src"))
           .select(F.col("dst").alias("src"), F.col("mn").alias("dst")))
    return out.where(F.col("src") != F.col("dst"))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to the larger endpoint; connect all smaller
    neighbors (and self) to the minimum.  Same aggregate+join shape as
    ``_large_star`` — no neighbor arrays."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
    mins = (oriented.toDF("_u", "_d").groupBy("_u")
            .agg(F.min("_d").alias("mn")))
    nbr_edges = (oriented.join(mins, oriented["src"] == mins["_u"])
                 .select(F.col("dst").alias("src"), F.col("mn").alias("dst")))
    self_edges = mins.select(F.col("_u").alias("src"), F.col("mn").alias("dst"))
    out = nbr_edges.unionAll(self_edges)
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
        # the intermediate checkpoint between the two star ops both cuts
        # plan growth and sidesteps a Catalyst resolver failure ("key
        # not found" during optimization) on the nested self-join over a
        # shared union subtree that the composed plan otherwise forms
        # lazy: the large-star RDD materializes inside e2's job (one job
        # per round), while the logical plan is cut immediately
        ls = _large_star(e).localCheckpoint(eager=False)
        e2 = _canonical(_small_star(ls)).localCheckpoint()
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
    # comp comes out of the iterative fixpoint (checkpointed, no
    # Catalyst stats) so Spark would default to sort-merge and SORT the
    # full df side; hint shuffle-hash — comp (one row per clustered
    # node, <= edge endpoints) is the build side, df streams.
    return (df.join(comp.hint("shuffle_hash"), on=id_col, how="left")
              .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
              .drop("component"))
