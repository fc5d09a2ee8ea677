"""Similarity search over embedding columns.

Two paths:
  - ``cosine_topk``: brute-force exact top-k as a declarative plan —
    broadcast the (small) query set, score with JVM-side
    zip_with/aggregate expressions (whole-stage codegen, no Python),
    rank with a window.  The correctness baseline; also the oracle
    surface (__spark_entry__: ann_cosine_topk).
  - ``cosine_topk_blas``: the scale path — broadcast query matrix as
    numpy, mapInPandas over corpus batches, one BLAS matmul per Arrow
    batch, per-batch local top-k, global top-k via the same window.
    At 10^12 rows the local top-k means the shuffle carries
    O(#queries x k x #partitions) rows instead of O(corpus).
  - ``simhash_ann_buckets``: LSH-bucketed variant — random-hyperplane
    SimHash of the embedding restricts scoring to same-bucket
    candidates (approximate; recall/speed trade documented in tests).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(queries: DataFrame, corpus: DataFrame, id_col: str,
                vec_col: str, k: int = 10) -> DataFrame:
    """Exact cosine top-k of each query against the corpus
    (query_id, neighbor_id, rank).  Self-matches excluded.

    The query side is broadcast (ANN query sets are small by
    definition); scoring stays in codegen.
    """
    # unit-normalize each side BEFORE the join: norms are computed
    # O(n+q) times instead of O(n·q) and sim reduces to a plain dot
    def unit(col):
        n = F.sqrt(_dot(col, col))
        return F.transform(col, lambda x: x / n)

    q = (queries.select(F.col(id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("qv0"))
         .select("query_id", unit(F.col("qv0")).alias("qv")))
    c = (corpus.select(F.col(id_col).alias("neighbor_id"),
                       _as_double(F.col(vec_col)).alias("cv0"))
         .select("neighbor_id", unit(F.col("cv0")).alias("cv")))
    scored = (F.broadcast(q).crossJoin(c)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      _dot("qv", "cv").alias("sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def cosine_topk_blas(queries: DataFrame, corpus: DataFrame, id_col: str,
                     vec_col: str, k: int = 10) -> DataFrame:
    """Scale path: numpy/BLAS scoring per Arrow batch + local top-k.

    Query matrix rides to executors via closure capture (equivalent of
    a broadcast variable); per batch: one (b x d)·(d x q) matmul, then
    argpartition for the local top-k — the shuffle only carries
    candidates.
    """
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows])
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
            sims = X @ qm.T                      # (batch x queries)
            ids = pdf[id_col].to_numpy()
            rows = []
            top = min(k + 1, sims.shape[0])      # +1 allows self removal
            sel = np.argpartition(-sims, top - 1, axis=0)[:top]
            for j, qid in enumerate(qids):
                for i in sel[:, j]:
                    if ids[i] != qid:
                        rows.append((int(qid), int(ids[i]), float(sims[i, j])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def embedding_simhash(df: DataFrame, vec_col: str, bits: int = 16,
                      seed: int = 9001, out_col: str = "bucket") -> DataFrame:
    """Random-hyperplane LSH bucket id for an embedding column —
    sign pattern of `bits` fixed gaussian projections."""
    first = df.select(F.size(vec_col).alias("d")).first()
    d = first["d"]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, d))
    proj = None
    for i in range(bits):
        coeff = F.array(*[F.lit(float(x)) for x in planes[i]])
        dot = _dot(_as_double(F.col(vec_col)), coeff)
        bit = F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        proj = bit if proj is None else proj + bit
    return df.withColumn(out_col, proj.cast("long"))


def simhash_ann_buckets(queries: DataFrame, corpus: DataFrame, id_col: str,
                        vec_col: str, k: int = 10, bits: int = 8) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates (equi-join
    on the hyperplane signature instead of a cross join)."""
    qb = embedding_simhash(
        queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv")), "qv", bits)
    cb = embedding_simhash(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("cv")), "cv", bits)
    sim = _dot("qv", "cv") / (
        F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("cv", "cv")))
    scored = (qb.join(cb, on="bucket")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id", sim.alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))
