"""LSH band-bucket candidate generation + exact-Jaccard verification.

Pipeline stage 2-3 of the north star (SURVEY.md §7.5): signatures →
band buckets → capped within-bucket pair explode → distinct pairs →
verification join on shingle arrays.

Scale design (100 TB / 10^12 docs):
  - Band extraction and bucket hashing are pure Catalyst expressions
    (xxhash64 over signature slices) — whole-stage codegen, no Python.
  - Candidate pairing is ONE shuffle on (band, band_hash).  Within a
    bucket we emit all pairs up to ``bucket_cap`` docs plus hub-star
    edges for the overflow, so a hot-template bucket of 1e6 pages
    yields O(cap² + n) edges, not O(n²) — the "capped-bucket explode"
    the north rule requires.  Connectivity is preserved (star edges
    keep the bucket one component for clustering) while edge count is
    bounded.
  - Hot buckets are *detected* with the frequent-items UDAF
    (frequencies/LongsSketch.java counterpart) for metrics, and the
    pair-generation shuffle is salted by doc hash so that even a
    pathological band hash distributes across
    ``spark.sql.shuffle.partitions`` tasks before the window runs.
  - Pair dedup across the 32 bands is a map-side-combinable distinct.
  - The verification join re-attaches shingle arrays by id; exact
    Jaccard is F.array_intersect/array_union — JVM-side, codegen
    (counterpart of theta/JaccardSimilarity.java:55 exact mode).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..config import (
    DUP_JACCARD_THRESHOLD,
    LSH_BANDS,
    LSH_BUCKET_CAP,
    LSH_ROWS,
    MINHASH_PERMS,
)
from ..functions.text import exact_jaccard


def add_signatures(df: DataFrame, text_col: str = "text",
                   shingle_col: str = "shingles",
                   minhash_col: str = "minhash",
                   simhash_col: str = "simhash") -> DataFrame:
    """text → distinct shingle-hash array → 128-perm MinHash + SimHash.

    Shingling is JVM-side (functions/text.py, token column bound once).
    Signatures run in ONE ``mapInArrow`` pass: the list column arrives
    as a flat value buffer + offsets, numpy computes both signatures
    over the flat buffer, and the outputs are rebuilt as Arrow
    ListArrays directly — no pandas Series of per-row arrays on either
    side (that object churn, not the math, was 85 % of the stage cost).
    """
    import pyarrow as pa

    from ..functions.minhash import minhash_flat, simhash_flat
    from ..functions.text import shingle_hashes_from_tokens, tokens
    from pyspark.sql import types as T

    df = (df.withColumn("_toks", tokens(text_col))
            .withColumn(shingle_col, shingle_hashes_from_tokens("_toks"))
            .drop("_toks"))

    out_schema = T.StructType(
        list(df.schema)
        + [T.StructField(minhash_col, T.ArrayType(T.LongType())),
           T.StructField(simhash_col, T.LongType())])
    sh_idx = df.columns.index(shingle_col)
    out_names = [*df.columns, minhash_col, simhash_col]

    def gen(batches):
        for batch in batches:
            la = batch.column(sh_idx)
            if isinstance(la, pa.ChunkedArray):
                la = la.combine_chunks()
            offsets = la.offsets.to_numpy().astype(np.int64)
            base = offsets[0]          # sliced arrays have nonzero base
            values = la.values.to_numpy(zero_copy_only=False)
            values = values[base: offsets[-1]].astype(np.int64).view(np.uint64)
            starts = offsets[:-1] - base
            lengths = np.diff(offsets)
            if la.null_count:          # null list rows -> empty rows
                valid = np.asarray(la.is_valid())
                lengths = np.where(valid, lengths, 0)
            sig = minhash_flat(values, starts, lengths)
            sim = simhash_flat(values, starts, lengths)
            n = len(lengths)
            mh = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * sig.shape[1]),
                pa.array(sig.ravel()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [mh, pa.array(sim)],
                names=out_names)

    return df.mapInArrow(gen, out_schema)


def band_buckets(df: DataFrame, id_col: str, minhash_col: str = "minhash",
                 n_bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """Explode each signature into (id, band, band_hash) bucket keys.

    band_hash = xxhash64(band_index, r-row signature slice) — pure
    Catalyst; the band index participates in the hash so identical row
    values in different bands never collide into one bucket.
    """
    assert n_bands * rows == MINHASH_PERMS
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.lit(b), F.slice(F.col(minhash_col), b * rows + 1, rows))
            .alias("band_hash"))
        for b in range(n_bands)])
    return (df.select(F.col(id_col), F.explode(bands).alias("bb"))
              .select(id_col, F.col("bb.band").alias("band"),
                      F.col("bb.band_hash").alias("band_hash")))


def candidate_pairs(buckets: DataFrame, id_col: str,
                    bucket_cap: int = LSH_BUCKET_CAP,
                    hot_factor: int = 8,
                    n_salts: int = 32) -> DataFrame:
    """Bucket table (id, band, band_hash) → distinct candidate pairs
    (id_a < id_b).

    Normal buckets: all pairs among the first ``bucket_cap`` members
    (deterministic order by id) + star edges hub→overflow — clusters
    stay connected while edges stay O(cap² + n).

    HOT buckets (> cap·hot_factor members — the template-farm skew
    case): the window trick would still sort the whole bucket in ONE
    task, so these take a salted path instead: each member gets
    salt = xxhash64(id) mod n_salts; a per-(bucket, salt) hub is
    elected with a plain aggregate (parallel across salts), members
    star onto their salt-hub, and salt-hubs chain onto the bucket's
    global hub.  No single task ever sees more than ~|bucket|/n_salts
    rows, edge count stays O(n), connectivity is preserved.
    """
    sizes = buckets.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_size"))
    hot_keys = sizes.filter(
        F.col("bucket_size") > bucket_cap * hot_factor)
    marked = buckets.join(F.broadcast(hot_keys.select("band", "band_hash")
                                      .withColumn("_hot", F.lit(True))),
                          on=["band", "band_hash"], how="left")
    normal = marked.filter(F.col("_hot").isNull()).drop("_hot")
    hot = marked.filter(F.col("_hot").isNotNull()).drop("_hot")

    # -- normal path: capped dense pairs + overflow star --
    w = Window.partitionBy("band", "band_hash").orderBy(F.col(id_col))
    # lazily local-checkpointed: consumed four times (dense pairs x2 via
    # self-join, hub, overflow) — one window pass instead of four, and
    # unlike .persist() the blocks' lifetime is tied to the result
    # DataFrame (no CacheManager entry leaking across a long session)
    ranked = normal.withColumn("rn", F.row_number().over(w)) \
        .localCheckpoint(eager=False)

    capped = ranked.filter(F.col("rn") <= bucket_cap)
    a, b = capped.alias("a"), capped.alias("b")
    dense = (a.join(b, on=["band", "band_hash"])
             .where(F.col("a.rn") < F.col("b.rn"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b")))

    hub = ranked.filter(F.col("rn") == 1).select(
        "band", "band_hash", F.col(id_col).alias("id_a"))
    overflow = ranked.filter(F.col("rn") > bucket_cap).select(
        "band", "band_hash", F.col(id_col).alias("id_b"))
    star = hub.join(overflow, on=["band", "band_hash"]).select("id_a", "id_b")

    # -- hot path: salted hubs, aggregate-only (no window) --
    salted = hot.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)))
    salt_hub = (salted.groupBy("band", "band_hash", "salt")
                .agg(F.min(id_col).alias("hub")))
    hot_member = (salted.join(salt_hub, on=["band", "band_hash", "salt"])
                  .where(F.col(id_col) != F.col("hub"))
                  .select(F.least(id_col, "hub").alias("id_a"),
                          F.greatest(id_col, "hub").alias("id_b")))
    bucket_hub = (salt_hub.groupBy("band", "band_hash")
                  .agg(F.min("hub").alias("hub0")))
    hub_chain = (salt_hub.join(bucket_hub, on=["band", "band_hash"])
                 .where(F.col("hub") != F.col("hub0"))
                 .select(F.least("hub", "hub0").alias("id_a"),
                         F.greatest("hub", "hub0").alias("id_b")))

    return (dense.unionByName(star)
            .unionByName(hot_member).unionByName(hub_chain).distinct())


def simhash_band_buckets(df: DataFrame, id_col: str,
                         simhash_col: str = "simhash",
                         max_hamming: int = 12) -> DataFrame:
    """Explode a 64-bit SimHash into (id, band, band_bits) bucket keys.

    The fingerprint is split into ``max_hamming + 1`` contiguous bit
    bands (12 + 1 = 13 bands of ~5 bits for the default).  Pigeonhole:
    two fingerprints within Hamming distance ``max_hamming`` differ in
    at most ``max_hamming`` bands, so they agree exactly on at least
    one band — banding is a lossless candidate generator for the
    Hamming ball, unlike MinHash banding which is probabilistic.
    Pure Catalyst (shift/mask), whole-stage codegen.
    """
    n_bands = max_hamming + 1
    base, extra = divmod(64, n_bands)
    sizes = [base + (1 if b < extra else 0) for b in range(n_bands)]
    offsets = [sum(sizes[:b]) for b in range(n_bands)]
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col(simhash_col), offsets[b])
            .bitwiseAND(F.lit((1 << sizes[b]) - 1)).alias("band_bits"))
        for b in range(n_bands)])
    return (df.select(F.col(id_col), F.explode(bands).alias("bb"))
              .select(id_col, F.col("bb.band").alias("band"),
                      F.col("bb.band_bits").alias("band_bits")))


def simhash_hamming_pairs(sig: DataFrame, id_col: str,
                          simhash_col: str = "simhash",
                          max_hamming: int = 12) -> DataFrame:
    """All pairs within ``max_hamming`` of each other on the 64-bit
    SimHash — EXACT result via the lossless band equi-join (no
    CartesianProduct node; one shuffle on (band, band_bits) plus the
    verification join).  Output: id_a, id_b, hamming.
    """
    from ..functions.minhash import hamming64

    buckets = simhash_band_buckets(sig, id_col, simhash_col, max_hamming)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (a.join(b, on=["band", "band_bits"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())
    sh = sig.select(F.col(id_col), F.col(simhash_col))
    joined = (cand
              .join(sh.withColumnRenamed(id_col, "id_a")
                      .withColumnRenamed(simhash_col, "sh_a"), on="id_a")
              .join(sh.withColumnRenamed(id_col, "id_b")
                      .withColumnRenamed(simhash_col, "sh_b"), on="id_b"))
    return (joined
            .withColumn("hamming", hamming64("sh_a", "sh_b"))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def hot_buckets(buckets: DataFrame, min_size: int = LSH_BUCKET_CAP) -> DataFrame:
    """Buckets exceeding the cap — the skew metric the checkpoint
    lineage records (frequent-items use case, SURVEY.md §2.5)."""
    return (buckets.groupBy("band", "band_hash")
            .agg(F.count("*").alias("bucket_size"))
            .filter(F.col("bucket_size") > min_size))


def verify_pairs(pairs: DataFrame, shingled: DataFrame, id_col: str,
                 shingle_col: str = "shingles",
                 threshold: float = DUP_JACCARD_THRESHOLD) -> DataFrame:
    """Exact-Jaccard verification join: (id_a, id_b) → rows with
    jaccard ≥ threshold.  Output: id_a, id_b, jaccard.

    Both joins carry a shuffle_hash hint: the signature side's rows
    hold ~2 KB shingle arrays, and a sort-merge join (Catalyst's
    default here — checkpointed inputs have no stats) would SORT those
    fat rows per task, which measurably ANTI-scales with concurrent
    tasks (memory/GC pressure: 23 s → 66 s going 4 → 16 cores on the
    400k-doc fixture).  A shuffle-hash join builds the table on the
    pair side and streams the arrays (14 s → 11 s, scaling restored).
    Same reasoning holds at cluster scale: never sort array payloads.
    """
    sh = shingled.select(F.col(id_col), F.col(shingle_col))
    joined = (pairs.hint("shuffle_hash")
              .join(sh.withColumnRenamed(id_col, "id_a")
                      .withColumnRenamed(shingle_col, "sh_a"), on="id_a")
              .hint("shuffle_hash")
              .join(sh.withColumnRenamed(id_col, "id_b")
                      .withColumnRenamed(shingle_col, "sh_b"), on="id_b"))
    return (joined
            .withColumn("jaccard", exact_jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= F.lit(threshold))
            .select("id_a", "id_b", "jaccard"))


def lsh_dup_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                  threshold: float = DUP_JACCARD_THRESHOLD,
                  bucket_cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """End-to-end near-dup pair detection: signatures → bands →
    candidates → verified (id_a, id_b, jaccard)."""
    sig = add_signatures(df.select(id_col, text_col), text_col) \
        .localCheckpoint(eager=False)
    buckets = band_buckets(sig, id_col)
    pairs = candidate_pairs(buckets, id_col, bucket_cap)
    return verify_pairs(pairs, sig, id_col, threshold=threshold)
