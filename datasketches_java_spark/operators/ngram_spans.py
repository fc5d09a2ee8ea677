"""Corpus-level frequent n-gram span detection.

The substring-dedup pass of a training-data pipeline (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL'22):
find every position where a document repeats an n-gram that occurs at
least ``min_count`` times across the WHOLE corpus — the spans a
boilerplate/repetition filter masks or drops.

Spark-first shape, 100-TB cost model:
  - one posexplode pass producing (doc_id, pos, gram_hash) — the only
    row-multiplying step, O(total tokens) rows of ~20 bytes (the gram
    STRING never leaves its originating task: it is hashed in the same
    projection);
  - one count aggregation on the 8-byte hash (map-side partial
    combine);
  - the hot set (count >= min_count) joins back SHUFFLED by default:
    at 10^12 docs the set of n-grams at >= min_count corpus frequency
    is plausibly billions of rows, so a forced broadcast would OOM the
    executors.  AQE still converts the join to broadcast from runtime
    stats whenever the hot set is actually small (the common case at
    sane thresholds), so small corpora lose nothing; callers that KNOW
    the set is tiny can force it with ``broadcast_hot=True``.

The hash is md5-derived (top 15 hex chars as int64) so a DuckDB oracle
can compute identical values; swap ``hash_fn`` for ``F.xxhash64`` in
production for a cheaper hash with the same plan.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_hash64(gram: Column) -> Column:
    """int64 gram hash DuckDB can replicate:
    CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def frequent_ngram_spans(docs: DataFrame, id_col: str, text_col: str,
                         tokens_fn: Callable[[str], Column],
                         n: int = 8, min_count: int = 5,
                         hash_fn: Callable[[Column], Column] = md5_hash64,
                         broadcast_hot: bool = False) -> DataFrame:
    """Return (id_col, pos, gram_hash, n_docs, total_count) — one row
    per occurrence of a corpus-frequent n-gram, where ``pos`` is the
    0-based token offset of the gram in its document, ``total_count``
    its corpus-wide occurrence count and ``n_docs`` how many distinct
    documents contain it (boilerplate = high n_docs; within-doc
    repetition = high total_count at low n_docs)."""
    toks = docs.select(F.col(id_col), tokens_fn(text_col).alias("_toks"))
    grams = toks.select(
        id_col,
        F.posexplode(F.transform(
            F.expr(f"slice(_toks, 1, greatest(size(_toks) - {n - 1}, 0))"),
            lambda _x, i: hash_fn(
                F.concat_ws(" ", F.slice(F.col("_toks"), i + F.lit(1),
                                         F.lit(n)))),
        )).alias("pos", "gram_hash"))
    hot = (grams.groupBy("gram_hash")
           .agg(F.count("*").alias("total_count"),
                F.count_distinct(id_col).alias("n_docs"))
           .where(F.col("total_count") >= min_count))
    # Default: shuffled join.  The hot-set size is data-dependent (at
    # web scale it can be billions of rows), so the safe plan never
    # FORCES a broadcast; AQE promotes the join to broadcast from
    # runtime stats when the set is genuinely small.  broadcast_hot
    # remains as an explicit opt-in for callers with a known-tiny set.
    hot_side = F.broadcast(hot) if broadcast_hot else hot
    return (grams.join(hot_side, on="gram_hash")
            .select(id_col, "pos", "gram_hash", "n_docs", "total_count"))


def remove_frequent_ngram_spans(docs: DataFrame, id_col: str,
                                text_col: str,
                                tokens_fn: Callable[[str], Column],
                                n: int = 8, min_count: int = 5,
                                hash_fn: Callable[[Column], Column]
                                = md5_hash64) -> DataFrame:
    """The cleaning transform over frequent_ngram_spans: drop every
    token covered by a corpus-frequent n-gram occurrence and return
    (id_col, clean_text, n_tokens_removed) — one row per input
    document (documents with nothing to remove pass through).

    Cost on top of detection: the span list is O(duplicated spans) —
    tiny next to the corpus — so the cover set (span × n positions)
    aggregates into a per-doc covered-position array that joins back
    to the token stream as a LEFT join on the 8-byte id; tokens never
    shuffle with their text twice (the rebuild groups the posexploded
    tokens once).
    """
    spans = frequent_ngram_spans(docs, id_col, text_col, tokens_fn,
                                 n, min_count, hash_fn)
    covered = (spans
               .select(id_col, F.explode(F.sequence(
                   F.col("pos"), F.col("pos") + F.lit(n - 1))).alias("tokpos"))
               .groupBy(id_col)
               .agg(F.collect_set("tokpos").alias("_cov")))
    toks = docs.select(F.col(id_col), tokens_fn(text_col).alias("_toks"))
    joined = toks.join(covered, on=id_col, how="left")
    # keep-positions = [0, n_toks) minus the covered set.  array_except
    # hashes its second argument into a JVM open-address set and
    # streams the first through it — O(tokens + covered) per document,
    # pure codegen, order-preserving.  (This replaces a per-token
    # array_contains probe that was O(tokens x covered): a fully
    # boilerplate 100k-token document cost ~10^10 comparisons in one
    # task.)
    empty = F.array().cast("array<int>")
    all_pos = F.when(F.size("_toks") > 0,
                     F.sequence(F.lit(0), F.size("_toks") - 1)
                     ).otherwise(empty)
    kept_pos = F.array_except(all_pos, F.coalesce(F.col("_cov"), empty))
    # NULL text passes through as NULL (not ''), preserving the
    # no-text / fully-cleaned distinction web-crawl consumers rely on
    return joined.select(
        F.col(id_col),
        F.when(F.col("_toks").isNull(), F.lit(None).cast("string"))
        .otherwise(F.array_join(
            F.transform(kept_pos,
                        lambda p: F.element_at("_toks", p + F.lit(1))),
            " ")).alias("clean_text"),
        F.when(F.col("_toks").isNull(), F.lit(None).cast("long"))
        .otherwise((F.size("_toks") - F.size(kept_pos)).cast("long"))
        .alias("n_tokens_removed"))
