"""Production-hash equivalence guards.

Two operators use an md5-derived 64-bit hash so their driver queries
stay DuckDB-oracle-expressible, with docstrings claiming "swap in
xxhash64 for production with the identical plan".  These tests pin
that the claim is actually true:

- ngram spans: the hash only *names* grams, so every hash-independent
  output column must be IDENTICAL under either hash, and the cleaning
  transform (no hash in its output) must be bit-identical.
- winnowing: fingerprint VALUES are hash-dependent by construction,
  but the operator's guarantee — any shared run of >= window k-grams
  yields a shared fingerprint — must hold under either hash, and the
  plan shape must not change.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datasketches_java_spark.functions.text import shingles, tokens
from datasketches_java_spark.operators.ngram_spans import (
    frequent_ngram_spans, md5_hash64, remove_frequent_ngram_spans)


def _node_counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {node: plan.count(node)
            for node in ("HashAggregate", "Exchange", "Join", "Generate",
                         "Project")}


def _corpus(spark):
    boiler = "all rights reserved click here to subscribe now today"
    return spark.createDataFrame(
        [(1, f"alpha beta gamma {boiler} delta"),
         (2, f"epsilon zeta {boiler} eta theta"),
         (3, f"{boiler} iota kappa"),
         (4, "totally unique words appearing exactly once here friends"),
         (5, ("repeat me repeat me repeat me repeat me repeat me "
              "repeat me repeat me repeat me repeat me"))],
        "doc_id long, text string")


def test_ngram_spans_hash_invariant_columns(spark):
    docs = _corpus(spark)
    outs = {}
    for name, fn in (("md5", md5_hash64), ("xxh", F.xxhash64)):
        df = frequent_ngram_spans(docs, "doc_id", "text", tokens,
                                  n=8, min_count=3, hash_fn=fn)
        outs[name] = sorted(
            (r.doc_id, r.pos, r.n_docs, r.total_count)
            for r in df.collect())
    assert outs["md5"] == outs["xxh"] and outs["md5"], \
        "hash choice leaked into hash-independent span columns"


def test_remove_spans_identical_under_either_hash(spark):
    docs = _corpus(spark)
    res = {}
    for name, fn in (("md5", md5_hash64), ("xxh", F.xxhash64)):
        res[name] = sorted(
            tuple(r) for r in remove_frequent_ngram_spans(
                docs, "doc_id", "text", tokens,
                n=8, min_count=3, hash_fn=fn).collect())
    assert res["md5"] == res["xxh"]


def test_ngram_spans_same_plan_shape(spark):
    docs = _corpus(spark)
    shapes = [
        _node_counts(frequent_ngram_spans(
            docs, "doc_id", "text", tokens, n=8, min_count=3, hash_fn=fn))
        for fn in (md5_hash64, F.xxhash64)]
    assert shapes[0] == shapes[1], \
        f"plan shape changed with the hash swap: {shapes}"


def _winnow(spark, docs, hash_fn):
    """The driver winnowing query's structure with the hash pluggable
    (mirrors __spark_entry__._q_winnow_fingerprints_documents)."""
    from datasketches_java_spark.functions.minhash import (
        winnow_fingerprints)
    grams = docs.select("doc_id", shingles(tokens("text"), w=3).alias("g"))
    hashes = F.transform(F.col("g"), lambda g: hash_fn(g))
    return (grams.select("doc_id", hashes.alias("hs"))
            .select("doc_id",
                    F.explode(winnow_fingerprints("hs"))
                    .alias("fingerprint")))


def test_winnow_shared_run_guarantee_under_either_hash(spark):
    """Schleimer guarantee: docs sharing a run of >= window k-grams
    share >= 1 fingerprint, whatever 64-bit hash names the grams.
    Disjoint docs share none (64-bit hashes, tiny fixture)."""
    shared = ("the quick brown fox jumps over the lazy dog while "
              "seven wizards brew strong coffee at midnight exactly")
    docs = spark.createDataFrame(
        [(1, f"intro words first {shared} tail one"),
         (2, f"other opening here {shared} different ending"),
         (3, "completely unrelated vocabulary nothing matches at all "
             "in this quite separate document body text")],
        "doc_id long, text string")
    for hash_fn in (lambda g: F.conv(F.substring(F.md5(g), 1, 15),
                                     16, 10).cast("long"),
                    F.xxhash64):
        fp = {}
        for r in _winnow(spark, docs, hash_fn).collect():
            fp.setdefault(r.doc_id, set()).add(r.fingerprint)
        assert fp[1] & fp[2], "shared run produced no shared fingerprint"
        assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])


def test_winnow_same_plan_shape(spark):
    docs = _corpus(spark)
    md5fn = lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10) \
        .cast("long")  # noqa: E731
    shapes = [_node_counts(_winnow(spark, docs, fn))
              for fn in (md5fn, F.xxhash64)]
    assert shapes[0] == shapes[1]
