"""Corpus-level frequent n-gram span detection
(operators/ngram_spans.py — the Lee-et-al substring-dedup pre-pass)."""

from __future__ import annotations

from datasketches_java_spark.functions.text import tokens
from datasketches_java_spark.operators.ngram_spans import (
    frequent_ngram_spans)


def test_boilerplate_vs_within_doc_repetition(spark):
    boiler = "all rights reserved click here to subscribe now today"
    docs = spark.createDataFrame(
        [(1, f"alpha beta gamma {boiler} delta"),
         (2, f"epsilon zeta {boiler} eta theta"),
         (3, f"{boiler} iota"),
         (4, "totally unique words only appearing once here friends"),
         (5, ("repeat me repeat me repeat me repeat me repeat me "
              "repeat me repeat me repeat me repeat me")),
        ], "doc_id long, text string")
    out = frequent_ngram_spans(docs, "doc_id", "text", tokens,
                               n=8, min_count=3).collect()
    assert out, "no spans found"
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # the 9-token boilerplate has two 8-gram positions in docs 1-3
    assert set(by_doc) >= {1, 2, 3}
    assert 4 not in by_doc
    for d in (1, 2, 3):
        assert len(by_doc[d]) == 2
        assert all(r.n_docs == 3 and r.total_count == 3 for r in by_doc[d])
    # doc 5's within-doc repetition: "repeat me"*9 = 18 tokens,
    # 11 8-gram positions, only 2 distinct grams, each in ONE doc
    if 5 in by_doc:
        assert all(r.n_docs == 1 for r in by_doc[5])
    # positions are 0-based token offsets of the gram start
    d1 = sorted(r.pos for r in by_doc[1])
    assert d1 == [3, 4]   # "alpha beta gamma" = 3 tokens before boiler


def test_short_docs_produce_no_spans(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "too short"), (3, "too short")],
        "doc_id long, text string")
    assert frequent_ngram_spans(docs, "doc_id", "text", tokens,
                                n=8, min_count=2).count() == 0


def test_remove_spans_edits_text(spark):
    from datasketches_java_spark.operators.ngram_spans import (
        remove_frequent_ngram_spans)
    boiler = "all rights reserved click here to subscribe now"  # 8 tokens
    docs = spark.createDataFrame(
        [(1, f"alpha beta {boiler} gamma"),
         (2, f"{boiler} delta epsilon"),
         (3, f"zeta {boiler}"),
         (4, "unique text with no shared grams at all"),
        ], "doc_id long, text string")
    out = {r.doc_id: r for r in remove_frequent_ngram_spans(
        docs, "doc_id", "text", tokens, n=8, min_count=3).collect()}
    assert len(out) == 4                       # one row per input doc
    assert out[1].clean_text == "alpha beta gamma"
    assert out[2].clean_text == "delta epsilon"
    assert out[3].clean_text == "zeta"
    assert out[4].clean_text == "unique text with no shared grams at all"
    assert out[1].n_tokens_removed == 8
    assert out[4].n_tokens_removed == 0


def test_remove_spans_fully_covered_doc(spark):
    """Pathological case the round-4 probe was quadratic on: a document
    whose EVERY token is covered by a corpus-frequent gram.  The
    array_except keep-position path is O(tokens + covered) per doc, so
    this must both (a) return an empty clean_text with all tokens
    counted removed and (b) complete fast even at thousands of
    tokens."""
    from datasketches_java_spark.operators.ngram_spans import (
        remove_frequent_ngram_spans)
    # 4000 tokens of a cycling 8-word phrase: every 8-gram window is
    # one of 8 rotations, each occurring ~500 times -> total cover
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    big = " ".join(words[i % 8] for i in range(4000))
    docs = spark.createDataFrame(
        [(1, big), (2, "some unrelated words that repeat nothing")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in remove_frequent_ngram_spans(
        docs, "doc_id", "text", tokens, n=8, min_count=5).collect()}
    assert out[1].clean_text == ""
    assert out[1].n_tokens_removed == 4000
    assert out[2].n_tokens_removed == 0


def test_empty_doc_passthrough(spark):
    """Zero-token documents survive the sequence()/array_except path
    (sequence(0, -1) would otherwise produce [0, -1])."""
    from datasketches_java_spark.operators.ngram_spans import (
        remove_frequent_ngram_spans)
    boiler = "all rights reserved click here to subscribe now"
    docs = spark.createDataFrame(
        [(1, ""), (2, f"x {boiler}"), (3, f"y {boiler}"), (4, f"z {boiler}")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in remove_frequent_ngram_spans(
        docs, "doc_id", "text", tokens, n=8, min_count=3).collect()}
    assert out[1].clean_text == ""
    assert out[1].n_tokens_removed == 0
    assert out[2].clean_text == "x"


def test_null_text_passes_through_as_null(spark):
    """Round-5 review fix: NULL text stays NULL (not ''), preserving
    the no-text vs fully-cleaned distinction."""
    from datasketches_java_spark.operators.ngram_spans import (
        remove_frequent_ngram_spans)
    boiler = "all rights reserved click here to subscribe now"
    docs = spark.createDataFrame(
        [(1, None), (2, f"x {boiler}"), (3, f"y {boiler}"),
         (4, f"z {boiler}")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in remove_frequent_ngram_spans(
        docs, "doc_id", "text", tokens, n=8, min_count=3).collect()}
    assert out[1].clean_text is None
    assert out[1].n_tokens_removed is None
    assert out[2].clean_text == "x"
