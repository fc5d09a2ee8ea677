"""Generic-item KLL (longs + strings): exact-mode order statistics,
partition-parallel merge, estimation-mode rank-error envelope, serde.
Counterparts: kll/KllLongsSketch, quantiles/ItemsSketch.java:70."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_java_spark.sketches.kll_items import (
    KllItemsSketch, rank_error)

RANKS = [0.1, 0.25, 0.5, 0.75, 0.9]


def _exact_inclusive(sorted_vals, rank):
    """Smallest item whose cumulative count >= rank*n."""
    n = len(sorted_vals)
    idx = int(np.ceil(rank * n)) - 1
    return sorted_vals[max(idx, 0)]


def test_longs_exact_mode_order_statistics():
    rng = np.random.default_rng(7)
    xs = rng.integers(-10**12, 10**12, size=3000).astype(np.int64)
    sk = KllItemsSketch.new(k=4096, dtype="long").update_batch(xs)
    assert sk.n == 3000
    srt = np.sort(xs)
    for r in RANKS:
        assert sk.quantile(r) == _exact_inclusive(srt, r)
    assert sk.min_item == srt[0] and sk.max_item == srt[-1]


def test_longs_partition_merge_exact():
    xs = np.arange(10000, dtype=np.int64)
    np.random.default_rng(3).shuffle(xs)
    merged = KllItemsSketch.new(k=16384, dtype="long")
    for part in np.array_split(xs, 16):
        merged.merge(
            KllItemsSketch.new(k=16384, dtype="long").update_batch(part))
    srt = np.sort(xs)
    for r in RANKS:
        assert merged.quantile(r) == _exact_inclusive(srt, r)


def test_longs_estimation_mode_error_envelope():
    n = 200_000
    xs = np.arange(n, dtype=np.int64)
    np.random.default_rng(11).shuffle(xs)
    k = 200
    merged = KllItemsSketch.new(k=k, dtype="long")
    for part in np.array_split(xs, 8):
        merged.merge(KllItemsSketch.new(k=k, dtype="long").update_batch(part))
    eps = rank_error(k)
    for r in RANKS:
        q = merged.quantile(r)
        true_rank = (q + 1) / n
        assert abs(true_rank - r) < 3 * eps  # 3x single-sided envelope


def test_strings_exact_mode_lexicographic():
    rng = np.random.default_rng(5)
    words = np.asarray(
        ["".join(chr(97 + c) for c in rng.integers(0, 26, size=8))
         for _ in range(2000)], dtype=object)
    sk = KllItemsSketch.new(k=4096, dtype="string").update_batch(words)
    srt = np.sort(words)
    for r in RANKS:
        assert sk.quantile(r) == _exact_inclusive(srt, r)
    assert sk.rank(srt[999]) == pytest.approx(1000 / 2000)


def test_strings_merge_and_serde_roundtrip():
    a = KllItemsSketch.new(k=1024, dtype="string").update_batch(
        np.asarray([f"a{i:05d}" for i in range(500)], dtype=object))
    b = KllItemsSketch.new(k=1024, dtype="string").update_batch(
        np.asarray([f"b{i:05d}" for i in range(500)], dtype=object))
    a.merge(b)
    back = KllItemsSketch.from_bytes(a.to_bytes())
    assert back.n == 1000
    assert back.quantile(0.25) == a.quantile(0.25)
    assert back.quantile(0.75).startswith("b")
    assert back.min_item == "a00000" and back.max_item == "b00499"


def test_long_serde_roundtrip_estimating():
    xs = np.random.default_rng(2).integers(0, 10**9, size=50_000)
    sk = KllItemsSketch.new(k=200, dtype="long").update_batch(
        xs.astype(np.int64))
    back = KllItemsSketch.from_bytes(sk.to_bytes())
    assert back.n == sk.n and back.k == sk.k
    for r in RANKS:
        assert back.quantile(r) == sk.quantile(r)


def test_dtype_mismatch_rejected():
    a = KllItemsSketch.new(dtype="long")
    b = KllItemsSketch.new(dtype="string").update_batch(
        np.asarray(["x"], dtype=object))
    with pytest.raises(ValueError, match="dtype mismatch"):
        a.merge(b)


def test_spark_agg_longs_and_strings(spark):
    from pyspark.sql import functions as F

    from datasketches_java_spark.functions.sketch_aggs import (
        kll_items_quantiles, kll_items_sketch_agg)

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 10**6, size=4000).tolist()
    df = spark.createDataFrame([(int(v), f"s{v:07d}") for v in vals],
                               ["v", "s"])
    lsk = kll_items_sketch_agg(df, "v", k=8192, dtype="long")
    got = lsk.select(kll_items_quantiles([0.5], "long")("kll_items_sketch")
                     .alias("q")).head()[0][0]
    srt = np.sort(np.asarray(vals))
    assert got == _exact_inclusive(srt, 0.5)

    ssk = kll_items_sketch_agg(df, "s", k=8192, dtype="string")
    gots = ssk.select(kll_items_quantiles([0.5], "string")("kll_items_sketch")
                      .alias("q")).head()[0][0]
    assert gots == f"s{_exact_inclusive(srt, 0.5):07d}"
