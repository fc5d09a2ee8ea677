"""KLL quantile accuracy — rank error within 2.296/k^0.9723
(kll/KllHelper.java:104-107), exact mode exactness, merge correctness
(kll/KllDoublesValidationTest pattern), KS test."""

import numpy as np

from datasketches_java_spark.sketches.kll import (
    KllDoublesSketch,
    ks_statistic,
    ks_test,
    rank_error,
)


def test_exact_mode_order_statistics():
    xs = np.arange(100, dtype=np.float64)
    s = KllDoublesSketch.new(k=200).update_batch(xs)
    assert s._total_retained() == 100  # no compaction yet
    assert s.quantile(0.5) == 49.0  # smallest item with cum weight >= 50
    assert s.quantile(0.0) == 0.0
    assert s.quantile(1.0) == 99.0
    assert s.min_value == 0.0 and s.max_value == 99.0


def test_rank_error_uniform():
    rng = np.random.default_rng(42)
    xs = rng.uniform(0, 1, 100_000)
    s = KllDoublesSketch.new(k=200).update_batch(xs)
    eps = rank_error(200)  # ~1.65%
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        v = s.quantile(q)
        true_rank = (xs <= v).mean()
        assert abs(true_rank - q) < 2 * eps, (q, true_rank)


def test_rank_error_lognormal_with_point_masses():
    rng = np.random.default_rng(7)
    xs = np.concatenate([rng.lognormal(0, 2, 50_000),
                         np.full(20_000, 3.25)])
    s = KllDoublesSketch.new(k=200).update_batch(xs)
    eps = rank_error(200)
    for q in (0.1, 0.5, 0.9):
        v = s.quantile(q)
        true_rank = (xs <= v).mean()
        assert abs(true_rank - q) < 3 * eps


def test_merge_matches_single_stream_accuracy():
    rng = np.random.default_rng(3)
    xs = rng.normal(0, 1, 80_000)
    parts = np.array_split(xs, 16)
    merged = KllDoublesSketch.new(k=200)
    for p in parts:
        merged.merge(KllDoublesSketch.new(k=200).update_batch(p))
    assert merged.n == 80_000
    eps = rank_error(200)
    for q in (0.25, 0.5, 0.75):
        v = merged.quantile(q)
        true_rank = (xs <= v).mean()
        assert abs(true_rank - q) < 3 * eps


def test_rank_and_cdf():
    xs = np.arange(1000, dtype=np.float64)
    s = KllDoublesSketch.new(k=2000).update_batch(xs)
    assert s.rank(499.0) == 0.5
    pmf = s.pmf([250.0, 750.0])
    assert abs(pmf[0] - 0.251) < 0.002 and abs(pmf[1] - 0.5) < 0.002


def test_serde_roundtrip():
    rng = np.random.default_rng(11)
    s = KllDoublesSketch.new(k=200).update_batch(rng.normal(size=50_000))
    r = KllDoublesSketch.from_bytes(s.to_bytes())
    assert r.n == s.n and r.k == s.k
    for q in (0.1, 0.5, 0.9):
        assert r.quantile(q) == s.quantile(q)


def test_ks_same_vs_shifted():
    rng = np.random.default_rng(5)
    a = KllDoublesSketch.new(k=200).update_batch(rng.normal(0, 1, 50_000))
    b = KllDoublesSketch.new(k=200).update_batch(rng.normal(0, 1, 50_000))
    c = KllDoublesSketch.new(k=200).update_batch(rng.normal(1.0, 1, 50_000))
    assert not ks_test(a, b)  # same distribution
    assert ks_test(a, c)  # shifted by 1 sigma
    assert ks_statistic(a, c) > ks_statistic(a, b)
