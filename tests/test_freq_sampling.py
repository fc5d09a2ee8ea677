"""Frequent-items + sampling sketch tests (frequencies/LongsSketch tests,
epsilon=3.5/M; sampling/VarOptItemsSketch.java:636 subset sums)."""

import numpy as np
import pytest

from datasketches_java_spark.sketches.frequencies import (
    NO_FALSE_NEGATIVES,
    NO_FALSE_POSITIVES,
    ItemsSketch,
    a_priori_error,
)
from datasketches_java_spark.sketches.sampling import PrioritySample, ReservoirSketch


def zipf_items(n, n_items, seed=42, a=1.1):
    rng = np.random.default_rng(seed)
    return rng.zipf(a, size=n) % n_items


# ---- frequent items -------------------------------------------------------

def test_exact_mode_counts():
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 5
    s = ItemsSketch(max_map_size=64).update_batch(items)
    assert s.is_exact
    assert s.estimate("a") == 50 and s.estimate("b") == 30 and s.estimate("c") == 5
    assert s.estimate("zz") == 0
    top = s.frequent_items(threshold=10)
    assert [t[0] for t in top] == ["a", "b"]


def test_error_bound_under_purge():
    items = zipf_items(200_000, 100_000)
    m = 512
    s = ItemsSketch(max_map_size=m)
    for chunk in np.array_split(items, 20):
        s.update_batch(chunk)
    eps_w = a_priori_error(m, len(items))
    exact = {}
    for it in items:
        exact[it] = exact.get(it, 0) + 1
    for item, c in sorted(exact.items(), key=lambda kv: -kv[1])[:10]:
        lb, ub = s.lower_bound(item), s.upper_bound(item)
        assert lb <= c <= ub
        assert ub - lb <= eps_w


def test_no_false_negatives_vs_positives():
    items = zipf_items(100_000, 50_000)
    s = ItemsSketch(max_map_size=256).update_batch(items)
    exact = {}
    for it in items:
        exact[it] = exact.get(it, 0) + 1
    t = 2000
    nfn = {r[0] for r in s.frequent_items(t, NO_FALSE_NEGATIVES)}
    nfp = {r[0] for r in s.frequent_items(t, NO_FALSE_POSITIVES)}
    truly_frequent = {i for i, c in exact.items() if c >= t}
    assert truly_frequent <= nfn  # no false negatives
    for i in nfp:  # no false positives
        assert exact.get(i, 0) >= t - 0  # lb >= t implies exact >= lb >= t
        assert exact[i] >= t


def test_freq_merge():
    a = ItemsSketch(max_map_size=64).update_batch(["x"] * 40 + ["y"] * 10)
    b = ItemsSketch(max_map_size=64).update_batch(["x"] * 5 + ["z"] * 20)
    a.merge(b)
    assert a.estimate("x") == 45 and a.estimate("z") == 20
    assert a.stream_weight == 75


def test_freq_serde():
    s = ItemsSketch(max_map_size=32).update_batch(["a", "b", "a"])
    r = ItemsSketch.from_bytes(s.to_bytes())
    assert r.counts == s.counts and r.stream_weight == 3


# ---- reservoir -------------------------------------------------------------

def test_reservoir_exact_small():
    r = ReservoirSketch(k=100).update_batch(range(50))
    assert sorted(r.samples) == list(range(50))
    assert r.n == 50


def test_reservoir_uniformity():
    k, n, trials = 20, 1000, 200
    hits = np.zeros(n)
    for t in range(trials):
        r = ReservoirSketch(k=k, _seed=t)
        r.update_batch(range(n))
        for s in r.samples:
            hits[s] += 1
    p = hits / (trials * k / n)
    assert 0.5 < p.mean() < 1.5
    assert (p[:100].mean() - p[-100:].mean()) < 0.5  # no positional bias


def test_reservoir_merge_sizes():
    a = ReservoirSketch(k=50).update_batch(range(1000))
    b = ReservoirSketch(k=50).update_batch(range(1000, 1100))
    a.merge(b)
    assert a.n == 1100 and len(a.samples) == 50
    # ~1/11 of survivors should come from b's range
    frac_b = sum(1 for s in a.samples if s >= 1000) / 50
    assert frac_b < 0.35


# ---- priority sample (VarOpt counterpart) -----------------------------------

def test_priority_exact_mode_subset_sum():
    items = np.arange(100)
    weights = np.linspace(1, 10, 100)
    s = PrioritySample(k=200).update_batch(items, weights)
    r = s.estimate_subset_sum(lambda it: it < 50)
    assert r["estimate"] == pytest.approx(weights[:50].sum())
    assert r["lower_bound"] == r["upper_bound"] == r["estimate"]


def test_priority_subset_sum_unbiased():
    rng = np.random.default_rng(42)
    n = 50_000
    items = np.arange(n)
    weights = rng.pareto(1.5, n) + 0.1
    s = PrioritySample(k=1024)
    for idx in np.array_split(np.arange(n), 10):
        s.update_batch(items[idx], weights[idx])
    true_sum = weights[items % 3 == 0].sum()
    r = s.estimate_subset_sum(lambda it: it % 3 == 0)
    assert abs(r["estimate"] - true_sum) / true_sum < 0.15
    assert r["total_weight"] == pytest.approx(weights.sum())


def test_priority_merge_equals_single():
    rng = np.random.default_rng(1)
    items = np.arange(20_000)
    weights = rng.exponential(2.0, 20_000)
    single = PrioritySample(k=512).update_batch(items, weights)
    a = PrioritySample(k=512).update_batch(items[:10_000], weights[:10_000])
    b = PrioritySample(k=512).update_batch(items[10_000:], weights[10_000:])
    merged = a.merge(b)
    # deterministic priorities -> identical retained sets
    assert np.array_equal(np.sort(merged.items), np.sort(single.items))
    assert merged.tau == pytest.approx(single.tau)


def test_priority_serde():
    s = PrioritySample(k=64).update_batch(np.arange(1000), np.ones(1000))
    r = PrioritySample.from_bytes(s.to_bytes())
    assert r.n == s.n and np.array_equal(r.items, s.items)
