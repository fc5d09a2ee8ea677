"""Merging-validation sweeps — the cpc/MergingValidation.java:40
pattern (sweep config × stream length, assert the merged sketch equals
or error-matches the stream-order sketch) applied to every family this
engine ships.

For theta and HLL the assertion is BIT-EXACT state equality: both are
order-insensitive deterministic folds (sorted-k-smallest-hashes /
register-max), so partition-parallel union must reproduce the
single-stream state exactly — the strongest possible merge-correctness
property, and precisely what makes Spark's nondeterministic partition
order safe (SURVEY.md §4 merge-safe estimator discipline).
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_java_spark.sketches import hll, theta
from datasketches_java_spark.sketches.frequencies import ItemsSketch
from datasketches_java_spark.sketches.kll import KllDoublesSketch


def _stream(n: int, seed: int, dup_frac: float = 0.3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    uniq = rng.integers(0, 1 << 50, n)
    dups = rng.choice(uniq, int(n * dup_frac))
    out = np.concatenate([uniq, dups])
    rng.shuffle(out)
    return out


@pytest.mark.parametrize("lg_k", [6, 9, 12])
@pytest.mark.parametrize("n", [100, 10_000, 300_000])
@pytest.mark.parametrize("splits", [2, 7])
def test_theta_merge_equals_stream_order(lg_k, n, splits):
    vals = _stream(n, seed=lg_k * 1000 + n + splits)
    direct = theta.sketch_longs(vals, lg_k)
    parts = [theta.sketch_longs(c, lg_k)
             for c in np.array_split(vals, splits)]
    merged = theta.union_many(parts)
    assert merged.theta == direct.theta
    assert np.array_equal(merged.hashes, direct.hashes)
    # pairwise fold in reversed order — associativity + commutativity
    folded = parts[-1]
    for p in reversed(parts[:-1]):
        folded = theta.union(folded, p)
    assert folded.theta == direct.theta
    assert np.array_equal(folded.hashes, direct.hashes)


@pytest.mark.parametrize("lg_k", [8, 12])
@pytest.mark.parametrize("n", [1_000, 200_000])
@pytest.mark.parametrize("splits", [3, 8])
def test_hll_merge_equals_stream_order(lg_k, n, splits):
    vals = _stream(n, seed=lg_k * 77 + n + splits)
    direct = hll.sketch_longs(vals, lg_k)
    parts = [hll.sketch_longs(c, lg_k) for c in np.array_split(vals, splits)]
    merged = hll.union_many(parts)
    assert np.array_equal(merged.regs, direct.regs)
    assert merged.estimate() == direct.estimate()


@pytest.mark.parametrize("k", [200, 800])
@pytest.mark.parametrize("n", [5_000, 150_000])
def test_kll_merge_within_rank_error_of_stream_order(k, n):
    """KLL compaction paths differ between merge and stream build, so
    the contract is the analytic rank-error envelope, not bit
    equality (kll/KllDoublesValidationTest pattern)."""
    from datasketches_java_spark.sketches.kll import rank_error
    rng = np.random.default_rng(k + n)
    vals = rng.standard_normal(n)
    merged = KllDoublesSketch.new(k)
    for c in np.array_split(vals, 6):
        merged.merge(KllDoublesSketch.new(k).update_batch(c))
    s = np.sort(vals)
    eps = 2 * rank_error(k)  # merge adds one compaction generation
    for q in [0.1, 0.25, 0.5, 0.75, 0.9]:
        got = merged.quantile(q)
        true_rank = np.searchsorted(s, got, side="right") / n
        assert abs(true_rank - q) <= eps + 1e-9
    assert merged.n == n
    assert merged.min_value == s[0] and merged.max_value == s[-1]


@pytest.mark.parametrize("max_map", [256, 1024])
def test_freq_merge_exact_mode_equals_counts(max_map):
    rng = np.random.default_rng(max_map)
    items = rng.integers(0, max_map // 4, 20_000)  # below purge
    merged = None
    for c in np.array_split(items, 5):
        part = ItemsSketch(max_map).update_batch([int(x) for x in c])
        merged = part if merged is None else merged.merge(part)
    import collections
    want = collections.Counter(int(x) for x in items)
    got = {int(i): e for i, e, _, _ in merged.frequent_items(0)}
    assert got == dict(want)


def test_tuple_merge_hash_space_matches_theta():
    """Tuple and theta share the update-hash space, so a tuple union's
    retained keys must equal the theta union's retained hashes on the
    same data at the same lgK (tuple/Union.java:124 interop basis)."""
    from datasketches_java_spark.sketches import tuple as tpl
    vals = _stream(50_000, seed=9)
    parts = np.array_split(vals, 4)
    t_merged = theta.union_many([theta.sketch_longs(c, 10) for c in parts])
    p_merged = tpl.union_many([
        tpl.sketch_keyed_values(c, np.ones(len(c)), lg_k=10) for c in parts])
    assert p_merged.theta == t_merged.theta
    assert np.array_equal(p_merged.hashes, t_merged.hashes)


def test_theta_serde_transparent_to_merge():
    """Round-tripping every partial through BOTH wire formats (engine
    + reference serVer-3) before union changes nothing — the
    cross-process merge path of SURVEY §3.2."""
    from datasketches_java_spark.sketches.theta_serde import (
        from_java_bytes, to_java_bytes)
    vals = _stream(80_000, seed=4)
    parts = [theta.sketch_longs(c, 11) for c in np.array_split(vals, 5)]
    direct = theta.union_many(parts)
    via_wire = theta.union_many([
        from_java_bytes(to_java_bytes(
            theta.ThetaSketch.from_bytes(p.to_bytes())), lg_k=11)
        for p in parts])
    assert via_wire.theta == direct.theta
    assert np.array_equal(via_wire.hashes, direct.hashes)


# -- round-3 families: generic-item KLL and true VarOpt ---------------------

@pytest.mark.parametrize("k", [200, 1024])
@pytest.mark.parametrize("n", [3_000, 120_000])
@pytest.mark.parametrize("splits", [2, 9])
def test_kll_items_longs_merge_within_rank_error(k, n, splits):
    """Merged generic-item sketch answers within the analytic rank
    error of truth, like the doubles validation above."""
    from datasketches_java_spark.sketches.kll_items import (
        KllItemsSketch, rank_error)
    xs = np.arange(n, dtype=np.int64)
    np.random.default_rng(n + splits).shuffle(xs)
    merged = KllItemsSketch.new(k=k, dtype="long")
    for part in np.array_split(xs, splits):
        merged.merge(KllItemsSketch.new(k=k, dtype="long").update_batch(part))
    assert merged.n == n
    eps = rank_error(k)
    for r in (0.05, 0.25, 0.5, 0.75, 0.95):
        q = merged.quantile(r)
        assert abs((q + 1) / n - r) < 3 * eps


@pytest.mark.parametrize("splits", [2, 5, 16])
def test_kll_items_merge_order_insensitive_n_and_extremes(splits):
    from datasketches_java_spark.sketches.kll_items import KllItemsSketch
    words = np.asarray([f"w{i:06d}" for i in range(20_000)], dtype=object)
    np.random.default_rng(splits).shuffle(words)
    parts = [KllItemsSketch.new(k=256, dtype="string").update_batch(p)
             for p in np.array_split(words, splits)]
    fwd = KllItemsSketch.new(k=256, dtype="string")
    for p in parts:
        fwd.merge(p)
    assert fwd.n == 20_000
    assert fwd.min_item == "w000000" and fwd.max_item == "w019999"


@pytest.mark.parametrize("k", [64, 512])
@pytest.mark.parametrize("splits", [2, 8])
def test_varopt_union_weight_preservation_sweep(k, splits):
    """Union of arbitrary splits preserves total weight exactly and
    keeps the two-region invariant (every H weight >= result tau) —
    the merge-correctness core of VarOptItemsUnionTest."""
    from datasketches_java_spark.sketches.varopt import (
        VarOptSketch, VarOptUnion)
    rng = np.random.default_rng(k + splits)
    n = 5_000
    weights = rng.exponential(3.0, n) + 0.01
    u = VarOptUnion(k)
    for idx in np.array_split(np.arange(n), splits):
        sk = VarOptSketch(k).update_batch(idx, weights[idx])
        u.update(sk)
    res = u.get_result()
    assert res.n == n
    assert abs(res.total_weight() / weights.sum() - 1.0) < 1e-9
    assert res.num_samples() <= k
    tau = res.tau()
    assert all(e[0] >= tau - 1e-12 for e in res.heap)


def test_varopt_subset_sum_unbiased_across_seeds():
    """HT-estimator unbiasedness, empirically: the mean subset-sum
    estimate over many independent sketches converges to truth
    (within 3 standard errors)."""
    from datasketches_java_spark.sketches.varopt import VarOptSketch
    n, k, reps = 4_000, 128, 40
    rng = np.random.default_rng(99)
    weights = rng.exponential(1.0, n) + 0.01
    truth = float(weights[np.arange(n) % 7 == 0].sum())
    ests = []
    for rep in range(reps):
        sk = VarOptSketch(k, seed=1000 + rep)
        order = rng.permutation(n)
        sk.update_batch(order, weights[order])
        ests.append(sk.estimate_subset_sum(
            lambda it: it % 7 == 0)["estimate"])
    ests = np.asarray(ests)
    se = ests.std(ddof=1) / np.sqrt(reps)
    assert abs(ests.mean() - truth) < 3 * se + 1e-9
