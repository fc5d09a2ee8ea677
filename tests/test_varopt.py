"""True-VarOpt tests mirroring the reference's own assertions
(sampling/VarOptItemsSketchTest.java, VarOptItemsUnionTest.java):
exact heavy region under skewed weights, cumulative-weight
preservation, pseudo-light/heavy tau arithmetic, decreaseK, and the
marked-item union."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_java_spark.sketches.varopt import VarOptSketch, VarOptUnion

EPS = 1e-10


def _unweighted(k: int, n: int) -> VarOptSketch:
    sk = VarOptSketch(k)
    for i in range(n):
        sk.update(i, 1.0)
    return sk


def test_invalid_inputs():
    with pytest.raises(ValueError, match="at least 1"):
        VarOptSketch(0)
    sk = VarOptSketch(4)
    with pytest.raises(ValueError, match="strictly positive"):
        sk.update(1, 0.0)
    sk.update(None, 5.0)  # nulls ignored, like the reference
    assert sk.n == 0


def test_cumulative_weight_preserved():
    """VarOptItemsSketchTest.checkCumulativeWeight: weights spanning
    ~10 orders of magnitude; Σ sample weights == Σ input weights."""
    k, n = 256, 2560
    rng = np.random.default_rng(31)
    sk = VarOptSketch(k)
    input_sum = 0.0
    for i in range(n):
        w = float(np.exp(5 * rng.standard_normal()))
        input_sum += w
        sk.update(i, w)
    _, weights = sk.samples()
    assert abs(weights.sum() / input_sum - 1.0) < EPS
    assert abs(sk.total_weight() / input_sum - 1.0) < EPS


def test_exact_heavy_region_under_skewed_weights():
    """VarOptItemsSketchTest.checkFullSketchSerialization: after k unit
    items plus two heavy ones, the heavy items sit in H with EXACT
    weights, heap-ordered smallest at root."""
    sk = VarOptSketch(32)
    for i in range(32):
        sk.update(i, 1.0)
    sk.update(100, 100.0)
    sk.update(101, 101.0)
    assert sk.num_samples() == 32
    items, weights = sk.samples()
    assert weights[0] == 100.0 and items[0] == 100
    assert weights[1] == 101.0 and items[1] == 101
    # every H weight >= tau (the two-region invariant)
    assert all(w >= sk.tau() - EPS for w in weights[:sk.h_count])


def test_pseudo_light_update():
    """checkPseudoLightUpdate: k+2 unit updates -> R weight (k+2)/k."""
    k = 1024
    sk = _unweighted(k, k + 1)
    sk.update(0, 1.0)
    _, weights = sk.samples()
    assert abs(weights[0] - (k + 2) / k) < EPS


def test_pseudo_heavy_updates():
    """checkPseudoHeavyUpdates: k-1 heavyGeneral updates then one
    heavyREq1; expected root and tau values are exact arithmetic."""
    k = 1024
    wt_scale = 10.0 * k
    sk = VarOptSketch(k)
    for i in range(k + 1):
        sk.update(i, 1.0)
    for i in range(1, k + 1):
        sk.update(-i, k + i * wt_scale)
    _, weights = sk.samples()
    # last slot = the single R item at tau = ((k+1) + (k+wtScale)) / 1
    assert abs(weights[k - 1] - (wt_scale + 2 * k + 1)) < EPS
    # heap root = 2nd lightest heavy = k + 2*wtScale
    assert abs(weights[0] - (k + 2 * wt_scale)) < EPS


def test_decrease_k_underfull_and_full():
    """checkDecreaseKWithUnderfullSketch shape: exact-mode k decrement
    is free until h > k, then the sketch transitions to estimation."""
    sk = _unweighted(5, 3)
    assert sk.k == 5
    sk.decrease_k_by_1()
    assert sk.k == 4 and sk.r_count == 0 and sk.total_wt_r == 0.0
    sk.decrease_k_by_1()  # k=3 == h -> still exact
    assert sk.k == 3 and sk.r_count == 0
    sk.decrease_k_by_1()  # h(3) > k(2) -> transition
    assert sk.k == 2
    assert sk.h_count + sk.r_count == sk.k
    assert sk.r_count >= 1
    assert abs(sk.total_weight() - 3.0) < EPS  # weight preserved


def test_subset_sum_exact_mode():
    sk = VarOptSketch(100)
    for i in range(50):
        sk.update(i, float(i + 1))
    res = sk.estimate_subset_sum(lambda it: it % 2 == 0)
    exact = sum(i + 1 for i in range(50) if i % 2 == 0)
    assert res["estimate"] == res["lower_bound"] == res["upper_bound"] == exact


def test_subset_sum_estimation_unbiased_and_bounded():
    """HT-estimator sanity: estimate within bounds, bounds bracket the
    truth for a smooth predicate, total weight preserved."""
    n, k = 20000, 256
    rng = np.random.default_rng(17)
    weights = rng.exponential(10.0, n)
    sk = VarOptSketch(k)
    for i in range(n):
        sk.update(i, float(weights[i]))
    truth = float(weights[np.arange(n) % 3 == 0].sum())
    res = sk.estimate_subset_sum(lambda it: it % 3 == 0)
    assert res["lower_bound"] <= res["estimate"] <= res["upper_bound"]
    assert abs(res["estimate"] - truth) / truth < 0.25
    assert abs(res["total_weight"] - weights.sum()) < 1e-6 * weights.sum()


def test_union_exact_inputs_stays_exact():
    a = VarOptSketch(128)
    b = VarOptSketch(128)
    for i in range(50):
        a.update(i, float(i + 1))
        b.update(1000 + i, 2.0)
    u = VarOptUnion(128)
    u.update(a)
    u.update(b)
    res = u.get_result()
    assert res.n == 100
    assert res.r_count == 0  # 100 items fit in k=128: still exact
    s = res.estimate_subset_sum(lambda it: it >= 1000)
    assert s["estimate"] == 100.0


def test_union_marked_items_migrate_to_reservoir():
    """The union core contract (VarOptItemsUnion.java:205): R items of
    estimation-mode inputs enter marked and MUST end in the result's
    reservoir; H items may stay exact.  Total weight is preserved."""
    k = 64
    a = VarOptSketch(k)
    rng = np.random.default_rng(5)
    wa = rng.exponential(5.0, 1000)
    for i in range(1000):
        a.update(i, float(wa[i]))
    assert a.r_count > 0  # estimation mode
    b = VarOptSketch(k)
    wb = rng.exponential(5.0, 800)
    for i in range(800):
        b.update(10_000 + i, float(wb[i]))
    u = VarOptUnion(k)
    u.update(a)
    u.update(b)
    res = u.get_result()
    assert res.num_marks_in_h == 0
    assert res.n == 1800
    assert res.num_samples() <= k
    assert res.r_count > 0
    total = float(wa.sum() + wb.sum())
    assert abs(res.total_weight() / total - 1.0) < EPS
    # two-region invariant in the result
    assert all(e[0] >= res.tau() - EPS for e in res.heap)


def test_union_heavy_items_survive_exactly():
    """Heavy outliers from both sides keep exact weights through the
    union (the behavior a migrating user notices first)."""
    k = 32
    a = _unweighted(k, 200)
    a.update(7777, 1e6)
    b = _unweighted(k, 200)
    b.update(8888, 2e6)
    u = VarOptUnion(k)
    u.update(a)
    u.update(b)
    res = u.get_result()
    items, weights = res.samples()
    hw = {it: w for it, w in zip(items[:res.h_count],
                                 weights[:res.h_count])}
    assert hw[7777] == 1e6
    assert hw[8888] == 2e6


def test_serde_roundtrip():
    sk = VarOptSketch(64)
    rng = np.random.default_rng(3)
    for i in range(500):
        sk.update(i, float(rng.exponential(2.0) + 0.1))
    back = VarOptSketch.from_bytes(sk.to_bytes())
    assert back.n == sk.n and back.k == sk.k
    ia, wa = sk.samples()
    ib, wb = back.samples()
    assert ia == ib and np.allclose(wa, wb)


def test_deterministic_replay():
    def build():
        sk = VarOptSketch(32)
        for i in range(1000):
            sk.update(i, float((i % 17) + 1))
        return sk
    x, y = build(), build()
    assert x.samples()[0] == y.samples()[0]
    assert np.array_equal(x.samples()[1], y.samples()[1])


def test_spark_agg_exact_mode(spark):
    from pyspark.sql import functions as F

    from datasketches_java_spark.functions.sketch_aggs import (
        varopt_sketch_agg, varopt_true_subset_sum)

    df = spark.createDataFrame(
        [(i, float((i % 13) + 1)) for i in range(800)], ["item", "w"])
    sk = varopt_sketch_agg(df, "item", "w", k=2048)
    got = sk.select(varopt_true_subset_sum(lambda it: it % 2 == 0)
                    ("varopt_sketch").alias("s")).head()[0]
    exact = df.filter(F.col("item") % 2 == 0).agg(F.sum("w")).head()[0]
    assert got == pytest.approx(exact)
