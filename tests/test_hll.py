"""HLL accuracy + merge tests (mirrors hll/CrossCountingTest.java pattern
and the RSE envelope of hll/RelativeErrorTables.java:36)."""

import numpy as np

from datasketches_java_spark.sketches import hll


def test_small_n_linear_counting_near_exact():
    s = hll.sketch_longs(np.arange(100))
    assert abs(s.estimate() - 100) <= 2


def test_rse_envelope_lgk12():
    # RSE at lgK=12 ~ 1.04/sqrt(4096) = 1.6%; assert 3 sigma
    for n in (10_000, 100_000, 1_000_000):
        s = hll.sketch_longs(np.arange(n), lg_k=12)
        assert abs(s.estimate() - n) / n < 3 * 1.04 / 64, n


def test_duplicates_ignored():
    s = hll.sketch_longs(np.concatenate([np.arange(5000)] * 3))
    assert abs(s.estimate() - 5000) / 5000 < 0.05


def test_union_matches_single_stream():
    # cpc/MergingValidation.java:40 pattern: merged == stream-order built
    a = hll.sketch_longs(np.arange(0, 50_000))
    b = hll.sketch_longs(np.arange(25_000, 100_000))
    u = hll.union(a, b)
    direct = hll.sketch_longs(np.arange(0, 100_000))
    assert np.array_equal(u.regs, direct.regs)  # max-merge is exact on registers
    assert abs(u.estimate() - 100_000) / 100_000 < 0.05


def test_union_many_commutative():
    parts = [hll.sketch_longs(np.arange(i * 10_000, (i + 1) * 10_000)) for i in range(6)]
    u1 = hll.union_many(parts)
    u2 = hll.union_many(parts[::-1])
    assert np.array_equal(u1.regs, u2.regs)


def test_bounds_cover_truth():
    n = 200_000
    s = hll.sketch_longs(np.arange(n))
    lb, ub = s.bounds(3)
    assert lb <= n <= ub


def test_serde_roundtrip():
    s = hll.sketch_longs(np.arange(42_000))
    r = hll.HllSketch.from_bytes(s.to_bytes())
    assert r.lg_k == s.lg_k and np.array_equal(r.regs, s.regs)
    assert r.estimate() == s.estimate()


def test_downsize_union():
    a = hll.sketch_longs(np.arange(50_000), lg_k=10)
    b = hll.sketch_longs(np.arange(50_000, 90_000), lg_k=12)
    u = hll.union(a, b)
    assert u.lg_k == 10
    assert abs(u.estimate() - 90_000) / 90_000 < 0.12
