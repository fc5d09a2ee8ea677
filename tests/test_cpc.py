"""CPC bit-matrix core: merge == stream-order (the reference's own
MergingValidation assertion, cpc/MergingValidation.java:40), ICON
accuracy envelope (RSE = ln2/sqrt K merged, cpc/CpcSketch.java:714),
kappa bounds, lgK fold-down unions, serde forms."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_java_spark.sketches import cpc


@pytest.mark.parametrize("lg_k", [4, 10, 12])
@pytest.mark.parametrize("n", [0, 1, 100, 50_000])
@pytest.mark.parametrize("splits", [2, 7])
def test_merge_equals_stream_order_bit_exact(lg_k, n, splits):
    xs = np.arange(n, dtype=np.int64)
    direct = cpc.sketch_longs(xs, lg_k=lg_k)
    parts = [cpc.sketch_longs(p, lg_k=lg_k)
             for p in np.array_split(xs, splits)]
    merged = cpc.union_many(parts)
    assert np.array_equal(merged.matrix, direct.matrix)
    assert merged.num_coupons == direct.num_coupons
    assert merged.estimate() == direct.estimate()


@pytest.mark.parametrize("lg_k,n", [(10, 5_000), (11, 100_000),
                                    (12, 1_000_000)])
def test_icon_estimate_within_merged_rse(lg_k, n):
    sk = cpc.sketch_longs(np.arange(n, dtype=np.int64), lg_k=lg_k)
    est = sk.estimate()
    rse = np.log(2.0) / np.sqrt(1 << lg_k)  # merged-sketch RSE
    assert abs(est - n) / n < 4 * rse
    lb, ub = sk.bounds(kappa=3)
    assert lb <= n <= ub
    lb2, ub2 = sk.bounds(kappa=2)
    assert lb <= lb2 <= ub2 <= ub  # nested intervals


def test_icon_estimate_edge_cases_and_monotonicity():
    assert cpc.icon_estimate(11, 0) == 0.0
    assert cpc.icon_estimate(11, 1) == 1.0
    prev = 0.0
    for c in range(0, 40_000, 37):  # crosses the 5.7*K threshold at k=2^11
        est = cpc.icon_estimate(11, c)
        assert est >= prev  # the approximation is monotonically increasing
        assert est >= min(c, 1)
        prev = est


def test_small_cardinality_rounds_exact():
    """For tiny cardinalities the ICON collision correction is below
    half an item, so round(icon) == n — the regime the oracle-gated
    driver query uses (per-group distinct counts of <= dozens).
    Beyond that the estimator intentionally reads above C (it
    estimates n from the collided coupon count), so it is NOT an
    exact-mode sketch the way theta below k is."""
    for n in (0, 1, 2, 7, 25, 50):
        sk = cpc.sketch_longs(np.arange(n, dtype=np.int64), lg_k=11)
        assert round(sk.estimate()) == n
    # the documented positive bias appears around c ~ 100 at lgK=11
    est100 = cpc.sketch_longs(np.arange(100, dtype=np.int64),
                              lg_k=11).estimate()
    assert 100.0 <= est100 < 101.5


def test_union_folds_lgk_bit_exact():
    """Union of differing lgK folds the bigger matrix by OR-ing row i
    into i & (kSmall-1) — bit-identical to sketching the combined
    stream at the smaller lgK (same hash rows)."""
    a = cpc.sketch_longs(np.arange(0, 30_000), lg_k=12)
    b = cpc.sketch_longs(np.arange(20_000, 60_000), lg_k=10)
    u = cpc.union(a, b)
    assert u.lg_k == 10
    direct = cpc.sketch_longs(np.arange(0, 60_000), lg_k=10)
    assert np.array_equal(u.matrix, direct.matrix)
    assert abs(u.estimate() - 60_000) / 60_000 < 0.1


@pytest.mark.parametrize("n", [0, 3, 500, 200_000])
def test_serde_roundtrip_both_forms(n):
    sk = cpc.sketch_longs(np.arange(n, dtype=np.int64), lg_k=11)
    img = sk.to_bytes()
    back = cpc.CpcSketch.from_bytes(img)
    assert np.array_equal(back.matrix, sk.matrix)
    assert back.lg_k == sk.lg_k and back.seed_hash == sk.seed_hash
    # sparse form for small C, dense beyond k*2 coupons
    c = sk.num_coupons
    assert img[2] == (1 if 4 + 4 * c < (1 << 11) * 8 else 0)


def test_seed_hash_checked_on_union():
    a = cpc.sketch_longs(np.arange(10), lg_k=10, seed=9001)
    b = cpc.sketch_longs(np.arange(10), lg_k=10, seed=1234)
    with pytest.raises(ValueError, match="seed"):
        cpc.union(a, b)


def test_rowcols_match_reference_coupon_split():
    """Coupon = (hash0 low lgK bits) row, clz(hash1) col — spot-check
    against a literal per-item reimplementation."""
    from datasketches_java_spark.sketches.murmur3 import hash128_u64
    xs = np.arange(200, dtype=np.int64)
    lg_k = 10
    h0, h1 = hash128_u64(xs, 9001)
    expected = set()
    for a, b in zip(h0, h1):
        row = int(a) & ((1 << lg_k) - 1)
        col = min(64 - int(b).bit_length() if b else 64, 63)
        expected.add((row << 6) | col)
    sk = cpc.sketch_longs(xs, lg_k=lg_k)
    assert set(int(x) for x in sk.row_cols()) == expected
    assert sk.num_coupons == len(expected)


def test_spark_agg_longs_and_strings(spark):
    from pyspark.sql import functions as F

    from datasketches_java_spark.functions.sketch_aggs import (
        cpc_estimate, cpc_sketch_agg)

    df = spark.createDataFrame(
        [(i % 30, f"name-{i % 30}") for i in range(900)], ["k", "s"])
    for col in ("k", "s"):
        sk = cpc_sketch_agg(df, col, lg_k=11)
        est = sk.select(cpc_estimate("cpc_sketch")).head()[0]
        assert round(est) == 30
