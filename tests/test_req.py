"""REQ sketch tests — mirror the reference's req/ReqSketchTest.java
shapes: exact mode equals true order statistics, estimation-mode rank
error stays inside the sketch's own LB/UB model with the relative
(rank-proportional) profile, merge ≈ single-stream, HRA vs LRA
accuracy asymmetry."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_java_spark.sketches.req import ReqSketch


def test_exact_mode_order_statistics():
    vals = np.arange(1.0, 61.0)
    rng = np.random.default_rng(1)
    rng.shuffle(vals)
    sk = ReqSketch(k=12).update_batch(vals)
    assert not sk.is_estimation_mode
    for r, want in [(0.5, 30.0), (0.25, 15.0), (1.0, 60.0)]:
        assert sk.quantile(r) == want
    assert sk.rank(30.0) == 0.5
    assert sk.min_value == 1.0 and sk.max_value == 60.0 and sk.n == 60


def test_estimation_mode_rank_error_hra():
    """HRA: high ranks are near-exact, relative error grows toward low
    ranks; every observed error must respect the sketch's UB/LB model
    (BaseReqSketch.java:200-226)."""
    n = 200_000
    rng = np.random.default_rng(2)
    vals = rng.permutation(np.arange(n, dtype=np.float64))
    sk = ReqSketch(k=32, hra=True)
    for chunk in np.array_split(vals, 20):
        sk.update_batch(chunk)
    assert sk.is_estimation_mode
    assert sk.n == n
    for rank in [0.01, 0.1, 0.5, 0.9, 0.99, 0.999]:
        est_rank = sk.rank(sk.quantile(rank))
        lb = sk.rank_lower_bound(rank, 3)
        ub = sk.rank_upper_bound(rank, 3)
        assert lb <= est_rank <= ub or abs(est_rank - rank) < 1e-6, \
            f"rank {rank}: est {est_rank} outside [{lb}, {ub}]"
    # the top of the distribution is protected: tail ranks near-exact
    for rank in [0.999, 0.9999]:
        q = sk.quantile(rank)
        assert abs(q / n - rank) < 0.002


def test_lra_mirror():
    """LRA protects the LOW ranks instead (ReqSketch hra=False)."""
    n = 200_000
    rng = np.random.default_rng(3)
    vals = rng.permutation(np.arange(n, dtype=np.float64))
    sk = ReqSketch(k=32, hra=False).update_batch(vals)
    for rank in [0.0001, 0.001]:
        q = sk.quantile(rank)
        assert abs(q / n - rank) < 0.002


def test_merge_matches_single_stream_error_profile():
    """Merged partials answer within the same error envelope as one
    sketch over the whole stream (the Spark two-phase contract)."""
    n = 120_000
    rng = np.random.default_rng(4)
    vals = rng.standard_normal(n)
    parts = np.array_split(vals, 8)
    merged = ReqSketch(k=32)
    for p in parts:
        merged.merge(ReqSketch(k=32).update_batch(p))
    assert merged.n == n
    s = np.sort(vals)
    for rank in [0.5, 0.9, 0.99]:
        q = merged.quantile(rank)
        true_rank = np.searchsorted(s, q, side="right") / n
        assert merged.rank_lower_bound(rank, 3) <= true_rank \
            <= merged.rank_upper_bound(rank, 3)


def test_merge_order_insensitive():
    """Deterministic coins make the merged sketch independent of the
    merge order (partition-order independence in Spark)."""
    rng = np.random.default_rng(5)
    parts = [rng.standard_normal(20_000) for _ in range(4)]
    def build(order):
        out = ReqSketch(k=16)
        for i in order:
            out.merge(ReqSketch(k=16).update_batch(parts[i]))
        return out
    a = build([0, 1, 2, 3])
    b = build([3, 1, 0, 2])
    assert a.n == b.n
    for r in [0.1, 0.5, 0.9]:
        # same error envelope; not bit-equal (different merge trees
        # compact different regions) — both must satisfy the model
        qa, qb = a.quantile(r), b.quantile(r)
        assert abs(a.rank(qb) - r) < 0.05 and abs(b.rank(qa) - r) < 0.05


def test_serde_roundtrip():
    sk = ReqSketch(k=24).update_batch(
        np.random.default_rng(6).standard_normal(50_000))
    rt = ReqSketch.from_bytes(sk.to_bytes())
    assert rt.n == sk.n and rt.k == sk.k and rt.hra == sk.hra
    assert rt.num_levels == sk.num_levels
    for r in [0.05, 0.5, 0.95]:
        assert rt.quantile(r) == sk.quantile(r)
    assert rt.min_value == sk.min_value and rt.max_value == sk.max_value


def test_k_validation():
    with pytest.raises(ValueError):
        ReqSketch(k=13)
    with pytest.raises(ValueError):
        ReqSketch(k=2)


def test_pmf_cdf():
    sk = ReqSketch(k=12).update_batch(np.arange(100.0))
    cdf = sk.cdf([25.0, 50.0, 75.0])
    assert cdf[-1] == 1.0
    assert cdf[0] == pytest.approx(0.26, abs=0.02)
    pmf = sk.pmf([25.0, 50.0, 75.0])
    assert sum(pmf) == pytest.approx(1.0)
