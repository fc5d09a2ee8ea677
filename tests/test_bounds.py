"""Exact-bounds parity tests.

The headline check ports the reference's own golden sweep
(thetacommon/BinomialBoundsNTest.java:37-110): log-sums of LB/UB over
tens of thousands of (numSamples, theta) configurations must match the
`std` table the reference asserts with 1e-15 relative tolerance — a
formula-exactness proof, not a statistical tolerance.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from datasketches_java_spark.sketches import bounds as B
from datasketches_java_spark.sketches import hll, theta


def _run_sweep(max_num_samples: int, ci: int, min_p: float):
    """Port of BinomialBoundsNTest.runTestAux."""
    num_samples = 0
    sum1 = sum2 = sum3 = sum4 = 0.0
    count = 0
    while num_samples <= max_num_samples:
        p = 1.0
        while p >= min_p:
            lb = B.binomial_bounds_lower(num_samples, p, ci)
            ub = B.binomial_bounds_upper(num_samples, p, ci)
            sum1 += math.log(lb + 1.0)
            sum2 += math.log(ub + 1.0)
            count += 2
            if p < 1.0:
                lb = B.binomial_bounds_lower(num_samples, 1.0 - p, ci)
                ub = B.binomial_bounds_upper(num_samples, 1.0 - p, ci)
                sum3 += math.log(lb + 1.0)
                sum4 += math.log(ub + 1.0)
                count += 2
            p *= 0.99
        num_samples = max(num_samples + 1, (1001 * num_samples) // 1000)
    return sum1, sum2, sum3, sum4, count


# golden values from BinomialBoundsNTest.java `std` (runs 20/1e-3 and
# 200/1e-5 for ci = 1, 2, 3)
_GOLDEN = {
    (20, 1, 1e-3): (7.083330682531043e+04, 8.530373642825481e+04,
                    3.273647725073409e+04, 3.734024243699785e+04, 57750),
    (20, 2, 1e-3): (6.539415269641498e+04, 8.945522372568645e+04,
                    3.222302546497840e+04, 3.904738469737429e+04, 57750),
    (20, 3, 1e-3): (6.006043493107306e+04, 9.318105731423477e+04,
                    3.186269956585285e+04, 4.096466221922520e+04, 57750),
    (200, 1, 1e-5): (2.275584770163813e+06, 2.347586549014998e+06,
                     1.020399409477305e+06, 1.036729927598294e+06, 920982),
    (200, 2, 1e-5): (2.243569126699713e+06, 2.374663344107342e+06,
                     1.017017233582122e+06, 1.042597845553438e+06, 920982),
    (200, 3, 1e-5): (2.210056231903739e+06, 2.400441267999687e+06,
                     1.014081235946986e+06, 1.049480769755676e+06, 920982),
}


@pytest.mark.parametrize("cfg", sorted(_GOLDEN))
def test_binomial_bounds_golden_sweep(cfg):
    max_n, ci, min_p = cfg
    got = _run_sweep(max_n, ci, min_p)
    want = _GOLDEN[cfg]
    assert got[4] == want[4]
    for g, w in zip(got[:4], want[:4]):
        assert abs(g / w - 1.0) < 1e-15


def test_binomial_bounds_special_cases():
    """checkComputeApproxBino_LB_UB shape from the reference test."""
    n = 100
    th = (2.0 - 1e-5) / 2.0
    assert B.binomial_bounds_lower(n, th, 1) == n
    assert B.binomial_bounds_upper(n, th, 1) == n + 1
    # zero samples: LB 0, UB positive in estimation mode
    assert B.binomial_bounds_lower(0, 0.01, 2) == 0.0
    assert B.binomial_bounds_upper(0, 0.01, 2) > 0.0
    # noDataSeen short-circuit
    assert B.binomial_bounds_lower(0, 0.01, 2, True) == 0.0
    assert B.binomial_bounds_upper(0, 0.01, 2, True) == 0.0
    with pytest.raises(ValueError):
        B.binomial_bounds_lower(10, 0.5, 4)


def test_erf_accuracy():
    """A&S 7.1.28 claims ~7 decimal digits; check against math.erf."""
    for x in np.linspace(-4, 4, 101):
        assert abs(B.erf(float(x)) - math.erf(float(x))) < 3e-7


def test_proportion_bounds_bracket_p():
    """Clopper-Pearson-ish bounds must bracket the empirical p and
    tighten with n."""
    for n, k in [(50, 10), (500, 100), (5000, 1000)]:
        lb = B.approximate_lower_bound_on_p(n, k, 2.0)
        ub = B.approximate_upper_bound_on_p(n, k, 2.0)
        assert lb <= k / n <= ub
    w1 = (B.approximate_upper_bound_on_p(50, 10, 2.0)
          - B.approximate_lower_bound_on_p(50, 10, 2.0))
    w2 = (B.approximate_upper_bound_on_p(5000, 1000, 2.0)
          - B.approximate_lower_bound_on_p(5000, 1000, 2.0))
    assert w2 < w1 / 5


def test_theta_bounds_wired():
    """ThetaSketch.bounds now uses BinomialBoundsN: exact mode returns
    the count; estimation-mode bounds bracket the true cardinality for
    a seeded stream and are NOT the old Gaussian values."""
    sk = theta.sketch_longs(np.arange(1000), lg_k=12)
    assert sk.bounds(2) == (1000.0, 1000.0)
    n = 200_000
    sk = theta.sketch_longs(np.arange(n), lg_k=12)
    lb1, ub1 = sk.bounds(1)
    lb2, ub2 = sk.bounds(2)
    lb3, ub3 = sk.bounds(3)
    assert lb3 < lb2 < lb1 < sk.estimate() < ub1 < ub2 < ub3
    assert lb2 <= n <= ub2
    # exact-formula spot check: count>120 ⇒ continuity-corrected
    # classic interval, "fake rounded"
    want_lb = B._cont_classic_lb(sk.count, sk.theta_frac, 2) - 0.5
    assert lb2 == min(sk.estimate(), max(float(sk.count), want_lb))


def test_theta_jaccard_ci_reference_shape():
    """Jaccard CI comes from BoundsOnRatiosInThetaSketchedSets: the
    ±2σ interval must cover the true J at roughly its nominal 95.4%
    rate over seeded trials (a single-seed bracket test would flake at
    the nominal miss rate by design), and the identical-data fast path
    returns 1s."""
    true_j = 0.5
    covered = 0
    trials = 20
    for seed in range(trials):
        rng = np.random.default_rng(seed)
        pop = rng.choice(1 << 40, 400_000, replace=False)
        a = theta.sketch_longs(pop[:300_000], 12)
        b = theta.sketch_longs(pop[100_000:], 12)
        lb, est, ub = theta.jaccard(a, b)
        assert lb < est < ub
        assert abs(est - true_j) / true_j < 0.1
        covered += lb <= true_j <= ub
    assert covered >= 16  # ≥ 80% observed vs 95.4% nominal
    a = theta.sketch_longs(np.arange(10_000), 12)
    assert theta.jaccard(a, a) == (1.0, 1.0, 1.0)


def test_hll_bounds_tables():
    """HLL bounds use the reference's NON_HIP tables for lgK ≤ 12 and
    the RSE-factor formula above; LB floored at non-zero registers."""
    n = 500_000
    sk = hll.sketch_longs(np.arange(n), lg_k=12)
    lb, ub = sk.bounds(2)
    assert lb <= n <= ub
    assert lb < sk.estimate() < ub
    # exact formula check against the extracted table values
    est = sk.estimate()
    rel_lb = B.hll_rel_err(False, 12, 2)
    rel_ub = B.hll_rel_err(True, 12, 2)
    nnz = float(np.count_nonzero(sk.regs))
    assert lb == max(est / (1.0 + rel_lb), nnz)
    assert ub == est / (1.0 + rel_ub)
    # lgK > 12 switches to the formula path
    assert B.hll_rel_err(False, 14, 2) == pytest.approx(
        2 * math.sqrt(3 * math.log(2) - 1) / math.sqrt(1 << 14))


def test_priority_sample_pseudo_hypergeometric_bounds():
    """Subset-sum bounds bracket the true subset weight (estimation
    mode) and collapse to exact in exact mode."""
    from datasketches_java_spark.sketches.sampling import PrioritySample
    rng = np.random.default_rng(11)
    items = np.arange(50_000)
    weights = rng.exponential(10.0, items.size)
    true_sum = weights[items % 3 == 0].sum()
    ps = PrioritySample(k=4096).update_batch(items, weights)
    out = ps.estimate_subset_sum(lambda it: it % 3 == 0)
    assert out["lower_bound"] <= out["estimate"] <= out["upper_bound"]
    assert out["lower_bound"] <= true_sum <= out["upper_bound"]
    assert abs(out["estimate"] - true_sum) / true_sum < 0.1
    ps_small = PrioritySample(k=1024).update_batch(
        items[:100], weights[:100])
    exact = ps_small.estimate_subset_sum(lambda it: it % 3 == 0)
    want = weights[:100][items[:100] % 3 == 0].sum()
    assert exact["lower_bound"] == exact["estimate"] == exact["upper_bound"]
    assert exact["estimate"] == pytest.approx(want)
