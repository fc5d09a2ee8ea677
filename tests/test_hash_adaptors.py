"""Hash adaptor tests (hash/MurmurHash3Adaptor.java counterparts)."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_java_spark.sketches.hash_adaptors import (
    as_double,
    as_int,
    canonical_double_bits,
    modulo128,
)
from datasketches_java_spark.sketches.murmur3 import hash128_u64
from datasketches_java_spark.sketches import theta


def test_as_int_range_and_uniformity():
    keys = np.arange(200_000)
    for n in (7, 100, 1 << 20, (1 << 30) + 5):
        out = as_int(keys, n)
        assert out.min() >= 0 and out.max() < n
    # the reference algorithm's known bias (see hash_adaptors module
    # docstring): per-bin deviation up to ~10% for small n — assert the
    # faithful-port envelope, not ideal uniformity
    out = as_int(keys, 10)
    counts = np.bincount(out, minlength=10)
    assert abs(counts - 20_000).max() < 3_000


def test_as_int_deterministic_and_validates():
    keys = np.array([42, 43])
    assert np.array_equal(as_int(keys, 97), as_int(keys, 97))
    with pytest.raises(ValueError):
        as_int(keys, 1)


def test_as_int_matches_literal_reference_loop():
    """Vectorized as_int must be elementwise-identical to a literal
    scalar port of MurmurHash3Adaptor.asInteger:340-394."""
    from datasketches_java_spark.sketches.hash_adaptors import _ceil_pow2
    from datasketches_java_spark.sketches.murmur3 import hash128_u64
    PRIME = 9219741426499971445

    def ref(key, n, seed=0):
        mask = _ceil_pow2(n) - 1 if n <= (1 << 30) else 0x7FFFFFFF
        s = seed
        for _ in range(10000):
            h1, h2 = hash128_u64(np.array([key], dtype=np.int64),
                                 s & 0xFFFFFFFFFFFFFFFF)
            for t in (int(h1[0]) & mask, (int(h1[0]) >> 33) & mask,
                      int(h2[0]) & mask, (int(h2[0]) >> 33) & mask):
                if t < n:
                    return t
            s = (s + PRIME) & 0xFFFFFFFFFFFFFFFF
        raise RuntimeError

    keys = np.arange(0, 3000, 7)
    for n in (10, 97, 4096):
        got = as_int(keys, n)
        want = np.array([ref(int(k), n) for k in keys])
        assert np.array_equal(got, want)


def test_as_double_unit_interval():
    d = as_double(np.arange(100_000))
    assert d.min() >= 0.0 and d.max() < 1.0
    assert abs(d.mean() - 0.5) < 0.01
    # exact formula: (h1 >> 12) * 2^-52
    h1, _ = hash128_u64(np.array([7], dtype=np.int64), 0)
    assert as_double(np.array([7]))[0] == \
        float(h1[0] >> np.uint64(12)) * 2.0 ** -52


def test_modulo128_matches_bigint():
    rng = np.random.default_rng(0)
    h0 = rng.integers(0, 1 << 63, 1000, dtype=np.int64).view(np.uint64)
    h1 = rng.integers(0, 1 << 63, 1000, dtype=np.int64).view(np.uint64)
    for d in (7, 1000, (1 << 29) + 17, (1 << 33) + 5):
        got = modulo128(h0, h1, d)
        want = [(int(b) << 64 | int(a)) % d for a, b in zip(h0, h1)]
        assert got.tolist() == want


def test_canonical_double_update_path():
    """-0.0 and 0.0 must hash identically; every NaN bit pattern
    collapses; a double stream's sketch equals the long-bits sketch
    (theta/UpdateSketch.java:236-239)."""
    bits = canonical_double_bits(np.array([0.0, -0.0]))
    assert bits[0] == bits[1]
    nan1 = np.frombuffer(np.uint64(0x7FF8000000000001).tobytes(),
                         np.float64)[0]
    bits = canonical_double_bits(np.array([np.nan, nan1]))
    assert bits[0] == bits[1]
    vals = np.array([1.5, -2.25, 0.0, -0.0, 3.14, 1.5])
    sk = theta.sketch_doubles(vals, lg_k=12)
    assert sk.estimate() == 4.0  # {1.5, -2.25, 0.0, 3.14}
