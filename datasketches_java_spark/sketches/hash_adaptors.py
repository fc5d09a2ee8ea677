"""Murmur3 hash adaptors — int-range / double / modulo mappings.

Numpy re-expression of hash/MurmurHash3Adaptor.java:252-447:

  - ``as_int(keys, n)``: deterministic uniform int in [0, n) via
    masked rejection sampling over four 31-bit extractions per hash
    round, reseeding with the L'Ecuyer-Simard prime on rejection
    (MurmurHash3Adaptor.asInteger:340-394) — vectorized: each round
    resolves the still-unresolved subset;
  - ``as_double(keys)``: uniform double in [0, 1) from the top 52 bits
    (MurmurHash3Adaptor.asDouble:408-410, ``(h[0] >>> 12) * 2^-52``);
  - ``modulo128(h0, h1, divisor)``: remainder of the full unsigned
    128-bit hash (MurmurHash3Adaptor.modulo:421-427) — computed here
    directly as ``(h1·2^64 + h0) mod d`` in Python big-int per
    element-pair for the scalar form and vectorized via the same
    identity ``(2^64 mod d)·(h1 mod d) + h0 mod d`` for arrays;
  - canonicalized double hashing (``canonical_double_bits``):
    −0.0 → 0.0 and all NaN forms collapse to the canonical NaN before
    taking IEEE-754 bits — exactly UpdateSketch.update(double)
    (theta/UpdateSketch.java:236-239).

Fidelity note: ``as_int`` is elementwise-identical to a literal port
of the reference loop (verified in tests).  The reference's own
javadoc caveats that outputs are "only as random as the MurmurHash3
algorithm" — and measurably so: for the single-long input path the
low nibble and bits 33-36 of h1 are strongly dependent (chi² ≈ 181k
vs 255 dof expected at seed 0), which makes the masked-rejection
result visibly non-uniform (±8 % per bin for n=10).  We reproduce
this bias rather than "fix" it, because parity with the reference is
the contract; use ``as_double`` (top 52 bits, well mixed) when
distribution quality matters.
"""

from __future__ import annotations

import numpy as np

from .murmur3 import hash128_u64

_PRIME = np.uint64(9219741426499971445 & 0xFFFFFFFFFFFFFFFF)  # L'Ecuyer-Simard
_INT_MASK = np.uint64(0x7FFFFFFF)


def _ceil_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def as_int(keys: np.ndarray, n: int, seed: int = 0) -> np.ndarray:
    """Deterministic uniform int in [0, n) per key (vectorized
    MurmurHash3Adaptor.asInt(long, n))."""
    if n < 2:
        raise ValueError("n must be > 1")
    keys = np.asarray(keys, dtype=np.int64)
    mask = np.uint64(_INT_MASK if n > (1 << 30) else _ceil_pow2(n) - 1)
    out = np.full(keys.shape[0], -1, dtype=np.int64)
    unresolved = np.arange(keys.shape[0])
    s = np.uint64(seed)
    for _ in range(10_000):
        if unresolved.size == 0:
            return out
        h1, h2 = hash128_u64(keys[unresolved], int(s))
        still = unresolved
        for cand in (h1 & mask, (h1 >> np.uint64(33)) & mask,
                     h2 & mask, (h2 >> np.uint64(33)) & mask):
            ok = (cand < n) & (out[still] < 0)
            out[still[ok]] = cand[ok].astype(np.int64)
        unresolved = unresolved[out[unresolved] < 0]
        with np.errstate(over="ignore"):
            s = s + _PRIME
    raise RuntimeError("failed to find integer < n within 10000 iterations")


def as_double(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Uniform double in [0, 1) per key
    (MurmurHash3Adaptor.asDouble:408: (h[0] >>> 12) * 2^-52)."""
    h1, _ = hash128_u64(np.asarray(keys, dtype=np.int64), seed)
    return (h1 >> np.uint64(12)).astype(np.float64) * 2.0 ** -52


def modulo128(h0: np.ndarray, h1: np.ndarray, divisor: int) -> np.ndarray:
    """(h1·2^64 + h0) mod divisor over the UNSIGNED 128-bit hash —
    the closed form of MurmurHash3Adaptor.modulo:421-427's
    signed-long gymnastics."""
    if divisor <= 0:
        raise ValueError("divisor must be positive")
    d = np.uint64(divisor)
    two64_mod = np.uint64(((1 << 64) % divisor))
    with np.errstate(over="ignore"):
        # ((h1 mod d)·(2^64 mod d) + h0 mod d) mod d; products fit in
        # uint64 only when divisor < 2^32 — use object ints otherwise
        if divisor < (1 << 31):
            top = (np.asarray(h1, np.uint64) % d) * two64_mod % d
            return ((top + np.asarray(h0, np.uint64) % d) % d).astype(np.int64)
    h0v = np.asarray(h0, dtype=np.uint64)
    h1v = np.asarray(h1, dtype=np.uint64)
    return np.array([int((int(b) << 64 | int(a)) % divisor)
                     for a, b in zip(h0v, h1v)], dtype=np.int64)


def canonical_double_bits(values: np.ndarray) -> np.ndarray:
    """IEEE-754 bits of canonicalized doubles: −0.0 → 0.0, every NaN →
    the canonical quiet NaN — the exact update(double) preprocessing
    (theta/UpdateSketch.java:236-239), so double streams hash
    identically to the reference."""
    v = np.asarray(values, dtype=np.float64).copy()
    v[v == 0.0] = 0.0                      # collapses -0.0
    v[np.isnan(v)] = np.float64("nan")     # canonical NaN bits
    return v.view(np.int64)
