"""CPC (Compressed Probabilistic Counting) sketch — bit-matrix core.

Re-expresses the reference's CPC family (cpc/CpcSketch.java:64,
update paths :588-695, cpc/CpcUnion.java:89, cpc/IconEstimator.java:48,
cpc/CpcConfidence.java:102-128) with the engine's design rules:

  - The canonical state is the full k x 64 coupon BIT MATRIX
    (numpy uint64[k]) — mathematically identical to the reference's
    sketch (cpc/CpcUtil.bitMatrixOfSketch reconstructs exactly this
    from its window/pairTable form, and cpc/CpcUnion.java keeps the
    same long[] bitMatrix as ITS canonical accumulator state).  The
    window-offset / PairTable / Flavor machinery is a *memory*
    optimization of the same set of coupons; we collapse it the same
    way HLL_4 nibbles collapse to HLL_8 registers (SURVEY §2.2/§2.3).
    Serialized images are sparse rowCol pairs or the dense matrix,
    whichever is smaller; entropy coding stays delegated to the
    shuffle/storage codecs (the documented design decision).
  - Coupon: row = hash0 & (k-1), col = numberOfLeadingZeros(hash1)
    clipped to 63 (CpcSketch.hashUpdate:664-685) over the same
    murmur3_x64_128(key, seed) — coupon sets here are BIT-IDENTICAL
    to the reference's for the same input.
  - Estimator: ICON only (cpc/IconEstimator.getIconEstimate — the
    degree-19 preconditioned polynomial below 5.6/5.7*K, the
    exponential approximation above).  HIP is stream-order dependent
    and invalid after merging (cpc/CpcSketch.java:165-169 mergeFlag
    discipline); the engine is merge-based everywhere, so only the
    merge-safe estimator exists — identical to the HLL design rule.
  - Bounds: the reference's empirical kappa tables for lgK <= 14 and
    the ln(2)/sqrt(K) constant above (cpc/CpcConfidence.java:102-128;
    note its LB uses the HIGH-side table and vice versa).
  - Union: OR of bit matrices; a smaller-lgK operand folds the larger
    matrix by OR-ing row i into row i & (kSmall-1) (CpcUnion.reduceK
    / orMatrixIntoMatrix semantics — valid because the row is the low
    bits of the same hash).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ..config import DEFAULT_UPDATE_SEED
from ._cpc_tables import (
    ICON_HIGH_SIDE, ICON_LOW_SIDE, ICON_MAX_LG_K, ICON_MIN_LG_K,
    ICON_POLY_NUM_COEFFS, ICON_POLYNOMIAL_COEFFICIENTS)
from .murmur3 import hash128_u64
from .theta import compute_seed_hash

_FAMILY_CPC = 16
_SER_VER = 1
_HDR = struct.Struct("<BBBBHH")  # family, serVer, form, lgK, seedHash, rsvd
_FORM_SPARSE = 1
_FORM_DENSE = 0
_ICON_ERROR_CONSTANT = float(np.log(2.0))          # 0.693147...
_POPCNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(
    np.uint16)

DEFAULT_CPC_LG_K = 11  # cpc/CpcSketch.java:71


def icon_estimate(lg_k: int, c: int) -> float:
    """cpc/IconEstimator.getIconEstimate — exact port."""
    assert ICON_MIN_LG_K <= lg_k <= ICON_MAX_LG_K
    if c < 2:
        return 0.0 if c == 0 else 1.0
    k = float(1 << lg_k)
    c = float(c)
    threshold = 5.7 if lg_k < 14 else 5.6
    if c > threshold * k:
        return 0.7940236163830469 * k * 2.0 ** (c / k)
    start = ICON_POLY_NUM_COEFFS * (lg_k - ICON_MIN_LG_K)
    coeffs = ICON_POLYNOMIAL_COEFFICIENTS[start:start + ICON_POLY_NUM_COEFFS]
    x = c / (2.0 * k)
    total = coeffs[-1]
    for a in reversed(coeffs[:-1]):
        total = total * x + a
    ratio = c / k
    result = c * total * (1.0 + ratio ** 3 / 66.774757)
    return result if result >= c else c


def _icon_eps(lg_k: int, kappa: int, table: list[int]) -> float:
    x = _ICON_ERROR_CONSTANT
    if lg_k <= 14:
        x = table[3 * (lg_k - 4) + (kappa - 1)] / 10000.0
    return kappa * x / np.sqrt(float(1 << lg_k))


def icon_confidence_lb(lg_k: int, c: int, kappa: int) -> float:
    """cpc/CpcConfidence.getIconConfidenceLB (HIGH-side table)."""
    if c == 0:
        return 0.0
    eps = _icon_eps(lg_k, kappa, ICON_HIGH_SIDE)
    return max(icon_estimate(lg_k, c) / (1.0 + eps), float(c))


def icon_confidence_ub(lg_k: int, c: int, kappa: int) -> float:
    """cpc/CpcConfidence.getIconConfidenceUB (LOW-side table)."""
    if c == 0:
        return 0.0
    eps = _icon_eps(lg_k, kappa, ICON_LOW_SIDE)
    return float(np.ceil(icon_estimate(lg_k, c) / (1.0 - eps)))


def _clz64(h: np.ndarray) -> np.ndarray:
    """Vectorized numberOfLeadingZeros over uint64, clipped to 63."""
    w = np.asarray(h, dtype=np.uint64)
    fl = np.zeros_like(w)
    nz = w != 0
    ww = w[nz]
    fl_nz = np.zeros(ww.shape, dtype=np.uint64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = ww >= (np.uint64(1) << s)
        fl_nz[big] += s
        ww = np.where(big, ww >> s, ww)
    fl[nz] = fl_nz
    clz = np.where(nz, np.uint64(63) - fl, np.uint64(63))  # 0-input clips 63
    return clz.astype(np.int64)


@dataclass(frozen=True)
class CpcSketch:
    lg_k: int
    seed_hash: int
    matrix: np.ndarray  # uint64[2^lg_k] coupon bit matrix

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    @property
    def num_coupons(self) -> int:
        return int(_POPCNT8[self.matrix.view(np.uint8)].sum())

    def estimate(self) -> float:
        return icon_estimate(self.lg_k, self.num_coupons)

    def bounds(self, kappa: int = 2) -> tuple[float, float]:
        c = self.num_coupons
        return (icon_confidence_lb(self.lg_k, c, kappa),
                icon_confidence_ub(self.lg_k, c, kappa))

    def row_cols(self) -> np.ndarray:
        """Sorted (row << 6 | col) pairs of collected coupons."""
        rows, cols = np.nonzero(
            np.unpackbits(self.matrix.view(np.uint8), bitorder="little")
            .reshape(self.k, 64))
        return np.sort((rows.astype(np.uint32) << np.uint32(6))
                       | cols.astype(np.uint32))

    # -- serde --------------------------------------------------------------
    def to_bytes(self) -> bytes:
        c = self.num_coupons
        sparse = 4 + c * 4 < self.k * 8
        if sparse:
            pairs = self.row_cols()
            return (_HDR.pack(_FAMILY_CPC, _SER_VER, _FORM_SPARSE, self.lg_k,
                              self.seed_hash, 0)
                    + struct.pack("<i", c) + pairs.astype("<u4").tobytes())
        return (_HDR.pack(_FAMILY_CPC, _SER_VER, _FORM_DENSE, self.lg_k,
                          self.seed_hash, 0)
                + self.matrix.astype("<u8").tobytes())

    @staticmethod
    def from_bytes(buf: bytes) -> "CpcSketch":
        fam, ver, form, lg_k, sh, _r = _HDR.unpack_from(buf)
        if fam != _FAMILY_CPC or ver != _SER_VER:
            raise ValueError(f"bad CPC image family={fam} ver={ver}")
        k = 1 << lg_k
        if form == _FORM_DENSE:
            m = np.frombuffer(buf, dtype="<u8", count=k,
                              offset=_HDR.size).copy()
        else:
            (c,) = struct.unpack_from("<i", buf, _HDR.size)
            pairs = np.frombuffer(buf, dtype="<u4", count=c,
                                  offset=_HDR.size + 4)
            m = np.zeros(k, dtype=np.uint64)
            rows = (pairs >> np.uint32(6)).astype(np.int64)
            cols = (pairs & np.uint32(63)).astype(np.uint64)
            np.bitwise_or.at(m, rows, np.uint64(1) << cols)
        return CpcSketch(lg_k, sh, m)


def empty(lg_k: int = DEFAULT_CPC_LG_K,
          seed: int = DEFAULT_UPDATE_SEED) -> CpcSketch:
    if not (ICON_MIN_LG_K <= lg_k <= ICON_MAX_LG_K):
        raise ValueError(f"lgK must be in [{ICON_MIN_LG_K},{ICON_MAX_LG_K}]")
    return CpcSketch(lg_k, compute_seed_hash(seed),
                     np.zeros(1 << lg_k, dtype=np.uint64))


def from_hash_pair(h0: np.ndarray, h1: np.ndarray, lg_k: int,
                   seed: int = DEFAULT_UPDATE_SEED) -> CpcSketch:
    """Batch coupon collection (CpcSketch.hashUpdate:664-685)."""
    sk = empty(lg_k, seed)
    m = sk.matrix
    k = 1 << lg_k
    rows = (np.asarray(h0, dtype=np.uint64)
            & np.uint64(k - 1)).astype(np.int64)
    cols = _clz64(h1).astype(np.uint64)
    np.bitwise_or.at(m, rows, np.uint64(1) << cols)
    return sk


def sketch_longs(values: np.ndarray, lg_k: int = DEFAULT_CPC_LG_K,
                 seed: int = DEFAULT_UPDATE_SEED) -> CpcSketch:
    """Batch build from int64 values (update overloads
    cpc/CpcSketch.java:310-398 — same murmur3 as theta/HLL)."""
    h0, h1 = hash128_u64(np.asarray(values, dtype=np.int64), seed)
    return from_hash_pair(h0, h1, lg_k, seed)


def union(a: CpcSketch, b: CpcSketch) -> CpcSketch:
    """OR-merge with lgK fold-down (cpc/CpcUnion.java mergeInto /
    orMatrixIntoMatrix / reduceK semantics)."""
    if a.seed_hash != b.seed_hash:
        raise ValueError("CPC seed-hash mismatch")
    lg_k = min(a.lg_k, b.lg_k)

    def fold(sk: CpcSketch) -> np.ndarray:
        if sk.lg_k == lg_k:
            return sk.matrix
        factor = 1 << (sk.lg_k - lg_k)
        return np.bitwise_or.reduce(
            sk.matrix.reshape(factor, 1 << lg_k), axis=0)

    return CpcSketch(lg_k, a.seed_hash, fold(a) | fold(b))


def union_many(sketches: list[CpcSketch]) -> CpcSketch:
    if not sketches:
        raise ValueError("union_many requires at least one CPC sketch "
                         "(use empty() for an identity element)")
    out = sketches[0]
    for s in sketches[1:]:
        out = union(out, s)
    return out
