"""Reference-binary HLL serde — HLL_8 dense (HLL-mode) images.

Byte layout per hll/PreambleUtil.java:36-151 and the writer
hll/ToByteArrayImpl.java:57-97 (little-endian):

  [0]=preInts(10)  [1]=serVer(1)  [2]=famID(7)  [3]=lgK
  [4]=lgArr(0 for HLL_8)  [5]=flags  [6]=curMin
  [7]=mode (lo2=curMode, next2=tgtHllType; HLL_8+HLL = 0b1010 = 10)
  @8  hipAccum:double   @16 kxq0:double   @24 kxq1:double
  @32 numAtCurMin:int   @36 auxCount:int (0 for HLL_8)
  @40 2^lgK register bytes

Flags: 1=bigEndian, 2=readOnly, 4=empty, 8=compact, 16=outOfOrder
(PreambleUtil.java:135-140).  Scope: we WRITE the HLL_8 dense form
only (the engine's native layout), and READ every reference form —
HLL_8/HLL_6/HLL_4 dense (incl. the HLL_4 AuxHashMap exception array)
and the LIST/SET coupon warm-up modes — promoting to HLL_8 registers
on heapify, which preserves estimates exactly (the reference's own
cross-type invariant, hll/CrossCountingTest.java:33-40).  That closes
the most common real-world interop case: HLL_4 is the reference's
default target type (hll/HllSketch.java:80).
We always set the out-of-order flag (our estimator
is merge-based, so a reference reader correctly selects its composite
estimator), and we reconstruct the reference's running accumulators
(kxq0/kxq1 split at register value 32, curMin/numAtCurMin) from the
register array so the image is internally consistent for a reference
consumer (hll/HllArray.java:48-79 invariants).
"""

from __future__ import annotations

import struct

import numpy as np

from .hll import HllSketch, _seed_hash
from ..config import DEFAULT_UPDATE_SEED

_PRE_INTS_HLL = 10
_SER_VER = 1
_FAMILY_HLL = 7
_MODE_HLL8_HLL = 10  # tgtHllType=HLL_8 (0b10) << 2 | curMode=HLL (0b10)
_FLAG_READ_ONLY = 2
_FLAG_EMPTY = 4
_FLAG_OOO = 16
_HLL_BYTE_ARR_START = 40


def _kxq_split(regs: np.ndarray) -> tuple[float, float]:
    """The reference's two-accumulator harmonic sum (precision trick):
    kxq0 = Σ 2^-v over registers v < 32, kxq1 = Σ 2^-v over v ≥ 32."""
    v = regs.astype(np.float64)
    inv = np.exp2(-v)
    lo = regs < 32
    return float(inv[lo].sum()), float(inv[~lo].sum())


def to_java_bytes(sk: HllSketch) -> bytes:
    """Serialize to the reference's HLL_8 dense image
    (hll/ToByteArrayImpl.insertHll)."""
    regs = sk.regs
    cur_min = int(regs.min()) if regs.size else 0
    num_at_cur_min = int(np.count_nonzero(regs == cur_min))
    kxq0, kxq1 = _kxq_split(regs)
    empty = bool(np.all(regs == 0))
    flags = _FLAG_READ_ONLY | _FLAG_OOO | (_FLAG_EMPTY if empty else 0)
    hdr = struct.pack("<BBBBBBBB", _PRE_INTS_HLL, _SER_VER, _FAMILY_HLL,
                      sk.lg_k, 0, flags, cur_min, _MODE_HLL8_HLL)
    body = struct.pack("<dddii", 0.0, kxq0, kxq1, num_at_cur_min, 0)
    return hdr + body + regs.astype(np.uint8).tobytes()


def to_java_bytes_hll6(sk: HllSketch) -> bytes:
    """Serialize to the reference's HLL_6 dense image
    (hll/Hll6Array.java 6-bit packing: slot i occupies bits
    [6i, 6i+6) little-endian; array size = 3m/4 + 1 pad byte,
    AbstractHllArray.hll6ArrBytes:214-217).  The inverse of
    _hll6_regs; closes the HLL target-type write matrix
    (HLL_4 / HLL_6 / HLL_8)."""
    regs = sk.regs
    if regs.max(initial=0) > 63:
        raise ValueError("register value > 63 cannot pack into HLL_6")
    cur_min = int(regs.min()) if regs.size else 0
    num_at_cur_min = int(np.count_nonzero(regs == cur_min))
    kxq0, kxq1 = _kxq_split(regs)
    empty = bool(np.all(regs == 0))
    flags = _FLAG_READ_ONLY | _FLAG_OOO | (_FLAG_EMPTY if empty else 0)
    bits = ((regs[:, None] >> np.arange(6, dtype=np.uint8)) & 1).astype(
        np.uint8)
    packed = np.packbits(bits.reshape(-1), bitorder="little")
    pad = (3 * regs.shape[0]) // 4 + 1 - packed.shape[0]
    hdr = struct.pack("<BBBBBBBB", _PRE_INTS_HLL, _SER_VER, _FAMILY_HLL,
                      sk.lg_k, 0, flags, cur_min, 0b0110)  # HLL_6 + HLL
    body = struct.pack("<dddii", 0.0, kxq0, kxq1, num_at_cur_min, 0)
    return hdr + body + packed.tobytes() + b"\x00" * pad


_FLAG_COMPACT = 8
_AUX_TOKEN = 0xF  # hll/HllUtil.java:64
_KEY_BITS = 26    # coupon split: low 26 bits key, high 6 bits value


def _coupons_to_regs(coupons: np.ndarray, lg_k: int) -> np.ndarray:
    """Promote LIST/SET coupons into an HLL_8 register array:
    slot = coupon & (K-1), value = coupon >>> 26
    (hll/Hll8Array.couponUpdate, hll/HllUtil.java:132-140)."""
    m = 1 << lg_k
    regs = np.zeros(m, dtype=np.uint8)
    c = coupons.astype(np.uint32)
    c = c[c != 0]  # EMPTY table slots
    slots = (c & np.uint32(m - 1)).astype(np.int64)
    vals = (c >> np.uint32(_KEY_BITS)).astype(np.uint8)
    np.maximum.at(regs, slots, vals)
    return regs


def _hll4_regs(buf: bytes, lg_k: int, cur_min: int, flags: int) -> np.ndarray:
    """HLL_4 nibbles + AuxHashMap exceptions → HLL_8 registers
    (hll/Hll4Array.java:99-107 getSlotValue; aux pairs per
    hll/HeapAuxHashMap.heapify)."""
    m = 1 << lg_k
    raw = np.frombuffer(buf, dtype=np.uint8, count=m >> 1,
                        offset=_HLL_BYTE_ARR_START)
    nib = np.empty(m, dtype=np.uint8)
    nib[0::2] = raw & 0xF        # even slot = low nibble
    nib[1::2] = raw >> 4         # odd slot = high nibble
    regs = nib + np.uint8(cur_min)
    exc = nib == _AUX_TOKEN
    if exc.any():
        (aux_count,) = struct.unpack_from("<i", buf, 36)
        aux_start = _HLL_BYTE_ARR_START + (m >> 1)
        if flags & _FLAG_COMPACT:
            n_ints = aux_count
        else:  # updatable: open-address table of 2^lgArr ints
            lg_arr = buf[4]
            n_ints = 1 << lg_arr
        pairs = np.frombuffer(buf, dtype="<u4", count=n_ints,
                              offset=aux_start)
        pairs = pairs[pairs != 0]
        slots = (pairs & np.uint32(m - 1)).astype(np.int64)
        vals = (pairs >> np.uint32(_KEY_BITS)).astype(np.uint8)
        regs = regs.copy()
        regs[slots] = vals
        # every AUX_TOKEN slot must be resolved by an aux pair — track
        # overwrites explicitly (a resolved slot may legitimately hold
        # the value curMin+15, so the value itself is not a marker).
        # The reference throws on a missing exception entry
        # (hll/Hll4Array.getSlotValue -> AuxHashMap.mustFindValueFor).
        resolved = np.zeros(m, dtype=bool)
        resolved[slots] = True
        if (exc & ~resolved).any():
            missing = np.nonzero(exc & ~resolved)[0][:5].tolist()
            raise ValueError(
                f"HLL_4 image has unresolved AUX_TOKEN slots {missing} "
                f"(aux map incomplete)")
    return regs


def _hll6_regs(buf: bytes, lg_k: int) -> np.ndarray:
    """HLL_6 6-bit packed registers → HLL_8 (hll/Hll6Array.get6Bit:
    slot i occupies bits [6i, 6i+6) little-endian)."""
    m = 1 << lg_k
    nbytes = (6 * m + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes,
                        offset=_HLL_BYTE_ARR_START)
    bits = np.unpackbits(raw, bitorder="little")[:6 * m].reshape(m, 6)
    weights = (1 << np.arange(6)).astype(np.uint8)
    return (bits * weights).sum(axis=1).astype(np.uint8)


def to_java_bytes_hll4(sk: HllSketch) -> bytes:
    """Serialize to the reference's HLL_4 COMPACT image — the
    reference's DEFAULT target type (hll/HllSketch.java:80), so our
    sketches can feed default-config consumers at half the dense size:
    nibbles hold value−curMin capped at 14; slots ≥ curMin+15 spill to
    the compact AuxHashMap pair array (hll/Hll4Array.java,
    hll/ToByteArrayImpl.toHllByteArray with compact=true).  The
    preamble accumulators (kxq split, curMin, numAtCurMin) are
    reconstructed from the registers exactly as in to_java_bytes."""
    regs = sk.regs
    cur_min = int(regs.min()) if regs.size else 0
    num_at_cur_min = int(np.count_nonzero(regs == cur_min))
    kxq0, kxq1 = _kxq_split(regs)
    empty = bool(np.all(regs == 0))
    flags = (_FLAG_READ_ONLY | _FLAG_OOO | _FLAG_COMPACT
             | (_FLAG_EMPTY if empty else 0))
    rel = regs.astype(np.int64) - cur_min
    nib = np.minimum(rel, 15).astype(np.uint8)
    packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
    exc_slots = np.nonzero(rel >= 15)[0]
    aux = np.asarray([(int(regs[s]) << _KEY_BITS) | int(s)
                      for s in exc_slots], dtype="<u4")
    hdr = struct.pack("<BBBBBBBB", _PRE_INTS_HLL, _SER_VER, _FAMILY_HLL,
                      sk.lg_k, 0, flags, cur_min, 0b0010)  # HLL_4 + HLL
    body = struct.pack("<dddii", 0.0, kxq0, kxq1, num_at_cur_min, len(aux))
    return hdr + body + packed.tobytes() + aux.tobytes()


def from_java_bytes(buf: bytes,
                    seed: int = DEFAULT_UPDATE_SEED) -> HllSketch:
    """Heapify ANY reference HLL image into the engine's HLL_8 form
    (hll/HllSketch.heapify counterpart).  Supported on read:

      - HLL-mode HLL_8 dense (the engine's native layout),
      - HLL-mode HLL_4 (nibbles + AuxHashMap exceptions, compact or
        updatable aux — hll/Hll4Array.java, hll/AuxHashMap.java) and
        HLL_6 (6-bit packed, hll/Hll6Array.java), promoted to HLL_8
        registers — estimates are identical by the reference's own
        cross-type invariant (hll/CrossCountingTest.java:33-40),
      - LIST/SET coupon warm-up images (hll/CouponList.java:107,
        hll/CouponHashSet.java), promoted coupon-by-coupon.

    The write path stays HLL_8 (to_java_bytes)."""
    if len(buf) < 8:
        raise ValueError("HLL image too short")
    pre_ints, ser_ver, fam, lg_k, lg_arr, flags, byte6, mode = \
        struct.unpack_from("<BBBBBBBB", buf, 0)
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported HLL serVer {ser_ver}")
    if fam != _FAMILY_HLL:
        raise ValueError(f"family {fam} is not an HLL image (need 7)")
    cur_mode = mode & 0x3
    tgt_type = (mode >> 2) & 0x3

    if cur_mode == 0:  # LIST (PI=2): count in byte 6, coupons at 8
        if pre_ints != 2:
            raise ValueError(f"LIST-mode preInts must be 2, got {pre_ints}")
        count = byte6
        coupons = np.frombuffer(buf, dtype="<u4", count=count, offset=8)
        regs = _coupons_to_regs(coupons, lg_k)
    elif cur_mode == 1:  # SET (PI=3): count int at 8, table at 12
        if pre_ints != 3:
            raise ValueError(f"SET-mode preInts must be 3, got {pre_ints}")
        (count,) = struct.unpack_from("<i", buf, 8)
        n_ints = count if flags & _FLAG_COMPACT else (1 << lg_arr)
        coupons = np.frombuffer(buf, dtype="<u4", count=n_ints, offset=12)
        regs = _coupons_to_regs(coupons, lg_k)
    elif cur_mode == 2:  # HLL mode
        if pre_ints != _PRE_INTS_HLL:
            raise ValueError(f"HLL-mode preInts must be 10, got {pre_ints}")
        if tgt_type == 2:      # HLL_8
            regs = np.frombuffer(buf, dtype=np.uint8, count=1 << lg_k,
                                 offset=_HLL_BYTE_ARR_START).copy()
        elif tgt_type == 0:    # HLL_4
            regs = _hll4_regs(buf, lg_k, byte6, flags)
        elif tgt_type == 1:    # HLL_6
            regs = _hll6_regs(buf, lg_k)
        else:
            raise ValueError(f"invalid tgtHllType {tgt_type}")
    else:
        raise ValueError(f"invalid curMode {cur_mode}")
    return HllSketch(lg_k, _seed_hash(seed), regs)
