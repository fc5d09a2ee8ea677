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
(PreambleUtil.java:135-140).  Scope: we read and write the HLL_8
dense form only — the engine's native layout (SURVEY §2.2: HLL_4
nibble/aux and the LIST/SET warm-up modes are out of scope by design);
images in those forms are rejected with a clear error rather than
silently misread.  We always set the out-of-order flag (our estimator
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


def from_java_bytes(buf: bytes,
                    seed: int = DEFAULT_UPDATE_SEED) -> HllSketch:
    """Heapify an HLL_8 dense image (hll/HllSketch.heapify
    counterpart for the engine's supported form).  LIST/SET warm-up
    modes and HLL_4/6 register packings are rejected explicitly."""
    if len(buf) < 8:
        raise ValueError("HLL image too short")
    pre_ints, ser_ver, fam, lg_k, _lg_arr, _flags, _cur_min, mode = \
        struct.unpack_from("<BBBBBBBB", buf, 0)
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported HLL serVer {ser_ver}")
    if fam != _FAMILY_HLL:
        raise ValueError(f"family {fam} is not an HLL image (need 7)")
    cur_mode = mode & 0x3
    tgt_type = (mode >> 2) & 0x3
    if cur_mode != 2:
        raise ValueError(
            f"only HLL-mode images supported (curMode={cur_mode}; "
            "LIST/SET warm-up forms are out of scope — see module doc)")
    if tgt_type != 2:
        raise ValueError(
            f"only HLL_8 register packing supported (tgtHllType={tgt_type}; "
            "HLL_4/6 are out of scope by design, SURVEY §2.2)")
    if pre_ints != _PRE_INTS_HLL:
        raise ValueError(f"HLL-mode preInts must be 10, got {pre_ints}")
    m = 1 << lg_k
    regs = np.frombuffer(buf, dtype=np.uint8, count=m,
                         offset=_HLL_BYTE_ARR_START).copy()
    return HllSketch(lg_k, _seed_hash(seed), regs)
