"""REQ sketch ↔ datasketches-java wire format (req/ReqSerDe.java).

Layout (serVer 1, family 17; ReqSerDe.java:44-121 byte diagrams):

  byte 0   preInts (2, or 4 for ESTIMATION)
  byte 1   serVer = 1
  byte 2   familyId = 17
  byte 3   flags: bit2 Empty, bit3 HRA, bit4 RawItems, bit5 L0-Sorted
  bytes 4-5  K (uint16 LE)
  byte 6   numCompactors
  byte 7   numRawItems

  EMPTY       nothing more (8 bytes total)
  RAWITEMS    numRawItems float32 items           (n <= MIN_K = 4)
  EXACT       one serialized compactor            (numLevels == 1)
  ESTIMATION  int64 N, float32 min, float32 max, then each compactor

Compactor image (ReqCompactor.toByteArray:297-311): uint64 state,
float32 sectionSizeFlt, uint8 lgWeight, uint8 numSections, 2 pad,
int32 count, count×float32 items (the active region of the
FloatBuffer, ascending when sorted — FloatBuffer.floatsToBytes:401).

The reference's item type is FLOAT; the engine's buffers are float64.
Writing narrows to float32 (documented precision boundary — use
float32-representable values when bit-exact interop matters), reading
widens back.  No .sk golden ships in the reference tree for REQ, so
the validation bar is the layout-literal self-golden + roundtrip +
through-the-wire merge tests (tests/test_req_serde.py), the same bar
as hll_serde/kll_serde.
"""

from __future__ import annotations

import struct

import numpy as np

from .req import MIN_K, _Compactor, _nearest_even, ReqSketch

_SER_VER = 1
_FAMILY_REQ = 17

_FLAG_EMPTY = 1 << 2
_FLAG_HRA = 1 << 3
_FLAG_RAW_ITEMS = 1 << 4
_FLAG_L0_SORTED = 1 << 5

_CHDR = struct.Struct("<QfBB2xi")  # state, ssf, lgWt, numSections, pad, count


def _pack_compactor(c: _Compactor) -> bytes:
    c.sort()
    return (_CHDR.pack(c.state, float(np.float32(c.section_size_flt)),
                       c.lg_weight, c.num_sections, c.count())
            + c.buf.astype("<f4").tobytes())


def _unpack_compactor(buf: bytes, off: int, hra: bool,
                      lvl0_sorted: bool) -> tuple[_Compactor, int]:
    # lgWeight comes from the wire (the image is authoritative about
    # its own level structure, like the reference's extractCompactor)
    state, ssf, lg_wt, num_sections, count = _CHDR.unpack_from(buf, off)
    off += _CHDR.size
    items = np.frombuffer(buf, dtype="<f4", count=count,
                          offset=off).astype(np.float64)
    off += count * 4
    c = _Compactor(int(lg_wt), hra, _nearest_even(ssf), float(ssf),
                   int(num_sections), int(state), False, items,
                   bool(lvl0_sorted))
    if not lvl0_sorted:
        c.sort()
    return c, off


def to_java_bytes(sk: ReqSketch) -> bytes:
    """Serialize to the reference image (ReqSerDe.toByteArray:264-311).

    Format selection mirrors ReqSerDe.getSerFormat:247-252:
    EMPTY / RAWITEMS (n <= 4) / EXACT (one level) / ESTIMATION."""
    empty = sk.n == 0
    raw_items = not empty and sk.n <= MIN_K
    num_compactors = 0 if empty else sk.num_levels
    num_raw = sk.n if sk.n <= MIN_K else 0
    for c in sk.compactors:
        c.sort()
    flags = ((_FLAG_EMPTY if empty else 0)
             | (_FLAG_HRA if sk.hra else 0)
             | (_FLAG_RAW_ITEMS if raw_items else 0)
             | _FLAG_L0_SORTED)
    estimation = not empty and not raw_items and sk.num_levels > 1
    pre_ints = 4 if estimation else 2
    hdr = struct.pack("<BBBBHBB", pre_ints, _SER_VER, _FAMILY_REQ, flags,
                      sk.k, num_compactors, num_raw)
    if empty:
        return hdr
    if raw_items:
        return hdr + sk.compactors[0].buf.astype("<f4").tobytes()
    if not estimation:  # EXACT: single compactor
        return hdr + _pack_compactor(sk.compactors[0])
    body = struct.pack("<qff", sk.n, float(np.float32(sk.min_value)),
                       float(np.float32(sk.max_value)))
    return hdr + body + b"".join(_pack_compactor(c) for c in sk.compactors)


def from_java_bytes(buf: bytes) -> ReqSketch:
    """Heapify a reference image (ReqSerDe.heapify:131-194)."""
    pre_ints, ser_ver, family, flags, k, num_compactors, num_raw = \
        struct.unpack_from("<BBBBHBB", buf)
    if ser_ver != _SER_VER:
        raise ValueError(f"REQ serVer mismatch: expected 1, got {ser_ver}")
    if family != _FAMILY_REQ:
        raise ValueError(f"Invalid Family: expected REQ(17), got {family}")
    empty = bool(flags & _FLAG_EMPTY)
    hra = bool(flags & _FLAG_HRA)
    raw_items = bool(flags & _FLAG_RAW_ITEMS)
    lvl0_sorted = bool(flags & _FLAG_L0_SORTED)

    if num_compactors <= 1 and empty:
        if pre_ints != 2:
            raise ValueError("EMPTY REQ image must have preInts=2")
        return ReqSketch(k, hra)
    if num_compactors <= 1 and raw_items:
        if pre_ints != 2:
            raise ValueError("RAWITEMS REQ image must have preInts=2")
        sk = ReqSketch(k, hra)
        items = np.frombuffer(buf, dtype="<f4", count=num_raw,
                              offset=8).astype(np.float64)
        sk.update_batch(items)
        return sk
    if num_compactors <= 1:  # EXACT
        if pre_ints != 2:
            raise ValueError("EXACT REQ image must have preInts=2")
        c, _ = _unpack_compactor(buf, 8, hra, lvl0_sorted)
        n = c.count()
        mn = float(c.buf.min()) if n else np.nan
        mx = float(c.buf.max()) if n else np.nan
        return ReqSketch(k, hra, n, mn, mx, [c])
    # ESTIMATION
    if pre_ints != 4:
        raise ValueError("ESTIMATION REQ image must have preInts=4")
    n, mn, mx = struct.unpack_from("<qff", buf, 8)
    off = 8 + 16
    comps = []
    for lg in range(num_compactors):
        sorted_i = lvl0_sorted if lg == 0 else True
        c, off = _unpack_compactor(buf, off, hra, sorted_i)
        comps.append(c)
    return ReqSketch(k, hra, int(n), float(mn), float(mx), comps)
