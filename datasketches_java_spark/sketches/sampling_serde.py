"""Reference-binary serde for the sampling family — VarOpt and
Reservoir sketches over LONG items (ArrayOfLongsSerDe payloads).

Byte layouts per sampling/PreambleUtil.java:54-157 (little-endian),
writers VarOptItemsSketch.toByteArray:568-622 and
ReservoirLongsSketch.toByteArray:392-430:

  Reservoir (famID=11, serVer=2):
    empty : 8B  {preLongs=1 | lgRF<<6, serVer, famID, flags=EMPTY(4),
                 k:int32 @4}
    else  : 16B {preLongs=2, ...} + n:int64 @8,
            then min(n,k) long items @16
  VarOpt (famID=13, serVer=2):
    empty  : 8B  {preLongs=1, ..., flags=EMPTY, k:int32 @4}
    warmup : 24B {preLongs=3} + n @8, h:int32 @16, r:int32 @20(=0),
             then h weight doubles, [h marks bit-packed if GADGET
             flag(128)], then h long items
    full   : 32B {preLongs=4} + ... + totalWtR:double @24, then h
             weight doubles, [marks], then (h + r) long items in
             H-heap-order-then-R order (getDataSamples)

The mark bytes use the reference's ArrayOfBooleansSerDe packing
(LSB-first within each byte).  We WRITE the gadget form only when the
sketch actually carries union marks, like the reference.
"""

from __future__ import annotations

import struct

import numpy as np

from .sampling import ReservoirSketch
from .varopt import VarOptSketch

_SER_VER = 2
_FAM_RESERVOIR = 11
_FAM_VAROPT = 13
_FLAG_EMPTY = 4
_FLAG_GADGET = 128
_LG_RF = 3  # X8, the reference default; readers ignore it


def _pack_byte0(pre_longs: int) -> int:
    return pre_longs | (_LG_RF << 6)


def _marks_to_bytes(marks: list[bool]) -> bytes:
    out = bytearray((len(marks) + 7) >> 3)
    for i, m in enumerate(marks):
        if m:
            out[i >> 3] |= 1 << (i & 7)
    return bytes(out)


def _marks_from_bytes(buf: bytes, off: int, count: int) -> list[bool]:
    return [bool(buf[off + (i >> 3)] >> (i & 7) & 1) for i in range(count)]


# ---------------------------------------------------------------------------
# VarOpt
# ---------------------------------------------------------------------------

def varopt_to_java_bytes(sk: VarOptSketch) -> bytes:
    """Serialize to the reference's VarOpt longs image
    (VarOptItemsSketch.toByteArray:568)."""
    h, r = sk.h_count, sk.r_count
    empty = h == 0 and r == 0
    if empty:
        return struct.pack("<BBBBi", _pack_byte0(1), _SER_VER, _FAM_VAROPT,
                           _FLAG_EMPTY, sk.k)
    gadget = sk.num_marks_in_h > 0
    pre_longs = 3 if r == 0 else 4
    flags = _FLAG_GADGET if gadget else 0
    out = [struct.pack("<BBBBi", _pack_byte0(pre_longs), _SER_VER,
                       _FAM_VAROPT, flags, sk.k),
           struct.pack("<qii", sk.n, h, r)]
    if r > 0:
        out.append(struct.pack("<d", sk.total_wt_r))
    out.append(np.asarray([e[0] for e in sk.heap], "<f8").tobytes())
    if gadget:
        out.append(_marks_to_bytes([bool(e[3]) for e in sk.heap]))
    items = [e[2] for e in sk.heap] + [it for it, _ in sk.r_items]
    out.append(np.asarray(items, dtype="<i8").tobytes())
    return b"".join(out)


def varopt_from_java_bytes(buf: bytes) -> VarOptSketch:
    """Heapify a VarOpt longs image (VarOptItemsSketch.heapify)."""
    byte0, ser_ver, fam, flags, k = struct.unpack_from("<BBBBi", buf, 0)
    pre_longs = byte0 & 0x3F
    if fam != _FAM_VAROPT:
        raise ValueError(f"family {fam} is not a VarOpt image (need 13)")
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported VarOpt serVer {ser_ver}")
    sk = VarOptSketch(k)
    if flags & _FLAG_EMPTY:
        return sk
    n, h, r = struct.unpack_from("<qii", buf, 8)
    if pre_longs not in (3, 4) or (r > 0) != (pre_longs == 4):
        raise ValueError(f"corrupt VarOpt preLongs {pre_longs} for r={r}")
    total_wt_r = struct.unpack_from("<d", buf, 24)[0] if r > 0 else 0.0
    off = pre_longs << 3
    weights = np.frombuffer(buf, "<f8", count=h, offset=off)
    off += h * 8
    marks = [False] * h
    if flags & _FLAG_GADGET:
        marks = _marks_from_bytes(buf, off, h)
        off += (h + 7) >> 3
    items = np.frombuffer(buf, "<i8", count=h + r, offset=off)
    sk.n = n
    for i in range(h):
        sk._push(int(items[i]), float(weights[i]), marks[i])
    sk.r_items = [(int(it), False) for it in items[h:]]
    sk.total_wt_r = float(total_wt_r)
    return sk


# ---------------------------------------------------------------------------
# Reservoir
# ---------------------------------------------------------------------------

def reservoir_to_java_bytes(sk: ReservoirSketch) -> bytes:
    """Serialize to the reference's ReservoirLongsSketch image
    (ReservoirLongsSketch.toByteArray:392)."""
    if sk.n == 0:
        return struct.pack("<BBBBi", _pack_byte0(1), _SER_VER,
                           _FAM_RESERVOIR, _FLAG_EMPTY, sk.k)
    items = np.asarray(sk.samples[:min(sk.n, sk.k)], dtype="<i8")
    return (struct.pack("<BBBBi", _pack_byte0(2), _SER_VER, _FAM_RESERVOIR,
                        0, sk.k)
            + struct.pack("<q", sk.n) + items.tobytes())


def reservoir_from_java_bytes(buf: bytes) -> ReservoirSketch:
    """Heapify a ReservoirLongsSketch image."""
    _b0, ser_ver, fam, flags, k = struct.unpack_from("<BBBBi", buf, 0)
    if fam != _FAM_RESERVOIR:
        raise ValueError(f"family {fam} is not a Reservoir image (need 11)")
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported Reservoir serVer {ser_ver}")
    if flags & _FLAG_EMPTY:
        return ReservoirSketch(k)
    (n,) = struct.unpack_from("<q", buf, 8)
    count = min(n, k)
    items = np.frombuffer(buf, "<i8", count=count, offset=16)
    return ReservoirSketch(k, int(n), [int(x) for x in items])
