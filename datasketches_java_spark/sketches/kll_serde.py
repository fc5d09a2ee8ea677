"""Reference-binary KLL doubles serde — compact images.

Byte layout per kll/KllPreambleUtil.java:30-161 and the writer
kll/KllHelper.java:562-639 (little-endian):

  empty  (8B) : {preInts=2, serVer=1, famID=15, flags=EMPTY|DOUBLES,
                 k:short, m=8, 0}
  single (16B): {preInts=2, serVer=2, famID=15, flags=SINGLE|DOUBLES,
                 k:short, m=8, 0} + item:double @8
  full        : {preInts=5, serVer=1, famID=15,
                 flags=DOUBLES|LEVEL_ZERO_SORTED, k:short, m=8, 0}
                n:long @8, minK:short @16, numLevels:byte @18, 0 @19,
                levels int[numLevels] @20 (start offsets into the item
                array; the final boundary = retained count is implied
                and NOT serialized), minItem:double, maxItem:double,
                then the retained items level by level (level h items
                carry weight 2^h; levels ≥ 1 sorted by construction,
                level 0 sorted here and flagged LEVEL_ZERO_SORTED).

Flags: 1=empty, 2=levelZeroSorted, 4=singleItem, 8=doublesSketch,
16=updatable (KllPreambleUtil.java:157-161).  We write compact doubles
images only and read compact doubles images (the updatable-memory form
and float sketches are out of scope; rejected explicitly).  minK is
our fixed k — the engine never folds k down on merge (merge keeps the
caller's k), so minK == k is the truthful value for the reference's
error-reporting use of the field.
"""

from __future__ import annotations

import struct

import numpy as np

from .kll import KllDoublesSketch

_PRE_INTS_EMPTY_SINGLE = 2
_PRE_INTS_FULL = 5
_SER_VER_FULL = 1
_SER_VER_SINGLE = 2
_FAMILY_KLL = 15
_M = 8
_FLAG_EMPTY = 1
_FLAG_L0_SORTED = 2
_FLAG_SINGLE = 4
_FLAG_DOUBLES = 8
_FLAG_UPDATABLE = 16


def to_java_bytes(sk: KllDoublesSketch) -> bytes:
    """Serialize to the reference's compact doubles image
    (KllHelper.toCompactByteArrayImpl:562)."""
    if sk.n == 0:
        return struct.pack("<BBBBHBB", _PRE_INTS_EMPTY_SINGLE, _SER_VER_FULL,
                           _FAMILY_KLL, _FLAG_EMPTY | _FLAG_DOUBLES,
                           sk.k, _M, 0)
    if sk.n == 1:
        item = next(float(lv[0]) for lv in sk.levels if lv.shape[0])
        return struct.pack("<BBBBHBB", _PRE_INTS_EMPTY_SINGLE,
                           _SER_VER_SINGLE, _FAMILY_KLL,
                           _FLAG_SINGLE | _FLAG_DOUBLES, sk.k, _M, 0) \
            + struct.pack("<d", item)
    levels = [np.sort(lv) for lv in sk.levels]
    while len(levels) > 1 and levels[-1].shape[0] == 0:
        levels.pop()
    num_levels = len(levels)
    sizes = [lv.shape[0] for lv in levels]
    starts = np.cumsum([0] + sizes[:-1]).astype("<i4")
    hdr = struct.pack("<BBBBHBB", _PRE_INTS_FULL, _SER_VER_FULL, _FAMILY_KLL,
                      _FLAG_DOUBLES | _FLAG_L0_SORTED, sk.k, _M, 0)
    body = struct.pack("<qHBB", sk.n, sk.k, num_levels, 0)
    items = np.concatenate(levels) if levels else np.empty(0, np.float64)
    return (hdr + body + starts.tobytes()
            + struct.pack("<dd", sk.min_value, sk.max_value)
            + items.astype("<f8").tobytes())


def from_java_bytes(buf: bytes) -> KllDoublesSketch:
    """Heapify a compact KLL image — doubles OR floats — into the
    engine's doubles sketch (KllDoublesSketch/KllFloatsSketch.heapify
    counterparts for the compact forms; float items widen losslessly
    to float64, validated on the reference's own
    kll_sketch_float_one_item_v1.sk golden)."""
    if len(buf) < 8:
        raise ValueError("KLL image too short")
    pre_ints, ser_ver, fam, flags, k, m, _u = struct.unpack_from(
        "<BBBBHBB", buf, 0)
    if fam != _FAMILY_KLL:
        raise ValueError(f"family {fam} is not a KLL image (need 15)")
    is_double = bool(flags & _FLAG_DOUBLES)
    fmt, width = ("<f8", 8) if is_double else ("<f4", 4)
    if flags & _FLAG_UPDATABLE or ser_ver == 3:
        raise ValueError("updatable-memory KLL format not supported")
    if flags & _FLAG_EMPTY:
        return KllDoublesSketch(k, 0, np.inf, -np.inf,
                                [np.empty(0, np.float64)])
    if flags & _FLAG_SINGLE or ser_ver == _SER_VER_SINGLE:
        item = float(np.frombuffer(buf, dtype=fmt, count=1, offset=8)[0])
        return KllDoublesSketch(k, 1, item, item,
                                [np.array([item], np.float64)])
    if pre_ints != _PRE_INTS_FULL:
        raise ValueError(f"full KLL preInts must be 5, got {pre_ints}")
    n = struct.unpack_from("<q", buf, 8)[0]
    num_levels = buf[18]
    off = 20
    starts = np.frombuffer(buf, dtype="<i4", count=num_levels,
                           offset=off).astype(np.int64)
    off += num_levels * 4
    mn, mx = (float(v) for v in
              np.frombuffer(buf, dtype=fmt, count=2, offset=off))
    off += 2 * width
    retained = (len(buf) - off) // width
    items = np.frombuffer(buf, dtype=fmt, count=retained,
                          offset=off).astype(np.float64)
    # levels may carry a non-zero base offset (the reference serializes
    # raw in-memory offsets; items start at starts[0])
    rel = starts - starts[0]
    bounds = np.append(rel, retained)
    levels = [items[bounds[i]:bounds[i + 1]].copy()
              for i in range(num_levels)]
    if not flags & _FLAG_L0_SORTED and levels:
        levels[0] = np.sort(levels[0])
    return KllDoublesSketch(k, n, mn, mx, levels)


# ---------------------------------------------------------------------------
# classic quantiles (DoublesSketch) images — read path
# ---------------------------------------------------------------------------

_FAMILY_QUANTILES = 8
_Q_FLAG_EMPTY = 4
_Q_FLAG_COMPACT = 8


def classic_doubles_from_java_bytes(buf: bytes) -> KllDoublesSketch:
    """Heapify a CLASSIC quantiles DoublesSketch image (any serVer
    1/2/3 — quantiles/PreambleUtil.java layout,
    HeapUpdateDoublesSketch.heapifyInstance:126 +
    srcMemoryToCombinedBuffer:280) into the engine's KLL form.

    The classic sketch is a base buffer (weight-1 items) plus k-sized
    levels where classic level i carries weight 2^(i+1) — exactly a
    KLL level i+1 — so the state maps losslessly: KLL level 0 = base
    buffer, KLL level i+1 = classic level i (present iff bit i of
    n/(2k) is set).  This makes SURVEY §2.4's "classic subsumed by
    KLL" concrete: legacy images from v0.3.0 on heapify and answer
    quantile queries (validated on the reference's 8 in-tree
    Qk128_n{50,1000}_v0.{3,6,8}*.sk goldens with its own expected
    medians)."""
    if len(buf) < 8:
        raise ValueError("quantiles image too short")
    _pre, ser_ver, fam, flags, k = struct.unpack_from("<BBBBH", buf, 0)
    if fam != _FAMILY_QUANTILES:
        raise ValueError(f"family {fam} is not a classic quantiles "
                         f"image (need 8)")
    if ser_ver not in (1, 2, 3):
        raise ValueError(f"unsupported quantiles serVer {ser_ver}")
    if flags & _Q_FLAG_EMPTY:
        return KllDoublesSketch(k, 0, np.inf, -np.inf,
                                [np.empty(0, np.float64)])
    n = struct.unpack_from("<q", buf, 8)[0]
    mn, mx = struct.unpack_from("<dd", buf, 16)
    # serVer 1 carries an extra buffer-alloc long before the data
    data_off = 40 if ser_ver == 1 else 32
    compact = (ser_ver == 2) or bool(flags & _Q_FLAG_COMPACT)
    bb_cnt = int(n % (2 * k))
    bit_pattern = n // (2 * k)
    base = np.frombuffer(buf, dtype="<f8", count=bb_cnt,
                         offset=data_off).astype(np.float64)
    levels = [np.sort(base)]
    if compact:
        off = data_off + bb_cnt * 8
        bp, i = bit_pattern, 0
        while bp:
            if bp & 1:
                lv = np.frombuffer(buf, dtype="<f8", count=k,
                                   offset=off).astype(np.float64)
                off += k * 8
            else:
                lv = np.empty(0, np.float64)
            levels.append(lv)
            bp >>= 1
            i += 1
    else:  # full combined buffer: levels at fixed offsets (2+i)*k
        bp, i = bit_pattern, 0
        while bp:
            if bp & 1:
                off = data_off + (2 + i) * k * 8
                lv = np.frombuffer(buf, dtype="<f8", count=k,
                                   offset=off).astype(np.float64)
            else:
                lv = np.empty(0, np.float64)
            levels.append(lv)
            bp >>= 1
            i += 1
    return KllDoublesSketch(k, n, float(mn), float(mx), levels)
