"""Reference-binary frequent-items serde — LongsSketch images.

Byte layout per frequencies/PreambleUtil.java:74-89 and the writer
frequencies/LongsSketch.java:565-605 (little-endian):

  empty (8B) : {preLongs=1, serVer=1, famID=10, lgMaxMapSize,
                lgCurMapSize, flags=EMPTY(4), 0, 0}
  full       : pre0 {preLongs=4, serVer=1, famID=10, lgMaxMapSize,
                lgCurMapSize, flags=0, 0, 0},
               long1 = activeItems (int, low half),
               long2 = streamWeight, long3 = offset,
               then activeItems VALUE longs followed by activeItems
               KEY longs (values before keys, LongsSketch.java:599-602).

Semantics note: the reference's stored value per key IS the guaranteed
lower bound (getLowerBound returns it verbatim; getEstimate adds the
global offset — LongsSketch.java:378-396), which is exactly this
engine's ``counts`` dict, so values transfer with no adjustment.
Long-keyed sketches only (the generic ItemsSketch wire form needs a
pluggable serde and is out of scope); non-integer keys are rejected.
"""

from __future__ import annotations

import struct

import numpy as np

from .frequencies import ItemsSketch

_SER_VER = 1
_FAMILY_FREQ = 10
_FLAG_EMPTY = 4
_LG_MIN_MAP_SIZE = 3
_LOAD_FACTOR = 0.75


def _lg(x: int) -> int:
    lg = 0
    while (1 << lg) < x:
        lg += 1
    return lg


def _lg_cur_map_size(active: int) -> int:
    lg = _LG_MIN_MAP_SIZE
    while (1 << lg) * _LOAD_FACTOR < active:
        lg += 1
    return lg


def to_java_bytes(sk: ItemsSketch) -> bytes:
    """Serialize to the reference's LongsSketch image
    (LongsSketch.toByteArray:565)."""
    lg_max = _lg(sk.max_map_size)
    if not sk.counts:
        return struct.pack("<BBBBBBBB", 1, _SER_VER, _FAMILY_FREQ, lg_max,
                           _LG_MIN_MAP_SIZE, _FLAG_EMPTY, 0, 0)
    try:
        keys = np.array(sorted(int(k) for k in sk.counts), dtype=np.int64)
    except (TypeError, ValueError) as e:
        raise ValueError(
            "LongsSketch images carry long keys only; "
            f"non-integer item present: {e}") from e
    values = np.array([sk.counts[int(k)] for k in keys], dtype=np.int64)
    active = keys.shape[0]
    pre0 = struct.pack("<BBBBBBBB", 4, _SER_VER, _FAMILY_FREQ, lg_max,
                       _lg_cur_map_size(active), 0, 0, 0)
    pre = pre0 + struct.pack("<iiqq", active, 0, sk.stream_weight, sk.offset)
    return pre + values.astype("<i8").tobytes() + keys.astype("<i8").tobytes()


def from_java_bytes(buf: bytes) -> ItemsSketch:
    """Heapify a LongsSketch image (LongsSketch.getInstance
    counterpart)."""
    if len(buf) < 8:
        raise ValueError("frequencies image too short")
    pre_longs, ser_ver, fam, lg_max, _lg_cur, flags, _u1, _u2 = \
        struct.unpack_from("<BBBBBBBB", buf, 0)
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported frequencies serVer {ser_ver}")
    if fam != _FAMILY_FREQ:
        raise ValueError(f"family {fam} is not a frequencies image (need 10)")
    max_map_size = 1 << lg_max
    if flags & _FLAG_EMPTY or pre_longs == 1:
        return ItemsSketch(max_map_size)
    active, _pad, stream_weight, offset = struct.unpack_from("<iiqq", buf, 8)
    off = pre_longs << 3
    values = np.frombuffer(buf, dtype="<i8", count=active, offset=off)
    off += active * 8
    keys = np.frombuffer(buf, dtype="<i8", count=active, offset=off)
    counts = {int(k): int(v) for k, v in zip(keys, values)}
    return ItemsSketch(max_map_size, counts, int(offset), int(stream_weight))


# ---------------------------------------------------------------------------
# generic-items (string-keyed) images — frequencies/ItemsSketch.java
# ---------------------------------------------------------------------------
#
# Same preamble as LongsSketch; after the 4 preamble longs come the
# activeItems VALUE longs, then the KEYS via an ArrayOfItemsSerDe —
# here ArrayOfStringsSerDe (common/ArrayOfStringsSerDe.java:39:
# int32 UTF-8 length + bytes per item), the form Hive/Pig string
# columns use (ItemsSketch.toByteArray:494-535).


def items_to_java_bytes(sk: ItemsSketch) -> bytes:
    """Serialize to the reference's generic ItemsSketch image with
    string keys (ArrayOfStringsSerDe payload)."""
    lg_max = _lg(sk.max_map_size)
    if not sk.counts:
        return struct.pack("<BBBBBBBB", 1, _SER_VER, _FAMILY_FREQ, lg_max,
                           _LG_MIN_MAP_SIZE, _FLAG_EMPTY, 0, 0)
    keys = sorted(str(k) for k in sk.counts)
    values = np.array([sk.counts[k] for k in keys], dtype=np.int64)
    active = len(keys)
    pre0 = struct.pack("<BBBBBBBB", 4, _SER_VER, _FAMILY_FREQ, lg_max,
                       _lg_cur_map_size(active), 0, 0, 0)
    pre = pre0 + struct.pack("<iiqq", active, 0, sk.stream_weight, sk.offset)
    payload = []
    for k in keys:
        b = k.encode("utf-8")
        payload.append(struct.pack("<i", len(b)))
        payload.append(b)
    return pre + values.astype("<i8").tobytes() + b"".join(payload)


def items_from_java_bytes(buf: bytes) -> ItemsSketch:
    """Heapify a string-keyed generic ItemsSketch image
    (ItemsSketch.getInstance counterpart with ArrayOfStringsSerDe)."""
    if len(buf) < 8:
        raise ValueError("frequencies image too short")
    pre_longs, ser_ver, fam, lg_max, _lg_cur, flags, _u1, _u2 = \
        struct.unpack_from("<BBBBBBBB", buf, 0)
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported frequencies serVer {ser_ver}")
    if fam != _FAMILY_FREQ:
        raise ValueError(f"family {fam} is not a frequencies image (need 10)")
    max_map_size = 1 << lg_max
    if flags & _FLAG_EMPTY or pre_longs == 1:
        return ItemsSketch(max_map_size)
    active, _pad, stream_weight, offset = struct.unpack_from("<iiqq", buf, 8)
    off = pre_longs << 3
    values = np.frombuffer(buf, dtype="<i8", count=active, offset=off)
    off += active * 8
    counts = {}
    for i in range(active):
        (ln,) = struct.unpack_from("<i", buf, off)
        off += 4
        counts[buf[off:off + ln].decode("utf-8")] = int(values[i])
        off += ln
    return ItemsSketch(max_map_size, counts, int(offset), int(stream_weight))
