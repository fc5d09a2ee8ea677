"""Frequent-items LongsSketch-image serde tests (layout literals per
frequencies/PreambleUtil.java:74-89, LongsSketch.java:565-605)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datasketches_java_spark.sketches.freq_serde import (
    from_java_bytes,
    to_java_bytes,
)
from datasketches_java_spark.sketches.frequencies import ItemsSketch


def test_empty_layout():
    img = to_java_bytes(ItemsSketch(1024))
    assert img == struct.pack("<BBBBBBBB", 1, 1, 10, 10, 3, 4, 0, 0)
    rt = from_java_bytes(img)
    assert rt.counts == {} and rt.max_map_size == 1024


def test_full_layout_and_roundtrip_exact_mode():
    sk = ItemsSketch(1024).update_batch([7] * 50 + [42] * 30 + [9] * 5)
    img = to_java_bytes(sk)
    pre_longs, ser_ver, fam, lg_max = img[0], img[1], img[2], img[3]
    assert (pre_longs, ser_ver, fam, lg_max) == (4, 1, 10, 10)
    active, _p, sw, off = struct.unpack_from("<iiqq", img, 8)
    assert active == 3 and sw == 85 and off == 0
    # values precede keys (LongsSketch.java:599-602)
    values = np.frombuffer(img, dtype="<i8", count=3, offset=32)
    keys = np.frombuffer(img, dtype="<i8", count=3, offset=32 + 24)
    assert dict(zip(keys.tolist(), values.tolist())) == {7: 50, 42: 30, 9: 5}
    rt = from_java_bytes(img)
    assert rt.counts == sk.counts
    assert rt.stream_weight == 85 and rt.offset == 0


def test_estimation_mode_offset_transfers():
    """After purges the stored value is the LOWER bound (the reference
    stores the same), so counts/offset transfer verbatim and every
    estimate/bound agrees through the wire."""
    rng = np.random.default_rng(0)
    items = rng.zipf(1.3, 50_000) % 10_000
    sk = ItemsSketch(64).update_batch([int(x) for x in items])
    assert sk.offset > 0
    rt = from_java_bytes(to_java_bytes(sk))
    assert rt.offset == sk.offset
    assert rt.stream_weight == sk.stream_weight
    for item in list(sk.counts)[:10]:
        assert rt.lower_bound(item) == sk.lower_bound(item)
        assert rt.upper_bound(item) == sk.upper_bound(item)
        assert rt.estimate(item) == sk.estimate(item)


def test_merge_through_wire():
    a = ItemsSketch(256).update_batch([1] * 10 + [2] * 5)
    b = ItemsSketch(256).update_batch([2] * 7 + [3] * 4)
    native = ItemsSketch(256).merge(a).merge(b)
    via = ItemsSketch(256).merge(from_java_bytes(to_java_bytes(a))) \
        .merge(from_java_bytes(to_java_bytes(b)))
    assert via.counts == native.counts
    assert via.stream_weight == native.stream_weight


def test_rejects_non_integer_items_and_bad_images():
    sk = ItemsSketch(64).update_batch(["a", "b"])
    with pytest.raises(ValueError, match="long keys only"):
        to_java_bytes(sk)
    with pytest.raises(ValueError, match="family"):
        from_java_bytes(struct.pack("<BBBBBBBB", 1, 1, 9, 10, 3, 4, 0, 0))
