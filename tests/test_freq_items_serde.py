"""String-keyed frequent-items wire format (frequencies/ItemsSketch
.java toByteArray:494 with ArrayOfStringsSerDe payloads)."""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_java_spark.sketches.frequencies import ItemsSketch
from datasketches_java_spark.sketches.freq_serde import (
    from_java_bytes, items_from_java_bytes, items_to_java_bytes)


def test_empty_and_exact_roundtrip():
    assert items_from_java_bytes(
        items_to_java_bytes(ItemsSketch(256))).counts == {}
    sk = ItemsSketch(256)
    sk.update_batch(["com", "org", "com", "net", "ümlaut.de"],
                    [5, 3, 2, 1, 4])
    back = items_from_java_bytes(items_to_java_bytes(sk))
    assert back.counts == {"com": 7, "org": 3, "net": 1, "ümlaut.de": 4}
    assert back.stream_weight == sk.stream_weight
    assert back.offset == 0


def test_estimation_mode_roundtrip_and_merge():
    rng = np.random.default_rng(3)
    sk = ItemsSketch(64)
    doms = [f"d{int(x)}.com" for x in rng.zipf(1.5, 20_000) % 3000]
    sk.update_batch(doms)
    assert sk.offset > 0  # purged -> estimation mode
    back = items_from_java_bytes(items_to_java_bytes(sk))
    assert back.counts == sk.counts
    assert back.offset == sk.offset
    assert back.stream_weight == sk.stream_weight
    other = ItemsSketch(64)
    other.update_batch(["d1.com"] * 500)
    back.merge(other)
    assert back.estimate("d1.com") >= 500


def test_layout_is_longs_compatible_preamble():
    """The generic image shares the LongsSketch preamble; a longs
    reader must reject it only at the key-decoding stage, never
    misread — here we check the preamble fields line up."""
    sk = ItemsSketch(128)
    sk.update_batch(["a", "b"])
    img = items_to_java_bytes(sk)
    assert img[1] == 1 and img[2] == 10  # serVer, family FREQUENCY
    assert img[0] == 4                   # maxPreLongs
    # values region identical interpretation in both forms
    vals = np.frombuffer(img, "<i8", count=2, offset=32)
    assert sorted(vals.tolist()) == [1, 1]


def test_rejections():
    with pytest.raises(ValueError, match="family"):
        items_from_java_bytes(bytes([1, 1, 7, 8, 3, 4, 0, 0]))
    with pytest.raises(ValueError, match="serVer"):
        items_from_java_bytes(bytes([1, 9, 10, 8, 3, 4, 0, 0]))
