"""serVer-3 reference-binary theta serde tests.

Golden images are constructed INDEPENDENTLY of the writer, straight
from the documented byte layout (theta/PreambleUtil.java:28-133,
EmptyCompactSketch.java:39, SingleItemSketch.java:53) — so writer and
reader are checked against the spec, not against each other.  A frozen
on-disk golden (tests/golden/theta_serVer3_est.sk) guards against
accidental format drift.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from datasketches_java_spark.config import DEFAULT_UPDATE_SEED
from datasketches_java_spark.sketches import theta
from datasketches_java_spark.sketches.theta import MAX_THETA, compute_seed_hash
from datasketches_java_spark.sketches.theta_serde import (
    from_java_bytes,
    to_java_bytes,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "theta_serVer3_est.sk")
SEED_HASH = compute_seed_hash(DEFAULT_UPDATE_SEED)


def test_empty_image_is_spec_literal():
    """EmptyCompactSketch.java:39: { 1, 3, 3, 0, 0, 0x1E, 0, 0 }."""
    img = to_java_bytes(theta.empty())
    assert img == bytes([1, 3, 3, 0, 0, 0x1E, 0, 0])
    rt = from_java_bytes(img)
    assert rt.is_empty and rt.estimate() == 0.0


def test_single_item_pre0_matches_spec_literal():
    """SingleItemSketch.java:53-66:
    pre0 = (seedHash << 48) | 0x00_00_3A_00_00_03_03_01."""
    sk = theta.sketch_longs(np.array([42]), lg_k=12)
    img = to_java_bytes(sk)
    assert len(img) == 16
    pre0 = struct.unpack_from("<Q", img, 0)[0]
    assert pre0 == (SEED_HASH << 48) | 0x00003A0000030301
    assert struct.unpack_from("<Q", img, 8)[0] == int(sk.hashes[0])
    rt = from_java_bytes(img)
    assert rt.count == 1 and rt.estimate() == 1.0
    assert np.array_equal(rt.hashes, sk.hashes)


def test_exact_mode_roundtrip_and_layout():
    sk = theta.sketch_longs(np.arange(500), lg_k=12)
    img = to_java_bytes(sk)
    # preLongs=2, serVer=3, famID=3, flags RO|COMPACT|ORDERED
    assert img[0] == 2 and img[1] == 3 and img[2] == 3 and img[5] == 0x1A
    assert struct.unpack_from("<H", img, 6)[0] == SEED_HASH
    assert struct.unpack_from("<i", img, 8)[0] == 500
    assert struct.unpack_from("<f", img, 12)[0] == 1.0
    assert len(img) == 16 + 500 * 8
    rt = from_java_bytes(img)
    assert rt.count == 500 and rt.theta == MAX_THETA
    assert np.array_equal(rt.hashes, sk.hashes)
    assert rt.estimate() == sk.estimate()


def test_estimating_mode_roundtrip_and_layout():
    sk = theta.sketch_longs(np.arange(100_000), lg_k=12)
    assert sk.is_estimation_mode
    img = to_java_bytes(sk)
    assert img[0] == 3 and img[5] == 0x1A
    assert struct.unpack_from("<i", img, 8)[0] == sk.count
    assert struct.unpack_from("<q", img, 16)[0] == int(sk.theta)
    assert len(img) == 24 + sk.count * 8
    rt = from_java_bytes(img)
    assert rt.count == sk.count and rt.theta == sk.theta
    assert np.array_equal(rt.hashes, sk.hashes)
    assert rt.estimate() == sk.estimate()


def test_unordered_compact_is_sorted_on_read():
    """Reader accepts unordered compacts (ordered flag off) and sorts —
    wrap/heapify parity with CompactOperations' unordered form."""
    sk = theta.sketch_longs(np.arange(50_000), lg_k=12)
    rng = np.random.default_rng(0)
    shuffled = sk.hashes.copy()
    rng.shuffle(shuffled)
    img = (struct.pack("<BBBBBBH", 3, 3, 3, 0, 0, 0x0A, SEED_HASH)
           + struct.pack("<if", sk.count, 1.0)
           + struct.pack("<q", int(sk.theta))
           + shuffled.astype("<u8").tobytes())
    rt = from_java_bytes(img)
    assert np.array_equal(rt.hashes, sk.hashes)


def test_seed_hash_checked():
    sk = theta.sketch_longs(np.arange(100), lg_k=12)
    img = bytearray(to_java_bytes(sk))
    struct.pack_into("<H", img, 6, SEED_HASH ^ 0x5A5A)
    with pytest.raises(ValueError, match="seed-hash mismatch"):
        from_java_bytes(bytes(img))
    # skip check with seed=None
    rt = from_java_bytes(bytes(img), seed=None)
    assert rt.count == 100


def test_rejects_non_compact_and_other_servers():
    with pytest.raises(ValueError, match="serVer"):
        from_java_bytes(bytes([2, 2, 3, 0, 0, 0x1A, 1, 1]))
    with pytest.raises(ValueError, match="family"):
        from_java_bytes(bytes([3, 3, 2, 12, 13, 0, 1, 1]) + b"\0" * 16)


def test_frozen_golden_image():
    """The checked-in golden must heapify to the known state and be
    byte-identical to what the writer emits for that state."""
    golden = open(GOLDEN, "rb").read()
    rt = from_java_bytes(golden)
    sk = theta.sketch_longs(np.arange(100_000), lg_k=12)
    assert rt.count == sk.count
    assert rt.theta == sk.theta
    assert np.array_equal(rt.hashes, sk.hashes)
    assert to_java_bytes(sk) == golden


def test_union_after_heapify_matches_native():
    """Images exported, re-heapified and unioned give the identical
    result as native sketches (merge path through the wire format)."""
    a = theta.sketch_longs(np.arange(0, 60_000), lg_k=12)
    b = theta.sketch_longs(np.arange(30_000, 90_000), lg_k=12)
    native = theta.union(a, b)
    via_wire = theta.union(from_java_bytes(to_java_bytes(a)),
                           from_java_bytes(to_java_bytes(b)))
    assert via_wire.theta == native.theta
    assert np.array_equal(via_wire.hashes, native.hashes)


def _v1_image(sk) -> bytes:
    """Construct a serVer-1 image from the documented layout: preLongs
    always 3, compact ordered, no seed hash, no flags semantics."""
    pre0 = struct.pack("<BBBBBBH", 3, 1, 3, 12, 13, 0, 0)
    return (pre0 + struct.pack("<if", sk.count, 0.0)
            + struct.pack("<q", int(sk.theta))
            + sk.hashes.astype("<u8").tobytes())


def _v2_image(sk, pre_longs: int) -> bytes:
    pre0 = struct.pack("<BBBBBBH", pre_longs, 2, 3, 12, 13, 0x0A, SEED_HASH)
    parts = [pre0]
    if pre_longs >= 2:
        parts.append(struct.pack("<if", sk.count, 0.0))
    if pre_longs == 3:
        parts.append(struct.pack("<q", int(sk.theta)))
    parts.append(sk.hashes.astype("<u8").tobytes())
    return b"".join(parts)


def test_serVer1_heapify():
    """ForwardCompatibility.heapify1to3:53-84 semantics: preLongs 3,
    no stored seed hash (caller's seed supplies it), empty iff
    count==0 and theta==MAX."""
    est = theta.sketch_longs(np.arange(50_000), lg_k=12)
    rt = from_java_bytes(_v1_image(est), lg_k=12)
    assert rt.theta == est.theta
    assert np.array_equal(rt.hashes, est.hashes)
    assert rt.seed_hash == SEED_HASH  # derived from caller seed
    empty_img = struct.pack("<BBBBBBH", 3, 1, 3, 12, 13, 0, 0) + \
        struct.pack("<if", 0, 0.0) + struct.pack("<q", int(MAX_THETA))
    assert from_java_bytes(empty_img).is_empty
    with pytest.raises(ValueError, match="preLongs"):
        from_java_bytes(bytes([2, 1, 3, 0, 0, 0, 0, 0]) + b"\0" * 16)


def test_serVer2_heapify():
    """ForwardCompatibility.heapify2to3:87-118: preLongs 1/2/3 forms,
    seed hash checked like serVer 3."""
    exact = theta.sketch_longs(np.arange(500), lg_k=12)
    rt = from_java_bytes(_v2_image(exact, 2))
    assert rt.theta == MAX_THETA
    assert np.array_equal(rt.hashes, exact.hashes)
    est = theta.sketch_longs(np.arange(50_000), lg_k=12)
    rt = from_java_bytes(_v2_image(est, 3), lg_k=12)
    assert rt.theta == est.theta
    assert np.array_equal(rt.hashes, est.hashes)
    # preLongs 1 → empty
    assert from_java_bytes(
        struct.pack("<BBBBBBH", 1, 2, 3, 0, 0, 0x0A, SEED_HASH)).is_empty
    # seed-hash mismatch rejected
    bad = bytearray(_v2_image(exact, 2))
    struct.pack_into("<H", bad, 6, SEED_HASH ^ 0x1111)
    with pytest.raises(ValueError, match="seed-hash"):
        from_java_bytes(bytes(bad))
