"""HLL_8 reference-binary serde tests — layout-literal checks against
hll/PreambleUtil.java:36-151 plus state/accumulator invariants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datasketches_java_spark.sketches import hll
from datasketches_java_spark.sketches.hll_serde import (
    from_java_bytes,
    to_java_bytes,
)


def test_layout_literals_and_roundtrip():
    sk = hll.sketch_longs(np.arange(100_000), lg_k=12)
    img = to_java_bytes(sk)
    # preInts=10, serVer=1, famID=7, lgK, lgArr=0, mode=HLL_8|HLL=10
    assert img[0] == 10 and img[1] == 1 and img[2] == 7
    assert img[3] == 12 and img[4] == 0 and img[7] == 10
    assert len(img) == 40 + (1 << 12)
    # flags: readOnly | outOfOrder (merge-based estimator), not empty
    assert img[5] & 16 and img[5] & 2 and not img[5] & 4
    rt = from_java_bytes(img)
    assert rt.lg_k == sk.lg_k
    assert np.array_equal(rt.regs, sk.regs)
    assert rt.estimate() == sk.estimate()


def test_accumulator_invariants():
    """curMin/numAtCurMin and the kxq0/kxq1 split must satisfy the
    reference's running-sum invariants (hll/HllArray.java:48-79) so a
    reference consumer's composite estimator works off this image."""
    sk = hll.sketch_longs(np.arange(500_000), lg_k=10)
    img = to_java_bytes(sk)
    cur_min = img[6]
    hip, kxq0, kxq1, n_at_min, aux = struct.unpack_from("<dddii", img, 8)
    assert cur_min == int(sk.regs.min())
    assert n_at_min == int(np.count_nonzero(sk.regs == cur_min))
    assert aux == 0 and hip == 0.0
    inv = np.exp2(-sk.regs.astype(np.float64))
    assert kxq0 == pytest.approx(float(inv[sk.regs < 32].sum()), rel=1e-12)
    assert kxq1 == pytest.approx(float(inv[sk.regs >= 32].sum()), rel=1e-12)


def test_empty_flag():
    img = to_java_bytes(hll.empty(lg_k=8))
    assert img[5] & 4  # empty flag
    rt = from_java_bytes(img)
    assert np.all(rt.regs == 0)


def test_union_through_wire_is_bit_exact():
    a = hll.sketch_longs(np.arange(0, 80_000), lg_k=11)
    b = hll.sketch_longs(np.arange(40_000, 120_000), lg_k=11)
    native = hll.union_many([a, b])
    via = hll.union_many([from_java_bytes(to_java_bytes(a)),
                          from_java_bytes(to_java_bytes(b))])
    assert np.array_equal(via.regs, native.regs)


def test_rejects_corrupt_preambles():
    sk = hll.sketch_longs(np.arange(1000), lg_k=8)
    img = bytearray(to_java_bytes(sk))
    img[7] = 0b1001  # claims SET mode but preInts is still 10
    with pytest.raises(ValueError, match="SET-mode preInts"):
        from_java_bytes(bytes(img))
    img[7] = 0b1000  # claims LIST mode, preInts 10
    with pytest.raises(ValueError, match="LIST-mode preInts"):
        from_java_bytes(bytes(img))
    img[7] = 10
    img[2] = 3
    with pytest.raises(ValueError, match="family"):
        from_java_bytes(bytes(img))
    img[2] = 7
    img[7] = 0b1111  # curMode 3 is undefined
    with pytest.raises(ValueError, match="curMode"):
        from_java_bytes(bytes(img))


# ---------------------------------------------------------------------------
# HLL_4 / HLL_6 / LIST / SET read-path promotion (images built
# byte-by-byte per hll/PreambleUtil.java:36-151; estimates must be
# identical after heapify — hll/CrossCountingTest.java:33-40)
# ---------------------------------------------------------------------------

def _truth(lg_k: int, slots, vals) -> hll.HllSketch:
    regs = np.zeros(1 << lg_k, dtype=np.uint8)
    np.maximum.at(regs, np.asarray(slots), np.asarray(vals, dtype=np.uint8))
    return hll.HllSketch(lg_k, hll._seed_hash(9001), regs)


def _pre(pre_ints, lg_k, lg_arr, flags, byte6, mode) -> bytes:
    return struct.pack("<BBBBBBBB", pre_ints, 1, 7, lg_k, lg_arr, flags,
                       byte6, mode)


def _coupon(slot, value, lg_k, noise=0):
    # key = low-26 hash bits; bits lgK..25 are hash bits the slot mask
    # must ignore — set them nonzero to prove the mask is applied
    key = slot | (noise << lg_k) & ((1 << 26) - 1)
    return (value << 26) | key


def test_list_mode_promotes():
    lg_k = 11
    rng = np.random.default_rng(1)
    slots = rng.integers(0, 1 << lg_k, 6)
    vals = rng.integers(1, 30, 6)
    coupons = np.asarray([
        _coupon(int(s), int(v), lg_k, noise=i + 1)
        for i, (s, v) in enumerate(zip(slots, vals))], dtype="<u4")
    img = _pre(2, lg_k, 3, 0, len(coupons), 0b1000) + coupons.tobytes()
    got = from_java_bytes(img)
    exp = _truth(lg_k, slots, vals)
    assert np.array_equal(got.regs, exp.regs)
    assert got.estimate() == exp.estimate()


@pytest.mark.parametrize("compact", [True, False])
def test_set_mode_promotes(compact):
    lg_k = 12
    rng = np.random.default_rng(2)
    slots = rng.integers(0, 1 << lg_k, 300)
    vals = rng.integers(1, 40, 300)
    coupons = np.asarray([
        _coupon(int(s), int(v), lg_k, noise=i)
        for i, (s, v) in enumerate(zip(slots, vals))], dtype="<u4")
    lg_arr = 10
    if compact:
        payload, flags = coupons, 8
    else:  # open-address table with EMPTY(0) slots interspersed
        table = np.zeros(1 << lg_arr, dtype="<u4")
        table[rng.choice(1 << lg_arr, size=len(coupons), replace=False)] \
            = coupons
        payload, flags = table, 0
    img = (_pre(3, lg_k, lg_arr, flags, 0, 0b1001)
           + struct.pack("<i", len(coupons)) + payload.tobytes())
    got = from_java_bytes(img)
    exp = _truth(lg_k, slots, vals)
    assert np.array_equal(got.regs, exp.regs)
    assert got.estimate() == exp.estimate()


@pytest.mark.parametrize("compact_aux", [True, False])
def test_hll4_promotes_with_aux_exceptions(compact_aux):
    lg_k = 10
    m = 1 << lg_k
    sk = hll.sketch_longs(np.arange(200_000), lg_k=lg_k)
    regs = sk.regs.copy()
    cur_min = int(regs.min())
    # force a couple of exception slots (value - curMin >= 15)
    regs[7] = cur_min + 20
    regs[m - 3] = cur_min + 33
    nib = np.minimum(regs - cur_min, 15).astype(np.uint8)
    packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
    exc_slots = np.nonzero(nib == 15)[0]
    aux_pairs = np.asarray(
        [(int(regs[s]) << 26) | int(s) for s in exc_slots], dtype="<u4")
    lg_aux_arr = 4
    if compact_aux:
        aux_payload, flags = aux_pairs, 8
    else:
        table = np.zeros(1 << lg_aux_arr, dtype="<u4")
        table[:len(aux_pairs)] = aux_pairs
        aux_payload, flags = table, 0
    img = (_pre(10, lg_k, lg_aux_arr, flags, cur_min, 0b0010)
           + struct.pack("<dddii", 0.0, 0.0, 0.0, 0, len(aux_pairs))
           + packed.tobytes() + aux_payload.tobytes())
    got = from_java_bytes(img)
    assert np.array_equal(got.regs, regs)
    assert got.estimate() == hll.HllSketch(lg_k, sk.seed_hash, regs).estimate()


def test_hll6_promotes():
    lg_k = 9
    m = 1 << lg_k
    sk = hll.sketch_longs(np.arange(100_000), lg_k=lg_k)
    regs = sk.regs
    # pack 6-bit little-endian per hll/Hll6Array.put6Bit
    bits = np.unpackbits(regs[:, None], axis=1, bitorder="little")[:, :6]
    packed = np.packbits(bits.ravel(), bitorder="little")
    img = (_pre(10, lg_k, 0, 0, 0, 0b0110)
           + struct.pack("<dddii", 0.0, 0.0, 0.0, 0, 0)
           + packed.tobytes())
    got = from_java_bytes(img)
    assert np.array_equal(got.regs, regs)
    assert got.estimate() == sk.estimate()


def test_promoted_hll4_merges_with_engine_sketch():
    """A heapified HLL_4 image participates in engine unions like any
    native sketch (the interop point of the read path)."""
    lg_k = 10
    a = hll.sketch_longs(np.arange(50_000), lg_k=lg_k)
    cur_min = int(a.regs.min())
    nib = np.minimum(a.regs - cur_min, 15).astype(np.uint8)
    packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
    exc_slots = np.nonzero(nib == 15)[0]
    aux = np.asarray([(int(a.regs[s]) << 26) | int(s) for s in exc_slots],
                     dtype="<u4")
    img = (_pre(10, lg_k, 0, 8, cur_min, 0b0010)
           + struct.pack("<dddii", 0.0, 0.0, 0.0, 0, len(aux))
           + packed.tobytes() + aux.tobytes())
    promoted = from_java_bytes(img)
    b = hll.sketch_longs(np.arange(25_000, 75_000), lg_k=lg_k)
    merged = hll.union(promoted, b)
    native = hll.union(a, b)
    assert np.array_equal(merged.regs, native.regs)


def test_hll4_write_roundtrip_and_size():
    """Write path for the reference's default target type: HLL_4
    compact images round-trip bit-exactly through the engine's own
    HLL_4 reader and are ~half the HLL_8 dense size."""
    from datasketches_java_spark.sketches.hll_serde import to_java_bytes_hll4
    for n in (0, 100, 50_000, 400_000):
        sk = hll.sketch_longs(np.arange(n), lg_k=11)
        img4 = to_java_bytes_hll4(sk)
        assert img4[7] == 0b0010          # HLL_4 + HLL mode
        assert img4[5] & 8                # compact flag (aux is compact)
        back = from_java_bytes(img4)
        assert np.array_equal(back.regs, sk.regs)
        assert back.estimate() == sk.estimate()
    img8 = to_java_bytes(hll.sketch_longs(np.arange(50_000), lg_k=11))
    img4 = to_java_bytes_hll4(hll.sketch_longs(np.arange(50_000), lg_k=11))
    assert len(img4) <= len(img8) // 2 + 40 + 64  # nibbles + small aux


def test_hll4_write_forces_aux_exceptions():
    """A register >= curMin+15 must land in the aux pair array with
    its exact value (the AuxHashMap contract)."""
    import struct as _s
    from datasketches_java_spark.sketches.hll_serde import to_java_bytes_hll4
    sk = hll.sketch_longs(np.arange(300_000), lg_k=8)
    regs = sk.regs.copy()
    regs[5] = regs.min() + 25           # forced exception
    forced = hll.HllSketch(sk.lg_k, sk.seed_hash, regs)
    img = to_java_bytes_hll4(forced)
    (aux_count,) = _s.unpack_from("<i", img, 36)
    assert aux_count >= 1
    back = from_java_bytes(img)
    assert back.regs[5] == regs[5]
    assert np.array_equal(back.regs, regs)


def test_hll6_write_roundtrip_size_and_cross_type_identity():
    """HLL_6 write path (hll/Hll6Array.java packing): round-trips
    bit-exactly through the engine's HLL_6 reader, uses the
    reference's exact array size (3m/4 + 1,
    AbstractHllArray.hll6ArrBytes), and preserves the
    hll/CrossCountingTest.java:33-40 invariant — HLL_4/6/8 images of
    the SAME sketch produce identical estimates."""
    from datasketches_java_spark.sketches.hll_serde import (
        to_java_bytes_hll4, to_java_bytes_hll6)
    for n in (0, 100, 50_000, 400_000):
        sk = hll.sketch_longs(np.arange(n), lg_k=11)
        img6 = to_java_bytes_hll6(sk)
        assert img6[7] == 0b0110          # HLL_6 + HLL mode
        m = 1 << sk.lg_k
        assert len(img6) == 40 + (3 * m) // 4 + 1
        back6 = from_java_bytes(img6)
        assert np.array_equal(back6.regs, sk.regs)
        # cross-type identity across all three written target types
        est8 = from_java_bytes(to_java_bytes(sk)).estimate()
        est6 = back6.estimate()
        est4 = from_java_bytes(to_java_bytes_hll4(sk)).estimate()
        assert est8 == est6 == est4 == sk.estimate()


def test_hll6_write_rejects_overflow_register():
    from datasketches_java_spark.sketches.hll_serde import to_java_bytes_hll6
    sk = hll.sketch_longs(np.arange(100), lg_k=8)
    regs = sk.regs.copy()
    regs[3] = 64
    with pytest.raises(ValueError, match="HLL_6"):
        to_java_bytes_hll6(hll.HllSketch(sk.lg_k, sk.seed_hash, regs))


def test_hll4_reader_rejects_incomplete_aux_map():
    """Round-4 hardening: an HLL_4 image whose aux map resolves only
    SOME of its AUX_TOKEN nibbles must be rejected (the reference
    throws in AuxHashMap.mustFindValueFor), even when aux_count > 0."""
    import struct as _s
    from datasketches_java_spark.sketches.hll_serde import to_java_bytes_hll4
    sk = hll.sketch_longs(np.arange(300_000), lg_k=8)
    regs = sk.regs.copy()
    regs[5] = regs.min() + 25
    regs[9] = regs.min() + 30           # two exceptions
    img = bytearray(to_java_bytes_hll4(
        hll.HllSketch(sk.lg_k, sk.seed_hash, regs)))
    (aux_count,) = _s.unpack_from("<i", img, 36)
    assert aux_count == 2
    # drop the last aux pair but keep its AUX_TOKEN nibble
    _s.pack_into("<i", img, 36, 1)
    with pytest.raises(ValueError, match="unresolved AUX_TOKEN"):
        from_java_bytes(bytes(img[:-4]))
