"""VarOpt / Reservoir reference wire-format tests: layout literals per
sampling/PreambleUtil.java:54-157, round-trips across the empty /
warmup / full / gadget forms, and through-the-wire unions."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datasketches_java_spark.sketches.sampling import ReservoirSketch
from datasketches_java_spark.sketches.sampling_serde import (
    reservoir_from_java_bytes, reservoir_to_java_bytes,
    varopt_from_java_bytes, varopt_to_java_bytes)
from datasketches_java_spark.sketches.varopt import VarOptSketch, VarOptUnion


def test_varopt_empty_layout_literal():
    img = varopt_to_java_bytes(VarOptSketch(32))
    assert len(img) == 8  # Family.VAROPT minPreLongs << 3
    b0, ser, fam, flags, k = struct.unpack_from("<BBBBi", img)
    assert (b0 & 0x3F, ser, fam) == (1, 2, 13)
    assert flags & 4  # EMPTY
    assert k == 32
    assert varopt_from_java_bytes(img).num_samples() == 0


def test_varopt_warmup_layout_and_roundtrip():
    """VarOptItemsSketchTest.checkUnderFullSketchSerialization: warmup
    images carry 3 preLongs."""
    sk = VarOptSketch(2048)
    for i in range(10):
        sk.update(i, 1.0)
    img = varopt_to_java_bytes(sk)
    assert (img[0] & 0x3F) == 3  # VO_PRELONGS_WARMUP
    back = varopt_from_java_bytes(img)
    assert back.n == 10 and back.h_count == 10 and back.r_count == 0
    ia, wa = sk.samples()
    ib, wb = back.samples()
    assert sorted(ia) == sorted(ib)
    assert np.allclose(sorted(wa), sorted(wb))


def test_varopt_full_layout_and_roundtrip():
    """checkFullSketchSerialization: full images carry 4 preLongs;
    heavy items keep exact weights through the wire."""
    sk = VarOptSketch(32)
    for i in range(32):
        sk.update(i, 1.0)
    sk.update(100, 100.0)
    sk.update(101, 101.0)
    img = varopt_to_java_bytes(sk)
    assert (img[0] & 0x3F) == 4  # Family.VAROPT maxPreLongs
    back = varopt_from_java_bytes(img)
    assert back.n == sk.n
    assert back.h_count == sk.h_count and back.r_count == sk.r_count
    assert back.total_wt_r == sk.total_wt_r
    items, weights = back.samples()
    hw = dict(zip(items[:back.h_count], weights[:back.h_count]))
    assert hw[100] == 100.0 and hw[101] == 101.0
    assert back.tau() == sk.tau()


def test_varopt_gadget_marks_roundtrip():
    """Union gadgets serialize marks bit-packed (GADGET flag 128,
    ArrayOfBooleansSerDe packing)."""
    sk = VarOptSketch(16)
    for i in range(10):
        sk.update(i, float(i + 1), mark=(i % 3 == 0))
    assert sk.num_marks_in_h > 0
    img = varopt_to_java_bytes(sk)
    assert img[3] & 128  # GADGET flag
    back = varopt_from_java_bytes(img)
    assert back.num_marks_in_h == sk.num_marks_in_h
    marked = sorted(e[2] for e in back.heap if e[3])
    assert marked == sorted(e[2] for e in sk.heap if e[3])


def test_varopt_union_through_the_wire():
    rng = np.random.default_rng(7)
    imgs = []
    total = 0.0
    for p in range(4):
        sk = VarOptSketch(64)
        w = rng.exponential(3.0, 500)
        for i in range(500):
            sk.update(p * 1000 + i, float(w[i]))
        total += float(w.sum())
        imgs.append(varopt_to_java_bytes(sk))
    u = VarOptUnion(64)
    for b in imgs:
        u.update(varopt_from_java_bytes(b))
    res = u.get_result()
    assert res.n == 2000
    assert abs(res.total_weight() / total - 1.0) < 1e-9


def test_reservoir_layout_and_roundtrip():
    empty = reservoir_to_java_bytes(ReservoirSketch(100))
    assert len(empty) == 8
    assert empty[2] == 11 and empty[3] & 4
    assert reservoir_from_java_bytes(empty).n == 0

    sk = ReservoirSketch(64)
    sk.update_batch(range(1000))
    img = reservoir_to_java_bytes(sk)
    b0, ser, fam, flags, k = struct.unpack_from("<BBBBi", img)
    assert (b0 & 0x3F, ser, fam, flags, k) == (2, 2, 11, 0, 64)
    assert len(img) == 16 + 64 * 8
    back = reservoir_from_java_bytes(img)
    assert back.n == 1000 and back.k == 64
    assert back.samples == sk.samples[:64]


def test_rejections():
    with pytest.raises(ValueError, match="family"):
        varopt_from_java_bytes(struct.pack("<BBBBi", 1, 2, 11, 4, 8))
    with pytest.raises(ValueError, match="family"):
        reservoir_from_java_bytes(struct.pack("<BBBBi", 1, 2, 13, 4, 8))
    with pytest.raises(ValueError, match="serVer"):
        varopt_from_java_bytes(struct.pack("<BBBBi", 1, 1, 13, 4, 8))
