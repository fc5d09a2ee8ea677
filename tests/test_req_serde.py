"""REQ reference-binary serde (req/ReqSerDe.java layouts).

No .sk golden ships in the reference tree for REQ, so the bar is the
layout-literal self-golden (bytes hand-assembled from the
ReqSerDe.java:44-121 byte diagrams), roundtrip across all four
formats, and a through-the-wire merge — the same bar as
hll_serde/kll_serde.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datasketches_java_spark.sketches import req, req_serde


def _sk(values, k=12, hra=True) -> req.ReqSketch:
    s = req.ReqSketch(k, hra)
    s.update_batch(np.asarray(values, dtype=np.float64))
    return s


# -- layout-literal self-goldens (ReqSerDe.java byte diagrams) -------------

def test_empty_image_layout():
    img = req_serde.to_java_bytes(req.ReqSketch(12, True))
    # PreInts=2, SerVer=1, FamID=17, flags=Empty|HRA|L0Sorted,
    # K=12, #Ctors=0, #Raw=0  (ReqSerDe.java:99-110)
    assert img == struct.pack("<BBBBHBB", 2, 1, 17,
                              0b00101100, 12, 0, 0)
    back = req_serde.from_java_bytes(img)
    assert back.n == 0 and back.k == 12 and back.hra


def test_raw_items_image_layout():
    img = req_serde.to_java_bytes(_sk([3.0, 1.0, 2.0]))
    # RawItems format: preInts=2, flags has RawItems bit, #Raw=3,
    # then 3 float32 items (ReqSerDe.java:83-97)
    hdr = struct.unpack_from("<BBBBHBB", img)
    assert hdr[0] == 2 and hdr[1] == 1 and hdr[2] == 17
    assert hdr[3] & (1 << 4)            # RawItems
    assert hdr[3] & (1 << 3)            # HRA
    assert hdr[4] == 12 and hdr[5] == 1 and hdr[6] == 3
    items = np.frombuffer(img, dtype="<f4", offset=8)
    assert sorted(items.tolist()) == [1.0, 2.0, 3.0]
    assert len(img) == 8 + 3 * 4


def test_exact_image_layout():
    vals = np.arange(1, 21, dtype=np.float64)   # n=20, one level
    sk = _sk(vals, k=50)
    assert sk.num_levels == 1
    img = req_serde.to_java_bytes(sk)
    pre_ints, _, fam, flags, k, n_ctors, n_raw = \
        struct.unpack_from("<BBBBHBB", img)
    assert (pre_ints, fam, k, n_ctors, n_raw) == (2, 17, 50, 1, 0)
    assert not flags & (1 << 4)
    # compactor: uint64 state, float32 ssf, lgWt, numSections, pad2,
    # int32 count, items (ReqCompactor.toByteArray:297-311)
    state, ssf, lg_wt, n_sec, count = struct.unpack_from("<QfBB2xi", img, 8)
    assert state == 0 and lg_wt == 0 and count == 20
    assert ssf == 50.0 and n_sec == req.INIT_NUM_SECTIONS
    items = np.frombuffer(img, dtype="<f4", count=20, offset=8 + 20)
    assert (items == np.sort(vals).astype(np.float32)).all()


def test_estimation_image_layout():
    rng = np.random.default_rng(7)
    sk = _sk(rng.integers(0, 1 << 20, 20000).astype(np.float64))
    assert sk.num_levels > 1
    img = req_serde.to_java_bytes(sk)
    pre_ints, _, _, flags, k, n_ctors, _ = struct.unpack_from("<BBBBHBB", img)
    assert pre_ints == 4 and n_ctors == sk.num_levels
    n, mn, mx = struct.unpack_from("<qff", img, 8)
    assert n == 20000
    assert mn == np.float32(sk.min_value) and mx == np.float32(sk.max_value)


# -- roundtrips -------------------------------------------------------------

@pytest.mark.parametrize("n", [0, 1, 4, 20, 500, 20000])
@pytest.mark.parametrize("hra", [True, False])
def test_roundtrip(n, hra):
    rng = np.random.default_rng(n + int(hra))
    vals = rng.integers(0, 1 << 20, n).astype(np.float64)
    sk = _sk(vals, k=12, hra=hra)
    back = req_serde.from_java_bytes(req_serde.to_java_bytes(sk))
    assert back.k == sk.k and back.hra == sk.hra and back.n == sk.n
    assert back.num_levels == sk.num_levels
    if n:
        assert back.min_value == np.float32(sk.min_value)
        assert back.max_value == np.float32(sk.max_value)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            assert back.quantile(q) == sk.quantile(q)
    for a, b in zip(back.compactors, sk.compactors):
        assert a.state == b.state
        assert a.num_sections == b.num_sections
        assert a.section_size == b.section_size
        assert (a.buf == b.buf).all()


def test_reencode_byte_stable():
    rng = np.random.default_rng(3)
    sk = _sk(rng.integers(0, 1 << 20, 50000).astype(np.float64))
    img = req_serde.to_java_bytes(sk)
    assert req_serde.to_java_bytes(req_serde.from_java_bytes(img)) == img


def test_through_the_wire_merge():
    """Partial sketches cross the wire as reference images and merge
    on the other side — the distributed two-phase aggregation path a
    datasketches-java producer would feed."""
    rng = np.random.default_rng(11)
    all_vals = rng.integers(0, 1 << 20, 30000).astype(np.float64)
    parts = np.array_split(all_vals, 8)
    merged = req.ReqSketch(12, True)
    for p in parts:
        img = req_serde.to_java_bytes(_sk(p))
        merged.merge(req_serde.from_java_bytes(img))
    assert merged.n == 30000
    direct = _sk(all_vals)
    # both are valid REQ sketches of the same stream: ranks agree
    # within the 2-sided rank error envelope at k=12
    for q in (0.1, 0.5, 0.9, 0.99):
        v = merged.quantile(q)
        lo, hi = direct.rank_lower_bound(q, 3), direct.rank_upper_bound(q, 3)
        assert lo - 0.05 <= direct.rank(v) <= hi + 0.05


def test_rejects_bad_family_and_version():
    img = bytearray(req_serde.to_java_bytes(_sk([1.0, 2.0])))
    bad_fam = bytes(img[:2]) + b"\x0f" + bytes(img[3:])
    with pytest.raises(ValueError, match="Family"):
        req_serde.from_java_bytes(bad_fam)
    bad_ver = bytes(img[:1]) + b"\x07" + bytes(img[2:])
    with pytest.raises(ValueError, match="serVer"):
        req_serde.from_java_bytes(bad_ver)


def test_lra_flag_roundtrip():
    sk = _sk(np.arange(5000, dtype=np.float64), hra=False)
    img = req_serde.to_java_bytes(sk)
    flags = img[3]
    assert not flags & (1 << 3)
    back = req_serde.from_java_bytes(img)
    assert back.hra is False
    assert back.quantile(0.1) == sk.quantile(0.1)
