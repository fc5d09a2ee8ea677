"""CPC wire-format proof against the reference's own C++-generated
golden images (cpc-{empty,sparse,hybrid,pinned,sliding}.sk — the files
cpc/CpcCBinariesTest.java reads), plus compressor parity: re-encoding
the same stream reproduces the goldens' compressed payload words
bit-for-bit (the preamble differs only in MERGED-vs-HIP format)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from datasketches_java_spark.sketches import cpc
from datasketches_java_spark.sketches.cpc_serde import (
    from_java_bytes, to_java_bytes)

RES = "/root/reference/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference resources not available")

GOLDENS = [("cpc-empty.sk", 0, "EMPTY"),
           ("cpc-sparse.sk", 100, "SPARSE"),
           ("cpc-hybrid.sk", 200, "HYBRID"),
           ("cpc-pinned.sk", 2000, "PINNED"),
           ("cpc-sliding.sk", 20000, "SLIDING")]


def _golden(name: str) -> bytes:
    with open(os.path.join(RES, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name,n,flavor", GOLDENS)
def test_golden_heapifies_bit_exact(name, n, flavor):
    """The C++ goldens were built from longs 0..n-1 at the default
    seed; heapifying them must reproduce the EXACT coupon matrix the
    engine builds from the same stream — validating murmur3 parity,
    the preamble, both codecs, and the flavor transforms at once.
    Estimates mirror CpcCBinariesTest's 2% assertions."""
    from datasketches_java_spark.sketches.cpc_serde import (
        _determine_flavor)
    sk = from_java_bytes(_golden(name))
    rebuilt = cpc.sketch_longs(np.arange(n, dtype=np.int64), lg_k=sk.lg_k)
    assert np.array_equal(sk.matrix, rebuilt.matrix)
    assert _determine_flavor(sk.lg_k, sk.num_coupons) == flavor
    if n:
        assert abs(sk.estimate() - n) <= n * 0.02


@pytest.mark.parametrize("name,n,flavor", GOLDENS[1:])
def test_compressor_stream_parity_with_goldens(name, n, flavor):
    """Re-encoding the identical sketch must reproduce the golden's
    compressed stream words bit-for-bit; only the preamble differs
    (our writer emits MERGED formats, the C++ goldens carry HIP
    fields)."""
    gold = _golden(name)
    g_pre = gold[0] << 2
    g_words = np.frombuffer(gold, dtype="<u4", offset=g_pre)
    mine = to_java_bytes(from_java_bytes(gold))
    m_pre = mine[0] << 2
    m_words = np.frombuffer(mine, dtype="<u4", offset=m_pre)
    assert np.array_equal(m_words, g_words)


def test_10m_artifact_rejected_like_reference():
    """cpc-10m.sk is read by NO reference test and fails the current
    CompressedState capacity rule (660 bytes < required 664); we
    reject it with the same possible-corruption error."""
    with pytest.raises(ValueError, match="capacity"):
        from_java_bytes(_golden("cpc-10m.sk"))


@pytest.mark.parametrize("n", [0, 1, 50, 150, 1500, 15_000, 300_000])
def test_roundtrip_all_flavors(n):
    """Write->read across every flavor regime at lgK=11 (and the
    pinned/sliding offset machinery) is matrix-exact."""
    sk = cpc.sketch_longs(np.arange(n, dtype=np.int64), lg_k=11)
    back = from_java_bytes(to_java_bytes(sk))
    assert np.array_equal(back.matrix, sk.matrix)
    assert back.estimate() == sk.estimate()


@pytest.mark.parametrize("lg_k", [4, 10, 14])
def test_roundtrip_other_lgk(lg_k):
    n = 40 << lg_k  # deep sliding territory
    sk = cpc.sketch_longs(np.arange(n, dtype=np.int64), lg_k=lg_k)
    back = from_java_bytes(to_java_bytes(sk))
    assert np.array_equal(back.matrix, sk.matrix)


def test_merge_through_the_wire():
    a = cpc.sketch_longs(np.arange(0, 30_000), lg_k=11)
    b = cpc.sketch_longs(np.arange(20_000, 60_000), lg_k=11)
    via = cpc.union(from_java_bytes(to_java_bytes(a)),
                    from_java_bytes(to_java_bytes(b)))
    native = cpc.union(a, b)
    assert np.array_equal(via.matrix, native.matrix)


def test_seed_hash_checked():
    sk = cpc.sketch_longs(np.arange(100), lg_k=10, seed=9001)
    img = to_java_bytes(sk, seed=9001)
    with pytest.raises(ValueError, match="seed hash"):
        from_java_bytes(img, seed=1234)
    from_java_bytes(img, seed=None)  # explicit skip, like wrap(mem)


def test_rejections():
    with pytest.raises(ValueError, match="family"):
        from_java_bytes(struct.pack("<BBBBBBH", 2, 1, 7, 11, 0, 2, 0))
    with pytest.raises(ValueError, match="serVer"):
        from_java_bytes(struct.pack("<BBBBBBH", 2, 9, 16, 11, 0, 2, 0))
    with pytest.raises(ValueError, match="compressed"):
        from_java_bytes(struct.pack("<BBBBBBH", 2, 1, 16, 11, 0, 0, 0))


# -- property sweep: random states across all writable preamble formats ----

from hypothesis import given, settings, strategies as st


def _format_ordinal(img: bytes) -> int:
    return (img[5] >> 2) & 0x7


@settings(max_examples=60, deadline=None)
@given(lg_k=st.integers(min_value=4, max_value=14),
       log_occ=st.floats(min_value=-3.0, max_value=6.5),
       seed=st.integers(min_value=0, max_value=2 ** 31 - 1))
def test_codec_property_roundtrip(lg_k, log_occ, seed):
    """Random (lgK, occupancy) states: decode(encode(m)) == m matrix-
    exact and re-encode is byte-stable.  Occupancy spans EMPTY through
    deep SLIDING (n up to ~90·K), the codec's full operating range —
    the 451-line bit-stream codec guards the flagship interop claim,
    and fuzzing found real bugs in the other readers (commit 7481776)."""
    k = 1 << lg_k
    n = int(k * (2.0 ** log_occ)) if log_occ > -3.0 else 0
    rng = np.random.default_rng(seed)
    vals = rng.integers(-(1 << 62), 1 << 62, n, dtype=np.int64)
    sk = cpc.sketch_longs(vals, lg_k=lg_k)
    img = to_java_bytes(sk)
    back = from_java_bytes(img)
    assert np.array_equal(back.matrix, sk.matrix)
    assert to_java_bytes(back) == img


def test_codec_sweep_covers_all_writable_formats():
    """The writer emits the 4 MERGED preamble formats (the engine is
    merge-based; HIP formats are read-side only, covered by the C++
    goldens).  Pin that a lgK × occupancy sweep actually exercises all
    of them: EMPTY_MERGED(0), SPARSE_HYBRID_MERGED(2),
    PINNED_SLIDING_MERGED_NOSV(4), PINNED_SLIDING_MERGED(6)."""
    seen = set()
    for lg_k in (4, 8, 11):
        k = 1 << lg_k
        for n in (0, 1, k // 4, k, 3 * k, 8 * k, 40 * k):
            sk = cpc.sketch_longs(
                np.random.default_rng(n + lg_k).integers(
                    0, 1 << 60, n, dtype=np.int64), lg_k=lg_k)
            img = to_java_bytes(sk)
            seen.add(_format_ordinal(img))
            back = from_java_bytes(img)
            assert np.array_equal(back.matrix, sk.matrix)
    assert {0, 2, 4, 6} <= seen, f"formats covered: {sorted(seen)}"
