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


def test_rejects_out_of_scope_forms():
    sk = hll.sketch_longs(np.arange(1000), lg_k=8)
    img = bytearray(to_java_bytes(sk))
    img[7] = 0b1001  # HLL_8 + SET mode
    with pytest.raises(ValueError, match="HLL-mode"):
        from_java_bytes(bytes(img))
    img[7] = 0b0010  # HLL_4 + HLL mode
    with pytest.raises(ValueError, match="HLL_8"):
        from_java_bytes(bytes(img))
    img[7] = 10
    img[2] = 3
    with pytest.raises(ValueError, match="family"):
        from_java_bytes(bytes(img))
