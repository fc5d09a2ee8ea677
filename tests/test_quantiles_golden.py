"""Classic-quantiles and KLL-floats golden interop: heapify the
reference's own legacy .sk binaries and reproduce the assertions of
quantiles/ForwardCompatibilityTest.java (exclusive median across four
serialization generations) and KllFloatsSketchTest.deserializeOneValueV1.
Plus a coverage sweep: every golden image in the reference's test
resources is either heapified by an engine reader or rejected with the
same behavior as upstream / an explicit by-design scope note."""

from __future__ import annotations

import os

import numpy as np
import pytest

from datasketches_java_spark.sketches.kll_serde import (
    classic_doubles_from_java_bytes, from_java_bytes)

RES = "/root/reference/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference resources not available")


def _golden(name: str) -> bytes:
    with open(os.path.join(RES, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("ver", ["0.3.0", "0.6.0", "0.8.0", "0.8.3"])
@pytest.mark.parametrize("n,median2", [(50, 26.0), (1000, 501.0)])
def test_classic_forward_compatibility(ver, n, median2):
    """quantiles/ForwardCompatibilityTest: same file names, same
    EXCLUSIVE-median expectations, all four legacy generations."""
    sk = classic_doubles_from_java_bytes(_golden(f"Qk128_n{n}_v{ver}.sk"))
    assert sk.n == n
    assert sk.min_value == 1.0 and sk.max_value == float(n)
    assert sk.quantile(0.5, inclusive=False) == median2


def test_classic_heapifies_into_mergeable_kll_state():
    """The classic->KLL level mapping produces a sketch the engine can
    merge with a native KLL sketch, weights intact."""
    from datasketches_java_spark.sketches.kll import KllDoublesSketch
    classic = classic_doubles_from_java_bytes(
        _golden("Qk128_n1000_v0.8.3.sk"))
    retained_weight = sum(lv.shape[0] * (1 << i)
                          for i, lv in enumerate(classic.levels))
    assert retained_weight == classic.n  # lossless weight accounting
    native = KllDoublesSketch.new(k=128).update_batch(
        np.arange(1000, 2000, dtype=np.float64))
    native.merge(classic)
    assert native.n == 2000
    med = native.quantile(0.5)
    assert 900 <= med <= 1100  # true median 1000, eps(128) ~ 2%


def test_kll_float_v1_one_item():
    """kll/KllFloatsSketchTest.deserializeOneValueV1."""
    sk = from_java_bytes(_golden("kll_sketch_float_one_item_v1.sk"))
    assert sk.n == 1
    assert sum(lv.shape[0] for lv in sk.levels) == 1  # numRetained
    assert sk.quantile(0.5) == 1.0


def test_every_reference_golden_is_covered():
    """Sweep of ALL .sk goldens in the reference tree: each must
    heapify through an engine reader, or raise the same rejection as
    the reference (AoD v0.9.1; cpc-10m.sk fails upstream's own
    capacity rule and is read by no upstream test)."""
    from datasketches_java_spark.sketches import (
        cpc_serde, tuple_serde)

    readers = {
        "Qk128": lambda b: classic_doubles_from_java_bytes(b),
        "kll_sketch_float": lambda b: from_java_bytes(b),
        "tuple-int": lambda b: tuple_serde.from_java_bytes(
            b, summary="int_cpp"),
        "TupleWithTestIntegerSummary": lambda b: tuple_serde.from_java_bytes(
            b, summary="int_cpp"),
        "CompactSketchWithDoubleSummary": lambda b:
            tuple_serde.from_java_bytes(b),
        "cpc": lambda b: cpc_serde.from_java_bytes(b),
    }
    rejected_like_reference = {
        "ArrayOfDoublesUnion_v0.9.1.sk": tuple_serde.aod_union_from_java_bytes,
        "cpc-10m.sk": cpc_serde.from_java_bytes,
    }

    for name in sorted(os.listdir(RES)):
        if not name.endswith(".sk"):
            continue
        buf = _golden(name)
        if name in rejected_like_reference:
            with pytest.raises(ValueError):
                rejected_like_reference[name](buf)
            continue
        reader = next(fn for p, fn in readers.items() if name.startswith(p))
        sk = reader(buf)  # must not raise
        assert sk is not None
