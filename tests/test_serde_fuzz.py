"""Corruption robustness for every reference-binary reader: random
truncations and byte flips of valid images must either raise a clean
ValueError (or produce a well-formed sketch when the corruption lands
in payload bytes) — never segfault, never raise non-Value errors from
deep inside numpy/struct.  This mirrors the reference's 'Possible
Corruption' checking discipline (e.g. sampling/VarOptItemsSketchTest
checkMalformedPreamble)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datasketches_java_spark.sketches import (
    hll, kll, theta, tuple as tp, varopt)
from datasketches_java_spark.sketches.frequencies import ItemsSketch
from datasketches_java_spark.sketches.sampling import ReservoirSketch
from datasketches_java_spark.sketches import (
    cpc, cpc_serde, freq_serde, hll_serde, kll_serde, req, req_serde,
    sampling_serde, theta_serde, tuple_serde)
from datasketches_java_spark.sketches.kll_items import KllItemsSketch

# clean, deterministic Python-level failures (struct.error covers
# short-buffer unpacks — the buffer-too-small analogue of ValueError)
ACCEPTABLE = (ValueError, IndexError, struct.error)


def _images() -> list[tuple[str, bytes, object]]:
    rng = np.random.default_rng(5)
    th = theta.sketch_longs(np.arange(10_000), lg_k=10)
    h = hll.sketch_longs(np.arange(10_000), lg_k=10)
    kd = kll.KllDoublesSketch.new(k=200).update_batch(
        rng.normal(size=5000))
    tu = tp.sketch_keyed_values(np.arange(5000), np.ones(5000, np.int64),
                                lg_k=10, values_dtype=np.int64)
    vo = varopt.VarOptSketch(64).update_batch(
        np.arange(2000), rng.exponential(2.0, 2000) + 0.1)
    rs = ReservoirSketch(32).update_batch(range(500))
    fr = ItemsSketch(64)
    fr.update_batch([int(x) for x in rng.zipf(1.3, 5000) % 1000])
    fs = ItemsSketch(64)
    fs.update_batch([f"d{int(x)}" for x in rng.zipf(1.3, 5000) % 1000])
    return [
        ("theta", theta_serde.to_java_bytes(th),
         theta_serde.from_java_bytes),
        ("hll8", hll_serde.to_java_bytes(h), hll_serde.from_java_bytes),
        ("hll4", hll_serde.to_java_bytes_hll4(h),
         hll_serde.from_java_bytes),
        ("kll", kll_serde.to_java_bytes(kd), kll_serde.from_java_bytes),
        ("tuple", tuple_serde.to_java_bytes(tu, "int_java"),
         lambda b: tuple_serde.from_java_bytes(b, "int_java")),
        ("aod", tuple_serde.aod_to_java_bytes(
            tp.sketch_keyed_values(np.arange(5000), np.ones(5000))),
         tuple_serde.aod_from_java_bytes),
        ("aod_union", tuple_serde.aod_union_to_java_bytes(
            tp.sketch_keyed_values(np.arange(5000), np.ones(5000))),
         tuple_serde.aod_union_from_java_bytes),
        ("varopt", sampling_serde.varopt_to_java_bytes(vo),
         sampling_serde.varopt_from_java_bytes),
        ("reservoir", sampling_serde.reservoir_to_java_bytes(rs),
         sampling_serde.reservoir_from_java_bytes),
        ("freq_longs", freq_serde.to_java_bytes(fr),
         freq_serde.from_java_bytes),
        ("freq_items", freq_serde.items_to_java_bytes(fs),
         freq_serde.items_from_java_bytes),
        ("cpc_sparse", cpc_serde.to_java_bytes(
            cpc.sketch_longs(np.arange(100), lg_k=11)),
         cpc_serde.from_java_bytes),
        ("cpc_hybrid", cpc_serde.to_java_bytes(
            cpc.sketch_longs(np.arange(300), lg_k=10)),
         cpc_serde.from_java_bytes),
        ("cpc_pinned", cpc_serde.to_java_bytes(
            cpc.sketch_longs(np.arange(1500), lg_k=10)),
         cpc_serde.from_java_bytes),
        ("cpc_sliding", cpc_serde.to_java_bytes(
            cpc.sketch_longs(np.arange(50_000), lg_k=10)),
         cpc_serde.from_java_bytes),
        ("hll6", hll_serde.to_java_bytes_hll6(h),
         hll_serde.from_java_bytes),
        ("req", req_serde.to_java_bytes(
            req.ReqSketch(12, True).update_batch(
                rng.normal(size=20_000))),
         req_serde.from_java_bytes),
        ("classic_items_longs", kll_serde.classic_items_to_java_bytes(
            KllItemsSketch.new(k=4096, dtype="long").update_batch(
                np.arange(1500))),
         lambda b: kll_serde.classic_items_from_java_bytes(b, "long")),
        ("classic_items_strings", kll_serde.classic_items_to_java_bytes(
            KllItemsSketch.new(k=2048, dtype="string").update_batch(
                [f"s{i:06d}" for i in range(800)])),
         lambda b: kll_serde.classic_items_from_java_bytes(b, "string")),
    ]


@pytest.mark.parametrize("name,img,reader",
                         _images(), ids=[x[0] for x in _images()])
def test_truncations_fail_cleanly(name, img, reader):
    rng = np.random.default_rng(hash(name) % 2**32)
    cuts = sorted({1, 3, 7, len(img) // 2, len(img) - 1}
                  | {int(x) for x in rng.integers(0, len(img), 10)})
    for cut in cuts:
        if cut >= len(img):
            continue
        try:
            reader(img[:cut])
        except ACCEPTABLE:
            pass  # clean rejection
        # a successful parse of a truncation is only OK if the prefix
        # happens to be a self-consistent shorter image (e.g. empty
        # preamble) — numpy raising anything else fails the test


@pytest.mark.parametrize("name,img,reader",
                         _images(), ids=[x[0] for x in _images()])
def test_byte_flips_fail_cleanly_or_parse(name, img, reader):
    rng = np.random.default_rng(hash(name) % 2**31)
    for _ in range(40):
        pos = int(rng.integers(0, min(len(img), 48)))  # attack preamble
        flipped = bytearray(img)
        flipped[pos] ^= int(rng.integers(1, 256))
        try:
            reader(bytes(flipped))
        except ACCEPTABLE:
            pass
        except OverflowError:
            pass  # absurd counts from flipped length fields
