"""Per-stage scaling decomposition for the dedup pipeline.

Times each pipeline phase separately at two parallelism levels and
reports, per phase: wall seconds and total executor task-seconds (from
the Spark status tracker), so the serial/scheduling floor is visible —
the evidence BENCH.md's scaling-efficiency analysis cites.

Usage: python scripts/stage_breakdown.py [n_docs] [lo_cores] [hi_cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cores: int, n_docs: int) -> dict:
    from datasketches_java_spark.functions.session import get_spark
    from datasketches_java_spark.operators.connected_components import (
        assign_clusters)
    from datasketches_java_spark.operators.lsh import (
        add_signatures, band_buckets, candidate_pairs, verify_pairs)
    from datasketches_java_spark.sources.webtext import write_fixture
    from pyspark.sql import functions as F

    spark = get_spark(f"breakdown{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16))
    sc = spark.sparkContext
    paths = write_fixture(os.path.join(REPO, ".cache",
                                       f"webtext_bench_{n_docs}"),
                          n_docs=n_docs, seed=42)
    pages = spark.read.parquet(paths["pages"])
    if pages.rdd.getNumPartitions() < cores:
        pages = pages.repartition(cores * 2)

    # warm-up (JIT) on a slice, untimed
    warm = add_signatures(pages.limit(3000).select("url", "text"), "text")
    warm.write.format("noop").mode("overwrite").save()

    phases = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 2)
        return out

    sig = add_signatures(pages.select("url", "text"), "text") \
        .drop("text").withColumn("_sid", F.monotonically_increasing_id())
    sig = timed("01_signatures", lambda: sig.localCheckpoint())

    buckets = band_buckets(sig, "_sid")
    buckets = timed("02_band_buckets", lambda: buckets.localCheckpoint())

    pairs = candidate_pairs(buckets, "_sid")
    pairs = timed("03_candidate_pairs", lambda: pairs.localCheckpoint())

    verified = verify_pairs(pairs, sig, "_sid")
    verified = timed("04_verify", lambda: verified.localCheckpoint())

    clusters = timed("05_clusters", lambda: assign_clusters(
        sig.select("_sid"), verified.select("id_a", "id_b"), "_sid")
        .localCheckpoint())

    n_pairs = verified.count()
    total_wall = sum(phases.values())
    spark.stop()
    return {"cores": cores, "phases": phases,
            "total_wall_s": round(total_wall, 2), "n_pairs": n_pairs}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    out = [run_level(lo, n_docs), run_level(hi, n_docs)]
    speedup = {k: round(out[0]["phases"][k] / max(out[1]["phases"][k], 1e-9), 2)
               for k in out[0]["phases"]}
    print(json.dumps({"n_docs": n_docs, "levels": out,
                      "phase_speedup_lo_over_hi": speedup}))


if __name__ == "__main__":
    main()
