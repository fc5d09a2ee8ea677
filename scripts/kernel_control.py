"""Framework-free scaling control for the signature kernel.

Runs minhash_flat + simhash_flat (the pipeline's dominant kernel,
functions/minhash.py) as N independent OS processes — no JVM, no
Spark, no Arrow — each over an identical synthetic shingle workload,
and reports aggregate docs/s per process count.  This isolates the
machine's scaling ceiling from anything Spark adds: if bare numpy
processes cannot scale on this box, no implementation of the same
arithmetic can (BENCH.md "framework-free control").

Usage: python scripts/kernel_control.py [docs_per_proc] [procs...]
Defaults: 25000 docs/proc, proc counts 1 4 16.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEAN_SHINGLES = 180  # matches the webtext fixture's per-doc shingle count


def _workload(n_docs: int, seed: int):
    import numpy as np
    rng = np.random.default_rng(seed)
    lengths = rng.integers(MEAN_SHINGLES // 2, MEAN_SHINGLES * 3 // 2,
                           size=n_docs).astype(np.int64)
    values = rng.integers(0, 2**63, size=int(lengths.sum()),
                          dtype=np.int64).view(np.uint64)
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    return values, starts, lengths


def _worker(n_docs: int, seed: int, out_q) -> None:
    from datasketches_java_spark.functions.minhash import (minhash_flat,
                                                           simhash_flat)
    values, starts, lengths = _workload(n_docs, seed)
    # untimed warm-up over a slice (first-call numpy/ufunc setup)
    minhash_flat(values[:4096], starts[:8], lengths[:8])
    t0 = time.perf_counter()
    minhash_flat(values, starts, lengths)
    simhash_flat(values, starts, lengths)
    out_q.put(time.perf_counter() - t0)


def run(n_docs: int, procs: int) -> dict:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(n_docs, 1000 + i, q))
          for i in range(procs)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    walls = [q.get() for _ in ps]
    for p in ps:
        p.join()
    total = time.perf_counter() - t0
    agg = procs * n_docs / max(walls)
    return {"procs": procs, "docs_per_proc": n_docs,
            "max_kernel_wall_s": round(max(walls), 2),
            "spawn_to_join_s": round(total, 2),
            "agg_docs_per_sec": round(agg, 1)}


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    n_docs = args[0] if args else 25000
    proc_counts = args[1:] or [1, 4, 16]
    rows = [run(n_docs, p) for p in proc_counts]
    base = rows[0]
    for r in rows:
        r["eff_vs_first"] = round(
            r["agg_docs_per_sec"] / base["agg_docs_per_sec"]
            / (r["procs"] / base["procs"]), 3)
    print(json.dumps({"metric": "bare-numpy signature kernel scaling",
                      "runs": rows}))


if __name__ == "__main__":
    main()
