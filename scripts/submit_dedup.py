"""spark-submit entry point for the dedup pipeline.

Cluster usage (the production shape required by the north rule):

    bash scripts/package.sh                        # builds dist/dsjs.zip
    spark-submit --py-files dist/dsjs.zip \\
        scripts/submit_dedup.py \\
        --input  <iceberg-table-or-parquet-path> \\
        --output <checkpoint/output root> \\
        [--id-col url --text-col text --threshold 0.8 --with-lcs]

Local sandbox equivalent (what bench.py drives):

    python scripts/submit_dedup.py --input .cache/webtext_bench_20000/pages.parquet \\
        --output /tmp/dedup_out --cores 32

The job is a thin arg-parser around plans.dedup.dedup_pipeline — all
logic lives in the package so the same code path runs in tests, bench,
and cluster submission.  Per-stage checkpoints under --output make the
job resumable: resubmitting after a failure skips completed stages.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--with-lcs", action="store_true")
    ap.add_argument("--cores", type=int, default=None,
                    help="local[NN] master for sandbox runs; omit on a "
                         "real cluster (spark-submit provides the master)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    if args.cores:
        from datasketches_java_spark.functions.session import get_spark
        spark = get_spark("dedup_submit", cores=args.cores)
    else:
        spark = SparkSession.builder.appName("dedup_submit").getOrCreate()

    from datasketches_java_spark.plans.dedup import dedup_metrics, dedup_pipeline

    pages = (spark.read.format("iceberg").load(args.input)
             if not args.input.endswith(".parquet")
             and not Path(args.input).exists()
             else spark.read.parquet(args.input))

    t0 = time.time()
    res = dedup_pipeline(spark, pages, id_col=args.id_col,
                         text_col=args.text_col, threshold=args.threshold,
                         checkpoint_dir=args.output, with_lcs=args.with_lcs)
    m = dedup_metrics(res, args.id_col).collect()[0].asDict()
    m["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(m))
    spark.stop()


if __name__ == "__main__":
    main()
