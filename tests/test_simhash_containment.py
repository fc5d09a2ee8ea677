"""Oracle-strengthening for simhash_near_pairs (the one rows-only
driver query): the fingerprint itself is not SQL-expressible, but its
CLAIMS are checkable —

  1. every emitted pair is in the DuckDB-verified exact-Jaccard >= 0.8
     pair set (containment in the oracle-checked universe), and
  2. every emitted Hamming distance equals the distance recomputed in
     Python from independently recomputed SimHash fingerprints, and
     respects the <= 12 bound.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not available")


def _oracle_pairs() -> set[tuple[int, int]]:
    import __spark_entry__ as e
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')")
    sql = e._DOC_PAIRS_CTE + "SELECT ia, ib FROM pairs"
    return {(a, b) for a, b in con.execute(sql).fetchall()}


def test_simhash_pairs_contained_in_verified_set(spark):
    import __spark_entry__ as e

    rows = e.queries()["simhash_near_pairs"](spark, SF).collect()
    assert rows, "query returned no pairs at sf0.01"
    oracle = _oracle_pairs()
    emitted = {(r.doc_a, r.doc_b) for r in rows}
    assert emitted <= oracle, (
        f"simhash pairs not contained in the oracle-verified set: "
        f"{sorted(emitted - oracle)[:5]}")

    # recompute fingerprints + Hamming independently of operators/lsh
    from datasketches_java_spark.functions.minhash import simhash_batch
    from datasketches_java_spark.functions.text import (
        shingle_hashes_from_tokens, tokens)
    from pyspark.sql import functions as F
    import pandas as pd

    docs = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
            .withColumn("_toks", tokens("text"))
            .withColumn("sh", shingle_hashes_from_tokens("_toks"))
            .select("doc_id", "sh").toPandas())
    fp = dict(zip(docs.doc_id, simhash_batch(pd.Series(list(docs.sh)))))
    for r in rows:
        d = int(bin(np.uint64(fp[r.doc_a]) ^ np.uint64(fp[r.doc_b])).count("1"))
        assert d == r.hamming, (r.doc_a, r.doc_b, d, r.hamming)
        assert d <= 12
