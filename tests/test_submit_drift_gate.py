"""Submit-path KS drift gate (scripts/submit_dedup.run): the resume
smoke exercising BOTH branches — accept (same epoch) and
refuse-resume (drifted epoch), plus the --allow-drift override and
the no-self-compare property of the refusing branch."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import submit_dedup  # noqa: E402


def _args(**kw):
    argv = []
    for k, v in kw.items():
        flag = "--" + k.replace("_", "-")
        if v is True:
            argv.append(flag)
        else:
            argv += [flag, str(v)]
    return submit_dedup._parser().parse_args(argv)


@pytest.fixture(scope="module")
def fixture_paths(spark, tmp_path_factory):
    from datasketches_java_spark.sources.webtext import write_fixture
    tmp = tmp_path_factory.mktemp("driftgate")
    paths = write_fixture(str(tmp / "fx"), n_docs=800, seed=7)
    # drifted epoch: same schema, radically different length profile
    pages = spark.read.parquet(paths["pages"])
    drifted = pages.withColumn(
        "text", F.concat_ws(" ", "text", "text", "text", "text"))
    drifted_path = str(tmp / "drifted.parquet")
    drifted.write.mode("overwrite").parquet(drifted_path)
    return paths["pages"], drifted_path, str(tmp / "out")


def test_accept_then_refuse_then_override(spark, fixture_paths):
    pages, drifted, out = fixture_paths

    # epoch 1: fresh output, no resume state -> runs, records epoch
    m1 = submit_dedup.run(_args(input=pages, output=out), spark)
    assert "error" not in m1 and m1["resumed"] is False

    # epoch 2, same distribution: resume state exists, KS clean -> runs
    m2 = submit_dedup.run(_args(input=pages, output=out), spark)
    assert "error" not in m2
    assert m2["resumed"] is True and m2["drifted"] is False

    # epoch 3, drifted input on existing checkpoints -> REFUSED
    m3 = submit_dedup.run(_args(input=drifted, output=out), spark)
    assert m3.get("error") and m3["drifted"] is True
    assert m3["ks_d"] > 0.5

    # the refusal must not have committed the drifted image: the same
    # drifted input refuses AGAIN (a commit would self-compare clean)
    m4 = submit_dedup.run(_args(input=drifted, output=out), spark)
    assert m4.get("error") and m4["drifted"] is True

    # explicit override proceeds (and then commits the new epoch)
    m5 = submit_dedup.run(
        _args(input=drifted, output=out, allow_drift=True), spark)
    assert "error" not in m5 and m5["drifted"] is True
    assert m5["resumed"] is True


def test_drift_without_resume_state_runs(spark, fixture_paths, tmp_path):
    """Drift with NO checkpoints is not refused — there is nothing
    stale to poison; the run just recomputes and records the epoch."""
    _, drifted, _ = fixture_paths
    out = str(tmp_path / "fresh_out")
    m = submit_dedup.run(_args(input=drifted, output=out), spark)
    assert "error" not in m and m["resumed"] is False
