from __future__ import annotations

from pyspark.sql import functions as F


def _verdicts(spark, rows):
    return spark.createDataFrame(rows, "part int, check_name string, verdict string")


def test_checkpoint_record_resume_upsert(spark, tmp_path_factory):
    from al_drift_detection_spark.checkpoint import Checkpoint

    path = str(tmp_path_factory.mktemp("ckpt") / "tbl")
    ck = Checkpoint(path, run_id="r1")

    # nothing recorded → nothing filtered
    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))
    assert ck.filter_pending(df).count() == 100

    # record: parts 0,1 pass; part 2 fails
    ck.record(_verdicts(spark, [(0, "a", "pass"), (0, "b", "pass"),
                                (1, "a", "pass"), (2, "a", "fail"), (2, "b", "pass")]))
    assert sorted(ck.passed_parts(spark)) == [0, 1]
    pending = ck.filter_pending(df)
    assert pending.count() == 50  # parts 2,3 remain
    assert set(r["part"] for r in pending.select("part").distinct().collect()) == {2, 3}

    # upsert: part 2 now passes, part 3 fails — MERGE semantics, no dup keys
    ck.record(_verdicts(spark, [(2, "a", "pass"), (2, "b", "pass"), (3, "a", "fail")]))
    assert sorted(ck.passed_parts(spark)) == [0, 1, 2]
    tbl = ck.load(spark).toPandas()
    assert len(tbl) == len(tbl.drop_duplicates(["run_id", "part"]))

    # second run id is independent
    ck2 = Checkpoint(path, run_id="r2")
    assert ck2.passed_parts(spark) == []

def test_checkpoint_crash_safe_rewrite(spark, tmp_path_factory):
    """A crash between record()'s two renames must never lose the table:
    load() recovers from the .__old__ sibling."""
    import os
    import shutil

    from al_drift_detection_spark.checkpoint import Checkpoint

    path = str(tmp_path_factory.mktemp("ckpt") / "tbl")
    ck = Checkpoint(path, run_id="r1")
    ck.record(_verdicts(spark, [(0, "a", "pass"), (1, "a", "fail")]))
    assert ck.passed_parts(spark) == [0]
    # no leftover temp/old dirs after a clean rewrite
    assert not os.path.exists(f"{path}.__tmp__") and not os.path.exists(f"{path}.__old__")

    # simulate dying between rename(path → old) and rename(tmp → path)
    os.rename(path, f"{path}.__old__")
    assert ck.passed_parts(spark) == [0]  # recovered
    assert os.path.exists(path)

    # and a crash AFTER the tmp write but before any rename leaves the live
    # table untouched
    shutil.copytree(path, f"{path}.__tmp__")
    assert ck.passed_parts(spark) == [0]


def test_runner_resume_keeps_drift_reference(spark, tmp_path_factory):
    """--resume must not disable drift detection: the reference sample comes
    from the full table, so a second (resumed) run still scores drift instead
    of silently passing everything on an empty reference."""
    from al_drift_detection_spark import runner

    out = str(tmp_path_factory.mktemp("run") / "out")
    args = ["--images", "synthetic:2000", "--out", out, "--master", "local[8]"]
    assert runner.main(args) == 0
    drift1 = spark.read.parquet(f"{out}/drift").toPandas()
    assert len(drift1) > 0

    # resumed run: previously-passed partitions are skipped, but the drift
    # reference still builds from the full table (no ValueError, no empty ref)
    assert runner.main(args + ["--resume"]) == 0
    drift2 = spark.read.parquet(f"{out}/drift")
    assert drift2.columns == list(drift1.columns)
