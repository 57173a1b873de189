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
