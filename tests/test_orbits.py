"""Reference-shaped orbit end-to-end (VERDICT r3 item 3): planted orbit CSVs
→ z-score + rolling mean → per-orbit regime assignment → the exact
`{orbit} {drift}` verdict contract of /root/reference/gan.py:971-974, golden
file logs/gan/drifts_set1.txt (`233 1 / 234 1 / 380 2 / 381 2`)."""

from __future__ import annotations

import numpy as np

GOLDEN = "233 1\n234 1\n380 2\n381 2\n"  # == /root/reference/logs/gan/drifts_set1.txt


def _write_orbit_csv(dirpath, orbit: int, shift: float, rng, n: int = 2000) -> None:
    """One df_<N>.csv with the features_gan.txt columns and NO ORBIT column —
    exercising the filename-derivation path (sources.read_orbit_csvs)."""
    bz = rng.uniform(0.0, 100.0, n) + shift
    cos = rng.uniform(-1.0, 1.0, n) + shift / 100.0
    lines = ["DATE,BZ_MSO,COSALPHA"]
    lines += [f"{i},{bz[i]:.6f},{cos[i]:.6f}" for i in range(n)]
    (dirpath / f"df_{orbit}.csv").write_text("\n".join(lines) + "\n")


def _plant(base, rng) -> None:
    for orbit, shift in [(233, 0.0), (234, 0.0), (380, 200.0), (381, 200.0)]:
        _write_orbit_csv(base, orbit, shift, rng)


def test_orbit_drift_verdicts_golden(spark, tmp_path_factory):
    from al_drift_detection_spark.orbits import orbit_drift_verdicts, write_drifts_txt
    from al_drift_detection_spark.sources import read_orbit_csvs

    base = tmp_path_factory.mktemp("orbits")
    _plant(base, np.random.default_rng(17))

    corpus = read_orbit_csvs(spark, str(base / "df_*.csv"))
    assert "ORBIT" in corpus.columns  # derived from filenames
    verdicts = orbit_drift_verdicts(corpus, rolling_window=100)
    got = verdicts.toPandas()
    # the drifts_set1.txt id sequence: base pair = regime 1, the shifted pair
    # mints regime 2 once and the second shifted orbit RECURS as 2
    assert got[["orbit", "drift"]].values.tolist() == [
        [233, 1], [234, 1], [380, 2], [381, 2],
    ]
    assert got["is_new"].tolist() == [False, False, True, False]

    out = base / "drifts.txt"
    write_drifts_txt(verdicts, str(out))
    assert out.read_text() == GOLDEN


def test_orbit_runner_cli_smoke(spark, tmp_path_factory):
    """`runner --orbits <csv-glob>` writes orbit_drifts/ parquet and the
    reference-format drifts.txt (the verify-recipe surface); a planted
    null row is dropped (P1, ref util.py:45) but COUNTED in the summary
    (VERDICT r4 item 7 — the one silent data-shaping step made
    observable)."""
    import contextlib
    import io
    import json

    from al_drift_detection_spark import runner

    base = tmp_path_factory.mktemp("orbits_cli")
    _plant(base, np.random.default_rng(17))
    # one row with null feature values — dropped by the loader, surfaced in
    # the summary
    with open(base / "df_233.csv", "a") as fh:
        fh.write("99999,,\n")
    out = str(base / "out")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = runner.main(
            ["--orbits", str(base / "df_*.csv"), "--out", out, "--master", "local[8]",
             "--orbit-rolling", "100"]
        )
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["rows_dropped_null"] == 1
    assert (base / "out" / "drifts.txt").read_text() == GOLDEN
    pq = spark.read.parquet(f"{out}/orbit_drifts").toPandas().sort_values("orbit")
    assert pq[["orbit", "drift"]].values.tolist() == [
        [233, 1], [234, 1], [380, 2], [381, 2],
    ]


def test_read_orbit_csvs_na_drop_flag(spark, tmp_path_factory):
    """na_drop=False keeps null rows for explicit completeness checks;
    count_dropped_nulls reports exactly what the default drop removes."""
    from al_drift_detection_spark.sources import count_dropped_nulls, read_orbit_csvs

    base = tmp_path_factory.mktemp("orbits_nadrop")
    _write_orbit_csv(base, 3, 0.0, np.random.default_rng(7), n=50)
    with open(base / "df_3.csv", "a") as fh:
        fh.write("101,,\n102,1.5,\n")  # two rows with nulls

    raw = read_orbit_csvs(spark, str(base / "df_*.csv"), na_drop=False)
    assert raw.count() == 52
    assert count_dropped_nulls(raw) == 2
    assert read_orbit_csvs(spark, str(base / "df_*.csv")).count() == 50


def test_prepare_orbit_features_zscore_and_rolling(spark, tmp_path_factory):
    """The preprocessing matches the reference's pandas semantics
    (gan.py:634-641): global z-score, then per-orbit rolling(5000,
    min_periods=1).mean() — checked directly against pandas on one orbit."""
    import pandas as pd

    from al_drift_detection_spark.orbits import prepare_orbit_features
    from al_drift_detection_spark.sources import read_orbit_csvs

    base = tmp_path_factory.mktemp("orbits_prep")
    rng = np.random.default_rng(23)
    _write_orbit_csv(base, 7, 0.0, rng, n=300)

    corpus = read_orbit_csvs(spark, str(base / "df_*.csv"))
    prepared, cols = prepare_orbit_features(corpus, rolling_window=50)
    assert set(cols) == {"BZ_MSO", "COSALPHA"}
    got = prepared.orderBy("DATE").toPandas()

    raw = pd.read_csv(base / "df_7.csv")
    z = (raw["BZ_MSO"] - raw["BZ_MSO"].mean()) / raw["BZ_MSO"].std()
    expect = z.rolling(50, min_periods=1).mean()
    assert np.allclose(got["BZ_MSO"].to_numpy(), expect.to_numpy(), atol=1e-9)


def test_orbit_runner_multi_set_loop(spark, tmp_path_factory):
    """`--orbits ... --sets 2` (VERDICT r5 item 6, run-gan.sh:1-7's
    multi-sample contract): two per-set verdict files appear; set 1 is the
    full-corpus golden, set 2 runs the documented corpus slice and so emits
    a DIFFERENT (smaller) verdict set."""
    import contextlib
    import io
    import json

    from al_drift_detection_spark import runner

    base = tmp_path_factory.mktemp("orbits_sets")
    _plant(base, np.random.default_rng(17))
    out = str(base / "out")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = runner.main(
            ["--orbits", str(base / "df_*.csv"), "--out", out, "--master", "local[8]",
             "--orbit-rolling", "100", "--sets", "2"]
        )
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert [s["set"] for s in summary["sets"]] == [1, 2]

    s1 = (base / "out" / "drifts_set1.txt").read_text()
    s2 = (base / "out" / "drifts_set2.txt").read_text()
    assert s1 == GOLDEN  # full corpus, the reference-golden sequence
    # set 2 = the fixed middle slice (files[0:2] at m=4): the two base-regime
    # orbits only — a distinct verdict file, as the 5-sample contract requires
    assert s2 == "233 1\n234 1\n"
    assert s1 != s2
    for i in (1, 2):
        assert spark.read.parquet(f"{out}/orbit_drifts_set{i}").count() > 0
    # the drifts_all.txt catalogue (reference README.md:93): the union over
    # sets, lowest set winning overlaps — here set 1 covers the full corpus,
    # so the catalogue equals the set-1 golden
    assert (base / "out" / "drifts_all.txt").read_text() == GOLDEN


def test_select_set_files_contract():
    """Per-set slices (sources.select_set_files): deterministic under a
    fixed seed, set 1 is identity, sets 2-5 are proper windowed subsets at
    reference proportions (gan.py:941-956, fraction-scaled)."""
    from al_drift_detection_spark.sources import select_set_files

    files = [f"df_{i}.csv" for i in range(2312)]
    assert select_set_files(files, 1) == files
    s2 = select_set_files(files, 2)
    assert s2 == files[460:760] or abs(len(s2) - 300) <= 2  # reference slice
    for idx, (frac, half) in {3: (300 / 2312, "first"), 4: (400 / 2312, "second"),
                              5: (1000 / 2312, "any")}.items():
        s = select_set_files(files, idx, seed=7)
        assert select_set_files(files, idx, seed=7) == s  # deterministic
        assert abs(len(s) - round(frac * 2312)) <= 1
        assert all(f in files for f in s)
        lo = files.index(s[0])
        if half == "first":
            assert lo + len(s) <= 2312 // 2 + len(s)  # window starts in first half
            assert lo <= 2312 // 2
        elif half == "second":
            assert lo >= 2312 // 2
    # tiny corpus: every set still yields >= 2 files
    tiny = [f"df_{i}.csv" for i in range(4)]
    for idx in range(1, 6):
        assert len(select_set_files(tiny, idx, seed=7)) >= 2
