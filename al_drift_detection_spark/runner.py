"""CLI entry point — the `spark-submit --py-files` surface (north_rule).

Runs the full validation pass over an images table: column stats +
constraint verdicts + violation rows + KS/PSI/MMD drift scores (+ optional
decode checks), writing each output contract table (FIXTURES.md §4) as
parquet under --out.

Usage (local sandbox stand-in for a cluster submit):
    python -m al_drift_detection_spark.runner \
        --images synthetic:20000 --out /tmp/val_out --master local[8]
    python -m al_drift_detection_spark.runner \
        --images /path/images_parquet --ref /path/ref_parquet --out out/

The same file works unmodified as `spark-submit --py-files engine.zip
al_drift_detection_spark/runner.py ...` on a real cluster — getOrCreate
picks up the cluster master/conf.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import functions as F

from al_drift_detection_spark import suite as S
from al_drift_detection_spark.session import get_spark


def default_suite() -> S.CheckSuite:
    """The input_hint constraint set for the image+caption table."""
    return S.CheckSuite(
        checks=[
            S.not_null("image_id"),
            S.non_empty("caption"),
            S.in_set("fmt", ["png", "jpeg"]),
            S.between("w", 1, 10000),
            S.between("h", 1, 10000),
            S.unique("image_id"),
            S.referential("phash"),
        ],
        numeric_stat_cols=["w", "h"],
        id_stat_cols=["image_id", "phash"],
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="PySpark validation + drift engine")
    ap.add_argument("--images", default=None, help="parquet path or synthetic:N")
    ap.add_argument(
        "--orbits", default=None, metavar="CSV_GLOB",
        help="orbit-CSV corpus mode (the reference's gan.py surface): read "
        "df_<N>.csv files, z-score + rolling-mean the feature columns, "
        "assign per-orbit drift-regime ids, write orbit_drifts/ parquet and "
        "a drifts.txt in the reference's '{orbit} {drift}' line format",
    )
    ap.add_argument("--orbit-schema", default=None, help="DDL for the orbit CSVs (default: infer)")
    ap.add_argument("--orbit-ref", type=int, default=1,
                    help="number of leading orbits forming the regime-1 reference")
    ap.add_argument("--orbit-order-col", default="DATE",
                    help="intra-orbit ordering column for the rolling mean")
    ap.add_argument("--orbit-rolling", type=int, default=5000,
                    help="rolling-mean window in rows (reference: 5000)")
    ap.add_argument(
        "--crossings", action="store_true",
        help="crossing-evaluation mode (the reference's cnn.py surface): "
        "with --orbits CSV_GLOB (the labelled corpus) and --drifts FILE (a "
        "drifts_setN.txt-format verdict file, e.g. a previous --orbits "
        "run's output), run split assembly → batch inference → label "
        "smoothing → the per-split/per-drift/per-orbit metric report and "
        "write crossing_* output tables",
    )
    ap.add_argument("--drifts", default=None, metavar="FILE",
                    help="drifts file ('{orbit} {drift}' lines) for --crossings; "
                    "with --sets N use a '{set}' placeholder "
                    "(e.g. out/drifts_set{set}.txt)")
    ap.add_argument(
        "--sets", type=int, default=1, metavar="N",
        help="multi-sample driver loop (run-gan.sh/run-cnn.sh:1-7: 5 "
        "independent dataset samples per run). With --orbits, each set i "
        "runs the drift detection on its own corpus slice "
        "(sources.select_set_files — the reference's per-set file windows, "
        "fraction-scaled and seeded) and writes orbit_drifts_set{i}/ + "
        "drifts_set{i}.txt; with --crossings, each set i evaluates against "
        "its own --drifts file (cnn.py:470-485 derives the per-set corpus "
        "from drifts_set{i}.txt) and writes crossing_*_set{i}/",
    )
    ap.add_argument("--sets-seed", type=int, default=42,
                    help="seed for the per-set corpus-slice windows")
    ap.add_argument("--label-col", default="LABEL",
                    help="label column in the --crossings corpus")
    ap.add_argument("--smooth-run", type=int, default=120,
                    help="crossing-class smoothing window (rows; ref cnn.py:149-172)")
    ap.add_argument("--smooth-gap", type=int, default=60,
                    help="non-crossing-class smoothing window (rows)")
    ap.add_argument("--ref", default=None, help="reference-set parquet path (or synthetic)")
    ap.add_argument("--out", required=True, help="output directory for verdict tables")
    ap.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    ap.add_argument("--ref-windows", type=int, default=4, help="windows forming the drift reference")
    ap.add_argument("--decode", action="store_true", help="run decode/PSNR/phash checks (needs --ref)")
    ap.add_argument(
        "--regimes", action="store_true",
        help="assign drift-regime ids (new vs recurring) per window — the "
        "reference's orbit->drift_id verdict contract",
    )
    ap.add_argument(
        "--cat-drift", action="append", default=None, metavar="COLUMN",
        help="categorical column(s) to drift-test per window (chi-square "
        "goodness-of-fit vs the reference windows' distribution; repeatable) "
        "— writes the cat_drift/ output table",
    )
    ap.add_argument(
        "--assoc-drift", action="store_true",
        help="per-window fmt × w-bucket ASSOCIATION drift (mutual "
        "information vs the reference windows' MI; w bucketed into "
        "quintiles of the reference-observed range) — the joint-structure "
        "check per-column kernels can't see; writes the assoc_drift/ table",
    )
    ap.add_argument(
        "--slice-drift", action="append", default=None, metavar="SLICE:VALUE",
        help="per-SLICE drift drill-down: PSI of VALUE's distribution per "
        "(SLICE value × window) vs the slice's OWN reference-window "
        "distribution (deterministic ref-top-20 + '(other)' universe; "
        "repeatable, e.g. fmt:w) — answers WHICH slice moved when the "
        "window-level drift fires; writes the slice_drift/ table "
        "(functions/slices.sliced_psi_drift). With --stream it instead "
        "rides the closed-window family as stream_slice_drift_<slice>_"
        "<value>/ (streaming/closed.sliced_drift_spec — same universe, "
        "grid and shares via build_sliced_reference, batch-parity pinned)",
    )
    ap.add_argument(
        "--cond-completeness", action="append", default=None,
        metavar="COND:TARGET",
        help="CONDITIONAL completeness drill-down: null-ratio of TARGET per "
        "(COND category × window) vs the category's OWN reference-window "
        "ratio (deterministic ref-top-20 + '(other)' universe; repeatable, "
        "e.g. fmt:caption) — catches one source going null while the "
        "global ratio barely moves; writes the cond_completeness/ table "
        "(functions/health.conditional_completeness_drift). With --stream "
        "it instead rides the closed-window family as "
        "stream_cond_completeness_<cond>_<target>/ (streaming/closed."
        "conditional_completeness_spec — same universe and baselines via "
        "build_conditional_completeness_reference, batch-parity pinned)",
    )
    ap.add_argument(
        "--image-dedup", action="store_true",
        help="near-duplicate IMAGE detection: Hamming band-join over the "
        "phash column (distance ≤3) + duplicate-cluster resolution — writes "
        "the image_dedup/ keep/drop table",
    )
    ap.add_argument(
        "--image-dedup-store", default=None, metavar="PATH",
        help="persisted banded-fingerprint store for INCREMENTAL --image-dedup: "
        "sign only images absent from the store, probe new×(store∪new) "
        "(functions.dedup.incremental_hamming_pairs), append the new "
        "signatures; also writes the image_dedup_pairs/ table",
    )
    ap.add_argument(
        "--hll-store", default=None, metavar="PATH",
        help="persisted per-window HyperLogLog sketch store for INCREMENTAL "
        "uniqueness: sketch THIS run's rows as one snapshot (keyed by "
        "--run-id — a crash-retried run overwrites its own snapshot), then "
        "answer per-window + corpus-lifetime distinct-image_id counts from "
        "the store alone (no raw-data rescan) — writes the "
        "hll_uniqueness/ table",
    )
    ap.add_argument(
        "--quantile-store", default=None, metavar="PATH",
        help="persisted per-window histogram-sketch store for INCREMENTAL "
        "quantiles: bin THIS run's w values on the fixed constraint grid as "
        "one --run-id-keyed snapshot (idempotent replay), then answer "
        "per-window + corpus-lifetime p25/p50/p75/p95 from the store alone "
        "(functions.histograms; error <= bin width) — writes the "
        "hist_quantiles/ table",
    )
    ap.add_argument(
        "--suggest", action="store_true",
        help="constraint SUGGESTION (onboarding): profile the table in one "
        "aggregate pass and write suggested_constraints/ — the "
        "not_null/in_set/between/unique suite a human would hand-write for "
        "this table (profile.suggest_checks; HLL profile + bounded exact "
        "confirmation of unique candidates)",
    )
    ap.add_argument(
        "--caption-lm", type=int, default=None, metavar="N",
        help="LM-based caption triage: train an add-alpha bigram model on "
        "the reference windows' captions (bounded top-512 + '(unk)' "
        "vocabulary) and write caption_lm/ — the N highest-perplexity "
        "captions of the NON-reference windows (gibberish, wrong-language "
        "and boilerplate-broken captions rank first; the CCNet filter, "
        "functions/text.bigram_nll)",
    )
    ap.add_argument(
        "--metrics-store", default=None, metavar="PATH",
        help="metric-HISTORY anomaly validation (Deequ metrics-repository "
        "pattern): append this run's per-partition stat rows to a "
        "run_id-keyed repository, then score them against the trailing "
        "history of prior runs (zscore + rel-change strategies; "
        "functions.anomaly) — writes the metric_anomalies/ table; "
        "idempotent per --run-id (a replay overwrites its own rows and "
        "reproduces the same verdicts)",
    )
    ap.add_argument(
        "--seasonal-period", type=int, default=None, metavar="N",
        help="with --metrics-store: add the SEASONAL strategy (Deequ "
        "HoltWinters use case) — score this run against the slot it "
        "occupies in an N-run cycle (slot = run_ts mod N; e.g. 7 for "
        "day-of-week on daily ingests) instead of the whole trailing band; "
        "rows union into metric_anomalies/ under strategy='seasonal' "
        "(functions.anomaly.seasonal_anomaly)",
    )
    ap.add_argument(
        "--trend", action="store_true",
        help="with --metrics-store: Mann-Kendall trend test + Sen's slope "
        "per metric series over the run history (this run included) — the "
        "slow-degradation detector neither the trailing band nor the "
        "changepoint level test catches; writes metric_trend/ "
        "(functions.anomaly.trend_verdicts). With --stream it instead "
        "runs over the STREAMING verdict series (volume + per-column KS "
        "statistic, the --changepoint stream-mode pattern) and writes "
        "stream_trend/",
    )
    ap.add_argument(
        "--changepoint", action="store_true",
        help="sequential change detectors over the per-window metric series: "
        "two-sided Page-Hinkley on each drift column's per-window mean "
        "(normalized by the reference windows' per-window-mean location/"
        "scale), windowed DDM on the caption-null rate, and two-sided CUSUM "
        "vs the reference-window baseline on the same standardized series — "
        "writes the changepoint/, ddm_nullrate/ and cusum/ tables",
    )
    ap.add_argument(
        "--ph-delta", type=float, default=0.05, metavar="D",
        help="Page-Hinkley tolerated drift per step, in reference-window "
        "std units (default 0.05)",
    )
    ap.add_argument(
        "--ph-threshold", type=float, default=4.0, metavar="L",
        help="Page-Hinkley alarm threshold, in reference-window std units "
        "(default 4.0)",
    )
    ap.add_argument(
        "--health", action="store_true",
        help="windowed data-health checks: per-window row-VOLUME anomaly and "
        "per-column NULL-RATIO drift vs the reference windows — writes the "
        "health_volume/ and health_completeness/ tables",
    )
    ap.add_argument(
        "--expect-schema", default=None, metavar="DDL",
        help="validate the input schema against this DDL and write the "
        "schema_check/ verdict table (missing/unexpected/type_mismatch rows)",
    )
    ap.add_argument(
        "--stream", action="store_true",
        help="run the CLOSED-WINDOW streaming verdict family instead of the "
        "batch pass: stage the images table as an event-time file-source "
        "feed and run KS/PSI/MMD drift + volume/completeness health + KMV "
        "uniqueness (+ chi-square cat-drift per --cat-drift column) as "
        "Structured Streaming queries with parquet sinks under --out "
        "(stream_drift/, stream_health/, stream_uniqueness/, "
        "stream_cat_drift_<col>/). References come from the same "
        "window_id < --ref-windows rows the batch pass uses, so verdicts "
        "are comparable 1:1 (window_id = (window_start - BASE)/W)",
    )
    ap.add_argument(
        "--stream-window", type=int, default=300, metavar="SECONDS",
        help="event-time tumbling window length for --stream (default 300)",
    )
    ap.add_argument(
        "--stream-watermark", type=int, default=60, metavar="SECONDS",
        help="watermark (lateness allowance) for --stream (default 60)",
    )
    ap.add_argument(
        "--stream-slide", type=int, default=None, metavar="SECONDS",
        help="slide interval for --stream: overlapping event-time windows "
        "(< --stream-window) — each window instance closes independently "
        "with a verdict over its full row set; default tumbling",
    )
    ap.add_argument(
        "--salted-stats", action="store_true",
        help="per-fmt aggregate stats over the images table via the "
        "AUTO-salted two-level aggregation (skew.salted_agg_auto): measure "
        "the fmt skew profile (the table is ~90/10 jpeg/png — FIXTURES.md), "
        "derive the salt fan-out from it, and aggregate with hot keys "
        "leveled across reducers; writes skew_profile/ and fmt_stats/ "
        "(values identical to the plain group-by — the salting is purely a "
        "physical rewrite)",
    )
    ap.add_argument(
        "--store-compact-keep", type=int, default=None, metavar="N",
        help="retention for the persisted stores after this run's ingest: "
        "keep the newest N snapshots/generations/runs and fold (or, for the "
        "metrics repository, expire) everything older — applies to whichever "
        "of --hll-store / --quantile-store / --metrics-store / "
        "--image-dedup-store are given. Lossless for the sketch/signature "
        "stores (answers identical); retention-semantics for the metrics "
        "history. Atomic marker commit; crash anywhere leaves the store "
        "logically unchanged",
    )
    ap.add_argument(
        "--stream-combined", action="store_true",
        help="run every --stream verdict family in ONE streaming query over "
        "ONE read of the feed (closed_multi: shared projection + one tagged "
        "pre-reducer + one stateful dispatcher) instead of one share-nothing "
        "query per family — N families cost one corpus scan, not N. Writes "
        "the generic stream_combined/ sink, then splits it into the same "
        "per-family directories with identical rows",
    )
    ap.add_argument("--resume", action="store_true", help="skip partitions already passed in checkpoint")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument(
        "--suite", default=None, metavar="SUITE_JSON",
        help="path to a declarative suite config (JSON; see "
        "suite.suite_from_config) — default: the built-in input_hint suite",
    )
    args = ap.parse_args(argv)
    if args.images is None and args.orbits is None:
        ap.error("one of --images or --orbits is required")

    if args.crossings and (args.orbits is None or args.drifts is None):
        ap.error("--crossings requires --orbits CSV_GLOB and --drifts FILE")

    spark = get_spark(app_name="al-drift-validation", master=args.master)
    t0 = time.perf_counter()

    if args.crossings:
        import os as _os

        from al_drift_detection_spark.crossings import crossing_report, load_drifts_txt
        from al_drift_detection_spark.functions._persist import release
        from al_drift_detection_spark.orbits import NON_FEATURE_COLS
        from al_drift_detection_spark.sources import read_orbit_csvs

        if args.orbits is None:
            ap.error("--crossings needs --orbits (the labeled corpus CSVs)")
        if args.drifts is None:
            ap.error("--crossings needs --drifts (a '{orbit} {drift}' file, "
                     "e.g. a previous --orbits run's drifts.txt)")
        if args.sets > 1 and "{set}" not in args.drifts:
            ap.error("--crossings --sets N needs a '{set}' placeholder in --drifts")
        corpus = read_orbit_csvs(spark, args.orbits, schema=args.orbit_schema)
        numeric = {"double", "float", "int", "bigint", "smallint", "tinyint", "long"}
        feats = [
            c for c, t in corpus.dtypes
            if t in numeric
            and c.upper() not in NON_FEATURE_COLS
            and c != args.label_col
        ]
        _os.makedirs(args.out, exist_ok=True)
        set_summaries = []
        for i in range(1, args.sets + 1):
            sfx = f"_set{i}" if args.sets > 1 else ""
            drifts_path = args.drifts.replace("{set}", str(i))
            # per-set corpus = the orbits its drifts file lists (cnn.py:
            # 470-485 builds each set's file list from drifts_set{i}.txt);
            # crossing_report's drift-map join applies that restriction
            dm = load_drifts_txt(spark, drifts_path, orbit_col="ORBIT")
            report = crossing_report(
                corpus, dm,
                feature_cols=feats,
                orbit_col="ORBIT",
                order_col=args.orbit_order_col,
                label_col=args.label_col,
                run=args.smooth_run,
                gap=args.smooth_gap,
            )
            for name in ("splits", "predictions", "confusion", "prf", "accuracy", "sdi"):
                report[name].write.mode("overwrite").parquet(
                    f"{args.out}/crossing_{name}{sfx}"
                )
            n_rows = report["predictions"].count()
            test_acc = (
                report["accuracy"]
                .filter((F.col("scope_type") == "split") & (F.col("scope") == "test"))
                .collect()
            )
            release(report["predictions"])
            set_summaries.append({
                "set": i,
                "rows": n_rows,
                "orbits": dm.count(),
                "test_accuracy": float(test_acc[0]["accuracy"]) if test_acc else None,
            })
        summary = dict(set_summaries[0]) if args.sets == 1 else {"sets": set_summaries}
        summary.pop("set", None)
        summary.update({
            "wall_sec": round(time.perf_counter() - t0, 2), "out": args.out,
        })
        print(json.dumps(summary))
        return 0

    if args.orbits:
        import os as _os

        from al_drift_detection_spark.orbits import orbit_drift_verdicts, write_drifts_txt
        from al_drift_detection_spark.sources import (
            count_dropped_nulls,
            list_orbit_files,
            read_orbit_csvs,
            select_set_files,
        )

        _os.makedirs(args.out, exist_ok=True)
        all_files = list_orbit_files(args.orbits) if args.sets > 1 else None
        set_summaries = []
        for i in range(1, args.sets + 1):
            sfx = f"_set{i}" if args.sets > 1 else ""
            src = (
                select_set_files(all_files, i, seed=args.sets_seed)
                if args.sets > 1
                else args.orbits
            )
            # read WITHOUT the reference's silent any-null drop first so the
            # drop is observable (VERDICT r4 item 7) — the count is surfaced
            # in the summary JSON below, then the drop is applied explicitly
            raw = read_orbit_csvs(spark, src, schema=args.orbit_schema, na_drop=False)
            n_dropped = count_dropped_nulls(raw)
            corpus = raw.na.drop()
            verdicts = orbit_drift_verdicts(
                corpus,
                order_col=args.orbit_order_col,
                ref_orbits=args.orbit_ref,
                rolling_window=args.orbit_rolling,
            ).cache()
            verdicts.write.mode("overwrite").parquet(f"{args.out}/orbit_drifts{sfx}")
            write_drifts_txt(verdicts, f"{args.out}/drifts{sfx}.txt")
            n_orbits = verdicts.count()
            verdicts.unpersist()
            set_summaries.append({
                "set": i, "orbits": n_orbits, "rows_dropped_null": n_dropped,
            })
        if args.sets > 1:
            # the reference's drifts_all.txt catalogue (README.md:93,145):
            # one '{orbit} {drift}' line per orbit across the run. Here it is
            # the UNION of the per-set verdict tables (set slices may
            # overlap; an orbit seen by several sets keeps its lowest-set
            # verdict, deterministically) — the reference builds it from a
            # full-corpus run, so with --sets sampling this is the
            # catalogue of every orbit any set covered.
            allv = None
            for i in range(1, args.sets + 1):
                v = spark.read.parquet(f"{args.out}/orbit_drifts_set{i}").withColumn(
                    "_set", F.lit(i)
                )
                allv = v if allv is None else allv.unionByName(v)
            first_set = allv.groupBy("orbit").agg(F.min("_set").alias("_set"))
            catalog = allv.join(first_set, ["orbit", "_set"]).drop("_set")
            write_drifts_txt(catalog, f"{args.out}/drifts_all.txt")
        summary = dict(set_summaries[0]) if args.sets == 1 else {"sets": set_summaries}
        summary.pop("set", None)
        summary.update({
            "wall_sec": round(time.perf_counter() - t0, 2), "out": args.out,
        })
        print(json.dumps(summary))
        return 0

    if args.images.startswith("synthetic:"):
        from al_drift_detection_spark.datagen import generate_images, generate_reference

        n = int(args.images.split(":", 1)[1])
        images = generate_images(spark, n)
        ref = generate_reference(spark, n)
    else:
        images = spark.read.parquet(args.images)
        ref = spark.read.parquet(args.ref) if args.ref else None

    from al_drift_detection_spark.checkpoint import Checkpoint

    ckpt = Checkpoint(f"{args.out}/checkpoint", run_id=args.run_id)
    # Cache a PRUNED projection (everything but the image blobs): it feeds
    # the resume counts, the drift reference (which must come from the full
    # table — once the reference windows' partitions have passed and are
    # skipped, a post-filter reference would be empty and every kernel would
    # silently return 0.0/'pass'), the regime sketches, and the suite stage —
    # each triggers its own actions, and without the cache synthetic
    # generation / the table scan re-executes per action. The `bytes` column
    # stays OUT of executor storage (caching it pins the entire corpus at
    # 100 TB, VERDICT r2 "What's wrong" #4); the only bytes consumer is the
    # decode pass, which re-scans the source once (datagen is
    # counter-RNG-deterministic; parquet scans prune to the join columns).
    meta_full = images.drop("bytes").cache()
    images_src = images  # blob-carrying source, uncached — decode only

    if args.stream:
        from al_drift_detection_spark.streaming import driver as stream_driver

        cat_cols = args.cat_drift or []
        slice_pairs = []
        for spec in args.slice_drift or []:
            try:
                slice_col, value_col = spec.split(":", 1)
            except ValueError:
                print(f"--slice-drift expects SLICE:VALUE, got {spec!r}",
                      file=sys.stderr)
                return 2
            slice_pairs.append((slice_col, value_col))
        cond_pairs = []
        for spec in args.cond_completeness or []:
            try:
                cond_col, target_col = spec.split(":", 1)
            except ValueError:
                print(f"--cond-completeness expects COND:TARGET, got {spec!r}",
                      file=sys.stderr)
                return 2
            cond_pairs.append((cond_col, target_col))
        n_windows = stream_driver.stage_bounded_stream(
            meta_full, f"{args.out}/_stream_input",
            args.stream_window, args.stream_watermark,
        )
        refs = stream_driver.build_references(
            meta_full, args.ref_windows, cat_cols, slice_pairs=slice_pairs,
            cond_pairs=cond_pairs,
        )
        run_streams = (
            stream_driver.run_closed_streams_combined
            if args.stream_combined
            else stream_driver.run_closed_streams
        )
        counts = run_streams(
            spark, f"{args.out}/_stream_input", args.out, refs, cat_cols,
            window_seconds=args.stream_window,
            watermark=f"{args.stream_watermark} seconds",
            slide_seconds=args.stream_slide,
        )
        if args.changepoint:
            # sequential detector over the STREAMING verdict series: the
            # closed-window sinks are durable O(windows) tables, so the
            # detector recomputes exactly over the accumulated series after
            # each drain — in a continuous deployment the same call rides a
            # foreachBatch on the verdict sink, giving per-trigger alarms
            # with identical end state (the detector is a pure function of
            # the series prefix). Signals: per-window volume (health
            # n_rows) and each drift column's KS statistic.
            from al_drift_detection_spark.functions.changepoint import (
                normalized_page_hinkley,
            )

            wid = (
                (F.unix_timestamp("window_start")
                 - F.unix_timestamp(F.lit(stream_driver.BASE_TS)))
                / args.stream_window
            ).cast("long").alias("window_id")
            frames = []
            vol = (
                spark.read.parquet(f"{args.out}/stream_health")
                .select(wid, F.col("n_rows").cast("double").alias("x"))
                .distinct()  # one n_rows per window, repeated across checks
            )
            frames.append(
                normalized_page_hinkley(
                    vol, "window_id", "x", args.ref_windows,
                    delta=args.ph_delta, threshold=args.ph_threshold,
                ).withColumn("signal", F.lit("volume"))
            )
            drift_tbl = spark.read.parquet(f"{args.out}/stream_drift").filter(
                F.col("kernel") == "ks"
            )
            for col in ("w", "h"):
                ser = drift_tbl.filter(F.col("column") == col).select(
                    wid, F.col("statistic").alias("x")
                )
                frames.append(
                    normalized_page_hinkley(
                        ser, "window_id", "x", args.ref_windows,
                        delta=args.ph_delta, threshold=args.ph_threshold,
                    ).withColumn("signal", F.lit(f"ks:{col}"))
                )
            cp = frames[0]
            for f in frames[1:]:
                cp = cp.unionByName(f)
            cp.orderBy("signal", "window_id").write.mode("overwrite").parquet(
                f"{args.out}/stream_changepoint"
            )
        if args.trend:
            # retrospective Mann-Kendall over the STREAMING verdict series
            # (the --changepoint stream-mode pattern): per-window volume and
            # each drift column's KS statistic, keyed into the repository's
            # (part, column, metric) series shape so trend_verdicts applies
            # unchanged — catches a slow creep across windows that neither
            # the per-window verdicts nor the level-shift detector alarm on
            from al_drift_detection_spark.functions.anomaly import (
                trend_verdicts,
            )

            wid = (
                (F.unix_timestamp("window_start")
                 - F.unix_timestamp(F.lit(stream_driver.BASE_TS)))
                / args.stream_window
            ).cast("long").alias("run_ts")
            frames = [
                spark.read.parquet(f"{args.out}/stream_health")
                .select(wid, F.col("n_rows").cast("double").alias("value"))
                .distinct()
                .select(
                    F.lit(0).alias("part"), F.lit("volume").alias("column"),
                    F.lit("n_rows").alias("metric"), "value", "run_ts",
                )
            ]
            drift_tbl = spark.read.parquet(f"{args.out}/stream_drift").filter(
                F.col("kernel") == "ks"
            )
            for col in ("w", "h"):
                frames.append(
                    drift_tbl.filter(F.col("column") == col).select(
                        F.lit(0).alias("part"), F.lit(col).alias("column"),
                        F.lit("ks_stat").alias("metric"),
                        F.col("statistic").alias("value"), wid,
                    )
                )
            ser = frames[0]
            for f in frames[1:]:
                ser = ser.unionByName(f)
            tr = trend_verdicts(ser, min_runs=5)
            tr.orderBy("column", "metric").write.mode("overwrite").parquet(
                f"{args.out}/stream_trend"
            )
            from al_drift_detection_spark.functions._persist import release

            release(tr)
        print(json.dumps({
            "mode": "stream", "windows": n_windows, "tables": counts,
            "wall_sec": round(time.perf_counter() - t0, 2), "out": args.out,
        }))
        return 0

    meta = meta_full
    if args.resume:
        meta = ckpt.filter_pending(meta_full)
        skipped = (
            meta_full.select("part").distinct().count()
            - meta.select("part").distinct().count()
        )
        print(f"resume: skipping {skipped} already-passed partitions", file=sys.stderr)

    suite = S.suite_from_json(args.suite) if args.suite else default_suite()
    res = suite.run(meta, ref=ref.select("phash") if ref is not None else None)

    from al_drift_detection_spark.drift import build_reference_sample, drift_scores

    ref_rows = meta_full.filter(F.col("window_id") < args.ref_windows)
    samples = build_reference_sample(ref_rows, ["w", "h"])
    drift = drift_scores(meta, ["w", "h"], samples)

    res.verdicts.orderBy("part", "check_name").write.mode("overwrite").parquet(f"{args.out}/verdicts")
    res.violations.write.mode("overwrite").parquet(f"{args.out}/violations")
    if res.stats is not None:
        res.stats.write.mode("overwrite").parquet(f"{args.out}/stats")
    res.unpersist()  # free the suite's shared dup/miss frames (now written)
    drift.orderBy("part", "window_id", "column", "kernel").write.mode("overwrite").parquet(
        f"{args.out}/drift"
    )

    if args.suggest:
        from al_drift_detection_spark.profile import (
            suggest_checks,
            suggestions_df,
            suite_from_suggestions,
        )
        from al_drift_detection_spark.suite import suite_to_config

        sugg_cols = ["image_id", "caption", "fmt", "w", "h", "phash"]
        sugg_checks, sugg_rows = suggest_checks(meta_full, columns=sugg_cols)
        suggestions_df(spark, sugg_rows).orderBy("column", "check").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/suggested_constraints")
        # the runnable artifact: a --suite-loadable JSON of the suggested
        # suite (suggest → review → rerun with --suite suggested_suite.json)
        sugg_suite = suite_from_suggestions(
            sugg_checks, sugg_rows, part_col="part", row_id_col="image_id"
        )
        with open(f"{args.out}/suggested_suite.json", "w") as fh:
            json.dump(suite_to_config(sugg_suite), fh, indent=1)
        # the schema-inference half: type suggestions for the string columns
        # (an all-'string' verdict on this table IS the no-false-positive
        # answer — ids/captions/fmt must not be suggested numeric)
        from al_drift_detection_spark.profile import type_suggestions

        type_suggestions(meta_full).orderBy("column").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/suggested_types")

    if args.metrics_store:
        from al_drift_detection_spark.functions.anomaly import MetricsStore

        if res.stats is None:
            raise SystemExit(
                "--metrics-store needs a suite with numeric/id stat columns "
                "(the default suite has them; JSON suites need stats_* keys)"
            )
        mstore = MetricsStore(args.metrics_store)
        run_ts = mstore.resolve_run_ts(spark, args.run_id)
        # this run's long metric rows, read back from the tiny stats table
        # (never a raw re-scan); append FIRST (durable, idempotent per
        # run_id), then score vs the store MINUS this run's own rows — so a
        # crash between the two steps, or a full replay, converges on the
        # same verdicts
        cur = spark.read.parquet(f"{args.out}/stats").select(
            "part", "column", "metric", "value"
        )
        mstore.append(cur, args.run_id, run_ts)
        if args.store_compact_keep is not None:
            # retention AFTER the append, BEFORE scoring: verdicts compare
            # against exactly the retained window (this run's rows are
            # excluded from its own history either way)
            mstore.expire(spark, keep_last_runs=args.store_compact_keep)
        verd = mstore.verdicts(cur, args.run_id)
        from al_drift_detection_spark.functions._persist import (
            propagate_persisted,
            release,
        )

        if args.seasonal_period:
            seas = mstore.seasonal_verdicts(
                cur, args.run_id, run_ts, args.seasonal_period
            )
            verd = propagate_persisted(verd.unionByName(seas), verd, seas)
        verd.orderBy("strategy", "part", "column", "metric").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/metric_anomalies")
        release(verd)
        if args.changepoint:
            # cross-run sequential view of the repository: Page-Hinkley per
            # metric series over ALL runs (this one included — it was just
            # appended), alongside the per-run band verdicts above
            from al_drift_detection_spark.functions.anomaly import (
                store_changepoint,
            )

            cp = store_changepoint(
                mstore.history(spark),
                delta=args.ph_delta, threshold=args.ph_threshold,
            )
            cp.orderBy("part", "column", "metric", "run_ts").write.mode(
                "overwrite"
            ).parquet(f"{args.out}/metric_changepoint")
            release(cp)
        if args.trend:
            # retrospective trend view of the repository: Mann-Kendall +
            # Sen's slope per metric series over ALL runs (this one
            # included) — catches monotone creep the band and the
            # level-shift test both miss
            from al_drift_detection_spark.functions.anomaly import (
                trend_verdicts,
            )

            tr = trend_verdicts(mstore.history(spark))
            tr.orderBy("part", "column", "metric").write.mode(
                "overwrite"
            ).parquet(f"{args.out}/metric_trend")
            release(tr)

    if args.image_dedup:
        from al_drift_detection_spark.functions.dedup import (
            dedup_clusters,
            hamming_pairs,
            incremental_hamming_pairs,
        )

        # perceptual near-dup retrieval on the input_hint phash column: the
        # image analog of the text SimHash path — same band-rotation core
        fp = meta_full.select("image_id", "phash")
        if args.image_dedup_store:
            # INCREMENTAL: sign only images absent from the persisted banded
            # store, probe new×(store∪new). The durable pair record is a
            # LEDGER beside the store, partitioned by a store-generation
            # batch key (deterministic under crash-retry: the store is
            # unchanged until the append, so a replay that re-signs hits
            # the SAME partition with the SAME pairs; a replay after the
            # append emits an empty frame whose dynamic-partition overwrite
            # touches nothing — earlier emissions survive). The write rides
            # the `sink` seam so the durable emission happens BEFORE the
            # store append — writing after the call returns would leave a
            # crash window (append done, pairs not) that a retry cannot
            # repair (replay signs 0, emits 0).
            from al_drift_detection_spark.functions.dedup import (
                incremental_keep,
                read_signature_store,
            )

            store = args.image_dedup_store
            ledger_path = store.rstrip("/") + "_pairs"
            # COMMITTED store generations only (read_signature_store): a
            # crashed, marker-less append is invisible, so the replay's
            # batch key matches the original attempt's
            store_df = read_signature_store(spark, store)
            batch_key = (
                store_df.select("id").distinct().count()
                if store_df is not None
                else 0
            )

            def _sink(p):
                (
                    p.withColumn("_batch_id", F.lit(int(batch_key)))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("_batch_id")
                    .parquet(ledger_path)
                )

            pairs = incremental_hamming_pairs(
                fp, store, "phash", "image_id",
                max_distance=3, bands=4, sink=_sink,
            )
            # per-run convenience copy (THIS run's emissions; the ledger is
            # the durable cumulative record — a replay run's copy is empty)
            pairs.write.mode("overwrite").parquet(f"{args.out}/image_dedup_pairs")
            # keep/drop is FIRST-SIGNED-WINS, derived from the cumulative
            # ledger, never from the in-flight batch frame — so a replayed
            # run (0 signed, 0 pairs) reproduces the first run's verdicts
            # (incremental_keep docstring). Explicit-schema read: a pair-less
            # first run leaves a ledger directory without inferable schema.
            ledger = spark.read.schema(
                "a_id string, b_id string, hamming int, a_new boolean, "
                "b_new boolean, n_new_signed long, _batch_id long"
            ).parquet(ledger_path)
            # distinct ids on the verdict side: planted duplicate image_ids
            # would otherwise fan the row-level left join out
            keep = incremental_keep(
                fp.select("image_id").distinct(), ledger, "image_id"
            )
            clusters = fp.select("image_id").join(keep, "image_id", "left")
            if args.store_compact_keep is not None:
                from al_drift_detection_spark.functions.dedup import (
                    compact_signature_store,
                )

                # materialize the verdicts (they probe the store) BEFORE the
                # fold rewrites its directories
                clusters = clusters.localCheckpoint(eager=True)
                compact_signature_store(
                    spark, store, keep_last=args.store_compact_keep
                )
        else:
            pairs = hamming_pairs(fp, "phash", "image_id", max_distance=3, bands=4)
            clusters = dedup_clusters(fp.select("image_id"), pairs, id_col="image_id")
        clusters.write.mode("overwrite").parquet(f"{args.out}/image_dedup")

    if args.cat_drift:
        from al_drift_detection_spark.drift import categorical_drift

        frames = []
        for col in args.cat_drift:
            # reference distribution from the same clean windows the scalar
            # kernels use; NULLs are a category (matching categorical_drift)
            cnts = (
                ref_rows.groupBy(F.coalesce(F.col(col).cast("string"), F.lit("(null)")).alias("c"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            tot = sum(r["n"] for r in cnts)
            props = {r["c"]: r["n"] / tot for r in cnts}
            # a DATA value equal to the reserved catch-all name would trip
            # categorical_drift's reserved-name ValueError and abort the run
            # (ADVICE r3). ADVICE r4 refined the fix: folding it into the
            # eps catch-all makes EVERY window fail whenever '(other)' is a
            # genuinely common category (observed mass p·n vs expected
            # eps·n). Instead remap the literal to an escaped label in BOTH
            # the reference props and the data column, so it keeps its true
            # expected mass. A pre-existing '(other:literal)' category MERGES
            # with it on both sides (expected masses SUMMED — overwriting
            # would drop its mass while the data counts still merged, a
            # guaranteed chi2 inflation; review-caught): lossy labeling, not
            # a wrong verdict. A literal "(null)" string likewise merges
            # with real NULLs by the coalesce contract.
            cat_in = meta
            if "(other)" in props:
                props["(other:literal)"] = (
                    props.get("(other:literal)", 0.0) + props.pop("(other)")
                )
                s = F.col(col).cast("string")
                cat_in = meta.withColumn(
                    col,
                    F.when(s == "(other)", F.lit("(other:literal)")).otherwise(s),
                )
                print(
                    f"cat-drift[{col}]: reference data contains the literal "
                    "'(other)' category — remapped to '(other:literal)' in "
                    "both reference and data so it keeps its expected mass",
                    file=sys.stderr,
                )
            frames.append(
                categorical_drift(cat_in, col, props).withColumn("column", F.lit(col))
            )
        if frames:
            cat_out = frames[0]
            for f in frames[1:]:
                cat_out = cat_out.unionByName(f)
            cat_out.orderBy("column", "window_id").write.mode("overwrite").parquet(
                f"{args.out}/cat_drift"
            )

    if args.assoc_drift:
        from al_drift_detection_spark.functions._persist import release
        from al_drift_detection_spark.functions.health import association_drift
        from al_drift_detection_spark.streaming.driver import _w_bucket_col

        # reference-derived w quintile buckets + reference-observed fmt
        # universe — the same deterministic-grid rules the streaming
        # stream_association sink uses, so batch and stream verdicts are
        # twins over the same row sets
        wr = ref_rows.agg(
            F.min(F.col("w").cast("double")).alias("lo"),
            F.max(F.col("w").cast("double")).alias("hi"),
        ).collect()[0]
        w_lo = float(wr["lo"]) if wr["lo"] is not None else 0.0
        w_hi = float(wr["hi"]) if wr["hi"] is not None else w_lo + 1.0
        if w_hi <= w_lo:
            w_hi = w_lo + 1.0
        fmt_cats = sorted(
            r["c"]
            for r in ref_rows.select(
                F.coalesce(F.col("fmt").cast("string"), F.lit("(null)")).alias("c")
            )
            .distinct()
            .collect()
            if r["c"] != "(other)"  # reserved catch-all absorbs a literal
        )
        ad = association_drift(
            meta.withColumn("w_bucket", _w_bucket_col(w_lo, w_hi)),
            "fmt", "w_bucket",
            cats_a=fmt_cats, cats_b=[str(i) for i in range(5)],
            ref_filter=F.col("window_id") < args.ref_windows,
            max_abs_diff=0.1,
        )
        ad.orderBy("window_id").write.mode("overwrite").parquet(
            f"{args.out}/assoc_drift"
        )
        release(ad)

    if args.slice_drift:
        from al_drift_detection_spark.functions._persist import (
            propagate_persisted,
            release,
        )
        from al_drift_detection_spark.functions.slices import sliced_psi_drift

        frames = []
        for spec in args.slice_drift:
            try:
                slice_col, value_col = spec.split(":", 1)
            except ValueError:
                print(f"--slice-drift expects SLICE:VALUE, got {spec!r}",
                      file=sys.stderr)
                return 2
            sd = sliced_psi_drift(
                meta, value_col, slice_col, "window_id",
                ref_filter=F.col("window_id") < args.ref_windows,
            )
            frames.append(
                propagate_persisted(
                    sd.select(
                        F.lit(slice_col).alias("slice_col"),
                        F.lit(value_col).alias("value_col"),
                        "window_id", "slice", "n_cur", "psi", "rank", "verdict",
                    ),
                    sd,
                )
            )
        out_sd = frames[0]
        for fr in frames[1:]:
            out_sd = out_sd.unionByName(fr)
        out_sd = propagate_persisted(out_sd, *frames)
        out_sd.orderBy(
            "slice_col", "value_col", "window_id", "rank"
        ).write.mode("overwrite").parquet(f"{args.out}/slice_drift")
        # release the persisted children sliced_psi_drift attached — the
        # .select() wrapper used to drop them, leaking executor storage for
        # the session lifetime (ADVICE r7; the caption_lm block's contract)
        release(out_sd)

    if args.caption_lm:
        from al_drift_detection_spark.functions._persist import (
            propagate_persisted,
            release,
        )
        from al_drift_detection_spark.functions.text import bigram_nll

        docs = meta_full.filter(F.col("caption").isNotNull()).select(
            "image_id", "caption", "window_id"
        )
        scored = bigram_nll(
            docs, ref_filter=F.col("window_id") < args.ref_windows,
            text_col="caption", id_col="image_id",
        )
        # rank only the non-reference windows (the triage question is
        # about THIS ingest); TakeOrdered keeps it a top-k heap per
        # partition, never a global sort
        lm = propagate_persisted(
            scored.join(
                docs.filter(F.col("window_id") >= args.ref_windows).select(
                    "image_id", "window_id", "caption"
                ),
                "image_id",
            )
            .orderBy(F.desc("nll"), F.asc("image_id"))
            .limit(args.caption_lm),
            scored,
        )
        lm.write.mode("overwrite").parquet(f"{args.out}/caption_lm")
        release(lm)

    if args.cond_completeness:
        from al_drift_detection_spark.functions._persist import (
            propagate_persisted,
            release,
        )
        from al_drift_detection_spark.functions.health import (
            conditional_completeness_drift,
        )

        frames = []
        for spec in args.cond_completeness:
            try:
                cond_col, target_col = spec.split(":", 1)
            except ValueError:
                print(f"--cond-completeness expects COND:TARGET, got {spec!r}",
                      file=sys.stderr)
                return 2
            cc = conditional_completeness_drift(
                meta_full, cond_col, target_col, "window_id",
                ref_filter=F.col("window_id") < args.ref_windows,
                threshold=0.1, min_rows=50,
            )
            frames.append(
                propagate_persisted(
                    cc.select(
                        F.lit(cond_col).alias("cond_col"),
                        F.lit(target_col).alias("target_col"),
                        "window_id", "category", "n_cur", "null_ratio",
                        "ref_ratio", "delta", "verdict",
                    ),
                    cc,
                )
            )
        out_cc = frames[0]
        for fr in frames[1:]:
            out_cc = out_cc.unionByName(fr)
        out_cc = propagate_persisted(out_cc, *frames)
        out_cc.orderBy(
            "cond_col", "target_col", "window_id", "category"
        ).write.mode("overwrite").parquet(f"{args.out}/cond_completeness")
        # release the persisted children (ADVICE r7 — the .select() wrapper
        # dropped them; same contract as the caption_lm block)
        release(out_cc)

    if args.health:
        from al_drift_detection_spark.functions._persist import release
        from al_drift_detection_spark.functions.health import (
            completeness_drift,
            volume_anomaly,
        )

        in_ref = F.col("window_id") < args.ref_windows
        vol = volume_anomaly(meta_full, "window_id", ref_filter=in_ref)
        vol.orderBy("window_id").write.mode("overwrite").parquet(
            f"{args.out}/health_volume"
        )
        release(vol)
        comp = completeness_drift(
            meta_full, ["caption", "phash", "w", "h", "fmt"], "window_id",
            ref_filter=in_ref,
        )
        comp.orderBy("window_id", "column").write.mode("overwrite").parquet(
            f"{args.out}/health_completeness"
        )
        release(comp)
        from al_drift_detection_spark.functions.health import uniqueness_drift

        uniq = uniqueness_drift(
            meta_full, "image_id", "window_id", ref_filter=in_ref
        )
        uniq.orderBy("window_id").write.mode("overwrite").parquet(
            f"{args.out}/health_uniqueness"
        )
        release(uniq)

    if args.salted_stats:
        from al_drift_detection_spark.functions._persist import release
        from al_drift_detection_spark.skew import salted_agg_auto, skew_profile

        prof = skew_profile(meta_full, "fmt", max_salts=32)
        prof_rows = prof.orderBy(F.desc("cnt"))
        prof_rows.write.mode("overwrite").parquet(f"{args.out}/skew_profile")
        stats_df, n_salts = salted_agg_auto(
            meta_full,
            group_cols=["fmt"],
            aggs={
                "n": F.count(F.lit(1)),
                "sum_w": F.sum(F.col("w").cast("double")),
                "min_h": F.min("h"),
                "max_h": F.max("h"),
            },
            row_key="image_id",
            profile=spark.read.parquet(f"{args.out}/skew_profile"),
        )
        release(prof)
        stats_df.withColumn("n_salts_used", F.lit(int(n_salts))).orderBy(
            "fmt"
        ).write.mode("overwrite").parquet(f"{args.out}/fmt_stats")

    if args.hll_store:
        from al_drift_detection_spark.functions.sketches import (
            compact_hll_store,
            store_uniqueness,
            update_hll_store,
        )
        from al_drift_detection_spark.functions.stores import allocate_snapshot_id

        # snapshot key = the store's MONOTONIC run-keyed allocation: a
        # crash-retried run keeps its id and dynamic-overwrites its OWN
        # snapshot partition (idempotent), a new run-id gets the next id —
        # the ordering the compaction cutoff requires; estimates are
        # union-merges over the store, so re-sketching identical rows never
        # inflates the distinct count (HLL registers are value-idempotent)
        # — only n_rows, which counts ingested rows by design
        snap = allocate_snapshot_id(args.hll_store, args.run_id)
        update_hll_store(
            meta_full.select("window_id", "image_id"),
            args.hll_store, "image_id", "window_id", snapshot_id=snap,
        )
        if args.store_compact_keep is not None:
            compact_hll_store(
                spark, args.hll_store, "window_id",
                keep_last=args.store_compact_keep,
            )
        store_uniqueness(spark, args.hll_store, "window_id").orderBy(
            F.col("window_id").asc_nulls_last()
        ).write.mode("overwrite").parquet(f"{args.out}/hll_uniqueness")

    if args.quantile_store:
        from al_drift_detection_spark.functions.histograms import (
            compact_histogram_store,
            store_quantiles,
            update_histogram_store,
        )
        from al_drift_detection_spark.functions.stores import allocate_snapshot_id

        # grid = the suite's between-constraint bounds (a DETERMINISTIC
        # reference universe, never data-derived — the categorical_drift
        # rule), so snapshots merge across ingests; error ≤ ~9.8 px/bin
        q_lo, q_hi, q_bins = 0.0, 10000.0, 1024
        update_histogram_store(
            meta_full.select("window_id", "w"),
            args.quantile_store, "w", "window_id", q_lo, q_hi,
            snapshot_id=allocate_snapshot_id(args.quantile_store, args.run_id),
            n_bins=q_bins,
        )
        if args.store_compact_keep is not None:
            compact_histogram_store(
                spark, args.quantile_store, keep_last=args.store_compact_keep
            )
        store_quantiles(
            spark, args.quantile_store, [0.25, 0.5, 0.75, 0.95],
            q_lo, q_hi, q_bins,
        ).orderBy(F.col("window").asc_nulls_last(), "q").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/hist_quantiles")

    if args.changepoint:
        from al_drift_detection_spark.functions.changepoint import (
            ddm_levels,
            normalized_page_hinkley,
        )

        # Page-Hinkley over each drift column's per-window mean, the series
        # the scalar kernels also watch — but SEQUENTIAL: "when did the level
        # shift", cumulative over the run, vs the kernels' per-window
        # two-sample verdicts. Normalization by the reference windows'
        # location/scale makes --ph-delta/--ph-threshold dimensionless
        # (functions/changepoint.normalized_page_hinkley).
        frames = []
        for col in ("w", "h"):
            series = meta_full.groupBy("window_id").agg(
                F.avg(F.col(col).cast("double")).alias("x")
            )
            out = normalized_page_hinkley(
                series, "window_id", "x", args.ref_windows,
                delta=args.ph_delta, threshold=args.ph_threshold,
            )
            frames.append(out.withColumn("column", F.lit(col)))
        cp = frames[0]
        for f in frames[1:]:
            cp = cp.unionByName(f)
        cp.orderBy("column", "window_id").write.mode("overwrite").parquet(
            f"{args.out}/changepoint"
        )
        # windowed DDM on the caption-null rate — the binomial per-window
        # error signal the completeness check already tracks, here with the
        # sequential warn/drift ladder (level 0/1/2)
        from al_drift_detection_spark.functions._persist import release

        nser = meta_full.groupBy("window_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("caption").isNull().cast("long")).alias("err"),
        )
        ddm = ddm_levels(nser, "window_id", "n", "err")
        ddm.orderBy("window_id").write.mode("overwrite").parquet(
            f"{args.out}/ddm_nullrate"
        )
        release(ddm)
        # two-sided CUSUM vs the reference windows' known baseline — the
        # third sequential test (PH = running mean, DDM = error register,
        # CUSUM = known in-control level). The series is standardized by the
        # reference windows' location/scale (lazy broadcast join, no collect)
        # so --ph-threshold keeps its dimensionless std-units meaning here
        # too; cusum_levels then re-derives its baseline on the standardized
        # prefix (mu ≈ 0, k ≈ 0.5 std).
        from al_drift_detection_spark.functions._persist import (
            propagate_persisted,
            release,
        )
        from al_drift_detection_spark.functions.changepoint import cusum_levels

        cframes = []
        for col in ("w", "h"):
            series = meta_full.groupBy("window_id").agg(
                F.avg(F.col(col).cast("double")).alias("x")
            )
            ref_ls = series.filter(F.col("window_id") < args.ref_windows).agg(
                F.avg("x").alias("_mu0"),
                F.coalesce(F.nullif(F.stddev("x"), F.lit(0.0)), F.lit(1.0)).alias(
                    "_sd0"
                ),
            )
            norm = series.crossJoin(F.broadcast(ref_ls)).select(
                "window_id",
                ((F.col("x") - F.col("_mu0")) / F.col("_sd0")).alias("x"),
            )
            out = cusum_levels(
                norm, "window_id", "x", args.ref_windows,
                threshold=args.ph_threshold,
            )
            # withColumn drops the _persisted_children attribute — carry the
            # cusum_levels series persist onto the appended frame
            cframes.append(
                propagate_persisted(out.withColumn("column", F.lit(col)), out)
            )
        cu = cframes[0]
        for f in cframes[1:]:
            cu = cu.unionByName(f)
        cu = propagate_persisted(cu, *cframes)
        cu.orderBy("column", "window_id").write.mode("overwrite").parquet(
            f"{args.out}/cusum"
        )
        release(cu)

    if args.expect_schema:
        from al_drift_detection_spark.functions.health import schema_check

        # validate the SOURCE schema (blob column included), not the pruned
        # cache projection
        schema_check(images_src, args.expect_schema).write.mode("overwrite").parquet(
            f"{args.out}/schema_check"
        )

    if args.regimes:
        import os

        from al_drift_detection_spark.regimes import (
            assign_drift_regimes,
            catalog_from_df,
            catalog_to_df,
        )

        catalog: dict = {}
        if args.resume and os.path.exists(f"{args.out}/regime_catalog"):
            catalog = catalog_from_df(spark.read.parquet(f"{args.out}/regime_catalog"))
        regimes = assign_drift_regimes(meta_full, ["w", "h"], samples, catalog=catalog)
        regimes = regimes.cache()
        regimes.orderBy("window_id").write.mode("overwrite").parquet(f"{args.out}/regimes")
        from al_drift_detection_spark.regimes import regime_segments

        regime_segments(regimes).write.mode("overwrite").parquet(
            f"{args.out}/regime_segments"
        )
        # persist the regime catalog next to the checkpoint so a resumed run
        # recognises previously-seen regimes instead of re-minting ids
        catalog_to_df(spark, catalog).write.mode("overwrite").parquet(
            f"{args.out}/regime_catalog"
        )

    if args.decode:
        if ref is None:
            ap.error("--decode requires --ref")
        from al_drift_detection_spark.decode import decode_checks

        decode_src = ckpt.filter_pending(images_src) if args.resume else images_src
        decode_checks(decode_src, ref).write.mode("overwrite").parquet(
            f"{args.out}/decode_violations"
        )

    ckpt.record(spark.read.parquet(f"{args.out}/verdicts"))

    n_rows = meta.count()
    wall = time.perf_counter() - t0
    verd = spark.read.parquet(f"{args.out}/verdicts")
    summary = {
        "rows": n_rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall, 1),
        "verdicts": verd.count(),
        "failed_checks": verd.filter(F.col("verdict") == "fail").count(),
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
