"""Round-8 optimization measurement harness (guide §1: measure first).

NOT the driver bench — bench.py is frozen for measurement. This tool times
individual registry queries with the SAME methodology bench.py uses
(page-cache re-warm before every timed run, fn(spark, sf_dir).count(),
clearCache between runs) so its numbers are comparable to the driver series,
and additionally:

- `--noop`     times a noop-sink materialization (guide §1.4) instead of
               .count(), isolating compute of every column from agg pruning;
- `--explain TAG` writes `.explain("formatted")` for each query to
               plans/r08/<query>_<TAG>.txt (the judge's plan evidence);
- `--repeats N` reports all samples (first = cold-codegen, rest = warm);
- `validation` / `stream` / `streamc` pseudo-queries time the bench legs.

Usage:
    python bench_extra.py [--sf DIR] [--repeats N] [--noop] [--explain TAG] q_a q_b ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import ensure_images, stream_pass, validation_pass, warm_page_cache  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=[])
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None, metavar="TAG")
    ap.add_argument("--plans-dir", default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08"))
    args = ap.parse_args()

    from al_drift_detection_spark.operators import REGISTRY
    from al_drift_detection_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf}/region.parquet").count()  # untimed JVM warmup
    warm_page_cache(args.sf)

    sf = args.sf.rstrip("/").split("sf")[-1]
    n_images = max(2000, int(float(sf) * 10_000_000))
    images_path = f"/tmp/bench_images_{n_images}"

    results: dict[str, list[float]] = {}
    for name in args.queries:
        if name == "validation":
            ensure_images(spark, n_images, images_path)
            samples = []
            for _ in range(args.repeats):
                warm_page_cache(images_path, images_path + "_ref")
                samples.append(round(validation_pass(spark, images_path)["wall"], 3))
            results[name] = samples
            print(f"{name}: {samples}", flush=True)
            continue
        if name == "validation_decode":
            ensure_images(spark, n_images, images_path)
            samples = []
            for _ in range(args.repeats):
                warm_page_cache(images_path, images_path + "_ref")
                samples.append(
                    round(validation_pass(spark, images_path, include_decode=True)["wall"], 3)
                )
            results[name] = samples
            print(f"{name}: {samples}", flush=True)
            continue
        if name in ("stream", "streamc"):
            ensure_images(spark, n_images, images_path)
            samples = []
            for _ in range(args.repeats):
                warm_page_cache(images_path)
                st = stream_pass(
                    spark, images_path, f"/tmp/bx_stream_{n_images}",
                    combined=(name == "streamc"),
                )
                samples.append(round(st["wall"], 3))
                print(
                    f"  {name} split: stage={st['stage_wall']:.2f}"
                    f" stream={st['stream_wall']:.2f}", flush=True,
                )
            results[name] = samples
            print(f"{name}: {samples}", flush=True)
            continue

        fn = REGISTRY[name].fn
        if args.explain:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{name}_{args.explain}.txt"), "w") as fh:
                fh.write(txt)
            spark.catalog.clearCache()
        samples = []
        for _ in range(args.repeats):
            warm_page_cache(args.sf)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
        results[name] = samples
        print(f"{name}: {samples}", flush=True)

    print(json.dumps({"sf": float(sf), "noop": args.noop, "results": results}))


if __name__ == "__main__":
    main()
