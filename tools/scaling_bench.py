"""Two-parallelism scaling measurement (north_rule: throughput scaling
efficiency ≥ 0.8 between N and 4N executors; sandbox stand-in local[8] vs
local[32] per the driver brief).

Runs the SAME validation job on the SAME input at both parallelism levels in
separate JVMs (fresh SparkSession each), reports throughput at both and
efficiency = (T_low / T_high) / (cpus_high / cpus_low).

Usage: python tools/scaling_bench.py [n_rows] [low_cpus] [high_cpus]
Writes BENCH_SCALING.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from al_drift_detection_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(app_name="scale-bench", master="local[{cpus}]", shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
from bench import validation_pass, warm_page_cache
# warm-up: JVM/codegen (small, not timed) AND the OS page cache — the host
# balloon drops it at arbitrary times (bench.py's hard-won lesson), and a
# level that runs after a drop measures this VM's very slow disk, not the
# engine: the r4 first attempt read 8-core 208 s vs 164 s for exactly this
# reason while the 2-core level (running right after generation, cache warm)
# matched round 3 within 1%
warm_page_cache("{path}", "{path}_ref")
spark.read.parquet("{path}").limit(1000).count()
# full pass INCLUDING the decode/PSNR/phash invariants — the north-star
# workload has real per-row CPU, so the measurement is compute-bound
r = validation_pass(spark, "{path}", include_decode=True)
print("RESULT " + json.dumps(r))
"""


def run_level(repo: str, path: str, cpus: int) -> dict:
    """One parallelism level in a fresh, CPU-PINNED process.

    taskset bounds the whole process tree (JVM task threads AND python UDF
    workers) to exactly `cpus` cores — the local-mode analog of an N-core
    executor. Without pinning, local[N]'s python workers run on any core, so
    the low level silently uses extra parallelism and deflates the measured
    N→4N speedup."""
    code = CHILD.replace("{repo}", repo).replace("{cpus}", str(cpus)).replace("{path}", path)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stderr[-2000:]}")


def _burn(_):
    x = 0.0
    for i in range(6_000_000):
        x += i * 0.5
        x *= 0.9999999
    return x


def hardware_ceiling(low: int, high: int) -> dict:
    """Calibration control: pure-CPU work (no Spark, no memory pressure) at
    both concurrency levels. On a virtualized host, per-core throughput
    degrades as concurrency rises; the ratio bounds ANY job's achievable
    scaling efficiency on this box and is reported alongside the engine's
    number so the two aren't conflated."""
    import multiprocessing as mp
    import time as _t

    burn = _burn
    walls = {}
    for procs in (low, high):
        t0 = _t.perf_counter()
        with mp.Pool(procs) as p:
            p.map(burn, range(procs))  # one equal chunk per proc
        walls[procs] = _t.perf_counter() - t0
    # perfect scaling => equal walls; ceiling = wall_low / wall_high capped at 1
    ceiling = min(1.0, walls[low] / walls[high])
    return {"pure_cpu_wall_low": round(walls[low], 3),
            "pure_cpu_wall_high": round(walls[high], 3),
            "hardware_efficiency_ceiling": round(ceiling, 3)}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = f"/tmp/bench_images_{n_rows}"

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        sys.path.insert(0, repo)  # before the imports — running as
        # `python tools/scaling_bench.py` puts tools/ (not the repo) on path
        from al_drift_detection_spark.session import get_spark
        from bench import ensure_images

        spark = get_spark(app_name="gen", master="local[32]")
        ensure_images(spark, n_rows, path)
        spark.stop()

    ceil = hardware_ceiling(low, high)
    r_low = run_level(repo, path, low)
    r_high = run_level(repo, path, high)
    speedup = r_low["wall"] / r_high["wall"]
    efficiency = speedup / (high / low)
    result = {
        **ceil,
        "efficiency_vs_hardware_ceiling": round(
            efficiency / ceil["hardware_efficiency_ceiling"], 3
        ),
        "rows": n_rows,
        "low_cpus": low,
        "high_cpus": high,
        "low_wall_sec": round(r_low["wall"], 2),
        "high_wall_sec": round(r_high["wall"], 2),
        "low_rows_per_sec": round(r_low["rows_per_sec"], 1),
        "high_rows_per_sec": round(r_high["rows_per_sec"], 1),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    # canonical 2v8 pair owns BENCH_SCALING.json; any other pair gets its
    # own file — a 4v16 run previously CLOBBERED the canonical artifact
    fname = (
        "BENCH_SCALING.json"
        if (low, high) == (2, 8)
        else f"BENCH_SCALING_{low}v{high}.json"
    )
    with open(os.path.join(repo, fname), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
