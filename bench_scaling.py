"""Two-cluster-size scaling evidence (north rule: ≥0.8 throughput scaling
efficiency from N to 4N executors).

Sandbox protocol (BASELINE.md): the identical job — same deterministic
generated WAL, same micro-batch boundaries, same configs except parallelism —
runs at local[8] (N) and local[32] (4N); we report events/sec at both and
efficiency = (throughput_4N / throughput_N) / 4.

Run:  python bench_scaling.py [--n-events 8000000] [--batches 4]
Appends a row to BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

WORKER = """
import json, sys, time, tempfile, shutil
from pyspark.sql import functions as F
cores = int(sys.argv[1]); n = int(sys.argv[2]); nb = int(sys.argv[3])
wal = sys.argv[4]
from kettle_jena_plugins_spark.session import get_spark
from kettle_jena_plugins_spark.streaming.apply import CDCConfig, apply_batch
from kettle_jena_plugins_spark.targets.parquet_lake import ParquetLakeTarget
spark = get_spark(app_name=f"scale-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=2 * cores)
raw = spark.read.parquet(wal)
d = tempfile.mkdtemp(prefix=f"scale{cores}-")
tgt = ParquetLakeTarget(spark, f"{d}/tbl", n_buckets=32, mode="mor")
tgt.create()
bounds = [int(n * i / nb) for i in range(nb + 1)]
cfg = CDCConfig(salted=False, normalize=True)
t0 = time.time()
for i in range(nb):
    apply_batch(tgt, raw.filter((F.col("lsn") >= bounds[i]) & (F.col("lsn") < bounds[i+1])), i, cfg)
wall = time.time() - t0
rows = tgt.read().count()
shutil.rmtree(d, ignore_errors=True)
print(json.dumps({"cores": cores, "wall_sec": round(wall, 2),
                  "events_per_sec": round(n * 1.05 / wall), "rows": rows}))
"""


def run_at(cores: int, n: int, nb: int, wal: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(n), str(nb), wal],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-events", type=int, default=8_000_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--n", type=int, default=8, help="small parallelism (N)")
    ap.add_argument("--x4", type=int, default=32, help="large parallelism (4N)")
    args = ap.parse_args()

    # generate the shared deterministic WAL once (content is independent of
    # the generating parallelism — datagen is a pure function of row id)
    wal_dir = tempfile.mkdtemp(prefix="scalewal-")
    gen = subprocess.run(
        [
            sys.executable, "-m", "kettle_jena_plugins_spark.run",
            "gen-wal", "--out", f"{wal_dir}/wal",
            "--n-events", str(args.n_events), "--segments", str(args.batches * 2),
            "--hot-frac", "0.2", "--dup-frac", "0.05",
        ],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    assert gen.returncode == 0, gen.stderr[-2000:]

    small = run_at(args.n, args.n_events, args.batches, f"{wal_dir}/wal")
    large = run_at(args.x4, args.n_events, args.batches, f"{wal_dir}/wal")
    assert small["rows"] == large["rows"], "nondeterministic state!"
    eff = (large["events_per_sec"] / small["events_per_sec"]) / (
        args.x4 / args.n
    )
    result = {
        "metric": "cdc_apply_scaling_efficiency",
        "n_events": args.n_events,
        "batches": args.batches,
        f"local[{args.n}]": small,
        f"local[{args.x4}]": large,
        "scaling_efficiency": round(eff, 3),
        "rows_identical": True,
    }
    print(json.dumps(result))
    import shutil

    shutil.rmtree(wal_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
