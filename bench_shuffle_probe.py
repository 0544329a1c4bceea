"""Pure-JVM shuffle-ceiling probe for the scaling measurement (BENCH.md).

Isolates Spark's own single-JVM shuffle machinery from everything
engine-specific: `range → groupBy(key).agg(max(struct))` — the exact plan
shape of the LWW reduce, zero Python, zero I/O — at two parallelism levels
and a matrix of shuffle configs (compression on/off, shuffle partition
counts). If THIS doesn't scale on the box, no same-plan engine code can;
the probe quantifies the hardware/JVM ceiling the efficiency number sits
under, and which config moves it.

Run: python bench_shuffle_probe.py [--rows 64000000] [--n 4] [--x4 16]
Prints one JSON line per (cores, config) cell, then a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = """
import json, sys, time, os
cores = int(sys.argv[1]); rows = int(sys.argv[2])
parts = int(sys.argv[3]); compress = sys.argv[4] == "1"
from kettle_jena_plugins_spark.session import get_spark
from pyspark.sql import functions as F
os.makedirs("/dev/shm/sparktmp", exist_ok=True)
spark = get_spark(app_name=f"probe-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=parts,
                  extra_conf={
                      "spark.local.dir": "/dev/shm/sparktmp",
                      "spark.shuffle.compress": str(compress).lower(),
                      "spark.shuffle.spill.compress": str(compress).lower(),
                  })
df = (spark.range(0, rows, numPartitions=2 * cores)
      .select((F.col("id") % 500000).alias("k"),
              F.col("id").alias("lsn"),
              (F.col("id") % 97).cast("double").alias("ts")))
agg = df.groupBy("k").agg(F.max(F.struct("ts", "lsn")).alias("w"))
# consume the aggregate value so Catalyst cannot prune max(struct) away
# (a bare count() reduces the probe to distinct-key counting)
t0 = time.time()
row = agg.select(F.count(F.lit(1)).alias("n"), F.sum("w.lsn")).first()
n = row["n"]; wall = time.time() - t0
print(json.dumps({"cores": cores, "parts": parts, "compress": compress,
                  "wall_sec": round(wall, 2), "groups": n,
                  "rows_per_sec": round(rows / wall)}))
"""


def cell(cores: int, rows: int, parts: int, compress: bool, repeats: int) -> dict:
    best = None
    for _ in range(repeats):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(cores), str(rows), str(parts),
             "1" if compress else "0"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        assert lines, out.stderr[-1500:]
        r = json.loads(lines[-1])
        if best is None or r["wall_sec"] < best["wall_sec"]:
            best = r
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64_000_000)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--x4", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    results = []
    # configs: (shuffle partitions per core level, compression)
    for compress in (True, False):
        for parts_mode in ("2x", "fixed32"):
            row = {}
            for cores in (args.n, args.x4):
                parts = 2 * cores if parts_mode == "2x" else 32
                r = cell(cores, args.rows, parts, compress, args.repeats)
                print(json.dumps(r), flush=True)
                row[cores] = r
            eff = (
                row[args.x4]["rows_per_sec"] / row[args.n]["rows_per_sec"]
            ) / (args.x4 / args.n)
            results.append(
                {
                    "compress": compress,
                    "parts_mode": parts_mode,
                    "eff": round(eff, 3),
                    f"wall[{args.n}]": row[args.n]["wall_sec"],
                    f"wall[{args.x4}]": row[args.x4]["wall_sec"],
                }
            )
    print(json.dumps({"metric": "shuffle_probe_matrix", "cells": results}))


if __name__ == "__main__":
    main()
