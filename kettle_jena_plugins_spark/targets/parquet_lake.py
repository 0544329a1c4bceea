"""ParquetLakeTarget — a minimal lake-table format with the commit semantics
the north rule requires, built from scratch on parquet + atomic manifest swap.

Why it exists: the sandbox ships no Iceberg runtime jar, so `MERGE INTO`
cannot be issued as SQL here. This target implements the same contract —
key-partitioned upsert, snapshot isolation, idempotent batch sequencing,
per-partition LSN high-watermarks, schema evolution — so the engine's
semantics are fully exercised locally; `IcebergTarget` (targets/iceberg.py)
is the drop-in for a real cluster.

Reference analogue: the Serialize-Jena-Model sink folds all rows into one
model and flushes once at end-of-input (JenaSerializerStep.java:131,243-338);
here "flush once" becomes "one atomic snapshot commit per micro-batch", and
the partition-number-decorated filename (JenaSerializerStep.java:257-264)
becomes hash-bucket layout on conv_id.

Layout (table root):
    data/v{N}-{uuid}/_bucket={k}/part-*.parquet   copy-on-write file groups
    _snapshots/v{N}.json                          manifest (files per bucket,
                                                  schema catalog, batch id,
                                                  per-bucket lsn watermarks,
                                                  batch metrics)
    _snapshots/CURRENT                            atomic pointer (os.replace)

Merge algorithm (per micro-batch, copy-on-write, bucket-pruned):
    1. idempotence gate: batch_id <= committed batch id → no-op replay skip
    2. bucket the reduced batch on pmod(xxhash64(conv_id), n_buckets)
    3. read ONLY the affected buckets' current files (partition pruning)
    4. union target rows (as op U / D-tombstones) with batch events and
       re-run the LWW reduce — out-of-order and duplicate deliveries lose
       to the stored (ts, lsn) pair; deletes win as tombstones so a late
       update older than an applied delete cannot resurrect a row
    5. write new file groups for affected buckets, carry over the rest,
       write manifest v{N+1}, atomically swap CURRENT

Scale notes: step 3/5 touch only affected buckets (at 100 TB with
n_buckets sized so a bucket ≈ a few GB, a micro-batch rewrites only the hot
subset); step 4 is the same agg-based LWW with map-side partial aggregation;
tombstones bound late-data correctness without unbounded streaming state.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import LWW_ORDER, MERGE_KEYS, TRANSCRIPTS_SCHEMA
from ..operators.lww import lww_reduce

INTERNAL_COLS = ("_lsn", "_deleted")


@dataclass
class MergeResult:
    batch_id: int
    applied: bool  # False = idempotent replay skip
    events_in: int = 0
    keys_upserted: int = 0
    keys_deleted: int = 0
    late_events: int = 0
    buckets_rewritten: int = 0
    snapshot_version: int = -1
    extra: dict = field(default_factory=dict)


class ParquetLakeTarget:
    # merge_batch is itself an LWW reduction, so the apply pipeline may pass
    # raw (unreduced) events — one shuffle instead of two. The Iceberg path
    # cannot (MERGE forbids multiple source rows per target key).
    handles_raw_events = True

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        self.spark = spark
        self.root = root.rstrip("/")
        self.n_buckets = n_buckets
        self._snap_dir = os.path.join(self.root, "_snapshots")

    # ---------------------------------------------------------------- meta

    def _current_path(self) -> str:
        return os.path.join(self._snap_dir, "CURRENT")

    def exists(self) -> bool:
        return os.path.exists(self._current_path())

    def manifest(self) -> dict:
        with open(self._current_path()) as f:
            version = int(f.read().strip())
        with open(os.path.join(self._snap_dir, f"v{version}.json")) as f:
            return json.load(f)

    def last_committed_batch(self) -> int:
        return self.manifest()["batch_id"] if self.exists() else -1

    def watermarks(self) -> dict[str, int]:
        """Per-bucket high-watermark LSN (the 'cdc.watermark.lsn.<partition>'
        snapshot property from FIXTURES.md §1)."""
        return {k: int(v) for k, v in self.manifest().get("watermarks", {}).items()}

    def schema(self) -> T.StructType:
        m = self.manifest()
        return T.StructType.fromJson(m["schemas"][str(m["current_schema_id"])])

    def _commit(self, manifest: dict) -> int:
        os.makedirs(self._snap_dir, exist_ok=True)
        version = manifest["version"]
        path = os.path.join(self._snap_dir, f"v{version}.json")
        with open(path, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        tmp = self._current_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._current_path())  # atomic snapshot swap
        return version

    # ---------------------------------------------------------------- init

    def create(
        self,
        initial: DataFrame | None = None,
        schema: T.StructType | None = None,
    ) -> None:
        """Create the table (optionally seeded with an initial transcripts
        DataFrame; its rows get _lsn=-1 so any real event wins LWW)."""
        if self.exists():
            raise ValueError(f"target already exists at {self.root}")
        logical = T.StructType(
            (schema or TRANSCRIPTS_SCHEMA).fields
        )
        manifest = {
            "version": 0,
            "batch_id": -1,
            "current_schema_id": 0,
            "schemas": {"0": logical.jsonValue()},
            "buckets": {},
            "watermarks": {},
            "metrics": {},
        }
        if initial is not None:
            data = (
                initial.withColumn("_lsn", F.lit(-1).cast("long"))
                .withColumn("_deleted", F.lit(False))
            )
            commit_rel, files_by_bucket = self._write_file_group(data)
            manifest["buckets"] = {
                b: {"files": fs, "schema_id": 0} for b, fs in files_by_bucket.items()
            }
        self._commit(manifest)

    # ---------------------------------------------------------------- read

    def _bucket_col(self, col: str = "conv_id") -> F.Column:
        return F.pmod(F.xxhash64(F.col(col)), F.lit(self.n_buckets)).cast("int")

    def _align(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Project/cast a file-group DataFrame to the current schema: missing
        columns → null, narrower types → cast (the schema-evolution read
        path; the reference analogue is ActionIfNoSuchField=IGNORE)."""
        cols = []
        have = {f.name: f for f in df.schema.fields}
        for f_ in schema.fields:
            if f_.name in have:
                cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
            else:
                cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        for ic in INTERNAL_COLS:
            cols.append(F.col(ic))
        return df.select(*cols)

    def read_internal(self, buckets: list[int] | None = None) -> DataFrame:
        """Current rows incl. tombstones + internal cols, optionally bucket-pruned."""
        m = self.manifest()
        cur_schema = T.StructType.fromJson(m["schemas"][str(m["current_schema_id"])])
        groups: dict[int, list[str]] = {}
        for b, entry in m["buckets"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            groups.setdefault(entry["schema_id"], []).extend(entry["files"])
        full = T.StructType(
            cur_schema.fields
            + [
                T.StructField("_lsn", T.LongType()),
                T.StructField("_deleted", T.BooleanType()),
            ]
        )
        if not groups:
            return self.spark.createDataFrame([], full)
        parts = []
        for sid, files in groups.items():
            df = self.spark.read.parquet(*files)
            parts.append(self._align(df, cur_schema))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self) -> DataFrame:
        """The logical table: live rows only, internal columns hidden."""
        df = self.read_internal()
        return df.filter(~F.col("_deleted")).drop(*INTERNAL_COLS)

    # ---------------------------------------------------------------- write

    def _write_file_group(
        self, data: DataFrame
    ) -> tuple[str, dict[str, list[str]]]:
        """Write one copy-on-write file group partitioned by bucket; returns
        (relative commit dir, {bucket: [absolute files]})."""
        rel = f"data/v{uuid.uuid4().hex[:12]}"
        out_dir = os.path.join(self.root, rel)
        (
            data.withColumn("_bucket", self._bucket_col())
            .repartition(F.col("_bucket"))
            .sortWithinPartitions(*MERGE_KEYS)
            .write.partitionBy("_bucket")
            .parquet(out_dir)
        )
        files_by_bucket: dict[str, list[str]] = {}
        for entry in sorted(os.listdir(out_dir)):
            if not entry.startswith("_bucket="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(out_dir, entry)
            files = [
                os.path.join(bdir, f)
                for f in sorted(os.listdir(bdir))
                if f.endswith(".parquet")
            ]
            if files:
                files_by_bucket[b] = files
        return rel, files_by_bucket

    # ---------------------------------------------------------------- DDL

    def evolve_schema(self, new_schema: T.StructType) -> bool:
        """ALTER TABLE analogue: register a new current schema (added nullable
        columns / widened types). Old file groups are aligned lazily on read.
        Returns True if a new schema version was committed."""
        m = self.manifest()
        cur = T.StructType.fromJson(m["schemas"][str(m["current_schema_id"])])
        if cur.jsonValue() == new_schema.jsonValue():
            return False
        sid = max(int(k) for k in m["schemas"]) + 1
        m["schemas"][str(sid)] = new_schema.jsonValue()
        m["current_schema_id"] = sid
        m["version"] += 1
        self._commit(m)
        return True

    # ---------------------------------------------------------------- merge

    def merge_batch(
        self,
        reduced: DataFrame,
        batch_id: int,
        stream_id: str = "default",
        salted: bool = False,
        salt_buckets: int = 16,
    ) -> MergeResult:
        """Apply one LWW-reduced micro-batch (one row per (conv_id, turn_idx),
        columns = change-event envelope op/lsn/ts + current payload columns).

        Idempotent: replaying an already-committed batch_id OF THE SAME STREAM
        LINEAGE is a no-op. Spark's foreachBatch batch ids are monotone only
        per checkpoint; a new lineage (lost checkpoint) restarts at 0, so the
        gate is scoped by stream_id — a new lineage re-applies its batches and
        the (ts, lsn) LWW guard makes that replay convergent, not corrupting.
        """
        m = self.manifest()
        if stream_id == m.get("stream_id") and batch_id <= m["batch_id"]:
            return MergeResult(batch_id=batch_id, applied=False,
                               snapshot_version=m["version"])

        cur_schema = T.StructType.fromJson(m["schemas"][str(m["current_schema_id"])])
        payload_cols = [
            f.name for f in cur_schema.fields if f.name not in MERGE_KEYS
        ]

        wm = {k: int(v) for k, v in m.get("watermarks", {}).items()}
        batch = reduced.withColumn("_b", self._bucket_col()).cache()
        # late events = lsn at-or-below the bucket's committed high-watermark
        # (duplicate/out-of-order replays); computed in the same single agg
        # via a literal map — no per-bucket jobs.
        if wm:
            wm_map = F.create_map(
                *[F.lit(x) for b, l in wm.items() for x in (int(b), l)]
            )
            late_col = F.sum(
                F.when(
                    F.col("lsn") <= F.coalesce(
                        wm_map[F.col("_b")], F.lit(-(2**62))
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_late")
        else:
            late_col = F.sum(F.lit(0)).alias("n_late")
        stats = batch.groupBy("_b").agg(
            F.count(F.lit(1)).alias("n"), F.max("lsn").alias("max_lsn"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_del"),
            F.count_distinct(*[F.col(k) for k in MERGE_KEYS]).alias("n_keys"),
            late_col,
        ).collect()
        if not stats:
            batch.unpersist()
            m["version"] += 1
            m["batch_id"] = batch_id
            m["stream_id"] = stream_id
            self._commit(m)
            return MergeResult(batch_id=batch_id, applied=True,
                               snapshot_version=m["version"])

        affected = sorted(int(r["_b"]) for r in stats)
        events_in = sum(r["n"] for r in stats)

        # union current bucket contents (tombstones included) with the batch
        target = self.read_internal(buckets=affected)
        as_events = target.select(
            F.when(F.col("_deleted"), F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.col("_lsn").alias("lsn"),
            F.col("ts"),
            *MERGE_KEYS,
            *[F.col(c) for c in payload_cols if c != "ts"],
        )
        batch_events = batch.drop("_b").select(*as_events.columns)
        unioned = as_events.unionByName(batch_events)
        if salted:
            from ..operators.lww import lww_reduce_salted

            merged = lww_reduce_salted(
                unioned, keys=MERGE_KEYS, order=LWW_ORDER, salt_buckets=salt_buckets
            )
        else:
            merged = lww_reduce(unioned, keys=MERGE_KEYS, order=LWW_ORDER)
        data = merged.select(
            *MERGE_KEYS,
            *[F.col(c) for c in payload_cols if c != "ts"],
            F.col("ts"),
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "D").alias("_deleted"),
        )
        # project to current schema column order + internals
        data = data.select(
            *[F.col(f.name) for f in cur_schema.fields], "_lsn", "_deleted"
        )

        _, files_by_bucket = self._write_file_group(data)

        n_deleted = int(sum(r["n_del"] for r in stats))
        late = int(sum(r["n_late"] for r in stats))
        for r in stats:
            b = str(int(r["_b"]))
            wm[b] = max(wm.get(b, -1), int(r["max_lsn"]))
        batch.unpersist()

        new_buckets = dict(m["buckets"])
        for b, files in files_by_bucket.items():
            new_buckets[b] = {"files": files, "schema_id": m["current_schema_id"]}
        # an affected bucket can end up empty (everything tombstoned is still
        # written as tombstones, so files always exist); defensive anyway:
        for b in affected:
            if str(b) not in files_by_bucket and str(b) in new_buckets:
                new_buckets.pop(str(b))

        res = MergeResult(
            batch_id=batch_id,
            applied=True,
            events_in=events_in,
            # with raw (unreduced) input these are touched-keys / delete-event
            # counts; with pre-reduced input they are exact per-key counts
            keys_upserted=int(sum(r["n_keys"] for r in stats)) - n_deleted
            if events_in == sum(r["n_keys"] for r in stats)
            else int(sum(r["n_keys"] for r in stats)),
            keys_deleted=n_deleted,
            late_events=late,
            buckets_rewritten=len(affected),
        )
        m["version"] += 1
        m["batch_id"] = batch_id
        m["stream_id"] = stream_id
        m["buckets"] = new_buckets
        m["watermarks"] = wm
        m["metrics"] = {
            "events_in": res.events_in,
            "keys_upserted": res.keys_upserted,
            "keys_deleted": res.keys_deleted,
            "late_events": res.late_events,
            "buckets_rewritten": res.buckets_rewritten,
        }
        res.snapshot_version = self._commit(m)
        return res

    # ------------------------------------------------------------- cleanup

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
