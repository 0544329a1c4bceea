"""ParquetLakeTarget — a minimal lake-table format with the commit semantics
the north rule requires, built from scratch on parquet + atomic manifest swap.

Why it exists: the sandbox ships no Iceberg runtime jar, so `MERGE INTO`
cannot be issued as SQL here. This target implements the same contract —
key-partitioned upsert, snapshot isolation, idempotent batch sequencing,
per-partition LSN high-watermarks, schema evolution, copy-on-write AND
merge-on-read write modes — so the engine's semantics are fully exercised
locally; `IcebergTarget` (targets/iceberg.py) is the drop-in for a real
cluster.

Reference analogue: the Serialize-Jena-Model sink folds all rows into one
model and flushes once at end-of-input (JenaSerializerStep.java:131,243-338);
here "flush once" becomes "one atomic snapshot commit per micro-batch", and
the partition-number-decorated filename (JenaSerializerStep.java:257-264)
becomes hash-bucket layout on conv_id.

Layout (table root):
    data/v{uuid}/_bucket={k}/part-*.parquet       file groups (base or delta)
    _snapshots/v{N}.json                          manifest: per-bucket LAYER
                                                  list (ordered file groups +
                                                  schema id), batch id, lsn
                                                  watermarks, batch metrics
    _snapshots/CURRENT                            atomic pointer (os.replace)

Write modes:
    cow — each merge unions the affected buckets with the batch, re-reduces
          LWW, rewrites those buckets (read-optimal, write-amplified).
    mor — each merge appends a batch-local LWW-reduced DELTA layer to the
          affected buckets (write cost O(batch), independent of table size);
          reads resolve LWW across layers; buckets exceeding
          compact_threshold layers are compacted inline (amortized O(1)
          rewrites per layer). This is the high-throughput CDC path —
          the analogue of Iceberg's merge-on-read MERGE mode.

Correctness under both modes rests on the same invariant: the visible row
set equals LWW over (ts, lsn, op) of everything ever written, with deletes
as tombstones so late updates older than an applied delete lose.

Scale notes: merges touch only affected buckets; the LWW is the agg-based
reduce with map-side partial aggregation; tombstones bound late-data
correctness without unbounded streaming state; MOR bounds write
amplification at high batch rates.
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
from ..operators.lww import lww_reduce, lww_reduce_salted

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
    buckets_compacted: int = 0
    snapshot_version: int = -1
    extra: dict = field(default_factory=dict)


class ParquetLakeTarget:
    # merge_batch is itself an LWW reduction, so the apply pipeline may pass
    # raw (unreduced) events — one shuffle instead of two. The Iceberg path
    # cannot (MERGE forbids multiple source rows per target key).
    handles_raw_events = True

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 16,
        mode: str | None = "cow",
        compact_threshold: int = 8,
    ):
        """mode=None → adopt the mode recorded in the table's manifest at
        create time (falls back to "cow" for a not-yet-created table) —
        re-opening an existing table should never silently flip its write
        mode because the caller forgot to repeat the flag."""
        assert mode in ("cow", "mor", None)
        self.spark = spark
        self.root = root.rstrip("/")
        self.n_buckets = n_buckets
        self.compact_threshold = compact_threshold
        self._snap_dir = os.path.join(self.root, "_snapshots")
        if mode is None:
            mode = self.manifest().get("mode", "cow") if self.exists() else "cow"
        self.mode = mode

    # ---------------------------------------------------------------- meta

    def _current_path(self) -> str:
        return os.path.join(self._snap_dir, "CURRENT")

    def exists(self) -> bool:
        return os.path.exists(self._current_path())

    def manifest(self, version: int | None = None) -> dict:
        """Current manifest, or a historical one (time travel) — every
        commit keeps its v{N}.json until expire_snapshots removes it."""
        if version is None:
            with open(self._current_path()) as f:
                version = int(f.read().strip())
        try:
            with open(os.path.join(self._snap_dir, f"v{version}.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot v{version} does not exist (expired or never "
                f"committed); available: {self.snapshots()}"
            ) from None

    def snapshots(self) -> list[int]:
        """Committed snapshot versions still on disk, oldest first."""
        if not os.path.isdir(self._snap_dir):
            return []
        out = []
        for f in os.listdir(self._snap_dir):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

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
        logical = T.StructType((schema or TRANSCRIPTS_SCHEMA).fields)
        manifest = {
            "version": 0,
            "mode": self.mode,
            "batch_id": -1,
            "current_schema_id": 0,
            "schemas": {"0": logical.jsonValue()},
            "buckets": {},
            "watermarks": {},
            "metrics": {},
        }
        if initial is not None:
            data = initial.withColumn(
                "_lsn", F.lit(-1).cast("long")
            ).withColumn("_deleted", F.lit(False))
            files_by_bucket = self._write_file_group(data)
            manifest["buckets"] = {
                b: {"layers": [{"files": fs, "schema_id": 0}]}
                for b, fs in files_by_bucket.items()
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

    def _internal_schema(self, cur_schema: T.StructType) -> T.StructType:
        return T.StructType(
            cur_schema.fields
            + [
                T.StructField("_lsn", T.LongType()),
                T.StructField("_deleted", T.BooleanType()),
            ]
        )

    def _resolve(self, df: DataFrame) -> DataFrame:
        """LWW-resolve multi-layer rows to the newest version per key."""
        payload = [c for c in df.columns if c not in MERGE_KEYS]
        as_ev = df.select(
            F.when(F.col("_deleted"), F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.col("_lsn").alias("lsn"),
            *MERGE_KEYS,
            *[F.col(c) for c in payload if c not in INTERNAL_COLS],
        )
        red = lww_reduce(as_ev, keys=MERGE_KEYS, order=LWW_ORDER)
        return red.select(
            *MERGE_KEYS,
            *[F.col(c) for c in payload if c not in INTERNAL_COLS],
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "D").alias("_deleted"),
        ).select(*df.columns)

    def read_internal(
        self,
        buckets: list[int] | None = None,
        resolve: bool | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Rows incl. tombstones + internal cols, optionally bucket-pruned.
        resolve=None → auto: LWW-resolve iff any selected bucket has more
        than one layer (merge-on-read). version → time travel to that
        committed snapshot."""
        m = self.manifest(version)
        cur_schema = T.StructType.fromJson(m["schemas"][str(m["current_schema_id"])])
        groups: dict[int, list[str]] = {}
        multi_layer = False
        for b, entry in m["buckets"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            layers = entry["layers"]
            multi_layer = multi_layer or len(layers) > 1
            for layer in layers:
                groups.setdefault(layer["schema_id"], []).extend(layer["files"])
        if not groups:
            return self.spark.createDataFrame(
                [], self._internal_schema(cur_schema)
            )
        parts = []
        for sid, files in groups.items():
            df = self.spark.read.parquet(*files)
            parts.append(self._align(df, cur_schema))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if resolve is None:
            resolve = multi_layer
        return self._resolve(out) if resolve else out

    def read(self, version: int | None = None) -> DataFrame:
        """The logical table: live rows only, internal columns hidden.
        version → time-travel read of that committed snapshot."""
        df = self.read_internal(version=version)
        return df.filter(~F.col("_deleted")).drop(*INTERNAL_COLS)

    def changes_between(
        self, v_from: int, v_to: int, keep_old_payload: bool = False
    ) -> DataFrame:
        """Key-level NET changelog between two committed snapshots — the
        incremental-consumption read (Iceberg changelog-scan analogue): one
        row per key whose visible state differs, with `_change_op` ∈
        I (newly live, incl. re-insert after delete), U (live, newer
        writer), D (was live, now tombstoned). Intermediate flips inside the
        range collapse to the net effect (snapshot diff, not event replay —
        the WAL itself is the event-level log).

        Scale shape: two bucket-pruned snapshot reads, each LWW-resolved to
        one row per key, then ONE full-outer key join; cost is O(keys
        touched by the layers involved), never O(events).

        ``keep_old_payload``: also carry the OLD snapshot's payload values
        as ``__old_<col>`` columns — what the sparse changelog fan-out
        (changelog_as_events sparse_col) diffs against to emit minimal
        cell patches."""
        old_snap = self.read_internal(resolve=True, version=v_from)
        old_extra = (
            [
                F.col(c).alias(f"__old_{c}")
                for c in old_snap.columns
                if c not in (*MERGE_KEYS, *INTERNAL_COLS)
            ]
            if keep_old_payload
            else []
        )
        old = old_snap.select(
            *MERGE_KEYS,
            F.col("_lsn").alias("_lsn_old"),
            F.col("_deleted").alias("_del_old"),
            *old_extra,
        )
        new = self.read_internal(resolve=True, version=v_to)
        j = new.join(old, list(MERGE_KEYS), "full_outer")
        live_new = F.col("_deleted").isNotNull() & ~F.col("_deleted")
        live_old = F.col("_del_old").isNotNull() & ~F.col("_del_old")
        op = (
            F.when(live_new & ~live_old, F.lit("I"))
            .when(~live_new & live_old, F.lit("D"))
            .when(
                live_new & live_old & (F.col("_lsn") != F.col("_lsn_old")),
                F.lit("U"),
            )
        )
        return (
            j.withColumn("_change_op", op)
            .filter(F.col("_change_op").isNotNull())
            .drop("_lsn_old", "_del_old")
        )

    def changelog_as_events(
        self, v_from: int, v_to: int, sparse_col: str | None = None
    ) -> DataFrame:
        """``changes_between`` re-shaped as canonical change events
        (op/lsn/ts + payload) — the changelog fan-OUT read: render with
        sources/envelopes.render_envelope to feed a downstream consumer
        that speaks Debezium/Maxwell/wal2json/Canal/DMS/Mongo, so the
        lake can be the SOURCE of a CDC chain as well as its sink.
        Net-effect semantics are inherited: intermediate flips inside
        the range collapse, so a consumer applying this stream under
        the same (ts, lsn) LWW order converges to this table's v_to
        state.

        ``sparse_col``: also emit a set-columns mask holding ONLY the
        cells whose value changed between the snapshots (U rows; I =
        every cell, D = none) — minimal patches for sparse-capable
        downstream consumers: rendered through the mongo dialect they
        become $set/$unset operations, and a consumer applying them
        through its own cell-level merge converges identically
        (tests/test_changelog_cascade.py). Only the mongo renderer
        consumes the mask — other dialect renderers would treat it as a
        payload column, so the CLI gates --sparse to --emit-dialect
        mongo."""
        cl = self.changes_between(
            v_from, v_to, keep_old_payload=sparse_col is not None
        )
        payload = [
            c
            for c in cl.columns
            if c not in ("_lsn", "_deleted", "_change_op")
            and not c.startswith("__old_")
        ]
        extra = []
        if sparse_col is not None:
            cells = [c for c in payload if c not in (*MERGE_KEYS, "ts")]
            changed = [
                F.when(
                    ~F.col(c).eqNullSafe(F.col(f"__old_{c}")), F.lit(c)
                ).otherwise(F.lit(None).cast("string"))
                for c in cells
            ]
            all_cells = F.array(*[F.lit(c) for c in cells])
            mask = (
                F.when(F.col("_change_op") == "I", all_cells)
                .when(
                    F.col("_change_op") == "D",
                    F.array().cast("array<string>"),
                )
                .otherwise(
                    F.filter(F.array(*changed), lambda x: x.isNotNull())
                )
            )
            extra = [mask.alias(sparse_col)]
        return cl.select(
            F.col("_change_op").alias("op"),
            F.col("_lsn").alias("lsn"),
            *[F.col(c) for c in payload],
            *extra,
        )

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Maintenance: drop manifests older than the newest `keep_last`
        (the CURRENT snapshot is always kept) and delete data files no kept
        manifest references (compaction/COW leave unreferenced file groups
        behind by design — commits never delete, so readers of older
        snapshots are never broken until expiry). Returns removal counts."""
        versions = self.snapshots()
        with open(self._current_path()) as f:
            current = int(f.read().strip())
        keep = set(versions[-keep_last:]) | {current}
        # liveness by REALPATH: manifests store paths as spelled at write
        # time; a different root spelling (relative vs absolute, moved
        # table) must not make live files look unreferenced
        referenced: set[str] = set()
        for v in keep:
            m = self.manifest(v)
            for entry in m.get("buckets", {}).values():
                for layer in entry["layers"]:
                    referenced.update(os.path.realpath(f) for f in layer["files"])
        data_dir = os.path.join(self.root, "data")
        walked = {
            os.path.realpath(os.path.join(dp, f))
            for dp, _dn, fns in os.walk(data_dir)
            for f in fns
            if f.endswith(".parquet")
        }
        if referenced and not (referenced & walked):
            # a moved/renamed table (manifest paths point elsewhere): deleting
            # "unreferenced" files here would destroy every live file
            raise RuntimeError(
                "expire_snapshots: no manifest-referenced file found under "
                f"{data_dir} — table moved or manifests stale; refusing to "
                "delete anything"
            )
        removed_files = 0
        for dirpath, _dirnames, filenames in os.walk(data_dir, topdown=False):
            for fname in filenames:
                p = os.path.join(dirpath, fname)
                if fname.endswith(".parquet") and os.path.realpath(p) not in referenced:
                    os.remove(p)
                    removed_files += 1
                elif fname in ("_SUCCESS",) or fname.endswith(".crc"):
                    os.remove(p)
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
        removed_manifests = 0
        for v in versions:
            if v not in keep:
                os.remove(os.path.join(self._snap_dir, f"v{v}.json"))
                removed_manifests += 1
        return {
            "kept": sorted(keep),
            "removed_manifests": removed_manifests,
            "removed_files": removed_files,
        }

    # ---------------------------------------------------------------- write

    def _write_file_group(self, data: DataFrame) -> dict[str, list[str]]:
        """Write one file group partitioned by bucket → {bucket: [files]}."""
        out_dir = os.path.join(self.root, f"data/v{uuid.uuid4().hex[:12]}")
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
        return files_by_bucket

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
        transform_reduced=None,
        partial_set_col: str | None = None,
    ) -> MergeResult:
        """Apply one micro-batch of change events (raw or pre-reduced).

        Idempotent: replaying an already-committed batch_id OF THE SAME STREAM
        LINEAGE is a no-op. Spark's foreachBatch batch ids are monotone only
        per checkpoint; a new lineage (lost checkpoint) restarts at 0, so the
        gate is scoped by stream_id — a new lineage re-applies its batches and
        the (ts, lsn) LWW guard makes that replay convergent, not corrupting.

        ``partial_set_col``: the batch's events carry PARTIAL row images —
        the named array column lists the payload columns each event wrote
        (operators/lww.py lww_reduce_partial's contract). The merge then
        coalesces cells against the current table state: existing rows enter
        the reduce as full-image writes at their committed (ts, lsn), so a
        sparse update inherits every untouched cell. Consequences, by design:
        - there is no no-read fast path — partial images NEED the old row,
          so the affected buckets are always read. COW tables rewrite them;
          MOR tables append a delta layer holding ONLY the touched keys'
          resolved rows (untouched keys stay in their existing layers, and
          the layer stack compacts past compact_threshold as usual);
        - cell resolution is exact within a batch; ACROSS batches a late
          cell write resolves against the row's committed version at ROW
          granularity (the lake stores row versions, not per-cell versions —
          the Cassandra alternative would double storage), and such events
          are flagged in late_events;
        - ``salted`` composes: the cell reduce's two-phase form pre-reduces
          per (keys, salt) with the same per-cell struct maxes (associative),
          so hot-conversation skew is defused without losing cell orders.
        """
        m = self.manifest()
        if stream_id == m.get("stream_id") and batch_id <= m["batch_id"]:
            return MergeResult(batch_id=batch_id, applied=False,
                               snapshot_version=m["version"])

        cur_schema = T.StructType.fromJson(m["schemas"][str(m["current_schema_id"])])
        payload_cols = [f.name for f in cur_schema.fields if f.name not in MERGE_KEYS]

        wm = {k: int(v) for k, v in m.get("watermarks", {}).items()}
        if self.mode == "mor" and partial_set_col is None:
            # single-Spark-job fast path: metrics ride the write via observe,
            # per-bucket watermarks come from parquet footers
            return self._merge_mor(
                reduced, batch_id, stream_id, salted, salt_buckets,
                m, cur_schema, payload_cols, wm, transform_reduced,
            )
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
                    F.col("lsn")
                    <= F.coalesce(wm_map[F.col("_b")], F.lit(-(2**62))),
                    1,
                ).otherwise(0)
            ).alias("n_late")
        else:
            late_col = F.sum(F.lit(0)).alias("n_late")
        stats = batch.groupBy("_b").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("lsn").alias("max_lsn"),
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
        events_in = int(sum(r["n"] for r in stats))

        cell_cols = [c for c in payload_cols if c != "ts"]

        def reduce_events(ev: DataFrame) -> DataFrame:
            if partial_set_col is not None:
                from ..operators.lww import lww_reduce_partial

                return lww_reduce_partial(
                    ev, keys=MERGE_KEYS, order=LWW_ORDER,
                    set_col=partial_set_col, payload=cell_cols,
                    salt_buckets=salt_buckets if salted else None,
                )
            return (
                lww_reduce_salted(
                    ev, keys=MERGE_KEYS, order=LWW_ORDER, salt_buckets=salt_buckets
                )
                if salted
                else lww_reduce(ev, keys=MERGE_KEYS, order=LWW_ORDER)
            )

        ev_cols = ["op", "lsn", "ts", *MERGE_KEYS, *cell_cols]
        if partial_set_col is not None:
            ev_cols.append(partial_set_col)
        batch_events = batch.drop("_b").select(*ev_cols)

        n_compacted = 0
        # partial + MOR table: append a delta layer of ONLY the touched
        # keys' resolved rows instead of rewriting whole buckets — the
        # read-side whole-row resolution (_resolve) layers them correctly
        # because a resolved row's (ts, _lsn) is >= every older version's
        # (a batch of purely-stale events resolves to a byte-identical
        # copy of the committed row, so even that tie is harmless)
        partial_layering = partial_set_col is not None and self.mode == "mor"
        # union current bucket contents (tombstones incl.) with the batch
        target = self.read_internal(buckets=affected, resolve=False)
        as_events = target.select(
            F.when(F.col("_deleted"), F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("_lsn").alias("lsn"),
            F.col("ts"),
            *MERGE_KEYS,
            *[F.col(c) for c in cell_cols],
        )
        if partial_layering:
            # the delta layer only needs the batch's keys; untouched keys
            # stay in their existing layers untouched
            as_events = as_events.join(
                batch_events.select(*MERGE_KEYS).distinct(),
                list(MERGE_KEYS),
                "left_semi",
            )
        if partial_set_col is not None:
            # committed rows are RESOLVED states: they enter the cell
            # reduce as full-image writes at their committed (ts, lsn)
            # (tombstones' set list is never consulted for op='D')
            as_events = as_events.withColumn(
                partial_set_col, F.array(*[F.lit(c) for c in cell_cols])
            )
        merged = reduce_events(as_events.unionByName(batch_events))
        if transform_reduced is not None:
            # post-reduce payload transform (e.g. normalization): runs on one
            # row per key instead of per event; must be idempotent — existing
            # table rows pass through it again on COW rewrites
            merged = transform_reduced(merged)

        data = merged.select(
            *[F.col(f.name) for f in cur_schema.fields],
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "D").alias("_deleted"),
        )
        files_by_bucket = self._write_file_group(data)

        n_deleted = int(sum(r["n_del"] for r in stats))
        late = int(sum(r["n_late"] for r in stats))
        n_keys = int(sum(r["n_keys"] for r in stats))
        for r in stats:
            b = str(int(r["_b"]))
            wm[b] = max(wm.get(b, -1), int(r["max_lsn"]))
        batch.unpersist()

        new_buckets = {b: dict(e) for b, e in m["buckets"].items()}
        for b, files in files_by_bucket.items():
            layer = {"files": files, "schema_id": m["current_schema_id"]}
            if partial_layering and b in new_buckets:
                new_buckets[b]["layers"] = new_buckets[b]["layers"] + [layer]
            else:
                new_buckets[b] = {"layers": [layer]}
        if partial_layering:
            over = [
                int(b)
                for b, e in new_buckets.items()
                if len(e["layers"]) > self.compact_threshold
            ]
            if over:
                new_buckets.update(
                    self._compact_layers(new_buckets, over, cur_schema)
                )
                n_compacted = len(over)

        res = MergeResult(
            batch_id=batch_id,
            applied=True,
            events_in=events_in,
            # with raw (unreduced) input these are touched-keys / delete-event
            # counts; with pre-reduced input they are exact per-key counts
            keys_upserted=n_keys - n_deleted if events_in == n_keys else n_keys,
            keys_deleted=n_deleted,
            late_events=late,
            buckets_rewritten=len(affected),
            buckets_compacted=n_compacted,
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
            "buckets_compacted": res.buckets_compacted,
        }
        res.snapshot_version = self._commit(m)
        return res

    def _merge_mor(
        self,
        reduced: DataFrame,
        batch_id: int,
        stream_id: str,
        salted: bool,
        salt_buckets: int,
        m: dict,
        cur_schema: T.StructType,
        payload_cols: list[str],
        wm: dict[str, int],
        transform_reduced=None,
    ) -> MergeResult:
        """Merge-on-read fast path: ONE Spark job per batch.

        - the delta write is the only action; batch metrics (event count,
          delete events, late events) ride it via DataFrame.observe
        - per-bucket LSN watermarks and touched-key counts come from the
          written delta files' parquet footers (driver-side, no scan)
        - no target read at all: reads resolve LWW across delta layers;
          buckets past compact_threshold layers are compacted inline
        """
        from pyspark.sql import Observation

        import pyarrow.parquet as pq

        batch = reduced.withColumn("_b", self._bucket_col())
        if wm:
            wm_map = F.create_map(
                *[F.lit(x) for b, l in wm.items() for x in (int(b), l)]
            )
            late_expr = F.sum(
                F.when(
                    F.col("lsn")
                    <= F.coalesce(wm_map[F.col("_b")], F.lit(-(2**62))),
                    1,
                ).otherwise(0)
            ).alias("n_late")
        else:
            late_expr = F.max(F.lit(0)).alias("n_late")
        obs = Observation(f"cdc-batch-{batch_id}")
        observed = batch.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_del"),
            late_expr,
        )
        ev_cols = ["op", "lsn", "ts", *MERGE_KEYS] + [
            c for c in payload_cols if c != "ts"
        ]
        batch_events = observed.drop("_b").select(*ev_cols)
        merged = (
            lww_reduce_salted(
                batch_events, keys=MERGE_KEYS, order=LWW_ORDER,
                salt_buckets=salt_buckets,
            )
            if salted
            else lww_reduce(batch_events, keys=MERGE_KEYS, order=LWW_ORDER)
        )
        if transform_reduced is not None:
            # normalize AFTER the reduce: the Python/Arrow stage then sees one
            # row per key, not per event (~10x less at update-heavy batches).
            # Ordering is safe — LWW winner selection uses (ts, lsn, op), not
            # the payload, and the transform is idempotent.
            merged = transform_reduced(merged)
        data = merged.select(
            *[F.col(f.name) for f in cur_schema.fields],
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "D").alias("_deleted"),
        )
        files_by_bucket = self._write_file_group(data)  # the one action
        stats = obs.get
        events_in = int(stats["n"] or 0)

        if events_in == 0:
            m["version"] += 1
            m["batch_id"] = batch_id
            m["stream_id"] = stream_id
            self._commit(m)
            return MergeResult(batch_id=batch_id, applied=True,
                               snapshot_version=m["version"])

        # per-bucket watermark (max _lsn) + touched keys from parquet footers
        # (footers read concurrently — this loop is driver-side serial cost
        # that otherwise caps scaling efficiency at high parallelism)
        from concurrent.futures import ThreadPoolExecutor

        def _footer(fpath: str) -> tuple[int, int]:
            md = pq.ParquetFile(fpath).metadata
            col_idx = next(
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == "_lsn"
            )
            mx = -1
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                if st is not None and st.max is not None:
                    mx = max(mx, int(st.max))
            return md.num_rows, mx

        all_files = [
            (b, f) for b, files in files_by_bucket.items() for f in files
        ]
        with ThreadPoolExecutor(max_workers=16) as pool:
            footers = list(pool.map(lambda bf: _footer(bf[1]), all_files))
        n_keys = sum(nr for nr, _ in footers)
        for (b, _), (_, mx) in zip(all_files, footers):
            wm[b] = max(wm.get(b, -1), mx)

        new_buckets = {b: dict(e) for b, e in m["buckets"].items()}
        for b, files in files_by_bucket.items():
            layer = {"files": files, "schema_id": m["current_schema_id"]}
            if b not in new_buckets:
                new_buckets[b] = {"layers": [layer]}
            else:
                new_buckets[b]["layers"] = new_buckets[b]["layers"] + [layer]

        over = [
            int(b)
            for b, e in new_buckets.items()
            if len(e["layers"]) > self.compact_threshold
        ]
        if over:
            new_buckets.update(
                self._compact_layers(new_buckets, over, cur_schema)
            )

        n_del = int(stats["n_del"] or 0)
        res = MergeResult(
            batch_id=batch_id,
            applied=True,
            events_in=events_in,
            keys_upserted=n_keys - n_del if events_in == n_keys else n_keys,
            keys_deleted=n_del,
            late_events=int(stats["n_late"] or 0),
            buckets_rewritten=len(files_by_bucket),
            buckets_compacted=len(over),
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
            "buckets_compacted": res.buckets_compacted,
        }
        res.snapshot_version = self._commit(m)
        return res

    def _compact_layers(
        self,
        buckets: dict,
        which: list[int],
        cur_schema: T.StructType,
    ) -> dict:
        """Rewrite the given buckets' layer stacks into single LWW-resolved
        base layers (tombstones retained for late-event correctness)."""
        groups: dict[int, list[str]] = {}
        for b in which:
            for layer in buckets[str(b)]["layers"]:
                groups.setdefault(layer["schema_id"], []).extend(layer["files"])
        parts = []
        for sid, files in groups.items():
            parts.append(self._align(self.spark.read.parquet(*files), cur_schema))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        resolved = self._resolve(df)
        files_by_bucket = self._write_file_group(resolved)
        cur_sid = int(self.manifest()["current_schema_id"])
        return {
            sb: {"layers": [{"files": files_by_bucket[sb], "schema_id": cur_sid}]}
            for sb in files_by_bucket
        }

    def compact(self, buckets: list[int] | None = None) -> int:
        """Explicit compaction API (maintenance job): resolve layer stacks.
        Returns number of buckets compacted."""
        m = self.manifest()
        cur_schema = T.StructType.fromJson(m["schemas"][str(m["current_schema_id"])])
        which = [
            int(b)
            for b, e in m["buckets"].items()
            if (buckets is None or int(b) in buckets) and len(e["layers"]) > 1
        ]
        if not which:
            return 0
        new_entries = self._compact_layers(m["buckets"], which, cur_schema)
        m["buckets"].update(new_entries)
        m["version"] += 1
        self._commit(m)
        return len(which)

    # ------------------------------------------------------------- cleanup

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
