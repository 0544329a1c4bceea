"""The CDC apply pipeline: validate → normalize → evolve → LWW-reduce → MERGE.

Batch core (`apply_batch`) + Structured Streaming wrapper (`run_stream`,
readStream → foreachBatch → checkpoint). This is the engine's equivalent of
the reference's whole .ktr pipeline (inject → create model → group-merge →
serialize, EndToEndIT.java:60-92), re-expressed as one micro-batch function.

Exactly-once: Structured Streaming checkpoints source offsets; the target's
batch-id gate makes the sink idempotent, so replay of a failed/killed batch
converges to byte-identical state (tests/test_stream_resume.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..functions.textnorm import normalize_text
from ..model import CHANGE_EVENT_SCHEMA, MERGE_KEYS
from ..operators.lww import lww_reduce, lww_reduce_salted
from ..operators.validate import ValidationSpec, validate_split
from ..plans.evolution import ENVELOPE_COLS, evolved_schema


@dataclass
class CDCConfig:
    salted: bool = False
    salt_buckets: int = 16
    normalize: bool = True
    # ingest-time PII-style scrubbing (operators/text.py:redact_text):
    # applied with normalize, POST-reduce on LWW winners only — chained
    # JVM-side regexp_replace, so the per-event path stays Python-free and
    # redaction cost scales with FINAL rows, not delivered events
    redact: bool = False
    dead_letter_dir: str | None = None
    metrics_path: str | None = None  # jsonl, one line per batch
    validation: ValidationSpec = field(default_factory=ValidationSpec)
    evolve: bool = True
    # pre-reduce the batch to one row per key before the sink. None = auto:
    # skipped for targets whose merge is itself an LWW reduction
    # (ParquetLakeTarget.handles_raw_events) — one shuffle instead of two;
    # forced for Iceberg MERGE (cardinality rule).
    pre_reduce: bool | None = None
    # extra pass counting raw late events pre-reduction (only meaningful when
    # pre_reduce is on; the raw path's sink already counts raw lates)
    count_late_raw: bool = False
    # streaming-only: drop redelivered WAL entries (same lsn) across
    # micro-batches before foreachBatch, with state bounded by the event-time
    # watermark (streaming/dedup.py). A cost optimization — the sink's
    # idempotent LWW merge already converges under duplicates.
    stream_dedup: bool = False
    stream_dedup_watermark: str = "10 minutes"
    # ActionIfNull=WARN accounting for payload columns: nulls in these
    # columns are counted per batch (one tiny agg pass) and surfaced in the
    # metrics jsonl + MergeResult.extra — the engine's analogue of the
    # reference's per-row WARN log (ActionIfNull.java:25-28). Default off:
    # costs one extra scan of the batch.
    warn_null_cols: tuple[str, ...] = ()
    # the batch's events carry PARTIAL row images: the named array column
    # lists the payload columns each event wrote (wal2json column arrays,
    # Mongo $set patches). Routes the sink through its cell-level merge
    # (ParquetLakeTarget.merge_batch partial_set_col) — requires a sink
    # that handles raw events; incompatible with pre_reduce (a whole-row
    # pre-reduce would lose per-cell write orders). `salted` composes:
    # the cell reduce has its own two-phase salted form.
    partial_set_col: str | None = None
    # input-side parallelism floor. WAL segments arrive as few large files
    # (binlog shipping), so the scan often yields far fewer partitions than
    # the cluster has cores — the narrow phase (validate → pandas-UDF
    # normalize → partial LWW agg) then runs nearly serial regardless of
    # executor count, capping scaling efficiency. "auto" repartitions the
    # batch to 2×defaultParallelism when the scan is coarser than that;
    # None disables; an int sets the target explicitly.
    input_partitions: int | str | None = "auto"


def _append_metrics(path: str, record: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record, default=str) + "\n")


def apply_batch(
    target,
    events: DataFrame,
    batch_id: int,
    cfg: CDCConfig | None = None,
    stream_id: str = "default",
):
    """Apply one micro-batch of change events to the target table.

    `stream_id` scopes the idempotence gate to one checkpoint lineage (see
    ParquetLakeTarget.merge_batch)."""
    cfg = cfg or CDCConfig()
    if cfg.partial_set_col is not None:
        if cfg.pre_reduce:
            raise ValueError(
                "partial_set_col requires the raw sink-side cell merge: "
                "a pre_reduce whole-row reduction would lose per-cell "
                "write orders"
            )
        if not getattr(target, "handles_raw_events", False):
            raise ValueError(
                "partial_set_col needs a sink with a cell-level merge "
                "(ParquetLakeTarget); this target pre-reduces whole rows"
            )

    # 0. input-parallelism floor (see CDCConfig.input_partitions)
    if cfg.input_partitions is not None:
        sc = events.sparkSession.sparkContext
        target_p = (
            sc.defaultParallelism * 2
            if cfg.input_partitions == "auto"
            else int(cfg.input_partitions)
        )
        try:
            # JVM-side partition probe: df.rdd would build the full
            # Python-conversion RDD (serializer plan + pickling setup)
            # just to read a count — measurable at high batch rates
            n_parts = events._jdf.queryExecution().toRdd().getNumPartitions()
        except Exception:  # pragma: no cover - internal-API fallback
            n_parts = events.rdd.getNumPartitions()
        if n_parts < target_p:
            events = events.repartition(target_p)

    # 1. validation split (SHACL analogue): bad rows → dead letter
    ok, dead = validate_split(events, cfg.validation)
    n_dead = 0
    if cfg.dead_letter_dir is not None:
        dead = dead.cache()
        n_dead = dead.count()
        if n_dead:
            dead.write.mode("append").parquet(cfg.dead_letter_dir)
        dead.unpersist()

    # 2. vectorized normalization of the text payload (pure pandas UDF).
    # Applied AFTER the LWW reduce (winners only — ~u× fewer rows through
    # the Python/Arrow stage at u updates/key; measured: normalizing raw
    # events made the pipeline anti-scale at high core counts because JVM
    # task threads + Python workers oversubscribe the host). Winner
    # selection never reads the payload, and normalize is idempotent, so
    # reduce-then-normalize ≡ normalize-then-reduce.
    def _normalize(df: DataFrame) -> DataFrame:
        if "text" not in df.columns:
            return df
        if cfg.normalize:
            df = df.withColumn("text", normalize_text(F.col("text")))
        if cfg.redact:
            from ..operators.text import redact_text

            df = df.withColumn("text", redact_text(F.col("text")))
        return df

    # 3. schema evolution: ALTER before the merge plan is analyzed
    if cfg.evolve:
        batch_schema = ok.schema
        if cfg.partial_set_col is not None:
            # the set-columns mask is envelope metadata, not payload —
            # it must never be ALTERed into the target
            batch_schema = StructType(
                [f for f in batch_schema.fields
                 if f.name != cfg.partial_set_col]
            )
        new_schema = evolved_schema(target.schema(), batch_schema)
        if new_schema is not None:
            target.evolve_schema(new_schema)
    # align batch to the (possibly evolved) target payload set: missing
    # payload columns → null (late producers), key/ts casts to target types
    tgt_fields = {f.name: f for f in target.schema().fields}
    cols = [F.col(c) for c in ENVELOPE_COLS]
    for f in target.schema().fields:
        if f.name in ok.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if cfg.partial_set_col is not None:
        # the set-columns mask must survive the target-schema projection
        cols.append(F.col(cfg.partial_set_col))
    ok = ok.select(*cols)

    # 3.4 WARN-null accounting (see CDCConfig.warn_null_cols)
    warn_nulls: dict[str, int] = {}
    if cfg.warn_null_cols:
        aggs = [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
            for c in cfg.warn_null_cols
            if c in ok.columns
        ]
        if aggs:
            warn_nulls = {
                k: int(v or 0) for k, v in ok.agg(*aggs).first().asDict().items()
            }

    # 3.5 late-event lineage: raw events at-or-below their bucket's committed
    # LSN high-watermark (duplicates/out-of-order replays), counted BEFORE
    # reduction so redelivered rows that lose LWW are still accounted.
    n_late_raw = 0
    if cfg.count_late_raw and hasattr(target, "watermarks"):
        wm = target.watermarks()
        if wm:
            wm_map = F.create_map(
                *[F.lit(x) for b, l in wm.items() for x in (int(b), l)]
            )
            bucket = F.pmod(F.xxhash64("conv_id"), F.lit(target.n_buckets)).cast(
                "int"
            )
            n_late_raw = ok.filter(
                F.col("lsn") <= F.coalesce(wm_map[bucket], F.lit(-(2**62)))
            ).count()

    # 4. LWW reduce to one final event per key (pre-MERGE cardinality
    #    guarantee — Iceberg MERGE forbids multi-row source matches). Skipped
    #    when the sink's merge is itself an LWW reduction (parquet lake):
    #    the union-merge then runs as ONE shuffle over raw events.
    pre_reduce = (
        cfg.pre_reduce
        if cfg.pre_reduce is not None
        else not getattr(target, "handles_raw_events", False)
    )
    if pre_reduce:
        reduced = (
            lww_reduce_salted(ok, salt_buckets=cfg.salt_buckets)
            if cfg.salted
            else lww_reduce(ok)
        )
        reduced = _normalize(reduced)  # winners only
    elif not getattr(target, "handles_raw_events", False):
        # explicit pre_reduce=False with a sink that has no transform_reduced
        # hook: normalize the raw stream directly so the step is never
        # silently skipped (slower — Python stage before the reduction — but
        # correct; the auto path above never lands here)
        reduced = _normalize(ok)
    else:
        reduced = ok

    # 5. idempotent MERGE commit (raw path: the sink's own LWW is salted
    #    for hot-key skew instead of a pre-reduce; normalization runs inside
    #    the sink, after its reduce)
    sink_kwargs = {}
    if not pre_reduce and getattr(target, "handles_raw_events", False):
        sink_kwargs = {
            "salted": cfg.salted,
            "salt_buckets": cfg.salt_buckets,
            "transform_reduced": (
                _normalize if (cfg.normalize or cfg.redact) else None
            ),
        }
        if cfg.partial_set_col is not None:
            sink_kwargs["partial_set_col"] = cfg.partial_set_col
    res = target.merge_batch(reduced, batch_id, stream_id=stream_id, **sink_kwargs)
    res.extra["dead_letter_rows"] = n_dead
    res.extra["late_keys"] = res.late_events
    if warn_nulls:
        res.extra["warn_nulls"] = warn_nulls
    if res.applied:
        res.late_events = max(int(n_late_raw), res.late_events)

    if cfg.metrics_path:
        _append_metrics(
            cfg.metrics_path,
            {
                "batch_id": batch_id,
                "applied": res.applied,
                "events_in": res.events_in,
                "keys_upserted": res.keys_upserted,
                "keys_deleted": res.keys_deleted,
                "late_events": res.late_events,
                "dead_letter_rows": n_dead,
                "buckets_rewritten": res.buckets_rewritten,
                "snapshot_version": res.snapshot_version,
                **({"warn_nulls": warn_nulls} if warn_nulls else {}),
            },
        )
    return res


def run_stream(
    spark: SparkSession,
    events_dir: str,
    target,
    checkpoint_dir: str,
    cfg: CDCConfig | None = None,
    schema=CHANGE_EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
    envelope_dialect: str | None = None,
    source_table: str | None = None,
    envelope_payload_schema=None,
):
    """Tail a directory of change-event parquet files (the WAL), applying each
    micro-batch via foreachBatch. availableNow drains everything present and
    stops — rerunning with the same checkpoint resumes after the last
    committed offset (kill/resume replay convergence).

    When ``envelope_dialect`` is set, ``events_dir`` holds raw JSON-lines
    wire-format files (a Kafka topic dump, a connector's file sink)
    instead of change-event parquet: each micro-batch streams through the
    dialect parser (sources/envelopes.py — a narrow scan-stage
    projection, so the stream plan stays one stage up to the sink) before
    the same validate/evolve/MERGE path. ``source_table`` filters
    multiplexed streams (Maxwell/wal2json/Canal). This is the streaming
    form of the CLI's ``ingest``; checkpoint/resume semantics are
    identical to the parquet WAL form."""
    cfg = cfg or CDCConfig()
    if envelope_dialect is not None:
        reader = spark.readStream
        if max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_trigger
            )
        from ..sources.envelopes import PARTIAL_DIALECTS

        if (
            envelope_dialect in PARTIAL_DIALECTS
            and cfg.partial_set_col is None
        ):
            raise ValueError(
                f"dialect {envelope_dialect!r} emits sparse row images "
                "(a set-columns mask): set CDCConfig.partial_set_col — "
                "whole-row LWW would null untouched cells"
            )
        if cfg.partial_set_col is not None:
            # partial row images need the set-columns mask from the wire
            if envelope_dialect == "wal2json":
                from ..sources.wal2json import parse_wal2json

                stream = parse_wal2json(
                    reader.text(events_dir),
                    table=source_table,
                    payload_schema=envelope_payload_schema,
                    set_cols_col=cfg.partial_set_col,
                )
            elif envelope_dialect == "mongo":
                from ..sources.mongo import parse_mongo_oplog

                stream = parse_mongo_oplog(
                    reader.text(events_dir),
                    table=source_table,
                    payload_schema=envelope_payload_schema,
                    set_cols_col=cfg.partial_set_col,
                )
            else:
                raise ValueError(
                    "partial_set_col streaming requires a sparse-capable "
                    "dialect (wal2json, mongo)"
                )
        else:
            from ..sources.envelopes import parse_envelope

            stream = parse_envelope(
                reader.text(events_dir),
                envelope_dialect,
                table=source_table,
                payload_schema=envelope_payload_schema,
            )
    else:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_trigger
            )
        stream = reader.parquet(events_dir)
    if cfg.stream_dedup:
        from .dedup import watermarked_dedup

        stream = watermarked_dedup(stream, cfg.stream_dedup_watermark)

    stream_id = os.path.abspath(checkpoint_dir)  # one lineage per checkpoint

    def _sink(df: DataFrame, batch_id: int) -> None:
        apply_batch(target, df, batch_id, cfg, stream_id=stream_id)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
