"""IcebergTarget — the production MERGE INTO path for real clusters.

Same interface as ParquetLakeTarget; used when the Iceberg runtime jar +
catalog extensions are configured (session.iceberg_confs). Not exercisable in
this sandbox (no Iceberg jar ships in the container) — guarded tests skip it —
but the SQL it emits is the contract SURVEY.md §2.1 #4 documents.

Idempotence: batch-id + per-bucket LSN high-watermarks are stored in the
table's snapshot summary via `ALTER TABLE ... SET TBLPROPERTIES` in the same
driver-side commit sequence (`cdc.batch-id`, `cdc.watermark.lsn.<bucket>`,
FIXTURES.md §1).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import MERGE_KEYS, TRANSCRIPTS_SCHEMA


def iceberg_available(spark: SparkSession, catalog: str = "lake") -> bool:
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}")
        return True
    except Exception:
        return False


class IcebergTarget:
    def __init__(
        self,
        spark: SparkSession,
        table: str = "lake.cdc.transcripts",
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.table = table
        self.n_buckets = n_buckets

    def create(self, schema: T.StructType | None = None) -> None:
        schema = schema or TRANSCRIPTS_SCHEMA
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
        ns = self.table.rsplit(".", 1)[0]
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {ns}")
        self.spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {self.table} ({cols}, _lsn bigint,
            _deleted boolean)
            USING iceberg
            PARTITIONED BY (bucket({self.n_buckets}, conv_id))
            TBLPROPERTIES (
              'write.distribution-mode'='hash',
              'write.merge.mode'='merge-on-read',
              'cdc.batch-id'='-1'
            )"""
        )

    def last_committed_batch(self) -> int:
        row = self.spark.sql(f"SHOW TBLPROPERTIES {self.table} ('cdc.batch-id')")
        props = {r["key"]: r["value"] for r in row.collect()}
        return int(props.get("cdc.batch-id", -1))

    def schema(self) -> T.StructType:
        df = self.spark.table(self.table)
        return T.StructType(
            [f for f in df.schema.fields if f.name not in ("_lsn", "_deleted")]
        )

    def evolve_schema(self, new_schema: T.StructType) -> bool:
        cur = {f.name: f for f in self.schema().fields}
        changed = False
        for f in new_schema.fields:
            if f.name not in cur:
                self.spark.sql(
                    f"ALTER TABLE {self.table} ADD COLUMN "
                    f"{f.name} {f.dataType.simpleString()}"
                )
                changed = True
            elif cur[f.name].dataType != f.dataType:
                self.spark.sql(
                    f"ALTER TABLE {self.table} ALTER COLUMN "
                    f"{f.name} TYPE {f.dataType.simpleString()}"
                )
                changed = True
        return changed

    def read(self) -> DataFrame:
        return (
            self.spark.table(self.table)
            .filter(~F.col("_deleted"))
            .drop("_lsn", "_deleted")
        )

    def merge_batch(self, reduced: DataFrame, batch_id: int, stream_id: str = "default"):
        """One LWW-reduced micro-batch → MERGE INTO keyed on (conv_id,
        turn_idx), LWW-guarded on (ts, lsn) so late replays are no-ops.
        """
        from .parquet_lake import MergeResult  # shared result type

        row = self.spark.sql(f"SHOW TBLPROPERTIES {self.table} ('cdc.stream-id')")
        props = {r["key"]: r["value"] for r in row.collect()}
        same_lineage = props.get("cdc.stream-id") == stream_id
        if same_lineage and batch_id <= self.last_committed_batch():
            return MergeResult(batch_id=batch_id, applied=False)

        payload = [
            c for c in reduced.columns if c not in (*MERGE_KEYS, "op", "lsn", "ts")
        ]
        reduced.createOrReplaceTempView("_cdc_batch")
        set_cols = ", ".join(
            [f"t.{c} = s.{c}" for c in payload]
            + ["t.ts = s.ts", "t._lsn = s.lsn", "t._deleted = (s.op = 'D')"]
        )
        ins_cols = ", ".join([*MERGE_KEYS, *payload, "ts", "_lsn", "_deleted"])
        ins_vals = ", ".join(
            [f"s.{k}" for k in MERGE_KEYS]
            + [f"s.{c}" for c in payload]
            + ["s.ts", "s.lsn", "(s.op = 'D')"]
        )
        on = " AND ".join(f"t.{k} = s.{k}" for k in MERGE_KEYS)
        self.spark.sql(
            f"""MERGE INTO {self.table} t
            USING _cdc_batch s
            ON {on}
            WHEN MATCHED AND struct(s.ts, s.lsn) > struct(t.ts, t._lsn)
                THEN UPDATE SET {set_cols}
            WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"""
        )
        wm = reduced.groupBy(
            F.pmod(F.xxhash64("conv_id"), F.lit(self.n_buckets)).alias("b")
        ).agg(F.max("lsn").alias("l")).collect()
        props = {f"cdc.watermark.lsn.{r['b']}": str(r["l"]) for r in wm}
        props["cdc.batch-id"] = str(batch_id)
        props["cdc.stream-id"] = stream_id
        kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
        self.spark.sql(f"ALTER TABLE {self.table} SET TBLPROPERTIES ({kv})")
        return MergeResult(
            batch_id=batch_id, applied=True,
            extra={"watermarks": json.loads(json.dumps(props))},
        )
