"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container): the
default codec is a deterministic fake that derives "features" from the bytes
(so the Spark-side plumbing — schema, batch shape, partition sizing — is real
and tested); `decode_image` raises NotImplementedError unless a real codec
is injected.

Scale notes: binary payloads dominate row size → `media_repartition` sizes
partitions by BYTES not rows (sum of payload length), so Arrow batches stay
within executor memory; metadata-only projections never touch the payload
column (parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> dict:
    """Real decode hook — inject a codec (PIL/ffmpeg) on a real cluster."""
    raise NotImplementedError(
        "no image/audio codec in this container; use fake_decode or inject one"
    )


def fake_decode(payload: bytes | None, kind: str) -> dict:
    """Deterministic stand-in: metadata derived purely from the bytes."""
    if payload is None:
        return {"n_bytes": None, "width": None, "height": None,
                "n_frames": None, "feature": None}
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 16 + n % 64,
        "height": 16 + (n // 64) % 64,
        "n_frames": 1 if kind == "image" else 1 + n % 7,
        "feature": [float((payload[i % max(n, 1)] if n else 0) + i) for i in range(8)],
    }


def extract_features(
    media: DataFrame, codec: Callable[[bytes | None, str], dict] = fake_decode
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [codec(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            out = pd.DataFrame(feats)
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_repartition(media: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Partition by payload VOLUME: estimates total bytes and repartitions so
    each partition carries ~target_bytes of binary payload."""
    total = media.select(
        F.sum(F.coalesce(F.octet_length("payload"), F.lit(0))).alias("b")
    ).collect()[0]["b"] or 0
    n_parts = max(1, int(total // target_bytes) + 1)
    return media.repartition(n_parts)


def fake_probe(payload: bytes | None, kind: str) -> int | None:
    """Deterministic header-probe stand-in: frame count from container
    metadata only (same values as fake_decode's n_frames) — a real codec
    reads the container header here, never decodes frames."""
    if payload is None:
        return None
    return 1 if kind == "image" else 1 + len(payload) % 7


def frame_sample(
    media: DataFrame,
    every_n: int = 10,
    probe: Callable[[bytes | None, str], int | None] = fake_probe,
    use_meta: bool = False,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame index.

    Frame counts come from a HEADER PROBE (container metadata), not a full
    decode — with a real codec this skips all frame-decode CPU. With
    use_meta=True the count is read from the JSON sidecar's `n_frames`
    field instead: a pure column expression, so the parquet scan prunes the
    payload column entirely (zero bytes of media shipped)."""
    if use_meta:
        with_frames = media.select(
            "media_id",
            "kind",
            F.get_json_object("meta", "$.n_frames").cast("int").alias("n_frames"),
        )
    else:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"].values,
                        "kind": pdf["kind"].values,
                        "n_frames": pd.array(
                            [
                                probe(p, k)
                                for p, k in zip(pdf["payload"], pdf["kind"])
                            ],
                            dtype="Int32",
                        ),
                    }
                )

        with_frames = media.select("media_id", "kind", "payload").mapInPandas(
            run, "media_id long, kind string, n_frames int"
        )
    return with_frames.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture (text →
    utf-8 bytes as payload) so the plumbing is exercised without binary
    fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.to_json(F.struct(F.col("source"), F.col("lang"))).alias("meta"),
    )
