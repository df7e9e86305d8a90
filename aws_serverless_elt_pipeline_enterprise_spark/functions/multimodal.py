"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing — schema, partitioning, Arrow batch shape,
mapInPandas signatures — is real and tested; the actual codec calls are
STUBBED (this container has no image/audio libraries): ``decode_stub``
raises NotImplementedError unless ``fake=True``, in which case it produces
a deterministic fake "decode" (shape + checksum derived from the bytes) so
the pipeline shape is exercised end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat_dim", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_from_text(df: DataFrame, text: str = "text") -> DataFrame:
    """Test harness: deterministic binary payloads from the documents table
    (utf-8 bytes stand in for media bytes)."""
    return df.select(
        F.concat(F.lit("m_"), F.col("doc_id").cast("string")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode(F.col(text), "utf-8")).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector: bytes of sha256 scaled to [0,1),
    TILED to the requested dim (sha256 is 32 bytes; plain truncation made
    feat_dim lie for dim > 32 — any feat_dim == size(features) invariant
    check would flag every row). Stands in for decode->resize->embed."""
    h = hashlib.sha256(payload).digest()
    reps = (dim + len(h) - 1) // len(h)
    return [b / 256.0 for b in (h * reps)[:dim]]


def extract_features(
    df: DataFrame, fake: bool = True, dim: int = 8, batch_hint: int = 1024
) -> DataFrame:
    """Decode / feature-extract via mapInPandas: Arrow streams binary
    batches into Python; each batch is processed columnar; output schema is
    fixed. Partitioning: inherits upstream; repartition before calling if
    payload sizes are skewed (big videos -> fewer rows per task)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this container; pass fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            feats = [
                _fake_decode(bytes(p), dim) if p is not None else None
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in payloads],
                    "checksum": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    # actual produced length, never the requested dim: the
                    # two must agree for feat_dim == size(features) checks
                    "feat_dim": [len(f) if f is not None else 0 for f in feats],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to decode
    per media row (JVM-side), leaving the decode itself to extract_features.
    Shows the declare-then-vectorize split: planning stays in codegen."""
    return df.select(
        "media_id",
        F.sequence(
            F.lit(0),
            F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
            F.lit(every_ms),
        ).alias("frame_ts_ms"),
    )
