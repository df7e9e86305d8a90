"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The Spark-side plumbing — schema, partitioning, Arrow batch shape,
mapInPandas signatures — is real and tested. Decoding is tiered by what
this container can honestly do WITHOUT codec libraries:

- REAL (stdlib+numpy): BMP 24-bit uncompressed (full pixel decode:
  dims + per-channel means), WAV PCM (``wave`` module: duration,
  channels, mean amplitude), PNG (IHDR dims — pixel data would need
  per-filter-type unfiltering; dims are header-only).
- STUB: every other format (JPEG/MP4/...) needs real codec libraries;
  ``fake=True`` produces a deterministic fake feature vector (sha256
  tiled) so the pipeline shape is exercised end to end, and
  ``fake=False`` raises NotImplementedError for unsupported magic
  rather than fabricating output.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
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


SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def synth_payload(doc_id: int) -> tuple[str, bytes]:
    """Deterministic REAL media payload derived from one integer id —
    the fixture generator for exercising ``decode_real`` under an
    external oracle: every decodable property (dims, duration, solid
    fill color) is pure doc_id arithmetic, so a SQL engine that never
    sees the bytes can still predict the decode output exactly.

    id % 3 == 0: 24-bit BMP, w=1+id%13, h=1+id%7, solid RGB
                 (id%256, id*7%256, id*13%256) — full pixel payload, so
                 the stride-aware numpy decode runs, not just headers.
    id % 3 == 1: WAV PCM-16 mono, 8000 Hz, 100+id%50 silent frames
                 (duration_ms = n*1000//8000 via the stdlib parser).
    id % 3 == 2: PNG IHDR, w=1+id%31, h=1+id%17 (header-only format
                 tier)."""
    m = doc_id % 3
    if m == 0:
        w, h = 1 + doc_id % 13, 1 + doc_id % 7
        r, g, b = doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256
        stride = (w * 3 + 3) & ~3
        row = (bytes([b, g, r]) * w) + b"\x00" * (stride - w * 3)
        px = row * h
        off = 54
        header = struct.pack("<2sIHHI", b"BM", off + len(px), 0, 0, off)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0
        )
        return "image", bytes(header + info + px)
    if m == 1:
        n = 100 + doc_id % 50
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(b"\x00\x00" * n)
        return "audio", buf.getvalue()
    w, h = 1 + doc_id % 31, 1 + doc_id % 17
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    )
    return "image", png


def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table from an id column (mapInPandas — the
    builders run Arrow-batch-columnar like any decode stage would).
    Returns (media_id, kind, payload) with ``synth_payload`` bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            built = [synth_payload(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "media_id": ["m_" + str(int(i)) for i in pdf[id_col]],
                    "kind": [k for k, _ in built],
                    "payload": [p for _, p in built],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=SYNTH_SCHEMA)


def decode_real(p: bytes) -> dict | None:
    """Real, stdlib+numpy-only decode for the formats whose containers
    are fully specified without external codecs. Returns a dict with
    ``mime`` plus format-specific fields, or None for unrecognized
    magic (caller decides whether to stub or raise).

    BMP: full 24-bit uncompressed pixel decode (numpy over the padded
    row stride) -> width/height + per-channel RGB means as features.
    WAV: PCM via the stdlib ``wave`` module -> duration_ms + [channels,
    framerate, n_frames, mean |amplitude|] (first 64k frames).
    PNG: IHDR width/height (header-only; features = dims)."""
    if p[:2] == b"BM" and len(p) >= 34:
        off = struct.unpack_from("<I", p, 10)[0]
        w, h = struct.unpack_from("<ii", p, 18)
        bpp = struct.unpack_from("<H", p, 28)[0]
        comp = struct.unpack_from("<I", p, 30)[0]
        w, h = abs(w), abs(h)
        if w > 0x7FFFFFFF or h > 0x7FFFFFFF:  # abs(-2^31) overflows Int32
            return {"mime": "image/bmp", "features": []}
        out = {"mime": "image/bmp", "width": w, "height": h}
        stride = (w * 3 + 3) & ~3
        if bpp == 24 and comp == 0 and len(p) >= off + h * stride and w and h:
            px = (
                np.frombuffer(p, dtype=np.uint8, count=h * stride, offset=off)
                .reshape(h, stride)[:, : w * 3]
                .reshape(-1, 3)
            )
            bgr = px.mean(axis=0) / 255.0
            out["features"] = [float(w), float(h), bgr[2], bgr[1], bgr[0]]
        else:
            out["features"] = [float(w), float(h)]
        return out
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24 and p[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", p, 16)
        if w > 0x7FFFFFFF or h > 0x7FFFFFFF:
            # the PNG spec caps dims at 2^31-1; a crafted header above
            # that would overflow the Int32 metadata columns downstream
            return {"mime": "image/png", "features": []}
        return {"mime": "image/png", "width": w, "height": h,
                "features": [float(w), float(h)]}
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        # valid magic does not mean decodable content: truncated files
        # and non-PCM codecs raise from wave.open/readframes — return a
        # recognized-but-undecodable record (empty features, no dims)
        # instead of letting the exception kill the whole Spark task
        try:
            with wave.open(io.BytesIO(p)) as wf:
                n, fr = wf.getnframes(), wf.getframerate()
                ch, sw = wf.getnchannels(), wf.getsampwidth()
                raw = wf.readframes(min(n, 65536))
        except (wave.Error, EOFError, struct.error, RuntimeError):
            # wave's chunk reader raises BARE RuntimeError on truncated
            # chunks (wave.py Chunk.skip -> seek), not wave.Error
            return {"mime": "audio/wav", "features": []}
        out = {
            "mime": "audio/wav",
            "duration_ms": int(n * 1000 / fr) if fr else None,
            "features": [float(ch), float(fr), float(n)],
        }
        if sw == 2 and raw:
            samples = np.frombuffer(raw, dtype="<i2")
            out["features"].append(float(np.abs(samples).mean() / 32768.0))
        return out
    return None


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
    payload sizes are skewed (big videos -> fewer rows per task).

    ``fake=False`` runs the REAL decoders (BMP/WAV/PNG — see
    ``decode_real``) and raises NotImplementedError on any payload whose
    format needs codec libraries this container lacks; ``fake=True``
    (default) produces the deterministic sha256 stub for every row."""

    def real_decode_or_raise(p: bytes) -> list[float]:
        d = decode_real(p)
        if d is None:
            raise NotImplementedError(
                f"no stdlib decoder for magic {p[:4]!r}: real decoding of "
                "this format requires codec libraries not present in this "
                "container; pass fake=True for the deterministic stub"
            )
        return d["features"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                feats = [
                    _fake_decode(bytes(p), dim) if p is not None else None
                    for p in payloads
                ]
            else:
                feats = [
                    real_decode_or_raise(bytes(p)) if p is not None else None
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


DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_meta(df: DataFrame) -> DataFrame:
    """Typed metadata from the payload BYTES (not the declared meta
    struct, which upstream may have lied about): real header parse for
    BMP/WAV/PNG, NULL fields for unrecognized formats. mapInPandas so a
    10^9-row media table decodes headers Arrow-batch-columnar with no
    driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decode_real(bytes(p)) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m.get("mime") if m else None for m in metas],
                    "width": pd.array(
                        [m.get("width") if m else None for m in metas],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [m.get("height") if m else None for m in metas],
                        dtype="Int32",
                    ),
                    "duration_ms": pd.array(
                        [m.get("duration_ms") if m else None for m in metas],
                        dtype="Int64",
                    ),
                }
            )

    return df.mapInPandas(run, schema=DECODED_META_SCHEMA)


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
