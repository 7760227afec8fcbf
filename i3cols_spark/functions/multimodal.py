"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators (SURVEY north-star).

The container has no image/audio libraries, so the actual codecs are
STUBBED (clearly marked below): ``decode_media`` raises
NotImplementedError for real codecs and provides a deterministic fake
codec ("fake/raw": payload bytes are the samples) so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is
real and tested end-to-end.  Swapping in Pillow/librosa later changes
only the inner ``_decode_payload`` function.

Scale notes: binary payloads ride the normal columnar path (parquet
keeps them page-compressed); ``mapInPandas`` streams Arrow batches so
peak memory is one batch, not one partition; feature extraction is
embarrassingly parallel — repartition by size if payloads are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to the opaque payload.
MEDIA_T = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # e.g. image/png
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "checksum string, features array<float>"
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test/fixture helper: derive a deterministic binary payload column
    from a text column (UTF-8 bytes, 'fake/raw' media type)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("fake/raw").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    )


def _decode_payload(media_type: str, payload: bytes) -> list[float]:
    """Inner codec.  STUB: only the deterministic fake codec is
    implemented in this container; real decoders are gated behind
    import-try so the same operator works where the libs exist."""
    if media_type == "fake/raw":
        # Deterministic fake "samples": byte values of an 8-byte stride.
        return [float(b) for b in payload[::8][:32]]
    if media_type.startswith("image/"):
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib not in container
            raise NotImplementedError(
                "image decode requires Pillow (not in this container); "
                "use media_type='fake/raw' for plumbing tests"
            ) from e
    if media_type.startswith("audio/"):  # pragma: no cover
        raise NotImplementedError("audio decode not available in this container")
    raise NotImplementedError(f"unknown media_type: {media_type}")


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    Output: (media_id, media_type, n_bytes, checksum, features) —
    checksum is hex md5 of the payload (exactly reproducible), features
    are the decoded samples from ``_decode_payload``.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [
                _decode_payload(mt, bytes(p))
                for mt, p in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "checksum": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(op, schema=FEATURES_SCHEMA)


def resize_media(df: DataFrame, factor: int = 2) -> DataFrame:
    """Resize stub for image payloads: keeps every ``factor``-th byte
    of the fake payload and divides the width/height metadata (a real
    implementation decodes, resamples and re-encodes per Arrow batch —
    identical plumbing).  Metadata stays consistent with the payload:
    downstream operators can trust ``width``/``height`` without
    decoding, which at scale is what lets a resolution filter prune
    before any byte of payload is touched."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [bytes(p)[::factor] for p in pdf["payload"]]
            for dim in ("width", "height"):
                out[dim] = (pdf[dim] // factor).astype(pdf[dim].dtype)
            yield out

    return df.mapInPandas(op, schema=df.schema)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling stub for video payloads: keeps every n-th 'frame'
    (8-byte block of the fake payload).  Real implementation would call
    a video decoder per Arrow batch — identical plumbing."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for p in pdf["payload"]:
                raw = bytes(p)
                blocks = [raw[i : i + 8] for i in range(0, len(raw), 8)]
                frames.append(b"".join(blocks[::every_n]))
            out = pdf.copy()
            out["payload"] = frames
            yield out

    return df.mapInPandas(op, schema=df.schema)
