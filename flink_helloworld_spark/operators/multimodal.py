"""Multimodal column operators (north-star surface).

Media travel as opaque ``BinaryType`` payload columns + typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages (the only place Python belongs: per
payload CPU-bound work, vectorized per batch, partition-parallel).

The container has no image/audio libs, so the actual codec call is
STUBBED: ``decode_image_features`` uses a clearly-marked deterministic
fake (md5-derived dimensions) unless a real decoder import succeeds —
the Spark-side plumbing (schemas, batch shapes, partitioning) is real
and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("size_bytes", IntegerType()),
        StructField("checksum", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("decode_ok", BooleanType()),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata.

    (In production the payload would come from object storage; here the
    document bytes stand in so the column plumbing is end-to-end real.)
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).alias("size_bytes").cast("int"),
        F.md5(payload).alias("checksum"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decoder (no image libs in this container):
    derives (width, height, channels) from the payload's md5. Replace the
    body with e.g. PIL.Image.open when a real codec is available."""
    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[0:2], 16) % 64
    height = 1 + int(h[2:4], 16) % 64
    channels = 1 + int(h[4:6], 16) % 4
    return width, height, channels


def _real_decoder_available() -> bool:
    try:  # pragma: no cover - container has no PIL
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: (doc_id, payload) → image features.

    ``mapInPandas`` keeps partitioning: each input split is decoded
    in-place by its executor, no shuffle, batch size bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    use_real = _real_decoder_available()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:  # pragma: no cover
                raise NotImplementedError(
                    "real codec path: wire PIL.Image.open(io.BytesIO(payload)) here"
                )
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "decode_ok": True,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10, n_frames_col: str = "size_bytes") -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame index.

    Stands in for video frame extraction: the explode happens JVM-side;
    only the (stubbed) per-frame decode would be Python. A zero-byte
    payload has no frames and emits no rows (the greatest(...) guard
    alone would emit a phantom frame 0 for empty input)."""
    return media.where(F.col(n_frames_col) > 0).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames_col).cast("int") - 1, F.lit(every_n))
        ).alias("frame_index"),
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_windows", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms_q", IntegerType()),
        StructField("decode_ok", BooleanType()),
    ]
)


def _fake_audio_decode(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE audio decoder (no audio libs in container):
    sample rate and quantized RMS derived from the payload md5; duration
    proportional to byte length. Replace with soundfile/librosa when a
    real codec exists."""
    h = hashlib.md5(payload).hexdigest()
    sample_rate = (8000, 16000, 22050, 44100)[int(h[6], 16) % 4]
    duration_ms = len(payload) * 10
    rms_q = int(h[7:11], 16) % 1000
    return sample_rate, duration_ms, rms_q


def _real_audio_decoder_available() -> bool:
    try:  # pragma: no cover - container has no audio libs
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def decode_audio_features(media: DataFrame, window_ms: int = 250) -> DataFrame:
    """Audio twin of ``decode_image_features``: Arrow-batched
    ``mapInPandas``, partition-preserving, no shuffle. Emits per-clip
    stats plus the window count a framing stage would explode to
    (``ceil(duration / window)`` — the audio analog of frame_sample)."""
    use_real = _real_audio_decoder_available()  # NOT the image (PIL) probe

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:  # pragma: no cover
                raise NotImplementedError(
                    "real codec path: wire soundfile.read(io.BytesIO(payload)) here"
                )
            feats = [_fake_audio_decode(bytes(p)) for p in pdf["payload"]]
            durations = [f[1] for f in feats]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_windows": [
                        (d + window_ms - 1) // window_ms for d in durations
                    ],
                    "sample_rate": [f[0] for f in feats],
                    "duration_ms": durations,
                    "rms_q": [f[2] for f in feats],
                    "decode_ok": True,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, AUDIO_FEATURES_SCHEMA
    )
