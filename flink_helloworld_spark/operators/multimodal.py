"""Multimodal column operators (north-star surface).

Media travel as opaque ``BinaryType`` payload columns + typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages (the only place Python belongs: per
payload CPU-bound work, vectorized per batch, partition-parallel).

The container has no image/audio libs, so compressed codecs (JPEG etc.)
remain stubbed — but the netpbm (PPM/PGM/PBM) and BMP families need no
library at all, and ``decode_image_features`` decodes those FOR REAL
(header parse + raster validation, pure Python over Arrow batches).
``attach_ppm_binary`` builds genuine P6 payloads JVM-side so one
modality is decode-real end-to-end; other payloads fall back to the
clearly-marked deterministic fake, keeping the pipeline total.
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


def _parse_ppm(payload: bytes) -> tuple[int, int, int] | None:
    """REAL pure-Python decoder for the netpbm family (P1-P6): parses
    the ASCII header (magic, optional #-comments, width, height, maxval
    for non-bitmap types) and validates raster length for the binary
    forms. Returns (width, height, channels) or None if not netpbm /
    corrupt. No image libraries required — the format is a public,
    trivially parseable spec, which makes one modality decode-REAL in
    this container."""
    if len(payload) < 2 or payload[0:1] != b"P" or payload[1:2] not in b"123456":
        return None
    kind = payload[1]

    # tokenize header: whitespace-separated ints, # comments to EOL
    tokens: list[int] = []
    i = 2
    need = 2 if kind in (0x31, 0x34) else 3  # P1/P4 have no maxval
    while i < len(payload) and len(tokens) < need:
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(tokens) < need:
        return None
    width, height = tokens[0], tokens[1]
    if width <= 0 or height <= 0:
        return None
    if kind in (0x33, 0x36):  # P3/P6 RGB
        channels = 3
    else:  # P1/P4 bitmap, P2/P5 graymap
        channels = 1
    if kind in (0x35, 0x36):  # binary gray/RGB: single whitespace then raster
        i += 1
        if len(payload) - i < width * height * channels:
            return None
    elif kind == 0x34:  # binary bitmap: rows padded to whole bytes
        i += 1
        if len(payload) - i < ((width + 7) // 8) * height:
            return None
    return width, height, channels


def _parse_bmp(payload: bytes) -> tuple[int, int, int] | None:
    """REAL pure-Python BMP (Windows DIB) decoder: validates the BM file
    header and reads width/height/bit-count from a BITMAPINFOHEADER-or-
    later DIB header. Returns (width, height, channels) or None."""
    import struct

    if len(payload) < 54 or payload[0:2] != b"BM":
        return None
    file_size = struct.unpack_from("<I", payload, 2)[0]
    if file_size > len(payload):
        return None
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:  # BITMAPCOREHEADER not supported
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    bit_count = struct.unpack_from("<H", payload, 28)[0]
    if width <= 0 or height == 0 or bit_count == 0:
        return None
    return width, abs(height), max(1, bit_count // 8)


def attach_ppm_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize REAL P6 PPM payloads from document text, entirely
    JVM-side: dims derive from n_chars (w = 1 + n%8, h = 1 + (n/8)%8),
    the raster is the md5 hex stream of the text repeated to w·h·3
    bytes. The decode stage then parses these as genuine image bytes —
    construction is deterministic, so the DuckDB oracle can state the
    expected dimensions without a decoder."""
    n = F.length(F.col(text_col))
    w = (n % 8 + 1).cast("int")
    h = (F.floor(n / 8).cast("int") % 8 + 1).cast("int")
    hex_chars = w * h * F.lit(6)  # w*h*3 raster bytes = 2x that in hex
    reps = F.floor(hex_chars / 32).cast("int") + 1  # md5 hex is 32 chars
    header = F.concat_ws(
        "", F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n")
    )
    raster_hex = F.substring(
        F.call_function("repeat", F.md5(F.col(text_col)), reps), F.lit(1), hex_chars
    )
    payload = F.concat(F.encode(header, "UTF-8"), F.unhex(raster_hex))
    return docs.select(
        "doc_id",
        F.lit("image/x-portable-pixmap").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("size_bytes"),
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

    def decode_one(mt: str, p: bytes) -> tuple[int, int, int, bool]:
        # REAL parsers for the dependency-free formats; the declared
        # media_type routes — magic-sniffing alone would mis-parse an
        # "image/fake" payload whose text happens to start with "P3".
        # Unknown/other types use the documented deterministic fake so
        # the pipeline stays total; corrupt netpbm/BMP → not-ok.
        if mt == "image/x-portable-pixmap" or (
            mt != "image/fake" and p[0:1] == b"P" and p[1:2] in b"123456"
        ):
            parsed = _parse_ppm(p)
        elif mt == "image/bmp" or (mt != "image/fake" and p[0:2] == b"BM"):
            parsed = _parse_bmp(p)
        else:
            return (*_fake_decode(p), True)
        if parsed is None:
            return 0, 0, 0, False
        return (*parsed, True)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_one(mt, bytes(p))
                for mt, p in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "decode_ok": [f[3] for f in feats],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        decode, IMAGE_FEATURES_SCHEMA
    )


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
