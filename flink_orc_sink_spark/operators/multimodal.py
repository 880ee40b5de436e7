"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata — the
only representation that scales: Spark shuffles/spills binary columns
like any other, and decode happens where the bytes already are, inside
Arrow-batched ``mapInPandas`` stages.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are stubbed: ``decode_image_meta`` extracts real
container-level facts computable from raw bytes (size, digest, magic
sniff) and the model-facing kernels raise ``NotImplementedError``
behind a clearly-marked seam. The Spark-side plumbing — schema,
batch iteration, partitioning, output contract — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic-byte sniffing: real, dependency-free container detection.
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "audio/wav"),  # refined below via the WAVE tag
    (b"ID3", "audio/mpeg"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp boxes start with size prefix
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("mime_sniff", T.StringType()),
    ]
)


def sniff_mime(raw: bytes) -> str:
    """Container detection from magic bytes (no codec libs needed)."""
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return "audio/wav"
    if len(raw) > 11 and raw[4:8] == b"ftyp":
        return "video/mp4"
    for magic, mime in _MAGIC:
        if raw.startswith(magic):
            return mime
    return "application/octet-stream"


def extract_media_meta(
    df: DataFrame, id_col: str, binary_col: str
) -> DataFrame:
    """Per-blob metadata via ``mapInPandas`` — the canonical multimodal
    stage shape: Arrow batches in, Arrow batches out, executor-local,
    no driver involvement. Output schema is fixed
    (:data:`MEDIA_META_SCHEMA`) so downstream stages can bind to it.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[binary_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "byte_len": blobs.map(len).astype("int64"),
                    "sha256": blobs.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "mime_sniff": blobs.map(sniff_mime),
                }
            )

    # prune before the Arrow exchange: mapInPandas ships every input
    # column through Arrow; a wide table would pay for all of them.
    return df.select(id_col, binary_col).mapInPandas(batches, MEDIA_META_SCHEMA)


# ---------------------------------------------------------------------
# Stubbed decode kernels — the seam where PIL/ffmpeg would plug in.
# Signatures, schemas, and batch shapes are the real contract; the
# bodies raise until the codec libraries exist in the runtime image.
# ---------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_image_kernel(raw: bytes) -> tuple[int, int, list[float]]:
    """Decode + feature-extract one image. STUB: the container has no
    image codecs; replace with PIL/torchvision in production."""
    raise NotImplementedError(
        "image decode requires PIL/torchvision, not present in this runtime"
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_png", T.BinaryType()),
    ]
)


def sample_frames_kernel(raw: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Sample every-n-th video frame. STUB: requires ffmpeg."""
    raise NotImplementedError("frame sampling requires ffmpeg bindings")


def decode_images(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    kernel: Callable[[bytes], tuple[int, int, list[float]]] = decode_image_kernel,
) -> DataFrame:
    """Image decode/feature stage. ``kernel`` is injectable so tests
    drive the full distributed plumbing with a deterministic fake while
    the real codec stays stubbed."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[binary_col]):
                w, h, feats = kernel(bytes(raw))
                rows.append((int(mid), w, h, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "features"]
            )

    return df.select(id_col, binary_col).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_image_kernel(raw: bytes, width: int, height: int) -> bytes:
    """Resize one image to (width, height). STUB: requires PIL."""
    raise NotImplementedError(
        "image resize requires PIL, not present in this runtime"
    )


def resize_images(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    width: int = 224,
    height: int = 224,
    kernel: Callable[[bytes, int, int], bytes] = resize_image_kernel,
) -> DataFrame:
    """Image-resize stage (the standard pre-encoder normalization):
    blob in → fixed-size blob out, 1:1, executor-local Arrow batches.
    Same injectable-kernel seam as :func:`decode_images`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "resized": [
                        kernel(bytes(raw), width, height)
                        for raw in pdf[binary_col]
                    ],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    every_n: int = 10,
    kernel: Callable[[bytes, int], list[tuple[int, bytes]]] = sample_frames_kernel,
) -> DataFrame:
    """Video frame-sampling stage: one input blob → N frame rows.

    The fan-out (1 video → many frames) happens inside ``mapInPandas``
    so frames land in the same partition as their source bytes — no
    shuffle, and downstream ``repartition`` can rebalance if frame
    sizes skew. ``kernel`` is injectable: tests drive the distributed
    plumbing with a deterministic fake while the real ffmpeg decode
    stays stubbed (not in this runtime).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[binary_col]):
                for frame_idx, frame_png in kernel(bytes(raw), every_n):
                    rows.append((int(mid), int(frame_idx), frame_png))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_png"]
            )

    return df.select(id_col, binary_col).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_audio_kernel(raw: bytes) -> tuple[int, int, list[float]]:
    """Decode one audio blob → (duration_ms, sample_rate, features
    e.g. mel-band energies). STUB: requires soundfile/librosa, not
    present in this runtime."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa, not present in this runtime"
    )


def extract_audio_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    kernel: Callable[[bytes], tuple[int, int, list[float]]] = extract_audio_kernel,
) -> DataFrame:
    """Audio decode/feature stage (waveform stats, mel energies —
    whatever the injected kernel computes): blob in → typed feature
    row out, 1:1, executor-local Arrow batches. Same injectable-kernel
    seam as :func:`decode_images`; the Spark-side plumbing (schema,
    batching, partition-locality) is real and tested."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[binary_col]):
                dur, sr, feats = kernel(bytes(raw))
                rows.append((int(mid), int(dur), int(sr), feats))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_ms", "sample_rate", "features"],
            )

    return df.select(id_col, binary_col).mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


def attach_binary_from_text(df: DataFrame, text_col: str) -> DataFrame:
    """Test fixture helper: stand-in blob column (utf-8 bytes of the
    text) so multimodal plumbing is exercisable without media files."""
    return df.withColumn("blob", F.encode(F.col(text_col), "UTF-8"))
