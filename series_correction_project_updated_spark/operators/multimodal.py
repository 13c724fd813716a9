"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data-pipeline plumbing for non-text payloads at 100 TB. Media
travels as a ``binary`` column with a typed metadata struct; per-batch
processing runs through ``mapInPandas`` (Arrow batches of whole payloads) so
decode/resize/frame-sample parallelize across executors and never hit
per-row Python.

``_decode_payload`` is a REAL decoder for the dependency-free public
formats — PPM/PGM (netpbm P6/P5), uncompressed 24-bit BMP, and PCM-16 WAV —
parsed with struct/NumPy alone, plus the deterministic ``FAKE`` container
(``make_fake_media``) for seedable test data. Compressed image codecs
(JPEG/PNG/...) decode through Pillow when it is importable (grayscale
byte-plane, same feature shape as the native decoders); without PIL that
path raises ``NotImplementedError`` with a clear message — this container
ships no codec libraries. The Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is identical for every
container kind.

FAKE container layout (deterministic, seedable):
    b"FAKEMEDIA" | kind(1B: I/A/V) | width u16 | height u16 | n_frames u16 |
    sample_rate u32 | payload bytes (xxhash-seeded pseudo-noise)
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = b"FAKEMEDIA"
_KIND_BYTE = {"image": b"I", "audio": b"A", "video": b"V"}
_BYTE_KIND = {v: k for k, v in _KIND_BYTE.items()}


def make_fake_media(
    spark: SparkSession, n: int = 100, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic fake media table (Spark-side generation via mapInPandas
    so the same code scales; payload is seeded pseudo-noise)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(media_id))
                kind = ["image", "audio", "video"][int(media_id) % 3]
                w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
                n_frames = int(rng.integers(1, 16)) if kind == "video" else 1
                sr = 16000 if kind == "audio" else 0
                body_len = w * h if kind != "audio" else sr // 10
                body = rng.integers(0, 256, body_len, dtype=np.uint8).tobytes()
                payload = (
                    _MAGIC
                    + _KIND_BYTE[kind]
                    + struct.pack("<HHHI", w, h, n_frames, sr)
                    + body
                )
                rows.append(
                    (int(media_id), kind, payload, (w, h, n_frames, sr, "fake"))
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    base = spark.range(0, n, 1, numPartitions=partitions or 4)
    return base.mapInPandas(_gen, schema=MEDIA_SCHEMA)


def _decode_netpbm(payload: bytes) -> tuple[str, int, int, int, int, np.ndarray]:
    """PPM (P6, RGB) / PGM (P5, gray) binary netpbm decode — pure NumPy.

    Grayscale output: P6 pixels are averaged across RGB (integer mean)."""
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    if payload[:2] == b"P6":
        rgb = np.frombuffer(payload, dtype=np.uint8, offset=pos, count=w * h * 3)
        gray = rgb.reshape(h, w, 3).mean(axis=2).astype(np.uint8)
    else:
        gray = np.frombuffer(payload, dtype=np.uint8, offset=pos, count=w * h).reshape(h, w)
    return "image", w, h, 1, 0, gray.ravel()


def _decode_bmp(payload: bytes) -> tuple[str, int, int, int, int, np.ndarray]:
    """Uncompressed 24-bit BMP decode (BITMAPINFOHEADER) — pure NumPy.

    Rows are bottom-up and padded to 4 bytes; output is row-major grayscale
    (integer mean of BGR)."""
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, offset=data_offset, count=stride * h)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    gray = rows.mean(axis=2).astype(np.uint8)
    return "image", w, h, 1, 0, gray.ravel()


def _decode_wav(payload: bytes) -> tuple[str, int, int, int, int, np.ndarray]:
    """PCM-16 RIFF/WAVE decode — pure struct/NumPy chunk walk.

    Samples are mixed to mono and mapped int16 → uint8 (offset-binary) so
    downstream byte-level features treat every modality uniformly."""
    if payload[8:12] != b"WAVE":
        raise NotImplementedError("not a WAVE file")
    pos, sr, n_channels, bits = 12, 0, 1, 16
    samples = np.array([], dtype=np.int16)
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt, n_channels, sr = struct.unpack_from("<HHI", payload, pos + 8)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM-16 WAV supported")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", offset=pos + 8, count=size // 2)
        pos += 8 + size + (size & 1)
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels).mean(axis=1).astype(np.int16)
    body = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
    return "audio", 0, 0, 1, sr, body


def _decode_payload(payload: bytes) -> tuple[str, int, int, int, int, np.ndarray]:
    """Decode one payload → (kind, w, h, n_frames, sample_rate, array).

    Dispatch by magic bytes: FAKE container, netpbm (P5/P6), BMP, WAV are
    decoded for real with no external libraries; compressed codecs are
    import-gated on PIL (absent in this container)."""
    if payload[: len(_MAGIC)] == _MAGIC:
        kind = _BYTE_KIND[payload[len(_MAGIC) : len(_MAGIC) + 1]]
        w, h, n_frames, sr = struct.unpack_from("<HHHI", payload, len(_MAGIC) + 1)
        body = np.frombuffer(payload, dtype=np.uint8, offset=len(_MAGIC) + 1 + 10)
        return kind, w, h, n_frames, sr, body
    if payload[:2] in (b"P5", b"P6"):
        return _decode_netpbm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:4] == b"RIFF":
        return _decode_wav(payload)
    try:
        import PIL.Image
    except ImportError:
        raise NotImplementedError(
            "compressed codecs (JPEG/PNG/...) need libraries not present "
            "here; PPM/PGM, uncompressed BMP, PCM WAV and the FAKE container "
            "decode natively"
        ) from None
    # real Pillow path (exercised when PIL is installed — see
    # tests/test_multimodal_codecs.py::test_pil_path, importorskip-gated):
    # decode to 8-bit grayscale so features match the native decoders' shape
    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    body = np.asarray(img, dtype=np.uint8).ravel()
    return "image", img.width, img.height, 1, 0, body


def extract_media_features(media: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract per payload: byte-mean/std, 8-bin histogram.

    mapInPandas over whole Arrow batches — the pattern a real decode
    (JPEG → tensor → resize) would use; only ``_decode_payload`` changes."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("byte_mean", T.DoubleType()),
            T.StructField("byte_std", T.DoubleType()),
            T.StructField("histogram", T.ArrayType(T.DoubleType())),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, nf, sr, body = _decode_payload(bytes(payload))
                hist, _ = np.histogram(body, bins=8, range=(0, 256))
                hist = (hist / max(len(body), 1)).tolist()
                recs.append((int(media_id), kind, float(body.mean()), float(body.std()), hist))
            yield pd.DataFrame(
                recs, columns=["media_id", "kind", "byte_mean", "byte_std", "histogram"]
            )

    src = media.repartition(num_partitions) if num_partitions else media
    return src.mapInPandas(_extract, schema=out_schema)


def resize_images(media: DataFrame, target: int = 16) -> DataFrame:
    """'Resize' images to target×target (block-mean downsample of the fake
    body; a real impl swaps in PIL). Returns (media_id, resized binary)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, nf, sr, body = _decode_payload(bytes(payload))
                if kind != "image":
                    continue
                img = body[: w * h].reshape(h, w)
                ys = np.linspace(0, h, target + 1, dtype=int)
                xs = np.linspace(0, w, target + 1, dtype=int)
                small = np.empty((target, target), dtype=np.uint8)
                for i in range(target):
                    for j in range(target):
                        small[i, j] = int(img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean())
                recs.append((int(media_id), small.tobytes(), target, target))
            yield pd.DataFrame(recs, columns=["media_id", "resized", "width", "height"])

    return media.where(F.col("kind") == "image").mapInPandas(_resize, schema=out_schema)


def sample_video_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: one row per kept frame (media_id, frame_idx, frame).

    For FAKE video the 'frames' are equal slices of the body."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, nf, sr, body = _decode_payload(bytes(payload))
                if kind != "video" or nf == 0:
                    continue
                per = max(len(body) // max(nf, 1), 1)
                for idx in range(0, nf, every_n):
                    recs.append((int(media_id), idx, body[idx * per : (idx + 1) * per].tobytes()))
            yield pd.DataFrame(recs, columns=["media_id", "frame_idx", "frame"])

    return media.where(F.col("kind") == "video").mapInPandas(_sample, schema=out_schema)
