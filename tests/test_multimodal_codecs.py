"""Real (dependency-free) codec decode tests: netpbm P5/P6, uncompressed
24-bit BMP, PCM-16 WAV — hand-encoded payloads, exact pixel/sample checks,
and an end-to-end mapInPandas pass over a table mixing real containers."""

import importlib.util
import struct

import numpy as np
import pandas as pd
import pytest

from series_correction_project_updated_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _decode_payload,
    extract_media_features,
)


def _ppm_bytes(w, h, rgb: np.ndarray) -> bytes:
    return b"P6\n# comment line\n" + f"{w} {h}\n255\n".encode() + rgb.tobytes()


def _pgm_bytes(w, h, gray: np.ndarray) -> bytes:
    return f"P5 {w} {h} 255 ".encode() + gray.tobytes()


def _bmp_bytes(w, h, gray_rows_topdown: np.ndarray) -> bytes:
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in gray_rows_topdown[::-1]:  # bottom-up storage
        line = np.repeat(row, 3).astype(np.uint8).tobytes()
        body += line + b"\x00" * (stride - len(line))
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + bytes(body)


def _wav_bytes(sr, samples: np.ndarray) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_ppm_decode_exact():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    kind, w, h, nf, sr, body = _decode_payload(_ppm_bytes(5, 4, rgb))
    assert (kind, w, h, nf, sr) == ("image", 5, 4, 1, 0)
    want = rgb.reshape(4, 5, 3).mean(axis=2).astype(np.uint8).ravel()
    assert (body == want).all()


def test_pgm_decode_exact():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    kind, w, h, nf, sr, body = _decode_payload(_pgm_bytes(4, 3, gray))
    assert (kind, w, h) == ("image", 4, 3)
    assert (body == gray.ravel()).all()


def test_bmp_decode_exact_with_padding():
    gray = np.arange(15, dtype=np.uint8).reshape(3, 5)  # stride 15→16 pad
    kind, w, h, nf, sr, body = _decode_payload(_bmp_bytes(5, 3, gray))
    assert (kind, w, h) == ("image", 5, 3)
    assert (body == gray.ravel()).all()


def test_wav_decode_pcm16():
    sr = 8000
    samples = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    kind, w, h, nf, got_sr, body = _decode_payload(_wav_bytes(sr, samples))
    assert (kind, got_sr) == ("audio", sr)
    want = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
    assert (body == want).all()


def test_compressed_codec_raises_clear_error():
    if importlib.util.find_spec("PIL") is not None:
        pytest.skip("PIL installed: compressed codecs decode via the real path")
    with pytest.raises(NotImplementedError, match="compressed codecs"):
        _decode_payload(b"\x89PNG\r\n\x1a\nxxxxxxxx")


def test_pil_path():
    """With Pillow installed the compressed path is REAL: PNG → grayscale
    byte plane with correct dims (importorskip'd — PIL absent here)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(arr, mode="L").save(buf, format="PNG")
    kind, w, h, nf, sr, body = _decode_payload(buf.getvalue())
    assert (kind, w, h) == ("image", 9, 5)
    assert (body == arr.ravel()).all()


def test_real_containers_end_to_end_spark(spark):
    rng = np.random.default_rng(3)
    payloads = [
        _ppm_bytes(6, 6, rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)),
        _pgm_bytes(8, 4, rng.integers(0, 256, (4, 8), dtype=np.uint8)),
        _bmp_bytes(5, 5, rng.integers(0, 256, (5, 5), dtype=np.uint8)),
        _wav_bytes(16000, rng.integers(-3000, 3000, 1600).astype(np.int16)),
    ]
    rows = [
        (i, "image" if i < 3 else "audio", p, (None, None, None, None, "real"))
        for i, p in enumerate(payloads)
    ]
    media = spark.createDataFrame(pd.DataFrame(rows, columns=MEDIA_SCHEMA.names), MEDIA_SCHEMA)
    feats = extract_media_features(media).orderBy("media_id").toPandas()
    assert len(feats) == 4
    assert feats["kind"].tolist() == ["image", "image", "image", "audio"]
    assert (feats["byte_mean"] > 0).all()
    assert all(abs(sum(hist) - 1.0) < 1e-9 for hist in feats["histogram"])
