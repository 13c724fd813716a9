"""Bit-exact roundtrip tests for the Gorilla/delta-of-delta codec."""

import numpy as np
import pytest

from series_correction_project_updated_spark.functions.compress import (
    decode_chunk,
    encode_chunk,
)


@pytest.mark.parametrize("n", [1, 2, 3, 100, 1000])
def test_roundtrip_regular(n):
    ts = np.arange(n, dtype=np.int64) * 60 + 1_577_836_800
    vals = np.sin(np.arange(n) / 5.0) * 100 + 3.0
    payload = encode_chunk(ts, vals)
    ts2, vals2 = decode_chunk(payload)
    np.testing.assert_array_equal(ts, ts2)
    np.testing.assert_array_equal(vals.view(np.uint64), vals2.view(np.uint64))


def test_roundtrip_irregular_and_nan():
    rng = np.random.default_rng(42)
    ts = np.cumsum(rng.integers(1, 100000, 500)).astype(np.int64)
    vals = rng.normal(0, 1e6, 500)
    vals[::37] = np.nan
    vals[::53] = 0.0
    vals[7] = np.inf
    vals[11] = -np.inf
    payload = encode_chunk(ts, vals)
    ts2, vals2 = decode_chunk(payload)
    np.testing.assert_array_equal(ts, ts2)
    np.testing.assert_array_equal(vals.view(np.uint64), vals2.view(np.uint64))


def test_roundtrip_constant_values():
    ts = np.arange(100, dtype=np.int64) * 3600
    vals = np.full(100, 42.5)
    payload = encode_chunk(ts, vals)
    ts2, vals2 = decode_chunk(payload)
    np.testing.assert_array_equal(vals, vals2)
    # constants compress to ~1 bit/point after the first
    assert len(payload) < 16 + 8 + 8 + 8 + 100 // 8 + 24


def test_compression_ratio_on_regular_rollup():
    # regular 60s buckets, smooth values: must beat 4 bytes/point easily
    n = 10_000
    ts = np.arange(n, dtype=np.int64) * 60
    vals = np.round(np.sin(np.arange(n) / 50.0) * 10 + 100, 2)
    payload = encode_chunk(ts, vals)
    assert len(payload) / n < 8.0  # vs 16 bytes raw (ts+value)

def test_negative_timestamps_and_deltas():
    ts = np.array([-1000, -500, -499, 0, 1, 1000000], dtype=np.int64)
    vals = np.array([1.5, -2.5, 3.5, -4.5, 5.5, 0.0])
    ts2, vals2 = decode_chunk(encode_chunk(ts, vals))
    np.testing.assert_array_equal(ts, ts2)
    np.testing.assert_array_equal(vals, vals2)
