"""Codec round-trip identity — bit-exact (FIXTURES.md §5), plus the
hypothesis property sweep."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tsforge_spark.codec.gorilla import (
    decode_series,
    decode_timestamps,
    decode_values,
    encode_series,
    encode_timestamps,
    encode_values,
)


def _bits(a: np.ndarray) -> np.ndarray:
    return a.view(np.uint64)


def roundtrip(ts, vals):
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    t2, v2 = decode_series(encode_series(ts, vals))
    assert np.array_equal(t2, ts)
    assert np.array_equal(_bits(v2), _bits(vals))


def test_empty_and_tiny():
    roundtrip([], [])
    roundtrip([7], [3.14])
    roundtrip([7, 8], [3.14, 3.14])
    roundtrip([0, 60_000_000, 120_000_000], [1.0, 2.0, 3.0])


def test_specials():
    roundtrip([0, 1, 2, 3], [np.nan, np.inf, -np.inf, -0.0])
    roundtrip([0, 10, 11, 50], [1e300, -1e-300, 0.0, 7.0])


def test_regular_minute_series():
    rng = np.random.default_rng(42)
    n = 5000
    ts = np.arange(n, dtype=np.int64) * 60_000_000
    vals = rng.poisson(3, n).astype(np.float64)
    blob = encode_series(ts, vals)
    roundtrip(ts, vals)
    # regular cadence + small ints must compress well (>2.5x)
    assert len(blob) < n * 16 / 2.5


def test_constant_series_compresses_hard():
    n = 1000
    ts = np.arange(n, dtype=np.int64) * 60_000_000
    vals = np.full(n, 42.5)
    blob = encode_series(ts, vals)
    # ~2 bytes per point (1 control byte per stream, empty payloads)
    assert len(blob) < n * 3


def test_value_stream_alone():
    rng = np.random.default_rng(7)
    v = np.cumsum(rng.normal(size=777)) * 1e6
    c, p, first = encode_values(v)
    out = decode_values(c, p, first, len(v))
    assert np.array_equal(_bits(out), _bits(v))


def test_timestamp_stream_alone():
    rng = np.random.default_rng(7)
    ts = np.cumsum(rng.integers(1, 10_000_000, size=777)).astype(np.int64)
    c, p, ft, fd = encode_timestamps(ts)
    out = decode_timestamps(c, p, ft, fd, len(ts))
    assert np.array_equal(out, ts)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**52), max_value=2**52), min_size=0, max_size=60),
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=60,
    ),
)
def test_property_roundtrip(ts_deltas, vals):
    n = min(len(ts_deltas), len(vals))
    ts = np.cumsum(np.asarray(ts_deltas[:n], dtype=np.int64))
    roundtrip(ts, vals[:n])
