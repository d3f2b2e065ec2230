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


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # chunk length
            st.sampled_from(["poisson", "const", "neg", "zero", "walk"]),
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=2**31),
)
def test_batch_encoder_bytes_identical_to_per_chunk(chunks, seed):
    """encode_blobs_batch (the sole production encode path) must emit
    bytes IDENTICAL to the per-chunk assemble_blob(encode_timestamps(...))
    composition, over random chunkings / value shapes — the property the
    batch-encoder docstring claims."""
    from tsforge_spark.codec.gorilla import assemble_blob, encode_blobs_batch

    rng = np.random.default_rng(seed)
    ts_parts, val_parts, starts, ends = [], {"m0": [], "m1": []}, [], []
    off = 0
    for n, shape in chunks:
        ts = np.cumsum(rng.integers(1, 10_000_000, size=n)).astype(np.int64)
        if shape == "poisson":
            v0 = rng.poisson(3, n).astype(np.float64)
        elif shape == "const":
            v0 = np.full(n, 42.5)
        elif shape == "neg":
            v0 = -rng.integers(0, 100, size=n).astype(np.float64)
        elif shape == "zero":
            v0 = np.zeros(n)
        else:
            v0 = np.cumsum(rng.normal(size=n)) * 1e6
        v1 = rng.normal(size=n) * 10
        ts_parts.append(ts)
        val_parts["m0"].append(v0)
        val_parts["m1"].append(v1)
        starts.append(off)
        ends.append(off + n)
        off += n
    ts_all = np.concatenate(ts_parts)
    vals = {m: np.concatenate(p) for m, p in val_parts.items()}
    got = encode_blobs_batch(
        ts_all, np.asarray(starts), np.asarray(ends), vals
    )
    for m in vals:
        for j, (s, e) in enumerate(zip(starts, ends)):
            want = assemble_blob(
                encode_timestamps(ts_all[s:e]), vals[m][s:e]
            )
            assert got[m][j] == want, (m, j, chunks)


@settings(deadline=None, max_examples=60)
@given(
    st.lists(
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=40,
    ),
    st.randoms(use_true_random=False),
)
def test_decode_blobs_many_matches_scalar_decode(sizes, rnd):
    """The batch (segmented-scan) decoder must agree bit-for-bit with
    the per-blob scalar decoder on arbitrary blob mixes — including
    runs of n==1 blobs at the head (the empty-delta-segment edge)."""
    from tsforge_spark.codec.gorilla import decode_blobs_many

    rng = np.random.default_rng(rnd.randrange(2**32))
    blobs, ref = [], []
    for n in sizes:
        ts = np.cumsum(rng.integers(1, 10_000_000, size=n)).astype(
            np.int64
        )
        vals = np.where(
            rng.random(n) < 0.4,
            rng.integers(-3, 3, n).astype(np.float64),
            rng.normal(0, 1e8, n),
        )
        blobs.append(encode_series(ts, vals))
        ref.append((ts, vals))
    out_ts, out_vals, lens = decode_blobs_many(blobs)
    assert (lens == np.array([len(t) for t, _ in ref])).all()
    assert (out_ts == np.concatenate([t for t, _ in ref])).all()
    want = np.concatenate([v for _, v in ref])
    assert (out_vals.view(np.uint64) == want.view(np.uint64)).all()
    # and each blob individually agrees with decode_series
    p = 0
    for b, (ts, vals) in zip(blobs, ref):
        dt, dv = decode_series(b)
        assert (dt == out_ts[p : p + len(ts)]).all()
        assert (
            dv.view(np.uint64)
            == out_vals[p : p + len(ts)].view(np.uint64)
        ).all()
        p += len(ts)


def test_decode_blobs_many_all_singletons():
    """Regression: a batch where EVERY blob has n==1 leaves the delta
    stream empty — the segmented-cumsum prefix gather must not index
    into the empty array (np.where evaluates both branches)."""
    from tsforge_spark.codec.gorilla import decode_blobs_many

    blobs = [
        encode_series(
            np.array([10**15 + i], dtype=np.int64),
            np.array([float(i)]),
        )
        for i in range(100)
    ]
    ts, vals, lens = decode_blobs_many(blobs)
    assert (lens == 1).all()
    assert (ts == 10**15 + np.arange(100)).all()
    assert (vals == np.arange(100.0)).all()


def test_decode_chunk_split_covers_all_rows_once():
    """The byte-bounded splitter must partition the frame exactly —
    every row once, in order — for hostile size mixes (one giant blob,
    runs of tiny blobs, cap smaller than a single blob)."""
    import pandas as pd

    from tsforge_spark.codec.blobs import _split_by_bytes

    rng = np.random.default_rng(9)
    for sizes in (
        [10, 10, 10_000, 10, 10],
        [50_000],
        list(rng.integers(1, 5_000, 200)),
        [1] * 50,
    ):
        pdf = pd.DataFrame(
            {"i": range(len(sizes)), "blob": [b"x" * s for s in sizes]}
        )
        for cap in (1, 100, 7_000, 10**9):
            parts = list(_split_by_bytes(pdf, cap))
            got = pd.concat(parts, ignore_index=True)
            assert got["i"].tolist() == list(range(len(sizes))), (
                sizes, cap,
            )
            assert all(len(p) >= 1 for p in parts)


def test_encode_bucket_count_scales_with_cells_hint():
    """The encode group count must grow with the bounded cell count so
    per-group pandas frames stay ~2M cells at any data scale, while
    small inputs keep the 4-waves-per-core default."""
    from tsforge_spark.codec.blobs import _default_n_buckets

    assert _default_n_buckets(32, None) == 128
    assert _default_n_buckets(32, 1_000_000) == 128  # small: unchanged
    assert _default_n_buckets(32, 10_000_000_000) == 5_000
    assert _default_n_buckets(2, None) == 16  # floor
