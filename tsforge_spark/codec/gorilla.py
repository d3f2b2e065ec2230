"""Gorilla-family codecs, vectorized for Spark pandas-UDF execution.

The classic Gorilla paper (Pelkonen et al., VLDB'15) encodes floats as
XOR-with-previous plus leading/trailing-zero windows, and timestamps as
delta-of-delta, in one sequential bitstream.  A bit-sequential loop is
per-row Python — forbidden on our hot path (BASELINE.json north rule) and
numba is unavailable here.  We therefore use a **stream-split, byte-aligned
variant** of the same two schemes (precedent: Parquet BYTE_STREAM_SPLIT,
Chimp128's byte-aligned XOR):

values (float64):
  u[i] = bits(v[i]);  x[i] = u[i] XOR u[i-1]
  control byte  c[i] = (trailing_zero_bytes << 4) | significant_bytes
  payload       the significant bytes of x[i] (little-endian order)
  Controls and payloads are written to two *separate* streams, so decode
  can locate every value with a cumsum over the control stream — a pure
  numpy gather/scatter in both directions.  Identical consecutive values
  cost 1 byte; slowly-varying series cost 3-5 bytes vs 8 raw.

timestamps (int64 µs):
  d[i] = ts[i] − ts[i-1];  dod[i] = d[i] − d[i-1];  z = zigzag(dod)
  control byte = number of significant low bytes of z; same stream split.
  Regular cadence (constant delta) costs 1 byte per point.

Blob layout (all little-endian)::

    magic 'TSG1' | u32 n | i64 first_ts | i64 first_delta | u64 first_val_bits
    | u32 ts_payload_len | u32 val_payload_len
    | ts_controls (n-2 bytes) | ts_payload | val_controls (n-1) | val_payload

The reference has no compression at all (SURVEY.md §2.9 "absent"); this is
the north-rule addition.  Round-trip is bit-exact (tests/test_codec.py).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"TSG1"
_HEADER = struct.Struct("<4sIqqQII")
_HDR_DTYPE = np.dtype(
    [
        ("magic", "S4"),
        ("n", "<u4"),
        ("first_ts", "<i8"),
        ("first_delta", "<i8"),
        ("first_bits", "<u8"),
        ("tp_len", "<u4"),
        ("vp_len", "<u4"),
    ]
)


def _pack_bytes(b: np.ndarray, tz: np.ndarray, sl: np.ndarray) -> np.ndarray:
    """Gather significant bytes [tz, tz+sl) from each row of the (n,8)
    little-endian byte matrix ``b`` into one contiguous payload array."""
    n = len(sl)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sl, out=offs[1:])
    total = int(offs[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint8)
    row_idx = np.repeat(np.arange(n), sl)
    col_idx = np.arange(total) - np.repeat(offs[:-1], sl) + np.repeat(tz, sl)
    return b[row_idx, col_idx]


def _unpack_bytes(payload: np.ndarray, tz: np.ndarray, sl: np.ndarray) -> np.ndarray:
    """Inverse of `_pack_bytes`: scatter payload back into an (n,8) zero
    matrix and return the uint64 view."""
    n = len(sl)
    out = np.zeros((n, 8), dtype=np.uint8)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sl, out=offs[1:])
    total = int(offs[-1])
    if total:
        row_idx = np.repeat(np.arange(n), sl)
        col_idx = np.arange(total) - np.repeat(offs[:-1], sl) + np.repeat(tz, sl)
        out[row_idx, col_idx] = payload[:total]
    return out.view("<u8").ravel()


def _significance(x: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-value (byte_matrix, trailing_zero_bytes, significant_len)."""
    b = x.view("<u8").reshape(-1, 1).view(np.uint8).reshape(-1, 8)
    nz = b != 0
    any_nz = nz.any(axis=1)
    first = np.argmax(nz, axis=1).astype(np.int64)
    last = (7 - np.argmax(nz[:, ::-1], axis=1)).astype(np.int64)
    tz = np.where(any_nz, first, 0)
    sl = np.where(any_nz, last - first + 1, 0)
    return b, tz, sl


def encode_values(v: np.ndarray) -> tuple[bytes, bytes, np.uint64]:
    """XOR-encode float64 array → (controls, payload, first_value_bits)."""
    u = np.ascontiguousarray(v, dtype=np.float64).view("<u8")
    if len(u) == 0:
        return b"", b"", np.uint64(0)
    x = u[1:] ^ u[:-1]
    b, tz, sl = _significance(x)
    ctrl = ((tz.astype(np.uint8) << 4) | sl.astype(np.uint8)).tobytes()
    payload = _pack_bytes(b, tz, sl).tobytes()
    return ctrl, payload, u[0]


def decode_values(ctrl: bytes, payload: bytes, first_bits: np.uint64, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.float64)
    c = np.frombuffer(ctrl, dtype=np.uint8)
    tz = (c >> 4).astype(np.int64)
    sl = (c & 0x0F).astype(np.int64)
    x = _unpack_bytes(np.frombuffer(payload, dtype=np.uint8), tz, sl)
    u = np.empty(n, dtype=np.uint64)
    u[0] = first_bits
    u[1:] = x
    np.bitwise_xor.accumulate(u, out=u)
    return u.view(np.float64)


def _zigzag(d: np.ndarray) -> np.ndarray:
    return ((d << 1) ^ (d >> 63)).view(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    zi = z.view(np.int64)
    return (z >> np.uint64(1)).view(np.int64) ^ -(zi & 1)


def encode_timestamps(ts: np.ndarray) -> tuple[bytes, bytes, int, int]:
    """Delta-of-delta encode int64 µs timestamps →
    (controls, payload, first_ts, first_delta)."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    first_ts = int(t[0]) if n else 0
    first_delta = int(t[1] - t[0]) if n > 1 else 0
    if n < 3:
        return b"", b"", first_ts, first_delta
    d = np.diff(t)
    dod = d[1:] - d[:-1]
    z = _zigzag(dod)
    b, _, _ = _significance(z)
    # zigzag values are low-byte significant: tz is 0, sl = index of last
    # nonzero byte + 1.
    nz = b != 0
    any_nz = nz.any(axis=1)
    sl = np.where(any_nz, 8 - np.argmax(nz[:, ::-1], axis=1).astype(np.int64), 0)
    tz = np.zeros(len(sl), dtype=np.int64)
    ctrl = sl.astype(np.uint8).tobytes()
    payload = _pack_bytes(b, tz, sl).tobytes()
    return ctrl, payload, first_ts, first_delta


def decode_timestamps(ctrl: bytes, payload: bytes, first_ts: int, first_delta: int, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    out[0] = first_ts
    if n == 1:
        return out
    if n == 2:
        out[1] = first_ts + first_delta
        return out
    sl = np.frombuffer(ctrl, dtype=np.uint8).astype(np.int64)
    tz = np.zeros(len(sl), dtype=np.int64)
    z = _unpack_bytes(np.frombuffer(payload, dtype=np.uint8), tz, sl)
    dod = _unzigzag(z)
    d = np.empty(n - 1, dtype=np.int64)
    d[0] = first_delta
    d[1:] = dod
    np.cumsum(d, out=d)  # delta-of-delta prefix → per-step deltas
    np.cumsum(d, out=d)  # deltas prefix → offsets from first_ts
    out[1:] = first_ts + d
    return out


def encode_series(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one (timestamps µs, float64 values) series chunk to a blob."""
    assert len(ts_us) == len(values)
    return assemble_blob(encode_timestamps(ts_us), values)


def assemble_blob(
    ts_parts: tuple[bytes, bytes, int, int], values: np.ndarray
) -> bytes:
    """Build a blob from pre-encoded timestamp streams + raw values —
    lets multi-measure encoders pay the timestamp encode once per chunk."""
    tc, tp, first_ts, first_delta = ts_parts
    n = len(values)
    vc, vp, first_bits = encode_values(values)
    header = _HEADER.pack(
        _MAGIC, n, first_ts, first_delta, int(first_bits), len(tp), len(vp)
    )
    return b"".join([header, tc, tp, vc, vp])


def decode_series(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a blob → (timestamps int64 µs, values float64)."""
    magic, n, first_ts, first_delta, first_bits, tp_len, vp_len = _HEADER.unpack_from(
        blob, 0
    )
    if magic != _MAGIC:
        raise ValueError("bad blob magic")
    off = _HEADER.size
    tc_len = max(n - 2, 0)
    vc_len = max(n - 1, 0)
    tc = blob[off : off + tc_len]
    off += tc_len
    tp = blob[off : off + tp_len]
    off += tp_len
    vc = blob[off : off + vc_len]
    off += vc_len
    vp = blob[off : off + vp_len]
    ts = decode_timestamps(tc, tp, first_ts, first_delta, n)
    vals = decode_values(vc, vp, np.uint64(first_bits), n)
    return ts, vals


def decode_blobs_many(
    blobs: list,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized multi-blob decode → (timestamps, values, per-blob
    lengths), concatenated in input order — NO per-blob Python.

    Coarse tiers (1h/1d month segments over mostly sub-hour
    conversations) average a point or two per blob, so any per-blob
    fixed cost dominates the decode: the per-blob ``decode_series``
    loop measured ~6µs/blob of header-unpack + slice + frombuffer
    overhead (168k rows/s on the full 1h store), and even a loop
    restricted to n≥3 blobs still capped the batch at ~200k rows/s.
    Here every stage crosses ALL blobs in the Arrow batch at once:

    - headers parse as one structured-dtype view;
    - the per-blob ctrl/payload streams concatenate with one
      fancy-index gather each (``_gather_slices``) and funnel through
      ONE ``_unpack_bytes`` call per stream kind — per-row (tz, sl)
      alignment is preserved because both ctrl bytes and packed
      payload bytes are stored in the same blob order;
    - the XOR value chains and the delta-of-delta timestamp chains
      resolve with SEGMENTED prefix scans: one global
      ``bitwise_xor.accumulate`` / ``cumsum`` plus a per-segment
      prefix fix-up (XOR / subtract the running value just before
      each blob's first element), which turns "per-blob accumulate"
      into three O(total) array ops.
    """
    m = len(blobs)
    if m == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, np.empty(0, dtype=np.float64), empty
    H = _HEADER.size
    blob_lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=m)
    offs = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(blob_lens, out=offs[1:])
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    hdr = np.ascontiguousarray(
        buf[offs[:-1, None] + np.arange(H)]
    ).view(_HDR_DTYPE).reshape(m)
    if not (hdr["magic"] == _MAGIC).all():
        raise ValueError("bad blob magic")
    n = hdr["n"].astype(np.int64)
    if (n == 0).any():  # empty blobs contribute no rows; drop them
        keep = n > 0
        kept = [b for b, k in zip(blobs, keep) if k]
        ts_k, vals_k, lens_k = decode_blobs_many(kept)
        lens = np.zeros(m, dtype=np.int64)
        lens[keep] = lens_k
        return ts_k, vals_k, lens
    first_ts = hdr["first_ts"].astype(np.int64)
    first_delta = hdr["first_delta"].astype(np.int64)
    first_bits = hdr["first_bits"].astype(np.uint64)
    tp_len = hdr["tp_len"].astype(np.int64)
    vp_len = hdr["vp_len"].astype(np.int64)
    tc_len = np.maximum(n - 2, 0)
    vc_len = n - 1  # deltas per blob (n>=1 here)

    off = offs[:-1]
    tc_start = off + H
    tp_start = tc_start + tc_len
    vc_start = tp_start + tp_len
    vp_start = vc_start + vc_len

    total = int(n.sum())
    pos = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(n, out=pos[1:])
    p0 = pos[:-1]
    rest = np.ones(total, dtype=bool)  # non-first positions per blob
    rest[p0] = False

    # ---- values: u[0]=first_bits, u[i]=u[i-1]^x[i-1], via one global
    # XOR scan + per-segment prefix fix
    vc_all = _gather_slices(buf, vc_start, vc_len).astype(np.int64)
    x = _unpack_bytes(
        _gather_slices(buf, vp_start, vp_len), vc_all >> 4, vc_all & 0x0F
    )
    w = np.empty(total, dtype=np.uint64)
    w[p0] = first_bits
    w[rest] = x
    np.bitwise_xor.accumulate(w, out=w)
    pref = np.zeros(m, dtype=np.uint64)
    pref[1:] = w[p0[1:] - 1]
    out_u = w ^ np.repeat(pref, n)

    # ---- timestamps: d = [first_delta, unzigzag(dod)...]; two
    # segmented cumsums (dod → deltas → offsets), then first_ts + offs
    if total == m:  # every blob is a single point — no delta stream
        out_ts = first_ts.copy()
        return out_ts, out_u.view(np.float64), n
    sl_t = _gather_slices(buf, tc_start, tc_len).astype(np.int64)
    z = _unpack_bytes(
        _gather_slices(buf, tp_start, tp_len),
        np.zeros(len(sl_t), dtype=np.int64),
        sl_t,
    )
    dod = _unzigzag(z)
    nd = vc_len  # segment lengths of the delta stream (n-1)
    totd = total - m
    dpos = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(nd, out=dpos[1:])
    q0 = dpos[:-1][nd > 0]  # position of each blob's first delta
    d = np.empty(totd, dtype=np.int64)
    d[q0] = first_delta[nd > 0]
    drest = np.ones(totd, dtype=bool)
    drest[q0] = False
    d[drest] = dod
    for _ in range(2):  # dod→deltas, then deltas→offsets from first_ts
        np.cumsum(d, out=d)
        # subtract the running sum up to the previous segment's end;
        # dpos[j]==0 means every earlier segment was empty (n==1
        # blobs), where the prefix is 0 — NOT d[-1]
        base = np.zeros(m, dtype=np.int64)
        if m > 1:
            idx = dpos[1:-1]
            base[1:] = np.where(idx > 0, d[idx - 1], 0)
        d = d - np.repeat(base, nd)
    out_ts = np.empty(total, dtype=np.int64)
    out_ts[p0] = first_ts
    out_ts[rest] = np.repeat(first_ts, nd) + d
    return out_ts, out_u.view(np.float64), n


def _gather_slices(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Concatenate variable-length ``buf[starts[i]:starts[i]+lens[i]]``
    slices.

    Two regimes: many TINY slices (coarse tiers, ~1 point/blob) use one
    fancy-index gather — no per-slice Python; fewer LONG slices (dense
    1m day segments, ~1.4k points/blob) use per-slice views + one
    concatenate, because the index array costs 8 bytes per payload
    BYTE and would dwarf the payload itself (a 64k-blob dense batch
    would materialize a multi-GB index for a ~700MB payload)."""
    tot = int(lens.sum())
    if tot == 0:
        return np.empty(0, dtype=np.uint8)
    if tot >= 32 * len(lens):
        sl = starts.tolist()
        ll = lens.tolist()
        return np.concatenate(
            [buf[s : s + l] for s, l in zip(sl, ll)]
        )
    co = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=co[1:])
    idx = np.repeat(starts - co, lens) + np.arange(tot, dtype=np.int64)
    return buf[idx]


def encode_blobs_batch(
    ts_all: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    vals_by_measure: dict[str, np.ndarray],
) -> dict[str, list[bytes]]:
    """Encode MANY series chunks in one vectorized pass.

    ``ts_all``/``vals_by_measure[m]`` hold B chunks back-to-back;
    ``starts[j]:ends[j]`` delimits chunk j.  Produces bytes IDENTICAL to
    per-chunk ``assemble_blob(encode_timestamps(...), ...)`` (pinned by
    a property test) but runs the diff/zigzag/significance/pack numpy
    work ONCE over all rows instead of ~15 numpy calls per chunk — the
    per-blob cost collapses to a header pack + four slices, which is
    what makes millions of tiny tier-cells-per-conversation blobs
    encodable without per-group overhead dominating (tier cells at 1h/1d
    grain average only a few points per segment).

    Returns {measure: [blob_j bytes, ...]} in chunk order."""
    ts_all = np.ascontiguousarray(ts_all, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    n_tot = len(ts_all)
    lens = ends - starts
    n_blobs = len(starts)
    pos = np.arange(n_tot, dtype=np.int64) - np.repeat(starts, lens)

    # ---- shared timestamp streams ----
    first_ts = ts_all[starts]
    has2 = lens > 1
    first_delta = np.zeros(n_blobs, dtype=np.int64)
    first_delta[has2] = ts_all[starts[has2] + 1] - ts_all[starts[has2]]
    # dod entries: elements with pos >= 2 (second difference stays inside
    # the chunk by construction)
    t_mask = pos >= 2
    t_idx = np.flatnonzero(t_mask)
    dod = ts_all[t_idx] - 2 * ts_all[t_idx - 1] + ts_all[t_idx - 2]
    z = _zigzag(dod)
    zb = z.reshape(-1, 1).view(np.uint8).reshape(-1, 8)
    nz = zb != 0
    any_nz = nz.any(axis=1)
    t_sl = np.where(
        any_nz, 8 - np.argmax(nz[:, ::-1], axis=1).astype(np.int64), 0
    )
    t_tz = np.zeros(len(t_sl), dtype=np.int64)
    ts_ctrl = t_sl.astype(np.uint8).tobytes()
    ts_payload = _pack_bytes(zb, t_tz, t_sl).tobytes()
    # per-blob stream offsets
    t_counts = np.maximum(lens - 2, 0)
    tc_off = np.zeros(n_blobs + 1, dtype=np.int64)
    np.cumsum(t_counts, out=tc_off[1:])
    t_csl = np.zeros(len(t_sl) + 1, dtype=np.int64)
    np.cumsum(t_sl, out=t_csl[1:])
    tp_off = t_csl[tc_off]

    # ---- per-measure value streams ----
    out: dict[str, list[bytes]] = {}
    v_mask = pos >= 1
    v_idx = np.flatnonzero(v_mask)
    v_counts = np.maximum(lens - 1, 0)
    vc_off = np.zeros(n_blobs + 1, dtype=np.int64)
    np.cumsum(v_counts, out=vc_off[1:])
    header_pack = _HEADER.pack
    for m, vals in vals_by_measure.items():
        u = np.ascontiguousarray(vals, dtype=np.float64).view("<u8")
        x = u[v_idx] ^ u[v_idx - 1]
        b, tz, sl = _significance(x)
        val_ctrl = ((tz.astype(np.uint8) << 4) | sl.astype(np.uint8)).tobytes()
        val_payload = _pack_bytes(b, tz, sl).tobytes()
        v_csl = np.zeros(len(sl) + 1, dtype=np.int64)
        np.cumsum(sl, out=v_csl[1:])
        vp_off = v_csl[vc_off]
        first_bits = u[starts]
        blobs = []
        for j in range(n_blobs):
            tc = ts_ctrl[tc_off[j]: tc_off[j + 1]]
            tp = ts_payload[tp_off[j]: tp_off[j + 1]]
            vc = val_ctrl[vc_off[j]: vc_off[j + 1]]
            vp = val_payload[vp_off[j]: vp_off[j + 1]]
            header = header_pack(
                _MAGIC, int(lens[j]), int(first_ts[j]), int(first_delta[j]),
                int(first_bits[j]), len(tp), len(vp),
            )
            blobs.append(b"".join((header, tc, tp, vc, vp)))
        out[m] = blobs
    return out
