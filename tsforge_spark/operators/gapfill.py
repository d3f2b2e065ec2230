"""Gap filling — Spark realization of ``fill_gaps_plus``.

Reference semantics (``src/tsforge/preprocessing/fill_gaps.py:6-111`` and
the demo variant ``src/tsforge/workflows/nixtla_demo.py:45-123``):

- per-id complete grid from each series' own min..max at a fixed freq;
- target fill ∈ {zero, nan, mean, median};
- static covariates replicated into gap rows (dedup + join,
  ``fill_gaps.py:76-81``);
- dynamic covariates filled ∈ {zero, ffill, interpolate, nan}
  (``fill_gaps.py:91-104``).

Interpolation edge semantics differ between the two reference code paths
(SURVEY.md §7.4.5) and both are preserved:

- ``method="pandas"`` = ``Series.interpolate()``: leading gaps stay null,
  trailing gaps carry the last value forward (``fill_gaps.py:99-100``);
- ``method="clamp"``  = ``np.interp``: both edges clamp to the nearest
  known value (``nixtla_demo.py:485-489``).

Two implementations with identical results (tested against each other):
``use_udf=False`` is pure column expressions (locf window + lead-side
locf + linear formula — oracle-checkable in ANSI SQL); ``use_udf=True``
runs vectorized numpy inside ``applyInPandas`` per series — the
north-rule hot path (no per-row Python; Arrow batches end-to-end).

Scale note: the grid explode multiplies rows by (span/freq)/n_obs; the
join back to actuals is on ``(id, bucket)`` with both sides partitioned by
id — co-partitioned sort-merge, no broadcast needed.  Window fills are
per-id ordered windows: one shuffle on id shared by every fill column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


_FREQ_INTERVAL = {
    "1m": "interval 1 minute",
    "1h": "interval 1 hour",
    "1d": "interval 1 day",
    "1w": "interval 7 days",
}
_FREQ_US = {"1m": 60e6, "1h": 3600e6, "1d": 86400e6, "1w": 7 * 86400e6}


def complete_grid(
    df: DataFrame, id_col: str, time_col: str, freq: str,
    spread: bool = True,
) -> DataFrame:
    """Per-id dense bucket grid over each series' own [min, max] span —
    ``sequence() + explode`` (SURVEY.md §2.9); the timestamps must already
    be bucket-aligned (use ``bucket_expr`` first).

    Fine grids (1m / 1h) explode in TWO levels — days, then buckets
    within each day clipped to [lo, hi] — so the per-row materialized
    array never exceeds one day (1440 / 24 elements).  A single-level
    ``sequence(lo, hi)`` builds the whole span as one array per series
    (a multi-year 1m series is a ~4MB array in every grid row's
    intermediate), which does not survive the long-history tail at
    scale.  Both _lo/_hi and the day boundaries are freq-aligned, so
    the union of per-day sequences is exactly the single-level
    sequence."""
    from tsforge_spark.operators.partitioning import kernel_repartition

    spans = df.groupBy(id_col).agg(
        F.min(time_col).alias("_lo"), F.max(time_col).alias("_hi")
    )
    # The spans table is tiny (one row per series), so AQE coalesces its
    # exchange to one-or-two partitions by BYTES — and the explode below
    # then fans a row-per-series input out to the FULL grid inside that
    # same task layout.  Everything downstream that needs no new shuffle
    # (per-id window sorts, broadcast-join probes, partial aggregates)
    # inherits the near-serial layout: measured at sf1.0, perm_entropy's
    # 10.5M-row sort+window ran on ~1 task for 7.3s and missing_hours'
    # anti-join for 4.2s.  A user-numbered hash repartition on the id —
    # 2·cores+1, exempt from AQE coalescing, pennies to shuffle at one
    # row per series — pins the explode's parallelism at any scale
    # (series count >> partitions) while per-id locality is preserved
    # for every downstream window/groupBy.
    #
    # ``spread=False`` opts a consumer out (mirrors catalog._hourly):
    # right when the downstream is one window pass over the grid rows —
    # the generate emits each id's buckets contiguously in time order,
    # so the window's sort rides nearly-sorted runs and stays cheap
    # even in the coalesced layout (r7-shape measured 0.6-0.75s at
    # sf1.0-scale for the six grid+join catalog consumers), while the
    # spread's 65-task scheduling across every downstream stage costs
    # +0.09-0.17s per query at sf0.1 (clean-window full-catalog A/B,
    # controls flat).  Keep the default — the scale-safe choice — for
    # heavy-probe consumers (missing_hours' anti-join of the full
    # grid: 4.2s serial → parallel at sf1.0) and generic callers.
    if spread:
        spans = kernel_repartition(spans, id_col)
    if freq in ("1m", "1h"):
        # The chunk windows are PHYSICAL 24h spans anchored at _lo in
        # pure microsecond arithmetic — window k covers
        # [lo + k·24h, lo + (k+1)·24h).  NOT calendar days: date_trunc
        # and interval-day steps are session-timezone dependent, and
        # under a DST-shifting zone the union of calendar-day sequences
        # does not equal the single-level sequence (probed:
        # America/New_York across both 2025 DST transitions); anchoring
        # at _lo rather than the epoch also keeps buckets whose PHASE
        # is not :00-aligned exact (a +05:30 session truncates hours to
        # :30 physical offsets).  Window starts are lo + multiples of
        # 24h ≡ lo (mod any sub-day step), so the clipped per-window
        # sequences union to exactly the single-level grid in ANY
        # session timezone.
        step = _FREQ_INTERVAL[freq]
        step_us = int(_FREQ_US[freq])
        day_us = 86_400_000_000
        days = spans.select(
            F.col(id_col),
            "_lo",
            "_hi",
            F.explode(
                F.expr(
                    f"sequence(0L, (unix_micros(_hi) - unix_micros(_lo))"
                    f" div {day_us})"
                )
            ).alias("_k"),
        )
        win = f"(unix_micros(_lo) + _k * {day_us})"
        return days.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"sequence("
                    f"timestamp_micros({win}), "
                    f"timestamp_micros(least({win} + {day_us - step_us}, "
                    f"unix_micros(_hi))), {step})"
                )
            ).alias(time_col),
        )
    return spans.select(
        F.col(id_col),
        F.explode(
            F.expr(f"sequence(_lo, _hi, {_FREQ_INTERVAL[freq]})")
        ).alias(time_col),
    )


def zero_filled_series(
    df: DataFrame, id_col: str, time_col: str, value_col: str, freq: str
) -> DataFrame:
    """Dense per-id series: ``value_col`` at observed buckets, 0 at every
    missing bucket of the series' own [min, max] span — row-identical to
    ``complete_grid(...).join(df, left) + coalesce(value, 0)`` (pinned by
    ``test_zero_filled_series_matches_grid_join``), built in ONE pass.

    Each observation explodes the run [bucket, next_bucket) — its own
    bucket carrying the value, the gap carrying zeros — so there is no
    spans aggregate, no second aggregate subtree for the join side, and
    no broadcast hash relation over the full tier (round-8 measurement
    at sf1.0: the join-based zero-fill spent ~1.4s building a 950k-row
    broadcast and ~0.7s recomputing the tier for the second subtree;
    perm_entropy over this operator runs 2.1s → 0.7s).

    Gap runs explode in day chunks exactly like ``complete_grid`` (the
    per-row array stays ≤ one day of buckets however long the gap), and
    all window arithmetic is physical microseconds anchored at each
    row's own bucket — the same DST/phase-exactness argument as the
    grid's (see complete_grid's note)."""
    w = Window.partitionBy(id_col).orderBy(time_col)
    step_us = int(_FREQ_US[freq])
    day_us = 86_400_000_000
    # run end = the bucket just before the next observation (the last
    # row's run is itself)
    base = df.select(
        F.col(id_col), F.col(time_col), F.col(value_col)
    ).withColumn(
        "_end_us",
        F.coalesce(
            F.unix_micros(F.lead(time_col).over(w).cast("timestamp"))
            - F.lit(step_us),
            F.unix_micros(F.col(time_col).cast("timestamp")),
        ),
    )
    t_us = f"unix_micros(cast({time_col} as timestamp))"
    days = base.withColumn(
        "_k",
        F.explode(
            F.expr(f"sequence(0L, (_end_us - {t_us}) div {day_us})")
        ),
    )
    win = f"({t_us} + _k * {day_us})"
    bucket2 = F.expr(
        f"explode(sequence(timestamp_micros({win}), "
        f"timestamp_micros(least({win} + {day_us - step_us}, _end_us)), "
        f"{_FREQ_INTERVAL[freq]}))"
    )
    out = days.select(
        F.col(id_col), F.col(value_col), F.col(time_col).alias("_t0"),
        bucket2.alias(time_col),
    )
    return out.select(
        F.col(id_col),
        F.col(time_col),
        F.when(F.col(time_col) == F.col("_t0"), F.col(value_col))
        .otherwise(F.lit(0))
        .alias(value_col),
    )


def locf(df: DataFrame, cols: list[str], id_col: str, time_col: str) -> DataFrame:
    """Per-id forward fill: ``F.last(ignorenulls=True)`` over an
    unbounded-preceding window (``fill_gaps.py:97-98``)."""
    w = (
        Window.partitionBy(id_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def _interp_exprs(df: DataFrame, col: str, id_col: str, time_col: str, method: str) -> DataFrame:
    """Pure-SQL linear interpolation: locf of (last value, its ts) +
    reverse locf of (next value, its ts) + the linear formula."""
    wb = (
        Window.partitionBy(id_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(id_col)
        .orderBy(time_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = F.unix_micros(F.col(time_col))
    known_ts = F.when(F.col(col).isNotNull(), t)
    prev_v = F.last(col, ignorenulls=True).over(wb)
    prev_t = F.last(known_ts, ignorenulls=True).over(wb)
    next_v = F.first(col, ignorenulls=True).over(wf)
    next_t = F.first(known_ts, ignorenulls=True).over(wf)
    interior = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    if method == "pandas":
        edge = F.when(prev_v.isNull(), F.lit(None).cast("double")).otherwise(prev_v)
    elif method == "clamp":
        edge = F.coalesce(prev_v, next_v)
    else:
        raise ValueError(f"unknown interpolation method: {method}")
    filled = (
        F.when(F.col(col).isNotNull(), F.col(col))
        .when(prev_v.isNotNull() & next_v.isNotNull(), interior)
        .otherwise(edge)
    )
    return df.withColumn(col, filled)


def _interp_udf(df: DataFrame, col: str, id_col: str, time_col: str, method: str) -> DataFrame:
    """Vectorized per-series interpolation inside ``applyInPandas`` —
    numpy on whole Arrow batches, never per-row Python."""
    schema = df.schema

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="mergesort")
        y = pdf[col].to_numpy(dtype=np.float64)
        mask = ~np.isnan(y)
        if mask.any() and not mask.all():
            t = pdf[time_col].to_numpy("datetime64[us]").astype(np.int64)
            yi = np.interp(t, t[mask], y[mask])  # clamps both edges
            if method == "pandas":
                first = np.argmax(mask)
                yi[:first] = np.nan  # leading gaps stay null
            y = np.where(mask, y, yi)
            pdf = pdf.assign(**{col: y})
        return pdf

    from tsforge_spark.operators.partitioning import kernel_repartition

    # pin kernel-stage parallelism (see operators/partitioning.py —
    # AQE's bytes-based coalescing serializes small-bytes kernel fleets)
    return (
        kernel_repartition(df, id_col)
        .groupBy(id_col)
        .applyInPandas(fill, schema=schema)
    )


def fill_gaps(
    df: DataFrame,
    id_col: str,
    time_col: str,
    freq: str,
    target_col: str | None = None,
    target_fill: str = "zero",
    static_cols: list[str] | None = None,
    dynamic_fill: dict[str, str] | None = None,
    method: str = "pandas",
    use_udf: bool = False,
) -> DataFrame:
    """Full ``fill_gaps_plus`` equivalent (see module docstring).

    ``target_fill`` ∈ {zero, nan, mean, median, locf, interpolate};
    ``dynamic_fill`` maps column → {zero, ffill, interpolate, nan}.
    Input timestamps must be bucket-aligned to ``freq``.
    """
    static_cols = static_cols or []
    dynamic_fill = dynamic_fill or {}

    grid = complete_grid(df.select(id_col, time_col), id_col, time_col, freq)
    out = grid.join(df, [id_col, time_col], "left")

    # Replicate static covariates into gap rows: dedup per id + join
    # (``fill_gaps.py:76-81``).  No forced broadcast hint: statics are
    # one row per id, which is small for typical panels but NOT
    # broadcastable at 100M+ ids — let AQE pick (it broadcasts when the
    # dedup'd side measures small; otherwise the join lands on the same
    # id partitioning the window fills below already shuffle to).
    if static_cols:
        statics = df.select(id_col, *static_cols).dropDuplicates([id_col])
        out = out.drop(*static_cols).join(statics, id_col, "left")

    if target_col is not None:
        tf = target_fill
        if tf == "zero":
            out = out.withColumn(target_col, F.coalesce(target_col, F.lit(0.0)))
        elif tf in ("mean", "median"):
            w = Window.partitionBy(id_col)
            stat = (
                F.avg(target_col).over(w)
                if tf == "mean"
                else F.expr(f"percentile({target_col}, 0.5)").over(w)
            )
            out = out.withColumn(target_col, F.coalesce(target_col, stat))
        elif tf == "locf":
            out = locf(out, [target_col], id_col, time_col)
        elif tf == "interpolate":
            fn = _interp_udf if use_udf else _interp_exprs
            out = fn(out, target_col, id_col, time_col, method)
        elif tf != "nan":
            raise ValueError(f"unknown target_fill: {tf}")

    for c, mode in dynamic_fill.items():
        if mode == "zero":
            out = out.withColumn(c, F.coalesce(c, F.lit(0.0)))
        elif mode == "ffill":
            out = locf(out, [c], id_col, time_col)
        elif mode == "interpolate":
            fn = _interp_udf if use_udf else _interp_exprs
            out = fn(out, c, id_col, time_col, method)
        elif mode != "nan":
            raise ValueError(f"unknown dynamic_fill mode: {mode}")
    return out
