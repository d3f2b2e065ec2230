"""As-of join (SURVEY §2.3): for each left row, the most recent right
row with ``right.ts <= left.ts`` per key.

The reference approximates this with merge-then-ffill
(``src/tsforge/workflows/nixtla_demo.py:267-279``); the true operator here
is the scalable **union + locf** formulation:

  tag sides → union on (key, ts) → per-key ordered window, locf the
  right-side payload → keep left rows.

One shuffle on the key, no UDF, no skew beyond the key distribution —
this beats the ``cogroup().applyInPandas(pd.merge_asof)`` variant
(also provided, for parity with the reference's pandas semantics) by
keeping everything in Tungsten.  Ties (right.ts == left.ts) take the
right row, matching ``pd.merge_asof`` default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Union + locf as-of join; returns all left columns plus
    ``{value}{suffix}`` for each right value column.

    ``tolerance``: optional max lookback (an interval literal, e.g.
    ``"2 hours"``) — a match older than ``left.ts − tolerance`` becomes
    NULL, mirroring ``pd.merge_asof(tolerance=...)``.  Each value column
    carries its OWN matched right timestamp through the same locf window
    (a right row with a null in one value column contributes no match
    for that column), so a value can never outlive its source row's
    tolerance — still one shuffle, no extra pass.

    Null semantics: a null right value is skipped (locf keeps looking
    back), whereas ``pd.merge_asof`` would return the matched row's
    null.  On non-null right value columns the two agree exactly (the
    pytest cross-checks this operator against ``asof_join_pandas``)."""
    lcols = left.columns
    l_tagged = left.withColumn("_side", F.lit(1))
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v + suffix, F.lit(None).cast(
            dict(right.dtypes)[v]
        ))
    r_tagged = right.select(
        key, ts_col, *[F.col(v).alias(v + suffix) for v in value_cols]
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in (key, ts_col):
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    if tolerance is not None:
        # per-value-column matched timestamp: null right values carry no
        # match, so each filled value is gated by its OWN source row's ts
        for v in value_cols:
            unioned = unioned.withColumn(
                "_rts_" + v,
                F.when(
                    (F.col("_side") == 0) & F.col(v + suffix).isNotNull(),
                    F.col(ts_col),
                ),
            )
    # right rows sort before left rows at equal ts → ties take the right row
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for v in value_cols:
        filled = filled.withColumn(
            v + suffix, F.last(v + suffix, ignorenulls=True).over(w)
        )
    if tolerance is not None:
        lookback = F.col(ts_col) - F.expr(f"interval {tolerance}")
        for v in value_cols:
            matched_ts = F.last("_rts_" + v, ignorenulls=True).over(w)
            filled = filled.withColumn(
                v + suffix, F.when(matched_ts >= lookback, F.col(v + suffix))
            )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[v + suffix for v in value_cols]
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """cogroup + pd.merge_asof variant (reference-semantics twin; Arrow
    batches, one group per key partition).  ``tolerance`` (e.g.
    ``"2 hours"``) maps straight onto ``pd.merge_asof(tolerance=...)`` —
    same semantics as the union+locf variant's parameter."""
    import pandas as pd
    from pyspark.sql import types as T

    tol = pd.Timedelta(tolerance) if tolerance is not None else None
    out_schema = T.StructType(
        list(left.schema.fields)
        + [
            T.StructField(v + suffix, dict(zip(right.schema.names, right.schema.fields))[v].dataType)
            for v in value_cols
        ]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(ts_col, kind="mergesort")
        rsel = rpdf[[ts_col] + value_cols].rename(
            columns={v: v + suffix for v in value_cols}
        ).sort_values(ts_col, kind="mergesort")
        return pd.merge_asof(lpdf, rsel, on=ts_col, tolerance=tol)

    return left.groupBy(key).cogroup(right.groupBy(key)).applyInPandas(
        merge, schema=out_schema
    )
