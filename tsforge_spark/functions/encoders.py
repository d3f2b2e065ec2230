"""Categorical encoders (SURVEY.md §2.4/§2.8) — fit = small agg job,
transform = broadcast join (the reference's sklearn-style fit/transform,
``src/tsforge/feature_engineering/encode_features.py:303-320``).

- target-mean with smoothing ``w·group_mean + (1−w)·global_mean``,
  w = count/(count+smoothing) (``encode_features.py:416-451``);
- frequency encoding (``encode_features.py:604-624``);
- one-hot (``encode_features.py:136-156``);
- ordinal by frequency / explicit map (``encode_features.py:650-682``);
- hash encoding (``encode_features.py:716-728``) — md5-based so it is
  reproducible across engines (also the salting primitive for skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_mean_encode(
    df: DataFrame, cat_col: str, target_col: str, smoothing: float = 10.0,
    out_col: str | None = None,
) -> DataFrame:
    out_col = out_col or f"{cat_col}_tme"
    stats = df.groupBy(cat_col).agg(
        F.avg(target_col).alias("_gmean"), F.count(F.lit(1)).alias("_gcnt")
    )
    gmean = df.agg(F.avg(target_col)).collect()[0][0]
    w = F.col("_gcnt") / (F.col("_gcnt") + F.lit(smoothing))
    enc = stats.withColumn(out_col, w * F.col("_gmean") + (1 - w) * F.lit(gmean))
    # no forced broadcast: the encoding frame is one row per category,
    # tiny for typical cats but unbounded in principle — AQE still
    # broadcasts when the aggregated side measures small
    return df.join(enc.select(cat_col, out_col), cat_col, "left")


def frequency_encode(df: DataFrame, cat_col: str, out_col: str | None = None) -> DataFrame:
    out_col = out_col or f"{cat_col}_freq"
    freq = df.groupBy(cat_col).agg(F.count(F.lit(1)).alias(out_col))
    return df.join(freq, cat_col, "left")


def one_hot_encode(
    df: DataFrame, cat_col: str, categories: list[str] | None = None,
    drop_first: bool = False, max_categories: int = 1024,
) -> DataFrame:
    """One indicator column per category (``encode_features.py:136-156``
    get_dummies).  The fit path collects DISTINCT categories to the
    driver — bounded by ``max_categories``: the collect is capped at
    ``max_categories + 1`` rows and raises loudly when exceeded, so a
    high-cardinality column can never move unbounded data to the
    driver (the reference's get_dummies silently explodes instead).
    Pass ``categories`` explicitly to skip the fit job entirely."""
    if categories is None:
        # NULL is filtered BEFORE the capped fit: it never becomes an
        # output column, so a column with exactly max_categories real
        # categories plus NULLs must not trip the cap (ADVICE r7).
        fit = (
            df.select(cat_col)
            .where(F.col(cat_col).isNotNull())
            .distinct()
            .limit(max_categories + 1)
            .collect()
        )
        if len(fit) > max_categories:
            raise ValueError(
                f"one_hot_encode: {cat_col!r} has more than "
                f"{max_categories} distinct values; one-hot on a "
                "high-cardinality column would create that many "
                "output columns — use hash/frequency/target encoding "
                "or raise max_categories explicitly"
            )
        categories = sorted(r[0] for r in fit if r[0] is not None)
    if drop_first:
        categories = categories[1:]
    out = df
    for c in categories:
        out = out.withColumn(
            f"{cat_col}_{c}", (F.col(cat_col) == c).cast("int")
        )
    return out


def ordinal_encode_by_freq(df: DataFrame, cat_col: str, out_col: str | None = None) -> DataFrame:
    """Rank categories by descending frequency (ties by value) → 0-based
    ordinal (``encode_features.py:650-682`` frequency mode)."""
    from pyspark.sql import Window

    out_col = out_col or f"{cat_col}_ord"
    freq = df.groupBy(cat_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy(F.desc("_n"), F.asc(cat_col))
    ranks = freq.withColumn(out_col, F.row_number().over(w) - 1).drop("_n")
    return df.join(ranks, cat_col, "left")


def hash_encode(
    df: DataFrame, cat_col: str, n_bins: int, salt: str = "", out_col: str | None = None
) -> DataFrame:
    """md5(salt||value) → first 8 hex digits → int → mod n_bins.
    Engine-portable (identical in DuckDB/ANSI SQL), unlike F.hash."""
    out_col = out_col or f"{cat_col}_hash"
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(cat_col))), 1, 8), 16, 10)
    return df.withColumn(out_col, (h.cast("long") % n_bins).cast("int"))
