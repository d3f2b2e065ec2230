"""The reference's flagship user journey, composed end-to-end from
engine operators (workflows/nixtla_demo.py cross_validation shape):

  panel → gap fill (zero) → outlier winsorize → gated deseasonalize
  → rolling-origin CV folds → naive baseline per fold → metric suite.

Asserts shape/finiteness at each stage and bit-identical results across
two executions (determinism — the engine contract)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsforge_spark.functions.metrics import metric_exprs
from tsforge_spark.operators.cv import cv_cutoffs, cv_folds
from tsforge_spark.operators.decompose import deseasonalize_guard
from tsforge_spark.operators.gapfill import fill_gaps
from tsforge_spark.operators.outliers import correct_outliers


def _journey(spark, panel):
    filled = fill_gaps(
        panel.select("unique_id", "ds", "y"),
        "unique_id", "ds", "1d", target_col="y", target_fill="zero",
    )
    cleaned = correct_outliers(
        filled, "y", "unique_id", "zscore", 3.0, "winsorize"
    )
    # integer-cents view for the decomposition (y is Poisson-integral)
    cents = cleaned.withColumn("c", F.round(F.col("y") * 100).cast("long"))
    deseason = deseasonalize_guard(
        cents, "unique_id", "ds", "c", period=7
    ).select("unique_id", "ds", F.col("deseasonalized").alias("y"))
    cutoffs = cv_cutoffs(deseason, "ds", 3, 7)
    folds = cv_folds(deseason, "ds", cutoffs, 7)
    # naive per (id, cutoff): carry the last training value over the fold
    w = F.broadcast(
        deseason.crossJoin(
            spark.createDataFrame([(c,) for c in cutoffs], "cutoff timestamp")
        )
        .filter(F.col("ds") <= F.col("cutoff"))
        .groupBy("unique_id", "cutoff")
        .agg(F.max_by("y", "ds").alias("yhat"))
    )
    scored = folds.join(w, ["unique_id", "cutoff"])
    exprs = metric_exprs("y", "yhat")
    return scored.groupBy("cutoff").agg(
        *[exprs[m].alias(m) for m in ("mae", "rmse", "wape", "bias", "n")]
    )


@pytest.mark.filterwarnings("ignore")
def test_flagship_journey_runs_and_is_deterministic(spark, panel):
    a = _journey(spark, panel).toPandas().sort_values("cutoff").reset_index(drop=True)
    assert len(a) == 3
    assert a["n"].gt(0).all()
    for m in ("mae", "rmse", "wape"):
        assert a[m].notna().all() and (a[m] >= 0).all()
    b = _journey(spark, panel).toPandas().sort_values("cutoff").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
