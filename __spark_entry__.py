"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship tier pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB twin (implementation:
``tsforge_spark/catalog.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events → 1m tier with
    algebraic partials → fold to 1h → dense grid + locf gap fill.
    Exercises scan, tumbling rollup, continuous-aggregate fold, grid
    explode, and window locf — the engine read path."""
    from tsforge_spark.catalog import q_gapfill_hour

    return q_gapfill_hour(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tsforge_spark.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tsforge_spark.catalog import ORACLES

    return dict(ORACLES)
