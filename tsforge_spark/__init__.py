"""tsforge_spark — a PySpark-native time-series rollup / downsample /
retention engine with the query + data-processing capabilities of the
reference ``lindsaytruong/tsforge`` toolkit, rebuilt Spark-first.

Design (SURVEY.md §1, §7):

- canonical input: long transcript table
  ``(conv_id string, turn_idx int, role string, text string, tool string,
  ts timestamp)`` — BASELINE.json ``input_hint``;
- canonical derived series: ``(series_id, bucket_start, value)`` panels;
- everything is a lazy ``pyspark.sql.DataFrame`` plan; Catalyst handles
  pushdown/pruning; pandas/Arrow UDFs only for vectorized kernels
  (Gorilla codec, linear interpolation) — no per-row Python on the hot
  path.

Subpackages
-----------
``operators``  rollup / gap-fill / window features / outliers / dedup / …
``functions``  scalar + aggregate expression builders (metrics, encoders)
``codec``      Gorilla XOR + delta-of-delta byte-aligned codecs (numpy)
``sources``    parquet readers + snapshot store (Iceberg-style incremental)
``plans``      end-to-end rollup pipeline, lineage, checkpoints
``streaming``  Structured Streaming variant of the tier rollup
"""

__version__ = "0.1.0"

from tsforge_spark.session import get_spark  # noqa: F401
