"""Partitioning helpers for CPU-bound grouped Python kernels.

AQE coalesces shuffle partitions by BYTES (with ``parallelismFirst``
the floor is still ``minPartitionSize``, 1MB), which is the wrong
objective for a grouped ``applyInPandas`` stage whose per-row cost is
dominated by per-GROUP kernel CPU: a small-bytes input collapses to
one task and the whole kernel fleet runs serially (measured on the
loess consumer: 12s single-task vs ~0.5s parallel for 1000 series).

``kernel_repartition`` pins the kernel stage's parallelism with a
hash repartition the planner will actually keep:

- the count is ``2·defaultParallelism + 1`` — ODD, so it can never
  statically equal a conf-derived upstream partition count, which is
  what lets EnsureRequirements remove a user repartition as redundant
  (identical HashPartitioning) and leaves the kernel downstream of an
  AQE-coalescible exchange instead;
- user-numbered repartitions are exempt from AQE coalescing;
- ``groupBy(keys)`` on the repartitioned frame reuses the
  partitioning (HashPartitioning(keys) satisfies the grouping's
  ClusteredDistribution at any partition count), so no second shuffle;
- ~2 group-waves per core packs skewed group sizes.

(``repartitionByRange`` would also survive, but samples its child —
recomputing the whole upstream plan twice; measured +2-3s.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def kernel_repartition(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key_cols`` into 2·cores+1
    partitions for a downstream CPU-bound grouped kernel (see module
    docstring for why this survives the planner where a plain
    repartition does not)."""
    n = 2 * df.sparkSession.sparkContext.defaultParallelism + 1
    return df.repartition(n, *key_cols)
