"""Similarity search over embedding columns (``array<float>``).

- ``cosine``: dot/norms via ``F.zip_with`` + ``F.aggregate`` — JVM-side
  higher-order functions, no UDF;
- ``brute_force_topk``: exact baseline — broadcast the query vector,
  score every row, global top-k;
- ``ivf_topk``: the scale path — assign every vector to its nearest
  centroid once (map-side over a broadcast centroid list), then search
  only the query's ``n_probe`` nearest cells.  With C cells this scans
  ~n_probe/C of the data; at 100 TB the cell assignment is a partition
  key so a probe touches only those partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# Round-8 measurement note (keep for the next optimizer): expanding
# dot/norm for a known dim into explicit ``a[0]*b[0] + a[1]*b[1] + …``
# GetArrayItem chains — "codegen-able, so it must beat the interpreted
# HOF fold" — is 3-6x SLOWER than the fold on 64-dim vectors (measured
# 54.8s vs 17.5s for the same n·k assignment serial, 6.8s vs 0.98s
# parallel): the 192-node expression blows past the JIT's effective
# method budget and every term re-checks null/bounds, while the fold
# runs one tight interpreted loop over the array.  The actual lever for
# the embedding queries was scan parallelism (kernel_repartition), not
# expression form.


def _lit_vec(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def brute_force_topk(
    emb: DataFrame, query_vec, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k against a literal query vector (deterministic
    tiebreak on id)."""
    q = _lit_vec(query_vec)
    scored = emb.select(
        F.col(id_col),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def assign_cells(
    emb: DataFrame, centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: argmax cosine over a broadcast centroid list
    (pure column expressions — the per-row loop is over C centroids, a
    compile-time constant).

    Implementation note: an iterated ``when(cond, s).otherwise(prev)``
    chain references the previous expression twice per level → 2^C tree
    blow-up that stalls Catalyst.  Build an array of C independent sims
    and take ``array_position(sims, array_max(sims))`` instead (first max
    wins, a deterministic tiebreak)."""
    v = F.col(vec_col).cast("array<double>")
    sims = F.array(*[cosine(v, _lit_vec(cvec)) for _, cvec in centroids])
    cids = F.array(*[F.lit(int(cid)) for cid, _ in centroids])
    pos = F.array_position(sims, F.array_max(sims))
    return emb.withColumn("cell", F.element_at(cids, pos.cast("int")))


def kmeans_fit(
    emb: DataFrame, k: int = 16, iters: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_frac: float | None = None, seed: int = 42,
) -> list[tuple[int, list[float]]]:
    """Data-derived IVF centroids: Lloyd iterations as DataFrame ops.

    - init: the ``k`` lowest-id vectors (deterministic, no RNG);
    - assign: ``assign_cells`` (argmax cosine, map-side);
    - update: ``posexplode`` the vectors → one ``groupBy(cell, pos)``
      sum/count aggregate → k·dim rows to the driver (tiny).  Empty
      cells keep their previous centroid.
    - ``sample_frac``: fit on a deterministic hash-sample of the data
      (the usual k-means-on-a-sample scale path; assignment of the full
      set stays exact).

    Centroid quality, not bit-identity, is the contract here — float
    sums across partitions are order-dependent, which moves centroids at
    the ulp level only; the catalog's oracle-checked queries use fixed
    centroids instead (see q_ann_ivf / q_embedding_neardup)."""
    import numpy as np

    fit_df = emb.select(id_col, vec_col)
    if sample_frac is not None:
        h = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(10_000))
        fit_df = fit_df.filter(h < int(sample_frac * 10_000))
    init = fit_df.orderBy(id_col).limit(k).collect()
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = assign_cells(fit_df, cents, id_col, vec_col)
        rows = (
            assigned.select(
                "cell",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "pos", "x"
                ),
            )
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        dim = len(cents[0][1])
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in rows:
            arr = sums.setdefault(r["cell"], np.zeros(dim))
            arr[r["pos"]] = r["s"]
            counts[r["cell"]] = r["n"]
        cents = [
            (cid, (sums[cid] / counts[cid]).tolist()) if cid in sums else (cid, old)
            for cid, old in cents
        ]
    return cents


def ivf_topk(
    emb: DataFrame, centroids: list[tuple[int, list[float]]], query_vec,
    k: int, n_probe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score only rows in the query's n_probe nearest cells."""
    import numpy as np

    qv = np.asarray(query_vec, dtype=np.float64)

    def cos_np(c):
        c = np.asarray(c, dtype=np.float64)
        return float(c @ qv / (np.linalg.norm(c) * np.linalg.norm(qv)))

    probe = sorted(centroids, key=lambda c: -cos_np(c[1]))[:n_probe]
    probe_ids = [c[0] for c in probe]
    assigned = assign_cells(emb, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("cell").isin(probe_ids))
    q = _lit_vec(query_vec)
    scored = cand.select(
        F.col(id_col),
        F.col("cell"),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def assign_cells_relational(
    emb: DataFrame, cents: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cent_id_col: str = "cid", cent_vec_col: str = "ce",
) -> DataFrame:
    """IVF cell assignment as a broadcast join + map-side-combined
    ``max_by`` argmax (ties to the lowest centroid id — same rule as
    ``assign_cells``'s first-max).  Unlike the literal-expression
    variant, codegen stays O(1) in the centroid count and the centroid
    table can be data-derived without re-planning; the shuffle carries
    one row per vector (partial max_by combines map-side), so the plan
    holds at any n·k."""
    v = F.col(vec_col).cast("array<double>")
    scored = emb.join(F.broadcast(cents)).withColumn(
        "_sim", cosine(v, F.col(cent_vec_col).cast("array<double>"))
    )
    cells = scored.groupBy(id_col).agg(
        F.expr(f"max_by({cent_id_col}, struct(_sim, -{cent_id_col}))").alias(
            "cell"
        )
    )
    return emb.join(cells, id_col)


def assign_cells_two_level(
    emb: DataFrame, cents: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    cent_id_col: str = "cid", cent_vec_col: str = "ce",
    n_coarse: int | None = None,
) -> DataFrame:
    """Coarse-to-fine IVF assignment — the web-scale extension of
    ``assign_cells_relational``.

    With K fine cells a flat assignment scores n·K pairs; once K ~ √n
    stops being broadcast-friendly (n ≳ 10^10), split the argmax:

    1. group the K fine centroids under √K coarse centroids (the √K
       lowest-id fine centroids, deterministically; grouping is itself a
       flat assignment over the TINY centroid table);
    2. assign each vector to its nearest coarse centroid (broadcast √K
       rows);
    3. refine against only that group's fine centroids (broadcast join
       on the coarse id — ~√K fine candidates per vector on balanced
       data).

    Total score work ~2·n·√K, and every joined side stays a broadcast
    of ≤ K rows.  Standard IVF approximation: a vector whose true
    nearest fine centroid lives under a different coarse group gets its
    best WITHIN-group fine cell instead — tests pin the agreement rate
    against the flat assignment on the synthetic embeddings.

    Ties break to the lowest centroid id at both levels (same rule as
    the flat variants)."""
    if n_coarse is None:
        import math

        n_coarse = max(2, math.ceil(math.sqrt(cents.count())))
    coarse = (
        cents.orderBy(cent_id_col)
        .limit(n_coarse)
        .select(
            F.col(cent_id_col).alias("_gid"),
            F.col(cent_vec_col).alias("_ge"),
        )
    )
    # group the fine centroids (tiny frame — K rows)
    fine_groups = assign_cells_relational(
        cents, coarse, id_col=cent_id_col, vec_col=cent_vec_col,
        cent_id_col="_gid", cent_vec_col="_ge",
    ).select(
        F.col(cent_id_col), F.col(cent_vec_col),
        F.col("cell").alias("_coarse"),
    )
    # stage 1: vector → coarse group
    v1 = assign_cells_relational(
        emb, coarse, id_col=id_col, vec_col=vec_col,
        cent_id_col="_gid", cent_vec_col="_ge",
    ).withColumnRenamed("cell", "_coarse")
    # stage 2: refine within the group (broadcast equi-join on _coarse)
    v = F.col(vec_col).cast("array<double>")
    scored = v1.join(F.broadcast(fine_groups), "_coarse").withColumn(
        "_sim", cosine(v, F.col(cent_vec_col).cast("array<double>"))
    )
    cells = scored.groupBy(id_col).agg(
        F.expr(f"max_by({cent_id_col}, struct(_sim, -{cent_id_col}))").alias(
            "cell"
        )
    )
    return emb.join(cells, id_col)
