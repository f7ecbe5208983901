"""Similarity search over embedding columns (north-star addition).

- ``cosine_topk``: brute-force cosine top-k against a query vector — the
  exact baseline. All math is Column expressions (zip_with/aggregate), JVM
  side; products are computed in double for cross-engine determinism.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH signatures
  bucket the vectors; candidates share the query's bucket (multi-probe via
  hamming-1 neighbors optional), then exact cosine re-ranks candidates.
  At 10^12 vectors the bucket join replaces the full scan.
- ``embedding_near_dup_pairs``: pairwise near-duplicate detection within
  LSH buckets (cosine ≥ threshold).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_cosine(df: DataFrame, vec_col: str, query: Sequence[float]) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query])
    sim = _dot(F.col(vec_col), q) / F.sqrt(_norm2(F.col(vec_col)) * _norm2(q))
    return df.withColumn("cosine", F.round(sim, 9))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on id. The global
    row_number is a single-reducer sort of |rows| — fine for re-ranked
    candidate sets; for full-table top-k at scale Spark's sort-based
    TakeOrderedAndProject handles it as map-side partial top-k."""
    scored = with_cosine(df, vec_col, query)
    w = Window.orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "cosine", "rank")
    )


def hyperplane_signature(
    vec: Column, planes: Sequence[Sequence[float]]
) -> Column:
    """Random-hyperplane LSH: bit i = sign(dot(vec, plane_i)); packed long."""
    bits = []
    for i, p in enumerate(planes):
        d = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        bits.append(F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def make_planes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG, no numpy RNG state)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """ANN: filter to the query's LSH bucket (+hamming-1 probes), exact
    cosine re-rank. Recall < 1 by construction; the candidate filter is a
    pure predicate so Catalyst pushes it into the scan of a signature-
    partitioned table at scale."""
    dim = len(query)
    planes = make_planes(dim, n_planes, seed)
    sig = hyperplane_signature(F.col(vec_col), planes)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(p, query)) >= 0:
            qsig |= 1 << i
    probes = [qsig] + [qsig ^ (1 << i) for i in range(n_planes)]
    cands = df.withColumn("_sig", sig).filter(F.col("_sig").isin(probes))
    return cosine_topk(cands, vec_col, query, k, id_col)


def exact_near_dup_pairs(
    spark,
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.45,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold, two-phase for speed + value
    determinism:

    1. BLAS prefilter: broadcast the (n×d float64) matrix; one mapInPandas
       pass computes each row-block × matrixᵀ and emits candidate pairs
       above (threshold − slack) — 10⁹ FLOPs/sec-class instead of an
       expression cross-join.
    2. Exact re-check: the (few) candidates get their cosine recomputed with
       the same sequential zip_with/aggregate expression the SQL oracle
       uses, so reported values are bit-consistent with it (BLAS summation
       order differs in ulps; it only gates candidates, with slack).
    """
    import numpy as np
    import pandas as pd

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows])
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))
    slack = 1e-6

    def fn(batches):
        ids_all, m_all, n_all = bc.value
        pos = {int(i): k for k, i in enumerate(ids_all)}
        for pdf in batches:
            idx = np.array([pos[int(i)] for i in pdf[id_col]])
            block = m_all[idx]
            sims = (block @ m_all.T) / (n_all[idx][:, None] * n_all[None, :])
            ai, bj = np.nonzero(sims >= threshold - slack)
            ia, ib = ids_all[idx[ai]], ids_all[bj]
            keep = ia < ib
            yield pd.DataFrame({"id_a": ia[keep], "id_b": ib[keep]})

    cand = df.select(id_col).mapInPandas(fn, schema="id_a long, id_b long")
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = cand.join(F.broadcast(a), "id_a").join(F.broadcast(b), "id_b")
    sim = _dot(F.col("va"), F.col("vb")) / F.sqrt(_norm2(F.col("va")) * _norm2(F.col("vb")))
    return (
        pairs.withColumn("cosine", F.round(sim, 9))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate embedding pairs: LSH-bucket self-join + exact cosine.
    Exact within a bucket; pairs split across buckets are missed (standard
    LSH recall tradeoff, mitigated by fewer planes / multiple tables)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = make_planes(dim, n_planes, seed)
    sig = df.withColumn("_sig", hyperplane_signature(F.col(vec_col), planes))
    a = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "_sig")
    b = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "_sig")
    pairs = a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("va"), F.col("vb")) / F.sqrt(_norm2(F.col("va")) * _norm2(F.col("vb")))
    return (
        pairs.withColumn("cosine", F.round(sim, 9))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )
