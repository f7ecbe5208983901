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
