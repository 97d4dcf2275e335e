"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force all-pairs cosine top-k — the exactness
  baseline. O(n²); fine to ~10^5 vectors per run, and the building
  block applied WITHIN buckets at scale.
- ``ann_lsh_topk``: random-hyperplane LSH — each vector gets a
  ``n_planes``-bit bucket (sign of the dot product against
  deterministic hyperplanes); top-k runs only within buckets, so the
  all-pairs cross join becomes an equi-join on ``bucket``. At 10^9
  vectors, bucket count 2^16 keeps bucket sizes ~15k → per-bucket
  brute force is cheap and fully parallel.
- ``embedding_neardup_pairs``: near-duplicate pairs above a cosine
  threshold.

All math is double-precision JVM fold (``aggregate``/``zip_with``) in
array order — bit-reproducible across engines (verified vs DuckDB).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential double fold over zipped elements (order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _prepped(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.select(F.col(id_col).alias("vec_id"), v.alias("v"), norm(v).alias("nrm"))


def cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """All ordered pairs (a ≠ b) with cosine similarity.

    cos(a,b) = cos(b,a), so the n²-element dot-product fold — the
    expensive part — runs only on the n²/2 unordered pairs (a < b); the
    ordered view is that half unioned with its mirror. Same rows, same
    doubles (the fold order per pair is fixed by the a<b orientation),
    half the compute."""
    p = _prepped(df, id_col, vec_col)
    a, b = p.alias("a"), p.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    half = (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ida"),
            F.col("b.vec_id").alias("idb"),
            cos.alias("cos"),
        )
    )
    # emit both orientations in ONE pass (a union of the half-frame with
    # its mirror would re-run the cross join and the folds twice)
    both = F.explode(
        F.array(
            F.struct(F.col("ida").alias("vec_id"), F.col("idb").alias("nid"), F.col("cos")),
            F.struct(F.col("idb").alias("vec_id"), F.col("ida").alias("nid"), F.col("cos")),
        )
    )
    return half.select(both.alias("p")).select("p.vec_id", "p.nid", "p.cos")


def cosine_topk(df: DataFrame, k: int = 1, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per vector (ties broken by neighbor id)."""
    pairs = cosine_pairs(df, id_col, vec_col)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nid", "cos", "rank")
    )


def embedding_neardup_pairs(df: DataFrame, threshold: float,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Unordered near-dup pairs with cosine ≥ threshold."""
    pairs = cosine_pairs(df, id_col, vec_col)
    return pairs.filter(
        (F.col("vec_id") < F.col("nid")) & (F.col("cos") >= threshold)
    ).select(F.col("vec_id").alias("vec_a"), F.col("nid").alias("vec_b"), "cos")


# ---------------------------------------------------------------------------
# LSH (random hyperplane) bucketing
# ---------------------------------------------------------------------------


def lsh_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): component
    (i, d) derives from md5 — reproducible in any engine/language."""
    planes = []
    for i in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"plane{i},{d}".encode()).hexdigest()[:8], 16)
            row.append(h / 2147483648.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i set iff dot(vec, plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, row in enumerate(planes):
        p = F.array(*[F.lit(x) for x in row])
        bucket = bucket + F.when(dot(vec, p) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def ivf_centroids(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random coarse-quantizer centroids in [-1, 1)
    (md5-derived like ``lsh_planes`` — reproducible in any engine). In
    production these come from a k-means fit on a sample; the assignment
    / probe plan below is identical either way."""
    cents = []
    for i in range(n_cells):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"cent{i},{d}".encode()).hexdigest()[:8], 16)
            row.append(h / 2147483648.0 - 1.0)
        cents.append(row)
    return cents


def ivf_cell(vec: Column, cents: list[list[float]]) -> Column:
    """Nearest-centroid cell id (min squared L2; ties → lower cell id).

    Distances land in ONE array column and the argmin is
    ``array_position(dists, array_min(dists))`` — a chained
    ``when(d < best, ...)`` fold would copy each aggregate
    expression exponentially (see the nested-lambda re-evaluation
    blowups fixed in the minhash/simhash operators)."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in row]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for row in cents
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ann_ivf_topk(df: DataFrame, k: int = 1, n_cells: int = 8,
                 dim: int | None = None, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: coarse-quantize each vector to its nearest
    centroid cell, then exact cosine top-k WITHIN the cell (nprobe=1).

    The scale path beyond LSH buckets: at 10^9 vectors with ~√n cells,
    assignment is a narrow map (C small centroid dot products/row) and
    the candidate join is an equi-join on ``cell`` — per-cell work is
    n/C × n/C, fully parallel, no cross join anywhere."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    cents = ivf_centroids(n_cells, dim)
    p = _prepped(df, id_col, vec_col).withColumn("cell", ivf_cell(F.col("v"), cents))
    a, b = p.alias("a"), p.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    pairs = (
        a.join(b, "cell")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nid"),
            cos.alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nid", "cos", "rank")
    )


def ann_lsh_topk(df: DataFrame, k: int = 1, n_planes: int = 8,
                 dim: int | None = None, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact cosine ranking WITHIN each LSH bucket.

    The join is an equi-join on ``bucket`` (never a cross join);
    vectors alone in their bucket yield no rows (the approximation
    trade-off — more planes ⇒ faster + lonelier, fewer ⇒ recall)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = lsh_planes(n_planes, dim)
    p = _prepped(df, id_col, vec_col).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    a, b = p.alias("a"), p.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nid"),
            cos.alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nid", "cos", "rank")
    )
