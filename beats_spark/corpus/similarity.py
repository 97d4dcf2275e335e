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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


#: below this row count the cross-join + per-pair fold is cheaper than
#: spinning up Arrow cogroups; above it the blocked GEMM path wins and
#: the cross join stops being viable long before it stops being correct
SMALL_N_CROSSJOIN = 1000


def _auto_mode(df: DataFrame, small_n: int,
               approx_count: int | None) -> str:
    """Resolve mode='auto' without an eager action when avoidable:
    a caller-supplied ``approx_count`` hint decides directly (any
    estimate on the right side of ``small_n`` gives the same rows —
    both paths are exact, the gate is purely a cost choice); a
    streaming frame can't be counted and takes the scale-safe blocked
    path; only a batch frame with no hint pays the count() (parquet
    footer metadata — cheap, never a full scan)."""
    if approx_count is not None:
        n = approx_count
    elif df.isStreaming:
        return "blocked"
    else:
        n = df.count()
    return "crossjoin" if n <= small_n else "blocked"


def cosine_topk(df: DataFrame, k: int = 1, id_col: str = "vec_id",
                vec_col: str = "embedding", mode: str = "auto",
                n_blocks: int = 8,
                small_n: int = SMALL_N_CROSSJOIN,
                approx_count: int | None = None) -> DataFrame:
    """Exact top-k neighbors per vector (ties broken by neighbor id).

    ``mode='auto'`` (default) gates on the input row count: at or below
    ``small_n`` rows the cross-join + per-pair fold runs (less overhead
    than Arrow cogroups at tiny n); above it the plan delegates to
    :func:`cosine_topk_blocked` — identical rows by construction (GEMM
    candidate generation, fold-cos re-rank, so emitted doubles are the
    same sequential fold), no cartesian product. The gate is lazy when
    it can be: pass ``approx_count`` (any row-count estimate) and no
    action runs at plan build; a streaming input goes blocked
    unconditionally; otherwise one cheap count() (parquet footer
    metadata) decides. ``mode='crossjoin'`` forces the O(n²) baseline —
    the ≤10⁵-row exactness oracle for tests, never the scale path."""
    if mode == "auto":
        mode = _auto_mode(df, small_n, approx_count)
    if mode == "blocked":
        return cosine_topk_blocked(df, k, n_blocks, id_col, vec_col)
    if mode != "crossjoin":
        raise ValueError(f"mode must be auto|blocked|crossjoin, got {mode!r}")
    pairs = cosine_pairs(df, id_col, vec_col)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nid", "cos", "rank")
    )


def embedding_neardup_pairs(df: DataFrame, threshold: float,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding", mode: str = "auto",
                            n_blocks: int = 8,
                            small_n: int = SMALL_N_CROSSJOIN,
                            approx_count: int | None = None) -> DataFrame:
    """Unordered near-dup pairs with cosine ≥ threshold. Same lazy
    row-count gate as :func:`cosine_topk`: above ``small_n`` the
    blocked GEMM path runs (identical rows, no cartesian product);
    ``approx_count`` skips the eager count."""
    if mode == "auto":
        mode = _auto_mode(df, small_n, approx_count)
    if mode == "blocked":
        return embedding_neardup_blocked(df, threshold, n_blocks, id_col, vec_col)
    if mode != "crossjoin":
        raise ValueError(f"mode must be auto|blocked|crossjoin, got {mode!r}")
    pairs = cosine_pairs(df, id_col, vec_col)
    return pairs.filter(
        (F.col("vec_id") < F.col("nid")) & (F.col("cos") >= threshold)
    ).select(F.col("vec_id").alias("vec_a"), F.col("nid").alias("vec_b"), "cos")


# ---------------------------------------------------------------------------
# Blocked exact brute force — the scale-sane exact path
# ---------------------------------------------------------------------------


def _blocked_candidates(df: DataFrame, k: int, n_blocks: int, id_col: str,
                        vec_col: str, threshold: float | None) -> DataFrame:
    """Candidate (vec_id, nid) pairs via blocked GEMM.

    The database side is hash-partitioned into ``n_blocks`` blocks on
    ``vec_id``; the query side is replicated to every block (explode —
    a narrow map, no driver loop). Each (query-batch × block) cogroup
    computes ONE numpy matmul and keeps the per-block top-k (or all
    pairs ≥ threshold−ε). The exact global answer is a subset of the
    union of per-block top-k, so the final fold-cos re-rank downstream
    is exact. Work per group is (n × n/B × dim) in BLAS — the same
    total flops as the cross join but 10-100× faster than per-pair
    fold codegen, and each block is an independent task: at 10^9 rows
    pick B so n/B fits an executor (the query side then streams
    through in Arrow batches)."""
    p = _prepped(df, id_col, vec_col)
    b = p.withColumn(
        "blk", F.pmod(F.col("vec_id").cast("long"), F.lit(n_blocks)).cast("int")
    )
    a = p.withColumn(
        "blk", F.explode(F.array(*[F.lit(i) for i in range(n_blocks)]))
    )

    def part(a_pdf: pd.DataFrame, b_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                              "nid": pd.Series([], dtype="int64")})
        if a_pdf.empty or b_pdf.empty:
            return empty
        # sort the block by id so stable argsort breaks cos ties by nid
        b_pdf = b_pdf.sort_values("vec_id")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a_pdf["v"]])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in b_pdf["v"]])
        S = (A @ B.T) / np.outer(a_pdf["nrm"].to_numpy(), b_pdf["nrm"].to_numpy())
        aid = a_pdf["vec_id"].to_numpy()
        bid = b_pdf["vec_id"].to_numpy()
        S[aid[:, None] == bid[None, :]] = -np.inf  # self-pairs
        if threshold is not None:
            ri, cj = np.nonzero(S >= threshold - 1e-9)
        else:
            kk = min(k, S.shape[1])
            idx = np.argsort(-S, axis=1, kind="stable")[:, :kk]
            ri = np.repeat(np.arange(S.shape[0]), kk)
            cj = idx.ravel()
            keep = S[ri, cj] != -np.inf
            ri, cj = ri[keep], cj[keep]
        return pd.DataFrame({"vec_id": aid[ri], "nid": bid[cj]})

    return (
        a.groupby("blk")
        .cogroup(b.groupby("blk"))
        .applyInPandas(part, schema="vec_id long, nid long")
    )


def _fold_cos_for_pairs(cand: DataFrame, p: DataFrame) -> DataFrame:
    """Re-compute cosine for candidate pairs with the sequential JVM
    fold — the numpy scores picked the candidates; the EMITTED values
    are the canonical order-stable fold, bit-identical to the
    unblocked operators and the DuckDB oracle."""
    pa = p.select(F.col("vec_id"), F.col("v").alias("_va"), F.col("nrm").alias("_na"))
    pb = p.select(F.col("vec_id").alias("nid"), F.col("v").alias("_vb"),
                  F.col("nrm").alias("_nb"))
    joined = cand.join(pa, "vec_id").join(pb, "nid")
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return joined.select("vec_id", "nid", cos.alias("cos"))


def cosine_topk_blocked(df: DataFrame, k: int = 1, n_blocks: int = 8,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors, blocked: same rows as :func:`cosine_topk`
    (GEMM candidate generation + fold-cos re-rank), no cross join in
    the plan — the exact path that survives 100× scale-up."""
    p = _prepped(df, id_col, vec_col)
    cand = _blocked_candidates(df, k, n_blocks, id_col, vec_col, threshold=None)
    pairs = _fold_cos_for_pairs(cand, p)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nid", "cos", "rank")
    )


def embedding_neardup_blocked(df: DataFrame, threshold: float,
                              n_blocks: int = 8, id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Near-dup pairs ≥ threshold, blocked: same rows as
    :func:`embedding_neardup_pairs` without the cross join. The GEMM
    pass over-collects by ε; the fold-cos filter makes the final set
    exact."""
    p = _prepped(df, id_col, vec_col)
    cand = _blocked_candidates(df, 0, n_blocks, id_col, vec_col,
                               threshold=threshold).filter(
        F.col("vec_id") < F.col("nid")
    )
    pairs = _fold_cos_for_pairs(cand, p)
    return pairs.filter(F.col("cos") >= threshold).select(
        F.col("vec_id").alias("vec_a"), F.col("nid").alias("vec_b"), "cos"
    )


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
    """Nearest-centroid cell id (min squared L2; ties → lower cell id),
    computed in the expanded form ``|v|² + |c|² − 2·v·c`` — the same
    quantity :func:`ivf_cell_assign` and the DuckDB oracle compute, so
    near-tie distances round comparably across all three paths (the
    ``|c|²`` term is a Python-precomputed literal on every side).

    Distances land in ONE array column and the argmin is
    ``array_position(dists, array_min(dists))`` — a chained
    ``when(d < best, ...)`` fold would copy each aggregate
    expression exponentially (see the nested-lambda re-evaluation
    blowups fixed in the minhash/simhash operators)."""
    vn = F.aggregate(
        F.zip_with(vec, vec, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    dists = F.array(
        *[
            vn + F.lit(_seq_sq_norm(row))
            - F.lit(2.0) * F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in row]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for row in cents
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _incell_topk(p: DataFrame, key_col: str, k: int) -> DataFrame:
    """Exact top-k WITHIN each bucket/cell via one GEMM per group
    (applyInPandas), then fold-cos re-rank of the candidates.

    Replaces the per-pair JVM fold equi-join when bucket sizes are big
    enough that (n/C)² pair folds dominate: one (n_c × n_c) BLAS matmul
    per group generates the candidates, and the emitted cos values are
    re-computed with the canonical sequential fold so results are
    bit-identical to the fold path (ranking differs only on sub-ulp cos
    ties). Skewed buckets = one big group per hot key; mitigation is
    quantizer quality (k-means), not the join plan."""

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                              "nid": pd.Series([], dtype="int64")})
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")  # stable argsort ties → lower nid
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        nrm = pdf["nrm"].to_numpy()
        S = (V @ V.T) / np.outer(nrm, nrm)
        np.fill_diagonal(S, -np.inf)
        kk = min(k, len(pdf) - 1)
        idx = np.argsort(-S, axis=1, kind="stable")[:, :kk]
        ri = np.repeat(np.arange(len(pdf)), kk)
        cj = idx.ravel()
        keep = S[ri, cj] != -np.inf
        ids = pdf["vec_id"].to_numpy()
        return pd.DataFrame({"vec_id": ids[ri[keep]], "nid": ids[cj[keep]]})

    cand = p.select("vec_id", "v", "nrm", key_col).groupBy(key_col).applyInPandas(
        part, schema="vec_id long, nid long"
    )
    pairs = _fold_cos_for_pairs(cand, p)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nid", "cos", "rank")
    )


def _seq_sq_norm(row) -> float:
    """Sequential left-to-right |x|² fold — the accumulation order of
    Spark's ``F.aggregate`` and DuckDB's ``list_sum``, so the expanded
    distance ``|v|² + |c|² − 2·v·c`` rounds identically across engines
    on the norm terms (the GEMM dot term is the one residual ulp)."""
    acc = 0.0
    for x in row:
        acc += float(x) * float(x)
    return acc


def _seq_sq_rows(V: np.ndarray) -> np.ndarray:
    """Row-wise sequential |v|² via cumulative (left-to-right) adds."""
    return np.add.accumulate(V * V, axis=1)[:, -1]


def ivf_cell_assign(cents: list[list[float]]):
    """Arrow-batched nearest-centroid assignment: ONE numpy matmul per
    batch against the (n_cells × dim) centroid matrix shipped in the UDF
    closure — cost O(batch × n_cells × dim) in BLAS, so the √n-cells
    design point (31k cells at 10^9 rows) is a plain GEMM per batch.
    The literal-fold codegen of :func:`ivf_cell` cannot reach that scale
    (one fold expression per centroid); it remains for tiny centroid
    sets and as the oracle-parity reference.

    argmin over ``|v|² + |c|² − 2·v·c`` — the SAME expanded quantity
    :func:`ivf_cell` and the DuckDB oracle compute (adding the per-row
    ``|v|²`` constant doesn't change the argmin mathematically, but
    computing a *different* quantity made near-tie centroid distances
    round differently across engines); numpy's first-min tie-break =
    the lower cell id, matching ``ivf_cell``'s
    ``array_position(dists, array_min(dists))``."""
    C = np.asarray(cents, dtype=np.float64)  # (n_cells, dim)
    Cn = np.array([_seq_sq_norm(row) for row in cents])  # |c|², seq fold

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype="int32")
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        scores = _seq_sq_rows(V)[:, None] + Cn - 2.0 * (V @ C.T)
        return pd.Series(np.argmin(scores, axis=1).astype("int32"))

    return assign


def ivf_probe_assign(cents: list[list[float]], nprobe: int):
    """Multi-probe assignment: the ``nprobe`` nearest cells per vector
    (ascending distance; stable ties → lower cell id), as one GEMM +
    argsort per Arrow batch."""
    C = np.asarray(cents, dtype=np.float64)
    Cn = np.array([_seq_sq_norm(row) for row in cents])
    p = min(nprobe, len(cents))

    @pandas_udf("array<int>")
    def assign(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        scores = _seq_sq_rows(V)[:, None] + Cn - 2.0 * (V @ C.T)
        idx = np.argsort(scores, axis=1, kind="stable")[:, :p].astype("int32")
        return pd.Series(list(idx))

    return assign


def ann_ivf_topk(df: DataFrame, k: int = 1, n_cells: int = 8,
                 dim: int | None = None, id_col: str = "vec_id",
                 vec_col: str = "embedding", assign: str = "pandas",
                 pairs: str = "gemm", nprobe: int = 1,
                 centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF-style ANN: coarse-quantize each vector to its nearest
    centroid cell, then exact cosine top-k within the probed cells.

    ``nprobe`` > 1 is the standard IVF recall lever: each QUERY probes
    its ``nprobe`` nearest cells (the database side stays in its single
    nearest cell), so candidates come from an equi-join of exploded
    probe assignments against cell membership — per-query work grows
    linearly in nprobe, never quadratically, and ``nprobe == n_cells``
    degenerates to exact brute force (every pair considered — the
    recall=1 sanity point, tested).

    The scale path beyond LSH buckets: at 10^9 vectors with ~√n cells,
    assignment is a narrow map — one Arrow-batched GEMM per batch
    (``assign="pandas"``, the default) — and the candidates come from
    within the cell only: ``pairs="gemm"`` (default) does one matmul
    per cell group + fold-cos re-rank; ``pairs="fold"`` is the pure-JVM
    per-pair fold equi-join (cheaper for tiny cells, (n/C)²·dim fold
    cost otherwise). ``assign="expr"`` keeps the literal-fold JVM
    assignment (viable only for small centroid counts). Emitted cos
    values are identical across all variants (always the canonical
    sequential fold).

    ``dim`` is required: the embedding dimension is config, not
    something to probe with a driver-side action at plan-build time.
    ``centroids`` (e.g. from :func:`ivf_train_centroids`) replaces the
    deterministic md5 placeholders — same plan, better cells."""
    if dim is None:
        raise ValueError(
            "ann_ivf_topk requires dim= (embedding dimension); plan build "
            "must not run a driver-side first() probe"
        )
    cents = centroids if centroids is not None else ivf_centroids(n_cells, dim)
    if nprobe > 1:
        if assign != "pandas":
            raise ValueError("nprobe > 1 requires assign='pandas'")
        return _ivf_multiprobe_topk(df, cents, k, nprobe, id_col, vec_col)
    cell = (
        ivf_cell_assign(cents)(F.col("v")) if assign == "pandas"
        else ivf_cell(F.col("v"), cents)
    )
    p = _prepped(df, id_col, vec_col).withColumn("cell", cell)
    if pairs == "gemm":
        return _incell_topk(p, "cell", k)
    return _fold_join_topk(p, "cell", k)


def _ivf_multiprobe_topk(df: DataFrame, cents: list[list[float]], k: int,
                         nprobe: int, id_col: str, vec_col: str) -> DataFrame:
    """Multi-probe IVF search: query side exploded over its nprobe
    nearest cells, database side keyed by its single nearest cell, one
    GEMM per (probed-cell × cell-members) cogroup for candidates,
    fold-cos re-rank for the global exact-within-candidates top-k."""
    p = _prepped(df, id_col, vec_col)
    probes = ivf_probe_assign(cents, nprobe)(F.col("v"))
    assigned = p.withColumn("_cells", probes)
    b = assigned.withColumn("cell", F.element_at("_cells", 1)).drop("_cells")
    q = assigned.withColumn("cell", F.explode("_cells")).drop("_cells")

    def part(q_pdf: pd.DataFrame, b_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                              "nid": pd.Series([], dtype="int64")})
        if q_pdf.empty or b_pdf.empty:
            return empty
        b_pdf = b_pdf.sort_values("vec_id")
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in q_pdf["v"]])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in b_pdf["v"]])
        S = (Q @ B.T) / np.outer(q_pdf["nrm"].to_numpy(), b_pdf["nrm"].to_numpy())
        qid = q_pdf["vec_id"].to_numpy()
        bid = b_pdf["vec_id"].to_numpy()
        S[qid[:, None] == bid[None, :]] = -np.inf
        kk = min(k, S.shape[1])
        idx = np.argsort(-S, axis=1, kind="stable")[:, :kk]
        ri = np.repeat(np.arange(S.shape[0]), kk)
        cj = idx.ravel()
        keep = S[ri, cj] != -np.inf
        return pd.DataFrame({"vec_id": qid[ri[keep]], "nid": bid[cj[keep]]})

    cand = (
        q.groupby("cell")
        .cogroup(b.groupby("cell"))
        .applyInPandas(part, schema="vec_id long, nid long")
    )
    pairs = _fold_cos_for_pairs(cand, p)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nid", "cos", "rank")
    )


def _fold_join_topk(p: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-pair JVM fold over the bucket equi-join + window top-k."""
    a, b = p.alias("a"), p.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    pairs = (
        a.join(b, key_col)
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
                 vec_col: str = "embedding", pairs: str = "fold") -> DataFrame:
    """Approximate top-k: exact cosine ranking WITHIN each LSH bucket.

    The candidates come from the bucket only (never a cross join);
    vectors alone in their bucket yield no rows (the approximation
    trade-off — more planes ⇒ faster + lonelier, fewer ⇒ recall).
    ``pairs="fold"`` (default; buckets are small by design) is the
    per-pair JVM fold equi-join; ``pairs="gemm"`` switches to one
    matmul per bucket group for fat-bucket workloads.

    ``dim`` is required (no driver-side probe at plan build). The
    sign-bit BUCKET fold stays JVM-side in both modes: dot products
    near zero make the bucket bit ulp-sensitive, and the sequential
    fold is the cross-engine-reproducible ordering."""
    if dim is None:
        raise ValueError(
            "ann_lsh_topk requires dim= (embedding dimension); plan build "
            "must not run a driver-side first() probe"
        )
    planes = lsh_planes(n_planes, dim)
    p = _prepped(df, id_col, vec_col).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    if pairs == "gemm":
        return _incell_topk(p, "bucket", k)
    return _fold_join_topk(p, "bucket", k)


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication via within-cluster cosine pruning
# ---------------------------------------------------------------------------


def semantic_dedup(df: DataFrame, threshold: float = 0.3, n_cells: int = 8,
                   dim: int | None = None, id_col: str = "vec_id",
                   vec_col: str = "embedding", method: str = "gemm",
                   assign: str = "pandas") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop documents
    that are SEMANTICALLY near-identical to another document in the
    same embedding cluster.

    Algorithm, exactly as published: coarse-cluster the embeddings,
    then within each cluster flag every member whose cosine similarity
    to an EARLIER member (triangular mask over a fixed intra-cluster
    order) reaches ``threshold`` — the flagged copy is the semantic
    duplicate, the earliest member of each ε-ball survives. The paper
    orders by distance-to-centroid; this implementation orders by id
    (deterministic and reproducible across engines — near-tie centroid
    distances round differently between BLAS and SQL folds, ids don't).
    Pairs are only ever formed WITHIN a cluster, so a pair that LSH
    would call near-dup but whose members quantize to different cells
    is not flagged — that recall trade-off is the published design.

    Centroids are the deterministic md5 quantizer of
    :func:`ivf_centroids` (production: a k-means fit on a sample —
    the assignment and pruning plan is identical either way) and the
    cluster count is the scale lever: at 10^9 rows with ~√n cells each
    cell holds ~√n vectors, so the per-cell GEMM (``method="gemm"``,
    default — one matmul + triangular mask per cell via
    ``applyInPandas``) stays bounded; candidates over-collect by ε and
    a JVM fold-cos filter makes the flag exact (same candidates →
    verify discipline as :func:`embedding_neardup_blocked`).
    ``method="fold"`` is the pure-JVM per-pair fold over the cell
    equi-join — the small-n / oracle-parity reference path.

    Returns one row PER INPUT ROW: ``(vec_id, cell, is_semdup)``;
    filter ``~is_semdup`` for the survivor set. ``dim`` is required
    (no driver-side probe at plan build)."""
    if dim is None:
        raise ValueError(
            "semantic_dedup requires dim= (embedding dimension); plan "
            "build must not run a driver-side first() probe"
        )
    if method not in ("gemm", "fold"):
        raise ValueError(f"method must be gemm|fold, got {method!r}")
    cents = ivf_centroids(n_cells, dim)
    cell = (
        ivf_cell_assign(cents)(F.col("v")) if assign == "pandas"
        else ivf_cell(F.col("v"), cents)
    )
    p = _prepped(df, id_col, vec_col).withColumn("cell", cell)

    if method == "fold":
        a, b = p.alias("a"), p.alias("b")
        cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
        verified = (
            a.join(b, (F.col("a.cell") == F.col("b.cell"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("b.vec_id").alias("nid"), cos.alias("cos"))
            .filter(F.col("cos") >= threshold)
        )
    else:
        def part(pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                  "nid": pd.Series([], dtype="int64")})
            if len(pdf) < 2:
                return empty
            pdf = pdf.sort_values("vec_id")
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            nrm = pdf["nrm"].to_numpy()
            S = (V @ V.T) / np.outer(nrm, nrm)
            iu = np.triu_indices(len(pdf), k=1)
            keep = S[iu] >= threshold - 1e-9  # over-collect; fold verifies
            ids = pdf["vec_id"].to_numpy()
            return pd.DataFrame({"vec_id": ids[iu[0][keep]],
                                 "nid": ids[iu[1][keep]]})

        cand = p.select("vec_id", "v", "nrm", "cell").groupBy("cell").applyInPandas(
            part, schema="vec_id long, nid long"
        )
        verified = _fold_cos_for_pairs(cand, p).filter(
            F.col("cos") >= threshold
        ).select("nid", "cos")

    dup = verified.select("nid").distinct().withColumn("_d", F.lit(True))
    return (
        p.select("vec_id", "cell")
        .join(dup, p["vec_id"] == dup["nid"], "left")
        .select(
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            F.coalesce(F.col("_d"), F.lit(False)).alias("is_semdup"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-PQ — product-quantized ANN (the memory-bound scale path)
# ---------------------------------------------------------------------------


def _seq_dot_rows(Q: np.ndarray, Cj: np.ndarray) -> np.ndarray:
    """(n × dsub)·(ksub × dsub)ᵀ dot products with SEQUENTIAL
    left-to-right accumulation — bit-identical to the Python/DuckDB
    fold, unlike a BLAS GEMM (whose blocked/FMA summation differs by
    ulps, enough to flip the integer micro-unit rounding of the PQ
    LUT/encode on rare boundary values). Still vectorized C loops:
    one (n × ksub × dsub) elementwise product + a cumulative sum."""
    prod = Q[:, None, :] * Cj[None, :, :]
    return np.add.accumulate(prod, axis=2)[:, :, -1]


def pq_codebooks(m: int, ksub: int, dsub: int) -> list[list[list[float]]]:
    """Deterministic md5-derived PQ codebooks: ``m`` subspaces ×
    ``ksub`` centroids × ``dsub`` dims (production: k-means per
    subspace on a sample — the encode/search plan is identical)."""
    return [
        [
            [
                int(hashlib.md5(f"pq{j},{i},{d}".encode()).hexdigest()[:8], 16)
                / 2147483648.0 - 1.0
                for d in range(dsub)
            ]
            for i in range(ksub)
        ]
        for j in range(m)
    ]


def _kmeans(X: np.ndarray, k: int, iters: int = 25,
            seed: int = 0) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (numpy).
    Init: seeded choice without replacement; an emptied cluster keeps
    its previous centroid (stable, no resampling). Fixed iteration
    count — training reproducibility beats convergence wobble here."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            members = a == j
            if members.any():
                C[j] = X[members].mean(0)
    return C


def sample_vectors(df: DataFrame, n: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> np.ndarray:
    """Deterministic bounded training sample: top-``n`` rows by
    ``xxhash64(id)`` — a TakeOrdered (per-partition top-n + driver
    merge, never a full sort or full collect), so the SAME ``n``
    vectors come back at any scale, any partitioning, any rerun.
    This is the one sanctioned driver-side collect in this module:
    quantizer TRAINING is bounded by design (FAISS trains IVF-PQ on a
    fixed-size sample too); search never collects."""
    rows = (
        df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h", F.col(id_col))
        .limit(n)
        .collect()
    )
    return np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])


def ivf_train_centroids(df: DataFrame, n_cells: int, dim: int,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        sample_n: int = 16384, iters: int = 25,
                        seed: int = 13) -> list[list[float]]:
    """K-means-trained coarse-quantizer centroids (the production
    substitute for :func:`ivf_centroids`' md5 placeholders): bounded
    deterministic sample → Lloyd on the driver. The assignment / probe
    plan downstream is identical — only the literals change. Trained
    centroids track the data's cluster structure, so fewer probes reach
    the same recall (measured in tests/test_corpus.py recall gates)."""
    X = sample_vectors(df, sample_n, id_col, vec_col)
    if X.shape[1] != dim:
        raise ValueError(f"dim={dim} but sampled vectors have {X.shape[1]}")
    return [[float(x) for x in row] for row in _kmeans(X, n_cells, iters, seed)]


def pq_train_codebooks(df: DataFrame, m: int, ksub: int, dim: int,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       sample_n: int = 16384, iters: int = 25,
                       seed: int = 13) -> list[list[list[float]]]:
    """FAISS-style PQ training: per subspace, k-means over the
    subvectors of a bounded deterministic sample (see
    :func:`sample_vectors`). Returns the same nested-list format as
    :func:`pq_codebooks`, so it drops into :func:`ann_ivf_pq_topk`
    unchanged. Untrained (md5) codebooks keep cross-engine oracle
    parity for the correctness gate; TRAINED codebooks are what make
    the index an index — ADC recall@10 roughly triples on clustered
    data (numbers in SCALE.md + tests/test_corpus.py)."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    X = sample_vectors(df, sample_n, id_col, vec_col)
    if X.shape[1] != dim:
        raise ValueError(f"dim={dim} but sampled vectors have {X.shape[1]}")
    dsub = dim // m
    return [
        [
            [float(x) for x in c]
            for c in _kmeans(X[:, j * dsub:(j + 1) * dsub], ksub, iters,
                             seed + j)
        ]
        for j in range(m)
    ]


def pq_encode_assign(cbs: list[list[list[float]]]):
    """Arrow-batched PQ encoder: per subspace, one GEMM argmin against
    the subspace codebook (expanded ``|q|²+|c|²−2qc``, stable ties →
    lower code — the same quantity and tie rule as the oracle's
    windowed argmin). Output: ``m`` uint8-sized codes per vector —
    the 64-float embedding compresses to ``m`` bytes at rest."""
    m, ksub, dsub = len(cbs), len(cbs[0]), len(cbs[0][0])
    C = np.asarray(cbs, dtype=np.float64)            # (m, ksub, dsub)
    Cn = np.array([[_seq_sq_norm(c) for c in row] for row in cbs])

    @pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        codes = np.empty((V.shape[0], m), dtype=np.int32)
        for j in range(m):
            Q = V[:, j * dsub:(j + 1) * dsub]
            scores = _seq_sq_rows(Q)[:, None] + Cn[j] - 2.0 * _seq_dot_rows(Q, C[j])
            codes[:, j] = np.argmin(scores, axis=1)
        return pd.Series(list(codes))

    return enc


def pq_lut_assign(cbs: list[list[list[float]]]):
    """Arrow-batched ADC lookup table per QUERY: integer micro-units
    ``round(dist × 1e9)`` for every (subspace, centroid) pair,
    flattened row-major to ``m·ksub`` longs. Quantizing the per-term
    distances to integers makes the ADC sum exact and
    order-independent — float ADC sums would rank near-ties
    differently across engines (the micro-bit discipline of
    ``lm_score``, applied to distances)."""
    m, ksub, dsub = len(cbs), len(cbs[0]), len(cbs[0][0])
    C = np.asarray(cbs, dtype=np.float64)
    Cn = np.array([[_seq_sq_norm(c) for c in row] for row in cbs])

    @pandas_udf("array<long>")
    def lut(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        out = np.empty((V.shape[0], m * ksub), dtype=np.int64)
        for j in range(m):
            Q = V[:, j * dsub:(j + 1) * dsub]
            x = (_seq_sq_rows(Q)[:, None] + Cn[j] - 2.0 * _seq_dot_rows(Q, C[j])) * 1e9
            out[:, j * ksub:(j + 1) * ksub] = np.copysign(
                np.floor(np.abs(x) + 0.5), x
            ).astype(np.int64)
        return pd.Series(list(out))

    return lut


def ann_ivf_pq_topk(df: DataFrame, k: int = 1, n_cells: int = 8,
                    m: int = 4, ksub: int = 16, dim: int | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    nprobe: int = 1,
                    codebooks: list[list[list[float]]] | None = None,
                    centroids: list[list[float]] | None = None,
                    rerank: int = 1) -> DataFrame:
    """FAISS-style IVF-PQ: coarse-quantize to IVF cells, PQ-encode the
    database side to ``m`` byte codes, search by asymmetric distance
    (per-query LUT, summed over code entries) within the cell.

    THE memory-bound scale path: at 10^9 × 64-float vectors the raw
    database is 256 GB; the PQ codes are ``m`` bytes/vector (4 GB at
    m=4) — cell members ship codes, not vectors, so the search-side
    shuffle shrinks by dim·4/m (64× here) and a whole cell's codes sit
    in L2. Per (cell) cogroup the ADC is one integer gather-sum —
    O(n_q·m·ksub + n_q·n_b·m) with no float accumulation (integer
    micro-unit LUT, see :func:`pq_lut_assign`), so ranking is exact
    and engine-reproducible; ties break to the lower neighbor id.
    Approximation = quantization error (tune m·ksub) × cell pruning
    (tune n_cells); vectors alone in their cell emit nothing, like
    :func:`ann_lsh_topk`. ``nprobe > 1`` is the same recall lever as
    :func:`ann_ivf_topk`: each QUERY probes its nprobe nearest cells
    (the codes stay in their single cell), per-probe top-k candidates
    re-rank globally by the integer ADC (a window over ≤ nprobe·k
    candidate rows per query — exact by integer ordering);
    ``nprobe == n_cells`` degenerates to brute-force ADC over the
    whole database (tested). Returns ``(vec_id, nid, adc, rank)``
    with ``adc`` in integer 1e-9 units of squared L2.

    ``codebooks`` / ``centroids`` (from :func:`pq_train_codebooks` /
    :func:`ivf_train_centroids`) replace the md5 placeholders — the md5
    defaults keep the DuckDB oracle bit-exact; trained ones are the
    quality path. ``rerank > 1`` is FAISS's refine stage: the ADC keeps
    the top ``rerank·k`` candidates per query and an EXACT fold-cos
    re-rank over just those rows (``rerank·k`` vectors per query — a
    candidate equi-join, never a scan) picks the final k; output then
    becomes ``(vec_id, nid, cos, rank)``. On clustered data this lifts
    recall@10 from ~0.56 (pure ADC, trained m=4) to ≥0.95 at
    ``rerank=4`` (tests/test_corpus.py)."""
    if dim is None:
        raise ValueError(
            "ann_ivf_pq_topk requires dim= (embedding dimension); plan "
            "build must not run a driver-side first() probe"
        )
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    if rerank < 1:
        raise ValueError(f"rerank must be >= 1, got {rerank}")
    cbs = codebooks if codebooks is not None else pq_codebooks(m, ksub, dim // m)
    m, ksub = len(cbs), len(cbs[0])
    cents = centroids if centroids is not None else ivf_centroids(n_cells, dim)
    k_eff = k * rerank  # ADC keeps k_eff candidates; refine picks k
    if nprobe > 1:
        assigned = _prepped(df, id_col, vec_col).withColumn(
            "_cells", ivf_probe_assign(cents, nprobe)(F.col("v"))
        )
        bsrc = assigned.withColumn("cell", F.element_at("_cells", 1))
        qsrc = assigned.withColumn("cell", F.explode("_cells"))
    else:
        bsrc = qsrc = _prepped(df, id_col, vec_col).withColumn(
            "cell", ivf_cell_assign(cents)(F.col("v"))
        )
    # the b side renames its columns: both sides share the q lineage,
    # and a self-cogroup whose OUTPUT schema reuses the conflicting
    # input names makes the analyzer's attribute dedup drop the right
    # side's vec_id from the Arrow frame (worker KeyError) — distinct
    # names sidestep the collision entirely
    b = bsrc.select(
        F.col("vec_id").alias("bid"), F.col("cell").alias("bcell"),
        pq_encode_assign(cbs)(F.col("v")).alias("_codes"),
    )
    q = qsrc.select("vec_id", "cell", pq_lut_assign(cbs)(F.col("v")).alias("_lut"))

    def part(q_pdf: pd.DataFrame, b_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "vec_id": pd.Series([], dtype="int64"),
            "nid": pd.Series([], dtype="int64"),
            "adc": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int32"),
        })
        if q_pdf.empty or b_pdf.empty:
            return empty
        b_pdf = b_pdf.sort_values("bid")  # stable argsort ties → lower nid
        L = np.stack([np.asarray(x, dtype=np.int64) for x in q_pdf["_lut"]])
        codes = np.stack([np.asarray(x, dtype=np.int64) for x in b_pdf["_codes"]])
        idx = codes + (np.arange(m, dtype=np.int64) * ksub)[None, :]
        adc = L[:, idx].sum(axis=2)                  # (nq, nb) int64
        qid = q_pdf["vec_id"].to_numpy()
        bid = b_pdf["bid"].to_numpy()
        self_mask = qid[:, None] == bid[None, :]
        adc[self_mask] = np.iinfo(np.int64).max      # exclude self-pairs
        kk = min(k_eff, adc.shape[1])
        order = np.argsort(adc, axis=1, kind="stable")[:, :kk]
        ri = np.repeat(np.arange(adc.shape[0]), kk)
        cj = order.ravel()
        keep = ~self_mask[ri, cj]
        rank = np.tile(np.arange(1, kk + 1, dtype=np.int32), adc.shape[0])
        return pd.DataFrame({
            "vec_id": qid[ri[keep]],
            "nid": bid[cj[keep]],
            "adc": adc[ri[keep], cj[keep]],
            "rank": rank[keep],
        })

    cand = (
        q.groupby("cell")
        .cogroup(b.groupby("bcell"))
        .applyInPandas(part, schema="vec_id long, nid long, adc long, rank int")
    )
    if nprobe > 1:
        # one global ADC window over ≤ nprobe·k_eff candidate rows/query
        w_adc = Window.partitionBy("vec_id").orderBy(F.asc("adc"), F.asc("nid"))
        cand = (
            cand.drop("rank")
            .withColumn("rank", F.row_number().over(w_adc))
            .filter(F.col("rank") <= k_eff)
        )
    if rerank <= 1:
        return cand  # pure-ADC ranking (the oracle-parity face)
    # FAISS refine stage: exact fold-cos over ONLY the k_eff ADC
    # survivors per query (candidate equi-join against the vectors),
    # final top-k by exact cosine.
    p_all = _prepped(df, id_col, vec_col)
    exact = _fold_cos_for_pairs(cand.select("vec_id", "nid"), p_all)
    w_cos = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        exact.withColumn("rank", F.row_number().over(w_cos))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nid", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-space) benchmark decontamination
# ---------------------------------------------------------------------------


def semantic_decontaminate(docs: DataFrame, bench: DataFrame,
                           threshold: float = 0.45,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           bench_id_col: str = "vec_id",
                           bench_vec_col: str = "embedding",
                           candidates: int = 4) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    counterpart of the n-gram ``decontaminate`` family: paraphrased
    eval leakage survives lexical filters, so every corpus row gets
    its nearest benchmark item by cosine plus a ``contaminated`` flag
    at ``threshold``. Output: EXACTLY one row per corpus row
    ``(vec_id, bench_id, cos, contaminated)`` — the same never-drop
    contract as the span-cut cleaners.

    Scale design: the benchmark side is eval-suite-sized (10^3..10^5
    rows) while the corpus side is the big table, so the benchmark
    matrix is collected ONCE (the broadcast-dim discipline of the
    enrichment processors) and shipped into an Arrow-batched map over
    the corpus: the whole operator is a single narrow ``mapInPandas``
    — ZERO shuffles, no join, no explode; each batch does one BLAS
    matmul against the benchmark matrix. The matmul only PICKS
    candidate benchmark ids per row — the top ``candidates`` plus
    everything within 1e-9 of the row's GEMM max, so reassociation-
    scale reorderings between the GEMM and the fold can never push the
    true winner (or the smaller-id member of an exact tie) out of the
    candidate set; the EMITTED cosine is recomputed inside the batch
    as the canonical dimension-sequential double fold (identical IEEE
    op order to :func:`dot` and the DuckDB ``list_sum`` oracle), and
    the winner among candidates is chosen on those exact values
    (ties → smaller bench id) — bit-identical to the cross-join
    baseline while scaling as a pure map.

    Degenerate norms: a zero-norm BENCHMARK vector raises (its cosine
    is NaN against everything — no meaningful nearest-neighbor
    semantics); a zero-norm CORPUS row emits the cross-join baseline's
    row for it — NaN cosine (never ≥ threshold), smallest bench id
    (all-NaN ties break by id)."""
    if not 1 <= candidates:
        raise ValueError("candidates must be >= 1")
    brows = (
        _prepped(bench, bench_id_col, bench_vec_col)
        .select("vec_id", "v").collect()
    )
    if not brows:
        raise ValueError("semantic_decontaminate: empty benchmark set")
    order = sorted(range(len(brows)), key=lambda i: brows[i]["vec_id"])
    bids = np.array([brows[i]["vec_id"] for i in order], dtype=np.int64)
    B = np.stack(
        [np.asarray(brows[i]["v"], dtype=np.float64) for i in order]
    )
    # benchmark norms with the SAME sequential op order as norm():
    # acc += x*x one dimension at a time, then sqrt
    nb = np.zeros(B.shape[0])
    for j in range(B.shape[1]):
        nb += B[:, j] * B[:, j]
    nb = np.sqrt(nb)
    if not np.all(nb > 0):
        raise ValueError(
            "semantic_decontaminate: zero-norm benchmark vector "
            f"(ids {bids[nb == 0][:5].tolist()}) — cosine is undefined"
        )
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast((bids, B, nb))
    cbase = min(candidates, len(bids))
    thr = float(threshold)

    def score(batches):
        bids_, B_, nb_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            na = np.zeros(A.shape[0])
            for j in range(A.shape[1]):
                na += A[:, j] * A[:, j]
            na = np.sqrt(na)
            zero = na == 0
            na_safe = np.where(zero, 1.0, na)
            S = (A @ B_.T) / np.outer(na_safe, nb_)
            # candidate width: at least cbase, widened to cover every
            # entry within 1e-9 of each row's max so GEMM-vs-fold
            # reassociation noise can never drop the true fold winner
            near = (S >= S.max(axis=1, keepdims=True) - 1e-9).sum(axis=1)
            c = int(min(len(bids_), max(cbase, near.max())))
            idx = np.argsort(-S, axis=1, kind="stable")[:, :c]
            # exact fold-cos per candidate: vectorized across rows,
            # SEQUENTIAL across dimensions (the canonical op order)
            best_cos = np.full(A.shape[0], -np.inf)
            best_id = np.zeros(A.shape[0], dtype=np.int64)
            for col in range(c):
                Bi = B_[idx[:, col]]
                acc = np.zeros(A.shape[0])
                for j in range(A.shape[1]):
                    acc += A[:, j] * Bi[:, j]
                cos = acc / (na_safe * nb_[idx[:, col]])
                ids = bids_[idx[:, col]]
                better = (cos > best_cos) | (
                    (cos == best_cos) & (ids < best_id)
                )
                best_cos = np.where(better, cos, best_cos)
                best_id = np.where(better, ids, best_id)
            # zero-norm corpus rows: the cross-join baseline yields NaN
            # cosines everywhere, tie-broken to the smallest bench id
            best_cos = np.where(zero, np.nan, best_cos)
            best_id = np.where(zero, bids_[0], best_id)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "bench_id": best_id,
                "cos": best_cos,
                "contaminated": best_cos >= thr,
            })

    out = _prepped(docs, id_col, vec_col).select("vec_id", "v").mapInPandas(
        score,
        schema="vec_id long, bench_id long, cos double, contaminated boolean",
    )
    # Arrow maps pandas NaN to NULL on the way back; the only NULL this
    # operator can produce IS the zero-norm NaN, so restore it to the
    # baseline's actual NaN double
    return out.withColumn(
        "cos", F.coalesce(F.col("cos"), F.lit(float("nan")))
    )
