"""Deduplication operators: exact, MinHash+LSH, SimHash banding,
n-gram Jaccard.

Scale design (10^9+ documents):

- Exact dedup is a single hash aggregate on the fingerprint — one
  shuffle keyed on a uniform hash (no skew by construction).
- Near-dup never compares all pairs: MinHash signatures band into
  ``bands`` keys and candidates come from an equi-join on
  ``(band, key)`` — the shuffle is keyed on band buckets, and hot
  buckets (boilerplate-heavy corpora) are exactly the skew AQE's
  skew-join splitting handles. Verification (signature agreement /
  exact Jaccard) runs only on candidate pairs.
- SimHash banding is the same trick on the packed 32-bit sketch: equal
  byte in any of 4 positions → candidate; exact Hamming check after.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from beats_spark.corpus.hashing import MERSENNE31, h32, mh_params, shingles, word_tokens


def _cap_hot_buckets(
    banded: DataFrame, keys: Sequence[str], max_bucket: int | None, metric: str
) -> DataFrame:
    """Skip LSH buckets holding more than ``max_bucket`` members before
    the candidate self-join: one boilerplate-heavy bucket of k docs
    emits k² candidate pairs out of the equi-join — AQE's skew split
    handles the SHUFFLE, not the pair-count blowup. Dropping is never
    silent: the row count landing in skipped buckets is attached as an
    ``observe`` metric named ``metric`` (read it from the
    QueryExecutionListener / ``Observation`` after the action), and the
    cut is by WHOLE bucket — a bucket that big is boilerplate, not a
    near-dup cluster you wanted (a real pipeline routes those to an
    exact-dedup pass on the bucket key instead).

    The window count partitions on the same keys as the downstream
    join, so the planner reuses one exchange for both."""
    if max_bucket is None:
        return banded
    w = Window.partitionBy(*keys)
    sized = banded.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
    sized = sized.observe(
        metric,
        F.sum(
            F.when(F.col("_bucket_n") > max_bucket, 1).otherwise(0)
        ).alias("rows_in_dropped_buckets"),
        F.max("_bucket_n").alias("max_bucket_size"),
    )
    return sized.filter(F.col("_bucket_n") <= max_bucket).drop("_bucket_n")


def exact_dedup(df: DataFrame, key_cols: Sequence[str], id_col: str) -> DataFrame:
    """Group identical rows by ``key_cols``; keep the smallest id as
    canonical. Returns (canonical_id, n_copies) per group."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("canonical_id", "n_copies")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-doc MinHash signature via ONE md5 per shingle + a universal
    hash family: ``base = h32(shingle) mod 2^31−1``, ``sig[i] = min of
    (a_i·base + b_i) mod 2^31−1``. Docs with < shingle_k tokens are
    dropped (no shingles → no signature).

    With ``tokens_col`` set, shingles come straight from the
    PRE-TOKENIZED id array (the north-rule input shape) — ids render as
    decimal strings inside the shingle, so no re-tokenization pass and
    the oracle stays bit-checkable.

    One md5 per shingle instead of ``num_hashes`` seeded md5s is a 16×
    cut of the dominant hash cost; the (a, b) family is md5-derived and
    the modulus keeps every product exact in both Spark longs and
    DuckDB BIGINTs, so the oracle regenerates identical signatures.
    The groupBy is a partial+final hash aggregate (map-side combine
    shrinks the shuffle to one row per doc); ``base`` is materialized
    through its own projection so the md5 is evaluated once, not once
    per derived hash.
    """
    params = mh_params(num_hashes)
    toks = (
        F.col(tokens_col).cast("array<string>")
        if tokens_col is not None
        else word_tokens(F.col(text_col))
    )
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(toks, shingle_k)).alias("s"),
    )
    based = sh.select(
        "doc_id", F.pmod(h32(F.col("s")), F.lit(MERSENNE31)).alias("hb")
    )
    hashed = based.select(
        "doc_id",
        *[
            F.pmod(F.lit(a) * F.col("hb") + F.lit(b), F.lit(MERSENNE31)).alias(f"h{i}")
            for i, (a, b) in enumerate(params)
        ],
    )
    agg = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def _band_keys(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Explode per-doc signatures into LSH band rows ``(doc_id, sig,
    band, band_key)`` — band_key is the comma-joined contiguous
    signature slice, the equi-join key that replaces any all-pairs
    comparison."""
    rows = num_hashes // bands
    return sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", b * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc_id", "sig",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    bands: int = 4,
    min_matches: int = 0,
    max_bucket: int | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """MinHash near-dup candidates with signature agreement counts.

    Returns (doc_a, doc_b, sig_matches): all LSH candidate pairs (any
    shared band) with the number of agreeing signature positions;
    ``min_matches`` filters weak candidates (estimated Jaccard ≈
    sig_matches / num_hashes). ``max_bucket`` skips whole band buckets
    above that size before the self-join (see :func:`_cap_hot_buckets`
    — the boilerplate-bucket k² pair-blowup guard; drop counts surface
    via the ``minhash_bucket_cap`` observe metric).
    """
    assert num_hashes % bands == 0
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_k, tokens_col=tokens_col
    )
    banded = _band_keys(sigs, num_hashes, bands)

    banded = _cap_hot_buckets(
        banded, ("band", "band_key"), max_bucket, "minhash_bucket_cap"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    out = pairs.select("doc_a", "doc_b", matches.alias("sig_matches"))
    if min_matches:
        out = out.filter(F.col("sig_matches") >= min_matches)
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    tokens_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard on LSH candidate pairs: intersection/union
    sizes of the distinct shingle sets (integers — exact cross-engine).
    The expensive set intersection runs only on candidates.
    ``tokens_col``: shingle the pre-tokenized id array instead."""
    cands = minhash_neardup_pairs(
        df, id_col, text_col, num_hashes, shingle_k, bands,
        tokens_col=tokens_col,
    ).select("doc_a", "doc_b")
    toks = (
        F.col(tokens_col).cast("array<string>")
        if tokens_col is not None
        else word_tokens(F.col(text_col))
    )
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(shingles(toks, shingle_k)).alias("sh"),
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "doc_a").join(b, "doc_b")
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    n_union = F.size("sh_a") + F.size("sh_b") - n_inter
    return joined.select(
        "doc_a", "doc_b", n_inter.alias("n_inter"), n_union.alias("n_union")
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    max_bucket: int | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """SimHash near-dup: byte-banding the 32-bit sketch (equal byte in
    any of the 4 positions → candidate), exact Hamming check after.
    Returns (doc_a, doc_b, hamming). ``max_bucket`` skips whole byte
    buckets above that size before the self-join (drop counts on the
    ``simhash_bucket_cap`` observe metric). ``tokens_col``: sketch the
    pre-tokenized id array instead of splitting ``text_col``."""
    from beats_spark.corpus.textstats import simhash as _simhash

    src_col = tokens_col if tokens_col is not None else text_col
    s = _simhash(
        df.select(F.col(id_col).alias("doc_id"), src_col),
        text_col, tokens_col=tokens_col,
    )
    s = s.select("doc_id", "simhash")
    banded = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", 8 * b).bitwiseAND(F.lit(255)).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    banded = _cap_hot_buckets(
        banded, ("band", "key"), max_bucket, "simhash_bucket_cap"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def neardup_resolve(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve candidate near-dup PAIRS into clusters — the last mile of
    an actual training-data dedup run (pair emission alone leaves the
    keep-one decision to the caller; exact dedup already has it via
    :func:`exact_dedup`).

    Iterative hash-min connected components over the pair graph, pure
    joins + aggregates (no GraphFrames, no driver-side graph): every
    node starts labeled with its own id; each round a node's label drops
    to the minimum label in its closed neighborhood; fixpoint = every
    node labeled with the smallest id reachable from it (the cluster's
    canonical id). Rounds needed = graph diameter — near-dup clusters
    are shallow (a template and its copies form a near-clique), so this
    converges in a handful of rounds; ``max_iter`` bounds the loop and a
    non-converged graph raises rather than returning wrong clusters.

    Scale: each round is one equi-join of the edge list against the
    current labels plus a min-aggregate — both shuffle on uniformly
    hashed ids. ``localCheckpoint`` truncates the growing lineage each
    round (on a production cluster with lossy executors, point
    ``spark.sparkContext.setCheckpointDir`` at durable storage and swap
    to ``checkpoint`` — the plan is identical). The per-round
    convergence check is a count() action, not a collect of labels.

    Returns (doc_id, canonical_id): one row per node of the pair graph;
    if ``docs`` is given, every document appears (singletons map to
    themselves).
    """
    e = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.distinct().localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lab", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), "lab")
        )
        new_labels = (
            labels.select("id", "lab").union(neigh)
            .groupBy("id")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"neardup_resolve did not converge in {max_iter} iterations"
        )

    clusters = labels.select(
        F.col("id").alias("doc_id"), F.col("lab").alias("canonical_id")
    )
    if docs is None:
        return clusters
    d = docs.select(F.col(id_col).alias("doc_id"))
    return d.join(clusters, "doc_id", "left").select(
        "doc_id", F.coalesce("canonical_id", "doc_id").alias("canonical_id")
    )


def neardup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    priority_col: str | None = None,
) -> DataFrame:
    """Keep-one-per-cluster survivor set: resolve pairs into clusters,
    keep ONE document per cluster plus all singletons — the output an
    LLM training-data dedup pass feeds downstream.

    Default survivor is the cluster's canonical (smallest-id) document.
    ``priority_col`` picks by merit instead — highest priority wins,
    smallest id breaks ties — which is what a real dedup pass does
    (keep the longest / highest-quality copy, drop the rest). The
    selection is a per-cluster window row_number: one shuffle on the
    cluster id, which is near-dup-cluster sized (bounded by the
    hot-bucket caps upstream)."""
    clusters = neardup_resolve(pairs, docs, id_col, a_col, b_col, max_iter)
    if priority_col is None:
        surv = clusters.filter(F.col("doc_id") == F.col("canonical_id")).select(
            F.col("doc_id").alias("__surv_id")
        )
        return docs.join(surv, docs[id_col] == F.col("__surv_id"), "leftsemi")
    cl = clusters.select(
        F.col("doc_id").alias("__cl_id"), "canonical_id"
    )
    j = docs.join(cl, docs[id_col] == F.col("__cl_id"))
    w = Window.partitionBy("canonical_id").orderBy(
        F.col(priority_col).desc(), F.col(id_col).asc()
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__cl_id", "canonical_id")
    )


def incremental_neardup(
    new: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    bands: int = 4,
    min_matches: int = 0,
    max_bucket: int | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus — the operational
    shape at 100 TB: a fresh crawl/shard is checked against the corpus
    you already keep, WITHOUT ever re-pairing existing×existing (the
    full-corpus re-dedup nobody can afford per ingest).

    Two layers, both incremental:

    - **exact**: md5 content fingerprints; a new doc equi-joins the
      existing fingerprint set (``exact_of`` = smallest matching
      existing id).
    - **near**: MinHash band keys of the new batch equi-join the
      existing corpus's band-key index — the same LSH layout as
      :func:`minhash_neardup_pairs`, but one-sided: cost scales with
      |new|·bands, and the existing side's ``(band, band_key, sig)``
      rows are exactly what a production deployment would precompute
      and store as its dedup index. ``near_matches`` is the best
      signature agreement (estimated Jaccard ≈ matches/num_hashes),
      ``near_of`` the smallest qualifying existing id;
      ``min_matches`` filters weak candidates.

    Row contract: ONE output row per new doc, always — clean docs
    carry null ``exact_of``/``near_of`` and ``near_matches = 0``
    (never a dropped row; same contract as cleaning._cut_spans).
    ``max_bucket`` caps hot existing-side buckets (boilerplate bands)
    before the join, via :func:`_cap_hot_buckets`.

    With ``tokens_col``, both layers run on the pre-tokenized id
    arrays (north-rule shape): the fingerprint is md5 of the
    space-joined ids and shingles come from the id array.
    """
    if tokens_col is not None:
        key = F.array_join(F.col(tokens_col).cast("array<string>"), " ")
    else:
        key = F.col(text_col)
    nfp = new.select(F.col(id_col).alias("doc_id"), F.md5(key).alias("fp"))
    efp = (
        existing.select(F.col(id_col).alias("e_id"), F.md5(key).alias("fp"))
        .groupBy("fp")
        .agg(F.min("e_id").alias("exact_of"))
    )
    exact = nfp.join(efp, "fp", "left").select("doc_id", "exact_of")

    nsig = minhash_signatures(
        new, id_col, text_col, num_hashes, shingle_k, tokens_col=tokens_col
    )
    esig = minhash_signatures(
        existing, id_col, text_col, num_hashes, shingle_k, tokens_col=tokens_col
    )
    nb = _band_keys(nsig, num_hashes, bands)
    eb = _cap_hot_buckets(
        _band_keys(esig, num_hashes, bands),
        ("band", "band_key"),
        max_bucket,
        "incremental_bucket_cap",
    )
    cand = (
        nb.alias("n")
        .join(eb.alias("e"), ["band", "band_key"])
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("e.doc_id").alias("e_id"),
            F.col("n.sig").alias("sig_n"),
            F.col("e.sig").alias("sig_e"),
        )
        .dropDuplicates(["doc_id", "e_id"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_n", "sig_e", lambda x, y: x == y), lambda eq: eq
        )
    )
    scored = cand.select("doc_id", "e_id", matches.alias("sig_matches"))
    if min_matches:
        scored = scored.filter(F.col("sig_matches") >= min_matches)
    near = scored.groupBy("doc_id").agg(
        F.max("sig_matches").alias("near_matches"),
        F.min("e_id").alias("near_of"),
    )
    base = new.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.col("exact_of").isNotNull().alias("exact_dup"),
            "exact_of",
            F.coalesce("near_matches", F.lit(0)).cast("int").alias(
                "near_matches"
            ),
            "near_of",
        )
    )


def dup_profile(df: DataFrame, key_cols: Sequence[str] = ("text",),
                id_col: str = "doc_id") -> DataFrame:
    """Duplication profile datacard: the cluster-SIZE histogram of
    exact duplicates — for each multiplicity ``n_copies``, how many
    distinct texts occur exactly that often, how many document rows
    they account for, and how many of those rows are excess (would be
    removed by keep-one dedup). The curve is the standard corpus-audit
    view of duplicate load (Lee et al. 2021, arXiv:2107.06499 §4
    reports exactly this shape for C4/RealNews) and sizes the payoff
    of a dedup pass before running it.

    Scale: two partial+final hash aggregations back to back —
    groupBy(key) → count, then groupBy(count) → stats. The second
    input is one row per DISTINCT text and the output is one row per
    distinct multiplicity (tens of rows at any corpus size); nothing
    is collected, nothing is wide."""
    sizes = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    return (
        sizes.groupBy("n_copies")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "n_copies",
            "n_clusters",
            (F.col("n_copies") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("n_copies") - F.lit(1)) * F.col("n_clusters")).alias(
                "n_excess"
            ),
        )
    )


def source_overlap(df: DataFrame, source_col: str = "source",
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Cross-source duplicate overlap matrix: for every unordered pair
    of sources, the number of distinct text fingerprints present in
    BOTH, each side's distinct-fingerprint count, and the Jaccard
    overlap of the two fingerprint sets (integer ppm). This is the
    mixture-design audit — two feeds that are largely the same corpus
    (a recrawl, a mirror, a re-release) show up as a high-Jaccard
    pair, and their mixture weights double-count unless one is
    deduped against the other.

    Scale: distinct (source, fp) pairs — one hash aggregate whose
    output is bounded by the corpus's distinct-text count — then a
    self-equi-join ON THE FINGERPRINT (shuffle join keyed by fp; a
    fingerprint appearing in k sources expands to k·(k-1)/2 pair rows,
    so the join output is bounded by duplicate volume, never
    all-pairs), then a final tiny aggregate with one row per source
    pair. Per-source totals ride along via two broadcast joins of a
    #sources-row aggregate. Jaccard is emitted as integer ppm over
    exact long counts (< 2^53), so the double division is correctly
    rounded and the value reproduces bit-identically on any engine."""
    fp = df.select(
        F.col(source_col).alias("source"), F.md5(text_col).alias("fp")
    ).distinct()
    per_source = fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    a, b = fp.alias("a"), fp.alias("b")
    shared = (
        a.join(b, "fp")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pa = per_source.select(
        F.col("source").alias("source_a"), F.col("n_distinct").alias("n_a")
    )
    pb = per_source.select(
        F.col("source").alias("source_b"), F.col("n_distinct").alias("n_b")
    )
    out = (
        shared.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_shared")
    return out.select(
        "source_a",
        "source_b",
        "n_shared",
        "n_a",
        "n_b",
        F.round(
            F.col("n_shared").cast("double") * 1_000_000.0
            / union.cast("double")
        ).cast("long").alias("jaccard_ppm"),
    )


def soft_dedup_weights(df: DataFrame, key_cols: Sequence[str] = ("text",),
                       id_col: str = "doc_id",
                       sharpness: float = 1.0) -> DataFrame:
    """SoftDeDup-style duplicate reweighting (arXiv:2407.06654): keep
    every document but scale its training/sampling weight down by its
    exact-duplicate multiplicity — ``weight = n_copies ** -sharpness``
    (ppm-quantized). At ``sharpness=1`` a duplicate group's weights sum
    to ~1e6, so each distinct text contributes one unit of effective
    training mass no matter how many times it was crawled; the hard
    keep-one dedup is the ``sharpness → ∞`` limit. The soft form keeps
    the corpus's coverage (no document vanishes) while removing the
    gradient over-counting hard dedup targets.

    Scale: rows are fingerprinted once (md5, narrow), counted with one
    partial+final hash aggregate, and the counts join back on the
    32-char fingerprint — the shuffle never carries document text
    twice. Output is one row per input document.

    ``sharpness=1`` computes ``round(1e6 / n)`` as a SINGLE double
    division so the value reproduces bit-identically cross-engine;
    other sharpness values go through ``pow`` (two roundings — exact in
    practice but not certified at rounding boundaries)."""
    key = key_cols[0] if len(key_cols) == 1 else F.concat_ws(
        "\x1f", *key_cols
    )
    fp = df.select(F.col(id_col), F.md5(key).alias("fp"))
    counts = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    if sharpness == 1.0:
        w = F.round(F.lit(1_000_000.0) / F.col("n_copies"))
    else:
        w = F.round(
            F.pow(F.col("n_copies").cast("double"),
                  F.lit(-float(sharpness))) * 1_000_000.0
        )
    return fp.join(counts, "fp").select(
        id_col, "n_copies", w.cast("long").alias("weight_ppm")
    )


def neardup_profile(clusters: DataFrame, canon_col: str = "canonical_id"
                    ) -> DataFrame:
    """Near-duplicate load curve: the cluster-size histogram over
    resolved near-dup clusters (the :func:`neardup_resolve` output) —
    the fuzzy-dedup analog of :func:`dup_profile`'s exact-duplicate
    curve (Lee et al. 2021 §4). For each cluster size ``n_members``:
    how many clusters, how many documents they hold, and how many are
    excess under keep-one survivorship. Feed it the resolve over ALL
    docs (pass ``docs=`` to neardup_resolve) so singletons appear as
    the ``n_members=1`` row and ``n_docs`` sums to the corpus size.

    Scale: two chained partial+final hash aggregates over the
    (doc, canonical) table — same zero-wide-operator shape as
    dup_profile; output is one row per distinct cluster size."""
    sizes = clusters.groupBy(canon_col).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        sizes.groupBy("n_members")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "n_members",
            "n_clusters",
            (F.col("n_members") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("n_members") - F.lit(1)) * F.col("n_clusters")).alias(
                "n_excess"
            ),
        )
    )


def split_leakage_report(split_docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         split_col: str = "split") -> DataFrame:
    """Cross-split leakage audit: which near-dup pairs STRADDLE a
    train/val/test boundary. A plain per-id split leaks — a test doc's
    near-copy lands in train with probability ~= train fraction — and
    this report makes that measurable before training: run it over the
    split assignment and the LSH candidate pairs; every returned row is
    a document whose evaluation-split twin is trainable. The
    leakage-safe split (``split_assign(by_col='canonical_id')``, driver
    query ``split_leakage_safe``) must produce ZERO rows here — that
    invariant is pinned in tests.

    Scale: the pair list (bounded by LSH candidate volume, never
    all-pairs) equi-joins twice against the narrow (id, split)
    projection — both shuffles keyed on uniformly-hashed doc ids;
    output ∝ leaking pairs only."""
    s = split_docs.select(F.col(id_col), F.col(split_col))
    sa = s.select(F.col(id_col).alias("doc_a"),
                  F.col(split_col).alias("split_a"))
    sb = s.select(F.col(id_col).alias("doc_b"),
                  F.col(split_col).alias("split_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b")
    )
