"""Corpus-cleaning operators: PII redaction, cross-document line
dedup, and benchmark decontamination — the standard passes between raw
scrape and tokenization in an LLM training-data pipeline.

All three are Spark-first: redaction is chained ``regexp_replace``
column expressions (narrow, whole-stage codegen); line dedup is an
explode → hash-aggregate → semi-join (two keyed shuffles on uniform
md5 keys); decontamination is an n-gram hash equi-join against the
benchmark side (broadcast when the benchmark is small, as it always
is), never a scan of document pairs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from beats_spark.corpus.hashing import h32, shingles, word_tokens

#: redaction patterns, applied in order: most-specific first (email
#: before phone so user@host digits don't half-match; SSN and IP before
#: phone, whose loose digit-run pattern would swallow both).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def pii_redact(df: DataFrame, text_col: str = "text",
               target: str | None = None,
               patterns: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """Replace PII spans with typed placeholder tokens (the standard
    pre-training scrub). Patterns chain as nested ``regexp_replace``
    calls — one projection, no Python. Adds ``<name>_redactions``
    count columns (how many spans each rule hit) so the pass is
    auditable, then the redacted text."""
    pats = patterns if patterns is not None else PII_PATTERNS
    c: Column = F.col(text_col)
    out: dict[str, Column] = {}
    for name, rx, token in pats:
        # count before replacing: occurrences = how many times the
        # pattern extracts (regexp_extract_all on the CURRENT text)
        out[f"{name}_redactions"] = F.size(F.regexp_extract_all(c, F.lit(rx), 0))
        c = F.regexp_replace(c, rx, token)
    out[target or text_col] = c
    return df.withColumns(out)


def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", min_count: int = 2,
               min_line_chars: int = 8) -> DataFrame:
    """C4-style cross-document line dedup: any line (trimmed, ≥
    ``min_line_chars`` chars) occurring in ``min_count`` or more
    DISTINCT documents is boilerplate — remove it from every document.

    Plan: explode lines (keeping position) → hash-aggregate distinct-doc
    counts per line hash (map-side combine collapses within-partition
    repeats) → the boilerplate set joins back by hash — a shuffle join
    on the uniform md5 key (broadcast if the boilerplate set is small,
    which AQE decides from its actual size) → surviving lines reassemble
    in position order. Returns (doc_id, text) with boilerplate lines
    removed; short lines are exempt (never removed) like C4's rule.
    Every input doc keeps its row — a document whose every
    qualifying line is boilerplate comes back with ``text = ''``
    (same one-row-per-doc contract as :func:`_cut_spans` /
    :func:`line_dedup_within`, so funnel/doc counts stay honest).
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lh", F.md5(F.trim("line")))
    boiler = (
        lines.filter(F.length(F.trim("line")) >= min_line_chars)
        .groupBy("lh")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_count)
        .select("lh")
    )
    kept = lines.join(
        boiler.withColumn("_boiler", F.lit(True)), "lh", "left"
    ).filter(
        F.col("_boiler").isNull() | (F.length(F.trim("line")) < min_line_chars)
    )
    re = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text")
    )
    # a fully-boilerplate doc has no surviving exploded line and
    # would vanish from the groupBy — left-join back to the input ids
    # so every doc keeps its row (text = '').
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(re, "doc_id", "left").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )


def line_dedup_within(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """C4's WITHIN-document line dedup (the other half of
    :func:`line_dedup`'s cross-document pass): keep the first
    occurrence of each exact line inside a document, drop later
    repeats. Explode lines with position → per-(doc, line) keep-first
    (row_number over a doc-local window — partitions are
    document-sized, no hot key) → reassemble in position order.
    Returns (doc_id, n_lines, dup_lines, cleaned_text); rows never
    drop."""
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    w = Window.partitionBy("doc_id", "line").orderBy("pos")
    kept = lines.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    re = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_n"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("cleaned_text"),
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    return totals.join(re, "doc_id").select(
        "doc_id", "n_lines",
        (F.col("n_lines") - F.col("kept_n")).cast("long").alias("dup_lines"),
        "cleaned_text",
    )


def decontaminate(df: DataFrame, benchmark: DataFrame, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text") -> DataFrame:
    """GPT-3-style benchmark decontamination: flag any training
    document sharing an ``n``-gram (word-level, default 13 per the
    GPT-3 appendix) with the evaluation/benchmark corpus.

    Plan: both sides reduce to distinct n-gram hashes; contaminated =
    semi-join of document grams against benchmark grams (the benchmark
    side is tiny → broadcast). Returns (doc_id, contaminated,
    n_shared_ngrams) — callers drop or quarantine flagged docs.
    """
    def grams(frame: DataFrame, idc: Column, txt: str) -> DataFrame:
        g = F.explode(
            F.array_distinct(shingles(word_tokens(F.col(txt)), n))
        ).alias("gram")
        return frame.select(idc.alias("_gid"), g).select(
            "_gid", h32(F.col("gram")).alias("gh")
        )

    doc_grams = grams(df, F.col(id_col), text_col)
    bench_grams = grams(benchmark, F.lit(0), bench_text_col).select("gh").distinct()
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gh")
        .groupBy("_gid")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return df.select(F.col(id_col).alias("doc_id")).join(
        hits.withColumnRenamed("_gid", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("n_shared_ngrams", F.lit(0)).alias("n_shared_ngrams"),
        (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
    )


def contamination_report(df: DataFrame, benchmark: DataFrame, n: int = 13,
                         id_col: str = "doc_id", text_col: str = "text",
                         bench_id_col: str = "doc_id",
                         bench_text_col: str = "text") -> DataFrame:
    """The audit face of :func:`decontaminate`: WHICH benchmark item
    contaminated WHICH training document. One row per (train doc,
    benchmark doc) pair sharing ≥1 word ``n``-gram, with the count of
    distinct shared grams — what an eval-integrity review actually
    reads. Same plan shape: distinct gram hashes on both sides, the
    benchmark side broadcast; the join output is proportional to
    contamination, not corpus size."""
    def grams(frame: DataFrame, idc: str, txt: str, out: str) -> DataFrame:
        return frame.select(
            F.col(idc).alias(out),
            F.explode(
                F.array_distinct(shingles(word_tokens(F.col(txt)), n))
            ).alias("gram"),
        ).select(out, h32(F.col("gram")).alias("gh"))

    doc_g = grams(df, id_col, text_col, "doc_id")
    bench_g = grams(benchmark, bench_id_col, bench_text_col, "bench_id")
    return (
        doc_g.join(F.broadcast(bench_g), "gh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


def substring_dedup(df: DataFrame, min_len: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """ExactSubstr-style dedup (Lee et al. 2021, arXiv:2107.06499):
    remove every occurrence-but-the-first of any ``min_len``-token
    substring that repeats ANYWHERE in the corpus (across documents or
    within one), merging overlapping duplicated windows into maximal
    spans before cutting.

    The paper builds a corpus-wide suffix array; the Spark-first
    equivalent works at token-window granularity: every ``min_len``-gram
    occurrence keyed by content hash, the globally-first occurrence
    (min (doc_id, pos) — a combinable min-of-struct aggregate, NOT a
    per-gram window, so a boilerplate gram with 10^6 occurrences never
    serializes a hot reducer) survives, and all later occurrences mark
    their window for removal. Overlapping windows merge by the classic
    gaps-and-islands running-max (one per-document window — partitions
    are document-sized), so a duplicated run of m > min_len tokens cuts
    as ONE span, approximating the suffix-array maximal match to within
    gram granularity at the span edges. Coverage explodes to one row
    per REMOVED token (proportional to dup volume, not corpus size);
    survivors reassemble in position order.

    Returns one row per input document:
    ``(doc_id, n_tokens, dup_tokens, cleaned_text)`` — a fully-cut
    document yields ``cleaned_text = ''``, never a dropped row."""
    base = df.select(
        F.col(id_col).alias("doc_id"), word_tokens(F.col(text_col)).alias("toks")
    )
    return _cut_spans(base, _repeat_windows(base, min_len), min_len)


def _repeat_windows(base: DataFrame, min_len: int) -> DataFrame:
    """All-but-first occurrences of repeated ``min_len``-grams in
    ``base`` (doc_id, toks): gram occurrences keyed by content hash,
    the global min (doc_id, pos) per gram survives (a combinable
    min-of-struct aggregate, never a per-gram window), every later
    occurrence emits its (doc_id, s) removal window."""
    occ = base.select(
        "doc_id", F.posexplode(shingles(F.col("toks"), min_len)).alias("s", "gram")
    ).select("doc_id", "s", F.md5("gram").alias("gh"))
    firsts = occ.groupBy("gh").agg(
        F.min(F.struct("doc_id", "s")).alias("f"),
        F.count(F.lit(1)).alias("occ_n"),
    )
    return (
        occ.join(firsts, "gh")
        .filter(
            (F.col("occ_n") > 1)
            & ~((F.col("f.doc_id") == F.col("doc_id")) & (F.col("f.s") == F.col("s")))
        )
        .select("doc_id", "s")
    )


def substring_dedup_tokens(df: DataFrame, min_len: int = 5,
                           id_col: str = "doc_id",
                           tokens_col: str = "tokens") -> DataFrame:
    """ExactSubstr dedup over PRE-TOKENIZED sequences — the paper's
    actual setting (Lee et al. 2021 run their suffix array over token
    ids, not words) and the north-rule input shape
    ``(doc_id, tokens:array<int>, …)``. Same plan as
    :func:`substring_dedup` (gram-hash keyed windows, keep-first by
    global min (doc_id, pos), gaps-and-islands span merge); grams key
    on the decimal rendering of the ids, so no re-tokenization pass and
    an independent SQL oracle reproduces every hash.

    Returns one row per input document:
    ``(doc_id, n_tokens, dup_tokens, cleaned_tokens)`` — the cleaned
    sequence as an int array (empty, never null, for a fully-cut doc)."""
    elem_type = [f.dataType for f in df.schema.fields if f.name == tokens_col][
        0
    ].elementType.simpleString()
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("array<string>").alias("toks"),
    )
    out = _cut_spans(base, _repeat_windows(base, min_len), min_len)
    cleaned = (
        F.when(F.col("cleaned_text") == "", F.array().cast(f"array<{elem_type}>"))
        .otherwise(F.split("cleaned_text", " ").cast(f"array<{elem_type}>"))
    )
    return out.select(
        "doc_id", "n_tokens", "dup_tokens", cleaned.alias("cleaned_tokens")
    )


def _cut_spans(base: DataFrame, dups: DataFrame, min_len: int) -> DataFrame:
    """Cut every ``[s, s+min_len)`` window in ``dups`` (doc_id, s) from
    ``base`` (doc_id, toks): gaps-and-islands merge of overlapping
    windows → coverage explode (one row per REMOVED token) → anti-join
    → reassembly in position order. One row per base document; a
    fully-cut doc keeps its row with empty text."""
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_end = F.max(F.col("s") + F.lit(min_len)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dups.withColumn(
        "ni",
        F.when(F.col("s") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn("iid", F.sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    spans = isl.groupBy("doc_id", "iid").agg(
        F.min("s").alias("st"), (F.max("s") + F.lit(min_len)).alias("en")
    )
    cov = spans.select(
        "doc_id", F.explode(F.sequence("st", F.col("en") - 1)).alias("pos")
    )
    tokpos = base.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    kept = tokpos.join(cov, ["doc_id", "pos"], "left_anti")
    re = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_n"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("cleaned_text"),
    )
    return (
        base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(re, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("kept_n", F.lit(0)))
            .cast("long").alias("dup_tokens"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


def decontaminate_spans(df: DataFrame, benchmark: DataFrame, n: int = 13,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_text_col: str = "text") -> DataFrame:
    """Span-level benchmark decontamination: instead of dropping whole
    documents (:func:`decontaminate`), CUT every ``n``-gram span a
    training document shares with the benchmark corpus — the surgical
    variant real pipelines use when dropping a long document over one
    quoted benchmark line is too destructive. Overlapping contaminated
    windows merge to maximal spans (same gaps-and-islands cutter as
    :func:`substring_dedup`; unlike it there is NO keep-first: every
    overlapping occurrence is removed).

    Plan: document n-gram occurrences keyed by hash, semi-joined
    against the benchmark's distinct gram hashes (tiny → broadcast);
    the cut stage's coverage explode is proportional to contaminated
    volume only. Returns
    ``(doc_id, n_tokens, dup_tokens, cleaned_text)`` — one row per
    input document, ``dup_tokens`` = tokens removed."""
    base = df.select(
        F.col(id_col).alias("doc_id"), word_tokens(F.col(text_col)).alias("toks")
    )
    occ = base.select(
        "doc_id", F.posexplode(shingles(F.col("toks"), n)).alias("s", "gram")
    ).select("doc_id", "s", F.md5("gram").alias("gh"))
    bench = (
        benchmark.select(
            F.explode(F.array_distinct(
                shingles(word_tokens(F.col(bench_text_col)), n)
            )).alias("gram")
        )
        .select(F.md5("gram").alias("gh"))
        .distinct()
    )
    dups = occ.join(F.broadcast(bench), "gh", "leftsemi").select("doc_id", "s")
    return _cut_spans(base, dups, n)


def decontaminate_spans_tokens(df: DataFrame, benchmark: DataFrame,
                               n: int = 13, id_col: str = "doc_id",
                               tokens_col: str = "tokens",
                               bench_tokens_col: str = "tokens") -> DataFrame:
    """Span-level decontamination over PRE-TOKENIZED sequences (the
    north-rule shape): cut every ``n``-id span a training sequence
    shares with the tokenized benchmark. Same plan as
    :func:`decontaminate_spans` — grams key on the decimal renderings,
    benchmark grams broadcast, NO keep-first. Returns
    ``(doc_id, n_tokens, dup_tokens, cleaned_tokens)`` with the cleaned
    sequence as an int array (empty, never null, for a fully-cut doc)."""
    elem_type = [f.dataType for f in df.schema.fields if f.name == tokens_col][
        0
    ].elementType.simpleString()
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("array<string>").alias("toks"),
    )
    occ = base.select(
        "doc_id", F.posexplode(shingles(F.col("toks"), n)).alias("s", "gram")
    ).select("doc_id", "s", F.md5("gram").alias("gh"))
    bench = (
        benchmark.select(
            F.explode(F.array_distinct(
                shingles(F.col(bench_tokens_col).cast("array<string>"), n)
            )).alias("gram")
        )
        .select(F.md5("gram").alias("gh"))
        .distinct()
    )
    dups = occ.join(F.broadcast(bench), "gh", "leftsemi").select("doc_id", "s")
    out = _cut_spans(base, dups, n)
    cleaned = (
        F.when(F.col("cleaned_text") == "", F.array().cast(f"array<{elem_type}>"))
        .otherwise(F.split("cleaned_text", " ").cast(f"array<{elem_type}>"))
    )
    return out.select(
        "doc_id", "n_tokens", "dup_tokens", cleaned.alias("cleaned_tokens")
    )
