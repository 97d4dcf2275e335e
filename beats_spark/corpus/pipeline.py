"""End-to-end corpus cleaning pipeline — the composition a training-data
preparation run actually executes, as ONE operator:

    raw docs → quality rules (C4/Gopher) → benchmark decontamination
             → near-duplicate resolution (MinHash+LSH → connected
               components → keep-one survivors) → tokenized output

Every stage is an already-tested operator from this package; the value
of the composition is (a) the funnel accounting a real run needs (how
many documents each stage removed) and (b) getting the stage ordering
and re-materialization right:

- **quality** is a narrow projection (pure column expressions) — it
  runs fused into the scan, so it goes FIRST: every later stage sees
  only passing documents and the expensive gram/minhash work shrinks.
- **decontamination** grams are computed over quality survivors only;
  the benchmark side is tiny and broadcasts (`cleaning.decontaminate`).
- **near-dup** candidate pairs come from LSH bands over the already
  twice-filtered set — at 100 TB this is the dominant stage and the
  filtering order above is what keeps its input minimal.
- the twice-filtered set is **materialized once** (`localCheckpoint`)
  before the near-dup stage consumes it repeatedly (band build,
  survivor semi-join, tokenize, funnel count); without it the
  regex-heavy quality lineage would recompute 4×. A production run
  materializes stage outputs to durable storage instead (the spool,
  `beats_spark/spool.py`) — same idea, crash-safe.

Scale (SCALE.md conventions): quality is narrow; decon is one
broadcast semi-join; near-dup is banded equi-joins + the bounded
hash-min CC loop (`dedup.neardup_resolve`) — no stage is quadratic in
the corpus and the funnel counts are partial aggregates of a handful
of rows each.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beats_spark.corpus import cleaning, dedup, textstats, tokens

#: DEFAULT funnel stage names, in execution order (stage_no = index);
#: the optional lm filter inserts a "lm_quality" stage after "quality"
FUNNEL_STAGES = ["raw", "quality", "decontaminated", "neardup_survivors"]


@dataclass
class CorpusPipelineResult:
    """Outputs of :func:`clean_corpus`.

    survivors: the input columns, documents surviving every stage;
    tokenized: (doc_id, tokens, n_tok) for the survivors;
    funnel:    (stage_no, stage, n_docs) — documents remaining after
               each stage, one row per :data:`FUNNEL_STAGES` entry.
    """

    survivors: DataFrame
    tokenized: DataFrame
    funnel: DataFrame


def _count_stage(df: DataFrame, stage_no: int, stage: str) -> DataFrame:
    return df.select(F.count(F.lit(1)).alias("n_docs")).select(
        F.lit(stage_no).alias("stage_no"), F.lit(stage).alias("stage"), "n_docs"
    )


def clean_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    decontam_n: int = 13,
    materialize: bool = True,
    quality_overrides: dict | None = None,
    lm_thresholds: tuple[float, float] | None = None,
    lm_keep: tuple[str, ...] = ("head", "middle"),
    substring_min_len: int | None = None,
) -> CorpusPipelineResult:
    """Run the full cleaning composition. ``benchmark`` is the eval
    corpus to decontaminate against (``bench_text_col`` = ``text``).

    Optional stages (both default OFF — the 4-stage composition above
    is the oracle-checked baseline):

    - ``lm_thresholds``: after the rule filter, score survivors with
      :func:`textstats.lm_score` and keep only ``lm_keep`` perplexity
      buckets (CCNet keeps head+middle). Adds a ``lm_quality`` funnel
      stage. The LM trains on the rule-filtered set itself.
    - ``substring_min_len``: after near-dup survival, cut repeated
      substrings from the surviving TEXT with
      :func:`cleaning.substring_dedup` (ExactSubstr) before
      tokenization — document count is unchanged (rows never drop),
      so the funnel is unchanged; the tokenized output shrinks.

    Note: the near-dup stage resolves clusters EAGERLY at call time
    (the CC loop in :func:`dedup.neardup_resolve` runs bounded
    localCheckpoint+count rounds), and ``lm_thresholds`` adds the LM
    total's eager scan — this function does work, not just
    plan-building; time the call, not only the materialize.
    """
    # 1. quality — narrow, keeps original columns, no join needed
    kept_q = (
        textstats.quality_filters(docs, text_col=text_col,
                                  **(quality_overrides or {}))
        .filter(F.col("passes_quality"))
        .select(*docs.columns)
    )

    stages: list[tuple[str, DataFrame]] = [("raw", docs), ("quality", kept_q)]

    # 1b. optional CCNet-style LM filter over rule survivors
    if lm_thresholds is not None:
        scored = textstats.lm_score(kept_q, text_col=text_col, id_col=id_col,
                                    thresholds=lm_thresholds)
        lm_ids = scored.filter(F.col("ppl_bucket").isin(*lm_keep)).select(id_col)
        kept_q = kept_q.join(lm_ids, id_col, "leftsemi")
        stages.append(("lm_quality", kept_q))

    # 2. decontamination — grams over quality survivors only
    decon = cleaning.decontaminate(
        kept_q, benchmark, n=decontam_n, id_col=id_col, text_col=text_col
    )
    clean_ids = decon.filter(~F.col("contaminated")).select(
        F.col("doc_id").alias(id_col)
    )
    kept_d = kept_q.join(clean_ids, id_col, "leftsemi")
    if materialize:
        kept_d = kept_d.localCheckpoint(eager=True)
    stages.append(("decontaminated", kept_d))

    # 3. near-dup resolution — pairs, clusters, keep-one survivors
    pairs = dedup.minhash_neardup_pairs(
        kept_d, id_col=id_col, text_col=text_col
    ).select("doc_a", "doc_b")
    survivors = dedup.neardup_survivors(kept_d, pairs, id_col=id_col)
    stages.append(("neardup_survivors", survivors))

    # 3b. optional ExactSubstr cut on surviving text (rows never drop)
    to_tokenize = survivors
    if substring_min_len is not None:
        cut = cleaning.substring_dedup(
            survivors, min_len=substring_min_len, id_col=id_col,
            text_col=text_col,
        ).select(F.col("doc_id").alias(id_col),
                 F.col("cleaned_text").alias(text_col))
        other = [c for c in survivors.columns if c != text_col]
        to_tokenize = survivors.select(*other).join(cut, id_col)

    # 4. tokenize survivors
    tokenized = tokens.tokenize_ids(to_tokenize, text_col=text_col,
                                    id_col=id_col)

    funnel = reduce(
        DataFrame.unionAll,
        [
            _count_stage(frame, i, name)
            for i, (name, frame) in enumerate(stages)
        ],
    )
    return CorpusPipelineResult(survivors=survivors, tokenized=tokenized,
                                funnel=funnel)


#: token-pipeline funnel stages, in execution order
TOKEN_FUNNEL_STAGES = [
    "raw", "degeneracy", "decontaminated", "substring_dedup",
    "exact_dedup", "packed",
]


@dataclass
class TokenPipelineResult:
    """Outputs of :func:`clean_tokens`.

    survivors: (doc_id, tokens) after every cut/filter/dedup stage;
    packed:    the training sequences (pack_sequences output);
    funnel:    (stage_no, stage, n_docs, n_tokens) per stage — for
               "packed", n_docs is the SEQUENCE count.
    """

    survivors: DataFrame
    packed: DataFrame
    funnel: DataFrame


def _count_tokens_stage(df: DataFrame, stage_no: int, stage: str,
                        tokens_col: str = "tokens") -> DataFrame:
    return df.agg(
        F.lit(stage_no).alias("stage_no"),
        F.lit(stage).alias("stage"),
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size(tokens_col)), F.lit(0)).cast("long")
        .alias("n_tokens"),
    )


def clean_tokens(
    t: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_tok: int = 5,
    max_run: int = 4,
    max_dup_bigram: float = 0.3,
    decontam_n: int = 13,
    substring_min_len: int = 5,
    max_len: int = 128,
    materialize: bool = True,
    packing: str = "concat",
) -> TokenPipelineResult:
    """The token-native cleaning composition — the north-rule shape
    ``(doc_id, tokens:array<int>, …)`` in, training sequences out,
    with the funnel accounting a real run needs:

        pre-tokenized corpus
          → degeneracy filter  (token_stats rules: length, longest
            single-id run, repeated-bigram mass — narrow, fused into
            the scan, so every later gram stage sees less)
          → span decontamination vs the tokenized benchmark
            (decontaminate_spans_tokens: shared n-id spans CUT,
            rows never drop)
          → corpus-wide ExactSubstr cut (substring_dedup_tokens:
            all-but-first occurrences of repeated id windows)
          → drop-empty + exact dedup on the final arrays (identical
            sequences keep the smallest id)
          → packing into training rows: ``packing='concat'`` is
            pack_sequences (GPT-style concat-then-chunk, docs may
            straddle); ``packing='bins'`` is pack_bins_sequences
            (no-split FFD bins with the document boundary table)

    Stage outputs after the two cut stages are **materialized once**
    (`localCheckpoint`) before the gram-explode of the next stage
    consumes them repeatedly — same discipline as :func:`clean_corpus`
    (a production run spools to durable storage instead). Every stage
    is linear in corpus tokens; nothing is quadratic in documents."""
    base = t.select(F.col(id_col).alias("doc_id"),
                    F.col(tokens_col).alias("tokens"))
    stages: list[tuple[str, DataFrame]] = [("raw", base)]

    # 1. degeneracy filter — narrow scan
    st = tokens.token_stats(base, id_col="doc_id", tokens_col="tokens")
    ok = st.filter(
        (F.col("n_tok") >= min_tok)
        & (F.col("max_run_len") <= max_run)
        & (F.coalesce(F.col("dup_bigram_frac"), F.lit(0.0)) <= max_dup_bigram)
    ).select("doc_id")
    k1 = base.join(ok, "doc_id", "leftsemi")
    stages.append(("degeneracy", k1))

    # 2. span decontamination — rows never drop, arrays shrink
    k2 = cleaning.decontaminate_spans_tokens(
        k1, benchmark, n=decontam_n,
        bench_tokens_col=tokens_col if tokens_col in benchmark.columns
        else benchmark.columns[0],
    ).select("doc_id", F.col("cleaned_tokens").alias("tokens"))
    if materialize:
        k2 = k2.localCheckpoint(eager=True)
    stages.append(("decontaminated", k2))

    # 3. corpus-wide ExactSubstr cut
    k3 = cleaning.substring_dedup_tokens(
        k2, min_len=substring_min_len
    ).select("doc_id", F.col("cleaned_tokens").alias("tokens"))
    if materialize:
        k3 = k3.localCheckpoint(eager=True)
    stages.append(("substring_dedup", k3))

    # 4. drop-empty + exact dedup on the final arrays
    nonempty = k3.filter(F.size("tokens") > 0)
    keep = nonempty.groupBy("tokens").agg(F.min("doc_id").alias("doc_id")) \
        .select("doc_id")
    k4 = nonempty.join(keep, "doc_id", "leftsemi")
    stages.append(("exact_dedup", k4))

    # 5. pack into training sequences
    if packing == "bins":
        packed = tokens.pack_bins_sequences(k4, max_len=max_len)
    else:
        packed = tokens.pack_sequences(k4, max_len=max_len)

    funnel = reduce(
        DataFrame.unionAll,
        [
            _count_tokens_stage(frame, i, name)
            for i, (name, frame) in enumerate(stages)
        ]
        + [
            packed.agg(
                F.lit(len(stages)).alias("stage_no"),
                F.lit("packed").alias("stage"),
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum(F.size("tokens")), F.lit(0)).cast("long")
                .alias("n_tokens"),
            )
        ],
    )
    return TokenPipelineResult(survivors=k4, packed=packed, funnel=funnel)
