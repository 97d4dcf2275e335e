"""End-to-end corpus cleaning composition (corpus/pipeline.py):
quality → decontamination → near-dup resolution → tokenize, with
stage-funnel accounting."""

from __future__ import annotations

from beats_spark.corpus import pipeline as cpipe

from tests.conftest import rows

# 12 words each: too short to EVER produce a 13-gram, so these can
# never be flagged by decontamination; long enough for 3-shingles.
T_BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
T_UNIQ = "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
# benchmark doc: 14 words -> produces 13-grams
T_BENCH = ("zero one two three four five six seven eight nine "
           "ten eleven twelve thirteen")

OVR = {"min_words": 5, "min_distinct_stopwords": 0}


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, T_BASE),                     # survives everything
            (2, T_BASE),                     # near-dup of 1 -> resolved away
            (3, "aa bb"),                    # fails quality (min_words)
            (4, T_BENCH + " tail words"),    # contaminated (shares 13-gram)
            (5, T_UNIQ),                     # survives
        ],
        "doc_id long, text string",
    )


def test_clean_corpus_funnel_and_survivors(spark):
    bench = spark.createDataFrame([(T_BENCH,)], "text string")
    res = cpipe.clean_corpus(_corpus(spark), bench, quality_overrides=OVR)

    assert rows(res.funnel) == [
        (0, "raw", 5),
        (1, "quality", 4),
        (2, "decontaminated", 3),
        (3, "neardup_survivors", 2),
    ]
    assert rows(res.survivors, "doc_id") == [(1,), (5,)]
    assert rows(res.tokenized, "doc_id", "n_tok") == [(1, 12), (5, 12)]


def test_clean_corpus_no_materialize_same_result(spark):
    bench = spark.createDataFrame([(T_BENCH,)], "text string")
    res = cpipe.clean_corpus(
        _corpus(spark), bench, materialize=False, quality_overrides=OVR
    )
    assert rows(res.survivors, "doc_id") == [(1,), (5,)]


def test_clean_corpus_empty_benchmark_skips_no_docs(spark):
    bench = spark.createDataFrame([], "text string")
    res = cpipe.clean_corpus(_corpus(spark), bench, quality_overrides=OVR)
    # without contamination, doc 4 survives too
    assert rows(res.survivors, "doc_id") == [(1,), (4,), (5,)]


def test_clean_corpus_optional_lm_stage(spark):
    """lm_thresholds inserts a CCNet-style perplexity filter after the
    rule filter: the duplicated (hence statistically typical) docs land
    in head, the unique-vocab docs in tail and drop out."""
    bench = spark.createDataFrame([(T_BENCH,)], "text string")
    # LM trains on rule survivors {1,2,4,5}: docs 1,2 share every token
    # (count 2 of 52 -> ~4.70 bits), docs 4,5 are all-unique (~5.70)
    res = cpipe.clean_corpus(
        _corpus(spark), bench, quality_overrides=OVR,
        lm_thresholds=(5.0, 5.2),
    )
    assert rows(res.funnel) == [
        (0, "raw", 5),
        (1, "quality", 4),
        (2, "lm_quality", 2),
        (3, "decontaminated", 2),
        (4, "neardup_survivors", 1),
    ]
    assert rows(res.survivors, "doc_id") == [(1,)]


def test_clean_corpus_optional_substring_stage(spark):
    """substring_min_len cuts repeated runs from surviving text before
    tokenization: doc count unchanged, token count shrinks."""
    bench = spark.createDataFrame([(T_BENCH,)], "text string")
    shared = "alpha bravo charlie delta echo"  # = T_BASE[:5 tokens]
    corpus = spark.createDataFrame(
        [(1, T_BASE), (2, T_UNIQ + " " + shared)],
        "doc_id long, text string",
    )
    base = cpipe.clean_corpus(corpus, bench, quality_overrides=OVR)
    assert rows(base.tokenized, "doc_id", "n_tok") == [(1, 12), (2, 17)]
    cut = cpipe.clean_corpus(corpus, bench, quality_overrides=OVR,
                             substring_min_len=5)
    # doc 1 holds the first occurrence and stays intact; doc 2's copy cut
    assert rows(cut.tokenized, "doc_id", "n_tok") == [(1, 12), (2, 12)]
    assert rows(cut.funnel) == rows(base.funnel)


def test_clean_tokens_funnel_and_stages(spark):
    """One engineered doc per stage: a degenerate looper (filtered), a
    benchmark quoter (span cut), cross-doc repeats (ExactSubstr cut),
    an exact pair (deduped), plus clean survivors; the funnel must
    account for every one."""
    from pyspark.sql import functions as F

    base = list(range(100, 120))          # 20 distinct ids: clean doc
    quote = list(range(200, 213))         # a 13-id benchmark line
    rep = list(range(300, 305))           # a 5-id run repeated across docs
    docs = [
        (0, base),                        # clean, survives everything
        (1, [7] * 30),                    # degenerate: max_run 30 → filtered
        (2, [1, 2] + quote + [3, 4]),     # quotes the benchmark → span cut
        (3, [5, 6] + rep + [8, 9]),       # first occurrence: kept intact
        (4, [10, 11] + rep + [12, 13]),   # later occurrence: rep cut
        (5, base),                        # exact copy of 0 → deduped
    ]
    t = spark.createDataFrame(docs, "doc_id long, tokens array<long>")
    bench = spark.createDataFrame([(quote,)], "tokens array<long>")
    res = cpipe.clean_tokens(t, bench, min_tok=5, max_run=4,
                             substring_min_len=5, decontam_n=13,
                             max_len=16)
    f = {r["stage"]: (r["n_docs"], r["n_tokens"]) for r in res.funnel.collect()}
    n_raw = sum(len(d[1]) for d in docs)
    assert f["raw"] == (6, n_raw)
    assert f["degeneracy"] == (5, n_raw - 30)          # looper gone
    assert f["decontaminated"] == (5, n_raw - 30 - 13)  # quote span cut
    # ExactSubstr cuts the later rep occurrence (5 ids) AND fully
    # shreds doc 5 (every 5-gram repeats doc 0's — 20 ids): exact
    # copies die HERE, not at the dedup stage
    assert f["substring_dedup"] == (5, n_raw - 30 - 13 - 5 - len(base))
    # exact_dedup then only drops the now-empty doc 5 row
    assert f["exact_dedup"] == (4, f["substring_dedup"][1])
    total = f["exact_dedup"][1]
    assert f["packed"] == ((total + 15) // 16, total)
    surv = {r["doc_id"]: r["tokens"] for r in res.survivors.collect()}
    assert sorted(surv) == [0, 2, 3, 4]
    assert surv[3] == [5, 6] + rep + [8, 9]            # first copy intact
    assert surv[4] == [10, 11, 12, 13]                 # rep removed
    assert surv[2] == [1, 2, 3, 4]                     # quote removed
    assert surv[0] == base                              # untouched (invariant)


def test_clean_tokens_bins_packing(spark):
    """packing='bins' swaps the no-split packer in: token totals are
    conserved through the funnel and every surviving doc appears
    intact in exactly one bin."""
    from pyspark.sql import functions as F

    docs = [(i, [i * 100 + j for j in range(3 + i % 7)]) for i in range(20)]
    t = spark.createDataFrame(docs, "doc_id long, tokens array<long>")
    bench = spark.createDataFrame([([1, 2, 3],)], "tokens array<long>")
    res = cpipe.clean_tokens(t, bench, min_tok=1, max_run=10,
                             substring_min_len=5, max_len=16,
                             packing="bins")
    f = {r["stage"]: (r["n_docs"], r["n_tokens"]) for r in res.funnel.collect()}
    assert f["packed"][1] == f["exact_dedup"][1]
    packed = res.packed.collect()
    surv = {r["doc_id"]: r["tokens"] for r in res.survivors.collect()}
    placed = {}
    for b in packed:
        for d, s, ln in zip(b["doc_ids"], b["doc_starts"], b["doc_lens"]):
            assert b["tokens"][s:s + ln] == surv[d]
            placed[d] = placed.get(d, 0) + 1
    assert placed == {d: 1 for d in surv}
