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
