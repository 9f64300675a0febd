"""Unit tests for the corpus-curation operators (vocab / contamination /
stratified sampling / sequence packing)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from magmapandas_spark.operators.curation import (
    contamination_pairs,
    pack_offsets,
    stratified_sample,
    word_tokens,
)


def test_stratified_sample_deterministic_and_stable(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )
    a = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", {"en": 250}, 500).collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", {"en": 250}, 500).collect()
    }
    assert a == b, "sampling must be reproducible"
    en = sum(1 for i in a if i % 2 == 0)
    de = len(a) - en
    # 1000 docs per stratum at 25% / 50%: expect ~250 / ~500 (±20%)
    assert 200 <= en <= 300, en
    assert 400 <= de <= 600, de
    # changing one stratum's rate must not change which OTHER rows kept
    c = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", {"en": 100}, 500).collect()
    }
    assert {i for i in a if i % 2 == 1} == {i for i in c if i % 2 == 1}
    # the lowered-rate stratum keeps a strict subset
    assert {i for i in c if i % 2 == 0} <= {i for i in a if i % 2 == 0}


def test_pack_offsets_contiguous_and_matches_naive(spark):
    docs = spark.createDataFrame(
        [(i, (i * 37) % 90 + 10) for i in range(500)],
        "doc_id long, n long",
    )
    out = (
        pack_offsets(docs, "n", block=64, budget=100)
        .orderBy("doc_id")
        .collect()
    )
    # two-phase distributed scan == naive exclusive prefix sum
    naive = (
        docs.withColumn(
            "start",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("doc_id").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r["start"] for r in out] == [r["start"] for r in naive]
    # contiguity: next start = start + n, bins consistent
    for prev, cur in zip(out, out[1:]):
        assert cur["start"] == prev["start"] + prev["n_tok"]
    for r in out:
        assert r["bin_first"] == r["start"] // 100
        assert r["bin_last"] == (r["start"] + max(r["n_tok"], 1) - 1) // 100
        assert r["bin_last"] >= r["bin_first"]


def test_contamination_detects_planted_leak(spark):
    bench = spark.createDataFrame(
        [(1000, "the secret eval answer is forty two exactly")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "clean document with no overlap at all here"),
            (2, "prefix words the secret eval answer is forty two"
                " then suffix"),
            (3, "another clean one with different words entirely"),
        ],
        "doc_id long, text string",
    )
    out = contamination_pairs(corpus, bench, n=5).collect()
    assert {(r["corpus_id"], r["bench_id"]) for r in out} == {(2, 1000)}
    # doc 2 copies a 7-token span -> 3 shared distinct 5-grams
    assert out[0]["n_common"] == 3


def test_word_tokens_lowercase_and_filters_empties(spark):
    df = spark.createDataFrame([("  Hello, WORLD!! 42 ",)], "text string")
    toks = df.select(word_tokens().alias("t")).collect()[0]["t"]
    assert toks == ["hello", "world", "42"]

def test_word_ngrams_short_input_yields_empty(spark):
    """Inputs with fewer than n tokens produce an empty n-gram array
    instead of raising INVALID_PARAMETER_VALUE.START (unguarded-callers
    footgun fixed in round 4)."""
    import pandas as pd

    from magmapandas_spark.operators.curation import word_ngrams, word_tokens

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["one two", "", "a b c d e", "x"]})
    )
    out = (
        df.select(word_tokens("text").alias("t"))
        .select(word_ngrams("t", 5).alias("g"))
        .collect()
    )
    sizes = [len(r["g"]) for r in out]
    assert sizes == [0, 0, 1, 0]


def test_repetition_scores_planted(spark):
    from magmapandas_spark.operators.curation import repetition_scores

    docs = spark.createDataFrame(
        [
            # longest run 4 ("spam"), highly duplicated
            (1, "spam spam spam spam eggs"),
            # clean text: all distinct words, no runs
            (2, "alpha beta gamma delta epsilon"),
            # boilerplate bigram: "click here" appears 3 of 5 bigrams
            (3, "click here click here click here"),
            # single word
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in repetition_scores(docs).collect()
    }
    assert out[1]["max_word_run"] == 4
    assert out[1]["n_words"] == 5 and out[1]["n_distinct"] == 2
    assert out[1]["repetitive"]

    assert out[2]["max_word_run"] == 1
    assert out[2]["dup_word_frac"] == 0.0
    assert not out[2]["repetitive"]

    # "click here click here click here": bigrams = [click here,
    # here click, click here, here click, click here] -> top2 = 3/5
    assert out[3]["top2_count"] == 3
    assert out[3]["top2gram_frac"] == 0.6
    assert out[3]["repetitive"]

    assert out[4]["n_words"] == 1
    assert out[4]["top2_count"] == 0
    assert out[4]["max_word_run"] == 1
    assert not out[4]["repetitive"]


def test_lm_quality_oov_path(spark):
    """vocab_size smaller than the corpus vocabulary: OOV tokens score
    as count 0 (add-1 floor) and are counted."""
    import math

    from magmapandas_spark.operators.curation import lm_quality_score

    docs = spark.createDataFrame(
        [
            (1, "aa aa aa bb bb cc"),   # cc is OOV under vocab_size=2
            (2, "zz"),                  # fully OOV
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_quality_score(
        docs, vocab_size=2).collect()}
    # corpus: aa=3 bb=2 cc=1 zz=1 -> N=7; distinct=4 -> V=min(4,2)=2
    # vocab (count desc, token asc) = {aa:3, bb:2}
    denom = 7 + 2 + 1
    p_aa, p_bb, p_oov = 4 / denom, 3 / denom, 1 / denom
    exp1 = -(3 * math.log10(p_aa) + 2 * math.log10(p_bb)
             + math.log10(p_oov)) / 6
    assert out[1]["n_tokens"] == 6
    assert out[1]["oov_count"] == 1
    assert abs(out[1]["avg_nll"] - exp1) < 1e-6
    assert out[2]["oov_count"] == 1
    assert abs(out[2]["avg_nll"] - (-math.log10(p_oov))) < 1e-6


def test_chunk_text_windows_and_overlap(spark):
    from magmapandas_spark.operators.curation import chunk_text

    long_text = "".join(chr(97 + (i % 26)) for i in range(500))
    docs = spark.createDataFrame(
        [(1, long_text), (2, "tiny"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_text(docs, chunk_chars=200, overlap=40).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 500 chars, stride 160 -> ceil(460/160)=3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert len(c1) == 3
    assert [r["start"] for r in c1] == [0, 160, 320]
    assert c1[0]["chunk"] == long_text[:200]
    assert c1[1]["chunk"] == long_text[160:360]
    assert c1[2]["chunk"] == long_text[320:500]
    assert c1[2]["chunk_len"] == 180
    # consecutive chunks share exactly `overlap` chars
    assert c1[0]["chunk"][-40:] == c1[1]["chunk"][:40]
    # short and empty docs still emit one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk"] == "tiny"
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk"] == ""
    # full coverage: concatenating de-overlapped chunks rebuilds doc 1
    rebuilt = c1[0]["chunk"] + "".join(r["chunk"][40:] for r in c1[1:])
    assert rebuilt == long_text


def test_chunk_text_rejects_bad_overlap(spark):
    import pytest as _pytest

    from magmapandas_spark.operators.curation import chunk_text

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_text(docs, chunk_chars=100, overlap=100)


def test_chunk_text_multibyte_codepoints(spark):
    """length/substring are codepoint-based in Spark SQL: multibyte
    text chunks on characters, not bytes."""
    from magmapandas_spark.operators.curation import chunk_text

    text = "αβγδε" * 20  # 100 codepoints, 200 utf-8 bytes
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        chunk_text(docs, chunk_chars=40, overlap=10).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 30 -> ceil(90/30) = 3 chunks over 100 codepoints
    assert len(out) == 3
    assert out[0]["chunk"] == text[:40]
    assert out[1]["chunk"] == text[30:70]
    assert out[2]["chunk"] == text[60:100]
    assert out[2]["chunk_len"] == 40


def test_mixture_schedule_semantics(spark):
    from magmapandas_spark.operators.curation import mixture_schedule

    rows = (
        [(i, "en", 100) for i in range(40)]
        + [(100 + i, "de", 100) for i in range(10)]
        + [(200 + i, "xx", 100) for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars int")
    out = (
        mixture_schedule(docs, {"en": 50, "de": 50})
        .orderBy("stratum")
        .toPandas()
        .set_index("stratum")
    )
    # de is binding (1000 tokens / weight 50 < 4000/50): rate 1000
    assert out.loc["de", "rate_permille"] == 1000
    assert out.loc["de", "n_kept"] == 10  # full stratum kept
    # en sized to de's supply: (1000*1000*50) div (50*4000) = 250
    assert out.loc["en", "rate_permille"] == 250
    # unweighted stratum dropped entirely
    assert out.loc["xx", "rate_permille"] == 0
    assert out.loc["xx", "n_kept"] == 0
    # kept counts are the deterministic hash filter's output
    assert 0 < out.loc["en", "n_kept"] < 40


def test_mixture_schedule_rejects_negative_weight(spark):
    from magmapandas_spark.operators.curation import mixture_schedule

    docs = spark.createDataFrame(
        [(0, "en", 10)], "doc_id long, lang string, n_chars int"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="negative weight"):
        mixture_schedule(docs, {"en": -1})
