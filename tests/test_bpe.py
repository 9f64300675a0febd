"""BPE trainer determinism + application semantics."""

import pytest
from pyspark.sql import functions as F

from magmapandas_spark.operators.bpe import (
    DEFAULT_MERGES,
    apply_bpe,
    bpe_symbols,
    learn_bpe_merges,
)


def test_learn_deterministic_and_greedy(spark):
    docs = spark.createDataFrame(
        [(0, "low low low lower lowest"), (1, "new newer newest")],
        "doc_id long, text string",
    )
    m1 = learn_bpe_merges(docs, n_merges=5)
    m2 = learn_bpe_merges(docs, n_merges=5)
    assert m1 == m2
    # 'l o' and 'o w' / 'lo w' dominate: first merge must involve the
    # most frequent adjacent pair ('l','o') or ('o','w') — count 5 each,
    # lexicographic tie-break picks ('l','o')
    assert m1[0] == ("l", "o")
    assert m1[1] == ("lo", "w")


def test_apply_bpe_counts(spark):
    docs = spark.createDataFrame(
        [(0, "low low"), (1, "")], "doc_id long, text string"
    )
    merges = [("l", "o"), ("lo", "w")]
    out = apply_bpe(docs, merges).orderBy("doc_id").toPandas()
    # "low low" -> symbols 'l o w | l o w' -> 'lo w | lo w' -> 'low | low'
    assert out.loc[0, "n_words"] == 2
    assert out.loc[0, "n_symbols"] == 6
    assert out.loc[0, "n_bpe_tokens"] == 2
    # empty doc: split('', ' ') yields [''] — the '' filter must keep
    # the zero-token count at 0, not 1
    assert out.loc[1, "n_words"] == 0
    assert out.loc[1, "n_symbols"] == 0
    assert out.loc[1, "n_bpe_tokens"] == 0


def test_merge_respects_word_boundary(spark):
    # pair ('a','b') must not merge across the word separator in
    # "...a b..." formed by adjacent words ending in a / starting in b
    docs = spark.createDataFrame(
        [(0, "ba ab")], "doc_id long, text string"
    )
    out = apply_bpe(docs, [("a", "b")]).collect()[0]
    # 'b a | a b' -> only the in-word 'a b' merges -> 'b a | ab'
    assert out["n_bpe_tokens"] == 3


def test_illegal_merge_symbols_rejected(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    for bad in [("a", "|"), ("a", "#"), ("a b", "c"), ("", "a")]:
        with pytest.raises(ValueError, match="illegal merge"):
            apply_bpe(docs, [bad])


def test_default_merges_wellformed():
    for a, b in DEFAULT_MERGES:
        assert a and b and "|" not in a + b and " " not in a + b


def test_symbols_shape(spark):
    row = (
        spark.createDataFrame([(0, "Key agg")], "doc_id long, text string")
        .select(bpe_symbols().alias("s"))
        .collect()[0]
    )
    assert row["s"] == "#k# #e# #y# #|# #a# #g# #g#"


def _list_bpe_token_count(text: str, merges) -> int:
    """Independent reference: sequence-based leftmost-first merge
    replay per word (the classic BPE formulation) — validates that the
    replace-chain encoding computes the same thing."""
    import re as _re

    total = 0
    for w in _re.split(r"[^a-z0-9]+", text.lower()):
        if not w:
            continue
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return total


def test_replace_chain_matches_list_formulation(spark):
    import random

    rng = random.Random(7)
    # includes the boundary-bleed words ("cow": merge (c,o) must NOT
    # fire across the (c)(ow) symbol boundary; "coward", "jow") the
    # round-5 review caught — the sentinel wrap is what makes these
    # pass
    vocab = ["low", "lower", "lowest", "newer", "wide", "widest",
             "a", "ab", "abc", "banana", "bandana", "cow", "coward",
             "jow", "merow"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe_merges(docs, n_merges=12)
    got = (
        apply_bpe(docs, merges)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    for i, text in rows:
        expect = _list_bpe_token_count(text, merges)
        if text.strip() == "":
            continue  # empty-doc sentinel (split('') artifact, pinned elsewhere)
        assert got.loc[i, "n_bpe_tokens"] == expect, (i, text)
