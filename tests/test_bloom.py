"""Bloom decontamination: relational-vs-bitset parity, guaranteed
recall (no false negatives), bounded filter size."""

import pytest
from pyspark.sql import functions as F

from magmapandas_spark.operators.bloom import (
    bloom_flag_docs,
    bloom_flag_docs_bitset,
    build_bloom_bits,
)


def _docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),       # bench
        (1, "alpha beta gamma delta epsilon eta"),        # leaks 5-gram? no (last word differs -> shares 'alpha beta gamma delta epsilon')
        (2, "one two three four five six seven"),         # clean
        (3, "zeta epsilon delta gamma beta alpha"),       # reversed: clean
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_no_false_negatives_and_parity(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") == 0)
    corpus = docs.filter(F.col("doc_id") != 0)
    rel = bloom_flag_docs(corpus, bench).orderBy("doc_id").toPandas()
    # doc 1 shares the 5-gram "alpha beta gamma delta epsilon" — MUST
    # be flagged (Bloom has no false negatives); docs 2/3 share none
    # (may only appear via a false positive, which the tiny filter
    # makes practically impossible here)
    assert 1 in set(rel["doc_id"])
    words = build_bloom_bits(bench)
    bits = bloom_flag_docs_bitset(corpus, words).orderBy(
        "doc_id").toPandas()
    assert bits.reset_index(drop=True).equals(rel.reset_index(drop=True))


def test_filter_size_is_geometry_bounded(spark):
    docs = _docs(spark)
    words = build_bloom_bits(docs, m_bits=1 << 10)
    assert len(words) == (1 << 10) // 64


def test_m_bits_must_align():
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_bits(None, m_bits=100)
