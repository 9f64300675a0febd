"""Correctness-suite part 5 (round 5): web-corpus hygiene and
retrieval operators — PII redaction, URL canonicalization, Bloom
decontamination, BPE tokenization, TF-IDF search, WARC ingestion, and
the dedup keep-policy.

Same cross-engine determinism rules as :mod:`suite`: Java-regex/RE2
common regex subset, md5-based portable hashing, decimal-cast sums
under every ROUND, explicit tie-breaks on every ORDER BY feeding a
LIMIT."""

from __future__ import annotations

from magmapandas_spark.operators.bloom import (
    SQL_BLOOM_DECONTAMINATE,
    q_bloom_decontaminate,
)
from magmapandas_spark.operators.bpe import SQL_BPE_TOKENS, q_bpe_tokens
from magmapandas_spark.operators.dedup import (
    q_dedup_keep_best,
    sql_dedup_keep_best,
)
from magmapandas_spark.operators.tfidf import (
    SQL_TFIDF_SEARCH,
    q_tfidf_search,
)
from magmapandas_spark.operators.warc import SQL_WARC_RECORDS, q_warc_records
from magmapandas_spark.operators.webcorpus import (
    SQL_PII_SCAN,
    SQL_URL_CANONICAL,
    q_pii_scan,
    q_url_canonical,
)


def queries():
    return {
        "pii_scan": q_pii_scan,
        "url_canonical": q_url_canonical,
        "bloom_decontaminate": q_bloom_decontaminate,
        "bpe_tokens": q_bpe_tokens,
        "tfidf_search": q_tfidf_search,
        "warc_records": q_warc_records,
        "dedup_keep_best": q_dedup_keep_best,
    }


def oracle_sql():
    return {
        "pii_scan": SQL_PII_SCAN,
        "url_canonical": SQL_URL_CANONICAL,
        "bloom_decontaminate": SQL_BLOOM_DECONTAMINATE,
        "bpe_tokens": SQL_BPE_TOKENS,
        "tfidf_search": SQL_TFIDF_SEARCH,
        "warc_records": SQL_WARC_RECORDS,
        "dedup_keep_best": sql_dedup_keep_best(),
    }
