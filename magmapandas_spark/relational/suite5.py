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
from magmapandas_spark.operators.gif import SQL_GIF_DECODE, q_gif_decode
from magmapandas_spark.operators.graph import q_pagerank, sql_pagerank
from magmapandas_spark.operators.maintenance import (
    SQL_MERGE_UPSERT,
    q_merge_upsert,
)
from magmapandas_spark.operators.similarity import (
    q_ivfpq_topk,
    q_pq_topk_seeded,
    q_semdedup,
    sql_pq_topk_seeded,
    sql_semdedup,
)
from magmapandas_spark.operators.dedup import (
    q_dedup_keep_best,
    q_exact_substring_dups,
    q_pair_overlap_scores,
    sql_dedup_keep_best,
    sql_exact_substring_dups,
    sql_pair_overlap_scores,
)
from magmapandas_spark.operators.tfidf import (
    SQL_TFIDF_SEARCH,
    q_tfidf_search,
)
from pyspark.sql import DataFrame, SparkSession

from magmapandas_spark.operators.dedup import (
    q_minhash_jaccard_est,
    sql_minhash_jaccard_est,
)
from magmapandas_spark.operators.sketches import (
    SQL_CMS_TOPK,
    SQL_HLL_DISTINCT,
    SQL_KMV_DISTINCT,
    q_cms_topk,
    q_hll_distinct,
    q_kmv_distinct,
)
from magmapandas_spark.operators.quantiles import (
    SQL_HISTOGRAM_QUANTILES,
    q_histogram_quantiles,
)
from magmapandas_spark.operators.timeseries import (
    SQL_GAP_FILL,
    q_gap_fill,
)
from magmapandas_spark.operators.warc import (
    SQL_WARC_GZ_RECORDS,
    SQL_WARC_RECORDS,
    q_warc_gz_records,
    q_warc_records,
)
from magmapandas_spark.operators.webcorpus import (
    SQL_HOST_QUOTA,
    SQL_PII_SCAN,
    SQL_ROBOTS_FILTER,
    SQL_URL_CANONICAL,
    q_host_quota,
    q_pii_scan,
    q_robots_filter,
    q_url_canonical,
)

#: Target mixture for the gate's domain-weighting query: English 40%,
#: every other language 15%.
_MIX_WEIGHTS = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}


def q_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture scheduling over the documents table: per-lang
    keep rates toward a 40/15/15/15/15 target (no upsampling), plus
    the deterministically kept doc/token counts those rates produce."""
    from magmapandas_spark.operators.curation import mixture_schedule

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mixture_schedule(docs, _MIX_WEIGHTS).orderBy("stratum")


_SQL_MIX_W = (
    "CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 15 WHEN 'es' THEN 15 "
    "WHEN 'fr' THEN 15 WHEN 'zh' THEN 15 ELSE 0 END"
)

SQL_MIXTURE_SCHEDULE = f"""
WITH sizes AS (
  SELECT lang, CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS tokens,
         {_SQL_MIX_W} AS w
  FROM documents GROUP BY lang
),
ref AS (
  SELECT tokens AS ref_tokens, w AS ref_w
  FROM sizes WHERE w > 0
  ORDER BY (tokens * 1000000) // w, lang LIMIT 1
),
rates AS (
  SELECT lang, w, tokens,
         CASE WHEN w = 0 THEN 0
              ELSE LEAST(1000,
                (1000 * ref_tokens * w) // (ref_w * tokens)) END
           AS rate_permille
  FROM sizes, ref
),
kept AS (
  SELECT d.lang, COUNT(*) AS n_kept,
         CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS kept_tokens
  FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE ('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15))
          ::BIGINT % 1000 < r.rate_permille
  GROUP BY d.lang
)
SELECT r.lang AS stratum,
       r.w AS weight,
       r.tokens,
       r.rate_permille,
       COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.kept_tokens, 0) AS kept_tokens
FROM rates r LEFT JOIN kept k ON r.lang = k.lang
ORDER BY stratum
"""


def q_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter ENSEMBLE — the composed keep/drop verdict a real
    pipeline ships: Gopher repetition flags ⋈ unigram-LM perplexity ⋈
    length/OOV heuristics, one boolean per doc. Thresholds are
    literals; the OOV test is integer arithmetic (oov·5 ≤ n_tokens)
    and the avg_nll test compares the decimal-summed rounded value, so
    the verdict is engine-independent. Both signal pipelines are
    scan-local; the ensemble adds one join on doc_id."""
    from pyspark.sql import functions as F

    from magmapandas_spark.operators.curation import (
        lm_quality_score,
        repetition_scores,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = repetition_scores(docs).select(
        "doc_id", "repetitive", "max_word_run"
    )
    lm = lm_quality_score(docs).select(
        "doc_id", "n_tokens", "oov_count", "avg_nll"
    )
    j = rep.join(lm, on="doc_id")
    keep = (
        (~F.col("repetitive"))
        & (F.col("avg_nll") <= 1.478)
        & (F.col("n_tokens") >= 20)
        & (F.col("oov_count") * 5 <= F.col("n_tokens"))
    )
    return j.select(
        "doc_id", "repetitive", "max_word_run", "n_tokens",
        "oov_count", "avg_nll", keep.alias("keep"),
    ).orderBy("doc_id")


def _sql_quality_ensemble() -> str:
    from magmapandas_spark.operators.curation import (
        SQL_LM_QUALITY,
        SQL_REPETITION_SCORES,
    )

    return f"""
SELECT r.doc_id, r.repetitive, r.max_word_run, q.n_tokens,
       q.oov_count, q.avg_nll,
       ((NOT r.repetitive) AND q.avg_nll <= 1.478
        AND q.n_tokens >= 20
        AND q.oov_count * 5 <= q.n_tokens) AS keep
FROM ({SQL_REPETITION_SCORES}) r
JOIN ({SQL_LM_QUALITY}) q ON r.doc_id = q.doc_id
ORDER BY r.doc_id
"""


def queries():
    return {
        "pii_scan": q_pii_scan,
        "url_canonical": q_url_canonical,
        "bloom_decontaminate": q_bloom_decontaminate,
        "bpe_tokens": q_bpe_tokens,
        "gif_decode": q_gif_decode,
        "tfidf_search": q_tfidf_search,
        "warc_records": q_warc_records,
        "warc_gz_records": q_warc_gz_records,
        "dedup_keep_best": q_dedup_keep_best,
        "kmv_distinct": q_kmv_distinct,
        "hll_distinct": q_hll_distinct,
        "cms_topk": q_cms_topk,
        "gap_fill": q_gap_fill,
        "histogram_quantiles": q_histogram_quantiles,
        "minhash_jaccard_est": q_minhash_jaccard_est,
        "host_quota": q_host_quota,
        "robots_filter": q_robots_filter,
        "merge_upsert": q_merge_upsert,
        "pagerank": q_pagerank,
        "mixture_schedule": q_mixture_schedule,
        "quality_ensemble": q_quality_ensemble,
        "pq_topk_seeded": q_pq_topk_seeded,
        "ivfpq_topk": q_ivfpq_topk,
        "semdedup": q_semdedup,
        "exact_substring_dups": q_exact_substring_dups,
        "pair_overlap_scores": q_pair_overlap_scores,
    }


def oracle_sql():
    return {
        "pii_scan": SQL_PII_SCAN,
        "url_canonical": SQL_URL_CANONICAL,
        "bloom_decontaminate": SQL_BLOOM_DECONTAMINATE,
        "bpe_tokens": SQL_BPE_TOKENS,
        "gif_decode": SQL_GIF_DECODE,
        "tfidf_search": SQL_TFIDF_SEARCH,
        "warc_records": SQL_WARC_RECORDS,
        "warc_gz_records": SQL_WARC_GZ_RECORDS,
        "dedup_keep_best": sql_dedup_keep_best(),
        "kmv_distinct": SQL_KMV_DISTINCT,
        "hll_distinct": SQL_HLL_DISTINCT,
        "cms_topk": SQL_CMS_TOPK,
        "gap_fill": SQL_GAP_FILL,
        "histogram_quantiles": SQL_HISTOGRAM_QUANTILES,
        "minhash_jaccard_est": sql_minhash_jaccard_est(),
        "host_quota": SQL_HOST_QUOTA,
        "robots_filter": SQL_ROBOTS_FILTER,
        "merge_upsert": SQL_MERGE_UPSERT,
        "pagerank": sql_pagerank(),
        "mixture_schedule": SQL_MIXTURE_SCHEDULE,
        "quality_ensemble": _sql_quality_ensemble(),
        "pq_topk_seeded": sql_pq_topk_seeded(),
        "semdedup": sql_semdedup(),
        "exact_substring_dups": sql_exact_substring_dups(),
        "pair_overlap_scores": sql_pair_overlap_scores(),
    }
