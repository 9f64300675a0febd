"""TF-IDF retrieval scoring (beyond-reference surface — the sparse
twin of the embedding-ANN tier: inverted-index-shaped keyword search
over the corpus).

Plan shape (the 100 TB posture): the query-term list is a literal, so
the corpus token explode is filtered to query terms AT THE SCAN
(``isin`` on a tiny literal set — everything else never leaves the
scan stage). Document frequencies and term frequencies both come from
that same filtered (doc, term) relation: one shuffle for the df
aggregate (|query| rows out), one for the per-doc tf aggregate, and
the df/N relation rides a broadcast join. Nothing anywhere is
proportional to corpus width except the scan itself.

Determinism: idf is a per-term double (same ln in both engines — the
lm_quality precedent), each doc's score sums per-term products as
decimal(28,12) so partition order cannot perturb ROUND(score, 6), and
the top-k order is (rounded score desc, doc_id) — fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magmapandas_spark.operators.curation import word_tokens
from magmapandas_spark.operators.dedup import fan_out

#: Gate query's literal search — mid-frequency terms of the synthetic
#: vocabulary so scores spread.
DEFAULT_QUERY = ["table", "spark", "merge", "window", "hash"]


def tfidf_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Score docs against ``query_terms`` with smoothed TF-IDF
    (``idf = ln((N+1)/(df+1)) + 1``); return the top-k.

    Returns (id, n_matched terms, score)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    tok = (
        fan_out(docs)
        .select(F.col(id_col), F.explode(word_tokens(text_col)).alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("N"))
    df_rel = tok.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    idf = df_rel.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (
            F.log((F.col("N") + 1).cast("double") / (F.col("df") + 1))
            + F.lit(1.0)
        ).alias("idf"),
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.join(F.broadcast(idf), on="term")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(
                F.sum(
                    (F.col("tf") * F.col("idf")).cast("decimal(28,12)")
                ).cast("double"),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(top_k)
    )


def q_tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: TF-IDF top-100 for the default query over the
    documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_scores(docs, DEFAULT_QUERY)


_SQL_TERMS = ", ".join(f"'{t}'" for t in DEFAULT_QUERY)

SQL_TFIDF_SEARCH = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
           str_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
           AS term
  FROM documents
),
qtok AS (
  SELECT doc_id, term FROM tok WHERE term IN ({_SQL_TERMS})
),
n AS (SELECT COUNT(*) AS N FROM documents),
idf AS (
  SELECT term,
         ln(CAST(n.N + 1 AS DOUBLE) / (COUNT(DISTINCT doc_id) + 1)) + 1.0
           AS idf
  FROM qtok, n
  GROUP BY term, n.N
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM qtok GROUP BY doc_id, term
)
SELECT tf.doc_id,
       COUNT(*) AS n_matched,
       ROUND(CAST(SUM(CAST(tf.tf * idf.idf AS DECIMAL(28,12)))
                  AS DOUBLE), 6) AS score
FROM tf JOIN idf ON tf.term = idf.term
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id
LIMIT 100
"""
