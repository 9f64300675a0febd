"""End-to-end curation pipeline composition: the tiers built this
round must CHAIN — HTML extraction → quality scoring → filtering →
chunking → packing — as one lazy plan over one corpus."""

from pyspark.sql import functions as F

from magmapandas_spark.operators.curation import (
    chunk_text,
    lm_quality_score,
    pack_offsets,
    repetition_scores,
)
from magmapandas_spark.operators.html import (
    extract_main_text,
    synthetic_html_docs,
)


def test_extract_score_filter_chunk_pack(spark):
    # 1. extract main text from HTML
    docs = extract_main_text(synthetic_html_docs(spark, 60))
    n_docs = docs.count()
    assert n_docs == 60

    # 2. quality signals over the EXTRACTED text (column contract:
    #    every scorer works on any (doc_id, text) relation)
    rep = repetition_scores(docs.select("doc_id", "text"))
    lm = lm_quality_score(docs.select("doc_id", "text"))
    scored = (
        docs.join(rep.select("doc_id", "repetitive"), on="doc_id")
        .join(lm.select("doc_id", "avg_nll"), on="doc_id")
    )
    assert scored.count() == n_docs

    # 3. filter: drop repetitive docs and distribution outliers
    cut = scored.agg(
        F.expr("percentile(avg_nll, 0.95)").alias("p95")
    ).collect()[0]["p95"]
    kept = scored.filter(
        (~F.col("repetitive")) & (F.col("avg_nll") <= cut)
    )
    n_kept = kept.count()
    assert 0 < n_kept <= n_docs

    # 4. chunk the survivors (small windows so short pages still split)
    chunks = chunk_text(
        kept.select("doc_id", "text"), chunk_chars=30, overlap=10
    )
    n_chunks = chunks.count()
    assert n_chunks >= n_kept  # every kept doc emits >= 1 chunk

    # 5. pack chunk token counts into fixed budgets (pack_offsets
    #    needs (order_col, token_count)); chunk ids must be unique
    per_chunk = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("seq_id"),
        F.size(F.split(F.trim(F.col("chunk")), r"\s+")).alias("n_tok"),
    )
    packed = pack_offsets(per_chunk, order_col="seq_id",
                          token_col="n_tok", budget=64)
    rows = packed.orderBy("seq_id").collect()
    assert len(rows) == n_chunks
    # offsets are a prefix sum: contiguous and increasing
    pos = 0
    for r in rows:
        assert r["start"] == pos
        pos += r["n_tok"]
    assert pos == sum(r["n_tok"] for r in rows)
