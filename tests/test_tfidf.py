"""TF-IDF scoring semantics."""

import math

import pytest

from magmapandas_spark.operators.tfidf import tfidf_scores


def test_scores_and_order(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark spark spark"),
            (1, "spark table"),
            (2, "nothing relevant"),
            (3, "table table"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_scores(docs, ["spark", "table"]).toPandas()
    assert set(out["doc_id"]) == {0, 1, 3}  # doc 2 matches nothing
    idf_spark = math.log(5 / 3) + 1  # N=4, df=2
    idf_table = math.log(5 / 3) + 1
    exp0 = round(3 * idf_spark, 6)
    exp1 = round(1 * idf_spark + 1 * idf_table, 6)
    got = out.set_index("doc_id")["score"]
    assert got[0] == pytest.approx(exp0, abs=1e-6)
    assert got[1] == pytest.approx(exp1, abs=1e-6)
    # ordered by score desc then doc_id
    assert list(out["doc_id"]) == sorted(
        out["doc_id"], key=lambda d: (-got[d], d)
    )
    assert out.set_index("doc_id").loc[1, "n_matched"] == 2


def test_empty_query_rejected(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        tfidf_scores(docs, [])
