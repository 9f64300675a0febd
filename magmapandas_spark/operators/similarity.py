"""Similarity search over embedding columns (beyond-reference surface).

- :func:`cosine_topk_bruteforce` — exact top-k: broadcast the query set
  against the corpus; the dot product is an explicitly ordered left fold
  (``F.aggregate`` over ``F.zip_with``) so results are deterministic and
  bit-comparable across engines.
- :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH
  bucketing so only same-bucket candidates are scored. At 100 TB the
  brute-force cross product is O(|Q|·|C|); LSH turns it into a bucket
  equi-join (shuffle on bucket signature) with tunable recall.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(vec_col):
    sq = F.transform(
        vec_col, lambda x: x.cast("double") * x.cast("double")
    )
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def _dot(a, b):
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k. The query side is broadcast (small by
    construction); ranking is a window per query with a deterministic
    candidate-id tie-break."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            (
                _dot(F.col("qvec"), F.col("cvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent random-hyperplane
    signatures; candidates = union of same-bucket pairs; exact rescoring
    of candidates only. Shuffles on (table, signature) — bounded bucket
    sizes replace the cross product at scale."""
    if dim is None:
        first = corpus.select(F.size(vec_col)).first()
        dim = int(first[0])

    def signature(vec, table: int):
        planes = _hyperplanes(dim, n_planes, seed + table)
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array([F.lit(float(p)) for p in plane]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                >= 0,
                F.lit(1),
            ).otherwise(F.lit(0))
            for plane in planes
        ]
        sig = F.lit(0)
        for b in bits:
            sig = sig * F.lit(2) + b
        return sig

    def with_buckets(df, idname):
        rows = []
        for t in range(n_tables):
            rows.append(
                df.select(
                    F.col(id_col).alias(idname),
                    F.col(vec_col).alias(f"{idname[0]}vec"),
                    F.lit(t).alias("tbl"),
                    signature(F.col(vec_col), t).alias("sig"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    qb = with_buckets(queries, "qid")
    cb = with_buckets(corpus, "cid")
    candidates = (
        qb.join(cb, on=["tbl", "sig"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "qvec", "cid", "cvec")
        .distinct()
    )
    scored = candidates.select(
        "qid",
        "cid",
        (
            _dot(F.col("qvec"), F.col("cvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
        ).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
