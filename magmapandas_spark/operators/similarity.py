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
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
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


# ----------------------------------------------------------------------
# IVF (inverted-file) ANN: KMeans coarse quantizer + probed exact search
# ----------------------------------------------------------------------

def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
):
    """Build an IVF index: KMeans coarse quantizer over the corpus,
    rows tagged with their nearest-centroid ``cell``.

    Returns ``(assigned_df, centroids)`` where ``assigned_df`` has
    (id, vec, cell) and ``centroids`` is a plain ``list[list[float]]``
    for broadcasting to the query side. At scale the assigned table is
    written out partitioned/bucketed BY cell so probes are partition
    prunes, and KMeans fits on a sample."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(
            F.col(vec_col).cast("array<double>")
        ).alias("__fv"),
    )
    model = KMeans(
        k=n_cells, seed=seed, featuresCol="__fv", predictionCol="cell"
    ).fit(feat)
    assigned = model.transform(feat).select(id_col, vec_col, "cell")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Probed ANN search: each query visits its ``n_probe`` nearest
    cells only; exact cosine within the probed cells; top-k per query.

    Work drops from O(|Q|·|C|) to O(|Q|·|C|·n_probe/n_cells); the join
    is an equi-join on ``cell`` (shuffle bounded by cell sizes — the
    IVF twin of the LSH bucket join above)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    cent = np.asarray(centroids, dtype=float)
    cent_n = cent / np.maximum(
        np.linalg.norm(cent, axis=1, keepdims=True), 1e-30
    )
    spark = queries.sparkSession
    b_cent = spark.sparkContext.broadcast(cent_n)
    n_probe_eff = min(n_probe, len(centroids))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        c = b_cent.value
        q = np.vstack(vecs.to_numpy()).astype(float)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        sims = q @ c.T
        order = np.argsort(-sims, axis=1)[:, :n_probe_eff]
        return pd.Series(list(order.astype(np.int32)))

    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    c = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="cell")
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            (
                _dot(F.col("qvec"), F.col("cvec"))
                / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
            ).alias("cos"),
        )
        # a query probing multiple cells never sees the same candidate
        # twice (cells partition the corpus), so no dedup needed
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the embeddings table: 20 query vectors, 8 cells,
    4 probes — rows-only gate (KMeans assignment is engine-specific);
    recall vs brute force is asserted in tests."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, centroids = ivf_index(emb, n_cells=8, seed=42)
    queries = emb.filter(F.col("vec_id") < 20)
    out = ivf_topk(queries, assigned, centroids, k=5, n_probe=4)
    return out.select("qid", "cid", F.round("cos", 4).alias("cos")).orderBy(
        "qid", "rn"
    )
