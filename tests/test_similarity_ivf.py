"""IVF ANN: recall vs exact brute force on the embeddings table."""

import numpy as np
from pyspark.sql import functions as F

from magmapandas_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.01"


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned, centroids = sim.ivf_index(emb, n_cells=8, seed=42)
    # cells partition the corpus exactly
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("cell").distinct().count() <= 8

    queries = emb.filter(F.col("vec_id") < 20)
    ivf = sim.ivf_topk(queries, assigned, centroids, k=5, n_probe=4).toPandas()
    brute = sim.cosine_topk_bruteforce(queries, emb, k=5).toPandas()

    ivf1 = ivf[ivf.rn == 1].set_index("qid")["cid"]
    br1 = brute[brute.rn == 1].set_index("qid")["cid"]
    assert (ivf1 == br1).mean() >= 0.7  # measured 0.8 at seed 42

    # probing ALL cells must reproduce brute force exactly
    full = sim.ivf_topk(
        queries, assigned, centroids, k=5, n_probe=8
    ).toPandas()
    f1 = full[full.rn == 1].set_index("qid")["cid"]
    assert (f1 == br1).all()
