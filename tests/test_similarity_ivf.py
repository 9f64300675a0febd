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


def test_all_pairs_cosine_matches_bruteforce(spark):
    """Blocked all-pairs must find every pair regardless of which hash
    blocks the two members land in (regression: cross-block pairs with
    descending ids were dropped by an upper-triangle mask)."""
    rng = np.random.RandomState(3)
    vecs = rng.randn(60, 8)
    # plant near-duplicate pairs with both id orderings across blocks
    vecs[41] = vecs[3] + 0.01 * rng.randn(8)
    vecs[7] = vecs[55] + 0.01 * rng.randn(8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    got = (
        sim.all_pairs_cosine(df, threshold=0.9, n_blocks=4)
        .select("id_a", "id_b")
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    M = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = M @ M.T
    exp = sorted(
        (i, j)
        for i in range(60)
        for j in range(i + 1, 60)
        if sims[i, j] >= 0.9
    )
    assert [(r.id_a, r.id_b) for r in got.itertuples()] == exp
    assert (3, 41) in exp and (7, 55) in exp


def test_write_ivf_index_bucketed_probe(spark):
    """Persisted IVF index: the stored assignment reads bucketed on
    cell, the probe result is identical to the in-memory path."""
    import pandas as pd

    from magmapandas_spark.operators import similarity as sim

    import shutil

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).limit(400)
    assigned, centroids = sim.ivf_index(emb, n_cells=8, seed=42)
    # pre-clean residue from a killed earlier run: a leftover
    # warehouse DIRECTORY without a catalog entry fails saveAsTable
    # with LOCATION_ALREADY_EXISTS (the test_lsh_index discipline)
    spark.sql("DROP TABLE IF EXISTS ivf_idx_test")
    shutil.rmtree("spark-warehouse/ivf_idx_test", ignore_errors=True)
    sim.write_ivf_index(assigned, "ivf_idx_test")
    try:
        queries = emb.limit(10)
        mem = (
            sim.ivf_topk(queries, assigned, centroids, k=5, n_probe=4)
            .toPandas()
            .sort_values(["qid", "rn"])
            .reset_index(drop=True)
        )
        stored_tbl = spark.table("ivf_idx_test")
        stored = (
            sim.ivf_topk(queries, stored_tbl, centroids, k=5, n_probe=4)
            .toPandas()
            .sort_values(["qid", "rn"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            mem[["qid", "cid", "rn"]], stored[["qid", "cid", "rn"]]
        )
        # plan: a cell-keyed aggregate on the stored table rides the
        # bucketing — no Exchange before the aggregate (a bare scan
        # reports "Bucketed: false (disabled)" because nothing uses it)
        from pyspark.sql import functions as F

        agg = stored_tbl.groupBy("cell").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_idx_test")


def test_pq_encode_arrow_matches_reference(spark):
    """Arrow PQ encode == an independent pure-python argmin (ties to
    the lowest codebook row, the relational encode's tie-break)."""
    import numpy as np

    from magmapandas_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    seeds = (
        emb.filter(F.col("vec_id").isin(sim._PQ_SEED_IDS))
        .orderBy("vec_id")
        .collect()
    )
    cb = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in seeds]
    )
    sample = emb.filter(F.col("vec_id") < 50)
    got = (
        sim.pq_encode_arrow(sample, cb)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in sample.collect()}
    for _, row in got.iterrows():
        v = rows[row["vec_id"]]
        for m in range(8):
            sl = slice(m * 8, (m + 1) * 8)
            d2 = ((v[sl] - cb[:, sl]) ** 2).sum(axis=1)
            assert row[f"c{m}"] == int(d2.argmin())


def test_pq_seeded_topk_is_deterministic(spark):
    from magmapandas_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.01"
    a = sim.q_pq_topk_seeded(spark, sf).toPandas()
    b = sim.q_pq_topk_seeded(spark, sf).toPandas()
    assert a.equals(b)
    assert (a.groupby("qid").size() == 5).all()


def test_ivfpq_recall_against_bruteforce(spark):
    """IVF-PQ (probe 8 of 16 cells, residual 8x64 codes) on the
    near-isotropic synthetic embeddings — PQ's hard case (distance
    concentration; see ivfpq_index docstring). Deterministic seeds
    make the measured recall a fixed 0.36; the floor catches machinery
    breaks, not quantization noise."""
    import numpy as np

    from magmapandas_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    codes, cent, cbs = sim.ivfpq_index(emb)
    queries = emb.filter(F.col("vec_id") < 20)
    got = (
        sim.ivfpq_topk(queries, codes, cent, cbs, n_probe=8)
        .toPandas()
        .groupby("qid")["cid"]
        .apply(set)
    )
    # exact Euclidean top-5 reference, computed in numpy
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.vstack([np.asarray(r["embedding"], dtype=float) for r in rows])
    recalls = []
    for qid in range(20):
        qv = V[ids == qid][0]
        d2 = ((V - qv) ** 2).sum(axis=1)
        order = ids[np.argsort(d2)]
        truth = [i for i in order if i != qid][:5]
        recalls.append(len(got[qid] & set(truth)) / 5)
    assert sum(recalls) / len(recalls) >= 0.25, recalls


def test_ivfpq_codes_are_compact(spark):
    from magmapandas_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    codes, cent, cbs = sim.ivfpq_index(emb)
    pdf = codes.limit(5).toPandas()
    assert list(pdf.columns) == ["vec_id", "cell"] + [
        f"c{m}" for m in range(8)
    ]
    assert len(cent) == 16 and len(cbs) == 8 and len(cbs[0]) == 64


# ---------------------- SemDeDup ------------------------------------

def test_semdedup_keep_semantics(spark):
    """Hand-built geometry: three near-identical vectors (ids 0,1,7)
    plus isolated ones. Smallest id in the dup relation keeps; every
    dominated vector drops; isolated vectors keep with 0 neighbors."""
    import numpy as np

    from magmapandas_spark.operators.similarity import semdedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=8).tolist()
    far = [-v for v in base]
    rows = [
        (0, base),
        (1, [v * 1.01 for v in base]),        # near-dup of 0
        (7, [v * 0.99 for v in base]),        # near-dup of 0 and 1
        (3, far),                             # isolated (cos = -1)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [base, far]
    out = (
        semdedup(df, cents, threshold=0.9)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert bool(out.loc[0, "keep"]) and out.loc[0, "n_dup_neighbors"] == 2
    assert not bool(out.loc[1, "keep"])
    assert not bool(out.loc[7, "keep"])
    assert bool(out.loc[3, "keep"]) and out.loc[3, "n_dup_neighbors"] == 0


def test_semdedup_cross_cell_pairs_uncompared(spark):
    """The cluster bound is the whole point: vectors in different
    cells are never compared, even if similar — verifies the pair
    search really is cell-local (the O(N²/k) claim)."""
    from magmapandas_spark.operators.similarity import semdedup

    # two identical vectors but centroids chosen so they land in
    # different cells (each exactly on one centroid)
    va = [1.0, 0.0]
    rows = [(0, va), (1, [0.9, 0.1])]
    cents = [[1.0, 0.0], [0.9, 0.1]]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, cents, threshold=0.5).toPandas()
    assert (out["n_dup_neighbors"] == 0).all()
    assert out["keep"].all()


def test_semdedup_cell_guard_warns_and_keep_superset(spark):
    """The cell-population guard (max_cell_rows): overfull cells are
    deterministically hash-split (warning names them), sub-cell
    sharding only REMOVES comparisons — so keep verdicts are a
    superset of the unsharded run's — and the split is exact-parity
    with the DuckDB twin (oracle-checked in test_oracle via
    semdedup_sharded)."""
    import warnings

    import numpy as np

    from magmapandas_spark.operators.similarity import semdedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=8)
    # 30 vectors all in ONE cell (all near +base), several near-dups
    rows = [
        (i, (base * (1.0 + 0.001 * (i % 3))).tolist()) for i in range(30)
    ]
    cents = [base.tolist(), (-base).tolist()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    un = (
        semdedup(df, cents, threshold=0.9)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sh = (
            semdedup(df, cents, threshold=0.9, max_cell_rows=8)
            .toPandas()
            .set_index("vec_id")
            .sort_index()
        )
    msgs = [str(w.message) for w in caught]
    assert any("max_cell_rows" in m for m in msgs)
    # sharding can only drop pairs: unsharded keep ⇒ sharded keep,
    # and neighbor counts can only shrink
    assert bool(((~un["keep"]) | sh["keep"]).all())
    assert bool((sh["n_dup_neighbors"] <= un["n_dup_neighbors"]).all())
    # under-bound cells don't warn and don't change results
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        big = (
            semdedup(df, cents, threshold=0.9, max_cell_rows=1000)
            .toPandas()
            .set_index("vec_id")
            .sort_index()
        )
    assert not any("max_cell_rows" in str(w.message) for w in caught2)
    assert big.equals(un)


def test_ivf_seeded_rejects_string_ids(spark):
    """r11 ADVICE: the corpus assignment negates seed_id inside a
    max(struct) aggregate, which on a string id column yields nulls
    (non-ANSI) or an AnalysisException (ANSI). The numeric-id
    contract is enforced with a clear TypeError instead."""
    import pytest as _pytest

    from magmapandas_spark.operators.similarity import ivf_seeded
    from pyspark.sql import functions as F

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .limit(10)
        .withColumn("vec_id", F.col("vec_id").cast("string"))
    )
    with _pytest.raises(TypeError, match="numeric id"):
        ivf_seeded(emb, [0, 1], F.col("vec_id") == "0")


def test_hard_negative_mining_string_ids(spark):
    """r12 review: string vector ids must take the window form — the
    (-cid) aggregate would ANSI-error or null every winner. Same
    pos/neg picks as numeric ids mapped to strings."""
    from pyspark.sql import functions as F

    from magmapandas_spark.operators.contrastive import (
        hard_negative_mining,
    )

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .limit(30)
        .withColumn("label", (F.col("vec_id") % 3).cast("int"))
    )
    num = hard_negative_mining(emb.filter(F.col("vec_id") < 5), emb)
    s_emb = emb.withColumn(
        "vec_id", F.format_string("v%04d", F.col("vec_id"))
    )
    st = hard_negative_mining(
        s_emb.filter(F.col("vec_id") < "v0005"), s_emb
    )
    n_rows = {r["qid"]: (r["pos_id"], r["neg_id"]) for r in num.collect()}
    s_rows = {r["qid"]: (r["pos_id"], r["neg_id"]) for r in st.collect()}
    assert len(s_rows) == len(n_rows) > 0
    for qid, (p, n) in n_rows.items():
        sp, sn = s_rows[f"v{qid:04d}"]
        assert sp == f"v{p:04d}" and sn == f"v{n:04d}"


def test_lloyd_fit_incremental_init_bitwise_identical():
    """The r13 k-means++ seeding keeps a running nearest-center
    distance (one n×1 matmul per round) instead of rescoring every
    center picked so far. Pin bitwise identity against a verbatim
    replica of the pre-r13 full-matrix form on every fit shape the
    engine uses: the gate IVF fit (4096×64, k=8), the IVF-PQ coarse
    fit (n×64, k=16) and the 8 PQ subspace fits (n×8, k=64)."""
    import numpy as np

    from magmapandas_spark.operators.similarity import _lloyd_fit

    def lloyd_full_matrix(X, k, seed, iters=20):
        rng = np.random.RandomState(seed)
        n = X.shape[0]
        k = min(k, n)
        x2 = (X * X).sum(axis=1)
        centers = [X[rng.randint(n)]]
        for _ in range(1, k):
            C = np.asarray(centers)
            d2 = np.maximum(
                x2[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2.0 * X @ C.T,
                0.0,
            ).min(axis=1)
            tot = d2.sum()
            if tot <= 0:
                centers.append(X[rng.randint(n)])
                continue
            centers.append(X[rng.choice(n, p=d2 / tot)])
        C = np.asarray(centers, dtype=float)
        for _ in range(iters):
            d = (
                x2[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2.0 * X @ C.T
            )
            a = d.argmin(axis=1)
            for j in range(k):
                m = a == j
                if m.any():
                    C[j] = X[m].mean(axis=0)
        return C

    shapes = [(4096, 64, 8, 42), (2000, 64, 16, 42), (2000, 8, 64, 47)]
    for n, d, k, seed in shapes:
        X = np.random.RandomState(7).randn(n, d)
        a = lloyd_full_matrix(X, k, seed)
        b = _lloyd_fit(X, k, seed)
        assert np.array_equal(a, b), (n, d, k, seed)

    # degenerate duplicates: exercises the tot<=0 random-restart branch
    Xdup = np.zeros((64, 8))
    a = lloyd_full_matrix(Xdup, 8, 3)
    b = _lloyd_fit(Xdup, 8, 3)
    assert np.array_equal(a, b)
