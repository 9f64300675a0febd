"""KMV sketch semantics: exact below k, estimator accuracy above k,
mergeability-by-construction (order statistics of a deterministic
hash)."""

import pytest

from magmapandas_spark.operators.sketches import kmv_distinct


def test_exact_branch_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)], "g string, v long"
    )
    out = kmv_distinct(df, "g", "v", k=64).toPandas()
    assert out.loc[0, "n_exact"] == 7
    assert out.loc[0, "kmv_estimate"] == 7.0
    assert out.loc[0, "rel_error"] == 0.0


def test_estimator_branch_accuracy(spark):
    n = 5000
    df = spark.createDataFrame(
        [("a", i) for i in range(n)], "g string, v long"
    )
    out = kmv_distinct(df, "g", "v", k=256).toPandas()
    assert out.loc[0, "n_exact"] == n
    # KMV with k=256 has ~1/sqrt(k-2) ≈ 6% std error; 25% is a very
    # safe determinism-insensitive bound
    assert abs(out.loc[0, "kmv_estimate"] - n) / n < 0.25


def test_estimate_is_subset_stable(spark):
    # the bottom-k set of a subset is a superset-prefix: estimates for
    # the same group/values must be identical across partitionings
    rows = [("a", i * 17 % 1000) for i in range(3000)]
    df1 = spark.createDataFrame(rows, "g string, v long").repartition(2)
    df2 = spark.createDataFrame(rows, "g string, v long").repartition(13)
    e1 = kmv_distinct(df1, "g", "v").toPandas()
    e2 = kmv_distinct(df2, "g", "v").toPandas()
    assert e1.equals(e2)


def test_k_validation(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, "g", "v", k=1)


def test_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "g string, v long"
    )
    out = kmv_distinct(df, "g", "v").toPandas()
    assert out.loc[0, "n_exact"] == 2


# ------------------------- HLL --------------------------------------

def test_hll_estimator_accuracy(spark):
    from magmapandas_spark.operators.sketches import hll_distinct

    n = 5000
    df = spark.createDataFrame(
        [("a", i) for i in range(n)], "g string, v long"
    )
    out = hll_distinct(df, "g", "v").toPandas()
    assert out.loc[0, "n_exact"] == n
    # m=256 → ~6.5% std error; 25% is a safe bound
    assert abs(out.loc[0, "hll_estimate"] - n) / n < 0.25


def test_hll_duplicate_insensitive(spark):
    """max(rho) is idempotent: duplicating every value must not move
    the estimate at all (the property that lets the register table
    build without a distinct shuffle)."""
    from magmapandas_spark.operators.sketches import hll_distinct

    base = [("a", i) for i in range(1000)]
    once = spark.createDataFrame(base, "g string, v long")
    thrice = spark.createDataFrame(base * 3, "g string, v long")
    e1 = hll_distinct(once, "g", "v").toPandas().loc[0, "hll_estimate"]
    e3 = hll_distinct(thrice, "g", "v").toPandas().loc[0, "hll_estimate"]
    assert e1 == e3


def test_hll_small_range_correction(spark):
    """Tiny cardinalities fall in the linear-counting branch and stay
    close to exact (m·ln(m/zeros) with most registers empty)."""
    from magmapandas_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame(
        [("a", i % 5) for i in range(50)], "g string, v long"
    )
    out = hll_distinct(df, "g", "v").toPandas()
    assert out.loc[0, "n_exact"] == 5
    assert abs(out.loc[0, "hll_estimate"] - 5) < 1.0


def test_hll_nulls_excluded(spark):
    from magmapandas_spark.operators.sketches import hll_distinct

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None)], "g string, v long"
    )
    out = hll_distinct(df, "g", "v").toPandas()
    assert out.loc[0, "n_exact"] == 2


# ------------------------- CMS --------------------------------------

def test_cms_never_underestimates(spark):
    """The count-min guarantee: estimate >= true count, always."""
    from magmapandas_spark.operators.sketches import cms_token_counts

    docs = spark.createDataFrame(
        [(i, f"tok{i % 17} tok{i % 5} alpha beta") for i in range(200)],
        "doc_id long, text string",
    )
    out = cms_token_counts(docs, top_k=100).toPandas()
    assert (out["overestimate"] >= 0).all()
    assert (out["cms_estimate"] >= out["tf"]).all()


def test_cms_exact_when_alone_in_buckets(spark):
    """A single token can't collide with anything: all 4 counters hold
    only its own count, so the estimate is exact."""
    from magmapandas_spark.operators.sketches import cms_token_counts

    docs = spark.createDataFrame(
        [(0, "solo solo solo")], "doc_id long, text string"
    )
    out = cms_token_counts(docs).toPandas()
    assert len(out) == 1
    assert out.loc[0, "tf"] == 3 and out.loc[0, "cms_estimate"] == 3
