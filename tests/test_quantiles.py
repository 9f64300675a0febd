"""Histogram-quantile semantics: estimator bounded by one bin width,
mergeability-by-construction (integer bin counts), degenerate groups."""

from magmapandas_spark.operators.quantiles import histogram_quantiles


def test_error_bounded_by_bin_width(spark):
    import random

    rng = random.Random(11)
    rows = [("a", rng.uniform(0.0, 100.0)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = histogram_quantiles(df, "g", "x", n_bins=100).toPandas()
    # 100 bins over [0, 100] → bin width ~1; estimate must land within
    # one bin of the true order statistic
    assert (out["err"].abs() <= 100.0 / 100 + 1e-9).all()


def test_constant_group_degenerates(spark):
    df = spark.createDataFrame(
        [("a", 5.0)] * 50, "g string, x double"
    )
    out = histogram_quantiles(df, "g", "x").toPandas()
    assert (out["exact"] == 5.0).all()
    # all mass in bin 0 of a zero-width histogram: mn == mx, so the
    # interpolation collapses onto mn
    assert (out["est"] == 5.0).all()


def test_estimate_only_path_skips_sort(spark):
    """compare_exact=False is the production path — no per-group sort
    anywhere in the plan."""
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "g string, x double"
    )
    out = histogram_quantiles(df, "g", "x", compare_exact=False)
    assert out.count() == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cumulative window sorts ≤ n_bins histogram rows; the raw
    # values themselves must never be globally sorted — no rank window
    # over x appears
    assert "row_number" not in plan.lower()
