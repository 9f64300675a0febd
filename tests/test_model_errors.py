"""Running-stddev window operator + error-curve fit vs a numpy mirror
of the reference loop (``tools/model_errors.py:20-42``)."""

import numpy as np
import pandas as pd

from magmapandas_spark.operators.model_errors import (
    error_func,
    fit_error_function,
    running_stddev,
)


def _reference_running_stddev(y, boxsize=30, sigma=2):
    fr = boxsize // 2

    def reject(d):
        return d[np.abs(d - np.median(d)) < sigma * np.std(d)]

    return np.array(
        [np.std(reject(y[j - fr:j + fr - 1])) for j in range(fr, len(y) - fr)]
    )


def test_running_stddev_matches_reference_loop(spark):
    rng = np.random.default_rng(3)
    n = 200
    x = np.sort(rng.uniform(0, 10, n))
    y = rng.normal(0, 0.5 + 0.1 * x, n)
    pdf = pd.DataFrame({"x": x, "y": y, "id": range(n)})
    out = (
        running_stddev(spark.createDataFrame(pdf), "x", "y", tiebreak="id")
        .toPandas()
        .sort_values("x")
    )
    exp = _reference_running_stddev(y)
    assert len(out) == len(exp)
    assert np.allclose(out["stddev"].to_numpy(), exp, atol=1e-12)


def test_running_stddev_drops_nonfinite(spark):
    y = np.ones(60)
    y[5] = np.nan
    y[10] = np.inf
    pdf = pd.DataFrame({"x": np.arange(60.0), "y": y, "id": range(60)})
    out = running_stddev(
        spark.createDataFrame(pdf), "x", "y", tiebreak="id"
    ).toPandas()
    # 58 finite rows -> 58 - 2*15 centers; identical values reject the
    # entire window (|v - med| < 2*0 is never true) -> NaN, matching
    # np.std([]) in the reference loop
    assert len(out) == 58 - 30
    assert np.isnan(out["stddev"]).all()


def test_fit_error_function_recovers_params():
    x = np.linspace(0.1, 8.0, 120)
    y = error_func(x, 0.3, 0.02, 0.9, 2.0)
    p, (lo, hi) = fit_error_function(x, y)
    assert np.abs(error_func(x, *p) - y).max() < 1e-8
    assert lo == x.min() and hi == x.max()


def test_deboor_splev_reproduces_polynomials():
    """B-spline evaluation sanity without scipy: constant and linear
    reproduction (partition of unity / Greville abscissae)."""
    from magmapandas_spark.operators.montecarlo import deboor_splev

    k = 3
    t = np.array([0.0, 0, 0, 0, 1, 2, 3, 3, 3, 3])
    n = len(t) - k - 1
    x = np.linspace(0, 3, 50)
    # all-ones coefficients -> constant 1
    assert np.allclose(deboor_splev(x, t, np.ones(n), k), 1.0, atol=1e-12)
    # coefficients at Greville abscissae -> identity
    greville = np.array([t[i + 1:i + k + 1].mean() for i in range(n)])
    assert np.allclose(deboor_splev(x, t, greville, k), x, atol=1e-12)


def test_fe3fe2_error_hp_tier():
    from magmapandas_spark.operators import montecarlo as mc

    x = np.linspace(0.06, 2.0, 25)
    for model in mc.FE3FE2_ERROR_PARAMS_1BAR:
        e1 = mc.fe3fe2_error_np(model, x)
        assert np.isfinite(e1).all() and (e1 > 0).all(), model
        ehp = mc.fe3fe2_error_np(model, x, P_bar=np.full_like(x, 5e3))
        assert np.isfinite(ehp).all(), model
    # pressure of exactly 1 bar -> 1-bar curve
    assert np.allclose(
        mc.fe3fe2_error_np("sun2024", x, P_bar=np.ones_like(x)),
        mc.fe3fe2_error_np("sun2024", x),
    )


def test_spline_fit_roundtrip_published_knots():
    """Fit -> eval must reproduce each shipped published error spline
    (the reference's splrep path, ``tools/model_errors.py:58-68``)."""
    import numpy as np

    from magmapandas_spark.operators import montecarlo as mc

    splines = mc._load_hp_splines()
    for model, (t, c, k) in list(splines.items())[:4]:
        xs = np.linspace(t[k], t[-k - 1], 400)
        ys = mc.deboor_splev(xs, t, c, k)
        t2, c2, k2 = mc.calculate_spline_parameters(
            xs, ys, k=3, n_knots=12, smoothing=0.0
        )
        ys2 = mc.deboor_splev(xs, t2, c2, k2)
        scale = np.maximum(np.abs(ys), 1e-3)
        assert np.max(np.abs(ys2 - ys) / scale) < 0.02, model


def test_spline_fit_interpolates_smooth_curve():
    import numpy as np

    from magmapandas_spark.operators import montecarlo as mc

    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(0.0, 6.0, 500))
    y = np.sin(x) + 0.5 * x
    t, c, k = mc.calculate_spline_parameters(x, y, n_knots=10)
    yhat = mc.deboor_splev(x, t, c, k)
    assert np.max(np.abs(yhat - y)) < 5e-3

    # smoothing damps noise: penalized fit is closer to the true curve
    noisy = y + rng.normal(0.0, 0.15, len(x))
    t0, c0, k0 = mc.calculate_spline_parameters(
        x, noisy, n_knots=30, smoothing=0.0
    )
    ts, cs, ks = mc.calculate_spline_parameters(
        x, noisy, n_knots=30, smoothing=50.0
    )
    err0 = np.mean((mc.deboor_splev(x, t0, c0, k0) - y) ** 2)
    errs = np.mean((mc.deboor_splev(x, ts, cs, ks) - y) ** 2)
    assert errs < err0


def test_fit_error_spline_from_running_stddev(spark):
    """End-to-end: running-σ output -> driver-side spline fit -> De Boor
    evaluation (the 'new model error curve' workflow)."""
    import numpy as np
    import pandas as pd

    from magmapandas_spark.operators import montecarlo as mc
    from magmapandas_spark.operators.model_errors import running_stddev

    rng = np.random.RandomState(1)
    n = 600
    x = np.sort(rng.uniform(0.0, 4.0, n))
    y = rng.normal(0.0, 0.1 + 0.2 * x)
    df = spark.createDataFrame(
        pd.DataFrame({"x": x, "y": y, "tb": np.arange(n)})
    )
    rs = running_stddev(df, "x", "y", boxsize=40, sigma=3.0, tiebreak="tb")
    t, c, k = mc.fit_error_spline(
        rs, "x", "stddev", n_knots=6, smoothing=1.0
    )
    xs = np.linspace(0.3, 3.7, 50)
    fitted = mc.deboor_splev(xs, t, c, k)
    true = 0.1 + 0.2 * xs
    assert np.all(fitted > 0)
    assert np.mean(np.abs(fitted - true) / true) < 0.35

def test_fit_error_spline_rejects_unaggregated_input(spark):
    """max_fit_rows guard: pointing the driver-side fit at a large
    (unaggregated) frame raises instead of collecting it."""
    import pytest as _pytest

    from magmapandas_spark.operators import montecarlo as mc

    big = spark.range(0, 500).selectExpr(
        "cast(id as double) as x", "cast(id as double) * 0.1 as y"
    )
    with _pytest.raises(ValueError, match="max_fit_rows"):
        mc.fit_error_spline(big, "x", "y", max_fit_rows=100)
    # explicit opt-in still works
    t, c, k = mc.fit_error_spline(big, "x", "y", max_fit_rows=1000)
    assert len(t) > 0 and k == 3
