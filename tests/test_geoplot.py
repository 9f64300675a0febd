"""Driver-side plotting shim tests (geoplot.py).

matplotlib is absent in this container, so the figure CONTENT is
asserted through the ``*_spec`` twins (the complete description the
renderers draw from); render calls are gated on importorskip and a
RuntimeError naming the dependency is pinned for the no-mpl case.
Reference surface mirrored: ``geoplot/TAS_diagram.py:9-67``,
``geoplot/plot_layout.py:267-276``,
``model_calibrations/plot_calibration.py:75-139``.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from magmapandas_spark import geoplot

SF = "/root/testdata/sf0.001"


def test_subscript_numbers():
    assert geoplot.subscript_numbers("Al2O3") == "Al$_2$O$_3$"
    assert geoplot.subscript_numbers("SiO2") == "SiO$_2$"
    assert geoplot.subscript_numbers("MgO") == "MgO"


def test_tas_boundary_segments_cover_grid():
    segs = geoplot._tas_boundary_segments()
    # unique undirected edges only
    keys = {(min(a, b), max(a, b)) for a, b in segs}
    assert len(keys) == len(segs)
    # the canonical TAS landmarks are all drawn
    pts = {p for s in segs for p in s}
    for landmark in [(41.0, 0.0), (45.0, 5.0), (52.0, 5.0),
                     (57.0, 5.9), (63.0, 7.0), (69.0, 8.0),
                     (77.3, 0.0), (52.5, 14.0), (61.0, 13.5)]:
        assert landmark in pts


def test_tas_spec_from_classification_output(spark):
    from magmapandas_spark.operators.geochem_aux import (
        q_tas_classification,
    )

    spec = geoplot.tas_spec(q_tas_classification(spark, SF))
    assert spec["kind"] == "tas"
    assert spec["boundaries"] and spec["field_labels"]
    # every label anchor lies inside the plot window
    for lab in spec["field_labels"]:
        assert spec["xlim"][0] <= lab["x"] <= spec["xlim"][1]
        assert spec["ylim"][0] <= lab["y"] <= spec["ylim"][1]
    # one scatter series per classified rock, points on both axes
    assert spec["series"]
    names = {s["label"] for s in spec["series"]}
    assert "Basalt" in names or "Basaltic andesite" in names
    for s in spec["series"]:
        assert len(s["x"]) == len(s["y"]) > 0
    # all 15 rock fields are labelled
    assert len(spec["field_labels"]) == 15


def test_tas_spec_bounded_collect(spark):
    from magmapandas_spark.operators.geochem_aux import (
        q_tas_classification,
    )

    df = q_tas_classification(spark, SF)
    with pytest.warns(UserWarning, match="max_rows"):
        spec = geoplot.tas_spec(df, max_rows=10)
    assert sum(len(s["x"]) for s in spec["series"]) == 10


def test_spider_spec_wide_chondrite_output(spark):
    from magmapandas_spark.operators.geochem_aux import (
        q_chondrite_normalize,
    )

    df = q_chondrite_normalize(spark, SF).limit(5)
    spec = geoplot.spider_spec(df)
    assert spec["kind"] == "spider" and spec["yscale"] == "log"
    assert spec["elements"] == ["La", "Ce", "Nd", "Yb"]
    assert len(spec["series"]) == 5
    for s in spec["series"]:
        assert s["x"] == [0, 1, 2, 3]
        assert all(v > 0 for v in s["y"])  # normalized ratios


def test_spider_spec_long_format():
    pdf = pd.DataFrame(
        {
            "name": [1, 1, 2, 2],
            "element": ["La", "Ce", "La", "Ce"],
            "norm_value": [10.0, 8.0, 20.0, 16.0],
        }
    )
    spec = geoplot.spider_spec(pdf)
    assert spec["elements"] == ["La", "Ce"]
    assert spec["series"][0]["y"] == [10.0, 8.0]
    assert spec["series"][1]["y"] == [20.0, 16.0]


def test_calibration_spec_in_out_split(spark):
    from magmapandas_spark.models import thermometers as tm
    from magmapandas_spark.models.thermometers import calibration_flag
    from magmapandas_spark.relational.suite import synthetic_melt

    gf = synthetic_melt(spark, SF)
    flag = calibration_flag(gf, "putirka2008_15")
    per_sample = (
        tm.putirka2008_15(gf, P_bar="P_bar")
        .withColumn("in_range", flag)
        .select("name", "SiO2", "T_K", "in_range")
    )
    spec = geoplot.calibration_spec(
        per_sample, "SiO2", "T_K", model="putirka2008_15"
    )
    assert spec["kind"] == "calibration"
    assert spec["xlabel"] == "SiO$_2$"
    assert spec["title"] == "putirka2008_15 calibration"
    labels = {s["label"] for s in spec["series"]}
    assert labels == {"in calibration", "out of calibration"}
    n = sum(len(s["x"]) for s in spec["series"])
    assert n > 0


def test_render_paths():
    """With matplotlib: all three render and return (fig, ax). Without
    (this container): a RuntimeError NAMES the missing dependency —
    never a bare ImportError mid-draw."""
    pdf_tas = pd.DataFrame(
        {"sio2_n": [49.0], "alkali_n": [3.0], "rock": ["Basalt"]}
    )
    try:
        import matplotlib  # noqa: F401

        have_mpl = True
    except ImportError:
        have_mpl = False
    if not have_mpl:
        with pytest.raises(RuntimeError, match="matplotlib"):
            geoplot.tas_plot(pdf_tas)
        with pytest.raises(RuntimeError, match="matplotlib"):
            geoplot.spider_plot(
                pd.DataFrame({"name": [1], "La_N": [2.0]})
            )
        with pytest.raises(RuntimeError, match="matplotlib"):
            geoplot.plot_calibration(
                pd.DataFrame(
                    {"SiO2": [49.0], "T_K": [1400.0], "in_range": [True]}
                ),
                "SiO2", "T_K",
            )
        return
    fig, ax = geoplot.tas_plot(pdf_tas)
    assert len(ax.lines) >= len(geoplot._tas_boundary_segments())
    fig2, ax2 = geoplot.spider_plot(
        pd.DataFrame({"name": [1, 2], "La_N": [2.0, 3.0],
                      "Ce_N": [1.5, 2.5]})
    )
    assert ax2.get_yscale() == "log"
    fig3, ax3 = geoplot.plot_calibration(
        pd.DataFrame(
            {"SiO2": [49.0, 75.0], "T_K": [1400.0, 1100.0],
             "in_range": [True, False]}
        ),
        "SiO2", "T_K",
    )
    assert ax3.get_xlabel() == "SiO$_2$"


def test_collect_bounds_pandas_input_too():
    """max_rows applies to pre-collected pandas frames, not just Spark
    inputs — both documented shapes honor the same contract."""
    pdf = pd.DataFrame(
        {"sio2_n": [49.0] * 30, "alkali_n": [3.0] * 30,
         "rock": ["Basalt"] * 30}
    )
    with pytest.warns(UserWarning, match="max_rows"):
        spec = geoplot.tas_spec(pdf, max_rows=10)
    assert sum(len(s["x"]) for s in spec["series"]) == 10


def test_calibration_pt_spec_axis_conventions(spark):
    """P-T panel: temperature converted to degrees C, pressure to kbar
    (the reference's plot_calibration_PT axis convention), in/out
    split intact."""
    from magmapandas_spark.models import thermometers as tm
    from magmapandas_spark.models.thermometers import calibration_flag
    from magmapandas_spark.relational.suite import synthetic_melt

    gf = synthetic_melt(spark, SF)
    per_sample = (
        tm.putirka2008_15(gf, P_bar="P_bar")
        .withColumn("in_range", calibration_flag(gf, "putirka2008_15"))
        .select("name", "T_K", "P_bar", "in_range")
        .limit(50)
    )
    spec = geoplot.calibration_PT_spec(per_sample, model="putirka2008_15")
    assert spec["kind"] == "calibration_PT"
    assert spec["xlabel"].startswith("T (") and spec["ylabel"] == "P (kbar)"
    pdf = per_sample.toPandas()
    all_x = [v for s in spec["series"] for v in s["x"]]
    all_y = [v for s in spec["series"] for v in s["y"]]
    assert len(all_x) == len(pdf)
    # axis transforms hold exactly
    assert abs(min(all_x) - (pdf["T_K"].min() - 273.15)) < 1e-9
    assert abs(max(all_y) - (pdf["P_bar"].max() / 1e3)) < 1e-9


def test_spider_spec_warns_on_dropped_elements():
    """r11 ADVICE: long-form rows whose element is absent from an
    explicit element_order must not vanish silently — a typo'd list
    would yield a plausible but incomplete polyline."""
    import warnings

    pdf = pd.DataFrame(
        {
            "name": [1, 1, 1],
            "element": ["La", "Ce", "Nd"],
            "norm_value": [10.0, 8.0, 6.0],
        }
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        spec = geoplot.spider_spec(pdf, element_order=["La", "Ce"])
    assert any("Nd" in str(x.message) for x in w)
    assert spec["series"][0]["y"] == [10.0, 8.0]
    # no warning when the order covers everything
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        geoplot.spider_spec(pdf, element_order=["La", "Ce", "Nd"])
    assert not [x for x in w if "dropped" in str(x.message)]


def test_calibration_spec_null_flag_third_series():
    """r11 ADVICE: rows with a null calibration flag appear as a
    'flag unknown' series instead of vanishing from the figure."""
    pdf = pd.DataFrame(
        {
            "SiO2": [48.0, 52.0, 55.0],
            "T_K": [1400.0, 1380.0, 1360.0],
            "in_range": [True, False, None],
        }
    )
    spec = geoplot.calibration_spec(pdf, "SiO2", "T_K")
    labels = [s["label"] for s in spec["series"]]
    assert labels == ["in calibration", "out of calibration",
                      "flag unknown"]
    unk = spec["series"][2]
    assert unk["x"] == [55.0] and unk["y"] == [1360.0]
    # and absent entirely when every flag is set
    spec2 = geoplot.calibration_spec(
        pdf.assign(in_range=[True, False, True]), "SiO2", "T_K"
    )
    assert [s["label"] for s in spec2["series"]] == [
        "in calibration", "out of calibration"
    ]


def test_calibration_pt_spec_records_inverted_y():
    """r11 ADVICE: the reference inverts the pressure axis (depth
    convention, plot_calibration.py:210) — the spec must record it so
    renderers draw P increasing downward."""
    pdf = pd.DataFrame(
        {
            "T_K": [1400.0, 1500.0],
            "P_bar": [2000.0, 4000.0],
            "in_range": [True, False],
        }
    )
    spec = geoplot.calibration_PT_spec(pdf)
    assert spec["invert_y"] is True
    # the plain x-y calibration scatter stays upright
    assert "invert_y" not in geoplot.calibration_spec(
        pdf, "T_K", "P_bar"
    )


def test_spider_spec_null_element_does_not_crash():
    """r12 review: a null element name with an explicit element_order
    must not TypeError inside the skipped-elements sort — nulls drop
    silently (pandas groupby semantics), named strings still warn."""
    import warnings

    pdf = pd.DataFrame(
        {
            "name": [1, 1, 1],
            "element": ["La", None, "Nd"],
            "norm_value": [10.0, 8.0, 6.0],
        }
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        spec = geoplot.spider_spec(pdf, element_order=["La"])
    assert spec["series"][0]["y"] == [10.0]
    assert any("Nd" in str(x.message) for x in w)
