"""Notebook-parity quickstart: the reference's melt_basics.ipynb
EP1-EP3 flows end-to-end on the engine, asserted against the
REFERENCE NOTEBOOK'S OWN STORED OUTPUTS
(``docs/source/notebooks/melt_basics.ipynb``, cells 3-26), not
engine-internal goldens — user-facing parity, not just operator
parity (r10 verdict item 6).

The notebook was executed with the configuration its own ``print``
cells record: thermometer putirka2008_16, Fe3+/Fe2+ borisov2018,
fO2 buffer QFM with ΔfO2 = 0 — the flow below sets exactly that.
Tolerances reflect cross-implementation float-path drift between the
reference's eager pandas chains and the engine's codegen'd Column
expressions (documented per assert); the solver tiers (saturation)
additionally differ in bracket-refinement step order.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from magmapandas_spark.configuration import Configuration
from magmapandas_spark.core.geoframe import GeoFrame
from magmapandas_spark.core.phases import Melt
from magmapandas_spark.parse_io.readers import read_melt

from .conftest import MELTS_CSV

NAMES = [
    "PI032-04-01", "PI032-04-02", "PI041-02-02", "PI041-03-01",
    "PI041-03-03", "PI041-05-04", "PI041-05-06", "PI041-07-01",
    "PI041-07-02", "PI052-01-02",
]

# melt_basics.ipynb stored outputs -------------------------------------
NB_T_K = [  # cells 8/10: melt.temperature(P_bar=4e3), putirka2008_16
    1441.689112, 1438.624308, 1395.139632, 1442.484997, 1441.510214,
    1370.343045, 1399.939176, 1440.598613, 1439.236321, 1368.655861,
]
NB_FE3FE2 = [  # cells 16/18: melt.Fe3Fe2(T_K, P_bar), borisov2018 ΔQFM+0
    0.192937, 0.190789, 0.173552, 0.192178, 0.196175,
    0.181691, 0.187878, 0.195070, 0.191716, 0.195356,
]
# cell 15: moles.FeO_Fe2O3_calc(0.33, wtpc=False), first 3 samples
NB_MOLES_SIO2 = [0.498648, 0.496051, 0.518555]
NB_MOLES_FEO = [0.061930, 0.063410, 0.067958]
# cell 20: melt.FeO_Fe2O3_calc(Fe3Fe2=...), wt.% FeO of first 3
NB_SPECIATED_FEO = [8.165077, 8.321875, 8.709566]
NB_P_IM2012 = [  # cell 23: volatile_saturation_pressure, iaconomarziano2012
    5853.465872, 6504.086975, 4772.936412, 6417.666636, 6296.956179,
    4100.520755, 5150.179572, 4776.667586, 3804.242787, 2586.324019,
]
# Two of the ten notebook IM2012 pressures are reference-solver
# artifacts, adjudicated numerically (see
# test_ep3_im2012_outliers_are_reference_artifacts): at the engine's
# root the observed H2O AND CO2 are reproduced to <0.3%, while at the
# notebook's pressure NO x_fluid satisfies the model's own equations
# (CO2 over-predicted 9-12%). The reference solves the 2-D system
# with scipy root() on an abs() residual — non-smooth at the root, so
# hybr can stall — and float32-truncates H2O mid-iteration
# (iaconomarziano2012.py:537-563, 534).
IM2012_REF_ARTIFACTS = {"PI032-04-02", "PI041-07-01"}
NB_P_A22 = [  # cell 26: volatile_saturation_pressure, allison2022
    4759.038948, 5370.482770, 4878.423290, 5792.580142, 5976.245167,
    5231.131109, 5797.897481, 4503.986268, 3904.017937, 2594.307474,
]

P_BAR = 4000.0


@pytest.fixture(scope="module")
def melt(spark):
    return read_melt(spark, MELTS_CSV, index_col="name")


@pytest.fixture(scope="module")
def nb_config():
    # the configuration the notebook's print cells record
    return Configuration(
        melt_thermometer="putirka2008_16",
        Fe3Fe2_model="borisov2018",
        dfO2=0.0,
    )


@pytest.fixture(scope="module")
def temperatures(melt, nb_config):
    """Cell 8: temperatures = melt.temperature(P_bar=4e3) — kept as a
    GeoFrame so downstream steps consume T_K as a column, the
    engine's distributed twin of passing the pandas Series around."""
    tdf = Melt(melt, config=nb_config).temperature(P_bar=P_BAR)
    return GeoFrame(
        tdf, units=melt.units, datatype=melt.datatype, species=melt.species
    )


def _vec(df, col):
    pdf = df.select("name", col).toPandas().set_index("name")
    return pdf.loc[NAMES, col].to_numpy(dtype=float)


def test_ep1_read_melt(melt):
    """Cells 2-3: read_melt parses the notebook CSV; heads match."""
    pdf = melt.df.select("name", "SiO2", "Al2O3").toPandas().set_index(
        "name"
    )
    assert list(pdf.index.sort_values()[:3]) == NAMES[:3]
    assert np.allclose(
        pdf.loc[NAMES[:3], "SiO2"],
        [49.402603, 48.832207, 49.124916],
        atol=1e-6,
    )
    assert melt.has_total


def test_ep2_temperature_matches_notebook(temperatures):
    """Cells 8/10 parity: eager pandas vs codegen'd expression —
    sub-0.01 K agreement."""
    got = _vec(temperatures.df, "T_K")
    assert np.allclose(got, NB_T_K, atol=1e-2)


def test_ep2_thermometer_switch_changes_result(melt, temperatures):
    """Cell 9: switching the configured thermometer switches the
    dispatched model (16 ≠ 15 on these melts)."""
    t15 = _vec(
        Melt(melt).temperature(P_bar=P_BAR), "T_K"
    )  # default thermometer = putirka2008_15
    t16 = _vec(temperatures.df, "T_K")
    assert not np.allclose(t15, t16, atol=0.5)


def test_ep2_moles_and_fixed_speciation(melt):
    """Cells 14-15: moles() then FeO_Fe2O3_calc(0.33, wtpc=False) —
    mole-fraction speciation parity on the stored head."""
    moles = melt.moles()
    sp = moles.FeO_Fe2O3_calc(0.33, wtpc=False)
    pdf = (
        sp.df.select("name", "SiO2", "FeO", "Fe2O3")
        .toPandas().set_index("name")
    )
    assert np.allclose(
        pdf.loc[NAMES[:3], "SiO2"], NB_MOLES_SIO2, atol=1e-5
    )
    assert np.allclose(
        pdf.loc[NAMES[:3], "FeO"], NB_MOLES_FEO, atol=1e-5
    )
    assert (pdf["Fe2O3"] > 0).all()


def test_ep2_fe3fe2_matches_notebook(temperatures, nb_config):
    """Cells 16/18 parity: borisov2018 at QFM+0 with the cell-8
    temperatures. rtol 2e-3 covers the compounded drift of the
    T_K difference (≤0.01 K) through the 10^(...) model form."""
    out = Melt(temperatures, config=nb_config).Fe3Fe2(
        T_K=F.col("T_K"), P_bar=F.lit(P_BAR)
    )
    got = _vec(out, "Fe3Fe2")
    assert np.allclose(got, NB_FE3FE2, rtol=2e-3)


def test_ep2_speciation_from_computed_fe3fe2(temperatures, nb_config):
    """Cell 20 parity: FeO_Fe2O3_calc(Fe3Fe2=<computed column>) —
    the wt.% FeO after speciation matches the notebook head."""
    m = Melt(temperatures, config=nb_config)
    with_fe = m.Fe3Fe2(T_K=F.col("T_K"), P_bar=F.lit(P_BAR))
    gf = GeoFrame(
        with_fe, units=temperatures.units,
        datatype=temperatures.datatype, species=temperatures.species,
    )
    sp = gf.FeO_Fe2O3_calc(F.col("Fe3Fe2"))
    pdf = sp.df.select("name", "FeO").toPandas().set_index("name")
    assert np.allclose(
        pdf.loc[NAMES[:3], "FeO"], NB_SPECIATED_FEO, atol=0.02
    )


def _saturation(temperatures, model):
    cfg = Configuration(
        melt_thermometer="putirka2008_16",
        Fe3Fe2_model="borisov2018",
        dfO2=0.0,
        volatile_solubility=model,
    )
    out = Melt(temperatures, config=cfg).volatile_saturation_pressure(
        T_K=F.col("T_K")
    )
    return _vec(out, "P_bar_sat")


def test_ep3_saturation_allison_matches_notebook(temperatures):
    """Cell 26 parity: allison2022 saturation — all ten samples within
    0.5% of the notebook (vectorized bisection vs brentq)."""
    assert np.allclose(_saturation(temperatures, "allison2022"),
                       NB_P_A22, rtol=5e-3)


def test_ep3_saturation_im2012_matches_notebook(temperatures):
    """Cell 23 parity: iaconomarziano2012 saturation — the eight
    reference-converged samples within 0.5%; the two adjudicated
    solver artifacts excluded (and pinned separately below)."""
    got = _saturation(temperatures, "iaconomarziano2012")
    mask = np.array([n not in IM2012_REF_ARTIFACTS for n in NAMES])
    assert np.allclose(
        np.asarray(got)[mask], np.asarray(NB_P_IM2012)[mask], rtol=5e-3
    )


def test_ep3_im2012_outliers_are_reference_artifacts(temperatures):
    """The adjudication itself, pinned: for the two divergent samples
    the ENGINE's root reproduces the observed H2O and CO2 through the
    model's own solubility equations to <0.5%, while the NOTEBOOK's
    pressure cannot — its best-x CO2 misfit exceeds 8%. Whoever
    satisfies the equations owns the root."""
    import pandas as pd

    from magmapandas_spark.models import volatiles as vol

    melts = pd.read_csv(MELTS_CSV).set_index("name")
    t_by_name = dict(zip(NAMES, NB_T_K))
    nb_by_name = dict(zip(NAMES, NB_P_IM2012))
    for name in sorted(IM2012_REF_ARTIFACTS):
        row = melts.loc[name]
        wt = {
            s: np.array([float(row[s])])
            for s in melts.columns
            if s != "total"
        }
        T = np.array([t_by_name[name]])
        w_obs, c_obs = float(row["H2O"]), float(row["CO2"])
        P_eng, x_eng = vol.mixed_saturation_np(
            wt, np.array([w_obs]), np.array([c_obs]), T
        )

        def misfit_at(P, x):
            w = vol.h2o_solubility_np(wt, np.array([P]), T, x)[0]
            c = vol.co2_solubility_np(wt, np.array([P]), T, x)[0]
            return abs(w - w_obs) / w_obs + abs(c - c_obs) / c_obs

        def best_misfit(P):
            # fine scan over the physically relevant x range (both
            # roots sit near x ≈ 0.03-0.05) plus a coarse full sweep
            xs = np.concatenate(
                [np.linspace(1e-4, 0.2, 2001), np.linspace(0.2, 0.999, 200)]
            )
            return min(misfit_at(P, x) for x in xs)

        # engine root at its own x_fluid: both equations satisfied
        assert misfit_at(float(P_eng[0]), float(x_eng[0])) < 5e-3, name
        # notebook pressure: no x satisfies them
        assert best_misfit(nb_by_name[name]) > 8e-2, name


# ======================================================================
# frame_basics.ipynb (r11 verdict item 5) — asserted against the
# notebook's own stored outputs (cells 5-19)
# ======================================================================

from .conftest import OLIVINES_CSV  # noqa: E402
from magmapandas_spark.parse_io.readers import read_olivine  # noqa: E402

FB_ELEMENTS = [  # cell 12: melt.elements
    "SiO2", "Al2O3", "MgO", "CaO", "FeO", "Na2O", "K2O", "MnO",
    "TiO2", "P2O5", "CO2", "H2O", "F", "S", "Cl",
]
FB_WEIGHTS = {  # cell 13: melt.weights (g/mol, 3 decimals as stored)
    "SiO2": 60.084, "Al2O3": 101.961, "MgO": 40.304, "CaO": 56.077,
    "FeO": 71.844, "Na2O": 61.979, "K2O": 94.195, "MnO": 70.937,
    "TiO2": 79.865, "P2O5": 141.943, "CO2": 44.008, "H2O": 18.015,
    "F": 18.998, "S": 32.065, "Cl": 35.453,
}
FB_OL_WEIGHTS = {  # cell 14: olivine.weights
    "SiO2": 60.084, "FeO": 71.844, "MgO": 40.304, "NiO": 74.692,
    "MnO": 70.937, "Al2O3": 101.961, "CaO": 56.077,
}
# cell 8: melt.describe() — SiO2 column (pandas linear-interpolation
# percentiles; Spark's percentile() uses the same rule)
FB_DESCRIBE_SIO2 = {
    "mean": 47.372314, "std": 1.665998, "min": 45.313339,
    "p25": 45.888515, "p50": 47.041178, "p75": 49.051739,
    "max": 49.402603,
}
# cell 9: olivine[["FeO","MgO"]].sum(axis=1), first 10 by name
FB_OL_FEMG_SUM = [
    60.431599, 60.230499, 60.134102, 60.052002, 60.175400,
    59.365799, 59.394402, 58.552601, 61.860100, 61.831001,
]
# cell 16: melt.cations() row PI032-04-01
FB_CATIONS_ROW1 = {
    "Si": 0.423566, "Al": 0.146914, "Mg": 0.083195, "Ca": 0.092404,
    "Fe": 0.069965, "Na": 0.062127,
}
# cell 17: melt.moles() row PI032-04-01
FB_MOLES_ROW1 = {
    "SiO2": 0.498648, "Al2O3": 0.086478, "MgO": 0.097943,
    "CaO": 0.108783, "FeO": 0.082367, "Na2O": 0.036570,
}


@pytest.fixture(scope="module")
def olivine(spark):
    return read_olivine(spark, OLIVINES_CSV, index_col="name")


def test_fb_direct_constructor(spark):
    """Cell 5: building a frame from a dict mirrors mp.Olivine(...)."""
    import pandas as pd

    from magmapandas_spark.parse_io.readers import geoframe_from_pandas

    pdf = pd.DataFrame(
        {"SiO2": [38.5, 37.9], "FeO": [16.0, 15.9],
         "MgO": [44.4, 44.3]},
        index=pd.Index(["ol_1", "ol_2"], name="name"),
    )
    gf = geoframe_from_pandas(
        spark, pdf, units="wt.%", datatype="oxide"
    )
    out = gf.df.orderBy("name").toPandas().set_index("name")
    assert np.allclose(out.loc["ol_1", ["SiO2", "FeO", "MgO"]],
                       [38.5, 16.0, 44.4])
    assert set(gf.species) == {"SiO2", "FeO", "MgO"}


def test_fb_describe_matches_pandas(melt):
    """Cell 8: melt.describe() — the GeoFrame API reproduces the
    notebook's stored SiO2 summary (count/mean/std/min/max exact;
    percentiles via Spark's exact linear-interpolation percentile,
    the same rule pandas applies)."""
    pdf = melt.describe().toPandas().set_index("summary")
    assert pdf.loc["count", "SiO2"] == 10
    keymap = {"mean": "mean", "std": "std", "min": "min",
              "p25": "25%", "p50": "50%", "p75": "75%", "max": "max"}
    for k, v in FB_DESCRIBE_SIO2.items():
        got = pdf.loc[keymap[k], "SiO2"]
        assert abs(got - v) < 1e-5, (k, got, v)
    # statistic rows in pandas order, one column per species
    assert list(pdf.index) == ["count", "mean", "std", "min",
                               "25%", "50%", "75%", "max"]
    assert "Al2O3" in pdf.columns


def test_fb_horizontal_sum(olivine):
    """Cell 9: olivine[['FeO','MgO']].sum(axis=1) — stored float32
    series, first 10 samples by name."""
    out = (
        olivine.df.select(
            "name", (F.col("FeO") + F.col("MgO")).alias("s")
        )
        .orderBy("name")
        .limit(10)
        .toPandas()
    )
    assert np.allclose(out["s"], FB_OL_FEMG_SUM, atol=1e-4)


def test_fb_elements_and_weights(melt, olivine):
    """Cells 12-14: elements list (order preserved from the CSV) and
    atomic-weight catalogues."""
    assert melt.elements == FB_ELEMENTS
    # the engine's atomic-weight table is a newer IUPAC revision than
    # the reference's (e.g. S 32.06 vs 32.065) — parity tolerance is
    # table-revision scale, tight enough to catch any wrong-element bug
    for el, w in FB_WEIGHTS.items():
        assert abs(melt.weights[el] - w) < 0.01, el
    for el, w in FB_OL_WEIGHTS.items():
        assert abs(olivine.weights[el] - w) < 0.01, el


def test_fb_cations_and_moles(melt):
    """Cells 16-17: cation and oxide mol-fraction conversions, row
    PI032-04-01 against the stored frames."""
    cat = melt.cations().df.filter(
        F.col("name") == "PI032-04-01"
    ).collect()[0]
    for el, v in FB_CATIONS_ROW1.items():
        assert abs(cat[el] - v) < 1e-5, el
    mol = melt.moles().df.filter(
        F.col("name") == "PI032-04-01"
    ).collect()[0]
    for ox, v in FB_MOLES_ROW1.items():
        assert abs(mol[ox] - v) < 1e-5, ox


def test_fb_units_strings(melt):
    """Cell 19: (melt.units, cations.units, moles.units) =
    ('oxide wt.%', 'cation mol fraction', 'oxide mol fraction')."""
    from magmapandas_spark.core.geoframe import Datatype, Unit

    cats, mols = melt.cations(), melt.moles()
    assert (melt.datatype, melt.units) == (Datatype.OXIDE, Unit.WT_PERCENT)
    assert (cats.datatype, cats.units) == (
        Datatype.CATION, Unit.MOL_FRACTIONS
    )
    assert (mols.datatype, mols.units) == (
        Datatype.OXIDE, Unit.MOL_FRACTIONS
    )


# ======================================================================
# mineral_basics.ipynb — cells 3, 6, 7
# ======================================================================

MB_HEAD_ROW1 = {  # cell 3: olivine.head() row PI032-01-04
    "SiO2": 38.495300, "FeO": 16.0033, "MgO": 44.428299,
    "NiO": 0.168422, "MnO": 0.232958, "Al2O3": 0.040249,
    "CaO": 0.250944, "total": 99.619470,
}
MB_FORMULA_ROW1 = {  # cell 6: olivine.formula row PI032-01-04 (4 O pfu)
    "Si": 0.979029, "Fe": 0.340381, "Mg": 1.684450,
    "Ni": 0.003446, "Mn": 0.005018, "Al": 0.001206,
}
MB_FO = [  # cell 7: olivine.forsterite, first 10 by name
    0.831896, 0.832376, 0.832367, 0.835241, 0.831348,
    0.829748, 0.827532, 0.799603, 0.779810, 0.778383,
]


def test_mb_read_head(olivine):
    row = olivine.df.filter(F.col("name") == "PI032-01-04").collect()[0]
    for c, v in MB_HEAD_ROW1.items():
        assert abs(row[c] - v) < 1e-4, c


def test_mb_formula(spark, olivine):
    from magmapandas_spark.core.phases import Olivine

    out = Olivine(olivine).formula().df.filter(
        F.col("name") == "PI032-01-04"
    ).collect()[0]
    for el, v in MB_FORMULA_ROW1.items():
        # weight-table revision drift propagates ~1e-5 into the
        # cations-per-4-O formula; 1e-4 still pins the chemistry
        assert abs(out[el] - v) < 1e-4, el


def test_mb_forsterite(olivine):
    from magmapandas_spark.core.phases import Olivine

    out = (
        Olivine(olivine).forsterite()
        .select("name", "Fo").orderBy("name").limit(10).toPandas()
    )
    assert np.allclose(out["Fo"], MB_FO, atol=1e-5)


# ======================================================================
# config.ipynb — cells 2, 4, 6, 8, 10, 12
# ======================================================================

def test_cfg_defaults_repr():
    """Cell 2: the default configuration repr records the reference's
    defaults (QFM, ΔfO2 1, sun2024, toplis2005, putirka2008_15,
    iaconomarziano2012, mixed)."""
    r = repr(Configuration())
    for token in ["QFM", "sun2024", "toplis2005", "putirka2008_15",
                  "iaconomarziano2012", "mixed"]:
        assert token in r, token
    assert "ΔfO2" in r


def test_cfg_available_models_catalogue():
    """Cell 4: available_models() lists every family with the
    notebook's model names present."""
    s = Configuration.available_models_str()
    for token in ["armstrong2019", "borisov2018", "deng2020", "fixed",
                  "hirschmann2022", "kress_carmichael1991",
                  "blundy2020", "saper2022", "sun2020",
                  "putirka2008_13", "shea2022", "sugawara2000_6a",
                  "iaconomarziano2012", "co2, h2o, mixed"]:
        assert token in s, token


def test_cfg_invalid_value_message():
    """Cell 8: invalid model names raise the reference's wording with
    the valid options listed."""
    cfg = Configuration()
    with pytest.raises(ValueError, match="is not recognised"):
        cfg.melt_thermometer = "some thermometer"
    try:
        cfg.melt_thermometer = "some thermometer"
    except ValueError as e:
        assert "putirka2008_15" in str(e)


def test_cfg_fixed_models_and_reset():
    """Cells 10/12: sequence-set fixed models print 'fixed V±E';
    reset() restores the defaults."""
    cfg = Configuration()
    cfg.Kd_model = ["fixed", 0.33, 0.02]
    cfg.Fe3Fe2_model = ("fixed", 0.25, 0.05)
    r = repr(cfg)
    assert "fixed 0.33±0.02" in r and "fixed 0.25±0.05" in r
    assert cfg.Kd_fixed_value == 0.33 and cfg.Fe3Fe2_fixed_error == 0.05
    with pytest.raises(ValueError, match="positive floats"):
        cfg.Kd_model = "fixed"
    with pytest.raises(ValueError, match="positive floats"):
        cfg.Kd_model = ["fixed", -1.0, 0.02]
    cfg.reset()
    r2 = repr(cfg)
    assert "toplis2005" in r2 and "sun2024" in r2
    assert cfg.Kd_fixed_value is None


# ----------------------------------------------------------------------
# Fe3Fe2_errors.ipynb (r13 verdict item 7; r12 item 5 carried) —
# the reference's error-model derivation notebook
# (``model_calibrations/data/Fe3Fe2_errors.ipynb``). Its validation
# CSV is not shipped, so the full fit cannot be replayed; the
# STORED OUTPUTS are the parity surface: the model catalogue
# (cell 7), the 1-bar fitted error parameters (cell 17) that the
# engine embeds as FE3FE2_ERROR_PARAMS_1BAR, and the high-pressure
# spline window endpoints (cell 21 knots) the engine embeds as
# VALIDATION_LIMITS_HIGH_PRESSURE.
# ----------------------------------------------------------------------

# cell 7: print("\n".join(models)) — the 12 computed Fe3Fe2 models
NB_FE_ERR_MODELS = [
    "armstrong2019", "borisov2018", "deng2020", "hirschmann2022",
    "jayasuriya2004", "kress_carmichael1991", "oneill2006", "oneill2018",
    "putirka2016_6b", "putirka2016_6c", "sun2024", "zhang2017",
]

# cell 17: opt.curve_fit params per model (notebook display names ->
# engine registry names). The notebook rerun and the reference's
# committed Fe3Fe2_errors.py values differ in the ~5th significant
# digit (scipy lm on identical data); rtol=1e-3 covers that drift.
NB_1BAR_FITS = {
    "armstrong2019": (1.85786526e-01, 3.01012779e-02, 9.80908180e-01,
                      1.38981220e02),
    "deng2020": (2.07517182e-01, 3.67122574e-03, 9.81786273e-01,
                 1.96442938e02),
    "hirschmann2022": (0.06558719, 0.02810096, 0.56167845, 4.64421989),
    "oneill2006": (2.40671679e-01, 1.17056951e-02, 9.86394234e-01,
                   2.09113418e02),
    "oneill2018": (1.05928984e-02, 8.16688488e-02, 7.86674390e-01,
                   1.12117269e01),
    "sun2024": (0.05573283, 0.04157452, 0.4727692, 3.60686759),
    "zhang2017": (1.71420881e-01, 5.50814149e-03, 9.85221818e-01,
                  2.35216497e02),
    "borisov2018": (0.07881702, 0.02656421, 0.4333133, 3.4452295),
    "jayasuriya2004": (1.38784813e-01, 2.08193376e-02, 9.85875764e-01,
                       1.86942686e02),
    "kress_carmichael1991": (7.05463020e-02, 2.43940927e-02,
                             9.88024806e-01, 2.25645326e02),
    "putirka2016_6b": (5.72217982e-02, 5.16056662e-02, 9.85659083e-01,
                       1.81879745e02),
    "putirka2016_6c": (-3.34648539e-02, 7.56520883e-02, 9.84864214e-01,
                       1.55199181e02),
}

# cell 21: every model's splrep knot vector starts/ends at the
# validation window [0.05263158, 2.16064117]
NB_HP_KNOTS = (0.05263158, 2.16064117)


def test_fe_errors_model_catalogue_matches_notebook():
    """Cell 7: the notebook computes errors for exactly the 12
    non-fixed Fe3Fe2 models; the engine's registry carries all of
    them (plus 'fixed' and the engine's documented sun2024_deng EOS
    variant — the only extras)."""
    from magmapandas_spark.models.fe3fe2 import Fe3Fe2_models

    missing = set(NB_FE_ERR_MODELS) - set(Fe3Fe2_models)
    assert not missing, missing
    extras = set(Fe3Fe2_models) - set(NB_FE_ERR_MODELS)
    assert extras == {"fixed", "sun2024_deng"}


def test_fe_errors_1bar_fits_match_embedded_params():
    """Cell 17: the notebook's freshly fitted 1-bar error parameters
    reproduce the parameters the engine embeds (the reference's
    committed Fe3Fe2_errors.py values) to fit-rerun tolerance."""
    from magmapandas_spark.operators.montecarlo import (
        FE3FE2_ERROR_PARAMS_1BAR,
    )

    assert sorted(NB_1BAR_FITS) == sorted(FE3FE2_ERROR_PARAMS_1BAR)
    for name, nb in NB_1BAR_FITS.items():
        emb = FE3FE2_ERROR_PARAMS_1BAR[name]
        np.testing.assert_allclose(emb, nb, rtol=1e-3, err_msg=name)


def test_fe_errors_1bar_curve_via_engine_expression(spark):
    """The engine's fe3fe2_error_expr (the Spark column the Monte
    Carlo tier consumes) evaluates the same a·x + b·x² + c^(x+d)
    curve the notebook fits — checked at sample points against the
    notebook's armstrong2019 parameters."""
    from magmapandas_spark.operators.montecarlo import fe3fe2_error_expr

    xs = [0.05, 0.3, 1.0, 3.0, 5.9]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r["e"]
        for r in df.select(
            fe3fe2_error_expr("armstrong2019", F.col("x")).alias("e")
        ).collect()
    ]
    a, b, c, d = NB_1BAR_FITS["armstrong2019"]
    want = [a * x + b * x * x + c ** (x + d) for x in xs]
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_fe_errors_hp_window_matches_notebook_knots():
    """Cell 21: every stored splrep knot vector is clamped to the
    high-pressure validation window — the engine embeds exactly those
    endpoints (VALIDATION_LIMITS_HIGH_PRESSURE)."""
    from magmapandas_spark.operators.montecarlo import (
        VALIDATION_LIMITS_HIGH_PRESSURE,
    )

    np.testing.assert_allclose(
        VALIDATION_LIMITS_HIGH_PRESSURE, NB_HP_KNOTS, rtol=1e-6
    )


def test_fe_errors_running_std_flow(spark):
    """Cells 15-17's machinery on the engine: the distributed
    running_stddev (boxsize=30) + fit_error_function round-trips a
    curve of the notebook's own family — the flow the notebook runs
    per model, with the fit recovering the generating parameters."""
    from magmapandas_spark.operators.model_errors import (
        error_func,
        fit_error_function,
        running_stddev,
    )

    rng = np.random.default_rng(11)
    a, b, c, d = NB_1BAR_FITS["hirschmann2022"]
    x = np.sort(rng.uniform(0.05, 5.9, 600))
    sigma = error_func(x, a, b, c, d)
    y = x + rng.normal(0.0, sigma)
    df = spark.createDataFrame(
        [(float(xi), float(yi)) for xi, yi in zip(x, y)],
        "x double, y double",
    )
    stats = (
        running_stddev(df, "x", "y", boxsize=30)
        .select("x", "stddev")
        .toPandas()
    )
    params, _ = fit_error_function(
        stats["x"].to_numpy(), stats["stddev"].to_numpy()
    )
    xs = np.linspace(0.2, 5.5, 40)
    np.testing.assert_allclose(
        error_func(xs, *params), error_func(xs, a, b, c, d),
        rtol=0.5, atol=0.05,
    )


# ----------------------------------------------------------------------
# calibration_plots.ipynb — model-selection / calibration-dataset
# flows (``docs/source/notebooks/calibration_plots.ipynb``). The
# packaged experimental CSVs are reference package data (out of the
# engine's scope by design — geoplot.calibration_spec docstring);
# the parity surface is the model catalogues the notebook prints
# (cells 8/14), the data contract of the reference CSVs the engine's
# docs point at (cell 17), and the plot flows through the engine's
# spec twins (cells 10-30).
# ----------------------------------------------------------------------

# cell 8 stored output
NB_CAL_FE3FE2_MODELS = [
    "armstrong2019", "borisov2018", "deng2020", "fixed",
    "hirschmann2022", "jayasuriya2004", "kress_carmichael1991",
    "oneill2006", "oneill2018", "putirka2016_6b", "putirka2016_6c",
    "sun2024", "zhang2017",
]
NB_CAL_KD_MODELS = [
    "blundy2020", "fixed", "putirka2016_8a", "putirka2016_8b",
    "putirka2016_8c", "putirka2016_8d", "saper2022", "sun2020",
    "toplis2005",
]
# cell 17 stored output: the calibration datasets' column contracts
NB_CAL_FE3FE2_COLS = [
    "ref", "run", "SiO2", "TiO2", "Al2O3", "MgO", "CaO", "Na2O", "K2O",
    "P2O5", "MnO", "CoO", "NiO", "Pb", "FeO", "T_K", "fO2", "_Fe3Fe2",
    "P_bar",
]
NB_CAL_KD_COLS = [
    "ref", "run", "SiO2", "TiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO",
    "Na2O", "K2O", "P2O5", "Cr2O3", "CoO", "NiO", "H2O", "CO2", "total",
    "_Fe3Fetotal", "T_K", "P_bar", "_Fe3Fe2", "olivine_forsterite",
    "fO2", "kd_FeTMg", "kd_Fe2Mg",
]

_CAL_DATA_DIR = "/root/reference/src/MagmaPandas/model_calibrations/data"


def test_cal_model_catalogues_match_notebook():
    """Cells 8/14: mp.Fe3Fe2_models / mp.Kd_ol_FeMg_models — the
    engine's registries list exactly the notebook's models."""
    from magmapandas_spark.models.fe3fe2 import Fe3Fe2_models
    from magmapandas_spark.models.kd import Kd_models

    assert (
        set(Fe3Fe2_models) - {"sun2024_deng"}  # documented engine extra
        == set(NB_CAL_FE3FE2_MODELS)
    )
    assert sorted(Kd_models) == NB_CAL_KD_MODELS


def test_cal_dataset_contract_matches_notebook():
    """Cell 17: the packaged calibration CSVs (which the engine's
    calibration_spec docs point users at) carry exactly the stored
    column lists — including the axis options the notebook plots
    (_Fe3Fe2, olivine_forsterite, kd_Fe2Mg)."""
    import pandas as pd

    fe = pd.read_csv(f"{_CAL_DATA_DIR}/Fe3Fe2_calibration_data.csv")
    kd = pd.read_csv(f"{_CAL_DATA_DIR}/Kd_calibration_data.csv")
    assert list(fe.columns) == NB_CAL_FE3FE2_COLS
    assert list(kd.columns) == NB_CAL_KD_COLS


def test_cal_plot_calibration_flow(spark):
    """Cells 18/24: plot_calibration over the quickstart melts — the
    engine flow is read_melt -> calibration_flag -> calibration_spec;
    every melt sample lands in exactly one series and the spec carries
    the notebook's axis choices."""
    from magmapandas_spark.geoplot import calibration_spec
    from magmapandas_spark.models.thermometers import calibration_flag

    melt = read_melt(spark, MELTS_CSV, index_col="name")
    flag = calibration_flag(melt, "putirka2008_15")
    flagged = melt.df.withColumn("in_range", flag)
    spec = calibration_spec(
        flagged, "SiO2", "MgO", model="putirka2008_15"
    )
    assert spec["kind"] == "calibration"
    labels = [s["label"] for s in spec["series"]]
    assert labels[:2] == ["in calibration", "out of calibration"]
    n_total = sum(len(s["x"]) for s in spec["series"])
    assert n_total == melt.df.count()
    assert spec["xlabel"].startswith("SiO")  # subscripted oxide label


def test_cal_plot_calibration_pt_flow(spark):
    """Cells 10/12: plot_calibration_PT — the engine's PT spec uses
    the notebook's axis conventions (T in °C, P in kbar, pressure
    increasing downward)."""
    from magmapandas_spark.geoplot import calibration_PT_spec
    from magmapandas_spark.models.thermometers import calibration_flag

    melt = read_melt(spark, MELTS_CSV, index_col="name")
    flag = calibration_flag(melt, "putirka2008_15")
    flagged = (
        melt.df.withColumn("in_range", flag)
        .withColumn("T_K", F.lit(1473.15))
        .withColumn("P_bar", F.lit(4000.0))
    )
    spec = calibration_PT_spec(flagged, model="putirka2008_15")
    assert spec["kind"] == "calibration_PT"
    assert spec["invert_y"] is True
    assert "°C" in spec["xlabel"] and "kbar" in spec["ylabel"]
    xs = [x for s in spec["series"] for x in s["x"]]
    ys = [y for s in spec["series"] for y in s["y"]]
    assert all(abs(x - 1200.0) < 1e-6 for x in xs)  # 1473.15 K -> °C
    assert all(abs(y - 4.0) < 1e-9 for y in ys)  # 4000 bar -> kbar
