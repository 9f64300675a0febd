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
