"""Phase convenience surfaces: the reference's user-facing API.

``Melt`` mirrors ``core/MagmaFrames/melt.py:21-414`` — every method is
a thin config-dispatching composition over the operator library, so a
MagmaPandas user can switch 1:1:

    melt = read_melt(spark, "melts.csv")
    T = Melt(melt).temperature(P_bar=4000)         # config thermometer
    rho = Melt(melt).density(T_K="T_K", P_bar=4000)
    fe = Melt(melt).Fe3Fe2(T_K="T_K", P_bar=4000)

``Olivine``/``Clinopyroxene``/``Plagioclase``/``Magnetite``/``Ilmenite``
mirror the mineral subclasses (``olivine.py``, ``clinopyroxene.py``,
``plagioclase.py``, ``magnetite.py``, ``ilmenite.py``).

The config is snapshotted when each method BUILDS its plan (driver
side); executors never see it (SURVEY §7 risk 6). All methods return
DataFrames (lazy plans), composing freely with further transformations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from magmapandas_spark.configuration import Configuration, configuration
from magmapandas_spark.core.geoframe import GeoFrame


class _Phase:
    def __init__(self, gf: GeoFrame, config: Configuration | None = None):
        self.gf = gf
        self._config = config

    @property
    def config(self) -> Configuration:
        return (self._config or configuration).snapshot()


class Melt(_Phase):
    """``core/MagmaFrames/melt.py:21`` convenience operators."""

    def temperature(self, P_bar=0.0, offset: float = 0.0, **kw) -> DataFrame:
        """Config-dispatched melt thermometer (``melt.py:42-59``)."""
        from magmapandas_spark.models.thermometers import (
            melt_thermometers_dict,
        )

        cfg = self.config
        fn = melt_thermometers_dict[cfg.melt_thermometer]
        import inspect

        params = inspect.signature(fn).parameters
        if "P_bar" in params:
            kw.setdefault("P_bar", P_bar)
        return fn(self.gf, offset=offset, **kw)

    def Fe3Fe2(self, T_K, P_bar, fO2: Column | None = None, **kw) -> DataFrame:
        """``melt.py:162-223`` + ``Fe_redox/Fe3Fe2_calculate.py:6-38``."""
        from magmapandas_spark.models.fe3fe2 import calculate_Fe3Fe2

        cfg = self.config
        return calculate_Fe3Fe2(
            self.gf, T_K, P_bar,
            model=cfg.Fe3Fe2_model, fO2=fO2,
            fO2_buffer=cfg.fO2_buffer, dfO2=cfg.dfO2,
            fixed_value=cfg.Fe3Fe2_fixed_value, **kw,
        )

    def FeO_Fe2O3(self, Fe3Fe2, **kw) -> GeoFrame:
        """``melt.py:225-274``."""
        return self.gf.FeO_Fe2O3_calc(Fe3Fe2, **kw)

    def density(self, T_K, P_bar, **kw) -> DataFrame:
        """``melt.py:61-94``: Fe3Fe2 chain is the caller's business in
        the engine (pass a pre-split composition for exact parity);
        the Iacovino (2019) density itself is pure expression."""
        from magmapandas_spark.models.rheology import calculate_density

        return calculate_density(self.gf, T_K, P_bar, **kw)

    def viscosity(self, T_K, **kw) -> DataFrame:
        """``melt.py:96-111`` → Giordano (2008)."""
        from magmapandas_spark.models.rheology import calculate_viscosity

        return calculate_viscosity(self.gf, T_K, **kw)

    def temperature_from_density(self, density, P_bar, **kw) -> DataFrame:
        """Inverse density thermometer (``rheology/density.py:117-147``)."""
        from magmapandas_spark.models.rheology import calculate_temperature

        return calculate_temperature(self.gf, density, P_bar, **kw)

    def tetrahedral_cations(self, out_col: str = "tetrahedral_cations"):
        """``melt.py:113-131``."""
        from magmapandas_spark.models.minerals import (
            tetrahedral_cations_expr,
        )

        return self.gf.df.withColumn(
            out_col, tetrahedral_cations_expr(self.gf)
        )

    def NBO(self, **kw) -> DataFrame:
        """``melt.py:133-147``."""
        from magmapandas_spark.models.minerals import nbo

        return nbo(self.gf, **kw)

    def NBO_T(self, **kw) -> DataFrame:
        """``melt.py:149-160``."""
        from magmapandas_spark.models.minerals import nbo_t

        return nbo_t(self.gf, **kw)

    def Kd_olivine_FeMg_eq(self, T_K, P_bar, **kw) -> DataFrame:
        """``melt.py:276-316`` + ``Kd_calculate.py:65-102``."""
        from magmapandas_spark.models.kd import calculate_FeMg_Kd

        cfg = self.config
        kw.setdefault("fO2_buffer", cfg.fO2_buffer)
        kw.setdefault("dfO2", cfg.dfO2)
        kw.setdefault("Fe3Fe2_model", cfg.Fe3Fe2_model.removesuffix("_deng"))
        kw.setdefault("fixed_value", cfg.Kd_fixed_value)
        return calculate_FeMg_Kd(
            self.gf, T_K, P_bar, model=cfg.Kd_model, **kw
        )

    def volatile_saturation_pressure(self, T_K, **kw) -> DataFrame:
        """``melt.py:318-414`` — the Pool fan-out as one UDF stage."""
        from magmapandas_spark.models.volatiles import (
            volatile_saturation_pressure,
        )

        cfg = self.config
        kw.setdefault("model", cfg.volatile_solubility)
        kw.setdefault("species", cfg.volatile_species)
        return volatile_saturation_pressure(self.gf, T_K, **kw)


class Olivine(_Phase):
    """``core/MagmaFrames/olivine.py:12``."""

    def forsterite(self, **kw) -> DataFrame:
        return __import__(
            "magmapandas_spark.models.minerals", fromlist=["forsterite"]
        ).forsterite(self.gf, **kw)

    def formula(self) -> GeoFrame:
        from magmapandas_spark.models.minerals import olivine_formula

        return olivine_formula(self.gf)

    def calculate_FeMg_Kd(self, melt: GeoFrame, T_K, P_bar, **kw) -> DataFrame:
        """Observed Kd from a measured olivine-melt pair
        (``olivine.py:60-95``): forsterite from this olivine joined to
        the melt on the sample key."""
        from pyspark.sql import functions as F

        from magmapandas_spark.models.kd import observed_FeMg_Kd
        from magmapandas_spark.models.minerals import forsterite

        cfg = self.config
        on = kw.pop("on", "name")
        fo = forsterite(self.gf).select(on, "Fo")
        joined_melt = GeoFrame(
            melt.df.join(F.broadcast(fo), on=on, how="inner"),
            units=melt.units, datatype=melt.datatype, species=melt.species,
        )
        kw.setdefault("fO2_buffer", cfg.fO2_buffer)
        kw.setdefault("dfO2", cfg.dfO2)
        kw.setdefault("Fe3Fe2_model", cfg.Fe3Fe2_model.removesuffix("_deng"))
        return observed_FeMg_Kd(joined_melt, F.col("Fo"), T_K, P_bar, **kw)


class Clinopyroxene(_Phase):
    """``core/MagmaFrames/clinopyroxene.py:8`` (``endmembers`` is an
    unimplemented stub in the reference — deliberately not built)."""

    def mg_no(self, **kw) -> DataFrame:
        from magmapandas_spark.models.minerals import cpx_mg_no

        return cpx_mg_no(self.gf, **kw)

    def formula(self) -> GeoFrame:
        from magmapandas_spark.models.minerals import cpx_formula

        return cpx_formula(self.gf)


class Plagioclase(_Phase):
    """``core/MagmaFrames/plagioclase.py:7``."""

    def anorthite(self, **kw) -> DataFrame:
        from magmapandas_spark.models.minerals import plagioclase_anorthite

        return plagioclase_anorthite(self.gf, **kw)

    def endmembers(self) -> DataFrame:
        from magmapandas_spark.models.minerals import plagioclase_endmembers

        return plagioclase_endmembers(self.gf)

    def formula(self) -> GeoFrame:
        from magmapandas_spark.models.minerals import plagioclase_formula

        return plagioclase_formula(self.gf)


class Magnetite(_Phase):
    """``core/MagmaFrames/magnetite.py:12``."""

    def endmembers(self) -> DataFrame:
        from magmapandas_spark.models.minerals import magnetite_endmembers

        return magnetite_endmembers(self.gf)

    def Fe_speciation(self) -> DataFrame:
        from magmapandas_spark.models.minerals import magnetite_fe_speciation

        return magnetite_fe_speciation(self.gf)


class Ilmenite(_Phase):
    """``core/MagmaFrames/ilmenite.py:12``."""

    def endmembers(self) -> DataFrame:
        from magmapandas_spark.models.minerals import ilmenite_endmembers

        return ilmenite_endmembers(self.gf)

    def Fe_speciation(self) -> DataFrame:
        from magmapandas_spark.models.minerals import ilmenite_fe_speciation

        return ilmenite_fe_speciation(self.gf)
