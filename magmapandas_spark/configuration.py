"""Engine configuration: model selection with validated setters.

Re-expression of the reference's ``configuration`` singleton
(``src/MagmaPandas/configuration.py:90-196``) for a distributed engine:
the config lives on the DRIVER and is *snapshotted at query
construction* — the resolved model name is baked into the generated
logical plan, never read from executors (SURVEY §7 risk 6). Defaults
match the reference (``configuration.py:90-97``).
"""

from __future__ import annotations

from dataclasses import dataclass


def _check(name: str, value, options) -> None:
    if value not in options:
        # reference's user-facing wording (parse_io/validate.py:64)
        raise ValueError(
            f"{value!r} is not recognised, please choose from: "
            f"{tuple(sorted(options))}"
        )


FO2_BUFFERS = {"QFM", "IW", "NNO", "NNO_1bar", "NNO_frost", "RuRuO2",
               "IW_campbell", "IW_zhang", "IW_oneill1993_1bar", "FeFeO94",
               "QFM_1bar"}
FE3FE2_MODELS = {
    "fixed", "borisov2018", "kress_carmichael1991", "jayasuriya2004",
    "putirka2016_6b", "putirka2016_6c", "deng2020", "oneill2006",
    "oneill2018", "armstrong2019", "zhang2017", "hirschmann2022",
    "sun2024", "sun2024_deng",
}
KD_MODELS = {
    "fixed", "toplis2005", "blundy2020", "putirka2016_8a",
    "putirka2016_8b", "putirka2016_8c", "putirka2016_8d", "sun2020",
    "saper2022",
}
MELT_THERMOMETERS = {
    "putirka2008_13", "putirka2008_14", "putirka2008_15",
    "putirka2008_16", "putirka2008_22", "sun2020", "shea2022",
    "sugawara2000_3", "sugawara2000_6a",
}
VOLATILE_MODELS = {"iaconomarziano2012", "shishkina2014", "allison2022"}
VOLATILE_SPECIES = {"h2o", "co2", "mixed"}


@dataclass
class Configuration:
    """Driver-side model registry selection (defaults =
    ``configuration.py:90-97``)."""

    fO2_buffer: str = "QFM"
    dfO2: float = 1.0
    Kd_model: str = "toplis2005"
    Fe3Fe2_model: str = "sun2024"
    melt_thermometer: str = "putirka2008_15"
    volatile_solubility: str = "iaconomarziano2012"
    volatile_species: str = "mixed"
    # fixed-model values + 1σ errors (reference: _Kd_value/_Kd_error,
    # configuration.py:130-143)
    Kd_fixed_value: float | None = None
    Kd_fixed_error: float | None = None
    Fe3Fe2_fixed_value: float | None = None
    Fe3Fe2_fixed_error: float | None = None

    def __setattr__(self, name, value):
        checks = {
            "fO2_buffer": FO2_BUFFERS,
            "Kd_model": KD_MODELS,
            "Fe3Fe2_model": FE3FE2_MODELS,
            "melt_thermometer": MELT_THERMOMETERS,
            "volatile_solubility": VOLATILE_MODELS,
            "volatile_species": VOLATILE_SPECIES,
        }
        # the reference's fixed-value protocol
        # (configuration.py:124-143): cfg.Kd_model = ("fixed", v, e)
        # sets the model AND its value/error in one assignment, and a
        # bare "fixed" string is rejected with instructions
        if name in ("Kd_model", "Fe3Fe2_model"):
            prefix = "Kd" if name == "Kd_model" else "Fe3Fe2"
            if isinstance(value, (tuple, list)):
                if len(value) != 3 or value[0] != "fixed":
                    # a non-'fixed' tuple would otherwise set the model
                    # AND silently park stale fixed_value/error state
                    raise ValueError(
                        f"Please provide {prefix} value and error as "
                        "positive floats or ints in a tuple or list, as "
                        "('fixed', value, error) e.g. ('fixed', 0.3, 0.05)"
                    )
                model, v, e = value
                # bool is an int subclass: ('fixed', True, True) must
                # not silently configure 1.00±1.00
                if any(
                    not isinstance(i, (float, int))
                    or isinstance(i, bool)
                    or i <= 0
                    for i in (v, e)
                ):
                    raise ValueError(
                        f"Please provide {prefix} value and error as "
                        "positive floats or ints"
                    )
                object.__setattr__(self, name, model)
                object.__setattr__(self, f"{prefix}_fixed_value", float(v))
                object.__setattr__(self, f"{prefix}_fixed_error", float(e))
                return
            if value == "fixed":
                raise ValueError(
                    f"Please provide {prefix} value and error as "
                    "positive floats or ints in a tuple or list, as "
                    "('fixed', value, error) e.g. ('fixed', 0.3, 0.05)"
                )
        if name in checks:
            _check(name, value, checks[name])
        object.__setattr__(self, name, value)

    def snapshot(self) -> "Configuration":
        """Immutable-ish copy captured at query-construction time.

        Copies the __dict__ directly rather than via
        ``dataclasses.replace``: replace() re-feeds every field
        through ``__setattr__`` in declaration order, and a
        configured fixed model would re-assign the bare "fixed"
        string BEFORE its value/error fields exist on the new
        instance — tripping the sequence-protocol guard on a state
        that is already valid (r12 review finding, reproduced)."""
        new = object.__new__(Configuration)
        new.__dict__.update(self.__dict__)
        return new

    def reset(self) -> None:
        for k, v in Configuration().__dict__.items():
            object.__setattr__(self, k, v)

    def _model_display(self, which: str) -> str:
        """``fixed 0.33±0.02`` for fixed models (configuration.py:
        199-212), the plain model name otherwise."""
        model = getattr(self, f"{which}_model")
        if model != "fixed":
            return model
        v = getattr(self, f"{which}_fixed_value")
        e = getattr(self, f"{which}_fixed_error")
        return f"fixed {v:.2f}±{e:.2f}"

    def available_models(self) -> None:
        """Print the option catalogue (``configuration.py:258-264``;
        config.ipynb cell 4)."""
        print(self.available_models_str())

    @staticmethod
    def available_models_str() -> str:
        rows = [
            ("fO2 buffers", sorted(FO2_BUFFERS)),
            ("Melt Fe3+/Fe2+ models", sorted(FE3FE2_MODELS)),
            ("Ol-melt Fe-Mg Kd models", sorted(KD_MODELS)),
            ("Melt thermometers", sorted(MELT_THERMOMETERS)),
            ("Volatile solubility models", sorted(VOLATILE_MODELS)),
            ("Volatile species", sorted(VOLATILE_SPECIES)),
        ]
        pad = 70
        lines = [
            " MagmaPandas-Spark ".center(pad, "#"),
            "#" * pad,
            f"{'Configuration options':_<{pad}}",
        ]
        for name, opts in rows:
            lines.append(f"{name:.<28}{', '.join(opts):.>42}"
                         if len(", ".join(opts)) <= 42
                         else f"{name}:\n    " + "\n    ".join(
                             ", ".join(opts[i:i + 4])
                             for i in range(0, len(opts), 4)))
        return "\n".join(lines)

    def __repr__(self) -> str:  # ``configuration.py:198-236``
        rows = [
            ("fO2 buffer", self.fO2_buffer),
            ("ΔfO2", self.dfO2),
            ("Kd Fe-Mg ol-melt", self._model_display("Kd")),
            ("Melt Fe3+/Fe2+", self._model_display("Fe3Fe2")),
            ("Melt thermometer", self.melt_thermometer),
            ("Volatile solubility", self.volatile_solubility),
            ("Volatile species", self.volatile_species),
        ]
        pad = 44
        lines = [" MagmaPandas-Spark configuration ".center(pad, "#")]
        lines += [f"{k:.<24}{str(v):.>20}" for k, v in rows]
        return "\n".join(lines)


# module-level default, mirroring the reference's import-and-mutate use
configuration = Configuration()
