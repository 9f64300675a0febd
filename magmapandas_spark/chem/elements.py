"""Chemical-formula metadata: atomic weights, formula parsing, oxide
stoichiometry.

Replaces the reference's dependency on the external ``elementMass`` package
(used at ``src/MagmaPandas/core/Elements.py:91-146`` and
``parse_io/readers.py:51-57``) with a self-contained implementation built
from public IUPAC 2021 standard atomic weights.

All of this is *driver-side metadata* work: weights and stoichiometric
ratios are resolved once at plan-construction time and enter Spark plans as
literals — no executor-side chemistry.
"""

from __future__ import annotations

import re
from fractions import Fraction
from functools import lru_cache

# IUPAC 2021 standard atomic weights (conventional values), g/mol.
ATOMIC_WEIGHTS: dict[str, float] = {
    "H": 1.008, "He": 4.002602, "Li": 6.94, "Be": 9.0121831, "B": 10.81,
    "C": 12.011, "N": 14.007, "O": 15.999, "F": 18.998403163, "Ne": 20.1797,
    "Na": 22.98976928, "Mg": 24.305, "Al": 26.9815385, "Si": 28.085,
    "P": 30.973761998, "S": 32.06, "Cl": 35.45, "Ar": 39.948,
    "K": 39.0983, "Ca": 40.078, "Sc": 44.955908, "Ti": 47.867,
    "V": 50.9415, "Cr": 51.9961, "Mn": 54.938044, "Fe": 55.845,
    "Co": 58.933194, "Ni": 58.6934, "Cu": 63.546, "Zn": 65.38,
    "Ga": 69.723, "Ge": 72.630, "As": 74.921595, "Se": 78.971,
    "Br": 79.904, "Kr": 83.798, "Rb": 85.4678, "Sr": 87.62,
    "Y": 88.90584, "Zr": 91.224, "Nb": 92.90637, "Mo": 95.95,
    "Ru": 101.07, "Rh": 102.90550, "Pd": 106.42, "Ag": 107.8682,
    "Cd": 112.414, "In": 114.818, "Sn": 118.710, "Sb": 121.760,
    "Te": 127.60, "I": 126.90447, "Xe": 131.293, "Cs": 132.90545196,
    "Ba": 137.327, "La": 138.90547, "Ce": 140.116, "Pr": 140.90766,
    "Nd": 144.242, "Sm": 150.36, "Eu": 151.964, "Gd": 157.25,
    "Tb": 158.92535, "Dy": 162.500, "Ho": 164.93033, "Er": 167.259,
    "Tm": 168.93422, "Yb": 173.045, "Lu": 174.9668, "Hf": 178.49,
    "Ta": 180.94788, "W": 183.84, "Re": 186.207, "Os": 190.23,
    "Ir": 192.217, "Pt": 195.084, "Au": 196.966569, "Hg": 200.592,
    "Tl": 204.38, "Pb": 207.2, "Bi": 208.98040, "Th": 232.0377,
    "U": 238.02891,
}

# Default (geochemically conventional) oxidation states used to derive the
# default oxide for a bare cation name, mirroring the reference's
# cation↔oxide naming convention (``core/MagmaFrames/magmaFrame.py:266-313``):
# a cation named "Fe" maps to FeO, while "Fe3" maps to Fe2O3.
DEFAULT_OXIDATION_STATE: dict[str, int] = {
    "H": 1, "Li": 1, "Be": 2, "B": 3, "C": 4, "Na": 1, "Mg": 2,
    "Al": 3, "Si": 4, "P": 5, "K": 1, "Ca": 2, "Sc": 3, "Ti": 4,
    "V": 5, "Cr": 3, "Mn": 2, "Fe": 2, "Co": 2, "Ni": 2, "Cu": 2, "Zn": 2,
    "Ga": 3, "Rb": 1, "Sr": 2, "Y": 3, "Zr": 4, "Nb": 5, "Mo": 6, "Ba": 2,
    "La": 3, "Ce": 3, "Nd": 3, "Cs": 1, "Pb": 2, "Th": 4, "U": 4, "W": 6,
    "Sn": 4, "Hf": 4, "Ta": 5,
}

_TOKEN = re.compile(r"([A-Z][a-z]?)(\d+/\d+|\d*\.?\d*)")


class NotAFormula(ValueError):
    pass


@lru_cache(maxsize=4096)
def parse_formula(formula: str) -> tuple[tuple[str, float], ...]:
    """Parse ``SiO2``/``Al2O3``/``Ti1/2O`` into ((element, count), ...).

    Raises NotAFormula for names that are not chemical formulas (the
    mechanism the reference uses to classify CSV columns as chemical vs
    not — ``parse_io/readers.py:51-57``).
    """
    if not formula or not isinstance(formula, str):
        raise NotAFormula(str(formula))
    pos = 0
    out: list[tuple[str, float]] = []
    for m in _TOKEN.finditer(formula):
        if m.start() != pos:
            raise NotAFormula(formula)
        pos = m.end()
        sym, count = m.group(1), m.group(2)
        if sym not in ATOMIC_WEIGHTS:
            raise NotAFormula(formula)
        if count == "":
            n = 1.0
        elif "/" in count:
            n = float(Fraction(count))
        else:
            n = float(count)
        out.append((sym, n))
    if pos != len(formula) or not out:
        raise NotAFormula(formula)
    return tuple(out)


@lru_cache(maxsize=4096)
def calculate_weight(name: str) -> float:
    """Molar weight of a species column name.

    Mirrors the reference's name-normalisation quirk
    (``core/Elements.py:112-114``): names without a capital "O" have
    digits stripped first, so cation names like ``Fe3`` weigh as ``Fe``.
    """
    target = re.sub(r"\d+", "", name) if "O" not in name else name
    parts = parse_formula(target)
    return sum(ATOMIC_WEIGHTS[sym] * n for sym, n in parts)


def is_chemical(name: str) -> bool:
    """Would the reference classify this column name as chemical data?"""
    try:
        calculate_weight(name)
        return True
    except NotAFormula:
        return False


@lru_cache(maxsize=4096)
def oxide_info(name: str) -> tuple[str, float, float]:
    """(cation_element, n_cations, n_oxygens) for a species name.

    Bare elements (``F``, ``Cl``, ``S``, cation names like ``Mg``/``Fe3``)
    have n_oxygens = 0 and count 1.
    """
    stripped = re.sub(r"\d+", "", name) if "O" not in name else name
    parts = dict(parse_formula(stripped))
    n_ox = parts.pop("O", 0.0)
    if not parts:  # pure oxygen "O"
        return ("O", 1.0, n_ox)
    if len(parts) != 1:
        # multi-cation formulas don't occur in the reference's tables
        raise NotAFormula(f"multi-cation species unsupported: {name}")
    (elem, n_cat), = parts.items()
    return (elem, float(n_cat), float(n_ox))


def cation_name(oxide: str) -> str:
    """Cation column name for an oxide, reference convention.

    Default oxidation state → bare element symbol (``MgO``→``Mg``,
    ``FeO``→``Fe``); non-default → symbol + state (``Fe2O3``→``Fe3``).
    """
    elem, n_cat, n_ox = oxide_info(oxide)
    if n_ox == 0:
        return oxide if "O" in oxide else re.sub(r"\d+", "", oxide)
    state = 2.0 * n_ox / n_cat
    default = DEFAULT_OXIDATION_STATE.get(elem)
    if default is not None and abs(state - default) < 1e-9:
        return elem
    if abs(state - round(state)) < 1e-9:
        return f"{elem}{int(round(state))}"
    return elem


def oxide_name(cation: str) -> str:
    """Inverse of :func:`cation_name`: ``Fe``→``FeO``, ``Fe3``→``Fe2O3``,
    ``Si``→``SiO2`` (mirrors ``elementMass.get_oxide_names`` usage at
    ``magmaFrame.py:293``)."""
    m = re.fullmatch(r"([A-Z][a-z]?)(\d*)", cation)
    if m is None:
        raise NotAFormula(cation)
    elem, state_s = m.group(1), m.group(2)
    if elem not in ATOMIC_WEIGHTS:
        raise NotAFormula(cation)
    state = int(state_s) if state_s else DEFAULT_OXIDATION_STATE.get(elem)
    if state is None:
        # no conventional oxide (F, Cl, S as elemental volatiles):
        # pass through unchanged, matching the reference's treatment of
        # non-oxide species columns
        return cation
    if state % 2 == 0:
        n_cat, n_ox = 1, state // 2
    else:
        n_cat, n_ox = 2, state
    cat_part = elem if n_cat == 1 else f"{elem}{n_cat}"
    if n_ox == 0:
        return elem
    ox_part = "O" if n_ox == 1 else f"O{n_ox}"
    return f"{cat_part}{ox_part}"


def cation_amount(oxide: str) -> float:
    return oxide_info(oxide)[1]


def oxygen_amount(oxide: str) -> float:
    return oxide_info(oxide)[2]


def compound_weights(names: list[str]) -> list[float]:
    return [calculate_weight(n) for n in names]
