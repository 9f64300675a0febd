"""DuckDB recursive-CTE oracles for the solver-tier queries.

The engine runs these models as Arrow-vectorized numpy kernels
(fixed-iteration bisection / per-row-frozen fixed points); because every
row's trajectory is a pure function of its own inputs, the identical
recurrence is expressible in ANSI SQL as a recursive CTE — giving the
correctness gate *exact* cross-engine oracles for:

- ``fe3fe2_solvers2``  — oneill2006 + armstrong2019 fixed points
  (80-step bisection on ``g(x) − x``, ``models/fe3fe2.py:444-523``);
- ``kd_toplis_iteration`` / ``kd_blundy_saper`` — forsterite fixed
  point with per-row convergence masks (``models/kd.py:208-245``);
- ``volatile_saturation_im`` — Iacono-Marziano mixed saturation
  (60-step bisection on the closed-form partial-pressure residual,
  ``models/volatiles.py:235-273``);
- ``isobar_grid`` — dissolved-H2O inner bisection + closed-form CO2
  (``models/volatiles.py:88-153``).

Bisection is self-correcting: a 1-ulp libm difference between numpy and
DuckDB can flip one sign test, but the bracket still contains a point
within noise of the true root, so after N halvings both engines agree to
~1e-15 relative — far inside the ROUND(…, 4-6) used by the gate.
"""

from __future__ import annotations

from magmapandas_spark.chem.elements import (
    calculate_weight,
    cation_amount,
    cation_name,
)

R = 8.31446261815324
W = calculate_weight

MELT_SPECIES = [
    "SiO2", "Al2O3", "TiO2", "MgO", "FeO", "CaO", "Na2O", "K2O",
    "MnO", "P2O5", "H2O", "CO2",
]

# T_K used by all solver-tier fe3fe2 queries
T_EXPR = "(1400.0 + (name % 200) / 2.0)"


def _mol_cols() -> str:
    """SELECT-list computing oxide mole fractions m_<species> from melt
    wt.% columns (term order matches ``mole_fraction_exprs``)."""
    terms = [f"({s} / {W(s)!r})" for s in MELT_SPECIES]
    total = " + ".join(terms)
    cols = [
        f"(({s} / {W(s)!r}) / ({total})) AS m_{s}" for s in MELT_SPECIES
    ]
    return ",\n    ".join(cols)


def _e_terms() -> dict[str, str]:
    """Cation-mole terms e_<cation> = m_species · n_cations (species with
    a unique cation each in MELT_SPECIES)."""
    out = {}
    for s in MELT_SPECIES:
        out[cation_name(s)] = f"(m_{s} * {float(cation_amount(s))!r})"
    return out


def _rest_expr() -> str:
    """Sum of cation moles over every species except FeO (species
    order)."""
    terms = [
        f"(m_{s} * {float(cation_amount(s))!r})"
        for s in MELT_SPECIES
        if s != "FeO"
    ]
    return "(" + " + ".join(terms) + ")"


def _bisect_cte(
    name: str,
    base: str,
    consts: list[str],
    h,               # callable: SQL-string x -> SQL string for h(x)
    lo: str,
    hi: str,
    iters: int,
) -> str:
    """Recursive-CTE mirror of ``eos.bisect_vectorized``
    (``models/eos.py:136-151``): keep the endpoint whose sign matches
    f(lo); after ``iters`` halvings the root is 0.5·(lo+hi)."""
    cols = ", ".join(consts)
    return f"""
{name} AS (
  SELECT name, {cols}, 0 AS it,
         CAST({lo} AS DOUBLE) AS lo, CAST({hi} AS DOUBLE) AS hi,
         ({h(lo)}) AS flo
  FROM {base}
  UNION ALL
  SELECT name, {cols}, it + 1,
         CASE WHEN SIGN(fmid) = SIGN(flo) THEN mid ELSE lo END AS lo,
         CASE WHEN SIGN(fmid) = SIGN(flo) THEN hi ELSE mid END AS hi,
         CASE WHEN SIGN(fmid) = SIGN(flo) THEN fmid ELSE flo END AS flo
  FROM (
    SELECT *, ({h('mid')}) AS fmid FROM (
      SELECT *, 0.5 * (lo + hi) AS mid FROM {name} WHERE it < {iters}
    )
  )
)"""


def _final(name: str, iters: int) -> str:
    return f"(SELECT * FROM {name} WHERE it = {iters})"


# ----------------------------------------------------------------------
# fe3fe2_solvers2: oneill2006 + armstrong2019
# ----------------------------------------------------------------------

def _split_cats(x: str) -> dict[str, str]:
    """Cation fractions after the FeO/Fe2O3 split at Fe3/Fe2 = x
    (``models/common.py:91-101`` + ``:81-88``); total cation moles
    collapse to rest + eFe + eFe3."""
    fe2f = f"(1.0 / (1.0 + {x}))"
    e_fe = f"(m_FeO * {fe2f})"
    e_fe3 = f"(m_FeO * (1.0 - {fe2f}))"
    tot = f"(rest + {e_fe} + {e_fe3})"
    e = _e_terms()
    cats = {c: f"({e[c]} / {tot})" for c in ("Mg", "Ca", "Na", "K", "Al", "P")}
    cats["Fe"] = f"({e_fe} / {tot})"
    cats["Fe3"] = f"({e_fe3} / {tot})"
    return cats


def _g_oneill(x: str) -> str:
    """O'Neill (2006) eq. 10 map g(x) (``models/fe3fe2.py:444-471``)."""
    c = _split_cats(x)
    part1 = (
        f"((-28144.0 + 3905.0 * {c['Mg']} - 13359.0 * {c['Ca']}"
        f" - 14858.0 * {c['Na']} - 9805.0 * {c['K']}"
        f" + 10906.0 * {c['Al']} + 110971.0 * {c['P']}"
        f" - 11952.0 * ({c['Fe']} - {c['Fe3']})) / t)"
    )
    return f"POW(10.0, ((lg_fo2 - {part1} - part2_on) / 4.0))"


def _g_armstrong(x: str) -> str:
    """Armstrong et al. (2019) eq. S12 map (``models/fe3fe2.py:503-523``)."""
    c = _split_cats(x)
    sum_marg = (
        f"(-2248.0 * {c['Mg']} + 7690.0 * {c['Ca']} + 8553.0 * {c['Na']}"
        f" + 5644.0 * {c['K']} + (-6278.0) * {c['Al']})"
    )
    act = (
        f"({sum_marg} / t + 6880.0 * (({c['Fe']} - {c['Fe3']}) / t))"
    )
    return f"EXP(lnfo2 / 4.0 - gib_dv / ({R!r} * t) + {act})"


def _armstrong_vdp_sql(phase: str) -> str:
    """Armstrong Vinet-like VdP with python-precomputed a/b/c constants
    (``models/fe3fe2.py:479-494``)."""
    K0, Kp = {"Fe2": (37.0, 8.0), "Fe3": (12.6, 1.3)}[phase]
    Kpp = -Kp / K0
    a = (1 + Kp) / (1 + Kp + K0 * Kpp)
    b = Kp / K0 - Kpp / (1 + Kp)
    c = (1 + Kp + K0 * Kpp) / (Kp**2 + Kp - K0 * Kpp)
    v0 = (
        "(13650.0 + 2.92 * (t - 1673.0))"
        if phase == "Fe2"
        else "(21070.0 + 4.54 * (t - 1673.0))"
    )
    p = "(P_bar / 1e4)"
    part1 = f"({a!r} * (1.0 - POW(1.0 + {b!r} * {p}, {1.0 - c!r})))"
    part2 = f"({b!r} * {c - 1.0!r} * {p})"
    return f"({p} * {v0} * (1.0 - {a!r} + {part1} / {part2}))"


def sql_fe3fe2_solvers2(melt_cte: str) -> str:
    mu = (
        "(-587474.0 + 1584.427 * t - 203.3164 * t * LN(t)"
        " + 0.092710 * t * t)"
    )
    fo2 = f"(EXP({mu} / ({R!r} * t)) * POW(10.0, 0.0))"
    part2_on = (
        "(13.95 + (33122.0 / t - 5.24)"
        " * (POW(1.0 + 0.241 * (P_bar / 1e4), 0.75) - 1.0)"
        " - (39156.0 / t - 6.17)"
        " * (POW(1.0 + 0.132 * (P_bar / 1e4), 0.75) - 1.0))"
    )
    gibbs0 = f"(-(16201.0 / t - 8.031) * ({R!r} * t))"
    dvdp = f"({_armstrong_vdp_sql('Fe3')} - {_armstrong_vdp_sql('Fe2')})"

    cat_cols = ["m_MgO", "m_CaO", "m_Na2O", "m_K2O", "m_Al2O3", "m_P2O5"]
    on_consts = ["uid", "t", "m_FeO", "rest", "lg_fo2", "part2_on"] + cat_cols
    ar_consts = ["uid", "t", "m_FeO", "rest", "lnfo2", "gib_dv"] + cat_cols
    h_on = lambda x: f"({_g_oneill(x)} - {x})"
    h_ar = lambda x: f"({_g_armstrong(x)} - {x})"

    return f"""
WITH RECURSIVE {melt_cte},
sub AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY name ORDER BY SiO2, Al2O3, TiO2, MgO, FeO, CaO, Na2O, K2O, H2O, CO2, P_bar) AS uid FROM melt WHERE name % 64 = 0),
mf AS (
  SELECT name, uid, P_bar, {T_EXPR} AS t,
    {_mol_cols()}
  FROM sub
),
cn AS (
  SELECT *,
    {_rest_expr()} AS rest,
    LOG10({fo2}) AS lg_fo2,
    LN({fo2}) AS lnfo2,
    {part2_on} AS part2_on,
    ({gibbs0} + {dvdp}) AS gib_dv
  FROM mf
),
{_bisect_cte('bo', 'cn', on_consts, h_on, '1e-8', '100.0', 80)},
{_bisect_cte('ba', 'cn', ar_consts, h_ar, '1e-8', '100.0', 80)}
SELECT bo.name AS name,
  ROUND(0.5 * (bo.lo + bo.hi), 6) AS fe3fe2_oneill06,
  ROUND(0.5 * (ba.lo + ba.hi), 6) AS fe3fe2_armstrong
FROM {_final('bo', 80)} bo
JOIN {_final('ba', 80)} ba USING (name, uid)
ORDER BY name
"""


# ----------------------------------------------------------------------
# Kd fixed points: toplis2005, blundy2020, saper2022
# ----------------------------------------------------------------------

def _fixed_point_cte(name: str, base: str, consts: list[str], kd_of) -> str:
    """Recursive-CTE mirror of the per-row-frozen
    ``iterate_kd_np`` (``models/kd.py:208-245``): fo₀ = 0.85,
    foₖ₊₁ = 1/(1+kd(foₖ)·fe2mg), stop at |Δfo|/fo ≤ 1e-3 or 100 steps;
    the kd of the last update is the answer."""
    cols = ", ".join(consts)
    return f"""
{name} AS (
  SELECT name, {cols}, 0 AS it, CAST(0.85 AS DOUBLE) AS fo,
         kd, 1.0 / (1.0 + kd * fe2mg) AS fo_eq
  FROM (SELECT *, ({kd_of('0.85')}) AS kd FROM {base})
  UNION ALL
  SELECT name, {cols}, it + 1, fo_eq AS fo, kd_new AS kd,
         1.0 / (1.0 + kd_new * fe2mg) AS fo_eq
  FROM (
    SELECT *, ({kd_of('fo_eq')}) AS kd_new
    FROM {name}
    WHERE it < 100 AND ABS(fo - fo_eq) / fo > 0.001
  )
)"""


def _fp_final(name: str) -> str:
    """Last emitted iteration per row = converged state."""
    return (
        f"(SELECT * FROM (SELECT *, ROW_NUMBER() OVER"
        f" (PARTITION BY name, uid ORDER BY it DESC) AS rn FROM {name})"
        f" WHERE rn = 1)"
    )


def _kd_toplis(x: str) -> str:
    """toplis2005 (``models/kd.py:155-182``); sio2_a and T are per-row
    constants, fo enters through the olivine term."""
    return (
        f"EXP((-6766.0 / ({R!r} * t) - 7.34 / {R!r})"
        f" + LN(0.036 * sio2a - 0.22)"
        f" + (3000.0 * (1.0 - 2.0 * {x}) / ({R!r} * t))"
        f" + (0.035 * (P_bar - 1.0) / ({R!r} * t)))"
    )


def _sio2a_expr() -> str:
    """Adjusted molar SiO2 (``models/kd.py:155-171``) from mole-fraction
    columns (×100 to mol %)."""
    si = "(m_SiO2 * 100.0)"
    na = "(m_Na2O * 100.0)"
    k = "(m_K2O * 100.0)"
    phi_low = (
        f"((0.46 * (100.0 / (100.0 - {si})) - 0.93) * ({na} + {k})"
        f" + (-5.33 * (100.0 / (100.0 - {si})) + 9.69))"
    )
    phi_high = (
        f"((11.0 - 5.5 * (100.0 / (100.0 - {si})))"
        f" * EXP(-0.31 * ({na} + {k})))"
    )
    phi = f"(CASE WHEN {si} > 60.0 THEN {phi_high} ELSE {phi_low} END)"
    return f"(({si} + {phi} * ({na} + {k})) + 0.8 * m_H2O * 100.0)"


def sql_kd_toplis(melt_cte: str) -> str:
    fe2mg = "((m_FeO * (1.0 / (1.0 + 0.2))) / m_MgO)"
    consts = ["uid", "t", "P_bar", "sio2a", "fe2mg"]
    return f"""
WITH RECURSIVE {melt_cte},
sub AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY name ORDER BY SiO2, Al2O3, TiO2, MgO, FeO, CaO, Na2O, K2O, H2O, CO2, P_bar) AS uid FROM melt WHERE name % 64 = 0),
mf AS (
  SELECT name, uid, P_bar, CAST(1500.0 AS DOUBLE) AS t,
    {_mol_cols()}
  FROM sub
),
cn AS (
  SELECT name, uid, P_bar, t, {_sio2a_expr()} AS sio2a, {fe2mg} AS fe2mg
  FROM mf
),
{_fixed_point_cte('kt', 'cn', consts, _kd_toplis)}
SELECT name, ROUND(kd, 6) AS Kd
FROM {_fp_final('kt')}
ORDER BY name
"""


def _borisov_expr() -> str:
    """borisov2018 from mole-fraction columns + 1-bar QFM at dfO2=+1
    (``models/fe3fe2.py:64-85``); constant per row at T = 1500 K."""
    t15 = "CAST(1500.0 AS DOUBLE)"
    mu_1500 = (
        f"(-587474.0 + 1584.427 * {t15}"
        f" - 203.3164 * {t15} * LN({t15})"
        f" + 0.092710 * {t15} * {t15})"
    )
    fo2 = f"(EXP({mu_1500} / ({R!r} * {t15})) * POW(10.0, 1.0))"
    return (
        f"POW(10.0, 0.207 * LOG10({fo2}) + 4633.3 / {t15}"
        f" - 0.445 * m_SiO2 - 0.900 * m_TiO2 + 1.532 * m_MgO"
        f" + 0.314 * m_CaO + 2.030 * m_Na2O + 3.355 * m_K2O"
        f" - 4.851 * m_P2O5"
        f" - 3.081 * m_SiO2 * m_Al2O3 - 4.370 * m_SiO2 * m_MgO - 1.852)"
    )


def _kd_blundy(x: str) -> str:
    """blundy2020 (``models/kd.py:185-191``); f3t = borisov/(1+borisov)."""
    return (
        f"((0.3642 * (1.0 - f3t)"
        f" * EXP((312.7 * (1.0 - 2.0 * {x})) / t)) / (1.0 - f3t))"
    )


def _kd_saper(x: str) -> str:
    """saper2022 (``models/kd.py:194-205``); gibbs+melt terms constant."""
    return f"EXP(gm + 3040.0 * (1.0 - 2.0 * {x}) / ({R!r} * t))"


def sql_kd_blundy_saper(melt_cte: str) -> str:
    e = _e_terms()
    cat_tot = "(" + " + ".join(
        f"(m_{s} * {float(cation_amount(s))!r})" for s in MELT_SPECIES
    ) + ")"
    cats = {c: f"({e[c]} / {cat_tot})" for c in ("Si", "Ti", "Na", "K")}
    gibbs = f"((-6766.0 - 7.34 * t) / ({R!r} * t))"
    melt_term = (
        f"(1.0445 * {cats['Si']} - 1.3125 * {cats['Ti']}"
        f" - 3.0550 * {cats['Si']} * ({cats['Na']} + {cats['K']}))"
    )
    f3t = "(bor / (1.0 + bor))"
    fe2mg_b = "((m_FeO * (1.0 / (1.0 + bor))) / m_MgO)"
    fe2mg_s = "((m_FeO * (1.0 / (1.0 + 0.2))) / m_MgO)"
    return f"""
WITH RECURSIVE {melt_cte},
sub AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY name ORDER BY SiO2, Al2O3, TiO2, MgO, FeO, CaO, Na2O, K2O, H2O, CO2, P_bar) AS uid FROM melt WHERE name % 64 = 0),
mf AS (
  SELECT name, uid, P_bar, CAST(1500.0 AS DOUBLE) AS t,
    {_mol_cols()}
  FROM sub
),
cb AS (
  SELECT name, uid, P_bar, t, {f3t} AS f3t, {fe2mg_b} AS fe2mg
  FROM (SELECT *, {_borisov_expr()} AS bor FROM mf)
),
cs AS (
  SELECT name, uid, P_bar, t, ({gibbs} + {melt_term}) AS gm,
         {fe2mg_s} AS fe2mg
  FROM mf
),
{_fixed_point_cte('kb', 'cb', ['uid', 't', 'f3t', 'fe2mg'], _kd_blundy)},
{_fixed_point_cte('ks', 'cs', ['uid', 't', 'gm', 'fe2mg'], _kd_saper)}
SELECT kb.name AS name,
  ROUND(kb.kd, 6) AS kd_blundy,
  ROUND(ks.kd, 6) AS kd_saper
FROM {_fp_final('kb')} kb
JOIN {_fp_final('ks')} ks USING (name, uid)
ORDER BY name
"""


# ----------------------------------------------------------------------
# Iacono-Marziano mixed saturation
# ----------------------------------------------------------------------

# hydrous_webapp + hydrous-CO2 coefficient sets
# (``models/volatiles.py:43-54``)
IM_H2O = dict(a=0.52096846, b=2.11575907, B=-3.24443335, C=-0.02238884)
IM_CO2 = dict(d_H2O=-16.4, d_AI=4.4, d_FM=-17.1, d_NK=22.8, a=1.0,
              b=17.3, B=-6.0, C=0.12)


def _im_consts(h2o_expr: str) -> dict[str, str]:
    """Per-row constants of the saturation residual at observed
    volatiles: mole fractions at dissolved-H2O = ``h2o_expr``
    (``models/volatiles.py:60-85, 156-190``).

    Mole terms m*_s = wt_s/W_s are NOT renormalised — every use below is
    scale-invariant (NBO/O, x_AI are ratios) or explicitly divided by
    the total."""
    m = {s: f"({s} / {W(s)!r})" for s in MELT_SPECIES if s != "H2O"}
    m["H2O"] = f"({h2o_expr} / {W('H2O')!r})"
    tot = "(" + " + ".join(m[s] for s in MELT_SPECIES) + ")"
    nbo = (
        f"(2.0 * ({m['K2O']} + {m['Na2O']} + {m['CaO']} + {m['MgO']}"
        f" + {m['FeO']} - {m['Al2O3']}) + 2.0 * {m['H2O']})"
    )
    o = (
        f"(2.0 * {m['SiO2']} + 2.0 * {m['TiO2']} + 3.0 * {m['Al2O3']}"
        f" + {m['MgO']} + {m['FeO']} + {m['CaO']} + {m['Na2O']}"
        f" + {m['K2O']} + {m['H2O']})"
    )
    return dict(
        nbo_o=f"({nbo} / {o})",
        x_ai=f"({m['Al2O3']} / ({m['CaO']} + {m['K2O']} + {m['Na2O']}))",
        x_fm=f"(({m['FeO']} + {m['MgO']}) / {tot})",
        x_nk=f"(({m['Na2O']} + {m['K2O']}) / {tot})",
        h2o_mol=f"({m['H2O']} / {tot})",
    )


def sql_volatile_saturation_im(melt_cte: str) -> str:
    """Mixed IM saturation over the full melt table
    (``models/volatiles.py:235-273``): rows with observed H2O>0 solve
    exp(ln P_H2O(P)) + exp(ln P_CO2(P)) = P; H2O=0 rows take the
    pure-CO2 pressure with zero-H2O melt chemistry and Xfl=0. CO2 is
    always >0 in the synthetic melt so the pure-H2O branch never fires.

    ln P_H2O(P) = (a1 − C_h·P/T)/a_h with a1 = ln w − b·NBO/O − B —
    only the C·P/T term depends on P, so the residual is a closed-form
    two-exponential function of P."""
    h = IM_H2O
    c = IM_CO2
    w = _im_consts("H2O")       # at observed (safe) H2O
    z = _im_consts("0.0")       # at dissolved H2O = 0 (pure-CO2 branch)
    a1 = (
        f"(LN(H2O) - {h['b']!r} * {w['nbo_o']} - {h['B']!r})"
    )
    a2w = (
        f"(LN(CO2 * 1e4) - {w['h2o_mol']} * {c['d_H2O']!r}"
        f" - {w['x_ai']} * {c['d_AI']!r} - {w['x_fm']} * {c['d_FM']!r}"
        f" - {w['x_nk']} * {c['d_NK']!r} - {c['b']!r} * {w['nbo_o']}"
        f" - {c['B']!r})"
    )
    a2z = (
        f"(LN(CO2 * 1e4) - {z['h2o_mol']} * {c['d_H2O']!r}"
        f" - {z['x_ai']} * {c['d_AI']!r} - {z['x_fm']} * {c['d_FM']!r}"
        f" - {z['x_nk']} * {c['d_NK']!r} - {c['b']!r} * {z['nbo_o']}"
        f" - {c['B']!r})"
    )
    ln_ph2o = lambda x: f"((a1 - {h['C']!r} * {x} / t) / {h['a']!r})"
    ln_pco2 = lambda x: f"((a2 - {c['C']!r} * {x} / t) / {c['a']!r})"
    res = lambda x: (
        f"((CASE WHEN has_h2o THEN EXP({ln_ph2o(x)}) ELSE 0.0 END)"
        f" + EXP({ln_pco2(x)}) - {x})"
    )
    consts = ["has_h2o", "t", "a1", "a2"]
    return f"""
WITH RECURSIVE {melt_cte},
cn AS (
  SELECT name, has_h2o, t,
    {a1} AS a1,
    CASE WHEN has_h2o THEN {a2w} ELSE {a2z} END AS a2
  FROM (SELECT name, H2O > 0.0 AS has_h2o,
               CASE WHEN H2O > 0.0 THEN H2O ELSE 1.0 END AS H2O,
               CO2, SiO2, Al2O3, TiO2, MgO, FeO, CaO, Na2O, K2O, MnO,
               P2O5, CAST(1473.15 AS DOUBLE) AS t
        FROM melt)
),
{_bisect_cte('vb', 'cn', consts, res,
             "CASE WHEN has_h2o THEN 1e-2 ELSE 1e-10 END", '1e5', 60)}
SELECT name,
  ROUND(0.5 * (lo + hi), 4) AS P_bar_sat,
  ROUND(CASE WHEN has_h2o THEN
          LEAST(1.0, GREATEST(0.0,
            EXP((a1 - {h['C']!r} * (0.5 * (lo + hi)) / t) / {h['a']!r})
            / (0.5 * (lo + hi))))
        ELSE 0.0 END, 6) AS Xfl
FROM {_final('vb', 60)}
ORDER BY name
"""

# ----------------------------------------------------------------------
# isobar/isopleth solubility grid (first sample)
# ----------------------------------------------------------------------

def sql_isobar_grid(melt_cte: str) -> str:
    """IM solubility grid for the first sample
    (``models/volatiles.py:568-658``): hydrous dissolved-H2O inner
    bisection (60 steps in v ∈ [0, 60] wt.%) per grid point, then the
    closed-form CO2 equation at the solved H2O. The grid literals are
    generated with the same numpy arithmetic as ``co2_h2o_isobars``."""
    import numpy as np

    h = IM_H2O
    c = IM_CO2
    isobars = list(np.arange(1e3, 7e3, 1e3))
    isopleths = [round(v, 6) for v in np.arange(0.0, 1.1, 0.1)]
    n_points = 8
    xfl = [round(v, 6) for v in np.arange(0.0, 1.0 + 1.0 / n_points,
                                          1.0 / n_points)]
    p_steps = [round(max(isobars) * i / n_points, 6)
               for i in range(n_points + 1)]
    import itertools
    rows = [
        (float(P), float(x), "isobar")
        for P, x in itertools.product(isobars, xfl)
    ] + [
        (float(P), float(x), "isopleth")
        for x, P in itertools.product(isopleths, p_steps)
    ]
    values = ",\n    ".join(
        f"(CAST({p!r} AS DOUBLE), CAST({x!r} AS DOUBLE), '{k}')"
        for p, x, k in rows
    )

    wh2o = W("H2O")
    m = {s: f"({s} / {W(s)!r})" for s in MELT_SPECIES if s != "H2O"}
    s_sum = "(" + " + ".join(m[s] for s in MELT_SPECIES if s != "H2O") + ")"
    n0 = (
        f"(2.0 * ({m['K2O']} + {m['Na2O']} + {m['CaO']} + {m['MgO']}"
        f" + {m['FeO']} - {m['Al2O3']}))"
    )
    d0 = (
        f"(2.0 * {m['SiO2']} + 2.0 * {m['TiO2']} + 3.0 * {m['Al2O3']}"
        f" + {m['MgO']} + {m['FeO']} + {m['CaO']} + {m['Na2O']}"
        f" + {m['K2O']})"
    )
    x_ai = f"({m['Al2O3']} / ({m['CaO']} + {m['K2O']} + {m['Na2O']}))"
    mfemg = f"({m['FeO']} + {m['MgO']})"
    mnak = f"({m['Na2O']} + {m['K2O']})"

    # residual of the hydrous H2O solubility solve: v − exp(a·ln P_H2O
    # + b·NBO/O(v) + B + C·P/T)   (``models/volatiles.py:106-121``)
    def res(x):
        hm = f"({x} / {wh2o!r})"
        nbo = f"((n0 + 2.0 * {hm}) / (d0 + {hm}))"
        return (
            f"({x} - EXP({h['a']!r} * LN(ph2o_safe) + {h['b']!r} * {nbo}"
            f" + ({h['B']!r}) + ({h['C']!r}) * gp / t))"
        )

    consts = ["gp", "gx", "kind", "t", "n0", "d0", "ph2o_safe",
              "valid_h", "valid_c", "pco2_safe", "x_ai", "s_sum",
              "mfemg", "mnak"]
    hm = f"(h2o_sol / {wh2o!r})"
    nbo_c = f"((n0 + 2.0 * {hm}) / (d0 + {hm}))"
    co3 = (
        f"EXP(({hm} / (s_sum + {hm})) * ({c['d_H2O']!r})"
        f" + x_ai * {c['d_AI']!r}"
        f" + (mfemg / (s_sum + {hm})) * ({c['d_FM']!r})"
        f" + (mnak / (s_sum + {hm})) * {c['d_NK']!r}"
        f" + {c['a']!r} * LN(pco2_safe) + {c['b']!r} * {nbo_c}"
        f" + ({c['B']!r}) + {c['C']!r} * gp / t)"
    )
    return f"""
WITH RECURSIVE {melt_cte},
samp AS (SELECT * FROM melt ORDER BY name LIMIT 1),
grid AS (
  SELECT * FROM (VALUES
    {values}
  ) g(gp, gx, kind)
),
gb AS (
  SELECT samp.name AS name, gp, gx, kind,
    CAST(1473.15 AS DOUBLE) AS t,
    {n0} AS n0, {d0} AS d0,
    (gp > 0.0 AND gx > 0.0) AS valid_h,
    CASE WHEN gp > 0.0 AND gx > 0.0 THEN gx * gp ELSE 1.0 END
      AS ph2o_safe,
    (gp > 0.0 AND (1.0 - gx) > 0.0) AS valid_c,
    CASE WHEN gp > 0.0 AND (1.0 - gx) > 0.0 THEN (1.0 - gx) * gp
         ELSE 1.0 END AS pco2_safe,
    {x_ai} AS x_ai, {s_sum} AS s_sum, {mfemg} AS mfemg, {mnak} AS mnak
  FROM grid CROSS JOIN samp
),
{_bisect_cte('hb', 'gb', consts, res, '0.0', '60.0', 60)},
fin AS (
  SELECT *, CASE WHEN valid_h THEN 0.5 * (lo + hi) ELSE 0.0 END
           AS h2o_sol
  FROM {_final('hb', 60)}
)
SELECT (SELECT name FROM samp) AS name,
  gp AS P_bar, gx AS x_fluid, kind,
  ROUND(h2o_sol, 6) AS H2O_sol,
  ROUND(CASE WHEN valid_c THEN {co3} / 1e4 ELSE 0.0 END, 6) AS CO2_sol
FROM fin
ORDER BY kind, P_bar, x_fluid
"""
