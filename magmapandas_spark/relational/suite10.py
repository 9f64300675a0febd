"""Correctness-suite part 10 (round 7, fifth wave): statistical
auditing.

- ``benford_audit`` — first-significant-digit distribution of order
  totals vs Benford's law with an integer chi-square score. The digit
  comes from pure integer/string arithmetic (a log10 significand
  differs cross-engine by an ulp at decade boundaries) and the
  expected shares are precomputed ppm literals, so no engine
  evaluates a logarithm.
- ``bootstrap_ci`` — deterministic Poisson-bootstrap 95% CI for
  per-group means: Binomial(8, 1/8) weights from eight 3-bit md5
  fields (mean 1, the streaming-friendly resample that never
  materializes a dataset), decimal-exact replicate means, the
  (2nd, 39th) order statistics of 40 replicates as the interval —
  the whole CI under the cross-engine hash.
"""

from __future__ import annotations


def queries():
    from magmapandas_spark.operators.stats import q_bootstrap_ci
    from magmapandas_spark.operators.validation import q_benford_audit

    return {
        "benford_audit": q_benford_audit,
        "bootstrap_ci": q_bootstrap_ci,
    }


def oracle_sql():
    from magmapandas_spark.operators.stats import SQL_BOOTSTRAP_CI
    from magmapandas_spark.operators.validation import SQL_BENFORD_AUDIT

    return {
        "benford_audit": SQL_BENFORD_AUDIT,
        "bootstrap_ci": SQL_BOOTSTRAP_CI,
    }
