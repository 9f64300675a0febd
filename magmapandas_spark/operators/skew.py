"""Skew-handling operators (beyond-reference surface; SURVEY §4.2).

AQE's skew-join splitting covers sort-merge joins at runtime, but two
hot-key shapes still need explicit salting at 100 TB:

- **joins** where one side's hot key exceeds a single task even after
  AQE splitting of the other side (`salted_join`);
- **non-algebraic aggregations** (exact COUNT(DISTINCT ...) and
  friends) where partial aggregation cannot pre-reduce a hot group, so
  every row of the hot key lands on one reduce task
  (`salted_count_distinct`).

Both are pure DataFrame compositions — results are byte-identical to
the unsalted equivalent, only the shuffle fan-out changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salt: int = 8,
) -> DataFrame:
    """Equi-join with the hot-key shuffle split ``n_salt`` ways.

    The (large, skewed) ``left`` gets a uniform salt derived from a
    whole-row hash; the (smaller) ``right`` is replicated once per salt
    value, so each (key, salt) shard joins independently: a key that
    used to occupy one reduce task now occupies ``n_salt``. Join output
    equals the plain join exactly — the salt never leaves the plan.

    Cost model: right side grows ×``n_salt`` (keep it the dimension
    side); left adds one narrow hash column. Prefer ``broadcast(right)``
    when it fits — salting is for the region where neither broadcast
    nor AQE splitting applies (e.g. ``how='left'`` with a hot key on
    the preserved side)."""
    # Normalize Spark's join-type aliases ("left_outer", "LeftOuter",
    # "outer", ...) before the safety check — an allowlist, so any
    # alias we haven't reasoned about is rejected rather than silently
    # producing n_salt-duplicated unmatched right rows.
    norm = how.lower().replace("_", "")
    supported = {
        "inner": "inner",
        "left": "left",
        "leftouter": "left",
        "cross": "inner",
        "semi": "semi",
        "leftsemi": "semi",
        "anti": "anti",
        "leftanti": "anti",
    }
    if norm not in supported:
        raise ValueError(
            "salted_join replicates the right side; join type "
            f"{how!r} would duplicate unmatched right rows (or is "
            "unknown). Supported: inner/left/semi/anti — swap the "
            "sides for right/full outer."
        )
    how = supported[norm]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt)
    ).alias("__salt")
    lsalt = left.select("*", salt)
    rrep = right.select(
        "*",
        F.explode(
            F.array(*[F.lit(i).cast("bigint") for i in range(n_salt)])
        ).alias("__salt"),
    )
    return lsalt.join(rrep, on=on + ["__salt"], how=how).drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    n_salt: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-safe.

    COUNT(DISTINCT) is not algebraic: partial aggregation cannot
    pre-reduce a hot group, so the plain form ships every (key, value)
    pair of a hot key to one task. Salting by the *value hash*
    partitions each key's value set into ``n_salt`` disjoint buckets —
    per-bucket distinct counts are then summed exactly (a value can
    appear in only one bucket). Two balanced shuffles replace one
    skewed one; the result is exact, not a sketch (use
    ``approx_count_distinct`` when ±2% is acceptable)."""
    vcol = F.col(value) if isinstance(value, str) else value
    bucket = F.pmod(F.xxhash64(vcol), F.lit(n_salt)).alias("__vbucket")
    per_bucket = (
        df.select(*keys, vcol.alias("__v"), bucket)
        .groupBy(*keys, "__vbucket")
        .agg(F.count_distinct(F.col("__v")).alias("__nd"))
    )
    return per_bucket.groupBy(*keys).agg(F.sum("__nd").alias(out_col))
