"""Time-series regularization: resample-to-grid + gap filling
(beyond-reference surface; the feature-engineering step every
event-stream training pipeline runs before windowed models).

:func:`gap_fill` turns an irregular event stream into a REGULAR
per-entity hourly series: bucket events to the hour (order-independent
decimal sums), build each entity's dense hour grid, and linearly
interpolate the empty hours from the nearest observed neighbors.

Scale posture: everything is per-entity — the bucket agg is one
shuffle on (entity, hour); the grid explode is scan-local from the
per-entity (min, max) pair; the fill is two window passes over the
entity's own rows (forward + backward ``last/first IGNORE NULLS``),
never a self-join. At 100 TB the cost is the one agg shuffle plus
windows over already-partitioned data; nothing is quadratic and no
state leaves the entity's partition. Interpolation arithmetic is a
single fixed expression over exact inputs (decimal hour sums, integer
hour ids), so the whole filled series sits under a cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from magmapandas_spark.relational.suite import SQL_DSUM, dsum


def gap_fill(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hourly resample + linear-interpolation gap fill per entity.

    Returns one row per (entity, hour) over each entity's observed
    [first, last] hour span: ``hour_id`` (epoch hours, BIGINT),
    ``value`` (observed hourly decimal-exact sum, or the linear
    interpolation between the surrounding observed hours), and
    ``filled`` (True where interpolated). NULL values are dropped
    BEFORE bucketing (the kmv/hll convention) — otherwise an hour
    whose events all carry NULL would enter the span as a NULL
    "observation": at a span edge the interpolation then has no
    neighbor and emits NULL rows, breaking the every-gap-has-both-
    neighbors contract. Span edges are observed by construction, so
    every gap interpolates."""
    hour = F.floor(
        F.unix_timestamp(F.col(ts_col)) / F.lit(3600)
    ).cast("long")
    hourly = (
        events.filter(F.col(value_col).isNotNull())
        .select(
            F.col(entity_col).alias("ent"), hour.alias("hour_id"),
            F.col(value_col),
        )
        .groupBy("ent", "hour_id")
        .agg(dsum(F.col(value_col)).alias("v"))
    )
    grid = (
        hourly.groupBy("ent")
        .agg(F.min("hour_id").alias("h0"), F.max("hour_id").alias("h1"))
        .select(
            "ent",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias(
                "hour_id"
            ),
        )
    )
    g = grid.join(hourly, on=["ent", "hour_id"], how="left")
    prev = (
        Window.partitionBy("ent")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = (
        Window.partitionBy("ent")
        .orderBy("hour_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour_id"))
    pv = F.last("v", ignorenulls=True).over(prev)
    ph = F.last(obs_hour, ignorenulls=True).over(prev)
    nv = F.first("v", ignorenulls=True).over(nxt)
    nh = F.first(obs_hour, ignorenulls=True).over(nxt)
    interp = pv + (nv - pv) * (
        (F.col("hour_id") - ph).cast("double")
        / (nh - ph).cast("double")
    )
    filled = F.col("v").isNull()
    # NO final ROUND: the inputs are tidy decimals, so interpolation
    # fractions like 1/2 land EXACTLY on 4-decimal half boundaries
    # where Spark's round (HALF_UP on the shortest decimal repr) and
    # DuckDB's (binary multiply + half-away) disagree by one ulp. The
    # unrounded doubles are bit-identical across engines because the
    # whole expression is a single fixed-order IEEE chain over exact
    # inputs (decimal sums, integer hour ids) — rounding would ADD
    # nondeterminism here, not remove it.
    return g.select(
        F.col("ent").alias(entity_col),
        "hour_id",
        F.when(filled, interp).otherwise(F.col("v")).alias("value"),
        filled.alias("filled"),
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: regularized hourly value series for users < 40 —
    every observed bucket sum AND every interpolated fill value sits
    under the hash (≈29k rows over the 30-day span)."""
    from magmapandas_spark.streaming.streams import read_events_batch

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = read_events_batch(spark, sf_dir).filter(
        F.col("user_id") < 40
    )
    return gap_fill(events).orderBy("user_id", "hour_id")


SQL_GAP_FILL = f"""
WITH hourly AS (
  SELECT user_id AS ent,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
         {SQL_DSUM.format(x='value')} AS v
  FROM events WHERE user_id < 40 AND value IS NOT NULL
  GROUP BY 1, 2
),
grid AS (
  SELECT ent, UNNEST(range(MIN(hour_id), MAX(hour_id) + 1)) AS hour_id
  FROM hourly GROUP BY ent
),
g AS (
  SELECT grid.ent, grid.hour_id, hourly.v
  FROM grid LEFT JOIN hourly
    ON grid.ent = hourly.ent AND grid.hour_id = hourly.hour_id
),
w AS (
  SELECT ent, hour_id, v,
         last_value(v IGNORE NULLS) OVER pw AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN hour_id END
                    IGNORE NULLS) OVER pw AS ph,
         first_value(v IGNORE NULLS) OVER nw AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN hour_id END
                     IGNORE NULLS) OVER nw AS nh
  FROM g
  WINDOW
    pw AS (PARTITION BY ent ORDER BY hour_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    nw AS (PARTITION BY ent ORDER BY hour_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT ent AS user_id, hour_id,
       CASE WHEN v IS NULL
            THEN pv + (nv - pv)
                 * (CAST(hour_id - ph AS DOUBLE)
                    / CAST(nh - ph AS DOUBLE))
            ELSE v END AS value,
       v IS NULL AS filled
FROM w
ORDER BY user_id, hour_id
"""
