"""Correctness-suite part 11 (round 8): scale-path twins,
entity-resolution recall closure, warehouse allocation analytics, and
the first H.264 codec notch.

- ``rfm_segments_sketch`` — RFM segmentation with quintile edges from
  the 1000-bin histogram sketch (operators/quantiles.py formula) and
  scan-local binning: the no-global-sort scale twin of the exact
  ``rfm_segments`` (the established exact↔mergeable pairing).
- ``er_golden_multipass`` — multi-pass sorted-neighborhood entity
  resolution over the distinct name dictionary: a second SNM pass on
  an independent sort key (reversed name) unioned with the first,
  closing the single-pass cross-block recall loss; recall vs
  brute-force truth pairs is measured UNDER the gate hash.
- ``two_hop_reach`` — distinct ≤2-hop neighborhood counts over the
  synthetic link graph (one middle-node-keyed self-join, TakeOrdered
  top-k).
- ``budget_allocation`` — Hamilton largest-remainder apportionment of
  an integer budget across nations (Σ alloc exact by construction).
- ``abc_classification`` — Pareto ABC revenue classes over the part
  catalog at 70/90% cumulative share, BIGINT micros/ppm.
- ``rake_keywords`` — RAKE degree/frequency keyword scoring over the
  documents corpus, integer ppm, vocabulary-sized aggregation.
- ``h264_ipcm_decode`` — real Annex-B H.264 baseline I-frame decode
  (NAL framing, emulation-prevention, Exp-Golomb SPS/PPS/slice parse,
  I_PCM macroblock reconstruction); the oracle replays the fixture's
  closed-form plane sums and MB-order checksum.
- ``h264_intra_decode`` — notch 2: mixed I_PCM / intra-predicted
  I_16x16 macroblocks (Vertical luma+chroma prediction from
  reconstructed neighbor edges, CAVLC zero coeff_token in the real
  nC context); registry entry past the 50-slot gate this round
  (covered by the identical pytest oracle sweep), rotates into the
  driver gate next round.
- ``h264_cavlc_decode`` — notch 3: predicted MBs carry entropy-coded
  chroma-DC residuals — real CAVLC (coeff_token incl. the nC = -1
  chroma table, trailing-one signs, level_prefix decode with the
  first-coefficient rule, total_zeros, run_before), 2x2 inverse
  Hadamard, Table-8-15 chroma-QP scaling, clipped reconstruction.
- ``h264_lumadc_decode`` — notch 4: predicted MBs carry DENSE
  entropy-coded luma-DC blocks (all 16 Intra16x16DCLevel
  coefficients nonzero) — the 6-bit FLC coeff_token class, the full
  level_prefix/suffix state machine with both suffix-length growth
  steps and the TC>10 initial-suffixLength rule, 4x4 inverse
  Hadamard, spec-8.5.10 luma-DC scaling, per-4x4-block clipped
  reconstruction. Past the 50-slot gate this round.
- ``h264_plane_decode`` — notch 5: the COMPLETE Intra_16x16
  prediction-mode matrix — V/H/DC/Plane luma (spec 8.3.3.4
  integer-gradient Plane over top+left+corner edges) × DC/H/V/Plane
  chroma (per-4x4 DC corner rule, 17-coefficient chroma Plane) on a
  checkerboard fixture whose predicted MBs always have PCM
  neighbors. Past the 50-slot gate this round.
- ``h264_gop_decode`` — notch 6: multi-picture, multi-slice streams
  (1-3 IDR frames per payload; 3-row pictures split into two raster
  slice NALs) — first_mb_in_slice addressing, more_rbsp_data()
  end-of-slice detection, idr_pic_id alternation, slice-gated
  intra/nC availability; one exact stats row per frame. Past the
  50-slot gate this round.
- ``h264_mp4_decode`` — notch 6b: the codec ladder meets the
  container tier — AVC-in-MP4 end to end ('avc1' sample entry, avcC
  parameter-set record, AVCC length-prefixed access units from the
  stsz/stco walk, Annex-B conversion, per-sample I-frame decode).
  Past the 50-slot gate this round.
- ``h264_full_decode`` — notch 7: the composition corpus — every
  ladder feature at once (GOP × multi-slice × full prediction-mode
  matrix × dense luma-DC × chroma-DC residuals, QP 40); proves the
  decoder's features compose, not just pass in isolation. Past the
  50-slot gate this round.
- ``h264_multiqp_decode`` — notch 8: multi-parameter-set streams
  (two PPS at QP 40/28 selected per slice via pic_parameter_set_id);
  the same residual levels reconstruct through BOTH spec-8.5.10
  dequantization branches and both Table-8-15 regimes;
  ``h264_qptrack_decode`` — notch 9: intra-slice QP tracking (every
  predicted MB carries a nonzero mb_qp_delta, QP_Y accumulates per
  spec 7.4.5 and the dequant branch flips MB-to-MB). Past the
  50-slot gate this round.
- ``video_fingerprint`` — per-frame luma-histogram fingerprints
  (md5-prefix BIGINT) over the GOP corpus + two byte-duplicate clips,
  with per-fingerprint collision counts: the video-dedup primitive,
  collision path non-vacuous; ``audio_fingerprint`` — the audio leg
  (amplitude-histogram fingerprints over the WAV corpus + duplicate
  clips); ``ngram_novelty`` — per-document share of corpus-unique
  character 3-grams (the cross-document complement of the repetition
  scores); ``seasonal_outliers`` — per-(dow, hour)-cell |z| > 2
  anomaly rates from DECIMAL-exact cell moments (the monitoring pass
  on top of the seasonal profile); ``l_diversity`` — k-anonymity's
  companion audit: class census by (size, distinct sensitive values),
  homogeneous classes flagged as leaks; ``t_closeness`` — the third
  privacy audit: per-class ordinal EMD vs the global sensitive
  distribution in exact integer numerators (priorities pivoted to
  columns, no window); ``mutual_info`` — nation×segment MI from
  exact contingency counts (rounded-term decimal total, the ln
  precedent); ``fd_check`` — functional-dependency audit with
  holding AND failing candidates under the hash;
  ``degree_assortativity`` — Pearson degree correlation over edges
  from DECIMAL-exact power sums (the graph mixing-pattern summary);
  ``length_lognormal`` — per-language (μ, σ) of ln(n_chars) from
  decimal sums of 9-decimal-rounded terms (corpus length-distribution
  profiling); ``image_fingerprint`` — the image leg of the multimodal
  dedup quad (pixel-histogram fingerprints through the real PNG
  inflate/unfilter decode + duplicate images); ``null_semantics`` —
  NULL-semantics parity probe (NULL group keys, COUNT/DISTINCT/SUM
  under NULLs, null-safe equality: Spark <=> vs DuckDB IS NOT
  DISTINCT FROM); ``date_semantics`` — native calendar-function
  parity (month truncation, last_day clamping, quarter, integer
  month arithmetic). Past the 50-slot gate this round.
- ``balanced_sample`` — class-balanced deterministic downsampling of
  the documents corpus to the smallest language class (ppm acceptance
  rates, md5-uniform survival); two |classes|-row aggregations, one
  scan-local filter. Past the 50-slot gate this round.
- ``dedup_impact`` — exact-duplicate cluster SIZE DISTRIBUTION with
  keep-one token savings; the dedup_exact two-phase shape. Past the
  50-slot gate this round.
- ``knn_label_noise`` — k-NN label-agreement audit over a constant
  broadcast query slice (5-NN majority vote vs own label). Past the
  50-slot gate this round.
- ``corr_matrix`` — pairwise Pearson matrix over lineitem measures
  from one scan of DECIMAL-exact power sums (the gram_aggregate
  posture); ``seasonal_profile`` — dow×hour seasonal index over
  events with engine-portable epoch-day dow; ``gini_concentration``
  — per-nation Gini of customer revenue via per-group rank windows;
  ``gini_sketch`` — its mergeable twin: 1000-bin Lorenz histogram
  trapezoid Gini in exact BIGINT cents, hashed beside the exact Gini
  so the estimator error sits under the gate hash; ``text_hapax`` —
  per-language vocabulary profile (tokens, types, hapax, TTR ppm),
  the token_pmi two-phase shape; ``psi_drift`` — population
  stability index between corpus snapshots (10 equi-width bins,
  Laplace-smoothed shares, 9-decimal-rounded decimal-summed terms),
  the distribution-shift monitor for corpus rebuilds;
  ``personalized_pagerank`` — seed-teleport PPR (proximity-to-seeds
  ranks, the recommendation primitive), same integer recurrence and
  iteration-replayed oracle as pagerank; ``rolling_range_frame`` —
  VALUE-based window frames (RANGE BETWEEN ±30 days) over a constant
  customer slice, the last uncovered frame class;
  ``grouping_sets_revenue`` — explicit GROUPING SETS with GROUPING()
  bitmask disambiguation (one Expand + hash aggregate);
  ``unpivot_profile`` — UNPIVOT/melt of the measure columns with a
  per-measure exact profile (Expand-based, scan-local).
  All past the 50-slot gate this round.
"""

from __future__ import annotations


def q_rolling_range_frame(spark, sf_dir):
    """Gate query: VALUE-based window frames (RANGE BETWEEN k
    PRECEDING AND k FOLLOWING) — the one frame class the suite had
    not yet exercised. Per order of a constant customer slice
    (o_custkey < 300): the customer's ±30-day revenue neighborhood
    (DECIMAL-exact sum + count over an integer epoch-day RANGE
    frame). Range frames are set-valued per row, so ties in the
    ordering column contribute identically in both engines.

    Scale posture: per-customer partitions, frame bounded by the
    customer's ±30-day order density; the slice cap keeps the gate
    output constant."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_custkey") < 300
    )
    days = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
    )
    src = orders.select(
        "o_custkey",
        "o_orderkey",
        days.alias("day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, 30)
    )
    return (
        src.select(
            "o_custkey",
            "o_orderkey",
            "day",
            F.round(F.sum("p").over(w).cast("double"), 2).alias(
                "window_total"
            ),
            F.count(F.lit(1)).over(w).alias("n_in_window"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


SQL_ROLLING_RANGE_FRAME = """
WITH src AS (
  SELECT o_custkey, o_orderkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_custkey < 300
)
SELECT o_custkey, o_orderkey, day,
       ROUND(CAST(SUM(p) OVER w AS DOUBLE), 2) AS window_total,
       COUNT(*) OVER w AS n_in_window
FROM src
WINDOW w AS (PARTITION BY o_custkey ORDER BY day
             RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


def q_grouping_sets_revenue(spark, sf_dir):
    """Gate query: explicit GROUPING SETS with GROUPING()
    disambiguation — the generalization of the covered ROLLUP/CUBE
    operators: four deliberate aggregation grains ((flag, status),
    (flag), (status), ()) in one pass, grain identified by the
    grouping bitmask instead of NULL-ambiguity. Declared in SQL on
    both sides; Catalyst expands to a single Expand + hash aggregate
    (one scan, map-side combined)."""
    return spark.sql(f"""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM parquet.`{sf_dir}/lineitem.parquet`
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), (l_linestatus), ())
ORDER BY gid, flag, status
""")


SQL_GROUPING_SETS_REVENUE = """
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), (l_linestatus), ())
ORDER BY gid, flag, status
"""


def q_unpivot_profile(spark, sf_dir):
    """Gate query: UNPIVOT (relational melt — the pandas stack/melt
    the reference's dataframe surface implies) of lineitem's four
    measure columns to (measure, value) rows, then a per-measure
    profile: n, DECIMAL-exact sum, extrema. Spark's Expand-based
    unpivot and DuckDB's UNPIVOT must agree exactly.

    Plan: one scan, Expand (4 rows per input, scan-local), one 4-row
    aggregation — no join, no window."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    m = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return (
        m.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
            F.round(F.min("value"), 6).alias("mn"),
            F.round(F.max("value"), 6).alias("mx"),
        )
        .orderBy("measure")
    )


SQL_UNPIVOT_PROFILE = """
WITH m AS (
  UNPIVOT (
    SELECT l_quantity, l_extendedprice, l_discount, l_tax
    FROM lineitem
  ) ON l_quantity, l_extendedprice, l_discount, l_tax
  INTO NAME measure VALUE value
)
SELECT measure, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
       ROUND(MIN(value), 6) AS mn,
       ROUND(MAX(value), 6) AS mx
FROM m
GROUP BY measure
ORDER BY measure
"""


def q_null_semantics(spark, sf_dir):
    """Gate query: NULL-semantics parity probe — the places engines
    classically diverge, all under one hash: NULL group keys (one
    group, not dropped), COUNT(*) vs COUNT(col) vs COUNT(DISTINCT)
    under NULLs, null-skipping SUM/AVG, null-propagating arithmetic,
    and NULL-SAFE equality (Spark <=> vs DuckDB IS NOT DISTINCT
    FROM). NULLs are derived deterministically with NULLIF so the
    probe runs on any snapshot."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.expr("NULLIF(o_orderpriority, '3-MEDIUM')").alias("x"),
        F.expr("NULLIF(o_custkey % 5, 2)").alias("y"),
    )
    return (
        o.groupBy("x")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("y").alias("n_y"),
            F.count_distinct(F.col("y")).alias("nd_y"),
            F.sum("y").alias("sum_y"),
            F.sum(F.expr("y + 1")).alias("sum_y_plus1"),
            F.sum(
                F.expr("CASE WHEN y <=> 3 THEN 1 ELSE 0 END")
            ).alias("n_eq3_nullsafe"),
            F.sum(
                F.expr("CASE WHEN y <=> NULL THEN 1 ELSE 0 END")
            ).alias("n_is_null_nullsafe"),
        )
        .select(
            F.coalesce("x", F.lit("<NULL>")).alias("x_key"),
            "n_rows",
            "n_y",
            "nd_y",
            F.coalesce("sum_y", F.lit(0)).cast("long").alias("sum_y"),
            F.coalesce("sum_y_plus1", F.lit(0))
            .cast("long")
            .alias("sum_y_plus1"),
            F.col("n_eq3_nullsafe").cast("long"),
            F.col("n_is_null_nullsafe").cast("long"),
        )
        .orderBy("x_key")
    )


SQL_NULL_SEMANTICS = """
WITH o AS (
  SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS x,
         NULLIF(o_custkey % 5, 2) AS y
  FROM orders
),
g AS (
  SELECT x, COUNT(*) AS n_rows, COUNT(y) AS n_y,
         COUNT(DISTINCT y) AS nd_y,
         SUM(y) AS sum_y, SUM(y + 1) AS sum_y_plus1,
         SUM(CASE WHEN y IS NOT DISTINCT FROM 3 THEN 1 ELSE 0 END)
           AS n_eq3_nullsafe,
         SUM(CASE WHEN y IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
           AS n_is_null_nullsafe
  FROM o GROUP BY x
)
SELECT COALESCE(x, '<NULL>') AS x_key, n_rows, n_y, nd_y,
       CAST(COALESCE(sum_y, 0) AS BIGINT) AS sum_y,
       CAST(COALESCE(sum_y_plus1, 0) AS BIGINT) AS sum_y_plus1,
       CAST(n_eq3_nullsafe AS BIGINT) AS n_eq3_nullsafe,
       CAST(n_is_null_nullsafe AS BIGINT) AS n_is_null_nullsafe
FROM g
ORDER BY x_key
"""


def q_date_semantics(spark, sf_dir):
    """Gate query: date-function parity probe — each engine's NATIVE
    calendar functions under one hash: month truncation, last-day
    (month-end clamping), quarter extraction, and integer month
    arithmetic against a fixed epoch. Monthly order census with all
    four beside the counts."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.to_date("o_orderdate").alias("d")
    )
    return (
        o.groupBy(F.date_trunc("month", "d").cast("date").alias("month"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("month").cast("string").alias("month"),
            "n",
            F.last_day("month").cast("string").alias("month_end"),
            F.quarter("month").alias("q"),
            (
                (F.year("month") - F.lit(1990)) * 12
                + F.month("month") - F.lit(1)
            ).alias("months_since_1990"),
        )
        .orderBy("month")
    )


SQL_DATE_SEMANTICS = """
WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
g AS (
  SELECT CAST(date_trunc('month', d) AS DATE) AS month, COUNT(*) AS n
  FROM o GROUP BY 1
)
SELECT CAST(month AS VARCHAR) AS month, n,
       CAST(last_day(month) AS VARCHAR) AS month_end,
       CAST(EXTRACT(quarter FROM month) AS INT) AS q,
       CAST((EXTRACT(year FROM month) - 1990) * 12
            + EXTRACT(month FROM month) - 1 AS INT)
         AS months_since_1990
FROM g
ORDER BY month
"""


def queries():
    from magmapandas_spark.operators.analytics import (
        q_abc_classification,
        q_budget_allocation,
        q_rfm_segments_sketch,
    )
    from magmapandas_spark.operators.analytics import (
        q_gini_concentration,
        q_gini_sketch,
    )
    from magmapandas_spark.operators.curation import (
        q_balanced_sample,
        q_length_lognormal,
        q_text_hapax,
    )
    from magmapandas_spark.operators.dedup import (
        q_dedup_impact,
        q_ngram_novelty,
    )
    from magmapandas_spark.operators.evaluation import q_knn_label_noise
    from magmapandas_spark.operators.fuzzy import q_er_golden_multipass
    from magmapandas_spark.operators.graph import (
        q_degree_assortativity,
        q_personalized_pagerank,
        q_two_hop_reach,
    )
    from magmapandas_spark.operators.h264 import (
        q_h264_cavlc_decode,
        q_h264_intra_decode,
        q_h264_ipcm_decode,
        q_h264_full_decode,
        q_h264_gop_decode,
        q_h264_lumadc_decode,
        q_h264_multiqp_decode,
        q_h264_plane_decode,
        q_h264_qptrack_decode,
        q_video_fingerprint,
    )
    from magmapandas_spark.operators.keywords import q_rake_keywords
    from magmapandas_spark.operators.mp4 import q_h264_mp4_decode
    from magmapandas_spark.operators.png import q_image_fingerprint
    from magmapandas_spark.operators.wav import q_audio_fingerprint
    from magmapandas_spark.operators.webcorpus import (
        q_l_diversity,
        q_t_closeness,
    )
    from magmapandas_spark.operators.stats import (
        q_corr_matrix,
        q_fd_check,
        q_mutual_info,
        q_psi_drift,
    )
    from magmapandas_spark.operators.timeseries import (
        q_seasonal_outliers,
        q_seasonal_profile,
    )

    return {
        "rfm_segments_sketch": q_rfm_segments_sketch,
        "er_golden_multipass": q_er_golden_multipass,
        "two_hop_reach": q_two_hop_reach,
        "budget_allocation": q_budget_allocation,
        "abc_classification": q_abc_classification,
        "rake_keywords": q_rake_keywords,
        "h264_ipcm_decode": q_h264_ipcm_decode,
        "h264_intra_decode": q_h264_intra_decode,
        "h264_cavlc_decode": q_h264_cavlc_decode,
        "h264_lumadc_decode": q_h264_lumadc_decode,
        "h264_plane_decode": q_h264_plane_decode,
        "h264_gop_decode": q_h264_gop_decode,
        "h264_mp4_decode": q_h264_mp4_decode,
        "h264_full_decode": q_h264_full_decode,
        "h264_multiqp_decode": q_h264_multiqp_decode,
        "h264_qptrack_decode": q_h264_qptrack_decode,
        "video_fingerprint": q_video_fingerprint,
        "audio_fingerprint": q_audio_fingerprint,
        "ngram_novelty": q_ngram_novelty,
        "seasonal_outliers": q_seasonal_outliers,
        "l_diversity": q_l_diversity,
        "t_closeness": q_t_closeness,
        "mutual_info": q_mutual_info,
        "fd_check": q_fd_check,
        "degree_assortativity": q_degree_assortativity,
        "length_lognormal": q_length_lognormal,
        "image_fingerprint": q_image_fingerprint,
        "null_semantics": q_null_semantics,
        "date_semantics": q_date_semantics,
        "balanced_sample": q_balanced_sample,
        "dedup_impact": q_dedup_impact,
        "knn_label_noise": q_knn_label_noise,
        "corr_matrix": q_corr_matrix,
        "seasonal_profile": q_seasonal_profile,
        "gini_concentration": q_gini_concentration,
        "psi_drift": q_psi_drift,
        "personalized_pagerank": q_personalized_pagerank,
        "rolling_range_frame": q_rolling_range_frame,
        "grouping_sets_revenue": q_grouping_sets_revenue,
        "unpivot_profile": q_unpivot_profile,
        "gini_sketch": q_gini_sketch,
        "text_hapax": q_text_hapax,
    }


def oracle_sql():
    from magmapandas_spark.operators.analytics import (
        SQL_ABC_CLASSIFICATION,
        SQL_BUDGET_ALLOCATION,
        SQL_RFM_SEGMENTS_SKETCH,
    )
    from magmapandas_spark.operators.analytics import (
        SQL_GINI_CONCENTRATION,
        SQL_GINI_SKETCH,
    )
    from magmapandas_spark.operators.curation import (
        SQL_BALANCED_SAMPLE,
        SQL_LENGTH_LOGNORMAL,
        SQL_TEXT_HAPAX,
    )
    from magmapandas_spark.operators.dedup import (
        SQL_DEDUP_IMPACT,
        SQL_NGRAM_NOVELTY,
    )
    from magmapandas_spark.operators.evaluation import SQL_KNN_LABEL_NOISE
    from magmapandas_spark.operators.fuzzy import SQL_ER_GOLDEN_MULTIPASS
    from magmapandas_spark.operators.graph import (
        SQL_DEGREE_ASSORTATIVITY,
        SQL_PERSONALIZED_PAGERANK,
        SQL_TWO_HOP_REACH,
    )
    from magmapandas_spark.operators.h264 import (
        SQL_H264_CAVLC_DECODE,
        SQL_H264_INTRA_DECODE,
        SQL_H264_IPCM_DECODE,
        SQL_H264_FULL_DECODE,
        SQL_H264_GOP_DECODE,
        SQL_H264_LUMADC_DECODE,
        SQL_H264_MULTIQP_DECODE,
        SQL_H264_PLANE_DECODE,
        SQL_H264_QPTRACK_DECODE,
        SQL_VIDEO_FINGERPRINT,
    )
    from magmapandas_spark.operators.h264 import SQL_H264_MP4_DECODE
    from magmapandas_spark.operators.keywords import SQL_RAKE_KEYWORDS
    from magmapandas_spark.operators.png import SQL_IMAGE_FINGERPRINT
    from magmapandas_spark.operators.wav import SQL_AUDIO_FINGERPRINT
    from magmapandas_spark.operators.webcorpus import (
        SQL_L_DIVERSITY,
        SQL_T_CLOSENESS,
    )
    from magmapandas_spark.operators.stats import (
        SQL_CORR_MATRIX,
        SQL_FD_CHECK,
        SQL_MUTUAL_INFO,
        SQL_PSI_DRIFT,
    )
    from magmapandas_spark.operators.timeseries import (
        SQL_SEASONAL_OUTLIERS,
        SQL_SEASONAL_PROFILE,
    )

    return {
        "rfm_segments_sketch": SQL_RFM_SEGMENTS_SKETCH,
        "er_golden_multipass": SQL_ER_GOLDEN_MULTIPASS,
        "two_hop_reach": SQL_TWO_HOP_REACH,
        "budget_allocation": SQL_BUDGET_ALLOCATION,
        "abc_classification": SQL_ABC_CLASSIFICATION,
        "rake_keywords": SQL_RAKE_KEYWORDS,
        "h264_ipcm_decode": SQL_H264_IPCM_DECODE,
        "h264_intra_decode": SQL_H264_INTRA_DECODE,
        "h264_cavlc_decode": SQL_H264_CAVLC_DECODE,
        "h264_lumadc_decode": SQL_H264_LUMADC_DECODE,
        "h264_plane_decode": SQL_H264_PLANE_DECODE,
        "h264_gop_decode": SQL_H264_GOP_DECODE,
        "h264_mp4_decode": SQL_H264_MP4_DECODE,
        "h264_full_decode": SQL_H264_FULL_DECODE,
        "h264_multiqp_decode": SQL_H264_MULTIQP_DECODE,
        "h264_qptrack_decode": SQL_H264_QPTRACK_DECODE,
        "video_fingerprint": SQL_VIDEO_FINGERPRINT,
        "audio_fingerprint": SQL_AUDIO_FINGERPRINT,
        "ngram_novelty": SQL_NGRAM_NOVELTY,
        "seasonal_outliers": SQL_SEASONAL_OUTLIERS,
        "l_diversity": SQL_L_DIVERSITY,
        "t_closeness": SQL_T_CLOSENESS,
        "mutual_info": SQL_MUTUAL_INFO,
        "fd_check": SQL_FD_CHECK,
        "degree_assortativity": SQL_DEGREE_ASSORTATIVITY,
        "length_lognormal": SQL_LENGTH_LOGNORMAL,
        "image_fingerprint": SQL_IMAGE_FINGERPRINT,
        "null_semantics": SQL_NULL_SEMANTICS,
        "date_semantics": SQL_DATE_SEMANTICS,
        "balanced_sample": SQL_BALANCED_SAMPLE,
        "dedup_impact": SQL_DEDUP_IMPACT,
        "knn_label_noise": SQL_KNN_LABEL_NOISE,
        "corr_matrix": SQL_CORR_MATRIX,
        "seasonal_profile": SQL_SEASONAL_PROFILE,
        "gini_concentration": SQL_GINI_CONCENTRATION,
        "psi_drift": SQL_PSI_DRIFT,
        "personalized_pagerank": SQL_PERSONALIZED_PAGERANK,
        "rolling_range_frame": SQL_ROLLING_RANGE_FRAME,
        "grouping_sets_revenue": SQL_GROUPING_SETS_REVENUE,
        "unpivot_profile": SQL_UNPIVOT_PROFILE,
        "gini_sketch": SQL_GINI_SKETCH,
        "text_hapax": SQL_TEXT_HAPAX,
    }
