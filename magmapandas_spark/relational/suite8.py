"""Correctness-suite part 8 (round 7): recommendation / robust-stats /
spatial / privacy / dimensionality-reduction / layout analytics.

Twelve additions, each with a full exact oracle:

- ``copurchase_lift`` — market-basket association rules (support /
  confidence / lift as integer ppm); pair volume bounded by the
  per-order basket cap, item frequencies broadcast.
- ``mad_outliers`` — median-absolute-deviation robust outliers;
  medians are explicit order statistics (never percentile builtins),
  the threshold is one shared literal expression.
- ``ewma_smooth`` — 16-lag EWMA with dyadic-rational weights emitted
  as shortest-roundtrip literals into one shared IEEE tree: smoothed
  DOUBLES hash bit-exactly cross-engine.
- ``attribution`` — first/last-touch conversion attribution via
  windowed conditional MIN/MAX of row numbers + one co-partitioned
  rn-resolution self-join (no IGNORE NULLS dependence).
- ``geo_nearest`` — spatial nearest-neighbor via 3x3 grid-cell
  bucketed equi-join over md5-derived integer micro-degree
  coordinates; exact BIGINT squared distances.
- ``randomized_response`` — Warner local-DP prevalence estimation
  (p = 3/4): the ln-free mechanism, estimate and ground truth side by
  side in integer ppm.
- ``random_projection`` — Achlioptas +-1 JL projection 64 -> 8 dims
  inside the scan; projected top-20 with full-space distances and
  recall flags, doubles bit-exact via +-1.0 multiplies.
- ``label_propagation`` — 2-round synchronous min-label communities
  (the bounded-round, unrolled-oracle twin of the converged CC loop;
  two rounds leave the dense gate graph mid-merge — 14 communities —
  where four collapse it to one label and no signal).
- ``zonemap_prune`` — data-skipping effectiveness report: zone maps
  under insertion-ordered vs filter-column-clustered layouts — the
  measurement behind compaction/Z-order decisions.
- ``sentence_stats`` — regex sentence segmentation reduced to
  per-source integer statistics.
- ``domain_divergence`` — chi-square divergence of per-source
  token-length profiles from the corpus profile (rational arithmetic,
  no ln).
- ``retrieval_eval`` — P@10 / MRR / first-relevant-rank for the exact
  L2 ranking under label relevance; only ranks and integer ppm
  surface.
"""

from __future__ import annotations


def queries():
    from magmapandas_spark.operators.analytics import q_attribution
    from magmapandas_spark.operators.assoc import q_copurchase_lift
    from magmapandas_spark.operators.curation import (
        q_domain_divergence,
        q_sentence_stats,
    )
    from magmapandas_spark.operators.evaluation import q_retrieval_eval
    from magmapandas_spark.operators.graph import q_label_propagation
    from magmapandas_spark.operators.privacy import q_randomized_response
    from magmapandas_spark.operators.projection import q_random_projection
    from magmapandas_spark.operators.robust import (
        q_ewma_smooth,
        q_mad_outliers,
    )
    from magmapandas_spark.operators.spatial import q_geo_nearest
    from magmapandas_spark.operators.stats import q_zonemap_prune

    return {
        "copurchase_lift": q_copurchase_lift,
        "mad_outliers": q_mad_outliers,
        "ewma_smooth": q_ewma_smooth,
        "attribution": q_attribution,
        "geo_nearest": q_geo_nearest,
        "randomized_response": q_randomized_response,
        "random_projection": q_random_projection,
        "label_propagation": q_label_propagation,
        "zonemap_prune": q_zonemap_prune,
        "sentence_stats": q_sentence_stats,
        "domain_divergence": q_domain_divergence,
        "retrieval_eval": q_retrieval_eval,
    }


def oracle_sql():
    from magmapandas_spark.operators.analytics import SQL_ATTRIBUTION
    from magmapandas_spark.operators.assoc import SQL_COPURCHASE_LIFT
    from magmapandas_spark.operators.curation import (
        SQL_DOMAIN_DIVERGENCE,
        SQL_SENTENCE_STATS,
    )
    from magmapandas_spark.operators.evaluation import SQL_RETRIEVAL_EVAL
    from magmapandas_spark.operators.graph import SQL_LABEL_PROPAGATION
    from magmapandas_spark.operators.privacy import SQL_RANDOMIZED_RESPONSE
    from magmapandas_spark.operators.projection import SQL_RANDOM_PROJECTION
    from magmapandas_spark.operators.robust import (
        SQL_EWMA_SMOOTH,
        SQL_MAD_OUTLIERS,
    )
    from magmapandas_spark.operators.spatial import SQL_GEO_NEAREST
    from magmapandas_spark.operators.stats import SQL_ZONEMAP_PRUNE

    return {
        "copurchase_lift": SQL_COPURCHASE_LIFT,
        "mad_outliers": SQL_MAD_OUTLIERS,
        "ewma_smooth": SQL_EWMA_SMOOTH,
        "attribution": SQL_ATTRIBUTION,
        "geo_nearest": SQL_GEO_NEAREST,
        "randomized_response": SQL_RANDOMIZED_RESPONSE,
        "random_projection": SQL_RANDOM_PROJECTION,
        "label_propagation": SQL_LABEL_PROPAGATION,
        "zonemap_prune": SQL_ZONEMAP_PRUNE,
        "sentence_stats": SQL_SENTENCE_STATS,
        "domain_divergence": SQL_DOMAIN_DIVERGENCE,
        "retrieval_eval": SQL_RETRIEVAL_EVAL,
    }
