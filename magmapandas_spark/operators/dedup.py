"""Deduplication operators for large text corpora (beyond-reference
surface; first-class for a 100 TB training-data pipeline).

- exact dedup: content-hash groupBy (see suite.q_dedup_exact)
- MinHash + LSH banding: shingle → n minhash signatures → band-bucket
  equi-join → candidate pairs. One shuffle per stage, no cross product.
- SimHash: 64-bit signed-projection fingerprint + prefix buckets +
  in-bucket Hamming filter.

These depend on Spark's xxhash64 (engine-specific), so their
correctness gate is the rows-only check; the arithmetic-hash-free
Jaccard twin (suite2.q_ngram_jaccard_adjacent) carries the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shingle_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Distinct character n-gram shingles per document (narrow +
    per-doc distinct)."""
    return (
        docs.filter(F.length(text_col) >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - F.lit(n - 1))
            ).alias("i"),
            F.col(text_col),
        )
        .select(
            F.col(id_col), F.expr(f"substring({text_col}, i, {n})").alias("sh")
        )
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", n_hashes: int = 32
) -> DataFrame:
    """n seeded xxhash64 minima per doc — one aggregation, map-side
    partial min, single shuffle on doc id."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int = 8,
    shingle: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing ≥1 LSH band bucket.

    rows = bands per doc; join key = (band, band signature hash) —
    uniformly distributed, skew-safe. Returns distinct (id1 < id2)."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(
        shingle_df(docs, id_col, text_col, shingle), id_col, n_hashes
    )
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig"))
        )
    exploded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
        )
        .distinct()
    )


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-token xxhash64, each
    bit votes ±1, fingerprint = sign vector. Pure aggregation — scales
    as one shuffle on doc id."""
    tokens = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .withColumn("h", F.xxhash64(F.col("tok")))
    )
    # vote per bit: sum over tokens of (bit set ? +1 : -1)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v_{i}")
        for i in range(bits)
    ]
    agg = tokens.groupBy(id_col).agg(*votes)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.when(F.col(f"v_{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = F.shiftleft(fp, 1).bitwiseOR(bit)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_tables: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming ≤ ``max_hamming`` — block-permuted
    bucket tables (Manku et al. 2007, public simhash dedup literature).

    The 64-bit fingerprint splits into ``n_tables`` disjoint blocks;
    each block is one bucket table. By pigeonhole, two fingerprints
    differing in ≤ n_tables−1 bits agree on at least one whole block, so
    with the default 4×16-bit tables recall is COMPLETE for
    max_hamming ≤ 3 (a single prefix table misses any pair whose
    differing bits fall inside the prefix). Cost: n_tables bucket
    equi-joins' worth of rows in ONE join (explode + join on
    (table, block value)), still no cross product."""
    if max_hamming > n_tables - 1:
        import warnings

        warnings.warn(
            f"recall is complete only for max_hamming <= {n_tables - 1};"
            f" raise n_tables for larger radii"
        )
    fp = simhash(docs, id_col, text_col)
    width = 64 // n_tables
    mask = (1 << width) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                F.shiftright(F.col("simhash"), t * width)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    bucketed = fp.select(
        F.col(id_col), F.col("simhash"), F.explode(blocks).alias("tb")
    ).select(
        id_col,
        "simhash",
        F.col("tb.tbl").alias("tbl"),
        F.col("tb.bucket").alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            "hamming",
        )
        .distinct()  # a pair can match in several tables
    )


# ---- suite entries (rows-only correctness: engine-specific hashes) ----

def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_candidates(docs).orderBy("id1", "id2")


def q_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_dups(docs).orderBy("id1", "id2")
