"""Engine-portable distinct-count sketch: KMV (k-minimum values).

No reference counterpart (the gem stops at record extraction); this is
the cardinality primitive a 100 TB profiling pass needs when an exact
`count(distinct)` would shuffle every key. Spark's built-in
`approx_count_distinct` (HLL++) is the production answer, but its
estimate is engine-private — it cannot be cross-checked against another
engine. KMV over a *portable* hash (md5, identical everywhere) gives an
estimator whose output is bit-reproducible across engines, which is what
the DuckDB oracle gate needs and what a migration-validation pipeline
wants: run old and new engine, diff the sketches exactly.

Estimator: hash each distinct key uniformly into [0, 2^60) (first 15 hex
chars of md5), keep the k smallest distinct hashes per group; with h_k
the k-th smallest, E[distinct] = (k-1) * 2^60 / h_k.

Plan shape at 100 TB: one dedup shuffle of (group, key-hash) pairs, then
TWO bounded window passes — first within (group, salt) so no single task
ever ranks more than ~1/salt_buckets of a hot group's hashes, then over
the ≤ salt_buckets*k survivors per group. The second window's input is
bounded by construction (not by data), so a mega-group cannot funnel a
reducer — the same two-phase top-k used by `corpus.per_source_cap`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^60: hashes are 15 md5 nibbles = 60 uniform bits
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 32,
    salt_buckets: int = 16,
    prefix: str = "kmv:",
) -> DataFrame:
    """Per group: exact distinct count alongside the KMV estimate, its
    k-th minimum hash and the sketch size actually used (min(k, distinct)).

    The exact count is a VALIDATION extra: it consumes the distinct
    pairs a second time (a map-side-combinable count per group). A
    production profiling pass at 100 TB drops it — the estimate is the
    product; keeping it here lets the oracle gate and callers measure
    estimator error directly.
    """
    if k < 2:
        raise ValueError("kmv_distinct requires k >= 2")
    hash60 = F.conv(F.substring(F.md5(F.concat(F.lit(prefix), F.col(key_col).cast("string"))), 1, 15), 16, 10).cast("long")
    pairs = (
        df.select(*group_cols, F.col(key_col))
        .distinct()
        .withColumn("_h", hash60)
    )
    # phase 1: k smallest per (group, salt) — parallel across salts
    salted = pairs.withColumn("_salt", F.pmod(F.col("_h"), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy("_h")
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    # phase 2: global k smallest over <= salt_buckets*k rows per group
    w2 = Window.partitionBy(*group_cols).orderBy("_h")
    kmin = (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.max("_h").alias("kth_min_hash"),
            F.count(F.lit(1)).cast("int").alias("sketch_k"),
        )
    )
    exact = pairs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    est = F.when(
        F.col("sketch_k") < k,
        # fewer than k distinct values: the sketch IS the exact set
        F.col("sketch_k").cast("double"),
    ).otherwise(
        (F.lit(float(k - 1)) * F.lit(_HASH_SPACE)) / F.col("kth_min_hash").cast("double")
    )
    return (
        kmin.join(exact, group_cols)
        .withColumn("kmv_estimate", est)
        .select(*group_cols, "exact_distinct", "sketch_k", "kth_min_hash", "kmv_estimate")
    )
