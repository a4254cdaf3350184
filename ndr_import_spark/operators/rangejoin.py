"""Bucketed range join: points joined to the intervals containing them.

No reference counterpart (net-new scale operator; the reference gem has no
joins — SURVEY §2 "Missing entirely"). Spark plans a bare
``l.ts BETWEEN r.start AND r.end`` predicate as a broadcast-nested-loop or
cartesian product — O(|points| · |intervals|) at 100 TB.

The standard fix is bucketization: pick a bucket width, explode each
interval into the buckets it covers, map each point to its single bucket,
and equi-join on the bucket before refining with the exact BETWEEN
predicate. The join becomes a plain hash/sort-merge equi-join:

* shuffle volume = |points| + Σ interval spans / bucket_width — linear,
  tunable via `bucket_seconds` (pick ≈ the median interval length so each
  interval lands in O(1) buckets);
* a point meets only the intervals sharing its bucket — candidate pairs
  are output-bounded, never corpus-quadratic;
* long intervals fan out over many buckets but each bucket stays small —
  the skew profile AQE handles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ndr_import_spark.operators.sessions import epoch_seconds


def _bucket(es: Column, width: int) -> Column:
    return F.floor(es / F.lit(width)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join `points` to every interval with ``start <= point < end``.

    Timestamp (and timestamp_ntz) columns are compared at whole-second
    resolution via `epoch_seconds`; numeric columns are compared as-is
    (`bucket_seconds` is then just the bucket width). Column-name
    collisions between the two inputs raise.
    """
    if how != "inner":
        # outer variants need an anti-join complement on top of the
        # bucket equi-join; not implemented until a caller needs it
        raise ValueError(f"range_join supports inner joins, got {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"range_join inputs share column names {sorted(overlap)}; rename first"
        )
    # dtype strings: integral types report as tinyint/smallint/int/bigint,
    # decimals carry precision ("decimal(18,2)") — match on prefix
    ptype = dict(points.dtypes)[point_col]
    numeric = ptype in (
        "bigint", "int", "smallint", "tinyint", "double", "float",
    ) or ptype.startswith("decimal")

    def secs(col: Column) -> Column:
        return col.cast("double") if numeric else epoch_seconds(col).cast("double")

    p_es = secs(F.col(point_col))
    s_es = secs(F.col(start_col))
    e_es = secs(F.col(end_col))

    pts = points.withColumn("_rj_bucket", _bucket(p_es, bucket_seconds))
    ivs = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(_bucket(s_es, bucket_seconds), _bucket(e_es, bucket_seconds))
        ),
    )
    joined = pts.join(ivs, "_rj_bucket", how).filter(
        (p_es >= s_es) & (p_es < e_es)
    )
    return joined.drop("_rj_bucket")
