"""Incremental corpus maintenance: snapshot-to-snapshot diff.

No reference counterpart (the gem is single-batch); this is the change
audit a continuously-refreshed 100 TB corpus runs between crawl
snapshots before deciding what to re-process: which documents appeared,
vanished, or changed content — detected by content hash, never by
comparing raw text.

Plan shape: both snapshots project to (id, md5(text)) at scan time —
the full-width rows never shuffle — then ONE full-outer equi-join on the
id. At 100 TB both sides bucket/partition by the same id, so the join
co-locates; the output is a narrow (id, status) frame feeding whatever
reprocessing fan-out follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document change status between two corpus snapshots:
    'added' (only in new), 'removed' (only in old), 'changed' (both, but
    content hash differs), 'unchanged'. Returns (id, status)."""
    o = old.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_ho")
    )
    n = new.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_hn")
    )
    joined = o.join(n, "_id", "full")
    status = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(F.col("_id").alias(id_col), status.alias("status"))
