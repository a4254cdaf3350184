"""Keyed merge/upsert: latest-version-wins snapshot reconciliation.

No reference counterpart (the gem stops at record extraction); this is the
incremental-ingestion primitive a warehouse pipeline needs without a table
format: given a base snapshot and an update batch, produce the new
snapshot where each key keeps its highest-version row (updates win ties).

Plan shape at 100 TB: ONE shuffle of base ∪ updates on the key and an
in-partition top-1 — same price as writing the base once. With the base
stored bucketed on the key (sinks.write_bucketed) the base side's
exchange disappears and only the (much smaller) update batch shuffles.
Deletes are modelled as tombstone rows (`tombstone_col`) that win their
key then drop out of the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
    tombstone_col: str | None = None,
) -> DataFrame:
    """New snapshot: per key, the row with the highest `version_col`
    (an update beats a base row at equal version). Rows whose
    `tombstone_col` is true win their key and are then dropped
    (delete semantics)."""
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            "merge_upsert requires identical schemas; "
            f"base-only {sorted(set(base.columns) - set(updates.columns))}, "
            f"updates-only {sorted(set(updates.columns) - set(base.columns))}"
        )
    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(version_col), F.desc("_src")
    )
    latest = (
        tagged.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_src")
    )
    if tombstone_col is not None:
        latest = latest.filter(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
        )
    return latest


def scd2_from_changes(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: each
    change opens a validity interval [valid_from, valid_to) closed by the
    key's next change; the latest change per key has valid_to NULL and
    is_current true. `tiebreak_col` makes same-timestamp ordering
    deterministic (required for cross-engine reproducibility).

    Plan shape at 100 TB: ONE shuffle of the change log on the key; the
    lead() window and the is_current flag ride the same partitioning.
    Per-key history length bounds each window task, so only a key whose
    OWN change count is pathological can slow a task — group-size skew,
    which AQE handles, not key-funnel skew.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col), F.col(tiebreak_col))
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        changes.withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
        .select(
            *key_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            "is_current",
            *attr_cols,
        )
    )
