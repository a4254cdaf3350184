"""merge_upsert: latest-version-wins snapshot reconciliation."""

from __future__ import annotations

import pytest

from ndr_import_spark.operators.upsert import merge_upsert


def frames(spark):
    base = spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 1, False), (3, "c", 5, False)],
        "k long, v string, version long, deleted boolean",
    )
    updates = spark.createDataFrame(
        [
            (1, "a2", 2, False),   # newer: wins
            (3, "c2", 4, False),   # older than base v5: loses
            (2, "b-del", 2, True),  # tombstone: key 2 disappears
            (9, "new", 1, False),  # insert
        ],
        "k long, v string, version long, deleted boolean",
    )
    return base, updates


class TestMergeUpsert:
    def test_upsert_semantics(self, spark):
        base, updates = frames(spark)
        got = {
            r["k"]: (r["v"], r["version"])
            for r in merge_upsert(base, updates, ["k"], "version",
                                  tombstone_col="deleted").collect()
        }
        assert got == {1: ("a2", 2), 3: ("c", 5), 9: ("new", 1)}

    def test_update_wins_version_tie(self, spark):
        base = spark.createDataFrame([(1, "old", 1)], "k long, v string, version long")
        updates = spark.createDataFrame([(1, "new", 1)], "k long, v string, version long")
        [row] = merge_upsert(base, updates, ["k"], "version").collect()
        assert row["v"] == "new"

    def test_schema_mismatch_raises(self, spark):
        base = spark.createDataFrame([(1, "x", 1)], "k long, v string, version long")
        updates = spark.createDataFrame([(1, 1)], "k long, version long")
        with pytest.raises(ValueError, match="identical schemas"):
            merge_upsert(base, updates, ["k"], "version")
