"""Distributed parquet footer probe (sources/parquet_meta.py).

Row-group-level output is pinned against DuckDB's independent footer
parser (`parquet_metadata(...)`) on a file written with FORCED SMALL ROW
GROUPS — the sf fixtures are single-group, so this is where the
per-group semantics actually get exercised. Also covers the integrity
property (footer totals == scan totals), the missing-column /
missing-stats error gates, and feeding a real footer inventory into
operators/layout.compaction_plan.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ndr_import_spark.sources.parquet_meta import (
    footer_table_summary,
    parquet_footer_inventory,
)


@pytest.fixture(scope="module")
def chunked_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pqmeta") / "chunked.parquet")
    n = 1037
    tbl = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "v": pa.array([i * 7 % 101 for i in range(n)], pa.int64()),
            "s": pa.array([f"row-{i}" for i in range(n)], pa.string()),
        }
    )
    pq.write_table(tbl, path, row_group_size=100)  # 11 groups, last short
    return path, n


def test_row_groups_match_duckdb_footer_parser(spark, chunked_file):
    path, _ = chunked_file
    inv = (
        parquet_footer_inventory(spark, [(path, "k")])
        .orderBy("row_group_id")
        .collect()
    )
    con = duckdb.connect()
    ducks = con.execute(
        """
        SELECT row_group_id, row_group_num_rows,
               cast(stats_min_value as bigint), cast(stats_max_value as bigint)
        FROM parquet_metadata(?)
        WHERE path_in_schema = 'k'
        ORDER BY row_group_id
        """,
        [path],
    ).fetchall()
    assert len(inv) == len(ducks) == 11
    for row, (gid, nrows, kmin, kmax) in zip(inv, ducks):
        assert row.row_group_id == gid
        assert row.rg_rows == nrows
        assert row.key_min == kmin
        assert row.key_max == kmax
        assert row.n_columns == 3
        assert row.rg_bytes > 0


def test_footer_summary_equals_full_scan(spark, chunked_file):
    path, n = chunked_file
    summary = footer_table_summary(
        parquet_footer_inventory(spark, [(path, "k")])
    ).collect()
    assert len(summary) == 1
    row = summary[0]
    assert row.table_name == "chunked"
    scan = spark.read.parquet(path).selectExpr(
        "count(*) c", "min(k) lo", "max(k) hi"
    ).first()
    assert (row.total_rows, row.key_min, row.key_max) == (scan.c, scan.lo, scan.hi)
    assert row.total_rows == n


def test_missing_column_raises(spark, chunked_file):
    path, _ = chunked_file
    with pytest.raises(Exception, match="no column 'nope'"):
        parquet_footer_inventory(spark, [(path, "nope")]).collect()


def test_inventory_feeds_compaction_plan(spark, chunked_file):
    """The footer inventory IS a compaction-plan input: bin the row
    groups of one file into ~300-row-group-byte rewrite bins."""
    from ndr_import_spark.operators.layout import compaction_plan

    path, _ = chunked_file
    inv = parquet_footer_inventory(spark, [(path, "k")]).selectExpr(
        "path as partition",
        "lpad(cast(row_group_id as string), 4, '0') as path",
        "rg_bytes as bytes",
    )
    total = sum(r.rg_bytes for r in
                parquet_footer_inventory(spark, [(path, "k")]).collect())
    target = max(1, total // 4)
    plan = compaction_plan(inv, target_bytes=target).collect()
    assert sum(r.n_files for r in plan) == 11
    assert sum(r.bin_bytes for r in plan) == total
    # bins are contiguous in row-group order
    for r in plan:
        assert r.first_path <= r.last_path
