"""Single-pass table profiler (operators/profile.py)."""

from __future__ import annotations

import datetime

import duckdb

from ndr_import_spark.operators.profile import (
    profile_oracle_sql,
    profile_table,
)


def _df(spark):
    rows = [
        (1, "a", 1.25, datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (2, "b", None, datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (3, "a", 0.5, None),
        (4, None, 0.5, datetime.datetime(2023, 12, 31, 23, 59, 59)),
        (5, "c", -1.0, None),
    ]
    return spark.createDataFrame(
        rows, "id long, s string, d double, ts timestamp"
    )


class TestProfile:
    def test_counts_nulls_distincts_extremes(self, spark):
        out = {r["column_name"]: r for r in profile_table(_df(spark)).collect()}
        assert all(out[c]["n_rows"] == 5 for c in out)
        assert out["s"]["n_nulls"] == 1
        assert out["s"]["n_distinct"] == 3
        assert out["s"]["min_v"] == "a" and out["s"]["max_v"] == "c"
        assert (out["s"]["top_v"], out["s"]["top_n"]) == ("a", 2)
        assert out["d"]["n_nulls"] == 1
        # doubles canonicalise via round->DECIMAL(18,4): padded to scale
        assert out["d"]["top_v"] == "0.5000" and out["d"]["top_n"] == 2
        assert out["ts"]["n_distinct"] == 2
        assert out["ts"]["min_v"] == "2023-12-31 23:59:59"

    def test_top_tie_breaks_to_smallest_value(self, spark):
        df = spark.createDataFrame(
            [(1, "z"), (2, "y"), (3, "z"), (4, "y")], "id long, s string"
        )
        out = {r["column_name"]: r for r in profile_table(df, ["s"]).collect()}
        assert (out["s"]["top_v"], out["s"]["top_n"]) == ("y", 2)

    def test_matches_duckdb_oracle(self, spark):
        df = _df(spark)
        got = sorted(
            tuple(r) for r in profile_table(df).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (id BIGINT, s VARCHAR, d DOUBLE, ts TIMESTAMP)"
        )
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?, ?)",
            [
                (r["id"], r["s"], r["d"], r["ts"])
                for r in df.collect()
            ],
        )
        sql = profile_oracle_sql(
            "t", [("id", "int"), ("s", "str"), ("d", "double"), ("ts", "ts")]
        )
        exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == exp


class TestFdDiscovery:
    def test_key_holds_and_violations_counted(self, spark):
        from ndr_import_spark.operators.profile import fd_discovery

        rows = [
            (1, "a", 10),
            (2, "a", 10),
            (3, "b", 20),
            (4, "b", 21),   # b -> two prices: violation for s->p
        ]
        df = spark.createDataFrame(rows, "k long, s string, p long")
        out = {(r["det"], r["dep"]): r for r in fd_discovery(
            df, [("k", "s"), ("s", "p"), ("p", "s")]
        ).collect()}
        assert out[("k", "s")]["holds"] is True
        assert out[("k", "s")]["n_groups"] == 4
        sp = out[("s", "p")]
        assert sp["holds"] is False and sp["n_violations"] == 1
        assert sp["n_groups"] == 2
        # p -> s holds (each price maps to one s)
        assert out[("p", "s")]["holds"] is True

    def test_null_det_groups_together(self, spark):
        from ndr_import_spark.operators.profile import fd_discovery

        rows = [(None, 1), (None, 2), ("x", 3)]
        df = spark.createDataFrame(rows, "s string, p long")
        out = fd_discovery(df, [("s", "p")]).collect()[0]
        # NULL det is one group with 2 distinct deps -> one violation
        assert out["n_groups"] == 2 and out["n_violations"] == 1
