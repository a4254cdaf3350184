"""Record linkage (operators/linkage.py): symmetric-delete blocking +
levenshtein verify + best-match election, pinned on hand-built cases."""

from __future__ import annotations

from ndr_import_spark.operators.linkage import link_records


def _df(spark, rows, idc, namec):
    return spark.createDataFrame(rows, f"{idc} long, {namec} string")


def test_links_each_edit_class_at_distance_one(spark):
    master = _df(
        spark,
        [(1, "smith"), (2, "jones"), (3, "brown")],
        "master_id",
        "master_name",
    )
    probes = _df(
        spark,
        [
            (10, "smith"),   # exact (distance 0)
            (11, "smth"),    # deletion
            (12, "smiths"),  # insertion
            (13, "janes"),   # substitution (jones -> janes)
            (14, "zzzzz"),   # no match at d<=1
        ],
        "probe_id",
        "probe_name",
    )
    got = {
        r["probe_id"]: (r["master_id"], r["distance"])
        for r in link_records(probes, master).collect()
    }
    assert got == {10: (1, 0), 11: (1, 1), 12: (1, 1), 13: (2, 1)}


def test_tie_breaks_to_smallest_master_id(spark):
    # probe "aa" is distance 1 from both "aaa" (id 5) and "ab" (id 2)
    master = _df(
        spark, [(5, "aaa"), (2, "ab")], "master_id", "master_name"
    )
    probes = _df(spark, [(1, "aa")], "probe_id", "probe_name")
    row = link_records(probes, master).collect()[0]
    assert (row["master_id"], row["distance"]) == (2, 1)


def test_exact_match_beats_distance_one(spark):
    master = _df(
        spark, [(1, "york"), (2, "yorks")], "master_id", "master_name"
    )
    probes = _df(spark, [(9, "yorks")], "probe_id", "probe_name")
    row = link_records(probes, master).collect()[0]
    assert (row["master_id"], row["distance"]) == (2, 0)


def test_blocking_has_exact_recall_at_distance_one(spark):
    # adversarial: match at the FIRST character (deletion key drops char 1)
    master = _df(spark, [(1, "xanadu")], "master_id", "master_name")
    probes = _df(
        spark,
        [(1, "anadu"), (2, "yanadu"), (3, "xxanadu")],
        "probe_id",
        "probe_name",
    )
    rows = link_records(probes, master).collect()
    assert sorted(r["probe_id"] for r in rows) == [1, 2, 3]
    assert all(r["distance"] == 1 for r in rows)
