"""Positional-index phrase search (operators/retrieval.py phrase_search)."""

from __future__ import annotations

import duckdb

from ndr_import_spark.operators.retrieval import (
    phrase_search,
    phrase_search_oracle_sql,
)


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "quick brown quick brown quick"),      # back-to-back repeats
        (2, "Quick  Brown\tfox"),                  # case + whitespace noise
        (3, "nothing relevant here"),
        (4, "brown quick brown"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPhraseSearch:
    def test_counts_and_back_to_back_repeats(self, spark):
        out = {
            r["phrase"]: (r["n_docs"], r["n_hits"])
            for r in phrase_search(
                _docs(spark), ["quick brown", "quick brown fox", "lazy cat"]
            ).collect()
        }
        # doc1 holds TWO "quick brown" occurrences sharing a delimiter —
        # the case a replace/regexp count would miss (RE2: no lookahead).
        assert out["quick brown"] == (4, 5)
        assert out["quick brown fox"] == (2, 2)
        assert "lazy cat" not in out  # zero hits -> no row

    def test_matches_duckdb_oracle(self, spark):
        phrases = ["quick brown", "brown quick brown", "quick brown fox"]
        got = sorted(
            (r["phrase"], r["n_docs"], r["n_hits"])
            for r in phrase_search(_docs(spark), phrases).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)",
            [(r["doc_id"], r["text"]) for r in _docs(spark).collect()],
        )
        exp = [tuple(r) for r in con.execute(
            phrase_search_oracle_sql(phrases)).fetchall()]
        assert got == exp
