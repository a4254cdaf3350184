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


class TestBm25SelfRetrieval:
    def test_distinctive_doc_ranks_itself_first(self, spark):
        from ndr_import_spark.operators.retrieval import bm25_self_retrieval

        rows = [
            (0, "zebra quagga okapi tapir kudu oryx filler words here"),
            (1, "common words shared by every document in this corpus"),
            (2, "common words shared by every document in here too"),
            (3, "common words shared by every document again and again"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["query_id"]: r for r in
               bm25_self_retrieval(df, n_queries=2, n_terms=6).collect()}
        # doc 0's terms are unique to it -> self rank 1, rr 1.0
        assert out[0]["self_rank"] == 1 and out[0]["rr"] == 1.0
        assert out[1]["self_rank"] >= 1
        assert out[1]["rr"] == round(1.0 / out[1]["self_rank"], 5)

    def test_batch_scores_match_single_query_bm25(self, spark):
        import pyspark.sql.functions as F

        from ndr_import_spark.operators.retrieval import (
            bm25_batch_scores,
            bm25_topk,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        terms = ["table", "merge", "batch"]
        single = {
            r["doc_id"]: r["score"]
            for r in bm25_topk(docs, terms, k=10).collect()
        }
        q = spark.createDataFrame(
            [(0, t) for t in terms], "query_id int, term string"
        )
        batch = {
            r["doc_id"]: r["score"]
            for r in bm25_batch_scores(docs, q).collect()
        }
        for doc_id, score in single.items():
            assert batch[doc_id] == score, doc_id


class TestEmptyPhraseGuard:
    def test_all_whitespace_phrases_raise_value_error(self, spark):
        import pytest

        with pytest.raises(ValueError, match="no non-empty phrases"):
            phrase_search(_docs(spark), ["", "   ", "\t"])

    def test_empty_list_raises_value_error(self, spark):
        import pytest

        with pytest.raises(ValueError, match="no non-empty phrases"):
            phrase_search(_docs(spark), [])
