"""embedding_neardup_drops: embedding-cosine near-dup dedup decisions.

Net-new north-star operator (no reference counterpart — the gem has no
dedup surface). Pins: LSH bucketing only compares same-signature vectors,
the cosine threshold gates pairs, and the drop-list aggregation keeps the
lowest-id partner deterministically.
"""

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.operators.dedup import embedding_neardup_drops


DIM = 8


def _docs_and_embeddings(spark, vecs):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(len(vecs))], "doc_id int, text string"
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    return docs, emb


def test_near_identical_vectors_collapse_to_lowest_id(spark):
    base = [1.0, 0.5, -0.25, 0.0, 0.75, -1.0, 0.25, 0.5]
    near = [x * 1.01 for x in base]          # cosine ~1 with base
    opposite = [-x for x in base]            # cosine -1: never a dup
    docs, emb = _docs_and_embeddings(spark, [base, near, opposite])
    out = embedding_neardup_drops(
        docs, emb, dim=DIM, planes=4, threshold=0.9
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["doc_id"], row["keep_id"], row["n_dups"]) == (1, 0, 1)
    assert row["max_cos"] == pytest.approx(1.0, abs=1e-4)


def test_multiple_partners_keep_min_id_and_count_all(spark):
    base = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    vecs = [base, [x * 2 for x in base], [x * 0.5 for x in base]]
    docs, emb = _docs_and_embeddings(spark, vecs)
    out = {
        r["doc_id"]: r
        for r in embedding_neardup_drops(
            docs, emb, dim=DIM, planes=4, threshold=0.9
        ).collect()
    }
    # doc 1 pairs with 0; doc 2 pairs with 0 and 1 -> keep 0, n_dups 2
    assert out[1]["keep_id"] == 0 and out[1]["n_dups"] == 1
    assert out[2]["keep_id"] == 0 and out[2]["n_dups"] == 2


def test_threshold_gates_pairs(spark):
    a = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    b = [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]  # cos(a,b) = 1/sqrt(2) ~ .707
    docs, emb = _docs_and_embeddings(spark, [a, b])
    hi = embedding_neardup_drops(docs, emb, dim=DIM, planes=1, threshold=0.9)
    lo = embedding_neardup_drops(docs, emb, dim=DIM, planes=1, threshold=0.5)
    assert hi.count() == 0
    # planes=1 -> at most 2 buckets; the pair may still split buckets, so
    # only assert the threshold direction when they do share one
    assert lo.count() in (0, 1)


def test_docs_without_embeddings_are_ignored(spark):
    base = [1.0, 0.5, -0.25, 0.0, 0.75, -1.0, 0.25, 0.5]
    docs = spark.createDataFrame(
        [(0, "a"), (1, "b"), (9, "no-embedding")], "doc_id int, text string"
    )
    emb = spark.createDataFrame(
        [(0, base), (1, [x * 1.01 for x in base])],
        "vec_id int, embedding array<double>",
    )
    out = embedding_neardup_drops(docs, emb, dim=DIM, planes=4, threshold=0.9)
    assert [r["doc_id"] for r in out.collect()] == [1]


class TestQuantizeEmbeddings:
    def test_zero_and_empty_vectors_quantize_to_zero(self, spark):
        # an all-zero vector must yield scale 0, all-zero qvec, err 0 —
        # never NULLs that propagate into downstream ANN stages
        from ndr_import_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            [
                (1, [0.0, 0.0, 0.0]),
                (2, []),
                (3, [2.0, -4.0, 1.0]),
            ],
            "vec_id int, embedding array<double>",
        )
        rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
        assert rows[1]["scale"] == 0.0
        assert rows[1]["qvec"] == [0, 0, 0]
        assert rows[1]["recon_err"] == 0.0
        assert rows[2]["scale"] == 0.0
        assert rows[2]["qvec"] == []
        assert rows[2]["recon_err"] == 0.0
        assert rows[3]["scale"] == 4.0
        assert rows[3]["qvec"] == [64, -127, 32]
        assert rows[3]["recon_err"] is not None and rows[3]["recon_err"] < 0.1


class TestSourceSimilarity:
    def test_hand_cosines(self, spark):
        import __spark_entry__ as entry
        import duckdb
        import tempfile, os, shutil

        # 3 sources: s0 and s1 share direction (scaled), s2 orthogonal
        vecs = {
            0: [1.0, 0.0] + [0.0] * 62,
            1: [0.5, 0.0] + [0.0] * 62,   # same direction, half scale
            2: [0.0, 1.0] + [0.0] * 62,
        }
        tmp = tempfile.mkdtemp()
        try:
            spark.createDataFrame(
                [(i, vecs[i], 0) for i in range(3)],
                "vec_id long, embedding array<float>, label int",
            ).write.parquet(f"{tmp}/embeddings.parquet")
            spark.createDataFrame(
                [(i, f"s{i}", "en", f"doc {i}", 5) for i in range(3)],
                "doc_id long, source string, lang string, text string, "
                "n_chars long",
            ).write.parquet(f"{tmp}/documents.parquet")
            out = {(r["src_a"], r["src_b"]): r["cosine"] for r in
                   entry.queries()["source_similarity"](spark, tmp).collect()}
            assert out[("s0", "s1")] == 1.0     # same direction
            assert out[("s0", "s2")] == 0.0     # orthogonal
            assert out[("s1", "s2")] == 0.0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
