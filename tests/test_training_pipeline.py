"""The r7 end-to-end training-data capstone (q_training_pipeline) and the
two operator changes that back it: dsir_log_weights (the factored DSIR
scoring stage) and pack_sequences partition_cols (per-split packing).

The full chained value gate lives in the DuckDB oracle
(_oracle_training_pipeline — every stage's literal SQL replica composed
into one WITH-chain); these tests pin the operator-level contracts and
the capstone's fixture invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _docs(spark, sf="0.001"):
    return spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")


class TestDsirLogWeights:
    def test_matches_dsir_resample_scores(self, spark):
        """dsir_resample must be exactly dsir_log_weights + Gumbel top-k:
        the factored scoring stage returns the identical log_weight for
        every selected document."""
        from ndr_import_spark.operators.corpus import (
            dsir_log_weights,
            dsir_resample,
        )

        docs = _docs(spark)
        target = docs.where(F.col("source") == "src0")
        raw = docs.where(F.col("source") != "src0")
        picked = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_resample(raw, target, 10).collect()
        }
        scores = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_log_weights(raw, target).collect()
        }
        assert picked and all(
            scores[d] == w for d, w in picked.items()
        )

    def test_scores_every_pool_doc_with_tokens(self, spark):
        from ndr_import_spark.operators.corpus import dsir_log_weights

        docs = _docs(spark)
        target = docs.where(F.col("source") == "src0")
        raw = docs.where(F.col("source") != "src0")
        assert dsir_log_weights(raw, target).count() == raw.count()


class TestPackPartitionCols:
    def test_split_partition_equals_filtered_packing(self, spark):
        """partition_cols=('split',) must assign exactly what packing
        each split separately assigns — one window, same packs."""
        from ndr_import_spark.operators.corpus import hash_split
        from ndr_import_spark.operators.packing import pack_sequences

        docs = _docs(spark).select(
            "doc_id", F.length("text").alias("n_tok")
        )
        split = hash_split(docs, {"train": 8, "val": 1, "test": 1})
        joint = pack_sequences(
            split, "n_tok", capacity=500, num_shards=2,
            partition_cols=("split",),
        )
        got = {
            (r["split"], r["shard"], r["doc_id"]): (
                r["pack_id"], r["pack_offset"]
            )
            for r in joint.collect()
        }
        want = {}
        for name in ("train", "val", "test"):
            part = pack_sequences(
                split.where(F.col("split") == name), "n_tok",
                capacity=500, num_shards=2,
            )
            for r in part.collect():
                want[(name, r["shard"], r["doc_id"])] = (
                    r["pack_id"], r["pack_offset"]
                )
        assert got == want

    def test_default_partition_cols_unchanged(self, spark):
        from ndr_import_spark.operators.packing import pack_sequences

        docs = _docs(spark).select(
            "doc_id", F.length("text").alias("n_tok")
        )
        a = pack_sequences(docs, "n_tok", capacity=500, num_shards=2)
        b = pack_sequences(
            docs, "n_tok", capacity=500, num_shards=2, partition_cols=()
        )
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )


class TestTrainingPipelineFixture:
    def test_planted_copies_die_at_their_stage(self, spark):
        """doc_id%74==1 ('!'-punctuated re-publication) must fall to
        EXACT dedup; %74==38 (shift-by-one re-publication) must fall to
        the MinHash near-dup stage — neither may reach the final packs
        while its source doc survives."""
        import __spark_entry__ as e
        from ndr_import_spark.operators import dedup as dd

        captured = {}
        orig_pairs = dd.minhash_lsh_star_edges
        orig_ded = dd.drop_exact_duplicates

        def spy_pairs(df, **k):
            out = orig_pairs(df, **k)
            captured["pairs"] = [
                (r["id_a"], r["id_b"]) for r in out.collect()
            ]
            return out

        def spy_ded(df, **k):
            captured["pre"] = {
                r["doc_id"] for r in df.select("doc_id").collect()
            }
            out = orig_ded(df, **k)
            captured["post"] = {
                r["doc_id"] for r in out.select("doc_id").collect()
            }
            return out

        dd.minhash_lsh_star_edges = spy_pairs
        dd.drop_exact_duplicates = spy_ded
        try:
            e.q_training_pipeline(spark, "/root/testdata/sf0.01").collect()
        finally:
            dd.minhash_lsh_star_edges = orig_pairs
            dd.drop_exact_duplicates = orig_ded

        exact_dropped = captured["pre"] - captured["post"]
        # every exact-dedup casualty is a planted '!' copy whose source
        # also survived to the dedup stage
        assert exact_dropped
        for d in exact_dropped:
            assert d % 74 == 1
            assert (d - 1) in captured["pre"]
        # the shift-copies appear as near-dup pairs with their source
        shift_pairs = [
            (a, b) for a, b in captured["pairs"]
            if b % 74 == 38 and a == b - 1
        ]
        assert shift_pairs

    def test_capstone_runs_at_smoke_scale(self, spark):
        import __spark_entry__ as e

        out = e.q_training_pipeline(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        assert rows
        assert out.columns == [
            "split", "shard", "n_docs", "n_packs", "sum_tokens",
            "min_id", "max_id", "text_fp",
        ]
        assert {r["split"] for r in rows} <= {"train", "val", "test"}
