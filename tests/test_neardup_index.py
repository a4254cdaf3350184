"""Stored near-dup index: parquet write/probe roundtrip
(dedup.write_neardup_index / probe_neardup_index) and the streaming
probe (streaming.pipeline.stream_neardup_probe)."""

import json
import os

import pytest

from ndr_import_spark.operators.dedup import (
    incremental_neardup_pairs,
    probe_neardup_index,
    write_neardup_index,
)

OLD_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again tail"),
    (3, "completely different content about spark shuffle planning"),
]
NEW_DOCS = [
    (100, "the quick brown fox jumps over the lazy dog again and again slightly"),
    (101, "nothing like anything previously ingested in any snapshot"),
]


class TestStoredIndex:
    def test_probe_matches_in_memory_incremental(self, spark, tmp_path):
        old = spark.createDataFrame(OLD_DOCS, "doc_id long, text string")
        new = spark.createDataFrame(NEW_DOCS, "doc_id long, text string")
        idx = str(tmp_path / "idx")
        write_neardup_index(old, idx)
        # layout contract: band-partitioned bands/ + narrow sets/
        assert os.path.isdir(f"{idx}/bands/band=0")
        assert os.path.isdir(f"{idx}/sets")

        from_index = sorted(
            map(tuple, probe_neardup_index(new, idx, verify_threshold=0.5).collect())
        )
        in_memory = sorted(
            map(tuple, incremental_neardup_pairs(old, new, verify_threshold=0.5).collect())
        )
        assert from_index == in_memory
        assert any(r[0] == 100 for r in from_index)  # the near-dup was found


class TestStreamingProbe:
    def test_stream_probe_matches_batch(self, spark, tmp_path):
        from ndr_import_spark.streaming.pipeline import stream_neardup_probe

        old = spark.createDataFrame(OLD_DOCS, "doc_id long, text string")
        idx = str(tmp_path / "idx")
        write_neardup_index(old, idx)

        src = tmp_path / "stream_in"
        src.mkdir()
        with open(src / "batch0.json", "w") as f:
            for doc_id, text in NEW_DOCS:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        pairs = stream_neardup_probe(stream, idx, verify_threshold=0.5)
        q = (
            pairs.writeStream.format("memory")
            .queryName("neardup_probe")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql(
            "SELECT DISTINCT new_id, old_id, jaccard FROM neardup_probe"
        ).collect()
        batch = set(
            map(tuple, probe_neardup_index(
                spark.createDataFrame(NEW_DOCS, "doc_id long, text string"),
                idx,
                verify_threshold=0.5,
            ).collect())
        )
        # distinct stream output == batch probe (stream may emit a pair
        # once per matching band; distinct collapses that bounded dup)
        assert set(map(tuple, got)) == batch


class TestIndexParamsGuard:
    def test_mismatched_probe_params_raise(self, spark, tmp_path):
        old = spark.createDataFrame(OLD_DOCS, "doc_id long, text string")
        new = spark.createDataFrame(NEW_DOCS, "doc_id long, text string")
        idx = str(tmp_path / "idx")
        write_neardup_index(old, idx, bands=8)
        with pytest.raises(ValueError, match="bands=8"):
            probe_neardup_index(new, idx, bands=4).collect()
