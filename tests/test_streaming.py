"""Structured Streaming pipeline tests: file-source stream → compiled record
pipeline → memory sink; watermarked window + session-window aggregations."""

from __future__ import annotations

import json
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from ndr_import_spark.plans.model import MappingError
from ndr_import_spark.plans.yaml_loader import load_mapping
from ndr_import_spark.streaming import (
    session_window_stats,
    stateful_stream_dedup,
    stream_records,
    stream_tables,
    windowed_stats,
)

MAPPING_YAML = """
klass: Patient
header_lines: 1
columns:
- column: nhs_no
  rawtext_name: nhsnumber
  mappings:
  - field: nhsnumber
    clean: :nhsnumber
- column: name
  mappings:
  - field: name
    clean: :name
"""


class TestStreamRecords:
    def test_csv_stream_to_records(self, spark):
        tmp = tempfile.mkdtemp()
        try:
            with open(f"{tmp}/a.csv", "w") as f:
                f.write("nhs_no,name\n012 345 6789,anna.belle smith\n555,bob\n")
            mapping = load_mapping(MAPPING_YAML)
            cells = stream_tables(spark, tmp, "csv", mapping)
            assert cells.isStreaming
            records = stream_records(mapping, cells)
            name = f"recs_{uuid.uuid4().hex[:8]}"
            q = (
                records.writeStream.format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            rows = spark.sql(f"select * from {name}").collect()
            assert len(rows) == 2
            by_nhs = {dict(r.fields).get("nhsnumber") for r in rows}
            assert by_nhs == {"0123456789", "555"}
            assert all(r.klass == "Patient" for r in rows)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_order_dependent_features_rejected(self, spark):
        footer = load_mapping(MAPPING_YAML + "footer_lines: 2\n")
        with pytest.raises(MappingError):
            stream_records(footer, None)
        idx = load_mapping(MAPPING_YAML + "row_identifier: index\n")
        with pytest.raises(MappingError):
            stream_records(idx, None)


class TestWindows:
    def _event_stream(self, spark, tmp):
        with open(f"{tmp}/events.json", "w") as f:
            f.write(
                '{"user_id": 1, "ts": "2024-01-01T00:00:00", "value": 1.0, "event_type": "a"}\n'
                '{"user_id": 1, "ts": "2024-01-01T00:10:00", "value": 2.0, "event_type": "a"}\n'
                '{"user_id": 1, "ts": "2024-01-01T02:00:00", "value": 4.0, "event_type": "b"}\n'
                '{"user_id": 2, "ts": "2024-01-01T00:05:00", "value": 8.0, "event_type": "a"}\n'
            )
        schema = "user_id long, ts timestamp, value double, event_type string"
        return spark.readStream.schema(schema).json(tmp)

    def test_windowed_stats(self, spark):
        tmp = tempfile.mkdtemp()
        try:
            stats = windowed_stats(self._event_stream(spark, tmp))
            name = f"win_{uuid.uuid4().hex[:8]}"
            q = (
                stats.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            rows = {
                (r.window_start.isoformat(), r.event_type): (r.n, r.sum_value)
                for r in spark.sql(f"select * from {name}").collect()
            }
            assert rows[("2024-01-01T00:00:00", "a")] == (3, 11.0)
            assert rows[("2024-01-01T02:00:00", "b")] == (1, 4.0)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_watermark_drops_late_rows_and_finalises_windows(self, spark):
        # event-time watermark semantics in APPEND mode, pinned with
        # explicit batch boundaries (one file per processAllAvailable):
        #   batch1 advances the watermark past window [00:00,01:00);
        #   batch2 delivers a LATE row inside that window -> dropped,
        #   and the finalised window is emitted WITHOUT it;
        #   later batches finalise [02:00,03:00) while the still-open
        #   [03:00+) windows are withheld from the append sink.
        tmp = tempfile.mkdtemp()
        src = f"{tmp}/in"
        import os

        os.makedirs(src)
        schema = "user_id long, ts timestamp, value double, event_type string"

        def emit(name, *rows):
            with open(f"{src}/{name}.json", "w") as f:
                for ts, v in rows:
                    f.write(
                        f'{{"user_id": 1, "ts": "2024-01-01T{ts}", '
                        f'"value": {v}, "event_type": "a"}}\n'
                    )

        name = f"wm_{uuid.uuid4().hex[:8]}"
        try:
            stream = spark.readStream.schema(schema).json(src)
            stats = windowed_stats(stream, watermark="10 minutes")
            emit("b1", ("00:05:00", 1.0), ("00:20:00", 2.0), ("02:30:00", 4.0))
            q = (
                stats.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .start()
            )
            q.processAllAvailable()  # batch1: watermark -> 02:20
            emit("b2", ("00:30:00", 8.0), ("02:40:00", 16.0))
            q.processAllAvailable()  # late 00:30 dropped; [00:00,01:00) emitted
            emit("b3", ("03:30:00", 32.0))
            q.processAllAvailable()  # watermark -> 03:20 after this batch
            emit("b4", ("04:30:00", 64.0))
            q.processAllAvailable()  # [02:00,03:00) finalised and emitted
            q.stop()
            rows = {
                r.window_start.isoformat(): (r.n, r.sum_value)
                for r in spark.sql(f"select * from {name}").collect()
            }
            # late 00:30 row excluded: n=2 sum=3, not n=3 sum=11
            assert rows["2024-01-01T00:00:00"] == (2, 3.0)
            # on-time 02:30 + 02:40 both present
            assert rows["2024-01-01T02:00:00"] == (2, 20.0)
            # the still-open window holding 04:30 (watermark tops out at
            # 04:20 < 05:00) never reaches an append sink
            assert "2024-01-01T04:00:00" not in rows
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_stateful_stream_dedup_across_batches(self, spark):
        tmp = tempfile.mkdtemp()
        try:
            data = f"{tmp}/data"
            import os

            os.makedirs(data)
            # maxFilesPerTrigger=1 → each file is its own micro-batch, so
            # the duplicate key in b2 exercises CROSS-batch keyed state
            with open(f"{data}/b1.json", "w") as f:
                f.write(
                    '{"fingerprint": "aaa", "doc_id": 7}\n'
                    '{"fingerprint": "aaa", "doc_id": 3}\n'
                    '{"fingerprint": "bbb", "doc_id": 5}\n'
                )
            with open(f"{data}/b2.json", "w") as f:
                f.write(
                    '{"fingerprint": "aaa", "doc_id": 1}\n'
                    '{"fingerprint": "ccc", "doc_id": 9}\n'
                )
            schema = "fingerprint string, doc_id long"
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .json(data)
            )
            deduped = stateful_stream_dedup(stream)
            name = f"dedup_{uuid.uuid4().hex[:8]}"
            q = (
                deduped.writeStream.format("memory")
                .queryName(name)
                .option("checkpointLocation", f"{tmp}/_ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            rows = spark.sql(f"select * from {name}").collect()
            by_key: dict[str, list[int]] = {}
            for r in rows:
                by_key.setdefault(r.fingerprint, []).append(r.doc_id)
            # exactly ONE emission per key; min id wins inside its batch
            assert sorted(by_key) == ["aaa", "bbb", "ccc"]
            assert all(len(v) == 1 for v in by_key.values())
            assert by_key["bbb"] == [5] and by_key["ccc"] == [9]
            assert by_key["aaa"][0] in (1, 3)  # whichever batch ran first
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_corpus_columns_compose_on_streams(self, spark):
        """The corpus/text column functions are pure Column expressions, so
        the same code path runs on a stream: quality + repetition +
        fingerprint computed per micro-batch, then keyed-state dedup."""
        from ndr_import_spark.operators.corpus import repetition_score
        from ndr_import_spark.operators.textstats import fingerprint, quality_score

        tmp = tempfile.mkdtemp()
        try:
            with open(f"{tmp}/docs.json", "w") as f:
                f.write(
                    '{"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"}\n'
                    '{"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog"}\n'
                    '{"doc_id": 3, "text": "spam spam spam spam spam spam"}\n'
                )
            stream = spark.readStream.schema("doc_id long, text string").json(tmp)
            scored = stream.select(
                "doc_id",
                fingerprint(F.col("text")).alias("fingerprint"),
                F.round(quality_score(F.col("text")), 5).alias("quality"),
                F.round(repetition_score(F.col("text"), 2), 5).alias("rep"),
            )
            deduped = stateful_stream_dedup(scored)
            name = f"corpus_{uuid.uuid4().hex[:8]}"
            q = (
                deduped.writeStream.format("memory")
                .queryName(name)
                .option("checkpointLocation", f"{tmp}/_ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            rows = spark.sql(f"select * from {name}").collect()
            # docs 1 and 2 share a fingerprint -> one survivor (min id)
            assert sorted(r.doc_id for r in rows) == [1, 3]
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_session_window_stats(self, spark):
        tmp = tempfile.mkdtemp()
        try:
            stats = session_window_stats(self._event_stream(spark, tmp))
            name = f"sess_{uuid.uuid4().hex[:8]}"
            q = (
                stats.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            rows = spark.sql(f"select * from {name}").collect()
            # user 1: two sessions (00:00-00:10 gap < 30m, then 02:00); user 2: one
            per_user = {}
            for r in rows:
                per_user.setdefault(r.user_id, []).append((r.n_events, r.total_value))
            assert sorted(per_user[1]) == [(1, 4.0), (2, 3.0)]
            assert per_user[2] == [(1, 8.0)]
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestStreamDecontaminate:
    def test_contaminated_docs_dropped(self, spark):
        from ndr_import_spark.streaming import stream_decontaminate

        tmp = tempfile.mkdtemp()
        try:
            clean_text = "totally novel words nobody benchmarked ever before now"
            dirty_text = "the quick brown fox jumps over the lazy dog today"
            with open(f"{tmp}/docs.json", "w") as f:
                f.write(
                    f'{{"doc_id": 1, "text": "{clean_text}"}}\n'
                    f'{{"doc_id": 2, "text": "{dirty_text}"}}\n'
                )
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .json(tmp)
            )
            eval_set = ["xx the quick brown fox jumps yy"]
            cleaned = stream_decontaminate(stream, eval_set, n=5)
            assert cleaned.isStreaming
            name = f"decon_{uuid.uuid4().hex[:8]}"
            q = (
                cleaned.writeStream.format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            rows = spark.sql(f"select doc_id from {name}").collect()
            assert [r["doc_id"] for r in rows] == [1]
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_stream_cluster_assign_matches_batch_lattice(self, spark):
        from ndr_import_spark.operators.clustering import (
            _assign_wide,
            embedding_dims,
        )
        from ndr_import_spark.streaming import stream_cluster_assign

        cent_rows = [(0, 0, 13), (0, 1, 25), (1, 0, -51), (1, 1, 38)]
        centroids = spark.createDataFrame(cent_rows, "cid int, d int, c long")
        vecs = [
            (1, [0.1, 0.2]), (2, [-0.4, 0.3]), (3, [0.0, 0.0]),
            (4, [0.5, -0.5]),
        ]
        batch = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        expected = {
            r["vec_id"]: (r["cid"], r["dist"])
            for r in _assign_wide(
                embedding_dims(batch), cent_rows, "vec_id"
            ).collect()
        }
        tmp = tempfile.mkdtemp()
        try:
            with open(f"{tmp}/vecs.json", "w") as f:
                for vid, v in vecs:
                    f.write(json.dumps({"vec_id": vid, "embedding": v}) + "\n")
            stream = (
                spark.readStream.schema("vec_id long, embedding array<float>")
                .json(tmp)
            )
            assigned = stream_cluster_assign(stream, centroids)
            assert assigned.isStreaming
            name = f"kma_{uuid.uuid4().hex[:8]}"
            q = (
                assigned.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")  # stateless: append must be legal
                .trigger(availableNow=True)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            got = {
                r["vec_id"]: (r["cid"], r["dist"])
                for r in spark.sql(f"select * from {name}").collect()
            }
            assert got == expected
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_static_dataframe_eval_side(self, spark):
        from ndr_import_spark.streaming import stream_decontaminate

        tmp = tempfile.mkdtemp()
        try:
            with open(f"{tmp}/docs.json", "w") as f:
                f.write('{"doc_id": 7, "text": "alpha beta gamma delta epsilon zeta"}\n')
            stream = (
                spark.readStream.schema("doc_id long, text string").json(tmp)
            )
            eval_df = spark.createDataFrame(
                [("alpha beta gamma delta epsilon",)], "text string"
            )
            cleaned = stream_decontaminate(stream, eval_df, n=5)
            name = f"decon_{uuid.uuid4().hex[:8]}"
            q = (
                cleaned.writeStream.format("memory")
                .queryName(name).trigger(availableNow=True).start()
            )
            q.processAllAvailable()
            q.stop()
            assert spark.sql(f"select * from {name}").count() == 0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_oversized_eval_set_raises(self, spark, monkeypatch):
        """A corpus-sized eval frame must raise up front (clear error), not
        OOM the driver mid-collect. The cap is monkeypatched small so the
        guard path runs without building a million-row frame."""
        from ndr_import_spark import streaming as streaming_pkg
        from ndr_import_spark.streaming import pipeline as pl

        monkeypatch.setattr(pl, "_EVAL_SET_MAX_ROWS", 10)
        big_eval = spark.range(50).selectExpr("concat('text ', id) AS text")
        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .selectExpr("value AS doc_id", "cast(value as string) AS text")
        )
        with pytest.raises(ValueError, match="eval_set exceeds 10 rows"):
            pl.stream_decontaminate(stream, big_eval, n=5)
        # at exactly the cap the plan still builds
        ok_eval = spark.range(10).selectExpr("concat('text ', id) AS text")
        assert pl.stream_decontaminate(stream, ok_eval, n=5) is not None


class TestStreamPhraseFlags:
    def test_flags_match_batch_phrase_search(self, spark):
        import json as _json
        import shutil
        import tempfile
        import uuid

        from ndr_import_spark.operators.retrieval import phrase_search
        from ndr_import_spark.streaming import stream_phrase_flags

        phrases = ["quick brown", "lazy dog", "absent phrase"]
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "quick brown quick brown"),
            (2, "Quick  BROWN fox"),
            (3, "nothing to see"),
        ]
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        batch_docs = {
            p: n for p, n in (
                (r["phrase"], r["n_docs"])
                for r in phrase_search(batch, phrases).collect()
            )
        }
        tmp = tempfile.mkdtemp()
        try:
            with open(f"{tmp}/docs.json", "w") as f:
                for i, t in rows:
                    f.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
            stream = (
                spark.readStream.schema("doc_id long, text string").json(tmp)
            )
            flagged = stream_phrase_flags(stream, phrases)
            assert flagged.isStreaming
            name = f"spf_{uuid.uuid4().hex[:8]}"
            q = (
                flagged.writeStream.format("memory").queryName(name)
                .outputMode("append")  # stateless: append must be legal
                .trigger(availableNow=True).start()
            )
            q.processAllAvailable()
            q.stop()
            got = spark.sql(f"select * from {name}").collect()
            by_id = {r["doc_id"]: r for r in got}
            assert by_id[0]["flagged"] and sorted(
                by_id[0]["matched_phrases"]
            ) == ["lazy dog", "quick brown"]
            assert by_id[1]["matched_phrases"] == ["quick brown"]
            assert by_id[2]["matched_phrases"] == ["quick brown"]
            assert not by_id[3]["flagged"]
            # per-phrase doc counts agree with the batch positional index
            for p in phrases:
                stream_n = sum(
                    1 for r in got if p in (r["matched_phrases"] or [])
                )
                assert stream_n == batch_docs.get(p, 0), p
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestStreamCms:
    def test_streamed_cells_match_batch_sketch(self, spark):
        import json as _json
        import shutil
        import tempfile
        import uuid

        from ndr_import_spark.operators.sketches import cms_build
        from ndr_import_spark.streaming import stream_cms_cells

        rows = [(i, f"k{i % 7}") for i in range(60)]
        batch = spark.createDataFrame(rows, "id long, k string")
        expected = {
            (r["r"], r["col"]): r["cnt"]
            for r in cms_build(batch, "k", depth=4, width=32).collect()
        }
        tmp = tempfile.mkdtemp()
        try:
            # two files -> two micro-batches: state must accumulate
            with open(f"{tmp}/a.json", "w") as f:
                for i, k in rows[:30]:
                    f.write(_json.dumps({"id": i, "k": k}) + "\n")
            with open(f"{tmp}/b.json", "w") as f:
                for i, k in rows[30:]:
                    f.write(_json.dumps({"id": i, "k": k}) + "\n")
            stream = (
                spark.readStream.schema("id long, k string")
                .option("maxFilesPerTrigger", 1).json(tmp)
            )
            cells = stream_cms_cells(stream, "k", depth=4, width=32)
            assert cells.isStreaming
            name = f"cms_{uuid.uuid4().hex[:8]}"
            q = (
                cells.writeStream.format("memory").queryName(name)
                .outputMode("complete")  # running sketch totals
                .trigger(availableNow=True).start()
            )
            q.processAllAvailable()
            q.stop()
            got = {
                (r["r"], r["col"]): r["cnt"]
                for r in spark.sql(f"select * from {name}").collect()
            }
            assert got == expected
            # bounded state: never more than depth x width cells
            assert len(got) <= 4 * 32
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestStreamMediaMetadata:
    def test_stream_probe_matches_batch(self, spark):
        import os
        import tempfile

        from ndr_import_spark.operators.multimodal import (
            extract_media_metadata,
        )
        from ndr_import_spark.operators.textstats import md5_long
        from ndr_import_spark.sources import mediameta as M
        from ndr_import_spark.streaming import stream_media_metadata

        payloads = {
            "a.mp3": M.build_mp3(3, 3, 9, 0, 5, xing_frames=4),
            "b.ogg": M.build_ogg_vorbis(48000, 1, 96000),
            "c.mp4": M.build_mp4(1000, 3000, "avc1", 640, 480),
        }
        tmp = tempfile.mkdtemp()
        for name, data in payloads.items():
            with open(os.path.join(tmp, name), "wb") as f:
                f.write(data)

        stream = stream_media_metadata(spark, tmp)
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName("media_meta_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.media_id: r
            for r in spark.sql("SELECT * FROM media_meta_stream").collect()
        }

        batch_rows = [
            (i, "audio", None, None, None, None, bytearray(data))
            for i, data in enumerate(payloads.values())
        ]
        from ndr_import_spark.operators import multimodal as MM

        batch = {
            r.container: r
            for r in extract_media_metadata(
                spark.createDataFrame(batch_rows, MM.MEDIA_SCHEMA)
            ).collect()
        }
        assert len(got) == 3
        by_container = {r.container: r for r in got.values()}
        for c in ("mp3", "ogg", "mp4"):
            s, b = by_container[c], batch[c]
            assert (s.codec, s.sample_rate, s.duration_ms, s.n_frames) == (
                b.codec, b.sample_rate, b.duration_ms, b.n_frames
            )


class TestStreamC4Filter:
    def test_stateless_rules_match_batch_on_span_free_corpus(self, spark):
        import json as _json
        import tempfile

        from ndr_import_spark.operators.corpus import (
            c4_clean,
            c4_clean_stateless,
        )
        from ndr_import_spark.streaming import stream_c4_filter

        def page(i):
            return (
                f"alpha{i} beta gamma one. tiny. delta{i} epsilon zeta "
                f"two. eta{i} theta iota three. kappa{i} lam mu four. "
                f"nu{i} xi pi five."
                + (" please enable javascript now." if i % 2 else "")
                + (" lorem ipsum dolor." if i == 3 else "")
            )

        rows = [(i, page(i)) for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, text string")

        batch_full = {tuple(r) for r in c4_clean(df).select(
            "doc_id", "n_sentences", "n_kept", "clean_text").collect()}
        batch_stateless = {tuple(r) for r in
                           c4_clean_stateless(df).collect()}
        # span-free corpus (every doc unique): full == stateless
        assert batch_full == batch_stateless

        tmp = tempfile.mkdtemp()
        with open(f"{tmp}/docs.json", "w") as f:
            for i, t in rows:
                f.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, text string").json(tmp)
        )
        out = stream_c4_filter(stream)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("c4_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)  # a timeout must fail loudly,
        # not let the set comparison report a misleading partial diff
        streamed = {
            tuple(r)
            for r in spark.sql("SELECT * FROM c4_stream").collect()
        }
        assert streamed == batch_stateless
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


class TestStreamExtractMainContent:
    def test_stateless_matches_batch_and_streams(self, spark):
        """r7: boilerplate extraction is per-document row-local, so the
        array form must equal the explode+groupBy batch form value-for-
        value, and run unchanged on a stream in append mode."""
        import json as _json
        import shutil
        import tempfile

        from ndr_import_spark.operators.boilerplate import (
            extract_main_content,
            extract_main_content_stateless,
        )
        from ndr_import_spark.streaming import stream_extract_main_content

        def page(i):
            return (
                '<html><body><div id="nav"><a href="/">Home</a> '
                '<a href="/x">X</a></div>'
                f"<p>alpha{i} beta gamma delta epsilon zeta eta theta "
                f"iota kappa lam mu nu number {i} here today.</p>"
                '<p>short one.</p>'
                f"<p>second long paragraph {i} with plenty of ordinary "
                'words to pass the gate <a href="/in">inline link</a> '
                "and even more filler text after it.</p>"
                '<div id="f"><a href="/c">Contact</a></div></body></html>'
            )

        rows = [(i, page(i)) for i in range(8)] + [(99, "<p> </p>")]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        batch = {tuple(r) for r in extract_main_content(df).collect()}
        stateless = {
            tuple(r) for r in extract_main_content_stateless(df).collect()
        }
        assert batch == stateless
        # the degenerate no-text page drops in both forms
        assert 99 not in {t[0] for t in batch}
        # real pages kept nav/footer-free
        any_row = next(t for t in batch if t[0] == 0)
        assert "Home" not in any_row[3] and "Contact" not in any_row[3]
        assert "alpha0" in any_row[3]

        tmp = tempfile.mkdtemp()
        with open(f"{tmp}/pages.json", "w") as f:
            for i, h in rows:
                f.write(_json.dumps({"doc_id": i, "html": h}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, html string").json(tmp)
        )
        out = stream_extract_main_content(stream)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("mc_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        streamed = {
            tuple(r)
            for r in spark.sql("SELECT * FROM mc_stream").collect()
        }
        assert streamed == stateless
        shutil.rmtree(tmp, ignore_errors=True)

    def test_stateless_matches_batch_on_crawl_fixture_pages(self, spark):
        """Parity on the REAL fixture page shapes the capstone uses
        (nav/footer chrome, link-bearing paragraphs, artifact
        paragraphs) over sf0.001 documents."""
        import __spark_entry__ as e
        import ndr_import_spark.operators.boilerplate as bp

        captured = {}
        orig = bp.extract_main_content

        def spy(df, **k):
            captured["pages"] = df
            return orig(df, **k)

        bp.extract_main_content = spy
        try:
            e.q_training_pipeline(
                spark, "/root/testdata/sf0.001"
            ).collect()
        finally:
            bp.extract_main_content = orig
        pages = captured["pages"]
        batch = {
            tuple(r) for r in bp.extract_main_content(pages).collect()
        }
        stateless = {
            tuple(r)
            for r in bp.extract_main_content_stateless(pages).collect()
        }
        assert batch == stateless
        assert len(batch) == pages.count()


class TestStreamCrawlFrontHalf:
    def test_full_front_half_streams_and_matches_batch(self, spark):
        """The whole crawl front half as ONE streaming chain — HTML ->
        boilerplate (stateless) -> unicode hygiene -> C4 row-local
        rules — against the identical batch chain on the same pages.
        Stateless twins compose; only corpus-level stages (span dedup,
        MinHash, decontamination) stay batch."""
        import json as _json
        import shutil
        import tempfile

        import pyspark.sql.functions as F

        from ndr_import_spark.operators.boilerplate import (
            extract_main_content_stateless,
        )
        from ndr_import_spark.operators.corpus import c4_clean_stateless
        from ndr_import_spark.operators.unicode_clean import clean_unicode
        from ndr_import_spark.streaming import (
            stream_c4_filter,
            stream_extract_main_content,
            stream_unicode_clean,
        )

        moji = "café".encode("utf-8").decode("cp1252")

        def page(i):
            return (
                '<html><body><div id="nav"><a href="/">Home</a></div>'
                f"<p>alpha{i} beta gamma one word word word word word "
                f"{moji} here. tiny. delta{i} epsilon zeta two ok fine. "
                f"eta{i} theta iota three more pad. kappa{i} lam mu four "
                f"pad pad. nu{i} xi pi five pad pad.</p>"
                + ("<p>please enable javascript to continue now right "
                   "here today ok.</p>" if i % 2 else "")
                + '<div id="f"><a href="/c">C</a></div></body></html>'
            )

        rows = [(i, page(i)) for i in range(6)]
        df = spark.createDataFrame(rows, "doc_id long, html string")

        def chain(frame, mc_fn, uc_fn, c4_fn):
            mc = mc_fn(frame)
            uc = uc_fn(mc.select("doc_id", F.col("main_text").alias("text")))
            return c4_fn(
                uc.select("doc_id", F.col("clean_text").alias("text"))
            )

        batch = {
            tuple(r)
            for r in chain(
                df, extract_main_content_stateless, clean_unicode,
                c4_clean_stateless,
            ).collect()
        }
        assert batch  # pages survive the whole chain
        # the mojibake artifact was repaired before C4 saw the text
        assert any("café" in t[-1] for t in batch)
        assert not any(moji in t[-1] for t in batch)

        tmp = tempfile.mkdtemp()
        with open(f"{tmp}/pages.json", "w") as f:
            for i, h in rows:
                f.write(_json.dumps({"doc_id": i, "html": h}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, html string").json(tmp)
        )
        out = chain(
            stream, stream_extract_main_content, stream_unicode_clean,
            stream_c4_filter,
        )
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("front_half")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        streamed = {
            tuple(r)
            for r in spark.sql("SELECT * FROM front_half").collect()
        }
        assert streamed == batch
        shutil.rmtree(tmp, ignore_errors=True)

    def test_stream_scrub_images(self, spark):
        """GPS EXIF stripped from a live image stream; non-JPEG passes
        through byte-identical."""
        import shutil
        import tempfile

        from ndr_import_spark.functions.exif import (
            build_exif_jpeg,
            extract_image_meta,
        )
        from ndr_import_spark.streaming import stream_scrub_images

        gps = ("N", [(51, 1), (30, 1), (0, 1)], "E",
               [(7, 1), (0, 1), (0, 1)], 100, 1)
        jpg = build_exif_jpeg(32, 16, gps=gps)
        tmp = tempfile.mkdtemp()
        df = spark.createDataFrame(
            [(0, bytearray(jpg)), (1, bytearray(b"not an image"))],
            "media_id long, payload binary",
        )
        df.write.mode("overwrite").parquet(f"{tmp}/media")
        stream = spark.readStream.schema(
            "media_id long, payload binary"
        ).parquet(f"{tmp}/media")
        out = stream_scrub_images(stream)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("scrubbed_images")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        got = {
            r["media_id"]: bytes(r["payload"])
            for r in spark.sql("SELECT * FROM scrubbed_images").collect()
        }
        m = extract_image_meta(got[0])
        assert not m["has_gps"] and (m["width"], m["height"]) == (32, 16)
        assert got[1] == b"not an image"
        shutil.rmtree(tmp, ignore_errors=True)


class TestStreamWebpScrub:
    def test_stream_scrub_strips_webp_exif(self, spark):
        """r8: the streaming PII scrub covers WebP containers too —
        EXIF/XMP chunks dropped from a lossy-VP8 VP8X file on a live
        stream while the compressed image chunk survives byte-identical
        (stream == batch by construction: same stateless operator)."""
        import shutil
        import tempfile

        from ndr_import_spark.functions.exif import build_exif_app1
        from ndr_import_spark.functions.webp import (
            build_vp8_keyframe_stub,
            build_vp8x_header,
            build_webp_container,
            webp_metadata,
        )
        from ndr_import_spark.streaming import stream_scrub_images

        app1 = build_exif_app1(make="CamS", gps=(
            "N", [(51, 1), (30, 1), (0, 1)], "E",
            [(7, 1), (0, 1), (0, 1)], 100, 1,
        ))
        vp8 = build_vp8_keyframe_stub(64, 32, fill=b"\xEE" * 21)
        payload = build_webp_container([
            (b"VP8X", build_vp8x_header(64, 32, exif=True, xmp=True)),
            (b"VP8 ", vp8),
            (b"EXIF", app1[10:]),
            (b"XMP ", b"<x/>"),
        ])
        tmp = tempfile.mkdtemp()
        df = spark.createDataFrame(
            [(0, bytearray(payload))], "media_id long, payload binary"
        )
        df.write.mode("overwrite").parquet(f"{tmp}/media")
        stream = spark.readStream.schema(
            "media_id long, payload binary"
        ).parquet(f"{tmp}/media")
        q = (
            stream_scrub_images(stream)
            .writeStream.format("memory")
            .queryName("scrubbed_webp")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        got = bytes(
            spark.sql("SELECT * FROM scrubbed_webp").collect()[0]["payload"]
        )
        m = webp_metadata(got)
        assert not m["has_exif"] and not m["has_xmp"]
        assert (m["width"], m["height"]) == (64, 32)
        assert vp8 in got
        shutil.rmtree(tmp, ignore_errors=True)


class TestStreamLog2Histogram:
    def test_stream_equals_batch_bin_for_bin(self, spark):
        """r8: the streamed histogram's running cells equal a batch
        log2_histogram over the same rows (integer bit-length binning
        cannot disagree on an edge); quantile reads compose on top."""
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from ndr_import_spark.operators.sketches import log2_histogram
        from ndr_import_spark.streaming import stream_log2_histogram

        events = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        ).select("value")
        tmp = tempfile.mkdtemp()
        events.write.mode("overwrite").parquet(f"{tmp}/vals")
        stream = spark.readStream.schema("value double").parquet(f"{tmp}/vals")
        q = (
            stream_log2_histogram(stream, "value")
            .writeStream.format("memory")
            .queryName("hist_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        streamed = {
            r.bin: r.cnt
            for r in spark.sql("SELECT * FROM hist_stream").collect()
        }
        batch = {
            r.bin: r.cnt for r in log2_histogram(events, "value").collect()
        }
        assert streamed == batch
        shutil.rmtree(tmp, ignore_errors=True)


class TestStreamAudioTriage:
    def test_stream_routes_by_integrity_and_reads_tags(self, spark):
        """r10: structural audio triage on a live stream — intact MP3s
        route 'keep' with their ID3 title, mid-frame cuts and non-audio
        route 'quarantine' (stream == batch by construction: one
        stateless Arrow pass, the same functions the batch operators
        use)."""
        import shutil
        import tempfile

        from ndr_import_spark.functions.mp3 import (
            build_id3v2,
            build_layer3_stream,
        )
        from ndr_import_spark.streaming import stream_audio_triage

        body = build_layer3_stream(
            [{"granules": [[{"part2_3_length": 150}], [{}]]}] * 3,
            mpeg1=True, sr_idx=0, br_idx=9, mono=True)
        good = build_id3v2({"TIT2": "Keep Me"}, version=4) + body
        cut = body[:len(body) - 40]
        df = spark.createDataFrame(
            [(0, bytearray(good)), (1, bytearray(cut)),
             (2, bytearray(b"\x89PNG not audio"))],
            "media_id long, payload binary")
        tmp = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(f"{tmp}/media")
        stream = spark.readStream.schema(
            "media_id long, payload binary").parquet(f"{tmp}/media")
        q = (
            stream_audio_triage(stream)
            .writeStream.format("memory")
            .queryName("audio_triage")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        rows = {r.media_id: r for r in
                spark.sql("SELECT * FROM audio_triage").collect()}
        assert rows[0].route == "keep" and rows[0].title == "Keep Me"
        assert rows[1].route == "quarantine"
        assert rows[1].verdict == "truncated"
        assert rows[2].route == "quarantine"
        assert rows[2].verdict == "not_mp3"
        shutil.rmtree(tmp, ignore_errors=True)


class TestStreamAudioTags:
    def test_stream_matches_batch_per_container(self, spark):
        """r11: audio_tag_table on live binaryFile ingest — one tagged
        file per container (MP3 ID3v2, FLAC, Ogg Vorbis, Ogg Opus, WAV
        RIFF/INFO, M4A ilst) lands in a watched directory; every tag
        column of the streamed result must equal the batch operator's
        on the same payloads (stream == batch parity per container)."""
        import os
        import shutil
        import tempfile

        import numpy as np

        from ndr_import_spark.functions.audiotags import (
            build_flac_with_comments,
            build_m4a_tagged,
            build_ogg_opus_tagged,
            build_ogg_vorbis_tagged,
            build_riff_info,
        )
        from ndr_import_spark.functions.flac import encode_flac
        from ndr_import_spark.functions.mp3 import (
            build_id3v2,
            build_layer3_stream,
        )
        from ndr_import_spark.functions.wav import encode_wav
        from ndr_import_spark.operators.multimodal import audio_tag_table
        from ndr_import_spark.sources.mediameta import build_mp4
        from ndr_import_spark.streaming import stream_audio_tags

        sig = np.array([0.25] * 32 + [-0.25] * 32)
        mp3_body = build_layer3_stream(
            [{"granules": [[{"part2_3_length": 100}], [{}]]}],
            mpeg1=True, sr_idx=0, br_idx=9, mono=True)
        payloads = {
            "a.mp3": build_id3v2(
                {"TIT2": "Tmp3", "TPE1": "amp3"}, version=4) + mp3_body,
            "b.flac": build_flac_with_comments(
                encode_flac(8000, sig),
                {"TITLE": "Tflac", "ARTIST": "aflac"}),
            "c.ogg": build_ogg_vorbis_tagged(
                44100, 2, {"TITLE": "Togg", "ARTIST": "aogg"}),
            "d.opus": build_ogg_opus_tagged(
                48000, 1, {"TITLE": "Topus", "ARTIST": "aopus"}),
            "e.wav": build_riff_info(
                encode_wav(8000, sig, bits=16),
                {"INAM": "Twav", "IART": "awav"}),
            "f.m4a": build_m4a_tagged(
                build_mp4(44100, 44100, codec="mp4a", channels=2,
                          sample_rate=44100, n_samples=4, brand="M4A "),
                {"TITLE": "Tm4a", "ARTIST": "am4a"},
                cover=b"\xff\xd8c"),
        }
        tmp = tempfile.mkdtemp()
        try:
            for name, data in payloads.items():
                with open(os.path.join(tmp, name), "wb") as f:
                    f.write(data)
            stream = stream_audio_tags(spark, tmp)
            assert stream.isStreaming
            q = (
                stream.writeStream.format("memory")
                .queryName("audio_tags_stream")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            streamed = {
                r.id3_version: r for r in
                spark.sql("SELECT * FROM audio_tags_stream").collect()
            }
            batch = {
                r.id3_version: r for r in audio_tag_table(
                    spark.createDataFrame(
                        [(i, bytearray(d))
                         for i, d in enumerate(payloads.values())],
                        "media_id long, payload binary")
                ).collect()
            }
            assert set(streamed) == {"2.4", "flac", "vorbis", "opus",
                                     "riff", "mp4"}
            for ver, s in streamed.items():
                b = batch[ver]
                assert (s.title, s.artist, s.album, s.year, s.genre,
                        s.encoder, s.comment, s.has_picture,
                        s.n_frames) == (
                    b.title, b.artist, b.album, b.year, b.genre,
                    b.encoder, b.comment, b.has_picture, b.n_frames)
            assert streamed["mp4"].has_picture
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestStreamAudioFingerprints:
    def test_live_cross_codec_dedup_keys_match_batch(self, spark):
        """r11: audio fingerprint keys on live binaryFile ingest — the
        same signal landing as WAV, FLAC and IMA ADPCM must produce
        ONE fingerprint group with the lossless pair digest-equal,
        exactly as the batch operator computes on the same payloads."""
        import os
        import shutil
        import tempfile

        import numpy as np

        from ndr_import_spark.functions.adpcm import (
            encode_ima,
            encode_wav_ima,
        )
        from ndr_import_spark.functions.flac import encode_flac
        from ndr_import_spark.functions.wav import encode_wav
        from ndr_import_spark.operators.multimodal import (
            audio_fingerprint_table,
        )
        from ndr_import_spark.streaming import stream_audio_fingerprints

        sig = np.concatenate(
            [np.full(128, (L + 0.5) / 8 - 1) for L in [2, 13, 5, 9]])
        payloads = {
            "a.wav": encode_wav(8000, sig, bits=16),
            "b.flac": encode_flac(8000, sig),
            "c_ima.wav": encode_wav_ima(
                8000, encode_ima(sig, 256), 1, 256),
        }
        tmp = tempfile.mkdtemp()
        try:
            for name, data in payloads.items():
                with open(os.path.join(tmp, name), "wb") as f:
                    f.write(data)
            q = (
                stream_audio_fingerprints(spark, tmp)
                .writeStream.format("memory")
                .queryName("audio_fp_stream")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            streamed = {
                r.codec: r for r in
                spark.sql("SELECT * FROM audio_fp_stream").collect()
            }
            batch = {
                r.codec: r for r in audio_fingerprint_table(
                    spark.createDataFrame(
                        [(i, bytearray(d))
                         for i, d in enumerate(payloads.values())],
                        "media_id long, payload binary")
                ).collect()
            }
            assert set(streamed) == {"pcm16", "flac", "adpcm-ima"}
            for codec, s in streamed.items():
                b = batch[codec]
                assert (s.fingerprint, s.pcm_md5, s.sample_rate,
                        s.n_samples) == (
                    b.fingerprint, b.pcm_md5, b.sample_rate, b.n_samples)
            assert len({r.fingerprint for r in streamed.values()}) == 1
            assert streamed["pcm16"].pcm_md5 == streamed["flac"].pcm_md5
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestStreamAudioQuality:
    def test_live_verdicts_match_batch(self, spark):
        """r11: quality triage on ingest — one file per planted class
        lands in a watched directory; every stat column of the streamed
        result equals the batch operator's on the same payloads."""
        import os
        import shutil
        import tempfile

        import numpy as np

        from ndr_import_spark.functions.flac import encode_flac
        from ndr_import_spark.functions.wav import encode_wav
        from ndr_import_spark.operators.multimodal import (
            audio_quality_table,
        )
        from ndr_import_spark.streaming import stream_audio_quality

        fs = 32767.0 / 32768.0
        payloads = {
            "ok.wav": encode_wav(8000, np.concatenate(
                [np.full(512, 0.5), np.full(512, -0.5)]), bits=16),
            "clip.flac": encode_flac(8000, np.concatenate(
                [np.full(32, fs), np.full(32, -fs), np.full(960, 0.25)])),
            "silent.wav": encode_wav(8000, np.concatenate(
                [np.full(16, 0.5), np.zeros(1008)]), bits=16),
            "dc.flac": encode_flac(8000, np.full(1024, 0.25)),
        }
        tmp = tempfile.mkdtemp()
        try:
            for name, data in payloads.items():
                with open(os.path.join(tmp, name), "wb") as f:
                    f.write(data)
            q = (
                stream_audio_quality(spark, tmp)
                .writeStream.format("memory")
                .queryName("audio_quality_stream")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            streamed = {
                r.verdict: r for r in
                spark.sql("SELECT * FROM audio_quality_stream").collect()
            }
            batch = {
                r.verdict: r for r in audio_quality_table(
                    spark.createDataFrame(
                        [(i, bytearray(d))
                         for i, d in enumerate(payloads.values())],
                        "media_id long, payload binary")
                ).collect()
            }
            assert set(streamed) == {"ok", "clipped", "silent",
                                     "dc_offset"}
            for v, s in streamed.items():
                b = batch[v]
                assert (s.peak, s.mean_square, s.dc_offset, s.clip_ratio,
                        s.silence_ratio, s.codec) == (
                    b.peak, b.mean_square, b.dc_offset, b.clip_ratio,
                    b.silence_ratio, b.codec)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
