"""Pins for the r8 multimodal capstone (q_image_pipeline): EXIF scrub ->
perceptual dedup -> resize re-encode -> byte-budget packing in ONE lazy
plan over real baseline JPEGs. The oracle gate covers the md5-derivable
columns; these tests pin the plan-level properties the SQL cannot see
(real payload surgery, decode receipts, stage composition)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

import __spark_entry__ as entry


def _run(spark):
    return entry.queries()["image_pipeline"](spark, "/root/testdata/sf0.001")


class TestImagePipeline:
    def test_group_structure_and_scrub(self, spark):
        rows = _run(spark).collect()
        assert len(rows) == 20
        assert [r.kept_id for r in rows] == list(range(20))
        assert all(r.n_copies == 3 for r in rows)
        # exactly one of each pixel-triplet {g, g+20, g+40} carried GPS
        # ({g, g+1, g+2} mod 3 hits 0 once) and the scrub removed it
        assert all(r.gps_before == 1 for r in rows)
        assert all(r.gps_after == 0 for r in rows)

    def test_resize_receipts_are_real_jpeg_decodes(self, spark):
        rows = _run(spark).collect()
        assert all(r.resized_fmt == "jpeg" for r in rows)
        assert all(r.resized_ok for r in rows)
        assert all((r.resized_w, r.resized_h) == (4, 4) for r in rows)

    def test_kept_make_comes_from_the_kept_copy(self, spark):
        rows = _run(spark).collect()
        for r in rows:
            e0 = hashlib.md5(f"imgpipeexif{r.kept_id}".encode()).digest()[0]
            assert r.kept_make == f"Cam{e0 % 4}"

    def test_packing_accounts_every_survivor_once(self, spark):
        df = _run(spark)
        packs = df.groupBy("shard", "pack_id").agg(
            F.sum("est_bytes").alias("b"), F.count("*").alias("n")
        ).collect()
        assert sum(p.n for p in packs) == 20
        # concat-and-chunk: only the last pack of a shard may be underfull
        # is not guaranteed (spanning allowed), but offsets stay in range
        offs = df.select("pack_offset").collect()
        assert all(0 <= r.pack_offset < 256 for r in offs)

    def test_scrub_preserves_entropy_data_byte_identical(self):
        # the capstone's stage-A contract, pinned at the byte level
        from ndr_import_spark.functions.exif import (
            build_exif_app1,
            strip_jpeg_metadata,
        )
        from ndr_import_spark.functions.jpeg import encode_jpeg

        b = hashlib.md5(b"imgpipe5").digest()
        w = 4 * (1 + 5 % 3)
        greys = (b * 4)[: w * 4]
        rgb = bytes(v for px in greys for v in (px, px, px))
        jpeg = encode_jpeg(w, 4, rgb)
        app1 = build_exif_app1(make="CamX", gps=(
            "N", [(1, 1), (2, 1), (3, 1)], "E", [(4, 1), (5, 1), (6, 1)],
            7, 1,
        ))
        assert strip_jpeg_metadata(jpeg[:2] + app1 + jpeg[2:]) == jpeg
