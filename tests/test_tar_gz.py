"""Tar expansion (sources/archive.py::read_tar) and transparent gzip
text/CSV reading through the delimited reader."""

import gzip
import os
import tarfile

import pytest

from ndr_import_spark.sources.registry import read_tables


def _make_tar(tmp, name, compression=""):
    csv1 = os.path.join(tmp, "a.csv")
    csv2 = os.path.join(tmp, "b.csv")
    skipme = os.path.join(tmp, "notes.txt")
    with open(csv1, "w") as f:
        f.write("x,y\n1,2\n3,4\n")
    with open(csv2, "w") as f:
        f.write("x,y\n5,6\n")
    with open(skipme, "w") as f:
        f.write("not a csv\n")
    tar_path = os.path.join(tmp, name)
    mode = "w" if not compression else f"w:{compression}"
    with tarfile.open(tar_path, mode) as tf:
        tf.add(csv1, arcname="a.csv")
        tf.add(csv2, arcname="sub/dir/b.csv")
        tf.add(skipme, arcname="notes.txt")
    return tar_path


class TestTar:
    def test_plain_tar_pattern_and_recursion(self, spark, tmp_path):
        tar_path = _make_tar(str(tmp_path), "bundle.tar")
        tables = read_tables(
            spark,
            tar_path,
            options={
                "pattern": r"\.csv$",
                "unzip_path": str(tmp_path / "out"),
                "inner_format": "csv",
            },
        )
        # two csv members (nested dirs preserved), txt skipped
        assert len(tables) == 2
        total = sum(df.count() for _, df in tables)
        assert total == 5  # 3 + 2 rows including headers

    def test_duplicate_basenames_do_not_overwrite(self, spark, tmp_path):
        import tarfile as tarmod

        a = tmp_path / "a.csv"
        b = tmp_path / "b.csv"
        a.write_text("x\n1\n")
        b.write_text("x\n2\n3\n")
        tar_path = tmp_path / "shards.tar"
        with tarmod.open(tar_path, "w") as tf:
            tf.add(a, arcname="part-0/data.csv")
            tf.add(b, arcname="part-1/data.csv")
        tables = read_tables(
            spark,
            str(tar_path),
            options={
                "unzip_path": str(tmp_path / "out3"),
                "inner_format": "csv",
            },
        )
        assert len(tables) == 2
        # both shards survive: 2 + 3 rows (incl. headers)
        assert sum(df.count() for _, df in tables) == 5

    def test_tar_gz_via_explicit_format(self, spark, tmp_path):
        tar_path = _make_tar(str(tmp_path), "bundle.tar.gz", compression="gz")
        tables = read_tables(
            spark,
            tar_path,
            fmt="tar",  # .tar.gz outer extension is 'gz'; callers pass fmt
            options={
                "pattern": r"a\.csv$",
                "unzip_path": str(tmp_path / "out2"),
                "inner_format": "csv",
            },
        )
        assert len(tables) == 1
        assert tables[0][1].count() == 3


class TestGzipCsv:
    def test_spark_reads_csv_gz_transparently(self, spark, tmp_path):
        # single-file gzip needs no expansion: Spark's text/csv readers
        # decompress .gz at scan time (non-splittable -> one task per
        # file, which is why archives of many small files beat one giant
        # .gz at cluster scale)
        p = tmp_path / "data.csv.gz"
        with gzip.open(p, "wt") as f:
            f.write("x,y\n1,2\n3,4\n")
        tables = read_tables(spark, str(p), fmt="csv", options={})
        assert len(tables) == 1
        df = tables[0][1]
        assert df.count() == 3  # header + 2 data rows in the cells contract


class TestTraversalGuard:
    def test_dotdot_prefixed_name_is_extracted(self, spark, tmp_path):
        # '..data.csv' is a legal (odd) filename, not a traversal
        import tarfile as tarmod

        src = tmp_path / "x.csv"
        src.write_text("a\n1\n")
        tar_path = tmp_path / "odd.tar"
        with tarmod.open(tar_path, "w") as tf:
            tf.add(src, arcname="..data.csv")
        tables = read_tables(
            spark,
            str(tar_path),
            options={"unzip_path": str(tmp_path / "o"), "inner_format": "csv"},
        )
        assert len(tables) == 1 and tables[0][1].count() == 2

    def test_hidden_member_unhide_is_injective(self, spark, tmp_path):
        # '.data.csv', '_data.csv' and '__data.csv' in ONE directory must
        # extract to three DISTINCT files — the old lstrip('._') rename
        # collapsed them all to 'unhidden_data.csv' and silently kept only
        # the last member.
        import tarfile as tarmod

        tar_path = tmp_path / "hidden.tar"
        with tarmod.open(tar_path, "w") as tf:
            for i, arc in enumerate((".data.csv", "_data.csv", "__data.csv")):
                src = tmp_path / f"h{i}.csv"
                src.write_text(f"a\n{i}\n")
                tf.add(src, arcname=arc)
        tables = read_tables(
            spark,
            str(tar_path),
            options={"unzip_path": str(tmp_path / "h"), "inner_format": "csv"},
        )
        assert len(tables) == 3
        vals = sorted(
            t[1].filter("row_index = 1").collect()[0]["cells"][0] for t in tables
        )
        assert vals == ["0", "1", "2"]
        # none of the extracted basenames is dot/underscore-prefixed
        # (Hadoop would skip it) and all are distinct
        names = os.listdir(tmp_path / "h")
        assert len(set(names)) == 3
        assert not any(n.startswith((".", "_")) for n in names)

    def test_real_traversal_member_is_skipped(self, spark, tmp_path):
        import io
        import tarfile as tarmod

        tar_path = tmp_path / "evil.tar"
        with tarmod.open(tar_path, "w") as tf:
            info = tarmod.TarInfo(name="../../escape.csv")
            payload = b"x\n9\n"
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
        tables = read_tables(
            spark,
            str(tar_path),
            options={"unzip_path": str(tmp_path / "jail"), "inner_format": "csv"},
        )
        assert tables == []
        assert not (tmp_path.parent / "escape.csv").exists()
