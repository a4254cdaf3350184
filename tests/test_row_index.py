"""attach_row_index invariant: dense 0-based per-file index in scan order,
across multiple files and multiple partitions (the foundation every
order-dependent operator builds on)."""

from __future__ import annotations

import shutil
import tempfile

from ndr_import_spark.sources.registry import read_tables


class TestRowIndexDensity:
    def test_dense_per_file_multi_partition(self, spark):
        tmp = tempfile.mkdtemp()
        try:
            # two files big enough for several input splits at default conf
            for fname, n in [("a.txt", 5000), ("b.txt", 3000)]:
                with open(f"{tmp}/{fname}", "w") as f:
                    for i in range(n):
                        f.write(f"{fname}:{i}\n")
            [(_, df)] = read_tables(spark, f"{tmp}/*.txt", "txt", {})
            rows = df.collect()
            by_file: dict[str, list] = {}
            for r in rows:
                by_file.setdefault(r.source_file.rsplit("/", 1)[-1], []).append(r)
            assert set(by_file) == {"a.txt", "b.txt"}
            for fname, frows in by_file.items():
                idxs = sorted(r.row_index for r in frows)
                n = {"a.txt": 5000, "b.txt": 3000}[fname]
                assert idxs == list(range(n)), f"{fname} index not dense"
                # scan order == file order: row_index i holds line i
                for r in frows:
                    assert r.value == f"{fname}:{r.row_index}"
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
