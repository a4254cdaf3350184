"""Progress-notifier observation + UTF-8 coercion parity tests."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from ndr_import_spark import Engine
from ndr_import_spark.plans.model import UTF8CoercionError
from ndr_import_spark.progress import ProgressNotifier, notify, observe_records

MAPPING_YAML = """
klass: Patient
header_lines: 1
columns:
- column: nhs_no
  mappings:
  - field: nhsnumber
    clean: :nhsnumber
- column: name
  mappings:
  - field: name
"""


class TestProgress:
    def test_observed_counts_fire_callbacks(self, spark):
        tmp = tempfile.mkdtemp()
        try:
            with open(f"{tmp}/p.csv", "w") as f:
                f.write("nhs_no,name\n111,ann\n555,bob\n")
            records = Engine(spark).run(MAPPING_YAML, f"{tmp}/p.csv", fmt="csv")["table"]
            observed, obs = observe_records(records)
            notifier = ProgressNotifier()
            notifier.started()
            observed.count()  # the caller's own action materialises metrics
            metrics = notify(obs, notifier)
            assert metrics["n_records"] == 2
            assert metrics["n_errors"] == 0
            assert notifier.events == [("started",), ("processed", 2), ("finished",)]
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestUtf8Coercion:
    NONTAB_YAML = """
klass: T
start_line_pattern: '^-+$'
start_in_a_record: true
end_in_a_record: true
columns:
- column: one
  non_tabular_cell:
    lines: 0
    capture: '^(.*)$'
"""

    def _run(self, spark, tmp, payload: bytes):
        from ndr_import_spark.operators.nontabular import tabulate_non_tabular
        from ndr_import_spark.plans.yaml_loader import load_mapping
        from ndr_import_spark.sources.registry import read_tables

        with open(f"{tmp}/f.txt", "wb") as f:
            f.write(payload)
        [(_, lines)] = read_tables(spark, f"{tmp}/f.txt", "txt", {})
        mapping = load_mapping(self.NONTAB_YAML)
        return tabulate_non_tabular(lines, mapping, strict=True).collect()

    def test_coercible_bytes_pass(self, spark):
        """0xBE is a valid windows-1252 char — coerced, no error
        (reference test/non_tabular/table_test.rb:472-513)."""
        tmp = tempfile.mkdtemp()
        try:
            rows = self._run(spark, tmp, b"caf\xbe line\n------\n")
            assert len(rows) >= 1
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_uncoercible_bytes_raise(self, spark):
        """0x8D is undefined in windows-1252 — raises UTF8CoercionError
        (reference :515-545)."""
        tmp = tempfile.mkdtemp()
        try:
            with pytest.raises(UTF8CoercionError):
                self._run(spark, tmp, b"junk\x8d line\n------\n")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
