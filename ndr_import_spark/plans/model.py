"""Logical-plan model: table mappings, column mappings, field mappings.

Mirrors the declarative mapping surface of the reference
(``lib/ndr_import/table.rb:13-17`` valid options; column/field mapping keys
``lib/ndr_import/mapper.rb:14-36``; variant option sets
``lib/ndr_import/non_tabular/table.rb:19-28``, ``lib/ndr_import/xml/table.rb:13-18``,
``lib/ndr_import/avro/table.rb:20-30``, ``lib/ndr_import/vcf/table.rb:8-18``,
``lib/ndr_import/pdf_form/table.rb:10-24``, ``lib/ndr_import/fixed_width/table.rb``).

These dataclasses are the engine's IR: YAML loads into them, validation happens
here at plan time (mirroring reference fail-fast behaviour), and the operator
compiler turns them into Spark Column expression DAGs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Any


def _python_re(pattern) -> str:
    """`\\z` end-of-string anchor is `\\Z` in Python re (Java keeps \\z)."""
    return str(pattern).replace("\\z", "\\Z")


class MappingError(ValueError):
    """Invalid mapping declaration (reference: NdrImport::MappingError)."""


class MissingFieldError(ValueError):
    """Mandatory field blank (reference: NdrImport::MissingFieldError).

    Message parity: ``"#{field} can't be blank"`` (mapper.rb:258-270).
    """

    def __init__(self, field_name: str):
        super().__init__(f"{field_name} can't be blank")
        self.field_name = field_name


class UTF8CoercionError(ValueError):
    """reference: NdrImport::NonTabular::Table UTF8 coercion failure
    (non_tabular/table.rb:75-82) — junk bytes survive every encoding
    fallback."""


class UnmappedDataError(ValueError):
    """Unmapped hash-row key (reference: NdrImport::UnmappedDataError)."""


@dataclass
class RegexpRange:
    """A line-range whose endpoints are regexes resolved per record.

    Reference: ``ndr_support`` RegexpRange used by non-tabular column mappings
    (``lib/ndr_import/non_tabular/column_mapping.rb``); YAML tag
    ``!ruby/object:RegexpRange``.
    """

    begin: Any  # int | str(regex)
    end: Any    # int | str(regex)
    excl: bool = False


# --- Field mapping ----------------------------------------------------------

FIELD_MAPPING_KEYS = {
    "field", "replace", "format", "clean", "map", "match", "daysafter",
    "join", "order", "priority", "zip_order", "split_char", "compact",
    "validates", "unpack_pattern",
}


@dataclass
class FieldMapping:
    """One output-field rule inside a column mapping (mapper.rb micro-DSL)."""

    field: str | None = None
    replace: list[dict] | dict | None = None   # pattern -> replacement (gsub)
    format: str | None = None                  # date format e.g. 'dd/mm/yyyy'
    clean: list[str] | str | None = None       # cleaner chain e.g. [:code, :upcase]
    map: dict | None = None                    # dict lookup w/ fall-through
    match: str | None = None                   # regex, capture group 1
    daysafter: Any = None                      # epoch date (str/date)
    join: str | None = None                    # join char for order-ed fields
    order: int | None = None                   # 1-based join slot
    priority: int | None = None                # cross-population slot
    zip_order: int | None = None               # 1-based zip slot
    split_char: str | None = None              # split char/regex for zip
    compact: bool | None = None                # drop blanks before join
    validates: dict | None = None              # {'presence': True}
    raw: dict = dc_field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "FieldMapping":
        clean = d.get("clean")
        if clean is not None and not isinstance(clean, list):
            clean = [clean]
        if clean is not None:
            clean = [str(c).lstrip(":") for c in clean]
        return cls(
            field=d.get("field"),
            replace=d.get("replace"),
            format=d.get("format"),
            clean=clean,
            map=d.get("map"),
            match=d.get("match"),
            daysafter=d.get("daysafter"),
            join=d.get("join"),
            order=d.get("order"),
            priority=d.get("priority"),
            zip_order=d.get("zip_order"),
            split_char=d.get("split_char"),
            compact=d.get("compact"),
            validates=d.get("validates"),
            raw=dict(d),
        )

    def replaces(self) -> list[dict]:
        """Normalise ``replace`` to a list of {pattern: replacement} dicts."""
        if self.replace is None:
            return []
        if isinstance(self.replace, list):
            return self.replace
        return [self.replace]


# --- Column mapping ---------------------------------------------------------

COLUMN_MAPPING_KEYS = {
    "column", "standard_mapping", "rawtext_name", "klass", "mappings",
    "do_not_capture", "decode", "map_columname_to", "unpack_pattern",
    "xml_cell", "lines", "capture", "join", "preserve_blank_lines",
}


@dataclass
class ColumnMapping:
    """One input-column rule (positional for tabular; named for hash rows)."""

    column: Any = None                 # str | compiled-regex | None
    standard_mapping: str | None = None
    rawtext_name: str | None = None
    klass: list[str] | str | None = None
    mappings: list[FieldMapping] = dc_field(default_factory=list)
    do_not_capture: bool = False
    decode: list[str] | None = None
    map_columname_to: str | None = None
    unpack_pattern: str | None = None  # fixed-width, e.g. 'a9'
    # non-tabular tabulation options:
    lines: Any = None                  # int | range | RegexpRange
    capture: Any = None                # regex | list[regex]
    join: str | None = None
    preserve_blank_lines: bool = False
    # XML options:
    xml_cell: dict | None = None
    raw: dict = dc_field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnMapping":
        decode = d.get("decode")
        if decode is not None:
            decode = [str(x).lstrip(":") for x in (decode if isinstance(decode, list) else [decode])]
        # non-tabular cell options live under `non_tabular_cell`
        # (non_tabular/column_mapping.rb:12-22)
        ntc = d.get("non_tabular_cell") or {}
        return cls(
            column=d.get("column"),
            standard_mapping=d.get("standard_mapping"),
            rawtext_name=d.get("rawtext_name"),
            klass=d.get("klass"),
            mappings=[FieldMapping.from_dict(m) for m in (d.get("mappings") or [])],
            do_not_capture=bool(d.get("do_not_capture", False)),
            decode=decode,
            map_columname_to=d.get("map_columname_to"),
            unpack_pattern=d.get("unpack_pattern"),
            lines=ntc.get("lines", d.get("lines")),
            capture=ntc.get("capture", d.get("capture")),
            join=ntc.get("join", d.get("join")),
            preserve_blank_lines=bool(ntc.get("preserve_blank_lines", d.get("preserve_blank_lines", False))),
            xml_cell=d.get("xml_cell"),
            raw=dict(d),
        )

    def klasses(self) -> list[str]:
        if self.klass is None:
            return []
        if isinstance(self.klass, list):
            # klass may be a nested list in YAML; flatten (table.rb:160)
            out: list[str] = []
            for k in self.klass:
                out.extend(k if isinstance(k, list) else [k])
            return out
        return [self.klass]

    def rawtext_column_name(self) -> str | None:
        """rawtext key: ``(rawtext_name || column).downcase`` (mapper.rb:107)."""
        name = self.rawtext_name or (self.column if isinstance(self.column, str) else None)
        return name.lower() if isinstance(name, str) else None


# --- Table mapping ----------------------------------------------------------

# Reference: Table.all_valid_options (table.rb:13-17) + variant extras.
ALL_VALID_OPTIONS = {
    "canonical_name", "delimiter", "liberal_parsing", "filename_pattern",
    "file_password", "last_data_column", "tablename_pattern", "header_lines",
    "footer_lines", "format", "klass", "columns", "slurp", "row_identifier",
    "significant_mapped_fields",
}
NON_TABULAR_OPTIONS = {
    "start_line_pattern", "end_line_pattern", "capture_start_line",
    "capture_end_line", "start_in_a_record", "end_in_a_record", "remove_lines",
}
XML_OPTIONS = {
    "xml_record_xpath", "pattern_match_record_xpath", "xml_file_metadata",
    "yield_xml_record",
}


@dataclass
class TableMapping:
    """A full table mapping — the engine's logical plan for one table.

    ``kind`` selects the tabulation strategy: 'tabular' (default),
    'fixed_width', 'non_tabular', 'xml', 'acroform', 'avro', 'vcf'.
    """

    columns: list[ColumnMapping] = dc_field(default_factory=list)
    klass: str | None = None
    canonical_name: str | None = None
    filename_pattern: str | None = None
    tablename_pattern: str | None = None
    header_lines: int = 0
    footer_lines: int = 0
    format: str | None = None
    delimiter: str | None = None
    liberal_parsing: bool = False
    file_password: str | None = None
    last_data_column: Any = None       # int | 'AE'-style excel letters
    row_identifier: str | None = None  # 'index' | 'uuid'
    slurp: bool = False
    significant_mapped_fields: list[str] | None = None
    kind: str = "tabular"
    # non-tabular options:
    start_line_pattern: str | None = None
    end_line_pattern: str | None = None
    capture_start_line: bool = False
    capture_end_line: bool = False
    start_in_a_record: bool = False
    end_in_a_record: bool = False
    remove_lines: dict | None = None
    # xml options:
    xml_record_xpath: str | None = None
    pattern_match_record_xpath: bool = False
    xml_file_metadata: dict | None = None
    # assigned by the engine after per-file metadata xpath evaluation
    # (universal_importer_helper parity: 'should assign metadata to table')
    table_metadata: dict | None = None
    yield_xml_record: bool = False
    raw: dict = dc_field(default_factory=dict)

    # -- construction --------------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict, kind: str = "tabular") -> "TableMapping":
        valid = set(ALL_VALID_OPTIONS)
        if kind == "non_tabular":
            valid |= NON_TABULAR_OPTIONS
        if kind == "xml":
            valid |= XML_OPTIONS
        unknown = set(d.keys()) - valid
        if unknown:
            # parity: table.rb:193-198
            raise MappingError(f"Unrecognised options: {sorted(unknown)!r}")
        t = cls(
            columns=[ColumnMapping.from_dict(c) for c in (d.get("columns") or [])],
            klass=d.get("klass"),
            canonical_name=d.get("canonical_name"),
            filename_pattern=d.get("filename_pattern"),
            tablename_pattern=d.get("tablename_pattern"),
            header_lines=int(d.get("header_lines") or 0),
            footer_lines=int(d.get("footer_lines") or 0),
            format=d.get("format"),
            delimiter=d.get("delimiter"),
            liberal_parsing=bool(d.get("liberal_parsing", False)),
            file_password=d.get("file_password"),
            last_data_column=d.get("last_data_column"),
            row_identifier=d.get("row_identifier"),
            slurp=bool(d.get("slurp", False)),
            significant_mapped_fields=d.get("significant_mapped_fields"),
            kind=kind,
            start_line_pattern=d.get("start_line_pattern"),
            end_line_pattern=d.get("end_line_pattern"),
            capture_start_line=bool(d.get("capture_start_line", False)),
            capture_end_line=bool(d.get("capture_end_line", False)),
            start_in_a_record=bool(d.get("start_in_a_record", False)),
            end_in_a_record=bool(d.get("end_in_a_record", False)),
            remove_lines=d.get("remove_lines"),
            xml_record_xpath=d.get("xml_record_xpath"),
            pattern_match_record_xpath=bool(d.get("pattern_match_record_xpath", False)),
            xml_file_metadata=d.get("xml_file_metadata"),
            yield_xml_record=bool(d.get("yield_xml_record", False)),
            raw=dict(d),
        )
        t.validate()
        return t

    # -- validation (plan-compile-time fail-fast, reference parity) ----------

    def validate(self) -> None:
        self._validate_klasses()
        self._validate_priorities()
        if self.kind == "non_tabular" and not self.start_line_pattern:
            # parity: non_tabular/table.rb mandatory start_line_pattern
            raise MappingError("Mapping is missing a start_line_pattern")
        if self.row_identifier not in (None, "index", "uuid"):
            raise MappingError(f"Unknown row_identifier: {self.row_identifier!r}")

    def _validate_klasses(self) -> None:
        """Every captured column needs a klass unless table-level klass set
        (table.rb:169-179)."""
        if self.klass is not None:
            return
        klassless = [
            (c.column if isinstance(c.column, str) else None) or c.standard_mapping
            for c in self.columns
            if not c.do_not_capture and not c.klasses()
        ]
        if klassless:
            raise MappingError(f"Missing klass for column(s): {', '.join(str(k) for k in klassless)}")

    def _validate_priorities(self) -> None:
        """Duplicate explicit priorities on one field raise (mapper.rb:244-253)."""
        priority: dict[str, int] = {}
        for col in self.columns:
            for fm in col.mappings:
                if fm.field is None:
                    continue
                if fm.priority is not None:
                    if priority.get(fm.field) == fm.priority:
                        raise MappingError("Cannot have duplicate priorities")
                    if fm.priority < 1:
                        raise MappingError("priority must be >= 1")
                    priority[fm.field] = fm.priority
                else:
                    priority[fm.field] = 1

    # -- helpers -------------------------------------------------------------

    def matches(self, filename: str, tablename: str | None = None) -> bool:
        """File/table routing (table.rb:39-42)."""
        import os
        base = os.path.basename(filename)
        if self.filename_pattern and not re.search(_python_re(self.filename_pattern), base):
            return False
        if tablename is not None and self.tablename_pattern:
            return re.search(_python_re(self.tablename_pattern), tablename) is not None
        return True

    def all_klasses(self) -> list[str]:
        if self.klass is not None:
            return [self.klass]
        seen: list[str] = []
        for c in self.columns:
            for k in c.klasses():
                if k not in seen:
                    seen.append(k)
        return seen

    def masked_mappings(self) -> dict[str, list[ColumnMapping]]:
        """Klass → masked column list (table.rb:143-191).

        Table-level klass ⇒ whole mapping under that klass; else one masked
        copy per klass with other-klass columns turned into do_not_capture.
        """
        if self.klass is not None:
            return {self.klass: self.columns}
        out: dict[str, list[ColumnMapping]] = {}
        for k in self.all_klasses():
            out[k] = [
                c if k in c.klasses() else ColumnMapping(do_not_capture=True)
                for c in self.columns
            ]
        return out

    def last_column_index(self) -> int | None:
        """``last_data_column`` → 0-based inclusive index (table.rb:244-262)."""
        ldc = self.last_data_column
        if ldc is None:
            return None
        if isinstance(ldc, int):
            return ldc - 1
        if isinstance(ldc, str) and re.fullmatch(r"[A-Za-z]+", ldc):
            idx = 0
            for ch in ldc.upper():
                idx = idx * 26 + (ord(ch) - ord("A") + 1)
            return idx - 1
        raise MappingError(
            f"Unknown 'last_data_column' format: {ldc} ({type(ldc).__name__})"
        )

    def expected_header(self) -> list[str | None]:
        """Downcased declared column names (table.rb:203-241)."""
        out = []
        for c in self.columns:
            name = c.column if isinstance(c.column, str) else None
            name = name or c.standard_mapping
            out.append(name.lower() if isinstance(name, str) else None)
        return out
