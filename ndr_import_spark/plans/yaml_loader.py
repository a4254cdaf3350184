"""YAML mapping loader with Ruby-tag compatibility shims.

The reference serialises mappings as YAML with Ruby object tags
(``!ruby/object:NdrImport::Table``, ``!ruby/regexp``, ``!ruby/range``,
``!ruby/object:RegexpRange`` — see reference ``test/test_helper.rb:46-50`` and
``lib/ndr_import/table.rb:117-124``). This loader accepts those documents and
plain-dict YAML, producing :class:`TableMapping` plans.

Ruby regexp literals (``/.../i``) are converted to Python pattern strings with
inline flags; Spark-side consumers receive plain Java-compatible pattern
strings.
"""

from __future__ import annotations

import re
from typing import Any

import yaml

from ndr_import_spark.plans.model import (
    ColumnMapping,
    RegexpRange,
    TableMapping,
)

_RUBY_CLASS_KINDS = {
    "NdrImport::Table": "tabular",
    "NdrImport::FixedWidth::Table": "fixed_width",
    "NdrImport::NonTabular::Table": "non_tabular",
    "NdrImport::Xml::Table": "xml",
    "NdrImport::PdfForm::Table": "acroform",
    "NdrImport::Avro::Table": "avro",
    "NdrImport::Vcf::Table": "vcf",
}


def python_re(pattern: str) -> str:
    """Translate Java/Ruby-only anchors for driver-side `re` use (`\\z` end-
    of-string is `\\Z` in Python). Spark-side `rlike` consumes the pattern
    unchanged (Java supports both)."""
    return str(pattern).replace("\\z", "\\Z")


class RubyRegexp(str):
    """A regex loaded from ``!ruby/regexp /.../flags`` — behaves as its pattern
    string (with inline flags) but remembers it was declared as a regexp, which
    matters for regexp-column concretisation (table.rb:84-90)."""

    is_regexp = True


def _parse_ruby_regexp(text: str) -> RubyRegexp:
    m = re.fullmatch(r"/(.*)/([a-z]*)", text, flags=re.S)
    if not m:
        return RubyRegexp(text)
    pattern, flags = m.groups()
    inline = ""
    if "i" in flags:
        inline += "i"
    if "m" in flags:
        inline += "s"  # Ruby /m = dot-matches-newline = Python/Java DOTALL 's'
    if "x" in flags:
        inline += "x"
    return RubyRegexp(f"(?{inline})" + pattern if inline else pattern)


class _MappingLoader(yaml.SafeLoader):
    pass


def _ruby_regexp_constructor(loader: yaml.Loader, node: yaml.Node) -> RubyRegexp:
    return _parse_ruby_regexp(loader.construct_scalar(node))


def _ruby_range_constructor(loader: yaml.Loader, node: yaml.Node) -> range:
    d = loader.construct_mapping(node)
    begin, end = int(d["begin"]), int(d["end"])
    excl = bool(d.get("excl", False))
    return range(begin, end if excl else end + 1)


def _regexp_range_constructor(loader: yaml.Loader, node: yaml.Node) -> RegexpRange:
    d = loader.construct_mapping(node, deep=True)
    return RegexpRange(begin=d.get("begin"), end=d.get("end"), excl=bool(d.get("excl", False)))


def _hoist_non_tabular_row(d: dict) -> dict:
    """`non_tabular_row:` legacy variant (non_tabular/mapping.rb:7-35):
    the NON_TABULAR_OPTIONS live nested under that key instead of at table
    level. Hoist them; a missing/None value or a nested dict without a
    start_line_pattern raises (mapping.rb:14-20 + table.rb mandatory
    start_line_pattern, pinned by test/non_tabular/mapping_test.rb)."""
    from ndr_import_spark.plans.model import NON_TABULAR_OPTIONS, MappingError

    nested = d.pop("non_tabular_row", None)
    if not isinstance(nested, dict):
        raise MappingError("Mapping is missing a non_tabular_row")
    for key in NON_TABULAR_OPTIONS:
        if nested.get(key) is not None:
            d[key] = nested[key]
    return d


def _ruby_object_constructor(loader: yaml.Loader, tag_suffix: str, node: yaml.Node) -> Any:
    d = loader.construct_mapping(node, deep=True)
    if tag_suffix == "RegexpRange":
        return RegexpRange(begin=d.get("begin"), end=d.get("end"), excl=bool(d.get("excl", False)))
    if tag_suffix == "NdrImport::NonTabular::Mapping":
        return TableMapping.from_dict(_hoist_non_tabular_row(d), kind="non_tabular")
    kind = _RUBY_CLASS_KINDS.get(tag_suffix)
    if kind is not None:
        return TableMapping.from_dict(d, kind=kind)
    return d


def _ruby_symbol_constructor(loader: yaml.Loader, node: yaml.Node) -> str:
    return loader.construct_scalar(node).lstrip(":")


_MappingLoader.add_constructor("!ruby/regexp", _ruby_regexp_constructor)
_MappingLoader.add_constructor("!ruby/range", _ruby_range_constructor)
_MappingLoader.add_constructor("!ruby/sym", _ruby_symbol_constructor)
_MappingLoader.add_constructor("!ruby/symbol", _ruby_symbol_constructor)
_MappingLoader.add_multi_constructor("!ruby/object:", _ruby_object_constructor)
# `!regexp_range` convenience tag for non-Ruby-authored YAML:
_MappingLoader.add_constructor("!regexp_range", _regexp_range_constructor)


def _kind_for_dict(d: dict) -> str:
    """Infer mapping kind for untagged plain-dict YAML."""
    explicit = d.pop("type", None)
    if explicit:
        return str(explicit)
    if "non_tabular_row" in d:
        _hoist_non_tabular_row(d)
        return "non_tabular"
    if d.get("start_line_pattern") or d.get("format") in ("nontabular", "non_tabular"):
        return "non_tabular"
    if d.get("xml_record_xpath") or d.get("format") == "xml_table":
        return "xml"
    if d.get("format") == "acroform":
        return "acroform"
    if d.get("format") == "avro":
        return "avro"
    if d.get("format") == "vcf":
        return "vcf"
    if any(c.get("unpack_pattern") for c in (d.get("columns") or []) if isinstance(c, dict)):
        return "fixed_width"
    return "tabular"


def load_mapping(text_or_obj: str | dict) -> TableMapping:
    """Load one table mapping from YAML text (or an already-parsed dict)."""
    obj = (
        yaml.load(text_or_obj, Loader=_MappingLoader)
        if isinstance(text_or_obj, str)
        else text_or_obj
    )
    if isinstance(obj, TableMapping):
        return obj
    if isinstance(obj, dict):
        d = dict(obj)
        return TableMapping.from_dict(d, kind=_kind_for_dict(d))
    raise TypeError(f"Cannot load mapping from {type(obj).__name__}")


def load_mappings(text: str) -> list[TableMapping]:
    """Load a list of table mappings (the UniversalImporter YAML shape)."""
    obj = yaml.load(text, Loader=_MappingLoader)
    if isinstance(obj, TableMapping):
        return [obj]
    if isinstance(obj, dict):
        d = dict(obj)
        return [TableMapping.from_dict(d, kind=_kind_for_dict(d))]
    out = []
    for item in obj or []:
        out.append(item if isinstance(item, TableMapping) else load_mapping(item))
    return out


def load_column_mappings(text: str) -> list[ColumnMapping]:
    """Load a bare list of column mappings (mapper_test.rb style fixtures)."""
    obj = yaml.load(text, Loader=_MappingLoader)
    return [ColumnMapping.from_dict(c) for c in (obj or [])]


def dump_mapping(mapping: TableMapping) -> str:
    """Serialise options-then-columns, mirroring table.rb:117-124."""
    out: dict[str, Any] = {}
    for key in (
        "canonical_name", "delimiter", "liberal_parsing", "filename_pattern",
        "file_password", "last_data_column", "tablename_pattern", "header_lines",
        "footer_lines", "format", "klass", "slurp", "row_identifier",
        "significant_mapped_fields", "start_line_pattern", "end_line_pattern",
        "xml_record_xpath",
    ):
        value = getattr(mapping, key, None)
        if value:
            out[key] = value
    out["columns"] = [c.raw for c in mapping.columns]
    return yaml.safe_dump(out, sort_keys=False)
