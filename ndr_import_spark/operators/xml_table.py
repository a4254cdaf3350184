"""XML table operator — xpath cells over Spark's native XML structs.

Reference: lib/ndr_import/xml/table.rb. Each record element yields one
cells-array in declared-xpath order; a cell is the xpath's inner text, or
'' when the xpath matches more than once (xml/table.rb:89-95). Unmapped
populated leaves raise UnmappedXpathError (xml/table.rb:148-153).

Spark-first shape: `spark.read.format('xml')` parses records into nested
structs (attributes prefixed `_`, element text in `_VALUE`); declared
xpaths compile to struct-field navigation expressions — no per-row xpath
evaluation, full codegen. Unmapped-leaf validation becomes a schema walk +
a single aggregate checking populated-ness of undeclared leaves.

Repeating-section augmentation (`_N.M`-suffixed columns + `klass#N`
fan-out, xml/table.rb:58-106) is the known-hard piece (SURVEY §7): single
occurrences of repeatable (array-typed) sections work; true multi-occurrence
augmentation is a later-round feature and currently reports '' for
multi-match cells, with validation flagging the unmapped repeats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ndr_import_spark.operators import compiler
from ndr_import_spark.plans.model import ColumnMapping, TableMapping


class UnmappedXpathError(ValueError):
    """reference: NdrImport::Xml::UnmappedXpathError"""


def build_xpath(cm: ColumnMapping) -> str:
    """relative_path/column/@attribute composition (xml/table.rb:191-210)."""
    name = cm.column if isinstance(cm.column, str) else cm.standard_mapping
    cell = cm.xml_cell or {}
    rel = cell.get("relative_path") or None
    attr = cell.get("attribute") or None
    parts = []
    if rel:
        parts.append(rel.strip("/"))
    parts.append(name)
    if attr:
        parts.append("@" + attr)
    return "/".join(parts)


def _struct_field(dtype: T.DataType, name: str) -> T.StructField | None:
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            if f.name == name:
                return f
    return None


def _extract(col: Column, dtype: T.DataType, comps: list[str]) -> Column:
    """Navigate struct/array nesting along xpath components → string cell.

    Arrays (repeatable sections): size 1 → continue into the element;
    size > 1 → '' (multi-match, xml/table.rb:93); size 0/null → NULL.
    """
    if isinstance(dtype, T.ArrayType):
        single = _extract(F.element_at(col, 1), dtype.elementType, comps)
        return (
            F.when(F.size(col) > 1, F.lit(""))
            .when(F.size(col) == 1, single)
        )
    if not comps:
        if isinstance(dtype, T.StructType):
            f = _struct_field(dtype, "_VALUE")
            if f is not None:
                return _extract(col.getField("_VALUE"), f.dataType, [])
            return F.lit(None).cast("string")
        return col.cast("string")
    head, *rest = comps
    if head.startswith("@"):
        fname = "_" + head[1:]
        f = _struct_field(dtype, fname)
        if f is None:
            return F.lit(None).cast("string")
        return _extract(col.getField(fname), f.dataType, rest)
    f = _struct_field(dtype, head)
    if f is None:
        return F.lit(None).cast("string")
    return _extract(col.getField(head), f.dataType, rest)


def _leaf_xpaths(dtype: T.DataType, prefix: str = "") -> list[str]:
    """Enumerate the schema's mappable leaf xpaths (elements without child
    elements, attributes as /@name), mirroring mappable_xpaths_from."""
    out: list[str] = []
    if isinstance(dtype, T.ArrayType):
        return _leaf_xpaths(dtype.elementType, prefix)
    if isinstance(dtype, T.StructType):
        attrs = [f for f in dtype.fields if f.name.startswith("_") and f.name != "_VALUE"]
        elements = [f for f in dtype.fields if not f.name.startswith("_")]
        for f in attrs:
            path = f"{prefix}/@{f.name[1:]}" if prefix else f"@{f.name[1:]}"
            out.append(path)
        has_value = any(f.name == "_VALUE" for f in dtype.fields)
        if has_value and prefix and not attrs:
            out.append(prefix)
        for f in elements:
            sub = f"{prefix}/{f.name}" if prefix else f.name
            child = _leaf_xpaths(f.dataType, sub)
            out.extend(child)
        if not elements and not attrs and not has_value and prefix:
            out.append(prefix)
        return out
    return [prefix] if prefix else []


def _record_struct(df: DataFrame) -> tuple[Column, T.StructType]:
    meta = {"source_file", "row_index", "_pid", "_mid"}
    fields = [f for f in df.schema.fields if f.name not in meta]
    struct = F.struct(*[F.col(f.name) for f in fields])
    return struct, T.StructType(fields)


def validate_xpaths(df: DataFrame, mapping: TableMapping) -> None:
    """Every populated leaf must be declared (xml/table.rb:148-153).

    Schema leaves not declared are checked for populated-ness with ONE
    aggregate over the data (reference walks every record's DOM)."""
    record, schema = _record_struct(df)
    declared = {build_xpath(c) for c in mapping.columns}
    candidates = [p for p in _leaf_xpaths(schema) if p not in declared]
    if not candidates:
        return
    aggs = []
    for i, path in enumerate(candidates):
        comps = path.replace("/@", "/@").split("/")
        cell = _extract(record, schema, comps)
        aggs.append(F.max(F.trim(F.coalesce(cell, F.lit(""))) != "").alias(f"p{i}"))
    row = df.agg(*aggs).collect()[0]
    populated = [candidates[i] for i in range(len(candidates)) if row[f"p{i}"]]
    if populated:
        raise UnmappedXpathError(", ".join(sorted(populated)))


def group_records_per_element(records: DataFrame) -> DataFrame:
    """`yield_xml_record` parity (xml/table.rb:47-53): all records produced
    from one XML element grouped into a single row holding an array of
    (klass, fields, rawtext) structs."""
    collected = F.collect_list(
        F.struct(F.col("klass"), F.col("fields"), F.col("rawtext"))
    )
    # sort_array cannot order structs containing maps; compare on klass
    ordered = F.array_sort(
        collected,
        lambda a, b: F.when(a["klass"] < b["klass"], -1)
        .when(a["klass"] > b["klass"], 1)
        .otherwise(0),
    )
    return records.groupBy("source_file", "row_index").agg(ordered.alias("records"))


def transform_xml_table(df: DataFrame, mapping: TableMapping, strict: bool = True) -> DataFrame:
    """XML records DataFrame → standard records (klass, fields, rawtext...)."""
    if strict:
        validate_xpaths(df, mapping)
    record, schema = _record_struct(df)
    cells = [
        F.coalesce(
            _extract(record, schema, build_xpath(cm).split("/")), F.lit(None).cast("string")
        )
        for cm in mapping.columns
    ]
    cells_df = df.select(
        "source_file", "row_index", F.array(*cells).alias("cells")
    )
    return compiler.compile_records(mapping, cells_df, strict=strict)
