"""Fixed-width tabulation (reference: lib/ndr_import/fixed_width/table.rb +
mapper.rb#fixed_width_columns).

Each column mapping carries an `unpack_pattern` (Ruby String#unpack token:
``a9`` raw 9 chars, ``A9`` 9 chars trailing-space/null-stripped, ``a*``/``A*``
rest-of-line). The concatenated pattern is applied to the raw line; here it
compiles to per-column `substring` expressions — pure Catalyst, no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ndr_import_spark.plans.model import MappingError, TableMapping

_TOKEN_RE = re.compile(r"([aA])(\*|\d+)")


def _parse_pattern(pattern: str) -> tuple[str, int | None]:
    m = _TOKEN_RE.fullmatch(pattern.strip())
    if not m:
        raise MappingError(f"Unsupported unpack_pattern: {pattern!r}")
    kind, width = m.groups()
    return kind, (None if width == "*" else int(width))


def cells_from_fixed_width(line: Column, mapping: TableMapping) -> Column:
    """line string → array<string> cells per the columns' unpack patterns."""
    exprs: list[Column] = []
    pos = 1  # substring is 1-based
    for cm in mapping.columns:
        pattern = cm.unpack_pattern
        if pattern is None:
            raise MappingError(f"Column {cm.column!r} missing unpack_pattern")
        kind, width = _parse_pattern(pattern)
        if width is None:
            piece = F.substring(line, pos, 1_000_000)
        else:
            piece = F.substring(line, pos, width)
            pos += width
        if kind == "A":
            piece = F.regexp_replace(piece, r"[ \x00]+$", "")
        exprs.append(piece)
    return F.array(*exprs)


def tabulate_fixed_width(df: DataFrame, mapping: TableMapping) -> DataFrame:
    """lines DataFrame (source_file,row_index,value) → cells DataFrame."""
    # F.get, not [0]: GetArrayItem THROWS on an empty cells array under
    # Spark 4's default ANSI mode; F.get yields NULL (the compiler makes
    # the same choice for cell access)
    line = F.col("value") if "value" in df.columns else F.get(F.col("cells"), F.lit(0))
    return df.select(
        "source_file", "row_index", cells_from_fixed_width(line, mapping).alias("cells")
    )
