"""Rails-ish string predicates as Spark Column expressions.

The reference leans on ActiveSupport ``blank?`` / ``present?`` / ``presence``
throughout the mapper (``lib/ndr_import/mapper.rb``): a string is blank when
nil, empty, or whitespace-only. These helpers reproduce that algebra as pure
Catalyst expressions (whole-stage-codegen friendly; no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def blank(col: Column) -> Column:
    """True when null / empty / whitespace-only (ActiveSupport String#blank?)."""
    return col.isNull() | (F.trim(col) == F.lit(""))


def present(col: Column) -> Column:
    return ~blank(col)


def presence(col: Column) -> Column:
    """value.presence — the value itself, or NULL when blank (untrimmed)."""
    return F.when(~blank(col), col)


# Back-compat alias used across the compiler:
def nullif_blank(col: Column) -> Column:
    return presence(col)


def squash(col: Column) -> Column:
    """Collapse whitespace runs to single spaces and strip ends."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def strip_default(col: Column) -> Column:
    """The mapper's no-op branch: strip, blank→NULL (mapper.rb:228-231)."""
    return F.when(~blank(col), F.trim(col))
