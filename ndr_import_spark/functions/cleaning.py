"""Cleaner library — pure-Column re-implementations of ``String#clean(...)``.

The reference delegates ``clean:`` ops to the external public ``ndr_support``
gem (dependency in ``ndr_import.gemspec``); the observable contract is pinned
by the reference test matrix (``test/mapper_test.rb:383-458``):

* ``:name``           'anna.belle,smith' → 'ANNABELLE SMITH'
* ``:ethniccategory`` '1'→'M', '99'→'X', 'A'→'A', 'InValiD'→'INVALID'
* ``:icd``            'C34.3,R93.2,Z51.5' → 'C343 R932 Z515'
* ``:code_opcs``      'U212,Y973,X1'→'U212 Y973', '98'→'', 'TooLong'→'',
                      'AbcD'→'ABCD', '1234'→'1234'
* ``:code`` + ``:upcase`` 'u3,y2,x1' → 'U3 Y2 X1'

Cleaners chain left-to-right (mapper.rb:213-217). Everything here is a pure
Spark Column expression — vectorised JVM-side, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ndr_import_spark.functions.text import blank, squash


def _tokens(col: Column, strip_dots: bool = True) -> Column:
    """Split a multi-code cell on commas/whitespace into non-blank tokens."""
    c = F.regexp_replace(col, r"\.", "") if strip_dots else col
    toks = F.split(F.trim(c), r"[,\s]+")
    return F.filter(toks, lambda t: t != F.lit(""))


def clean_name(col: Column) -> Column:
    """Upcase; dots removed; commas/whitespace → single spaces."""
    c = F.upper(col)
    c = F.regexp_replace(c, r"\.", "")
    c = F.regexp_replace(c, r",", " ")
    return squash(c)


_ETHNIC_MAP = {
    "0": "0", "1": "M", "2": "N", "3": "H", "4": "J", "5": "K",
    "6": "R", "7": "8", "8": "S", "9": "Z", "99": "X",
}


def clean_ethniccategory(col: Column) -> Column:
    """Numeric NHS ethnic codes → letter codes; anything else upcased.

    Only the entries pinned by the reference tests ('1'→'M', '99'→'X',
    else upcase) are contractual; the rest follow the published NHS coding.
    """
    pairs = []
    for k, v in _ETHNIC_MAP.items():
        pairs.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*pairs)
    return F.coalesce(F.element_at(m, F.trim(col)), F.upper(col))


def clean_icd(col: Column) -> Column:
    """Strip dots, upcase, split multi-codes, join with single spaces."""
    return F.array_join(_tokens(F.upper(col)), " ")


def clean_code_opcs(col: Column) -> Column:
    """Keep only 4-character alphanumeric codes (dots stripped, upcased)."""
    toks = _tokens(F.upper(col))
    kept = F.filter(toks, lambda t: t.rlike(r"^[A-Z0-9]{4}$"))
    return F.array_join(kept, " ")


def clean_code(col: Column) -> Column:
    """Generic code list: dots stripped, comma/space separated → space joined."""
    return F.array_join(_tokens(col), " ")


def clean_sex(col: Column) -> Column:
    """NHS sex coding: male→1, female→2, unknown→0 (ndr_support semantics)."""
    u = F.upper(F.trim(col))
    return (
        F.when(u.isin("M", "MALE", "1"), F.lit("1"))
        .when(u.isin("F", "FEMALE", "2"), F.lit("2"))
        .otherwise(F.lit("0"))
    )


def clean_nhsnumber(col: Column) -> Column:
    """Digits only, truncated to 10."""
    return F.substring(F.regexp_replace(col, r"[^0-9]", ""), 1, 10)


def clean_postcode(col: Column) -> Column:
    """UK postcode, NHS 'db' format: alphanumerics upcased; when the length is
    5-7 the outward code is space-padded to 4 chars before the 3-char inward
    code (e.g. 'cb30ds' → 'CB3 0DS', 'SW1A 1AA' → 'SW1A1AA')."""
    c = F.upper(F.regexp_replace(col, r"[^A-Za-z0-9]", ""))
    out = F.substring(c, 1, F.length(c) - F.lit(3))
    inward = F.substring(c, F.length(c) - F.lit(2), 3)
    padded = F.concat(F.rpad(out, 4, " "), inward)
    return F.when((F.length(c) >= 5) & (F.length(c) <= 7), padded).otherwise(c)


def clean_hospitalnumber(col: Column) -> Column:
    """Trailing check-letter dropped (ndr_support :hospitalnumber)."""
    return F.when(col.rlike(r"\d$"), col).otherwise(
        F.substring(col, 1, F.length(col) - F.lit(1))
    )


def clean_lpi(col: Column) -> Column:
    return F.regexp_replace(F.upper(col), r"[^0-9A-Z]", "")


def clean_upcase(col: Column) -> Column:
    return F.upper(col)


def clean_lowcase(col: Column) -> Column:
    return F.lower(col)


def clean_strip(col: Column) -> Column:
    return F.trim(col)


def clean_tabs(col: Column) -> Column:
    return F.regexp_replace(col, r"\t", " ")


def clean_spaces(col: Column) -> Column:
    return squash(col)


CLEANERS = {
    "name": clean_name,
    "ethniccategory": clean_ethniccategory,
    "icd": clean_icd,
    "code_icd": clean_icd,
    "code_opcs": clean_code_opcs,
    "code": clean_code,
    "sex": clean_sex,
    "gender": clean_sex,
    "nhsnumber": clean_nhsnumber,
    "postcode": clean_postcode,
    "get_postcode": clean_postcode,
    "hospitalnumber": clean_hospitalnumber,
    "lpi": clean_lpi,
    "upcase": clean_upcase,
    "lowcase": clean_lowcase,
    "strip": clean_strip,
    "tabs": clean_tabs,
    "spaces": clean_spaces,
}


def clean(col: Column, cleaners: list[str] | str) -> Column:
    """Apply a cleaner chain left-to-right; blank input → NULL
    (mapper.rb:213-217: ``return nil if original_value.blank?``)."""
    if isinstance(cleaners, str):
        cleaners = [cleaners]
    c = col
    for name in cleaners:
        fn = CLEANERS.get(str(name).lstrip(":").lower())
        if fn is None:
            # the reference raises inside ndr_support (String#clean with an
            # unknown symbol is a NoMethodError); raising at plan-compile
            # time stops a typo'd cleaner from silently shipping wrong data
            raise ValueError(
                f"Unknown cleaner {str(name)!r}; known: {sorted(CLEANERS)}"
            )
        c = fn(c)
    return F.when(~blank(col), c)
