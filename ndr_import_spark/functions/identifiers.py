"""Identifier check-digit validators: NHS number (Modulus 11) and Luhn.

Domain-true extensions of the reference's cleaning layer
(`lib/ndr_import`'s cleaners normalise NHS numbers but do not validate
them): the NHS Data Dictionary's Modulus 11 algorithm (public) and the
Luhn checksum (ISO/IEC 7812, public) as pure Column expressions — the
corpus-scale "is this identifier structurally real" scan that a
health-data quarantine pipeline runs before linkage.

Both validators are UNROLLED fixed-position arithmetic (9 weighted terms
for NHS, 19 length-guarded terms for Luhn) — whole-stage codegen, no
explode, no shuffle, no HOF lambdas: per-row maps that scale linearly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _digit(col: Column, i: int) -> Column:
    """i-th (1-based) character as an int digit (try_cast: ANSI mode is
    on in Spark 4 — a plain cast of a non-digit would THROW before the
    shape guard can veto the row; NULL propagates to the guarded AND)."""
    return F.substring(col, i, 1).try_cast("int")


def nhs_number_valid(col: Column) -> Column:
    """True iff `col` is a structurally valid 10-digit NHS number:
    Σ d_i·(11−i) for i=1..9, check = 11 − (Σ mod 11) with 11→0, number
    valid when check ≠ 10 and check == d₁₀ (NHS Data Dictionary
    Modulus 11)."""
    shape_ok = col.rlike(r"^[0-9]{10}$")
    total = None
    for i in range(1, 10):
        term = _digit(col, i) * F.lit(11 - i)
        total = term if total is None else total + term
    check = F.lit(11) - (total % 11)
    check = F.when(check == 11, F.lit(0)).otherwise(check)
    return shape_ok & (check != 10) & (check == _digit(col, 10))


def luhn_valid(col: Column, max_len: int = 19) -> Column:
    """True iff `col` passes the Luhn checksum (12-19 digits): from the
    RIGHT, double every second digit, subtract 9 when >9, total ≡ 0
    (mod 10). Unrolled over `max_len` length-guarded positions."""
    shape_ok = col.rlike(r"^[0-9]{12,%d}$" % max_len)
    rev = F.reverse(col)
    n = F.length(col)
    total = None
    for i in range(1, max_len + 1):
        d = F.substring(rev, i, 1).try_cast("int")
        if i % 2 == 0:
            dd = d * 2
            mapped = F.when(dd > 9, dd - 9).otherwise(dd)
        else:
            mapped = d
        term = F.when(n >= i, mapped).otherwise(F.lit(0))
        total = term if total is None else total + term
    return shape_ok & (total % 10 == 0)
