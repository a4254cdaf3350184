"""Check-digit validators (functions/identifiers.py): published test
vectors and structural edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndr_import_spark.functions.identifiers import luhn_valid, nhs_number_valid


def _check(spark, fn, vals):
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    return {
        r["s"]: r["ok"]
        for r in df.select("s", fn(F.col("s")).alias("ok")).collect()
    }


def test_nhs_modulus11_vectors(spark):
    got = _check(
        spark,
        nhs_number_valid,
        [
            # the NHS Data Dictionary worked example
            "9434765919",
            # flip the check digit -> invalid
            "9434765910",
            # flip a payload digit -> invalid
            "9434765019",
            # wrong shape
            "943476591", "94347659190", "94347Y5919", "",
        ],
    )
    assert got["9434765919"] is True
    assert got["9434765910"] is False
    assert got["9434765019"] is False
    assert got["943476591"] is False
    assert got["94347659190"] is False
    assert got["94347Y5919"] is False
    assert got[""] is False


def test_nhs_check_digit_ten_is_always_invalid(spark):
    # payload whose remainder forces check 10: sum % 11 == 1.
    # digits 1000000000-ish: d1=1 rest 0 -> sum=10, rem=10, chk=1 (valid
    # case instead); construct sum%11==1: d9=5 -> sum 10 -> no... use
    # d1..d9 = 0 0 0 0 0 0 0 0 6 -> sum=12, rem=1, chk=10: NO digit works.
    vals = ["00000000" + "6" + str(d) for d in range(10)]
    got = _check(spark, nhs_number_valid, vals)
    assert not any(got.values())


def test_luhn_vectors(spark):
    got = _check(
        spark,
        luhn_valid,
        [
            "4539148803436467",  # textbook valid Visa test number
            "4539148803436468",  # check digit off by one
            "79927398713" + "0",  # 79927398713 is the classic 11-digit
            "000000000000",       # all zeros: sum 0 -> valid shape+check
            "123",                # too short
            "4539 1488 0343 6467",  # non-digits
        ],
    )
    assert got["4539148803436467"] is True
    assert got["4539148803436468"] is False
    assert got["000000000000"] is True
    assert got["123"] is False
    assert got["4539 1488 0343 6467"] is False


def test_luhn_classic_wikipedia_vector(spark):
    # 79927398713 is 11 digits (below the 12-digit floor) -> shape-invalid
    # here, but padding a leading zero keeps the checksum valid
    got = _check(spark, luhn_valid, ["79927398713", "079927398713"])
    assert got["79927398713"] is False
    assert got["079927398713"] is True
