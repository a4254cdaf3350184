"""Unicode hygiene operator (operators/unicode_clean.py)."""

import pytest

from ndr_import_spark.operators.unicode_clean import (
    clean_text,
    clean_unicode,
    fix_mojibake,
)


class TestFixMojibake:
    def test_single_pass_repair(self):
        bad = "café et crème".encode("utf-8").decode("cp1252")
        assert fix_mojibake(bad) == ("café et crème", 1)

    def test_double_mojibake_two_passes(self):
        bad = (
            "café".encode("utf-8").decode("cp1252")
            .encode("utf-8").decode("cp1252")
        )
        assert fix_mojibake(bad) == ("café", 2)

    def test_clean_ascii_untouched(self):
        assert fix_mojibake("plain ascii text") == ("plain ascii text", 0)

    def test_legit_accents_not_destroyed(self):
        # real French with NO mojibake markers: the repair must not fire
        s = "déjà vu à côté"
        assert fix_mojibake(s) == (s, 0)

    def test_non_reducing_roundtrip_rejected(self):
        # 'Ã' alone: cp1252-encode → 0xC3, utf-8 decode fails → no repair
        assert fix_mojibake("Ã") == ("Ã", 0)


class TestCleanText:
    def test_nfc_composition(self):
        out, passes, removed = clean_text("caf" + "é")
        assert out == "café" and passes == 0 and removed == 0

    def test_control_strip_keeps_newline_tab(self):
        out, _, removed = clean_text("a\x07b\nc\td\x00")
        assert out == "ab\nc\td" and removed == 2

    def test_space_zoo_normalised(self):
        out, _, removed = clean_text("a b c​d﻿")
        assert out == "a b c" + "d" and removed == 2

    def test_combined_order_mojibake_then_nfc(self):
        bad = "café".encode("utf-8").decode("cp1252") + "\x07"
        out, passes, removed = clean_text(bad)
        assert out == "café" and passes == 1 and removed == 1


class TestCleanUnicodeSpark:
    def test_mapinpandas_roundtrip(self, spark):
        bad = "naïve café".encode("utf-8").decode("cp1252")
        df = spark.createDataFrame(
            [(1, bad), (2, "plain"), (3, None)],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in clean_unicode(df).collect()}
        assert got[1].clean_text == "naïve café"
        assert got[1].mojibake_passes == 1
        assert got[2].clean_text == "plain"
        assert got[3].clean_text == ""  # null-safe

    def test_no_shuffle_in_plan(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = clean_unicode(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:

    class TestMojibakeProperties:
        @given(
            st.text(
                alphabet=st.characters(
                    min_codepoint=0x20, max_codepoint=0x7E
                ),
                max_size=80,
            )
        )
        @settings(max_examples=200, deadline=None)
        def test_ascii_is_always_identity(self, s):
            assert fix_mojibake(s) == (s, 0)

        @given(
            st.text(
                alphabet="éèàçñüöß€“”’– abcdefgh",
                min_size=1,
                max_size=60,
            )
        )
        @settings(max_examples=200, deadline=None)
        def test_cp1252_mojibake_roundtrip_restores(self, s):
            # corrupt: utf-8 bytes mis-decoded as cp1252 (only when the
            # byte sequence IS cp1252-decodable — the realistic case)
            try:
                bad = s.encode("utf-8").decode("cp1252")
            except UnicodeDecodeError:
                return
            fixed, passes = fix_mojibake(bad)
            # the repair either fully restores the original or (when the
            # corruption produced no marker) leaves the input unchanged
            if passes:
                assert fixed == s
            else:
                assert fixed == bad

        @given(
            st.text(
                alphabet="éèàçñüöß abcdefgh",
                min_size=1,
                max_size=40,
            )
        )
        @settings(max_examples=100, deadline=None)
        def test_clean_text_is_idempotent(self, s):
            once, _, _ = clean_text(s)
            twice, passes2, removed2 = clean_text(once)
            assert twice == once
            assert removed2 == 0
