"""Main-content extraction (operators/boilerplate.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ndr_import_spark.operators.boilerplate import (
    block_features,
    extract_main_content,
    main_content_oracle_sql,
)

ARTICLE = (
    "the quick brown fox jumps over the lazy dog and keeps on running "
    "through the quiet field"
)  # 17 words
PAGE = (
    "<html><head><title>My Page</title><style>p{color:red}</style></head>"
    '<body><div id="nav"><a href="/">Home</a> <a href="/a">About</a> '
    '<a href="/c">Contact</a></div>'
    "<h1>Short Heading</h1>"
    f"<p>{ARTICLE}</p>"
    '<div id="rel"><a href="/x">one</a> <a href="/y">two</a></div>'
    '<div id="footer"><a href="/p">Privacy</a> <a href="/t">Terms</a> '
    "Copyright 2024 Example</div>"
    "<script>var nav = document.getElementById('nav');</script>"
    "</body></html>"
)


class TestExtractMainContent:
    def test_nav_footer_linkfarm_dropped_article_kept(self, spark):
        df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
        got = extract_main_content(df).collect()[0]
        assert got["main_text"] == ARTICLE
        assert got["n_kept"] == 1
        # title, nav, heading, article, rel, footer all have text;
        # script/style content must NOT appear as blocks
        assert got["n_blocks"] == 6

    def test_script_and_style_content_never_leaks(self, spark):
        df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
        blocks = block_features(df, "html", "doc_id").collect()
        all_text = " ".join(b["text"] for b in blocks)
        assert "color:red" not in all_text
        assert "getElementById" not in all_text

    def test_all_boilerplate_page_keeps_empty_row(self, spark):
        page = '<html><body><div><a href="/">Home</a> menu</div></body></html>'
        df = spark.createDataFrame([(7, page)], "doc_id long, html string")
        got = extract_main_content(df).collect()[0]
        assert got["n_kept"] == 0
        assert got["main_text"] == ""

    def test_entities_unescaped_in_order(self, spark):
        words = " ".join(f"w{i}" for i in range(12))
        page = f"<html><body><p>{words} a &amp;lt; b &lt;tag&gt;</p></body></html>"
        df = spark.createDataFrame([(1, page)], "doc_id long, html string")
        got = extract_main_content(df).collect()[0]
        # &amp;lt; -> &lt; (literal, not double-unescaped to '<')
        assert got["main_text"].endswith("a &lt; b <tag>")

    def test_link_density_threshold_integer_exact(self, spark):
        # 12 words, anchor chars exactly 25% of text chars -> kept;
        # one char more -> dropped
        body = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk "
        # normalized text = stripped body + ' ' + anchor, so with L =
        # len(stripped body): kept iff 100*a <= 25*(L + 1 + a) iff
        # 3a <= L + 1
        L = len(body.strip())
        anchor_ok = "x" * ((L + 1) // 3)
        for anchor, expect_kept in [(anchor_ok, True), (anchor_ok + "x", False)]:
            page = f'<html><body><p>{body}<a href="/n">{anchor}</a></p></body></html>'
            df = spark.createDataFrame([(1, page)], "doc_id long, html string")
            got = extract_main_content(df).collect()[0]
            feats = block_features(df, "html", "doc_id").collect()
            blk = [b for b in feats if b["n_words"] >= 10][0]
            kept_pred = blk["anchor_chars"] * 100 <= blk["n_chars"] * 25
            assert kept_pred == expect_kept
            assert (got["n_kept"] == 1) == expect_kept

    def test_matches_duckdb_oracle_on_multiline_pages(self, spark):
        rows = []
        for i in range(30):
            words = " ".join(f"t{(i * 7 + j) % 19}" for j in range(5 + i))
            rows.append(
                (
                    i,
                    f'<html><body><div id="nav"><a href="/">Home</a></div>'
                    f"<p>{words}</p>"
                    f'<div><a href="/m">more</a> <a href="/n">next</a></div>'
                    f"</body></html>",
                )
            )
        df = spark.createDataFrame(rows, "doc_id long, html string")
        got = sorted(
            tuple(r)
            for r in extract_main_content(df)
            .select("doc_id", "n_blocks", "n_kept", "main_text")
            .collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE pages_src (doc_id BIGINT, html VARCHAR)")
        con.executemany("INSERT INTO pages_src VALUES (?, ?)", rows)
        sql = main_content_oracle_sql("pages AS (SELECT * FROM pages_src)") + (
            "\nSELECT doc_id, n_blocks, n_kept, main_text FROM perdoc"
        )
        exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == exp


class TestWarcComposition:
    def test_warc_keep_html_feeds_main_content(self, spark, tmp_path):
        from ndr_import_spark.sources.warc import (
            http_response_bytes,
            read_warc,
            write_warc,
        )

        art = " ".join(f"word{i}" for i in range(15))
        html = (
            '<html><body><div id="nav"><a href="/">Home</a> <a href="/b">B</a>'
            f"</div><p>{art}</p>"
            '<div id="footer"><a href="/p">Privacy</a> legal</div>'
            "</body></html>"
        )
        recs = [
            (
                {"WARC-Type": "response", "WARC-Target-URI": "https://a.test/"},
                http_response_bytes(html.encode(), content_type="text/html"),
            )
        ]
        p = tmp_path / "one.warc.gz"
        p.write_bytes(write_warc(recs))
        docs = read_warc(spark, str(p), options={"keep_html": True})
        assert "raw_html" in docs.columns
        main = extract_main_content(
            docs.select(F.col("target_uri").alias("doc_id"), F.col("raw_html").alias("html"))
        ).collect()[0]
        assert main["main_text"] == art
        # default read keeps the old schema (no raw_html)
        assert "raw_html" not in read_warc(spark, str(p)).columns
