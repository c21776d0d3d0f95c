"""Unit tests: crawl-ingest text extraction (operators/webtext.py) —
HTML → text, URL canonicalization, Gopher quality rules — including
cross-engine identity with the module's own DuckDB oracle generators
(the single-source-of-truth contract the driver queries rely on)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from skopje_spark.operators.webtext import (
    GOPHER_STOPWORDS,
    canonical_url,
    canonical_url_sql,
    gopher_flags_sql,
    gopher_quality_flags,
    html_to_text,
    html_to_text_sql,
    url_host,
)

HTML_CASES = [
    # full page: comment, script with escaped operators, style, tags,
    # entities in the order that trips naive decoders
    (
        '<html lang="en"><!-- nav --><head><script type="text/javascript">'
        'if (a&lt;b) { t("x"); }</script><style>body { color: #fff; }'
        "</style></head><body><h1>Title</h1>\n<p>Hello &amp; world "
        "&lt;tag&gt;&nbsp;here</p></body></html>",
        "Title Hello & world <tag> here",
    ),
    ("plain text, no markup", "plain text, no markup"),
    ("<div><p>a</p><p>b</p></div>", "a b"),
    # double escape: &amp;lt; is the LITERAL '&lt;', not '<'
    ("&amp;lt; double escape", "&lt; double escape"),
    # uppercase tag names; raw '<' inside script body still removed
    ("<SCRIPT>x<1 oops</SCRIPT>after", "after"),
    # multiline comment and style
    ("<!--\nmulti\nline\n--><style>\n.a{}\n</style>kept", "kept"),
]

URL_CASES = [
    (
        "HTTPS://Example.COM:443/Docs/Page/?utm_source=feed&id=7"
        "&utm_campaign=x#frag",
        "https://example.com/Docs/Page/?id=7",
    ),
    ("http://site.org:80/", "http://site.org"),
    ("https://a.b/path?gclid=123", "https://a.b/path"),
    ("https://a.b/path?x=1&fbclid=9&y=2", "https://a.b/path?x=1&y=2"),
    # non-default port survives; path case preserved
    ("ftp://Host.Net:2121/File", "ftp://host.net:2121/File"),
    ("https://x.y/a#b#c", "https://x.y/a"),
]


def test_html_to_text_cases_and_oracle_identity(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HTML_CASES)], "i int, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()
    }
    for i, (_, want) in enumerate(HTML_CASES):
        assert got[i] == want, f"case {i}: {got[i]!r}"
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, '{h.replace(chr(39), chr(39) * 2)}')"
            for i, (h, _) in enumerate(HTML_CASES)
        )
        + ") v(i, h)"
    )
    dd = dict(con.execute(f"SELECT i, {html_to_text_sql('h')} FROM t").fetchall())
    assert got == dd  # one source of truth, two engines


def test_canonical_url_cases_idempotence_and_oracle_identity(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(URL_CASES)], "i int, u string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(URL_CASES):
        assert got[i] == want, f"case {i}: {got[i]!r}"
    # canonical of canonical is itself
    twice = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonical_url(canonical_url(F.col("u"))).alias("c")
        ).collect()
    }
    assert twice == got
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{u}')" for i, (u, _) in enumerate(URL_CASES))
        + ") v(i, u)"
    )
    dd = dict(con.execute(f"SELECT i, {canonical_url_sql('u')} FROM u").fetchall())
    assert got == dd


def test_url_host_extracts_lowercased_host_without_port(spark):
    df = spark.createDataFrame(
        [("HTTPS://Example.COM:443/x",), ("http://a.b/y?z",)], ["u"]
    )
    hosts = [r["h"] for r in df.select(url_host(F.col("u")).alias("h")).collect()]
    assert hosts == ["example.com", "a.b"]


def test_gopher_rules_fire_individually(spark):
    long_ok = (
        "the be to of and that have with "
        + "plainword " * 60
    )
    docs = [
        (0, long_ok),                   # passes everything
        (1, "short doc"),               # too few words
        (2, "### ## # " * 30),          # symbols + no alpha + no stopwords
        (3, "aa " * 60),                # words ok, no stopwords
        (4, long_ok + " ..." * 20),     # ellipsis symbol pressure
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(df, "doc_id", "text").collect()
    }
    assert out[0]["keep"] and out[0]["n_stopwords"] == len(GOPHER_STOPWORDS)
    assert not out[1]["keep"] and not out[1]["ok_words"]
    assert not out[2]["keep"] and not out[2]["ok_symbols"]
    assert not out[2]["ok_alpha"] and not out[2]["ok_stopwords"]
    assert not out[3]["keep"] and not out[3]["ok_stopwords"] and out[3]["ok_words"]
    assert not out[4]["ok_symbols"]  # 20 ellipses / ~68 words > 0.1
    # thresholds overridable
    loose = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            df, "doc_id", "text", min_words=1, min_stopwords=0,
            max_symbol_ratio=99.0, min_alpha_ratio=0.0,
            min_mean_word_len=0.0,
        ).collect()
    }
    assert all(loose[i]["keep"] for i in (0, 1, 3, 4))


def test_gopher_oracle_identity(spark):
    docs = [
        (0, "the be to of and that have with " + "word " * 55),
        (1, "tiny"),
        (2, "#tag " * 70),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    sp = (
        gopher_quality_flags(df, "doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in docs)
        + ") v(doc_id, text)"
    )
    dd = con.execute(
        gopher_flags_sql("documents", "doc_id", "text") + " ORDER BY doc_id"
    ).df()
    assert list(sp.columns) == list(dd.columns)
    for c in sp.columns:
        assert (sp[c].values == dd[c].values).all(), c


def test_c4_line_filter_rules_and_oracle_identity(spark):
    from skopje_spark.operators.webtext import c4_filter_sql, c4_line_filter

    docs = [
        # line rules: kept / no-punct / too-short / javascript / kept(+1 sentence)
        (0, "Here is a good first sentence with plenty words.\nno punct line"
            "\nToo short.\nA fine line mentioning javascript badly, yes."
            "\nAnother proper sentence with enough words here. And one more!"),
        (1, "lorem ipsum dolor sit amet sentence one is fine.\nSecond proper "
            "sentence right here with words. Third one too!"),
        (2, "Contains a brace { in this sentence with words.\nSecond proper "
            "sentence right here with words. Third one too!"),
        (3, "One good sentence with enough words right here.\nOnly two "
            "sentences total here, sadly enough."),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(df, "doc_id", "text").collect()}
    assert out[0]["n_lines"] == 5 and out[0]["n_lines_kept"] == 2
    assert out[0]["keep_page"] and out[0]["n_sentences"] == 3
    assert not out[1]["keep_page"] and out[1]["has_lorem"]
    assert not out[2]["keep_page"] and out[2]["has_brace"]
    assert not out[3]["keep_page"] and out[3]["n_sentences"] == 2  # under bar
    assert out[0]["text_clean"].split("\n") == [
        "Here is a good first sentence with plenty words.",
        "Another proper sentence with enough words here. And one more!",
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, '{t}')".replace("\n", "' || chr(10) || '") for i, t in docs
        )
        + ") v(doc_id, text)"
    )
    dd = con.execute(
        c4_filter_sql("documents", "doc_id", "text") + " ORDER BY doc_id"
    ).df()
    sp = (
        c4_line_filter(df, "doc_id", "text").orderBy("doc_id").toPandas()
    )
    assert list(sp.columns) == list(dd.columns)
    for c in sp.columns:
        assert (sp[c].values == dd[c].values).all(), c


def test_boilerplate_strip_per_group(spark):
    """Frequent lines strip per group; rare lines, short lines, and
    other groups' boilerplate survive; order is preserved; a fully-
    boilerplate doc returns empty, not dropped."""
    from skopje_spark.operators.webtext import boilerplate_strip

    rows = []
    for i in range(6):
        body = [f"NAV HOME ABOUT", f"unique body {i}"]
        if i == 0:
            body.append("PROMO ONLY ONCE")
        body.append("(c) site-a rights")
        rows.append((i, "a", "\n".join(body)))
    # group b shares none of a's chrome; its own footer is frequent
    for i in range(6, 9):
        rows.append((i, "b", f"NAV HOME ABOUT\nbody {i}"))
    # doc that is ALL boilerplate in group a
    rows.append((9, "a", "NAV HOME ABOUT\n(c) site-a rights"))
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in boilerplate_strip(
            df, min_frac=0.5, min_docs=3, min_chars=4
        ).collect()
    }
    assert out[0] == "unique body 0\nPROMO ONLY ONCE"
    for i in range(1, 6):
        assert out[i] == f"unique body {i}"
    # group b: NAV line is frequent there too (3/3 docs) -> stripped
    for i in range(6, 9):
        assert out[i] == f"body {i}"
    assert out[9] == ""  # all-boilerplate doc kept as empty
    assert len(out) == 10


def test_boilerplate_strip_thresholds_and_short_lines(spark):
    """min_docs gates small groups; sub-min_chars lines are never
    candidates however frequent."""
    from skopje_spark.operators.webtext import boilerplate_strip

    rows = [
        (1, "c", "HEADER LINE\n--\nbody one"),
        (2, "c", "HEADER LINE\n--\nbody two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    # min_docs=3 > group size: nothing strips
    out = {
        r["doc_id"]: r["text"]
        for r in boilerplate_strip(df, min_docs=3).collect()
    }
    assert out[1] == "HEADER LINE\n--\nbody one"
    # min_docs=2: HEADER strips, the 2-char "--" separator survives
    out2 = {
        r["doc_id"]: r["text"]
        for r in boilerplate_strip(df, min_docs=2, min_chars=4).collect()
    }
    assert out2[1] == "--\nbody one" and out2[2] == "--\nbody two"


def test_license_signal_priority_and_cross_engine(spark):
    """First-match priority (restrictive beats permissive) and exact
    agreement with the DuckDB twin generated from the same table."""
    import duckdb
    from pyspark.sql import functions as F

    from skopje_spark.operators.webtext import (
        license_signal,
        license_signal_sql,
    )

    rows = [
        (0, "licensed under creativecommons.org/licenses/by/4.0/ terms"),
        (1, "CC BY-NC badge creativecommons.org/licenses/by-nc/4.0"),
        (2, "Copyright 2020. ALL RIGHTS RESERVED."),
        (3, "SPDX-License-Identifier: Apache-2.0"),
        (4, "plain text, no licensing language at all"),
        (5, "dedicated to the public domain (CC0)"),
        (6, "under the MIT License"),
        (7, "GNU General Public License, version 3"),
        # BOTH signals: the restrictive one must win
        (8, "All rights reserved. Also CC BY creativecommons.org/licenses/by/4.0"),
        (9, "CC BY-SA share-alike creativecommons.org/licenses/by-sa/3.0"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["lic"]
        for r in df.select(
            "i", license_signal(F.col("t")).alias("lic")
        ).collect()
    }
    assert got[2] == "all-rights-reserved" and got[8] == "all-rights-reserved"
    assert got[0] == "cc-by" and got[1] == "cc-by-nc" and got[9] == "cc-by-sa"
    assert got[4] == "none" and got[5] == "cc0"
    assert got[3] == "apache-2.0" and got[6] == "mit" and got[7] == "gpl"
    con = duckdb.connect()
    con.execute("CREATE TABLE d (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    duck = dict(
        con.execute(f"SELECT i, {license_signal_sql('t')} FROM d").fetchall()
    )
    assert got == duck
