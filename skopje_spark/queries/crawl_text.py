"""Crawl-ingest text-extraction queries (operators/webtext.py): HTML →
text, URL canonicalization, and the composed Gopher quality filter.

Oracle strategy: the documents fixture is plain text, so the HTML and
URL queries SYNTHESIZE their markup/URLs deterministically in-query —
the same encode-then-decode pattern the multimodal codec queries use —
and the oracle pins the expected output CLOSED-FORM (it knows the
synthetic structure; it does not re-run the extraction regexes). That
proves the extractor recovers the payload, not merely that two engines
share a regex dialect. The Gopher oracle mirrors the rule arithmetic
from the same module-level thresholds/stopword table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.webtext import (
    c4_filter_sql,
    c4_line_filter,
    canonical_url,
    gopher_flags_sql,
    gopher_quality_flags,
    html_to_text,
    html_to_text_sql,
    license_signal_sql,
    url_host,
)
from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.tables import load_table


@register(
    "q_html_extract_text",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(
               source || ' ' || text || ' & more <tags>', '\s+', ' ', 'g'
           )) AS extracted
    FROM documents
    ORDER BY doc_id
    """,
    tags=("webtext", "html", "extraction", "crawl"),
)
def q_html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate stripping (operators/webtext.py:html_to_text):
    each document is wrapped in a full synthetic page — comment, script
    block (with escaped operators), style block, heading, entities
    (&amp; &lt; &gt; &nbsp;) — and the extractor must recover exactly
    ``source + ' ' + text + ' & more <tags>'``, which the oracle
    computes closed-form from the base columns. Proves block removal,
    tag stripping, entity decode order, and whitespace collapse
    compose correctly.

    Scale: one codegen'd regex chain per row — map-only, fuses into
    the scan; the 100 TB crawl case is embarrassingly parallel."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html lang="en"><!-- nav --><head>'),
        F.lit('<script type="text/javascript">if (a&lt;b) { t("x"); }'
              "</script>"),
        F.lit("<style>body { color: #fff; }</style></head><body><h1>"),
        F.col("source"),
        F.lit("</h1>\n<p>"),
        F.col("text"),
        F.lit(" &amp; more &lt;tags&gt;&nbsp;</p></body></html>"),
    )
    return d.select(
        "doc_id", html_to_text(html).alias("extracted")
    ).orderBy("doc_id")


@register(
    "q_url_canonicalize",
    oracle="""
    SELECT doc_id,
           'https://example.com/docs/' || source || '/?id='
               || CAST(doc_id AS VARCHAR) AS url_canon,
           'example.com' AS host
    FROM documents
    ORDER BY doc_id
    """,
    tags=("webtext", "url", "canonicalization", "crawl", "dedup"),
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/webtext.py:canonical_url): each
    document id is dressed as a messy crawl URL — uppercase scheme and
    host, explicit default port, tracking parameters fore and aft of a
    real one, a fragment — and canonicalization must produce exactly
    the clean form the oracle writes down closed-form (lowercased
    scheme+host, port gone, only ``id`` surviving in the query string,
    fragment gone), plus the extracted host. This canonical form is
    the crawl-frontier/dedup key: the same resource fetched under any
    of these variants collapses to one row.

    Scale: expression-only, map-side, no UDF, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://Example.COM:443/docs/"),
        F.col("source"),
        F.lit("/?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_campaign=x#frag"),
    )
    return d.select(
        "doc_id",
        canonical_url(url).alias("url_canon"),
        url_host(url).alias("host"),
    ).orderBy("doc_id")


# both engines synthesize the SAME multi-line page from each document:
# L1 kept, L2 (no terminal punct) dropped, L3 (too short) dropped,
# L4 (javascript) dropped, L5 kept — with an extra closing sentence
# on doc_id % 3 = 0 (lifting the page over the 3-sentence bar) and a
# brace line on doc_id % 7 = 0 (killing the page outright)
_C4_PAGE_SQL = """
SELECT doc_id,
  'Here is a good first sentence from ' || source || ' with plenty of words.'
  || chr(10) || text
  || chr(10) || 'Too short.'
  || chr(10) || 'This fine line mentions javascript sadly enough, yes.'
  || chr(10) || 'Another proper sentence with enough words right here.'
  || CASE WHEN doc_id % 3 = 0
          THEN ' And one more closing sentence appears right here!'
          ELSE '' END
  || CASE WHEN doc_id % 7 = 0
          THEN chr(10) || 'brace { here' ELSE '' END AS text
FROM documents
"""


@register(
    "q_c4_line_filter",
    oracle=(
        c4_filter_sql(f"({_C4_PAGE_SQL})", "doc_id", "text")
        + " ORDER BY doc_id"
    ),
    tags=("webtext", "quality", "c4", "filter", "crawl"),
)
def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's line- and page-level cleaning rules
    (operators/webtext.py:c4_line_filter, Raffel et al. 2020 §2.2):
    each document is dressed as a five-line page exercising every
    line rule (terminal punctuation, minimum words, javascript
    mention) with per-document variation in the PAGE rules — an
    extra closing sentence every third doc lifts it over the
    3-sentence bar, a brace line every seventh kills it. Both
    engines build the identical page and run the rule tables from
    one source of truth, so the hash pins the cleaned text, every
    count, and the keep decision.

    Scale: one line split feeding higher-order array expressions —
    map-only, no UDF, fuses into the scan."""
    d = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("Here is a good first sentence from "),
        F.col("source"),
        F.lit(" with plenty of words.\n"),
        F.col("text"),
        F.lit("\nToo short.\nThis fine line mentions javascript sadly "
              "enough, yes.\nAnother proper sentence with enough words "
              "right here."),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit(" And one more closing sentence appears right here!"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0, F.lit("\nbrace { here")
        ).otherwise(F.lit("")),
    )
    return c4_line_filter(
        d.select("doc_id", page.alias("text")), "doc_id", "text"
    ).orderBy("doc_id")


@register(
    "q_crawl_curation_pipeline",
    oracle="""
    SELECT doc_id,
           (doc_id % 2 = 0) AS kept_url,
           (doc_id % 5 <> 0) AS kept_quality,
           (doc_id % 2 = 0 AND doc_id % 5 <> 0) AS kept
    FROM documents
    ORDER BY doc_id
    """,
    tags=("webtext", "pipeline", "crawl", "dedup", "quality", "composed"),
)
def q_crawl_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE crawl-curation pipeline composed end-to-end, with a
    closed-form oracle: every document becomes a synthetic fetched
    page — messy URL (tracking params, port, fragment; consecutive id
    PAIRS share one canonical resource) wrapping HTML (script/style/
    entities) whose body is the doc text, except every fifth document
    which carries symbol-spam junk. The pipeline then runs for real:
    HTML → text extraction, URL canonicalization, canonical-URL dedup
    (keep the lowest id per resource — drops every odd id), and the
    Gopher rule filter (drops the junk docs on symbol/alpha rules).
    Because each stage's outcome is decided by id arithmetic, the
    oracle states the survivors closed-form — the hash fails if ANY
    stage extracts, canonicalizes, dedups, or filters wrongly.

    Scale: extraction/canonicalization/filtering are map-only codegen
    passes; the dedup is one groupBy on the canonical key — the same
    plan at 100 TB."""
    from skopje_spark.operators.webtext import (
        canonical_url,
        gopher_quality_flags,
        html_to_text,
    )

    d = load_table(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://Crawl.Example.COM:443/res/"),
            (F.col("doc_id") - F.col("doc_id") % 2).cast("string"),
            F.lit("/?utm_source=crawler&page="),
            (F.col("doc_id") % 2).cast("string"),
            F.lit("#frag"),
        ).alias("url"),
        F.concat(
            F.lit('<html><head><script>t("x");</script>'
                  "<style>.a{}</style></head><body><p>"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat_ws(" ", *[F.lit("###")] * 30),
            ).otherwise(F.col("text")),
            F.lit(" &amp; done</p></body></html>"),
        ).alias("html"),
    )
    extracted = pages.select(
        "doc_id",
        canonical_url(F.col("url")).alias("url_canon"),
        html_to_text(F.col("html")).alias("text"),
    )
    # canonical-URL dedup: lowest id per resource survives. NOTE the
    # page= query param varies within a pair — canonicalization keeps
    # real params, so the dedup key must be the canonical URL MINUS
    # its query (the resource identity), which url_canon exposes as
    # everything before '?'
    resource = F.substring_index(F.col("url_canon"), "?", 1)
    keeper = (
        extracted.groupBy(resource.alias("__res"))
        .agg(F.min("doc_id").alias("__keep_id"))
    )
    flagged = extracted.join(
        keeper, resource == F.col("__res"), "left"
    ).withColumn("kept_url", F.col("doc_id") == F.col("__keep_id"))
    quality = gopher_quality_flags(
        flagged, "doc_id", "text",
        min_words=10, min_stopwords=0, min_mean_word_len=0.0,
    ).select("doc_id", F.col("keep").alias("kept_quality"))
    return (
        flagged.select("doc_id", "kept_url")
        .join(quality, "doc_id")
        .select(
            "doc_id",
            "kept_url",
            "kept_quality",
            (F.col("kept_url") & F.col("kept_quality")).alias("kept"),
        )
        .orderBy("doc_id")
    )


_GOPHER_ORACLE = f"""
WITH g AS ({gopher_flags_sql('documents', 'doc_id', 'text')})
SELECT doc_id, n_words,
       {dround_sql('mean_word_len', 6)} AS mean_word_len,
       {dround_sql('symbol_ratio', 6)} AS symbol_ratio,
       {dround_sql('alpha_ratio', 6)} AS alpha_ratio,
       n_stopwords, ok_words, ok_mean_len, ok_symbols, ok_alpha,
       ok_stopwords, keep
FROM g
ORDER BY doc_id
"""


@register(
    "q_gopher_filter",
    oracle=_GOPHER_ORACLE,
    tags=("webtext", "quality", "gopher", "filter", "crawl"),
)
def q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed Gopher-rule document filter
    (operators/webtext.py:gopher_quality_flags): word-count bounds,
    mean-word-length bounds, symbol-to-word ratio, alphabetic-word
    fraction, and distinct-stopword presence, each emitted as its own
    flag plus the conjunction ``keep`` — per Rae et al. 2021 §A1.1.
    The oracle is generated from the SAME threshold/stopword tables
    (single source of truth), so a drifted rule fails the gate.

    Scale: one tokenization feeding every rule via higher-order array
    expressions — a single narrow map, no Python, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    out = gopher_quality_flags(d, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_words",
        dround(F.col("mean_word_len"), 6).alias("mean_word_len"),
        dround(F.col("symbol_ratio"), 6).alias("symbol_ratio"),
        dround(F.col("alpha_ratio"), 6).alias("alpha_ratio"),
        "n_stopwords",
        "ok_words",
        "ok_mean_len",
        "ok_symbols",
        "ok_alpha",
        "ok_stopwords",
        "keep",
    ).orderBy("doc_id")


@register(
    "q_boilerplate_strip",
    oracle="""
    SELECT doc_id,
           'h' || CAST(doc_id % 3 AS VARCHAR) AS host,
           CASE WHEN doc_id % 10 = 0
                THEN text || chr(10) || 'PROMO SPECIAL OFFER TODAY'
                ELSE text END AS text
    FROM documents
    ORDER BY doc_id
    """,
    tags=("webtext", "boilerplate", "curation"),
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host boilerplate removal (operators/webtext.py:
    boilerplate_strip): pages are synthesized with a host-wide NAV
    header and copyright footer around each document's real text
    (plus a rare PROMO line on every 10th doc), and the operator must
    strip exactly the host-frequent chrome — the oracle states the
    surviving text closed-form, so over- OR under-stripping
    hash-fails. The PROMO line (~10% of a host's docs, above
    min_docs but below min_frac) pins the AND of the two thresholds.

    Scale: one posexplode + one count-distinct aggregation + one
    anti-join; the boilerplate dictionary is tiny by construction
    (only lines crossing min_docs survive), reassembly is a
    higher-order array_sort, never a per-doc window."""
    from skopje_spark.operators.webtext import boilerplate_strip

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pages = (
        d.withColumn(
            "host",
            F.concat(F.lit("h"), (F.col("doc_id") % 3).cast("string")),
        )
        .withColumn(
            "page",
            F.concat_ws(
                "\n",
                F.concat(F.lit("NAV HOME ABOUT CONTACT "), F.col("host")),
                F.col("text"),
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.lit("PROMO SPECIAL OFFER TODAY"),
                ),
                F.concat(F.lit("(c) "), F.col("host"), F.lit(" all rights")),
            ),
        )
        .select("doc_id", "host", F.col("page").alias("text"))
    )
    return boilerplate_strip(
        pages, id_col="doc_id", group_col="host", text_col="text",
        min_frac=0.5, min_docs=3, min_chars=4,
    ).orderBy("doc_id")


def _warc_html_sql() -> str:
    """The oracle's copy of the per-doc HTML the query wraps around
    the document text (same template, same concatenation)."""
    return (
        "'<html><head><title>d' || doc_id || "
        "'</title><script>var x=1;</script></head><body><p>' || text || "
        "'</p><!-- crawl --></body></html>'"
    )


@register(
    "q_warc_extract_text",
    oracle=f"""
    SELECT doc_id,
           'http://corpus.test/doc/' || doc_id AS url,
           CAST(200 AS INT) AS status,
           'text/html; charset=utf-8' AS content_type,
           sha256({html_to_text_sql(_warc_html_sql())}) AS text_sha
    FROM documents
    ORDER BY doc_id
    """,
    tags=("warc", "crawl", "source", "html", "real-codec"),
)
def q_warc_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-ingest front door under the driver gate: per document
    a REAL ``.warc.gz`` archive is assembled executor-side (warcinfo +
    request + response records, per-member gzip, full HTTP/1.1
    response framing — sources/warc.py), parsed back through the
    independent WARC/HTTP decode path (typed records: only the
    response survives), and the recovered HTML runs the shared
    ``html_to_text`` rule tables. The oracle rebuilds the identical
    HTML closed-form in SQL and applies the DuckDB twin of the same
    rule tables — WARC framing, gzip members, HTTP parsing, and
    markup stripping all hash-checked end to end per document.

    Scale: one archive per task is the crawl-corpus unit of work
    (per-record gzip members are not seekable); at 100 TB the
    parallelism is the archive count. Payload bytes never touch the
    driver."""
    import pandas as pd

    from skopje_spark.sources.warc import (
        encode_warc,
        http_response_bytes,
        warc_response_rows,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches):
        for pdf in batches:
            rows = []
            for i, text in zip(
                pdf["doc_id"].astype("int64"), pdf["text"]
            ):
                i = int(i)
                url = f"http://corpus.test/doc/{i}"
                html = (
                    f"<html><head><title>d{i}</title>"
                    "<script>var x=1;</script></head><body><p>"
                    f"{text}</p><!-- crawl --></body></html>"
                ).encode()
                warc = encode_warc(
                    [
                        {"type": "warcinfo",
                         "content_type": "application/warc-fields",
                         "payload": b"software: skopje-spark\r\n"},
                        {"type": "request", "url": url,
                         "payload": b"GET / HTTP/1.1\r\n\r\n"},
                        {"type": "response", "url": url,
                         "content_type":
                             "application/http; msgtype=response",
                         "payload": http_response_bytes(html)},
                    ],
                    gzip_members=True,
                )
                for u, _, status, ctype, body in warc_response_rows(warc):
                    rows.append((i, u, status, ctype, body))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "url", "status", "content_type",
                         "html"],
            )

    parsed = d.mapInPandas(
        run,
        schema="doc_id long, url string, status int, "
               "content_type string, html string",
    )
    return parsed.select(
        "doc_id", "url", "status", "content_type",
        F.sha2(html_to_text(F.col("html")), 256).alias("text_sha"),
    ).orderBy("doc_id")


_LICENSE_SNIPPETS = (
    "",  # no signal: the text's own content decides (usually none)
    "Licensed under https://creativecommons.org/licenses/by/4.0/",
    "Copyright. All rights reserved.",
    "SPDX-License-Identifier: Apache-2.0",
    "Shared as CC BY-NC per creativecommons.org/licenses/by-nc/4.0",
    "Released into the public domain.",
)


def _license_case_sql() -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(_LICENSE_SNIPPETS)
    )
    return f"(CASE CAST(doc_id % {len(_LICENSE_SNIPPETS)} AS INT) {cases} END)"


@register(
    "q_text_license_tag",
    oracle=f"""
    SELECT doc_id,
           {license_signal_sql("text || ' ' || " + _license_case_sql())}
             AS license
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "license", "compliance", "crawl"),
)
def q_text_license_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License-signal screening under the driver gate — the
    compliance filter run before mixing a source into training data
    (The Stack's license gate, C4's policy screens). Each document
    gets a deterministic license snippet appended (CC variants, SPDX
    ids, all-rights-reserved, none) and
    :func:`~skopje_spark.operators.webtext.license_signal` tags it via
    the PRIORITY-ordered shared rule table (most restrictive wins);
    the oracle applies the DuckDB twin generated from the SAME table
    to the same concatenation — per-document cross-engine tag
    equality, pure codegen, no UDF."""
    from skopje_spark.operators.webtext import license_signal

    d = load_table(spark, sf_dir, "documents")
    snippet = F.lit(None)
    expr = None
    for i, s in enumerate(_LICENSE_SNIPPETS):
        cond = (F.col("doc_id") % len(_LICENSE_SNIPPETS) == i)
        expr = F.when(cond, F.lit(s)) if expr is None else expr.when(
            cond, F.lit(s)
        )
    tagged = F.concat(F.col("text"), F.lit(" "), expr)
    return d.select(
        "doc_id", license_signal(tagged).alias("license")
    ).orderBy("doc_id")
