"""Crawl-ingest text extraction: HTML → text, URL canonicalization,
and the composed Gopher-style document quality filter.

A web-crawl training corpus arrives as markup and URLs, not clean
text; before any dedup/quality stage can run, the pipeline needs
(1) boilerplate-free text out of HTML, (2) canonical URLs so the same
resource fetched under tracking-parameter / port / case variants
dedups to one key, and (3) a first-pass rule filter that drops
machine-generated and junk documents (the "Gopher rules" of Rae et
al. 2021, §A1.1). The reference engine's curation surface stops at
typed scalar converts (`/root/reference/src/util.rs`); this tier is
part of the mandated LLM-pipeline extension.

Scale design: every operator here is a chain of JVM-side expressions
(`regexp_replace`, `split`, higher-order array functions) — no Python
in the hot path, whole-stage-codegen throughout, embarrassingly
parallel per row. Pattern/threshold tables are module-level constants
shared with the oracle-SQL generators so Spark and DuckDB compute from
one source of truth.

Honest limits (documented, deliberate): the HTML strip is a regex
extractor, not an HTML5 parser — unescaped ``<`` inside script bodies
or attribute values can confuse it (real crawls escape these);
entity decoding covers the named entities that dominate web text, not
numeric references. URL canonicalization does not resort query
parameters (order is preserved) and strips only the tracking keys in
:data:`URL_TRACKING_PARAMS`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# HTML → text
# --------------------------------------------------------------------------

# block-content patterns removed wholesale, in order
HTML_BLOCK_PATTERNS = (
    r"(?s)<!--.*?-->",                       # comments
    r"(?is)<script\b[^>]*>.*?</script\s*>",  # script incl. body
    r"(?is)<style\b[^>]*>.*?</style\s*>",    # style incl. body
)
HTML_TAG_PATTERN = r"<[^>]+>"  # any remaining tag → whitespace

# named entities, decoded AFTER tag removal (so a decoded '<' is never
# re-parsed as markup) with &amp; LAST (so '&amp;lt;' correctly yields
# the literal '&lt;', the standard double-escape behavior)
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
)


def html_to_text(col: Column) -> Column:
    """Strip markup from an HTML column: comments, ``<script>`` and
    ``<style>`` blocks (content included), every remaining tag, then
    named-entity decode and whitespace collapse. Pure expression chain
    — codegen'd, no UDF."""
    c = col
    for pat in HTML_BLOCK_PATTERNS:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, HTML_TAG_PATTERN, " ")
    for ent, ch in HTML_ENTITIES:
        c = F.regexp_replace(c, ent, ch)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_to_text`, generated from the same
    pattern tables (RE2 accepts the inline (?is) flags; replacements
    carry no backreferences by construction, so the '$' vs '\\'
    dialect difference never arises)."""
    c = expr
    for pat in HTML_BLOCK_PATTERNS:
        c = f"regexp_replace({c}, '{pat}', ' ', 'g')"
    c = f"regexp_replace({c}, '{HTML_TAG_PATTERN}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        c = f"regexp_replace({c}, '{ent}', '{ch_sql}', 'g')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


# --------------------------------------------------------------------------
# URL canonicalization
# --------------------------------------------------------------------------

URL_TRACKING_PARAMS = r"utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid"

# (pattern, replacement) applied in order; NO backreferences (keeps the
# rule table engine-portable — Java wants $1, RE2 wants \1)
URL_CANON_RULES = (
    (r"#.*$", ""),                                   # fragment
    (rf"({URL_TRACKING_PARAMS})=[^&#]*", ""),        # tracking params
    (r"\?&+", "?"),                                  # separator repair…
    (r"&&+", "&"),
    (r"[?&]+$", ""),                                 # …and dangling tails
    (r":80/", "/"),                                  # default ports
    (r":443/", "/"),
    (r":80$", ""),
    (r":443$", ""),
    # final cleanup strips MIXED trailing runs of slash/separator:
    # the port/slash rules above can re-expose a dangling '?'/'&'
    # after the earlier separator repair already ran (".../p/&/" →
    # ".../p/&"), so the last rule must consume the whole run or
    # canonicalization loses idempotence (hypothesis-hunted case)
    (r"[?&/]+$", ""),
)
_URL_HEAD = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"    # scheme://host[:port]


def canonical_url(col: Column) -> Column:
    """Canonicalize a URL column: drop fragments and tracking
    parameters (repairing separators), strip default ports and
    trailing slashes, and lowercase the scheme+host (ONLY — paths and
    query values are case-significant). Idempotent: canonical of a
    canonical URL is itself. The dedup key for crawl frontier and
    fetched-content tables."""
    c = col
    for pat, repl in URL_CANON_RULES:
        c = F.regexp_replace(c, pat, repl)
    head = F.regexp_extract(c, _URL_HEAD, 0)
    return F.concat(F.lower(head), F.substr(c, F.length(head) + F.lit(1)))


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url`, from the same rule table."""
    c = expr
    for pat, repl in URL_CANON_RULES:
        c = f"regexp_replace({c}, '{pat}', '{repl}', 'g')"
    head = f"regexp_extract({c}, '{_URL_HEAD}')"
    # evaluate c once per branch is fine — engines fold the expression
    return f"(lower({head}) || substr({c}, length({head}) + 1))"


def url_host(col: Column) -> Column:
    """Lowercased host of a URL (no port) — the per-site aggregation
    key for crawl politeness/frequency stats."""
    return F.lower(
        F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)
    )


# --------------------------------------------------------------------------
# Gopher-style quality rules
# --------------------------------------------------------------------------

# "must contain at least min_stopwords of …" — Rae et al. 2021 use
# exactly this 8-word list
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

GOPHER_DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_ratio=0.1,     # '#' or '…'/'...' per word
    min_alpha_ratio=0.80,     # words containing ≥1 alphabetic char
    min_stopwords=2,          # distinct stopwords present
)


def gopher_quality_flags(
    df: DataFrame, id_col: str, text_col: str, **overrides
) -> DataFrame:
    """Per-document Gopher rule flags and the composed ``keep``
    decision: word-count bounds, mean-word-length bounds, symbol-to-
    word ratio, alphabetic-word fraction, and distinct-stopword
    presence (Rae et al. 2021 §A1.1; thresholds overridable, defaults
    in :data:`GOPHER_DEFAULTS`). Emits the measurements alongside the
    booleans so downstream triage can see WHY a document fell.

    All higher-order array expressions over one tokenization — a
    single narrow projection, no shuffle, no UDF; at 100 TB this is a
    map-only pass that fuses into whatever scan feeds it."""
    p = {**GOPHER_DEFAULTS, **overrides}
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    n_words = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_len = F.when(
        n_words > 0, sum_len.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    hashes = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"#", "")
    )
    ell = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"\.\.\.", "")
    )
    symbol_ratio = F.when(
        n_words > 0, (hashes + ell / 3).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_ratio = F.when(
        n_words > 0, alpha.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stops = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(toks, s))
    )
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stops.alias("n_stopwords"),
    )
    flags = out.select(
        "*",
        ((F.col("n_words") >= p["min_words"])
         & (F.col("n_words") <= p["max_words"])).alias("ok_words"),
        ((F.col("mean_word_len") >= p["min_mean_word_len"])
         & (F.col("mean_word_len") <= p["max_mean_word_len"])).alias("ok_mean_len"),
        (F.col("symbol_ratio") <= p["max_symbol_ratio"]).alias("ok_symbols"),
        (F.col("alpha_ratio") >= p["min_alpha_ratio"]).alias("ok_alpha"),
        (F.col("n_stopwords") >= p["min_stopwords"]).alias("ok_stopwords"),
    )
    return flags.select(
        "*",
        (F.col("ok_words") & F.col("ok_mean_len") & F.col("ok_symbols")
         & F.col("ok_alpha") & F.col("ok_stopwords")).alias("keep"),
    )


def gopher_flags_sql(table: str, id_col: str, text_col: str, **overrides) -> str:
    """DuckDB twin of :func:`gopher_quality_flags` from the same
    thresholds/stopword list (ratios are compared, never emitted raw —
    the query layer rounds what it exposes)."""
    p = {**GOPHER_DEFAULTS, **overrides}
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '\\s+'), t -> t <> '') AS t,
         {text_col} AS raw
  FROM {table}
), m AS (
  SELECT {id_col},
         len(t) AS n_words,
         CASE WHEN len(t) > 0
              THEN CAST(list_sum(list_transform(t, x -> LENGTH(x))) AS DOUBLE) / len(t)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN len(t) > 0
              THEN (LENGTH(raw) - LENGTH(replace(raw, '#', ''))
                    + (LENGTH(raw) - LENGTH(replace(raw, '...', ''))) / 3) / CAST(len(t) AS DOUBLE)
              ELSE 0.0 END AS symbol_ratio,
         CASE WHEN len(t) > 0
              THEN CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(t)
              ELSE 0.0 END AS alpha_ratio,
         len(list_filter([{stops}], s -> list_contains(t, s))) AS n_stopwords
  FROM toks
)
SELECT {id_col}, n_words, mean_word_len, symbol_ratio, alpha_ratio, n_stopwords,
       (n_words >= {p["min_words"]} AND n_words <= {p["max_words"]}) AS ok_words,
       (mean_word_len >= {p["min_mean_word_len"]} AND mean_word_len <= {p["max_mean_word_len"]}) AS ok_mean_len,
       (symbol_ratio <= {p["max_symbol_ratio"]}) AS ok_symbols,
       (alpha_ratio >= {p["min_alpha_ratio"]}) AS ok_alpha,
       (n_stopwords >= {p["min_stopwords"]}) AS ok_stopwords,
       ((n_words >= {p["min_words"]} AND n_words <= {p["max_words"]})
        AND (mean_word_len >= {p["min_mean_word_len"]} AND mean_word_len <= {p["max_mean_word_len"]})
        AND (symbol_ratio <= {p["max_symbol_ratio"]})
        AND (alpha_ratio >= {p["min_alpha_ratio"]})
        AND (n_stopwords >= {p["min_stopwords"]})) AS keep
FROM m
"""


# --------------------------------------------------------------------------
# C4-style line filtering
# --------------------------------------------------------------------------

# Raffel et al. 2020 (C4, §2.2): keep lines ending in terminal
# punctuation with at least `min_line_words` words and no "javascript"
# mention; drop pages containing lorem ipsum or a curly brace, or with
# fewer than `min_sentences` sentences after line filtering.
C4_DEFAULTS = dict(
    min_line_words=5,
    min_sentences=3,
)
_C4_TERMINAL = r"""[.!?"']\s*$"""
_C4_SENTENCE = r"[.!?]"
_C4_LINE_BAD = "javascript"
_C4_PAGE_BAD = ("lorem ipsum", "{")


def c4_line_filter(
    df: DataFrame, id_col: str, text_col: str, **overrides
) -> DataFrame:
    """C4's line- and page-level cleaning rules (Raffel et al. 2020
    §2.2) as one narrow projection: lines survive iff they end in
    terminal punctuation, carry at least ``min_line_words`` words, and
    do not mention javascript; the page survives iff it contains no
    lorem-ipsum/brace marker and the CLEANED text still holds at least
    ``min_sentences`` sentences. Emits the cleaned text plus the
    per-rule measurements so triage can see why a page fell.

    Scale: higher-order array expressions over one line split — a
    map-only pass, no UDF, no shuffle; at 100 TB it fuses into the
    scan exactly like :func:`gopher_quality_flags`."""
    p = {**C4_DEFAULTS, **overrides}
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(
        lines,
        lambda L: L.rlike(_C4_TERMINAL)
        & (
            F.size(
                F.filter(
                    F.split(F.trim(L), r"\s+"), lambda t: t != F.lit("")
                )
            )
            >= p["min_line_words"]
        )
        & ~F.lower(L).contains(_C4_LINE_BAD),
    )
    text_clean = F.array_join(kept, "\n")
    lowered = F.lower(F.col(text_col))
    has_lorem = lowered.contains(_C4_PAGE_BAD[0])
    has_brace = lowered.contains(_C4_PAGE_BAD[1])
    n_sentences = F.size(
        F.regexp_extract_all(text_clean, F.lit(_C4_SENTENCE), 0)
    )
    return df.select(
        F.col(id_col),
        text_clean.alias("text_clean"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        n_sentences.alias("n_sentences"),
        (
            ~has_lorem
            & ~has_brace
            & (n_sentences >= p["min_sentences"])
        ).alias("keep_page"),
    )


def c4_filter_sql(table: str, id_col: str, text_col: str, **overrides) -> str:
    """DuckDB twin of :func:`c4_line_filter` from the same rule
    constants."""
    p = {**C4_DEFAULTS, **overrides}
    term = _C4_TERMINAL.replace("'", "''")
    return f"""
WITH split AS (
  SELECT {id_col},
         string_split({text_col}, chr(10)) AS lines,
         lower({text_col}) AS lowered
  FROM {table}
), kept AS (
  SELECT {id_col}, lines, lowered,
         list_filter(lines, L ->
           regexp_matches(L, '{term}')
           AND len(list_filter(string_split_regex(trim(L), '\\s+'), t -> t <> '')) >= {p["min_line_words"]}
           AND NOT contains(lower(L), '{_C4_LINE_BAD}')
         ) AS kl
  FROM split
), m AS (
  SELECT {id_col},
         array_to_string(kl, chr(10)) AS text_clean,
         len(lines) AS n_lines,
         len(kl) AS n_lines_kept,
         contains(lowered, '{_C4_PAGE_BAD[0]}') AS has_lorem,
         contains(lowered, '{_C4_PAGE_BAD[1]}') AS has_brace
  FROM kept
)
SELECT {id_col}, text_clean, n_lines, n_lines_kept, has_lorem, has_brace,
       len(regexp_extract_all(text_clean, '{_C4_SENTENCE}')) AS n_sentences,
       (NOT has_lorem AND NOT has_brace
        AND len(regexp_extract_all(text_clean, '{_C4_SENTENCE}')) >= {p["min_sentences"]}) AS keep_page
FROM m
"""


def boilerplate_strip(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str = "host",
    text_col: str = "text",
    min_frac: float = 0.5,
    min_docs: int = 3,
    min_chars: int = 4,
    sep: str = "\n",
) -> DataFrame:
    """Per-group BOILERPLATE line removal — the crawl-curation step
    that strips site chrome (nav bars, cookie banners, copyright
    footers) the page-level quality filters cannot see: a line is
    boilerplate for a group (host/site/``source``) when it appears in
    at least ``min_docs`` documents AND at least ``min_frac`` of the
    group's documents. Matching is on the TRIMMED line; lines shorter
    than ``min_chars`` after trimming are never candidates (blank
    separators and bullets stay). Returns (id, group, text) with the
    surviving lines rejoined in original order — a document whose
    every line was boilerplate comes back as an empty string, not a
    dropped row.

    Scale shape: one posexplode to (doc, position, line) — O(corpus
    lines), the same fan-out every line-rule filter pays; the
    boilerplate DICTIONARY is one count-distinct groupBy on (group,
    line) joined against per-group doc totals — output is tiny (only
    lines crossing min_docs survive the having-clause) and the strip
    is a left-anti equi-join on (group, trimmed line) that AQE
    broadcasts at real scale. Reassembly sorts each document's kept
    lines inside one higher-order expression (array_sort of
    (pos, line) structs), never a per-doc window. No pairing, no
    per-host single tasks — a skewed giant host costs one hot
    aggregation key, not a hot task."""
    lines = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"),
    ).withColumn("__norm", F.trim(F.col("__line")))
    totals = docs.groupBy(group_col).agg(
        F.countDistinct(id_col).alias("__gdocs")
    )
    boiler = (
        lines.filter(F.length("__norm") >= min_chars)
        .groupBy(group_col, "__norm")
        .agg(F.countDistinct(id_col).alias("__n"))
        .join(totals, group_col)
        .filter(
            (F.col("__n") >= F.lit(min_docs))
            & (F.col("__n") >= F.col("__gdocs") * F.lit(min_frac))
        )
        .select(group_col, "__norm")
    )
    kept = lines.join(boiler, [group_col, "__norm"], "left_anti")
    rebuilt = kept.groupBy(id_col, group_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__line"))
                ),
                lambda s: s["__line"],
            ),
        ).alias(text_col)
    )
    # fully-boilerplate documents come back empty, never dropped
    return (
        docs.select(id_col, group_col)
        .join(rebuilt, [id_col, group_col], "left")
        .fillna({text_col: ""})
    )


# --------------------------------------------------------------------------
# license-signal detection (training-data compliance screening)
# --------------------------------------------------------------------------

# (tag, regex) in PRIORITY order: the first match wins — the most
# restrictive signals outrank permissive ones so a page carrying both
# "all rights reserved" boilerplate and a CC badge tags restrictive
# (the conservative read a compliance screen wants). Patterns are
# RE2/Java-portable (no backrefs/lookarounds) so the DuckDB twin is
# the same table.
LICENSE_RULES = (
    ("all-rights-reserved", r"(?i)all rights reserved"),
    ("cc-by-nc", r"(?i)creativecommons\.org/licenses/by-nc|CC[ -]BY[ -]NC"),
    ("cc-by-sa", r"(?i)creativecommons\.org/licenses/by-sa|CC[ -]BY[ -]SA"),
    ("cc-by-nd", r"(?i)creativecommons\.org/licenses/by-nd|CC[ -]BY[ -]ND"),
    ("cc-by", r"(?i)creativecommons\.org/licenses/by[/0-9]|CC[ -]BY\b"),
    ("cc0", r"(?i)creativecommons\.org/publicdomain|\bCC0\b"),
    ("public-domain", r"(?i)public domain"),
    ("mit", r"(?i)\bMIT licen[sc]e\b|SPDX-License-Identifier: MIT"),
    ("apache-2.0",
     r"(?i)\bApache Licen[sc]e,? Version 2|SPDX-License-Identifier: Apache-2\.0"),
    ("gpl", r"(?i)GNU General Public Licen[sc]e|SPDX-License-Identifier: GPL"),
)


def license_signal(col: Column) -> Column:
    """First-match license tag for a text column (``none`` when no
    signal fires) — the compliance screen training-data pipelines run
    before mixing a source in (The Stack's license filter, C4's
    policy screens). Pure codegen CASE over shared regex rules; the
    DuckDB twin derives from the SAME table
    (:func:`license_signal_sql`), so the tagging is cross-engine
    verifiable."""
    out = F.lit("none")
    for tag, pat in reversed(LICENSE_RULES):
        out = F.when(col.rlike(pat), F.lit(tag)).otherwise(out)
    return out


def license_signal_sql(expr: str) -> str:
    """DuckDB twin of :func:`license_signal`, generated from the same
    rule table."""
    out = "'none'"
    for tag, pat in reversed(LICENSE_RULES):
        p = pat.replace("'", "''")
        out = (
            f"CASE WHEN regexp_matches({expr}, '{p}') "
            f"THEN '{tag}' ELSE {out} END"
        )
    return out
