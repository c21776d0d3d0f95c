"""Text analysis operators (SURVEY.md §2C D4): quality scoring,
language ID, token counting, document fingerprinting.

Everything is built-in-function composition (no UDFs): at 100 TB these
run inside whole-stage codegen over the scan, shuffling nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from skopje_spark.queries.rounding import dround

from skopje_spark.operators.dedup import normalize_text

# tiny per-language marker lexicons for the n-gram/stopword heuristic;
# deterministic and oracle-reproducible (plain regex counts)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "des"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# \w-style word tokens OR single non-space punctuation — a BPE-ish
# pre-tokenizer shape, kept RE2/Java-regex compatible
TOKEN_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def word_tokens(text: Column) -> Column:
    return F.filter(F.split(normalize_text(text), " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Regex token count (word pieces + punctuation singles)."""
    return F.size(F.regexp_extract_all(normalize_text(text), F.lit(TOKEN_PATTERN), 0))


def stopword_ratio(text: Column) -> Column:
    toks = word_tokens(text)
    stops = F.size(
        F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    )
    return F.when(F.size(toks) > 0, stops / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(F.lit(0.0))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality-scoring feature block: lengths, token stats, ratios and
    a composite keep/drop flag (the usual pre-training filter shape)."""
    from skopje_spark.tables import ensure_parallelism

    df = ensure_parallelism(df)
    text = F.col(text_col)
    toks = word_tokens(text)
    n_words = F.size(toks)
    avg_wlen = F.when(
        n_words > 0,
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n_words,
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.length(text).alias("n_chars_actual"),
        n_words.alias("n_words"),
        dround(avg_wlen, 4).alias("avg_word_len"),
        dround(stopword_ratio(text), 4).alias("stopword_ratio"),
        dround(punct_ratio(text), 4).alias("punct_ratio"),
        token_count(text).alias("n_tokens"),
        (
            (F.length(text) >= 32)
            & (n_words >= 8)
            & (F.size(F.array_distinct(toks)) / F.greatest(n_words, F.lit(1)) > 0.2)
        )
        .cast("int")
        .alias("quality_keep"),
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    """Per-language marker-hit counts over the word-token set."""
    toks = word_tokens(text)
    out = []
    for lang, markers in LANG_MARKERS.items():
        out.append(
            (lang, F.size(F.filter(toks, lambda t: t.isin(*markers))))
        )
    return out


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: argmax of marker-hit counts with a
    deterministic tiebreak (language name ascending); 'und' when no
    marker hits at all."""
    scores = lang_scores(F.col(text_col))
    pairs = F.array(
        *[F.struct(cnt.alias("hits"), F.lit(lang).alias("lang")) for lang, cnt in scores]
    )
    # max by (hits desc, lang asc): sort ascending by (hits, reversed lang)
    best = F.array_max(pairs)  # struct compare: hits first, then lang
    # array_max ties on lang descending; invert by preferring earliest
    # lexicographic lang among max hits via a second pass
    max_hits = best.getField("hits")
    winners = F.filter(pairs, lambda s: s.getField("hits") == max_hits)
    pred = F.when(
        max_hits > 0, F.array_min(winners).getField("lang")
    ).otherwise(F.lit("und"))
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: sha256 over the canonical normalized form
    (lowercase, punctuation stripped, whitespace collapsed) — stable
    under cosmetic edits; plus a 16-hex short form for bucketing."""
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    full = F.sha2(canon, 256)
    return df.select(
        F.col(id_col),
        full.alias("fingerprint"),
        F.substring(full, 1, 16).alias("fingerprint16"),
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash scheme behind
    MOSS): hash every character k-gram, slide a window of w
    consecutive hashes, keep each window's minimum — a position-robust
    fingerprint set that survives local edits (unlike the whole-text
    sha256 of :func:`fingerprint`).

    All array HOFs over the normalized text — no UDF, no shuffle
    before the final distinct. The O(n·w) window-min via slice is fine
    at document granularity; a deque-based O(n) pandas kernel is the
    swap-in if w grows large. sha256-prefix hashes keep the selection
    cross-engine deterministic.
    """
    norm = normalize_text(F.col(text_col))
    gram_hash = (
        f"transform(sequence(1, greatest(length(__norm) - {k} + 1, 0)), "
        f"i -> cast(conv(substr(sha2(substring(__norm, i, {k}), 256), 1, 15), 16, 10) as bigint))"
    )
    window_min = (
        f"transform(sequence(1, greatest(size(__grams) - {w} + 1, 1)), "
        f"j -> array_min(slice(__grams, j, {w})))"
    )
    return (
        df.withColumn("__norm", norm)
        .filter(F.length("__norm") >= k)
        .withColumn("__grams", F.expr(gram_hash))
        .withColumn("__fps", F.expr(window_min))
        .select(F.col(id_col), F.explode(F.array_distinct("__fps")).alias("fp"))
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Tokenize (whitespace over normalized text, shared with
    :func:`word_tokens` and the DuckDB oracles) → term frequency per
    (doc, term) → document frequency per term → score. IDF uses the
    *linear* variant ``(N + 1) / (df + 1)`` instead of its logarithm:
    the ranking per document is identical (log is monotone) and the
    score stays a ratio of exact integers, so it is bit-identical
    across engines — ``ln`` can differ in the last ulp between libm
    implementations, which the hash-compare gate would see.

    Plan: explode → two hash aggregates (term counts ride one shuffle
    on (doc, term), doc frequencies one on term) → broadcast the
    1-row corpus size → per-doc top-k via row_number (rank shuffle is
    on doc_id). No UDFs; everything in whole-stage codegen.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.col("n_docs") + 1.0) / (F.col("df") + 1.0),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (name, pattern, replacement) applied in order. Patterns stay inside
# the RE2 ∩ Java-regex common subset (no lookaround, no backrefs) so
# the Spark operator and the DuckDB oracle compile the same automaton.
# Email requires an alphabetic TLD (avoids eating version strings);
# a numeric-host address like user@10.0.0.1 therefore degrades to
# user@<IP> via the IPv4 rule rather than <EMAIL>.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{1,3}-\d{3}-\d{3,4}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(
    text: Column, patterns: list[tuple[str, str, str]] = PII_PATTERNS
) -> Column:
    """Scrub PII spans with typed placeholder tokens.

    A chain of JVM-side regexp_replace calls — per-row, no shuffle, no
    UDF; at 100 TB this is a pure map fused into the scan stage.
    """
    for _, pat, repl in patterns:
        text = F.regexp_replace(text, pat, repl)
    return text


def redact_pii_sql(
    expr: str, patterns: list[tuple[str, str, str]] = PII_PATTERNS
) -> str:
    """DuckDB-dialect mirror of :func:`redact_pii` (single source of
    truth: the same PII_PATTERNS table). Single-quoted literals in
    DuckDB pass backslashes through to RE2 unmodified."""
    for _, pat, repl in patterns:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


# ---------------------------------------------------------------------------
# Repetition features (Gopher-style repetitiousness signals)
# ---------------------------------------------------------------------------


def repetition_features(
    df: DataFrame, id_col: str, text_col: str, *, ngram: int = 2
) -> DataFrame:
    """Per-document repetition signals used by quality filters:

    - ``top_word_frac`` — occurrences of the most frequent token over
      total tokens (boilerplate/spam pages score high);
    - ``dup_word_frac`` — fraction of token occurrences beyond each
      token's first (1 − distinct/total);
    - ``dup_gram_frac`` — fraction of word ``ngram``-gram occurrences
      whose gram appears more than once (token-level variant of the
      Gopher duplicate-n-gram-character rule).

    Plan: one explode + two hash aggregates per granularity, joined on
    the document key — every shuffle key is (doc_id[, token]), so the
    job partitions by document and scales linearly in corpus size.
    """
    from skopje_spark.operators.dedup import _shingles_raw

    toks = df.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("tok")
    )
    per_tok = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    words = per_tok.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.max("c").alias("top_word_n"),
        F.count(F.lit(1)).alias("n_distinct_words"),
    )
    per_gram = (
        _shingles_raw(df, id_col, text_col, ngram)
        .groupBy(id_col, "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grams = per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_gram_n"),
    )
    return (
        words.join(grams, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_words"),
            dround(F.col("top_word_n") / F.col("n_words"), 4).alias("top_word_frac"),
            dround(
                1.0 - F.col("n_distinct_words") / F.col("n_words"), 4
            ).alias("dup_word_frac"),
            dround(
                F.coalesce(F.col("dup_gram_n"), F.lit(0))
                / F.greatest(F.coalesce(F.col("n_grams"), F.lit(0)), F.lit(1)),
                4,
            ).alias("dup_gram_frac"),
        )
    )


def frequent_ngrams(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, top_k: int = 20
) -> DataFrame:
    """Corpus-wide heavy hitters over word n-grams: the standard
    boilerplate / template detector (headers, footers, licence blocks
    surface as n-grams with anomalously high document frequency).
    Output: ``(ngram, n_docs, n_occ)`` — top ``top_k`` by document
    frequency, total order (n_docs desc, n_occ desc, ngram asc) so the
    cut is deterministic.

    Scale: one groupBy on the gram (map-side partial agg collapses
    each partition to its local gram counts before the shuffle), then
    top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    heaps, no global sort). The shuffle key is gram TEXT here for
    oracle transparency; at 100 TB group on the 60-bit shingle hash
    (operators/dedup.py:shingle_hashes) and join the top-k hashes back
    to text — the count pass then shuffles 8-byte longs."""
    from skopje_spark.operators.dedup import _shingles_raw

    sh = _shingles_raw(df, id_col, text_col, n)
    return (
        sh.groupBy(F.col("shingle").alias("ngram"))
        .agg(
            F.countDistinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("ngram"))
        .limit(top_k)
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 ranked retrieval over the corpus — the classic lexical
    scoring the inverted index (q_inverted_index) exists to serve:

        score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
        idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)      (Lucene form)

    Returns the ``top_k`` documents as ``(id, score)``, ordered by
    the 6-dp-rounded score with the id as total-order tiebreak (both
    engines pick identical rows). N and avgdl count documents with at
    least one token (tokenless docs can match nothing and are out of
    the statistics on both engines).

    Scale: corpus statistics (N, avgdl) are a one-row broadcast; per-
    term df is a |query|-row broadcast; the only corpus-sized work is
    the token explode + two map-side-combined groupBys, with the tf
    table filtered to query terms BEFORE any shuffle — scoring cost
    follows the query's postings, not the corpus. No UDF anywhere.
    """
    import re as _re

    from skopje_spark.tables import ensure_parallelism

    # normalize query terms with the SAME rule as corpus tokens
    # (lowercase [a-z]+ runs) — a verbatim 'Paris' or 'état-major'
    # could otherwise never match any corpus token, silently
    query_terms = [
        t
        for raw in query_terms
        for t in _re.findall(r"[a-z]+", str(raw).lower())
    ]
    if not query_terms:
        raise ValueError("bm25_scores: no usable query terms after "
                         "normalization (lowercase a-z runs)")

    # short-list contract: query_terms is a request, not a table — a
    # handful of terms, so one array-count column per term is cheap.
    # Deduped under a sorted order so the per-document score sum has a
    # fixed term order (the old groupBy-sum order was arbitrary).
    terms = sorted(set(query_terms))

    # EXPLODE-FREE plan (measured ~5x faster than the previous
    # explode+groupBy shape at sf0.1, and strictly better at scale):
    # per-document dl and per-term tf are array expressions over ONE
    # tokenize — a narrow codegen map, so the corpus is never
    # shuffled at all. Corpus statistics (N, avgdl) and every term's
    # df collapse into a SINGLE one-row aggregate (map-side combined),
    # broadcast back for scoring; the only distributed ordering work
    # left is the final top-k (TakeOrderedAndProject).
    toks_arr = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")

    def _tf(term: str):
        # nested function (not a 2-arg lambda: pyspark would read a
        # second lambda parameter as the array INDEX column)
        return F.size(F.filter(toks_arr, lambda t: t == F.lit(term)))

    per_doc = ensure_parallelism(df).select(
        F.col(id_col),
        F.size(toks_arr).alias("__dl"),
        *[_tf(term).alias(f"__tf_{i}") for i, term in enumerate(terms)],
    ).filter(F.col("__dl") > 0)  # tokenless docs: outside N/avgdl, match nothing
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("__dl").alias("avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    norm = k1 * (1.0 - b + b * F.col("__dl") / F.col("avgdl"))
    term_scores = [
        F.when(
            F.col(f"__tf_{i}") > 0,
            F.log(
                (F.col("n_docs") - F.col(f"__df_{i}") + 0.5)
                / (F.col(f"__df_{i}") + 0.5)
                + 1.0
            )
            * (F.col(f"__tf_{i}") * (k1 + 1))
            / (F.col(f"__tf_{i}") + norm),
        ).otherwise(F.lit(0.0))
        for i in range(len(terms))
    ]
    total = term_scores[0]
    for ts in term_scores[1:]:
        total = total + ts
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        # same result set as the old postings join: only documents
        # matching >= 1 query term are ranked
        .filter(
            sum(F.col(f"__tf_{i}") for i in range(len(terms))) > 0
        )
        .select(F.col(id_col), dround(total, 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(top_k)


# ---------------------------------------------------------------------------
# unicode hygiene: normalization + control stripping + mojibake repair
# ---------------------------------------------------------------------------

_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def unicode_clean(
    col: Column, *, form: str = "NFC", strip_controls: bool = True
) -> Column:
    """Unicode-normalize a text column (NFC/NFKC/NFD/NFKD) and strip
    the C0/DEL control characters crawls are full of (newline, tab,
    and CR survive — they are structure, not junk). Spark SQL has no
    normalization builtin, so the normalize step is an Arrow-batched
    pandas UDF (unicodedata is a table lookup, not a tokenizer — the
    batch overhead dominates, not the per-char work); the control
    strip stays codegen (regexp_replace). The canonical first pass of
    every web-text pipeline: combining sequences collapse to
    precomposed forms so downstream hashing/dedup/shingling see one
    spelling per grapheme."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def make(f):
        def norm(s):
            import unicodedata

            return s.map(
                lambda x: unicodedata.normalize(f, x)
                if x is not None else None
            )
        return pandas_udf(norm, "string")

    out = make(form)(col)
    if strip_controls:
        out = F.regexp_replace(out, _CONTROL_RE, "")
    return out


def fix_mojibake(col: Column) -> Column:
    """Repair the single most common crawl encoding wreck: UTF-8 bytes
    decoded as Latin-1/cp1252 ("Ã©" for "é"). A row is repaired ONLY
    when the round trip is proof-positive — the text re-encodes to
    cp1252 AND those bytes decode as valid UTF-8 AND the repair
    strictly shrinks the string (real mojibake always does; plain
    ASCII and legitimate Latin-1 text fail one of the three and pass
    through untouched). Arrow-batched pandas UDF; apply before
    :func:`unicode_clean`."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def repair_one(x):
        if x is None or not any(ord(c) > 127 for c in x):
            return x
        # cp1252 first (the common read-side codec), latin-1 second
        # (covers C1 bytes cp1252 leaves undefined)
        for codec in ("cp1252", "latin-1"):
            try:
                fixed = x.encode(codec).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            if len(fixed) < len(x):
                return fixed
        return x

    def repair(s):
        return s.map(repair_one)

    return pandas_udf(repair, "string")(col)
