"""Training-data curation queries: PII redaction, repetition-based
quality signals, deterministic splits/quotas/mixtures, and benchmark
contamination checks.

These extend the reference's ETL surface (which moves whole tables,
`/root/reference/src/etl.rs:14-28`) with the corpus-curation operators
a pretraining pipeline needs. All membership decisions are Knuth-hash
deterministic (operators/sampling.py), so every oracle recomputes the
exact same sample — no rand() anywhere.

The PII fixture text is synthesized deterministically from customer
keys (the fixtures carry no real PII), identically on both engines, so
the redaction regexes are exercised on realistic email/phone/IP spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skopje_spark.operators.sampling import (
    KNUTH,
    MOD,
    cap_per_group,
    hash_bucket,
    mixture_sample,
    split_assign,
)
from skopje_spark.operators.text import (
    redact_pii,
    redact_pii_sql,
    repetition_features,
)
from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround, dround_sql
from skopje_spark.tables import load_table

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

_PII_RAW_SQL = (
    "'contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)"
    " || '@example.com or call +1-'"
    " || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')"
    " || '-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.' || CAST(c_custkey % 256 AS VARCHAR)"
    " || '.0.' || CAST(c_custkey % 100 AS VARCHAR)"
)


def _pii_raw_col() -> F.Column:
    k = F.col("c_custkey")
    s = lambda c: c.cast("string")  # noqa: E731
    return F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" at user"),
        s(k),
        F.lit("@example.com or call +1-"),
        F.lpad(s(k % 1000), 3, "0"),
        F.lit("-555-"),
        F.lpad(s(k % 10000), 4, "0"),
        F.lit(" from 10."),
        s(k % 256),
        F.lit(".0."),
        s(k % 100),
    )


@register(
    "q_text_pii_redact",
    oracle=f"""
    SELECT c_custkey,
           {redact_pii_sql(_PII_RAW_SQL)} AS clean_text
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("text", "pii", "llm-pipeline"),
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/text.py:redact_pii): typed placeholder
    substitution for emails, phone numbers, and IPv4 addresses over a
    deterministically synthesized contact blurb per customer. The
    regex chain is a pure JVM-side map fused into the scan — zero
    shuffle at any scale."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            redact_pii(_pii_raw_col()).alias("clean_text"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Repetition / boilerplate signals
# ---------------------------------------------------------------------------

_REP_TOKS = r"""
t AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
           x -> x <> '')) AS tok
  FROM documents
),
per_tok AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok),
words AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, MAX(c) AS top_word_n,
         COUNT(*) AS n_distinct_words
  FROM per_tok GROUP BY doc_id
),
tokarr AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
  FROM documents
),
per_gram AS (
  SELECT doc_id, shingle, COUNT(*) AS c FROM (
    SELECT doc_id, ts[i] || ' ' || ts[i+1] AS shingle
    FROM tokarr,
         UNNEST(CASE WHEN len(ts) >= 2 THEN range(1, len(ts)) ELSE [] END) AS u(i)
  ) GROUP BY doc_id, shingle
),
grams AS (
  SELECT doc_id, SUM(c) AS n_grams,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_gram_n
  FROM per_gram GROUP BY doc_id
)
"""


@register(
    "q_text_repetition",
    oracle=f"""
    WITH {_REP_TOKS}
    SELECT w.doc_id,
           w.n_words,
           {dround_sql('w.top_word_n / CAST(w.n_words AS DOUBLE)', 4)} AS top_word_frac,
           {dround_sql('1.0 - w.n_distinct_words / CAST(w.n_words AS DOUBLE)', 4)} AS dup_word_frac,
           {dround_sql('COALESCE(g.dup_gram_n, 0) / CAST(GREATEST(COALESCE(g.n_grams, 0), 1) AS DOUBLE)', 4)} AS dup_gram_frac
    FROM words w LEFT JOIN grams g USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("text", "quality", "llm-pipeline"),
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (operators/text.py:
    repetition_features): top-word fraction, duplicate-token fraction,
    duplicate-bigram fraction — the boilerplate/spam detectors quality
    filters threshold on. Shuffles only on (doc_id[, token]) keys."""
    d = load_table(spark, sf_dir, "documents")
    return repetition_features(d, "doc_id", "text", ngram=2).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Deterministic splits, quotas, mixtures
# ---------------------------------------------------------------------------

_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_TRAIN_HI = int(0.8 * MOD)
_VAL_HI = int(0.9 * MOD)


@register(
    "q_sample_split_assign",
    oracle=f"""
    SELECT split, source, COUNT(*) AS n_docs
    FROM (
      SELECT source,
             CASE WHEN (doc_id * {KNUTH}) % {MOD} < {_TRAIN_HI} THEN 'train'
                  WHEN (doc_id * {KNUTH}) % {MOD} < {_VAL_HI} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split, source
    ORDER BY split, source
    """,
    tags=("sample", "split", "llm-pipeline"),
)
def q_sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named train/val/test assignment by hash-range prefix
    (operators/sampling.py:split_assign). Prefix ranges mean growing
    'train' never moves a doc between 'val' and 'test' — the stability
    property dataset versioning needs. Narrow map + one count shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        split_assign(d, "doc_id", _SPLITS)
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "source")
    )


@register(
    "q_sample_group_cap",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY (doc_id * {KNUTH}) % {MOD}, doc_id
    ) <= 20
    ORDER BY doc_id
    """,
    tags=("sample", "quota", "llm-pipeline"),
)
def q_sample_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota (operators/sampling.py:cap_per_group): keep at
    most 20 docs per source, lowest-hash first — stops one crawl
    domain from dominating the corpus. One shuffle on the group key;
    for pathologically hot groups, rate-prefilter then cap."""
    d = load_table(spark, sf_dir, "documents")
    return (
        cap_per_group(d, ["source"], "doc_id", 20)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


_MIX_RATES = {"src0": 0.8, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1


@register(
    "q_sample_mixture",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE (doc_id * {KNUTH}) % {MOD}
          < (CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.5
                         WHEN 'src2' THEN 0.25 ELSE 0.1 END) * {MOD}
    ORDER BY doc_id
    """,
    tags=("sample", "mixture", "llm-pipeline"),
)
def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture reweighting (operators/sampling.py:mixture_sample):
    per-source keep rates (oversample src0, downsample the long tail).
    Nested property: raising a rate strictly grows that source's
    sample. Pure narrow filter — no shuffle at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return (
        mixture_sample(d, "source", _MIX_RATES, "doc_id", default_rate=_MIX_DEFAULT)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Benchmark contamination
# ---------------------------------------------------------------------------

_BENCH_CUT = MOD // 20  # ~5% of docs play the "benchmark set"


@register(
    "q_contamination_ngram",
    oracle=f"""
    WITH tokarr AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ts
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
      FROM tokarr,
           UNNEST(CASE WHEN len(ts) >= 3 THEN range(1, len(ts) - 1) ELSE [] END) AS u(i)
    ),
    bench AS (
      SELECT DISTINCT shingle FROM sh
      WHERE (doc_id * {KNUTH}) % {MOD} < {_BENCH_CUT}
    ),
    train AS (
      SELECT * FROM sh
      WHERE NOT ((doc_id * {KNUTH}) % {MOD} < {_BENCH_CUT})
    )
    SELECT t.doc_id,
           COUNT(*) AS n_grams,
           COUNT(b.shingle) AS n_contaminated,
           {dround_sql('COUNT(b.shingle) / CAST(COUNT(*) AS DOUBLE)', 4)} AS contaminated_frac
    FROM train t LEFT JOIN bench b USING (shingle)
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("text", "contamination", "llm-pipeline"),
)
def q_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: per training doc, how many of
    its distinct word 3-grams also appear in the held-out benchmark
    slice (~5% of docs by hash). The standard pre-training hygiene
    check (n-gram overlap à la GPT-3/PaLM decontamination).

    Scale plan: grams are compared in 64-bit xxhash space
    (operators/dedup.py:shingle_hashes), so the join key is an 8-byte
    long; the benchmark gram set is tiny relative to the corpus and is
    broadcast — the 100 TB training side never shuffles."""
    from skopje_spark.operators.dedup import shingle_hashes

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_hashes(d, "doc_id", "text", 3, unique_ids=True)
    is_bench = hash_bucket("doc_id") < _BENCH_CUT
    bench_h = (
        sh.filter(is_bench).select("h").distinct().withColumn("__hit", F.lit(1))
    )
    train = sh.filter(~is_bench)
    return (
        train.join(F.broadcast(bench_h), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_contaminated"),
            dround(F.count("__hit") / F.count(F.lit(1)), 4).alias(
                "contaminated_frac"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "q_sample_weighted",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             ln(((doc_id * {KNUTH}) % {MOD} + 1) / ({MOD} + 1.0)) / length(text) AS sc
      FROM documents
      WHERE length(text) > 0
    )
    SELECT doc_id FROM s ORDER BY sc DESC, doc_id LIMIT 100
    """,
    tags=("sample", "weighted", "llm-pipeline"),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample of 100 documents, weight = text
    length (operators/sampling.py:weighted_sample — Efraimidis-Spirakis
    with hash-derived randomness, so both engines select the identical
    set). Narrow score map + TakeOrderedAndProject; no corpus shuffle."""
    from skopje_spark.operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    return (
        weighted_sample(d, "doc_id", F.length("text"), 100)
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "q_histogram_equidepth",
    oracle="""
    WITH r AS (
      SELECT CAST(length(text) AS BIGINT) AS text_len, doc_id,
             ROW_NUMBER() OVER (ORDER BY length(text), doc_id) - 1 AS rk,
             COUNT(*) OVER () AS n
      FROM documents
    )
    SELECT CAST(CASE WHEN rk < ((n // 8) + 1) * (n % 8)
                THEN rk // ((n // 8) + 1)
                ELSE (n % 8) + (rk - ((n // 8) + 1) * (n % 8)) // GREATEST(n // 8, 1)
                END AS INT) AS bucket,
           COUNT(*) AS n_rows,
           MIN(text_len) AS min_text_len,
           MAX(text_len) AS max_text_len
    FROM r GROUP BY 1 ORDER BY 1
    """,
    tags=("stats", "histogram", "llm-pipeline"),
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equal-frequency histogram of document lengths, 8 buckets
    (operators/stats.py:equidepth_histogram). The oracle's single-task
    NTILE-style window is exactly what the operator avoids: the same
    integer bucket arithmetic rides the scalable two-pass prefix sum,
    with ties broken by doc_id in both engines."""
    from skopje_spark.operators.stats import equidepth_histogram

    d = load_table(spark, sf_dir, "documents").select(
        F.length("text").cast("bigint").alias("text_len"), "doc_id"
    )
    return equidepth_histogram(d, "text_len", "doc_id", n_buckets=8)


_BUDGETS = {"src0": 3000, "src1": 5000}
_BUDGET_DEFAULT = 2000


@register(
    "q_sample_budget",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source, n_chars,
             (doc_id * {KNUTH}) % {MOD} AS u
      FROM documents
    ),
    c AS (
      SELECT *, COALESCE(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY u, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM s
    )
    SELECT doc_id, source, n_chars FROM c
    WHERE cum + n_chars <= (CASE WHEN source = 'src0' THEN 3000
                                 WHEN source = 'src1' THEN 5000
                                 ELSE 2000 END)
    ORDER BY doc_id
    """,
    tags=("sample", "budget", "llm-pipeline"),
)
def q_sample_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-budget fill
    (operators/sampling.py:budget_sample): docs are taken in
    deterministic hash order until each source's budget would
    overflow (src0 3k chars, src1 5k, others 2k — swap n_chars for a
    token count to make it a token budget). The oracle's per-group
    window is what the operator replaces with the range-partitioned
    prefix sum, so quotas stay exact with any number of groups on any
    cluster width."""
    from skopje_spark.operators.sampling import budget_sample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return (
        budget_sample(
            d, "source", "n_chars", "doc_id", _BUDGETS,
            default_budget=_BUDGET_DEFAULT,
        )
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "q_curation_pipeline",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, text,
             list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               t -> t <> '') AS toks
      FROM documents
    ),
    q AS (
      SELECT doc_id, source, text,
             len(regexp_extract_all(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
               '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS n_tokens
      FROM base
      WHERE LENGTH(text) >= 32 AND len(toks) >= 8
        AND len(list_distinct(toks)) / CAST(GREATEST(len(toks), 1) AS DOUBLE) > 0.2
    ),
    dd AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn
      FROM q
    ),
    s AS (
      SELECT * FROM dd
      WHERE rn = 1 AND (doc_id * {KNUTH}) % {MOD} < {MOD // 2}
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY source
    """,
    tags=("llm-pipeline", "curation", "composed"),
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pass composed from the engine's own operators
    in one plan: quality gate (quality_features keep flag) → exact
    dedup (sha256-normalized, min-id representative, dedup_exact) →
    deterministic 50% Knuth-hash sample (hash_bucket) → per-source
    doc/token accounting. The oracle re-derives every stage in SQL, so
    the cross-engine hash verifies the COMPOSITION, not just the
    pieces — the end-to-end "raw corpus in, training corpus out"
    contract.

    Scale: quality gate and sample are narrow filters in the scan
    stage; dedup is one digest-keyed shuffle; accounting is a
    map-side-combined agg. Nothing materializes between stages —
    Catalyst pipelines the whole pass."""
    from skopje_spark.operators.dedup import dedup_exact
    from skopje_spark.operators.text import quality_features

    d = load_table(spark, sf_dir, "documents")
    q = (
        quality_features(d, "doc_id", "text")
        .filter(F.col("quality_keep") == 1)
        .select("doc_id", "n_tokens")
    )
    kept = d.select("doc_id", "source", "text").join(q, "doc_id")
    dd = dedup_exact(kept, "doc_id", "text")
    sampled = dd.filter(hash_bucket("doc_id") < MOD // 2)
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@register(
    "q_chunk_tokens",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(text, '[A-Za-z0-9]+') AS t,
             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_id,
             list_slice(t, i * 48 + 1, i * 48 + 64) AS ct
      FROM toks,
           UNNEST(range(0, CAST(FLOOR(GREATEST(n - 17, 0) / 48) AS BIGINT) + 1))
             AS u(i)
      WHERE n > 0
    )
    SELECT doc_id, chunk_id,
           CAST(len(ct) AS INTEGER) AS n_chunk_tokens,
           sha256(array_to_string(ct, ' ')) AS chunk_sha
    FROM chunks
    """,
    tags=("chunking", "tokens", "packing", "llm-pipeline"),
)
def q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (operators/packing.py:chunk_by_tokens):
    64-token chunks with 16-token overlap — the context-length-aware
    split used when chunk boundaries must fall between tokens. Exact
    oracle: DuckDB re-derives the same token windows (shared regex,
    same stride arithmetic) and both engines hash each chunk's
    reassembled text, so one token off in any window mismatches."""
    from skopje_spark.operators.packing import chunk_by_tokens

    d = load_table(spark, sf_dir, "documents")
    ch = chunk_by_tokens(
        d, tokens_per_chunk=64, overlap=16, token_pattern="[A-Za-z0-9]+"
    )
    return ch.select(
        "doc_id",
        "chunk_id",
        "n_chunk_tokens",
        F.sha2(F.col("chunk_text"), 256).alias("chunk_sha"),
    )


@register(
    "q_mixture_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    z AS (
      SELECT SUM(POWER(CAST(n AS DOUBLE), 0.5)) AS z, SUM(n) AS total
      FROM counts
    )
    SELECT source, n,
           {dround_sql('POWER(CAST(n AS DOUBLE), 0.5) / z.z', 6)} AS weight,
           {dround_sql('(POWER(CAST(n AS DOUBLE), 0.5) / z.z) / (CAST(n AS DOUBLE) / z.total)', 6)}
             AS boost
    FROM counts CROSS JOIN z
    ORDER BY source
    """,
    tags=("sampling", "mixture", "temperature", "llm-pipeline"),
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced mixture weights per source (τ=0.5 —
    operators/sampling.py:temperature_weights): the rule that decides
    how hard to up-sample small sources and down-sample dominant ones
    before a training run; the emitted weight table is the rates input
    for mixture_sample/weighted_sample. Closed-form oracle recomputes
    n^τ / Σ n^τ and the boost vs natural share."""
    from skopje_spark.operators.sampling import temperature_weights

    d = load_table(spark, sf_dir, "documents")
    w = temperature_weights(d, "source", tau=0.5)
    return w.select(
        "source",
        "n",
        dround(F.col("weight"), 6).alias("weight"),
        dround(F.col("boost"), 6).alias("boost"),
    ).orderBy("source")


@register(
    "q_dedup_canonical",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               ORDER BY length(text) DESC, doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
    tags=("dedup", "canonical", "curation", "llm-pipeline"),
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best exact dedup (operators/dedup.py:dedup_canonical):
    one survivor per normalized-content group chosen by quality
    ordering (longest text, then min id) rather than min-id — the
    curation policy that keeps the fullest copy and drops mirrors /
    truncations. The oracle re-derives the identical normalization
    (collapse whitespace, trim, lowercase), grouping hash, and
    ordering."""
    from skopje_spark.operators.dedup import dedup_canonical

    d = load_table(spark, sf_dir, "documents")
    out = dedup_canonical(d, "doc_id", "text")
    return out.select("doc_id", "lang", "n_chars")


@register(
    "q_corpus_report",
    oracle=f"""
    WITH per_doc AS (
      SELECT source, lang,
             len(regexp_extract_all(lower(text), '[a-z]+')) AS n_toks
      FROM documents
    ),
    lang_share AS (
      SELECT source, lang, COUNT(*) AS n_docs_lang
      FROM per_doc GROUP BY source, lang
    ),
    src AS (
      SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS total_tokens
      FROM per_doc GROUP BY source
    )
    SELECT src.source, src.n_docs, src.total_tokens,
           {dround_sql(
              'SUM(-(CAST(n_docs_lang AS DOUBLE) / src.n_docs) '
              '* ln(CAST(n_docs_lang AS DOUBLE) / src.n_docs))', 6)}
             AS lang_entropy
    FROM src JOIN lang_share USING (source)
    GROUP BY src.source, src.n_docs, src.total_tokens
    ORDER BY src.source
    """,
    tags=("profiling", "report", "entropy", "llm-pipeline"),
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus report card per source: document count, total token
    count, and the Shannon entropy of the language distribution (the
    diversity number a data card quotes; 0 = monolingual source).
    Two keyed aggregates + one vocabulary-free scan — the shape of a
    daily corpus-health job at any scale. ln/avg float drift is
    dround-absorbed; token counts are exact integers."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        "lang",
        F.size(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("n_toks"),
    )
    lang_share = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs_lang")
    )
    src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
    )
    p = F.col("n_docs_lang").cast("double") / F.col("n_docs")
    return (
        src.join(lang_share, "source")
        .groupBy("source", "n_docs", "total_tokens")
        .agg(dround(F.sum(-p * F.log(p)), 6).alias("lang_entropy"))
        .orderBy("source")
    )


@register(
    "q_dedup_time_window",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, event_type,
             epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS prev_us
      FROM events
    )
    SELECT event_id, user_id, event_type
    FROM seq
    WHERE prev_us IS NULL OR us - prev_us > 1800000000
    """,
    tags=("dedup", "window", "events", "retry-collapse"),
)
def q_dedup_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed dedup (retry-collapse): drop an event when the
    SAME (user, type) occurred within the last 30 minutes — the batch
    twin of the streaming dedup_within_watermark, and the recrawl
    rule 'same content seen again too soon is a duplicate'. A lag
    window per key; rows survive when they open a new 30-minute
    island. One shuffle on the dedup key.

    Gap arithmetic is exact MICROSECONDS on both engines
    (unix_micros / epoch_us) — a seconds-truncating cast would desync
    from the oracle for gaps inside (1800 s, 1801 s)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    return (
        e.withColumn("__prev", prev)
        .filter(
            F.col("__prev").isNull()
            | (us - F.col("__prev") > F.lit(1_800_000_000))
        )
        .select("event_id", "user_id", "event_type")
    )


@register(
    "q_curation_pipeline_v2",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id, source, text,
             list_filter(string_split(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
               t -> t <> '') AS toks
      FROM documents
    ),
    q AS (
      SELECT doc_id, source, text FROM raw
      WHERE LENGTH(text) >= 32 AND len(toks) >= 8
        AND len(list_distinct(toks)) / CAST(GREATEST(len(toks), 1) AS DOUBLE) > 0.2
    ),
    dd AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                 ORDER BY doc_id) AS rn
        FROM q
      ) WHERE rn = 1
    ),
    base AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
      FROM dd
    ),
    grams AS (
      SELECT doc_id, i AS pos, i + 7 AS "end",
             ('0x' || substr(sha256(
               ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' ||
               ts[i+4] || ' ' || ts[i+5] || ' ' || ts[i+6] || ' ' || ts[i+7]
             ), 1, 15))::BIGINT AS h
      FROM base,
           UNNEST(CASE WHEN len(ts) >= 8 THEN range(1, len(ts) - 6)
                       ELSE []::BIGINT[] END) AS t(i)
    ),
    duph AS (
      SELECT h FROM grams GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    keepers AS (
      SELECT h, doc_id AS kid, pos AS kpos FROM (
        SELECT g.h, g.doc_id, g.pos,
               ROW_NUMBER() OVER (PARTITION BY g.h ORDER BY g.doc_id, g.pos) AS rn
        FROM grams g JOIN duph USING (h)
      ) WHERE rn = 1
    ),
    removes AS (
      SELECT g.doc_id, g.pos, g."end"
      FROM grams g JOIN keepers k USING (h)
      WHERE NOT (g.doc_id = k.kid AND g.pos = k.kpos)
    ),
    deltas AS (
      SELECT doc_id, pos AS tpos, 1 AS d FROM removes
      UNION ALL SELECT doc_id, "end" + 1 AS tpos, -1 AS d FROM removes
    ),
    dsum AS (
      SELECT doc_id, tpos, SUM(d) AS delta FROM deltas GROUP BY doc_id, tpos
    ),
    tokens AS (
      SELECT doc_id, i AS tpos
      FROM base, UNNEST(range(1, len(ts) + 1)) AS t(i)
    ),
    marked AS (
      SELECT t.doc_id, t.tpos,
             SUM(COALESCE(d.delta, 0)) OVER (
               PARTITION BY t.doc_id ORDER BY t.tpos
             ) AS depth
      FROM tokens t LEFT JOIN dsum d
        ON d.doc_id = t.doc_id AND d.tpos = t.tpos
    ),
    per_doc AS (
      SELECT doc_id,
             COUNT(*) AS n_tokens,
             SUM(CASE WHEN depth = 0 THEN 1 ELSE 0 END) AS kept_tokens
      FROM marked GROUP BY doc_id
    )
    SELECT b.source,
           COUNT(*) AS n_docs,
           CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(p.kept_tokens) AS BIGINT) AS kept_tokens,
           FLOOR((SUM(p.kept_tokens) / CAST(GREATEST(SUM(p.n_tokens), 1) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS keep_ratio
    FROM base b JOIN per_doc p USING (doc_id)
    GROUP BY b.source
    ORDER BY b.source
    """,
    tags=("llm-pipeline", "curation", "composed", "spans"),
)
def q_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7 curation pass composed end-to-end in one catalog
    query: quality gate (quality_features keep flag) → exact dedup
    (min-id representative) → cross-document duplicated-SPAN removal
    (dup_span_trim — the exact-substring rewrite, not just a doc
    filter) → per-source doc/token accounting with the post-trim keep
    ratio. The oracle re-derives every stage INCLUDING keeper
    election and span-delta token depths, so the hash verifies the
    COMPOSITION of the whole rewrite pipeline cross-engine — "raw
    corpus in, trimmed training corpus out".

    Scale: the gates are narrow scan-stage filters; dedup is one
    digest-keyed shuffle; the trim adds the linear positioned-hash
    machinery (nothing pairs documents); accounting is map-side
    combined. No stage materializes to the driver."""
    from skopje_spark.operators.dedup import dedup_exact, dup_span_trim
    from skopje_spark.operators.text import quality_features

    d = load_table(spark, sf_dir, "documents")
    q = (
        quality_features(d, "doc_id", "text")
        .filter(F.col("quality_keep") == 1)
        .select("doc_id")
    )
    kept = d.select("doc_id", "source", "text").join(q, "doc_id")
    dd = dedup_exact(kept, "doc_id", "text")
    trimmed = dup_span_trim(dd, "doc_id", "text", n=8)
    return (
        trimmed.join(dd.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("kept_tokens").cast("bigint").alias("kept_tokens"),
            dround(
                F.sum("kept_tokens")
                / F.greatest(F.sum("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("keep_ratio"),
        )
        .orderBy("source")
    )
