"""Text-analysis queries over the documents fixture (§2C D4).

Oracle SQL is generated from the same lexicons/patterns as the Spark
operators (single source of truth in operators.text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.text import (
    EN_STOPWORDS,
    LANG_MARKERS,
    TOKEN_PATTERN,
    fingerprint,
    lang_id,
    quality_features,
)
from skopje_spark.queries import register
from skopje_spark.tables import load_table

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_TOKS = f"list_filter(string_split({_NORM}, ' '), t -> t <> '')"


def _quality_oracle() -> str:
    stops = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
    WITH base AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
    )
    SELECT
      doc_id,
      LENGTH(text) AS n_chars_actual,
      len(toks)    AS n_words,
      (CASE WHEN (CASE WHEN len(toks) > 0
            THEN list_sum(list_transform(toks, t -> CAST(LENGTH(t) AS DOUBLE))) / len(toks)
            ELSE 0.0 END) < 0 THEN -(FLOOR((-(CASE WHEN len(toks) > 0
            THEN list_sum(list_transform(toks, t -> CAST(LENGTH(t) AS DOUBLE))) / len(toks)
            ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((CASE WHEN len(toks) > 0
            THEN list_sum(list_transform(toks, t -> CAST(LENGTH(t) AS DOUBLE))) / len(toks)
            ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 END) AS avg_word_len,
      (CASE WHEN (CASE WHEN len(toks) > 0
            THEN len(list_filter(toks, t -> list_contains([{stops}], t))) / CAST(len(toks) AS DOUBLE)
            ELSE 0.0 END) < 0 THEN -(FLOOR((-(CASE WHEN len(toks) > 0
            THEN len(list_filter(toks, t -> list_contains([{stops}], t))) / CAST(len(toks) AS DOUBLE)
            ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((CASE WHEN len(toks) > 0
            THEN len(list_filter(toks, t -> list_contains([{stops}], t))) / CAST(len(toks) AS DOUBLE)
            ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 END) AS stopword_ratio,
      (CASE WHEN (CASE WHEN LENGTH(text) > 0
            THEN LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / CAST(LENGTH(text) AS DOUBLE)
            ELSE 0.0 END) < 0 THEN -(FLOOR((-(CASE WHEN LENGTH(text) > 0
            THEN LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / CAST(LENGTH(text) AS DOUBLE)
            ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((CASE WHEN LENGTH(text) > 0
            THEN LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / CAST(LENGTH(text) AS DOUBLE)
            ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 END) AS punct_ratio,
      len(regexp_extract_all({_NORM}, '{TOKEN_PATTERN}')) AS n_tokens,
      CAST(LENGTH(text) >= 32 AND len(toks) >= 8
           AND len(list_distinct(toks)) / CAST(GREATEST(len(toks), 1) AS DOUBLE) > 0.2
           AS INT) AS quality_keep
    FROM base
    """


@register("q_text_quality", oracle=_quality_oracle(), tags=("text", "quality"))
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring feature block: char/word/token counts, average
    word length, stopword + punctuation ratios, composite keep flag."""
    d = load_table(spark, sf_dir, "documents")
    return quality_features(d, "doc_id", "text")


def _langid_oracle() -> str:
    rows = ", ".join(
        "('%s', [%s])" % (lang, ", ".join(f"'{m}'" for m in markers))
        for lang, markers in LANG_MARKERS.items()
    )
    return f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    hits AS (
      SELECT doc_id, l.lang,
             len(list_filter(toks, t -> list_contains(l.markers, t))) AS n_hits
      FROM base, (VALUES {rows}) AS l(lang, markers)
    ),
    ranked AS (
      SELECT doc_id, lang, n_hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, lang) AS rn
      FROM hits
    )
    SELECT doc_id, CASE WHEN n_hits = 0 THEN 'und' ELSE lang END AS pred_lang
    FROM ranked WHERE rn = 1
    """


@register("q_text_lang_id", oracle=_langid_oracle(), tags=("text", "langid"))
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-lexicon
    hits (deterministic tiebreak; 'und' when nothing matches)."""
    d = load_table(spark, sf_dir, "documents")
    return lang_id(d, "doc_id", "text")


@register(
    "q_text_tokens",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_ws_tokens,
           len(regexp_extract_all({_NORM}, '{TOKEN_PATTERN}')) AS n_re_tokens,
           len(list_distinct({_TOKS})) AS n_distinct_tokens,
           (CASE WHEN (CASE WHEN len({_TOKS}) > 0
              THEN len(list_distinct({_TOKS})) / CAST(len({_TOKS}) AS DOUBLE)
              ELSE 0.0 END) < 0 THEN -(FLOOR((-(CASE WHEN len({_TOKS}) > 0
              THEN len(list_distinct({_TOKS})) / CAST(len({_TOKS}) AS DOUBLE)
              ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0) ELSE FLOOR((CASE WHEN len({_TOKS}) > 0
              THEN len(list_distinct({_TOKS})) / CAST(len({_TOKS}) AS DOUBLE)
              ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 END) AS type_token_ratio
    FROM documents
    """,
    tags=("text", "tokens"),
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace words and the BPE-ish
    regex pre-tokenizer (word pieces + punctuation singles) — plus
    type/token ratio. Narrow per-row map, no shuffle."""
    from skopje_spark.operators.text import token_count, word_tokens
    from skopje_spark.queries.rounding import dround

    d = load_table(spark, sf_dir, "documents")
    toks = word_tokens(F.col("text"))
    ttr = F.when(
        F.size(toks) > 0,
        F.size(F.array_distinct(toks)) / F.size(toks).cast("double"),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        token_count(F.col("text")).alias("n_re_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        dround(ttr, 4).alias("type_token_ratio"),
    )


@register(
    "q_text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           sha256(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
             '\s+', ' ', 'g'))) AS fingerprint,
           substr(sha256(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
             '\s+', ' ', 'g'))), 1, 16) AS fingerprint16
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form sha256 document fingerprint + 16-hex short form."""
    d = load_table(spark, sf_dir, "documents")
    return fingerprint(d, "doc_id", "text")


@register(
    "q_text_winnow",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_NORM} AS norm FROM documents
      WHERE LENGTH({_NORM}) >= 5
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, GREATEST(LENGTH(norm) - 5 + 1, 0) + 1),
               i -> ('0x' || substr(sha256(substr(norm, i, 5)), 1, 15))::BIGINT
             ) AS h
      FROM base
    ),
    wins AS (
      SELECT doc_id,
             list_transform(range(1, GREATEST(len(h) - 4 + 1, 1) + 1),
               j -> list_min(h[j:j+3])
             ) AS fps
      FROM grams
    )
    SELECT DISTINCT doc_id, UNNEST(fps) AS fp FROM wins
    ORDER BY doc_id, fp
    """,
    tags=("text", "fingerprint", "winnowing", "rolling-hash"),
)
def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (k=5 char-grams, window 4):
    the edit-robust fingerprint set per document. Both engines select
    window minima over identical sha256-prefix hashes, so the sets are
    bit-identical."""
    from skopje_spark.operators.text import winnow_fingerprints

    d = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(d, "doc_id", "text", k=5, w=4).orderBy(
        "doc_id", "fp"
    )


@register(
    "q_text_tfidf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), nd AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
    )
    SELECT * FROM (
      SELECT t.doc_id, t.term, t.tf, d.df,
             t.tf * (nd.n_docs + 1.0) / (d.df + 1.0) AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf * (nd.n_docs + 1.0) / (d.df + 1.0) DESC, t.term
             ) AS rank
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN nd
    ) WHERE rank <= 5
    """,
    tags=("text", "tfidf"),
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by TF-IDF
    (operators/text.tfidf_top_terms). Linear IDF (N+1)/(df+1) — same
    ranking as the log form, but a ratio of exact integers, so the
    score hash-matches across engines. Tokenization is the shared
    whitespace tokenizer, identical to the DuckDB-side ``_TOKS``."""
    from skopje_spark.operators.text import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=5)


@register(
    "q_inverted_index",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    postings AS (
      SELECT term,
             COUNT(*) AS df,
             sha256(array_to_string(list_sort(list(doc_id)), ',')) AS posting_sha
      FROM toks GROUP BY term
    )
    SELECT term, df, posting_sha
    FROM postings
    ORDER BY df DESC, term LIMIT 10
    """,
    tags=("text", "index", "retrieval", "llm-pipeline"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the text-retrieval primitive: distinct
    (doc, term) pairs → posting list per term (sorted doc ids), with
    document frequency. Emits the 10 highest-df terms with a sha256
    digest of each posting list, so a single missing or extra doc in
    any list hash-mismatches.

    Scale: one shuffle keyed on term; posting lists are built with
    sort_array(collect_list) per term — per-term list size is the
    df, bounded for real vocabularies by stopword cuts (the same
    max_df lever as the dedup shingle joins). Conjunctive retrieval
    over the index is unit-checked in tests/test_scale_ops.py.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("term"),
    ).distinct()
    postings = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sha2(
            F.array_join(F.sort_array(F.collect_list("doc_id")), ","), 256
        ).alias("posting_sha"),
    )
    return postings.orderBy(F.desc("df"), "term").limit(10)


@register(
    "q_text_bpe_tokens",
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           CAST(1 AS INTEGER) AS roundtrip_ok,
           CAST(1 AS INTEGER) AS tokens_le_bytes,
           CAST(1 AS INTEGER) AS count_consistent
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "tokenizer", "bpe", "llm-pipeline"),
)
def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable byte-level BPE end-to-end
    (operators/tokenizer.py): train merges on the documents corpus
    (distributed word counts -> bounded driver merge loop), then
    verify three in-band verdicts per document, all pinned to 1 by
    the oracle alongside the REAL byte length:

    - ``roundtrip_ok``: decode(encode(text)) == text exactly — the
      byte-level losslessness contract;
    - ``tokens_le_bytes``: subword count never exceeds byte count
      (merges only ever shrink the sequence);
    - ``count_consistent``: the per-document encode and an
      INDEPENDENT second path — explode pre-tokens with the JVM
      regex, encode each distinct pre-token once, join + sum — agree
      token-for-token, proving the Java and Python pre-tokenizers
      tile identically and word-level encoding is additive.

    Scale: training's corpus pass is one map-side-combined groupBy;
    the driver holds only the top-8192 word head (bounded artifact,
    like centroids/codebooks); encode ships a few-KB merge table in
    an Arrow-batched UDF. The distinct-word second path is also the
    production shape for corpus-wide token accounting: encode the
    Zipf head once, not every occurrence."""
    from skopje_spark.operators.tokenizer import (
        PRETOKEN_PATTERN,
        bpe_decode,
        bpe_encode,
        bpe_train,
        token_count_bpe,
    )

    d = load_table(spark, sf_dir, "documents")
    model = bpe_train(d, "text", num_merges=200, max_words=8192)

    enc = bpe_encode(d.select("doc_id", "text"), "text", model, out_col="__ids")
    dec = bpe_decode(enc, "__ids", model, out_col="__rt")
    per_doc = dec.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.size("__ids").cast("bigint").alias("__n_tok"),
        (F.col("__rt") == F.col("text")).cast("int").alias("roundtrip_ok"),
    )

    words = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(PRETOKEN_PATTERN), 0)
        ).alias("word"),
    )
    distinct_words = words.select("word").distinct()
    word_lens = token_count_bpe(
        distinct_words, "word", model, out_col="__w_tok"
    )
    via_words = (
        words.join(word_lens, "word")
        .groupBy("doc_id")
        .agg(F.sum("__w_tok").alias("__n_tok2"))
    )

    return (
        per_doc.join(via_words, "doc_id", "left")
        .select(
            "doc_id",
            "n_bytes",
            "roundtrip_ok",
            (F.col("__n_tok") <= F.col("n_bytes")).cast("int").alias(
                "tokens_le_bytes"
            ),
            F.col("__n_tok")
            .eqNullSafe(F.coalesce(F.col("__n_tok2"), F.lit(0)))
            .cast("int")
            .alias("count_consistent"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_retrieval_bm25",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN ('vector', 'hash', 'stream')
      GROUP BY doc_id, tok
    ),
    dft AS (SELECT tok, COUNT(*) AS df_t FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               ln((stats.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
             ) AS raw
      FROM tf
      JOIN dft USING (tok)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id,
           FLOOR(raw * 1000000.0 + 0.5) / 1000000.0 AS score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 10
    """,
    tags=("text", "retrieval", "bm25", "llm-pipeline"),
)
def q_retrieval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (operators/text.py:bm25_scores) for the
    query {vector, hash, stream} with Lucene idf, k1=1.2, b=0.75 —
    top-10 documents under a (rounded score, doc_id) total order so
    both engines select identical rows; the oracle re-derives every
    corpus statistic (N, avgdl, df, tf) and the full scoring formula.

    Scale: corpus stats and per-term df are broadcast one-row /
    |query|-row tables; tf is filtered to the query's terms BEFORE
    its shuffle, so scoring cost follows the postings of three terms,
    not the corpus; TakeOrderedAndProject caps the sort at k."""
    from skopje_spark.operators.text import bm25_scores

    d = load_table(spark, sf_dir, "documents")
    return bm25_scores(
        d, ["vector", "hash", "stream"], k1=1.2, b=0.75, top_k=10
    )


@register(
    "q_chunk_bpe",
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           CAST(1 AS INTEGER) AS sizes_ok,
           CAST(1 AS INTEGER) AS coverage_ok,
           CAST(1 AS INTEGER) AS reassembly_ok
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "tokenizer", "chunking", "bpe", "llm-pipeline"),
)
def q_chunk_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-window chunking end-to-end
    (operators/tokenizer.py:chunk_by_bpe_tokens): every document is
    cut into windows of BPE tokens and three laws are verified
    in-band per document, all pinned to 1 by the oracle next to the
    REAL byte length:

    - ``sizes_ok``: every overlapped window holds <= 32 tokens and
      every non-final window is exactly full;
    - ``coverage_ok``: the overlapped window count equals the
      closed-form ceil((n_tok - overlap) / stride) law (every token
      covered, no subset tail);
    - ``reassembly_ok``: the overlap=0 chunks' BYTE payloads
      concatenate (in chunk order) to the exact UTF-8 bytes of the
      document — the losslessness contract at chunk granularity.

    Scale: one encode UDF per variant + narrow sequence/posexplode/
    slice; the reassembly check is an aggregate of binary concat in
    chunk_id order, one shuffle on doc_id."""
    from skopje_spark.operators.tokenizer import (
        bpe_train,
        chunk_by_bpe_tokens,
        token_count_bpe,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = bpe_train(d, "text", num_merges=64, max_words=8192)
    tpc, ov = 32, 8
    step = tpc - ov

    over = chunk_by_bpe_tokens(
        d, model, tokens_per_chunk=tpc, overlap=ov
    )
    # non-final windows full: count chunks with n_chunk_tokens < tpc;
    # at most one (the last) may be short
    shorts = over.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("n_chunk_tokens").alias("max_sz"),
        F.sum((F.col("n_chunk_tokens") < tpc).cast("int")).alias("n_short"),
    )
    ntok = token_count_bpe(d, "text", model, out_col="n_tok").select(
        "doc_id", "n_tok"
    )
    flat = chunk_by_bpe_tokens(d, model, tokens_per_chunk=tpc, overlap=0)
    reasm = flat.groupBy("doc_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_bytes"))
                ),
                lambda x: x["chunk_bytes"],
            ),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("__joined")
    )
    expected = F.when(
        F.col("n_tok") > 0,
        F.greatest(
            F.ceil((F.col("n_tok") - ov) / F.lit(step)), F.lit(1)
        ),
    ).otherwise(F.lit(0))
    return (
        d.join(ntok, "doc_id")
        .join(shorts, "doc_id", "left")
        .join(reasm, "doc_id", "left")
        .select(
            "doc_id",
            F.octet_length("text").cast("bigint").alias("n_bytes"),
            (
                (F.coalesce(F.col("max_sz"), F.lit(0)) <= tpc)
                & (F.coalesce(F.col("n_short"), F.lit(0)) <= 1)
            )
            .cast("int")
            .alias("sizes_ok"),
            F.coalesce(F.col("n_chunks"), F.lit(0))
            .eqNullSafe(expected.cast("bigint"))
            .cast("int")
            .alias("coverage_ok"),
            F.coalesce(F.col("__joined"), F.lit(b""))
            .eqNullSafe(F.col("text").cast("binary"))
            .cast("int")
            .alias("reassembly_ok"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_text_bpe_compression",
    oracle="""
    SELECT doc_id, cls, n_bytes, is_junk
    FROM (
      SELECT doc_id, 'natural' AS cls,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             0 AS is_junk
      FROM documents
      UNION ALL
      SELECT doc_id, 'gibberish' AS cls,
             CAST(32 AS BIGINT) AS n_bytes,
             1 AS is_junk
      FROM documents
    )
    ORDER BY cls, doc_id
    """,
    tags=("text", "bpe", "quality", "llm-pipeline"),
)
def q_text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-compression junk filter
    (operators/tokenizer.py:bpe_compression_ratio): a tokenizer
    trained on the natural corpus compresses in-distribution text to
    ~0.18 tokens/byte but hex gibberish (md5 of the doc id — both
    engines synthesize the identical junk twin per document) to
    ~1.0, so the 0.5 threshold classifies every document with a >4×
    margin on each side (measured: natural max 0.214, gibberish min
    0.9375 at sf0.001/0.01). The oracle pins the verdict for all
    2·n docs plus the REAL byte lengths — the "looks like the
    training distribution" filter at tokenizer cost, not LM cost.

    Scale: one distributed word-count pass for training (bounded
    driver merge loop), one Arrow-batched encode pass for scoring.
    """
    from skopje_spark.operators.tokenizer import (
        bpe_compression_ratio,
        bpe_train,
    )

    d = load_table(spark, sf_dir, "documents")
    model = bpe_train(d, "text", num_merges=200, max_words=8192)

    nat = d.select("doc_id", "text", F.lit("natural").alias("cls"))
    gib = d.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("text"),
        F.lit("gibberish").alias("cls"),
    )
    scored = bpe_compression_ratio(
        nat.unionByName(gib), "text", model, out_col="ratio"
    )
    return scored.select(
        "doc_id",
        "cls",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        (F.col("ratio") > 0.5).cast("int").alias("is_junk"),
    ).orderBy("cls", "doc_id")


@register(
    "q_bm25_index_query",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN ('vector', 'hash', 'stream')
      GROUP BY doc_id, tok
    ),
    dft AS (SELECT tok, COUNT(*) AS df_t FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               ln((stats.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
             ) AS raw
      FROM tf
      JOIN dft USING (tok)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id,
           FLOOR(raw * 1000000.0 + 0.5) / 1000000.0 AS score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 10
    """,
    tags=("text", "retrieval", "bm25", "index", "llm-pipeline"),
)
def q_bm25_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the PERSISTED inverted index
    (operators/invindex.py) — and through an APPEND: the index is
    built on the even-id half of the corpus, the odd half appended,
    and the query must score bit-identically to the oracle's direct
    full-corpus computation. That pins the append-exactness claim (N
    and Σdl fold exactly; df derives from the postings at query time)
    together with the bucket-partitioned layout, the denormalized
    per-posting document length, and the driver-side stats literals.

    avgdl here is sum_dl/n (exact-int inputs, one IEEE division on
    both engines), matching the index's stored-statistics form.

    Scale: the query plan's only inputs are the terms' partition
    buckets (pruned driver-side with the same hash that wrote the
    layout) plus a kilobyte JSON — a retrieval service pays postings
    cost per query, never a corpus scan; this is what the per-query
    bm25_scores plan cannot give."""
    import atexit
    import shutil
    import tempfile

    from skopje_spark.operators.invindex import (
        bm25_index_append,
        bm25_index_query,
        bm25_index_write,
    )

    d = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="skopje_bm25idx_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    path = root + "/idx"
    bm25_index_write(d.filter("doc_id % 2 = 0"), path)
    bm25_index_append(spark, d.filter("doc_id % 2 = 1"), path)
    return bm25_index_query(
        spark, path, ["vector", "hash", "stream"], k1=1.2, b=0.75, top_k=10
    )


@register(
    "q_quality_classifier",
    oracle="""
    SELECT doc_id, 1 AS y, 1 AS pred FROM documents
    UNION ALL
    SELECT doc_id + 100000, 0, 0 FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "classifier", "quality", "ml", "llm-pipeline"),
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable quality classifier end-to-end
    (operators/classifier.py): every document gets a gibberish twin
    (md5-hex junk, the q_text_bpe_compression construction), hashed
    128-slot token features are built statelessly, full-batch
    logistic regression trains through per-partition Arrow partial
    gradients (deterministic: zero init, no sampling, driver sums in
    sorted partition order), and the corpus is scored by a CODEGEN
    dot-product expression. The oracle pins every prediction to its
    label — natural-vs-junk is separable by a wide margin (min
    |p−0.5| ≈ 0.26 at fixture scale), so the hash survives float
    ulps while still failing on any real training or scoring defect.

    Scale: train on a sample, score everything — iterations are
    map-only passes collecting one (dim+1)-vector per partition;
    scoring fuses into the scan with no Python."""
    from skopje_spark.operators.classifier import (
        hashed_features,
        logreg_score,
        logreg_train,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    junk = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"_{i}")))
                for i in range(6)
            ],
        ).alias("text"),
    )
    train = d.withColumn("y", F.lit(1)).unionByName(
        junk.withColumn("y", F.lit(0))
    )
    feats = hashed_features(train, "doc_id", "text", dim=128).join(
        train.select("doc_id", "y"), "doc_id"
    )
    w = logreg_train(feats, "y", dim=128, iters=30, lr=1.0)
    return (
        logreg_score(feats, w)
        .select(
            "doc_id", "y", (F.col("prob") > 0.5).cast("int").alias("pred")
        )
        .orderBy("doc_id")
    )


@register(
    "q_text_unicode_clean",
    oracle="""
    SELECT doc_id,
           sha256(regexp_replace(
               nfc_normalize('Cafe' || chr(769) || '|' || text
                             || chr(7) || '|tail'),
               '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'
           )) AS clean_sha,
           CAST(length(regexp_replace(
               nfc_normalize('Cafe' || chr(769) || '|' || text
                             || chr(7) || '|tail'),
               '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'
           )) AS BIGINT) AS clean_chars
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "unicode", "normalization", "pandas-udf"),
)
def q_text_unicode_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode hygiene under the driver gate: every document gets a
    combining sequence ('Cafe' + U+0301 — NFC must collapse it to the
    precomposed é) and a BEL control character injected, then
    :func:`~skopje_spark.operators.text.unicode_clean` (Arrow-batched
    NFC + codegen control strip) runs and the oracle recomputes the
    exact cleaned text with DuckDB's independent ``nfc_normalize`` —
    two unrelated normalization implementations agreeing on sha256
    and character count per document. A wrong form, a missed control
    class, or an off-by-one strip hash-mismatches every row."""
    from skopje_spark.operators.text import unicode_clean

    d = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit("Café|"), F.col("text"), F.lit("\x07|tail")
    )
    cleaned = unicode_clean(dirty, form="NFC")
    return d.select(
        "doc_id",
        F.sha2(cleaned, 256).alias("clean_sha"),
        F.length(cleaned).cast("bigint").alias("clean_chars"),
    ).orderBy("doc_id")
