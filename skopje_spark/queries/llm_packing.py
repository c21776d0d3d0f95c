"""Sequence packing / chunking queries (operators/packing.py).

The training-data load path the reference delegates to Postgres
(`insert_stmt` strings, ``/root/reference/src/load/pg.rs:14``) here
lands fixed-length token sequences instead; these queries verify both
layout operators against exact SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.operators.packing import chunk_text, pack_concat_chunk
from skopje_spark.operators.text import word_tokens
from skopje_spark.queries import register
from skopje_spark.queries.llm_text import _TOKS
from skopje_spark.tables import load_table

_CHUNK, _OVER, _STEP = 500, 100, 400
_CTX = 1024


@register(
    "q_chunk_documents",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text,
             unnest(generate_series(0, greatest(length(text) - {_OVER + 1}, 0), {_STEP}))
               AS chunk_start
      FROM documents
    )
    SELECT doc_id,
           chunk_start // {_STEP} AS chunk_id,
           chunk_start,
           length(substr(text, chunk_start + 1, {_CHUNK})) AS chunk_chars,
           sha256(substr(text, chunk_start + 1, {_CHUNK})) AS chunk_sha
    FROM s
    """,
    tags=("packing", "chunk", "text"),
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character windows over every document (500-char
    chunks, 100-char overlap): the retrieval/embedding prep layout.
    Narrow sequence+explode+substring plan — no shuffle, stays in
    whole-stage codegen; output is digest-shaped (length + sha) so the
    oracle compares exact content without hauling text through the
    hash comparator."""
    d = load_table(spark, sf_dir, "documents")
    c = chunk_text(d, chunk_len=_CHUNK, overlap=_OVER)
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.length("chunk_text").cast("long").alias("chunk_chars"),
        F.sha2("chunk_text", 256).alias("chunk_sha"),
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS tok
      FROM documents
      WHERE len({_TOKS}) > 0
    ),
    o AS (
      SELECT doc_id, tok,
             CAST(COALESCE(SUM(tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
      FROM t
    ),
    x AS (
      SELECT o.doc_id, o.tok, o.st, g.seq_id
      FROM o, LATERAL (
        SELECT unnest(generate_series(o.st // {_CTX}, (o.st + o.tok - 1) // {_CTX}))
          AS seq_id
      ) g
    )
    SELECT seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(least(st + tok, (seq_id + 1) * {_CTX})
                    - greatest(st, seq_id * {_CTX})) AS BIGINT) AS n_tokens
    FROM x
    GROUP BY seq_id
    """,
    tags=("packing", "agg"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk pretraining packing at ctx=1024: documents laid
    end-to-end in doc_id order, the token axis cut into sequences; per
    sequence, how many documents contribute and how many tokens land
    (= ctx for every sequence but the last).

    Scale: the global offset comes from operators/packing.py's two-pass
    prefix sum — one range shuffle of (doc_id, n_tokens) plus an
    O(partitions) driver step — instead of an everything-on-one-task
    global window."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(word_tokens(F.col("text"))).alias("n_tokens")
    )
    packed = pack_concat_chunk(d, tokens_col="n_tokens", ctx_len=_CTX)
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("seq_tokens").alias("n_tokens"),
        )
    )


_PASS = 200  # disjoint passage width for passage-level dedup


@register(
    "q_dedup_passage",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text,
             unnest(generate_series(0, greatest(length(text) - 1, 0), {_PASS}))
               AS st
      FROM documents
    )
    SELECT sha256(substr(text, st + 1, {_PASS})) AS passage_sha,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM s
    GROUP BY 1
    HAVING COUNT(*) > 1 AND COUNT(DISTINCT doc_id) > 1
    """,
    tags=("packing", "dedup", "text"),
)
def q_dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup: cut every document into disjoint
    200-char passages (chunk_text with overlap=0) and report passages
    appearing in more than one document — the sub-document dedup tier
    between whole-doc hashing (q_dedup_exact_hash) and fuzzy matching
    (q_dedup_ngram_jaccard), which catches boilerplate shared across
    otherwise-distinct pages.

    Scale: one map-side-combined groupBy on a 32-byte digest; the text
    itself never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    c = chunk_text(d, chunk_len=_PASS, overlap=0)
    return (
        c.groupBy(F.sha2("chunk_text", 256).alias("passage_sha"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter((F.col("n_occurrences") > 1) & (F.col("n_docs") > 1))
    )


@register(
    "q_shuffle_deterministic",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY sha256(CAST(doc_id AS VARCHAR) || 'epoch0'))
                - 1 AS BIGINT) AS shuffle_pos,
           CAST((ROW_NUMBER() OVER (ORDER BY sha256(CAST(doc_id AS VARCHAR) || 'epoch0'))
                - 1) % 8 AS BIGINT) AS shard
    FROM documents
    """,
    tags=("packing", "shuffle", "sampling"),
)
def q_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle (epoch-salted): every document gets
    a stable pseudo-random position = rank of sha256(doc_id||salt), and
    a round-robin output shard. This is how a 100 TB corpus gets a
    reproducible training order: new salt per epoch, no RNG state, any
    subset of shards re-derivable.

    Scale: rank comes from the two-pass prefix sum in
    operators/packing.py, not a single-task global window."""
    from skopje_spark.operators.packing import deterministic_shuffle

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(d, salt="epoch0", n_shards=8)
