"""Record-linkage and hybrid-retrieval queries
(operators/linkage.py): blocked fuzzy matching and reciprocal rank
fusion of lexical + semantic retrieval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skopje_spark.queries import register
from skopje_spark.queries.rounding import dround_sql
from skopje_spark.tables import load_table

_FUZZY_ORACLE = """
WITH dirty AS (
  SELECT c_custkey AS dirty_custkey,
         substr(c_name, 1, 17) || 'X' AS name
  FROM customer WHERE c_custkey % 7 = 0
),
clean AS (
  SELECT c_custkey AS clean_custkey, c_name AS name FROM customer
)
SELECT dirty_custkey, clean_custkey,
       levenshtein(d.name, c.name) AS edit_dist
FROM dirty d JOIN clean c
  ON substr(d.name, 10, 8) = substr(c.name, 10, 8)
WHERE levenshtein(d.name, c.name) <= 1
ORDER BY dirty_custkey, clean_custkey
"""


@register(
    "q_fuzzy_match_blocked",
    oracle=_FUZZY_ORACLE,
    tags=("linkage", "fuzzy", "blocking", "dedup"),
)
def q_fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage
    (operators/linkage.py:fuzzy_pairs_blocked): a deterministically
    corrupted copy of every 7th customer name (last char → 'X') is
    matched back against the clean roster — candidates come from an
    equi-join on an 8-digit blocking key, verification is
    threshold-capped `levenshtein` in whole-stage codegen. Each dirty
    record resolves to its decade of neighbors at distance 1 — the
    multi-candidate case a real linkage pipeline must adjudicate.

    Scale: candidates ∝ Σ|block_L|·|block_R| under the user-designed
    key, never all pairs; the verifier early-exits past the cap.
    """
    from skopje_spark.operators.linkage import fuzzy_pairs_blocked

    c = load_table(spark, sf_dir, "customer")
    dirty = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("id"),
        F.concat(F.substring("c_name", 1, 17), F.lit("X")).alias("name"),
    )
    clean = c.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
    pairs = fuzzy_pairs_blocked(
        dirty,
        clean,
        left_id="id",
        right_id="id",
        left_text="name",
        right_text="name",
        block=F.substring("name", 10, 8),
        max_dist=1,
    )
    return pairs.select(
        F.col("left_id").alias("dirty_custkey"),
        F.col("right_id").alias("clean_custkey"),
        "edit_dist",
    ).orderBy("dirty_custkey", "clean_custkey")


_RRF_ORACLE = f"""
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
lex_scored AS (
  SELECT tf.doc_id,
         {dround_sql(
             'SUM(ln((stats.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5) + 1.0)'
             ' * (tf.tf * 2.2)'
             ' / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)))',
             6,
         )} AS score
  FROM tf
  JOIN dft USING (tok)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
    FROM lex_scored
  ) WHERE r <= 20
),
qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT 1
),
sem_scored AS (
  SELECT vec_id AS doc_id,
         {dround_sql('list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)', 6)} AS score
  FROM embeddings, qv
),
sem AS (
  SELECT doc_id, r FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
    FROM sem_scored
  ) WHERE r <= 20
)
SELECT doc_id,
       {dround_sql('SUM(1.0 / (60.0 + r))', 6)} AS rrf_score,
       COUNT(*) AS n_lists
FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id
LIMIT 10
"""


@register(
    "q_retrieval_rrf",
    oracle=_RRF_ORACLE,
    tags=("retrieval", "rrf", "hybrid", "llm-pipeline"),
)
def q_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal rank fusion
    (operators/linkage.py:rrf_fuse): BM25's lexical top-20 (terms
    vector/hash/stream) and the embedding-cosine top-20 against the
    min-vec_id query vector are fused as Σ 1/(60 + rank) — no score
    calibration, only ranks, the SIGIR'09 recipe RAG stacks use.
    doc_id and vec_id share the fixture id space, so the two
    retrievers rank the same corpus through different signals.

    Scale: each retriever does its own corpus-sized work with its own
    right plan (postings-bounded BM25, broadcast-query brute-force
    cosine); fusion itself touches 40 rows.
    """
    from skopje_spark.operators.linkage import rrf_fuse
    from skopje_spark.operators.similarity import cosine_topk
    from skopje_spark.operators.text import bm25_scores

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")

    lex = bm25_scores(d, ["vector", "hash", "stream"], top_k=20)
    qv = e.orderBy("vec_id").limit(1)
    sem = cosine_topk(e, qv, id_col="vec_id", vec_col="embedding", k=20).select(
        F.col("vec_id").alias("doc_id"), F.col("cos_sim").alias("score")
    )
    return rrf_fuse([lex, sem], id_col="doc_id", top_k=10)


_SNM_ORACLE = """
WITH base AS (
  SELECT c_custkey AS id, c_name AS name FROM customer
),
leads AS (
  SELECT id AS left_id, name AS ls,
         lead(id, 1) OVER w AS r1, lead(name, 1) OVER w AS s1,
         lead(id, 2) OVER w AS r2, lead(name, 2) OVER w AS s2,
         lead(id, 3) OVER w AS r3, lead(name, 3) OVER w AS s3
  FROM base
  WINDOW w AS (ORDER BY name, id)
),
pairs AS (
  SELECT left_id, ls, r1 AS right_id, s1 AS rs FROM leads WHERE r1 IS NOT NULL
  UNION ALL
  SELECT left_id, ls, r2, s2 FROM leads WHERE r2 IS NOT NULL
  UNION ALL
  SELECT left_id, ls, r3, s3 FROM leads WHERE r3 IS NOT NULL
)
SELECT left_id, right_id, levenshtein(ls, rs) AS edit_dist
FROM pairs
WHERE levenshtein(ls, rs) <= 1
ORDER BY left_id, right_id
"""


@register(
    "q_linkage_sorted_neighborhood",
    oracle=_SNM_ORACLE,
    tags=("linkage", "sorted-neighborhood", "dedup"),
)
def q_linkage_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record linkage
    (operators/linkage.py:sorted_neighborhood_pairs): every customer
    pairs with its next 3 neighbors in name order, verified at edit
    distance ≤ 1 — the complementary blocking scheme to
    q_fuzzy_match_blocked's equality blocks (a window over a sort
    order catches matches whose block key would differ).

    Scale: NO single-task global window — rows range-bucket by
    literal driver-sampled bounds (the pack_sequences pattern), the
    lead chain runs per bucket, and bucket boundaries stitch via a
    ≤ w(w+1)/2-pairs-per-boundary frame; the oracle's naive global
    window is the semantic twin the bucketed plan must reproduce
    exactly.
    """
    from skopje_spark.operators.linkage import sorted_neighborhood_pairs

    c = load_table(spark, sf_dir, "customer")
    return sorted_neighborhood_pairs(
        c.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name")),
        id_col="id",
        text_col="name",
        sort_key="name",
        window=3,
        max_dist=1,
    ).orderBy("left_id", "right_id")
