"""End-to-end training-data curation pipeline: the flagship LLM-data
story, wired through the Pipeline node graph.

documents → normalize + quality/repetition filter → exact dedup →
near-dup (MinHash-LSH) removal → PII redaction → deterministic
train/val/test split → versioned snapshot sink.

Every stage is an operator this engine ships; the test pins the
end-to-end contract (monotone shrinkage, determinism, split
completeness, history preservation) rather than per-op values, which
the oracle suite already covers."""

from __future__ import annotations

from pyspark.sql import functions as F

from skopje_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    normalize_text,
)
from skopje_spark.operators.sampling import split_assign
from skopje_spark.operators.text import (
    quality_features,
    redact_pii,
    repetition_features,
)
from skopje_spark.pipeline import Pipeline
from skopje_spark.sinks.versioned import versioned_read, versioned_write
from skopje_spark.sources.files import parquet_source


def test_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    p = Pipeline("curation")

    p.source(
        "docs",
        lambda ctx: parquet_source(
            ctx.spark, ctx.conf["sf_dir"] + "/documents.parquet"
        ),
    )

    def clean(ctx, docs):
        q = quality_features(docs, "doc_id", "text").select(
            "doc_id", "quality_keep"
        )
        r = repetition_features(docs, "doc_id", "text").select(
            "doc_id", "top_word_frac"
        )
        return (
            docs.join(q, "doc_id")
            .join(r, "doc_id")
            .filter((F.col("quality_keep") == 1) & (F.col("top_word_frac") < 0.5))
            .drop("quality_keep", "top_word_frac")
            .withColumn("text", normalize_text(F.col("text")))
        )

    p.transform("clean", clean, deps=["docs"])

    p.transform(
        "exact_dedup", lambda ctx, d: dedup_exact(d, "doc_id", "text"),
        deps=["clean"],
    )

    def near_dedup(ctx, d):
        pairs = minhash_lsh_pairs(d, "doc_id", "text")
        # drop the higher id of each candidate pair (keep-first policy)
        losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        return d.join(losers, "doc_id", "left_anti")

    p.transform("near_dedup", near_dedup, deps=["exact_dedup"])

    p.transform(
        "redacted",
        lambda ctx, d: d.withColumn("text", redact_pii(F.col("text"))),
        deps=["near_dedup"],
    )

    p.transform(
        "split",
        lambda ctx, d: split_assign(
            d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ),
        deps=["redacted"],
    )

    p.sink("publish", lambda ctx, df: versioned_write(df, out), dep="split")

    results = p.run(spark, conf={"sf_dir": sf_dir})

    n_docs = results["docs"].count()
    n_clean = results["clean"].count()
    n_exact = results["exact_dedup"].count()
    n_near = results["near_dedup"].count()
    # each stage only removes rows, never invents them
    assert n_docs >= n_clean >= n_exact >= n_near > 0

    published = versioned_read(spark, out)
    assert published.count() == n_near
    # split covers every published doc with the three expected labels
    labels = {r["split"] for r in published.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"} and "train" in labels

    # determinism: re-running the whole pipeline commits an identical
    # corpus as the next snapshot (bit-stable curation)
    p.run(spark, conf={"sf_dir": sf_dir})
    v0 = versioned_read(spark, out, version=0).drop("split")
    v1 = versioned_read(spark, out, version=1).drop("split")
    assert v0.exceptAll(v1).count() == 0 and v1.exceptAll(v0).count() == 0
