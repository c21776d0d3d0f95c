"""Units: trainable quality classifier (operators/classifier.py) —
hashing-trick features, deterministic distributed training, codegen
scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skopje_spark.operators.classifier import (
    hashed_features,
    logreg_margin,
    logreg_score,
    logreg_train,
)


def _train_frame(spark, n=40, dim=64):
    nat = [(i, "the quick brown fox and that fine dog with more words", 1)
           for i in range(n)]
    junk = [(1000 + i, f"zzqx{i}v jjwq{i}k xx{i}yy qqq{i}p", 0)
            for i in range(n)]
    df = spark.createDataFrame(nat + junk, "doc_id long, text string, y int")
    return hashed_features(df, "doc_id", "text", dim=dim).join(
        df.select("doc_id", "y"), "doc_id"
    )


def test_training_separates_and_is_deterministic(spark):
    feats = _train_frame(spark)
    w1 = logreg_train(feats, "y", dim=64, iters=25, lr=1.0)
    w2 = logreg_train(feats, "y", dim=64, iters=25, lr=1.0)
    assert w1 == w2  # zero init + full batch + ordered partial sums
    scored = logreg_score(feats, w1)
    acc = scored.select(
        ((F.col("prob") > 0.5).cast("int") == F.col("y")).cast("int").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    assert acc == 1.0


def test_hashed_features_stateless_and_zero_token_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "1234 %%%"), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["features"] for r in
           hashed_features(df, "doc_id", "text", dim=16).collect()}
    assert len(out) == 3  # tokenless/null docs keep a row
    assert all(len(v) == 16 for v in out.values())
    assert all(x == 0.0 for x in out[2]) and all(x == 0.0 for x in out[3])
    assert sum(out[1]) > 0
    # stateless determinism across independent calls
    out2 = {r["doc_id"]: r["features"] for r in
            hashed_features(df, "doc_id", "text", dim=16).collect()}
    assert out == out2


def test_scoring_is_codegen_not_python(spark):
    feats = _train_frame(spark, n=10)
    w = [0.1] * 64 + [0.0]
    scored = logreg_score(feats, w)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # the scoring projection itself must not introduce a Python eval
    # node (feature building uses only JVM expressions too)
    assert "EvalPython" not in plan
    # margin expression agrees with a numpy dot on one row
    import numpy as np

    row = feats.orderBy("doc_id").first()
    got = (
        feats.filter(F.col("doc_id") == row["doc_id"])
        .select(logreg_margin(w).alias("z"))
        .collect()[0]["z"]
    )
    exp = float(np.dot(np.asarray(row["features"]), np.asarray(w[:-1])) + w[-1])
    assert abs(got - exp) < 1e-9


def test_empty_training_set_raises(spark):
    feats = _train_frame(spark, n=2).filter("doc_id < 0")
    with pytest.raises(ValueError, match="empty training set"):
        logreg_train(feats, "y", dim=64, iters=1)


def test_model_persistence_and_spec_scoring(spark, tmp_path):
    """Persisted model round-trip + the declarative quality_score op:
    train, write, score through the spec registry — equal to direct
    scoring."""
    from skopje_spark.operators.classifier import (
        logreg_model_read,
        logreg_model_write,
        quality_score,
    )
    from skopje_spark.spec import pipeline_from_spec

    feats = _train_frame(spark, n=20)
    w = logreg_train(feats, "y", dim=64, iters=20, lr=1.0)
    mp = str(tmp_path / "model")
    logreg_model_write(mp, w, dim=64, meta={"trained_on": "unit"})
    rw, rd, rm = logreg_model_read(mp)
    assert rw == w and rd == 64 and rm["trained_on"] == "unit"

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and that dog with words"),
         (2, "zzqx9v jjwq8k xx7yy")],
        "doc_id long, text string",
    )
    direct = {r["doc_id"]: r["quality_prob"]
              for r in quality_score(docs, mp).collect()}
    assert direct[1] > 0.5 > direct[2]

    raw = str(tmp_path / "docs")
    docs.write.parquet(raw)
    out = str(tmp_path / "scored")
    spec = {
        "name": "score",
        "nodes": [
            {"name": "d", "kind": "source", "format": "parquet", "path": raw},
            {"name": "s", "kind": "transform", "deps": ["d"],
             "op": "quality_score", "args": {"model_path": mp}},
            {"name": "save", "kind": "sink", "format": "parquet",
             "dep": "s", "path": out, "mode": "overwrite"},
        ],
    }
    pipeline_from_spec(spec).run(spark, conf={})
    via_spec = {r["doc_id"]: r["quality_prob"]
                for r in spark.read.parquet(out).collect()}
    assert via_spec == direct
