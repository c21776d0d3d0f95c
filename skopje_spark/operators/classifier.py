"""Trainable text quality classifier: hashing-trick features +
distributed logistic regression.

The rule filters (webtext.gopher_quality_flags, c4_line_filter) are
the first pass of a curation pipeline; production pipelines follow
them with a TRAINED quality model (fastText-style linear classifier
over hashed token features — the CCNet/Llama-data shape) scored over
the whole corpus. This module implements that shape natively:

- :func:`hashed_features` — the hashing trick: tokens hash into a
  fixed ``dim``-slot count vector (Weinberger et al. 2009), log1p-
  damped. Pure JVM expressions (hash → pmod → pivot-free dense
  array), no vocabulary state at all — the property that makes the
  featurizer embarrassingly scalable and drift-free.
- :func:`logreg_train` — full-batch gradient descent, the classic
  mllib shape: per-partition PARTIAL gradients (Arrow-batched numpy,
  one (dim+1)-vector per partition), summed on the driver in a
  deterministic partition order, w updated there. Driver state is the
  weight vector alone; each iteration is one map-only pass over the
  cached features. Deterministic: w0 = 0 and full-batch means no RNG
  anywhere.
- :func:`logreg_score` — the dot product as a codegen
  ``zip_with``/``aggregate`` expression over the feature array with
  the weights as literals; sigmoid on top. No Python in the scoring
  hot path, so corpus-wide scoring fuses into the scan like every
  other curation pass.

Scale: training cost is iters × (one scan + a 32-row collect);
scoring is a narrow map. The 100 TB regime trains on a SAMPLE (pass
``df.sample(...)``) and scores everything — exactly how production
quality models run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 256,
) -> DataFrame:
    """``(id_col, features array<double>[dim])``: token counts hashed
    into ``dim`` slots (Spark murmur3 — stable across runs and
    sessions), log1p-damped. Stateless: no vocabulary to persist,
    ship, or go stale."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("tok"),
    )
    slot = toks.select(
        id_col, F.pmod(F.hash("tok"), F.lit(dim)).alias("j")
    ).groupBy(id_col, "j").agg(F.count(F.lit(1)).alias("c"))
    per_doc = slot.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("j"), F.col("c")))
        ).alias("__m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.log1p(
            F.coalesce(F.element_at(F.col("__m"), j), F.lit(0))
            .cast("double")
        ),
    )
    # docs with zero tokens still need a row (all-zero features)
    zeros = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0))
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__m").isNull(), zeros).otherwise(dense).alias(
                "features"
            ),
        )
    )


def logreg_train(
    df: DataFrame,
    label_col: str,
    features_col: str = "features",
    *,
    dim: int,
    iters: int = 40,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> list[float]:
    """Full-batch logistic regression; returns ``dim`` weights + bias
    (last element). ``label_col`` is 0/1. Per iteration: every
    partition emits its PARTIAL gradient as one (dim+1)-vector over
    Arrow; the driver sums them in sorted partition order (float sums
    made order-deterministic) and takes the step. The features frame
    is cached by the caller if reuse matters; this function only
    scans it."""
    import numpy as np

    data = df.select(
        F.col(features_col).alias("x"), F.col(label_col).cast("double").alias("y")
    ).localCheckpoint(eager=True)
    n = data.count()
    if n == 0:
        raise ValueError("logreg_train: empty training set")
    w = np.zeros(dim + 1, dtype=np.float64)

    schema = "pid long, grad array<double>"

    for _ in range(int(iters)):
        wb = w.copy()

        def partial(batches, _w=wb):
            import numpy as np
            import pandas as pd
            from pyspark import TaskContext

            g = np.zeros(_w.shape[0], dtype=np.float64)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                seen = True
                X = np.asarray(pdf["x"].tolist(), dtype=np.float64)
                y = pdf["y"].to_numpy()
                z = X @ _w[:-1] + _w[-1]
                p = 1.0 / (1.0 + np.exp(-z))
                r = y - p
                g[:-1] += X.T @ r
                g[-1] += r.sum()
            if seen:
                yield pd.DataFrame(
                    {"pid": [TaskContext.get().partitionId()],
                     "grad": [g.tolist()]}
                )

        rows = data.mapInPandas(partial, schema).collect()
        grad = np.zeros(dim + 1, dtype=np.float64)
        for r in sorted(rows, key=lambda r: r["pid"]):
            grad += np.asarray(r["grad"], dtype=np.float64)
        grad /= n
        grad[:-1] -= l2 * w[:-1]
        w += lr * grad
    return [float(x) for x in w]


def logreg_margin(weights: list[float], features_col: str = "features") -> Column:
    """The linear margin w·x + b as a codegen expression — weights are
    literals, the dot product is zip_with + aggregate over the feature
    array. No UDF, so corpus-wide scoring stays JVM-side."""
    from skopje_spark.operators._lit import double_array_lit

    w = double_array_lit(weights[:-1])
    dot = F.aggregate(
        F.zip_with(F.col(features_col), w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot + F.lit(float(weights[-1]))


def logreg_score(
    df: DataFrame,
    weights: list[float],
    features_col: str = "features",
    *,
    out_col: str = "prob",
) -> DataFrame:
    """Append σ(w·x + b) as ``out_col`` — a narrow map."""
    z = logreg_margin(weights, features_col)
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def logreg_model_write(
    path: str, weights: list[float], *, dim: int, meta: dict | None = None
) -> None:
    """Persist a trained model as a JSON artifact (weights are
    kilobytes — the same driver-artifact class as centroids and BPE
    merge tables). Atomic replace, so readers never see a torn model."""
    import json as _json
    import os as _os
    import tempfile as _tempfile

    _os.makedirs(path, exist_ok=True)
    fd, tmp = _tempfile.mkstemp(dir=path, prefix="._model")
    with _os.fdopen(fd, "w") as f:
        _json.dump(
            {"weights": [float(w) for w in weights], "dim": int(dim),
             "meta": meta or {}},
            f,
        )
    _os.replace(tmp, _os.path.join(path, "_MODEL.json"))


def logreg_model_read(path: str) -> tuple[list[float], int, dict]:
    """Load ``(weights, dim, meta)`` written by
    :func:`logreg_model_write`."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_MODEL.json")) as f:
        d = _json.load(f)
    return d["weights"], int(d["dim"]), d.get("meta", {})


def quality_score(
    df: DataFrame,
    model_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score documents with a persisted model: stateless featurization
    at the model's recorded dim + the codegen sigmoid margin — the
    deploy-side half of the train/score split, and the spec-node
    surface for declarative pipelines."""
    weights, dim, _ = logreg_model_read(model_path)
    feats = hashed_features(df, id_col, text_col, dim=dim)
    return df.join(
        logreg_score(feats, weights, out_col=out_col).select(id_col, out_col),
        id_col,
    )
