"""Embedding compression operators: int8 scalar quantization and
Johnson–Lindenstrauss random projection.

Why these are first-class at 100 TB: an embedding column is usually
the widest thing in a training-data lake (64–4096 float32s per row).
Scalar int8 quantization cuts its bytes 4× with ~0.2% cosine error;
JL projection cuts the *dimension* (64→16 here) while preserving
pairwise geometry within 1±ε — both standard preprocessing before
ANN indexing or long-term storage, and both pure narrow maps (no
shuffle, whole-stage codegen, no UDF).

Determinism: every kernel is built from IEEE-754-primitive arithmetic
(the ``dround`` construction — floor/multiply/add only), so DuckDB
reproduces bit-identical outputs for the oracle hash; the projection
matrix is a fixed ±1 pattern derived from (plane, position) index
arithmetic, not an RNG (reference analog: the reference ships raw
bytes through opaque columns, /root/reference/src/extract/fs.rs:19-60,
and leaves numeric layout to Postgres; compression is a Spark-native
extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quantize_int8",
    "dequantize_int8",
    "random_projection",
    "projection_signs",
]


def _sym_round(col: Column) -> Column:
    """Round-half-away-from-zero to integer via floor arithmetic —
    the same primitive construction as queries.rounding.dround, so
    both engines produce identical ints at .5 boundaries."""
    return F.when(
        col < 0, -F.floor(-col + F.lit(0.5))
    ).otherwise(F.floor(col + F.lit(0.5)))


def quantize_int8(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale = max|x|/127``,
    ``q_i = round(x_i / scale)`` ∈ [-127, 127].

    Per-VECTOR scale (not per-corpus) keeps the quantizer streaming-
    and partition-independent: each row is self-contained, so append,
    shuffle, or re-partition cannot change any encoding — the property
    that makes the encoding safe to persist incrementally. All-zero
    vectors get scale 0 and all-zero codes (decode restores exact
    zeros). The whole kernel is array HOFs — no UDF, no shuffle.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    q = F.when(
        amax == 0,
        F.transform(v, lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(v, lambda x: _sym_round(x / scale).cast("int"))
    )
    return df.withColumn(scale_col, scale).withColumn(out_col, q)


def dequantize_int8(
    df: DataFrame,
    *,
    q_col: str = "qvec",
    scale_col: str = "qscale",
    out_col: str = "dqvec",
) -> DataFrame:
    """Decode: ``x̂_i = q_i · scale``. Reconstruction error is bounded
    by scale/2 = max|x|/254 per element."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda q: q.cast("double") * F.col(scale_col)),
    )


def projection_signs(plane: int, dim: int) -> list[int]:
    """Deterministic ±1 row of the projection matrix: row ``plane+1``
    of the dim×dim Hadamard matrix, ``H[r][i] = (-1)^popcount(r & i)``
    (row 0 — all ones — is skipped for balance). Hadamard rows are
    EXACTLY orthogonal and exactly balanced, the best fixed sign
    matrix a JL projection can use (a subsampled Hadamard transform);
    index arithmetic only, no RNG, so the pattern is reproducible
    anywhere. Requires dim to be a power of two."""
    if dim & (dim - 1):
        raise ValueError(f"projection_signs needs power-of-two dim, got {dim}")
    r = plane + 1
    if r >= dim:
        raise ValueError(f"out_dim must be < dim ({plane + 1} >= {dim})")
    return [1 if bin(r & i).count("1") % 2 == 0 else -1 for i in range(dim)]


def random_projection(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "proj",
    out_dim: int = 16,
    dim: int = 64,
) -> DataFrame:
    """JL sign-matrix projection: ``y_p = (Σ_i x_i·s_pi)/√out_dim``.

    A database-friendly Achlioptas projection: the ±1 matrix is baked
    into the plan as literals (out_dim × dim signs — a few KB of
    expression, like kmeans_assign's centroid literals), so the whole
    map is codegen over the corpus: no join, no shuffle, no UDF, and
    the scan only reads ``vec_col``. Distance preservation within
    1±ε for ε ~ √(8·ln n / out_dim) is the JL guarantee; the unit
    test checks realized pairwise-cosine drift on the fixture corpus.
    """
    import math

    inv = F.lit(1.0 / math.sqrt(float(out_dim)))
    comps = []
    for p in range(out_dim):
        signs = projection_signs(p, dim)
        comp = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        comps.append(comp * inv)
    return df.withColumn(out_col, F.array(*comps))
