"""Cardinality estimation from coordinated key samples.

"How big will this join be?" is the question that decides shuffle
partition counts, broadcast eligibility, and skew strategy BEFORE
running a 100 TB join. Exact pre-computation costs the join itself;
this module answers it from a tiny, deterministic sample.

Technique — coordinated (hash-correlated) Bernoulli KEY sampling
(the "end-biased" / correlated-sampling family, cf. Vengerov et al.,
"Join Size Estimation Subject to Filter Conditions", VLDB 2015):
both sides keep a key iff ``xxhash64(key, seed) mod M < p·M``. The
SAME hash on both sides means a sampled key survives on both sides
or neither — so the sampled sub-join is an unbiased miniature of the
real one, unlike independent row sampling (where matching rows
rarely co-survive and the estimate collapses):

    E[ Σ_{v sampled} f_A(v)·f_B(v) / p ] = Σ_v f_A(v)·f_B(v) = |A ⋈ B|

Everything is deterministic given the seed: same data → same sample
→ same estimate, so results are reproducible and testable to exact
values, not just in expectation.

Scale: the filter is a pushed-down cheap predicate on each scan; the
per-side per-key counts aggregate map-side (the sampled key space is
p of the original); the count join is tiny. Cost ≈ two partial scans
+ one small shuffle — nothing proportional to the join output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 1_000_003  # prime modulus; inclusion prob = _thr(rate)/_MOD exactly


def _thr(rate: float) -> int:
    t = int(rate * _MOD)
    if not (0 < t < _MOD):
        raise ValueError(f"rate {rate} out of (0, 1)")
    return t


def key_sample(df: DataFrame, key: str, *, rate: float, seed: int = 7) -> DataFrame:
    """Deterministic key-coordinated sample: keeps every row whose KEY
    hashes under the rate threshold (all-or-nothing per key value, the
    property join estimation needs). The predicate is a plain column
    expression — Catalyst pushes it into the scan.

    The key is hashed through its STRING form so the two join sides
    agree regardless of physical type (int vs bigint columns hash
    differently raw; a bigint cast would crash ANSI sessions on
    string/UUID keys and collapse them to one NULL key otherwise)."""
    h = F.pmod(F.xxhash64(F.col(key).cast("string"), F.lit(seed)), F.lit(_MOD))
    return df.filter(h < F.lit(_thr(rate)))


def sampled_join_size(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    *,
    rate: float = 0.05,
    seed: int = 7,
) -> DataFrame:
    """One-row frame estimating |A ⨝ B| on ``a_key = b_key``:
    ``est_join_size`` (double) plus ``sampled_keys`` diagnostics.

    Per-key frequencies are computed on each SAMPLED side (map-side
    combined over p of the keys), joined on the key, and
    Σ f_A·f_B is scaled by the exact inclusion probability. Relative
    error ~ sqrt((1/p − 1)·Σv² )/Σv with v = f_A·f_B — tight when the
    key space is large, which is exactly when estimation matters."""
    thr = _thr(rate)
    fa = (
        key_sample(a, a_key, rate=rate, seed=seed)
        .groupBy(F.col(a_key).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__fa"))
    )
    fb = (
        key_sample(b, b_key, rate=rate, seed=seed)
        .groupBy(F.col(b_key).cast("string").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__fb"))
    )
    return fa.join(fb, "__k").agg(
        (
            F.coalesce(F.sum(F.col("__fa") * F.col("__fb")), F.lit(0)).cast("double")
            * F.lit(float(_MOD) / thr)
        ).alias("est_join_size"),
        F.count(F.lit(1)).alias("sampled_keys"),
    )
