"""Unit + property tests per operator (SURVEY §5 items 2-3).

Mirrors the reference's only executable checks — the KeyMap doc-tests
(``/root/reference/src/keymap.rs:24-35,153-170``) — and adds the
invariants the oracle comparison can't see: idempotence, recall,
tie-breaking, self-similarity.
"""

from __future__ import annotations

import dataclasses
import datetime as dt

import pytest
from pyspark.sql import functions as F

from skopje_spark.functions import convert_date, convert_timestamp, schema_of
from skopje_spark.operators.asof import asof_join
from skopje_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
)
from skopje_spark.operators.keymap import keymap_assign, keymap_lookup
from skopje_spark.operators.similarity import (
    blocked_neardup_pairs,
    cosine_topk,
    ivf_topk,
)
from skopje_spark.operators.text import token_count


# --- KeyMap (golden values from the reference doc-tests) -------------

def _dim(spark):
    # keys {0,1,3}: the reference's doc-test fixture (keymap.rs:24-35)
    return spark.createDataFrame(
        [(0, "zero"), (1, "one"), (3, "three")], "key bigint, value string"
    )


def test_keymap_gapfill_golden(spark):
    """{0,1,3} + 'two' → 'two' gets key 2 (smallest free), and the next
    free key afterwards is 4 — the transact doc-test
    (keymap.rs:153-170)."""
    incoming = spark.createDataFrame([("two",)], "value string")
    out = keymap_assign(_dim(spark), incoming, policy="gapfill")
    rows = {r["value"]: r["key"] for r in out.collect()}
    assert rows == {"zero": 0, "one": 1, "three": 3, "two": 2}
    # next assignment fills the next gap: 4
    out2 = keymap_assign(
        out, spark.createDataFrame([("four",)], "value string"), policy="gapfill"
    )
    assert {r["value"]: r["key"] for r in out2.collect()}["four"] == 4


def test_keymap_dense_policy(spark):
    incoming = spark.createDataFrame([("b",), ("a",), ("one",)], "value string")
    out = keymap_assign(_dim(spark), incoming, policy="dense")
    rows = {r["value"]: r["key"] for r in out.collect()}
    # existing keys unchanged; new values get max+1.. in value order
    assert rows["one"] == 1 and rows["a"] == 4 and rows["b"] == 5
    # bijective: keys and values both unique
    assert out.select("key").distinct().count() == out.count()
    assert out.select("value").distinct().count() == out.count()


def test_keymap_assign_idempotent(spark):
    """Re-assigning already-known values changes nothing."""
    incoming = spark.createDataFrame([("zero",), ("three",)], "value string")
    for policy in ("dense", "gapfill"):
        out = keymap_assign(_dim(spark), incoming, policy=policy)
        assert sorted((r["key"], r["value"]) for r in out.collect()) == [
            (0, "zero"), (1, "one"), (3, "three")
        ]


def test_keymap_lookup_broadcast(spark):
    facts = spark.createDataFrame(
        [("zero", 10.0), ("three", 20.0), ("missing", 5.0)],
        "value string, amount double",
    )
    out = keymap_lookup(_dim(spark), facts)
    got = {r["amount"]: r["key"] for r in out.collect()}
    assert got == {10.0: 0, 20.0: 3, 5.0: None}


# --- as-of join ------------------------------------------------------

def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", dt.datetime(2024, 1, 10)), (2, "u1", dt.datetime(2024, 1, 20)),
         (3, "u2", dt.datetime(2024, 1, 5))],
        "event_id bigint, uid string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 8), 100), ("u1", dt.datetime(2024, 1, 15), 200),
         ("u2", dt.datetime(2024, 1, 7), 300)],
        "uid string, rts timestamp, val int",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _asof_frames(spark)
    out = asof_join(left, right, ["uid"], "ts", "rts", direction="backward")
    got = {r["event_id"]: r["val"] for r in out.collect()}
    assert got == {1: 100, 2: 200, 3: None}  # u2's order is after its event


def test_asof_forward_and_inner(spark):
    left, right = _asof_frames(spark)
    out = asof_join(
        left, right, ["uid"], "ts", "rts", direction="forward", how="inner"
    )
    got = {r["event_id"]: r["val"] for r in out.collect()}
    # e1 → u1's Jan-15 order (nearest at-or-after); e2 has none → dropped
    assert got == {1: 200, 3: 300}


def test_asof_tolerance(spark):
    left, right = _asof_frames(spark)
    out = asof_join(
        left, right, ["uid"], "ts", "rts",
        direction="backward", tolerance=F.expr("INTERVAL 3 DAYS"),
    )
    got = {r["event_id"]: r["val"] for r in out.collect()}
    # event 1: nearest is 2 days back (within 3d); event 2: 5 days back → null
    assert got == {1: 100, 2: None, 3: None}


def test_asof_equal_ts_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 10))], "event_id bigint, uid string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 10), 7), ("u", dt.datetime(2024, 1, 10), 9)],
        "uid string, rts timestamp, val int",
    )
    out = asof_join(
        left, right, ["uid"], "ts", "rts", direction="backward", tiebreak=["val"]
    )
    # equal timestamp included; max-tiebreak candidate wins
    assert out.collect()[0]["val"] == 9


# --- dedup -----------------------------------------------------------

def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "The quick  brown fox jumps over the lazy dog"),  # exact dup mod norm
            (3, "the quick brown fox jumps over the lazy cat"),   # near dup
            (4, "completely different content about spark engines here"),
        ],
        "doc_id bigint, text string",
    )


def test_exact_dedup_and_idempotence(spark):
    d = _docs(spark)
    dups = exact_duplicates(d, "doc_id", "text")
    assert dups.count() == 1
    assert dups.collect()[0]["canonical_id"] == 1

    once = dedup_exact(d, "doc_id", "text")
    assert once.count() == 3
    twice = dedup_exact(once, "doc_id", "text")  # property: idempotent
    assert sorted(r["doc_id"] for r in twice.collect()) == sorted(
        r["doc_id"] for r in once.collect()
    )


def test_jaccard_and_minhash_find_planted_near_dup(spark):
    d = _docs(spark)
    jp = jaccard_pairs(d, "doc_id", "text", threshold=0.2)
    pairs = {(r["id_a"], r["id_b"]) for r in jp.collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)

    mh = minhash_lsh_pairs(d, "doc_id", "text")
    mh_pairs = {(r["id_a"], r["id_b"]) for r in mh.collect()}
    assert (1, 2) in mh_pairs  # exact dups always share every band


def test_jaccard_repeated_grouping_ids_merge_shingle_sets(spark):
    """jaccard_pairs with a GROUPING id (many rows per id, e.g.
    id_col="source") must treat each id's shingle set as the union
    over its rows — a shingle occurring in two rows of the same id
    counts once in set_size and once in any intersection. Pins the
    default (unique_ids=False) semantics that q_corpus_source_overlap
    depends on; the unique_ids=True fast path is only claimed when
    the caller guarantees one row per id."""
    from skopje_spark.operators.dedup import jaccard_pairs, shingle_hashes

    rows = [
        # source A: the shared shingle "x y z" appears in BOTH rows
        ("A", "x y z"),
        ("A", "x y z q"),
        # source B: one row, overlapping set {x y z, y z q... }
        ("B", "x y z"),
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    sh = shingle_hashes(df, "source", "text", 3)
    # A's set = {h(x y z), h(y z q)} (deduped across rows), B's = {h(x y z)}
    sizes = {r["source"]: r["n"] for r in
             sh.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert sizes == {"A": 2, "B": 1}
    jp = jaccard_pairs(df, "source", "text", n=3, threshold=0.0).collect()
    assert len(jp) == 1
    r = jp[0]
    # |A∩B| = 1, |A∪B| = 2 → jaccard 0.5 (NOT 2/3, which the per-row-
    # only dedup would produce by double-counting A's repeated shingle)
    assert (r["id_a"], r["id_b"], r["n_common"]) == ("A", "B", 1)
    assert abs(r["jaccard"] - 0.5) < 1e-9


def test_jaccard_prefix_equals_plain_and_shrinks_candidates(spark, sf_dir):
    """The prefix filter is provably lossless: jaccard_pairs_prefix
    must be row-identical to jaccard_pairs at the same (n, threshold)
    on real fixture docs, while generating a strictly smaller pair
    space (the whole point of the filter)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from skopje_spark.operators.dedup import (
        jaccard_pairs_prefix,
        shingle_hashes,
    )
    from skopje_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    for thr in (0.4, 0.7):
        plain = sorted(
            tuple(r) for r in jaccard_pairs(
                d, "doc_id", "text", n=3, threshold=thr
            ).collect()
        )
        pref = sorted(
            tuple(r) for r in jaccard_pairs_prefix(
                d, "doc_id", "text", n=3, threshold=thr
            ).collect()
        )
        assert pref == plain and plain  # identical, non-trivial

    # candidate-space reduction: sum df(h)^2 over prefix shingles is
    # well below the same sum over all shingles
    sh = shingle_hashes(d, "doc_id", "text", 3)
    sh = sh.withColumn(
        "set_size", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    ).withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("h")))
    pos = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("h").asc())
    )
    thr = 0.7
    pref_len = F.col("set_size") - F.ceil(F.lit(thr) * F.col("set_size")) + F.lit(1)
    prefix = sh.withColumn("pos", pos).filter(F.col("pos") <= pref_len)

    def pair_space(frame):
        return (
            frame.groupBy("h")
            .agg(F.count(F.lit(1)).alias("dfh"))
            .agg(F.sum(F.col("dfh") * F.col("dfh")))
            .collect()[0][0]
        )

    full_cost, prefix_cost = pair_space(sh), pair_space(prefix)
    assert prefix_cost < full_cost / 2


def test_simhash_properties(spark):
    d = _docs(spark)
    fps = {r["doc_id"]: r["simhash"] for r in simhash(d, "doc_id", "text").collect()}
    assert fps[1] == fps[2]  # normalization-identical → identical fingerprint
    ham13 = bin(fps[1] ^ fps[3]).count("1")
    ham14 = bin(fps[1] ^ fps[4]).count("1")
    assert ham13 < ham14  # near-dup closer than unrelated


def test_simhash_unique_ids_bit_identical_and_shuffle_free(spark):
    """unique_ids=True keeps the token-set dedup in the array domain:
    fingerprints are bit-identical to the row-level-distinct plan, and
    the global distinct Exchange disappears from the physical plan."""
    d = _docs(spark)
    safe = {r["doc_id"]: r["simhash"] for r in simhash(d, "doc_id", "text").collect()}
    fast_df = simhash(d, "doc_id", "text", unique_ids=True)
    fast = {r["doc_id"]: r["simhash"] for r in fast_df.collect()}
    assert safe == fast
    # plan contract: exactly ONE hash exchange (the groupBy(id) vote
    # agg) — the row-level distinct's extra hash exchange is gone (the
    # remaining roundrobin one is ensure_parallelism's scan widening)
    plan = fast_df._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]  # AQE echoes both
    assert final_plan.count("Exchange hashpartitioning") <= 1


def test_tokens_repeated_ids_default_stays_safe(spark):
    """Default (unique_ids=False) must still merge token sets across
    rows sharing an id — the grouping-id case array_distinct alone
    cannot cover."""
    from skopje_spark.operators.dedup import tokens

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (1, "beta gamma"), (2, "delta")],
        "id int, text string",
    )
    got = {(r["id"], r["token"]) for r in tokens(df, "id", "text").collect()}
    assert got == {
        (1, "alpha"), (1, "beta"), (1, "gamma"), (2, "delta"),
    }


# --- similarity ------------------------------------------------------

def test_cosine_topk_self_similarity(spark, sf_dir):
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.orderBy("vec_id").limit(1)
    top = cosine_topk(e, q, k=3).collect()
    qid = q.collect()[0]["vec_id"]
    assert top[0]["vec_id"] == qid and top[0]["cos_sim"] == pytest.approx(1.0)
    assert top[0]["cos_sim"] >= top[1]["cos_sim"] >= top[2]["cos_sim"]


def test_ivf_consistent_with_bruteforce_on_probed_cells(spark, sf_dir):
    """IVF == probe-cells ∘ brute-force: restricted to the cells IVF
    probed, its answer must equal the exact top-k. (Absolute recall on
    the random fixture is ≈ n_probe/n_cells — labels aren't real
    clusters — so the composition, not a recall floor, is the
    testable contract.)"""
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.orderBy("vec_id").limit(1)
    approx = ivf_topk(e, q, cell_col="label", n_probe=3, k=10).collect()
    assert len(approx) == 10
    probed_labels = {
        r["label"]
        for r in e.join(
            spark.createDataFrame(
                [(r["vec_id"],) for r in approx], "vec_id bigint"
            ),
            "vec_id",
        ).collect()
    }
    restricted = e.filter(F.col("label").isin(*probed_labels))
    exact = [r["vec_id"] for r in cosine_topk(restricted, q, k=10).collect()]
    assert [r["vec_id"] for r in approx] == exact


def test_blocked_pairs_symmetric_bound(spark):
    e = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.01], 0), (3, [0.0, 1.0], 0),
         (4, [1.0, 0.0], 1)],
        "vec_id bigint, embedding array<float>, label int",
    )
    out = blocked_neardup_pairs(e, threshold=0.9).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert pairs == {(1, 2)}  # cross-label (1,4) excluded by blocking
    assert all(r["id_a"] < r["id_b"] for r in out)


# --- schema / date utils --------------------------------------------

def test_schema_of_dataclass():
    @dataclasses.dataclass
    class Symbol:
        symbol: str
        price: float
        ts: int
        tags: list[str]

    s = schema_of(Symbol)
    assert [f.name for f in s.fields] == ["symbol", "price", "ts", "tags"]
    assert s["price"].dataType.simpleString() == "double"
    assert s["tags"].dataType.simpleString() == "array<string>"


def test_date_conversions(spark):
    df = spark.createDataFrame(
        [(1716400000, "2024-05-22"), (0, "not-a-date")], "epoch bigint, s string"
    )
    out = df.select(
        convert_timestamp("epoch").alias("d1"), convert_date("s").alias("d2")
    ).collect()
    assert out[0]["d1"] == dt.date(2024, 5, 22)
    assert out[0]["d2"] == dt.date(2024, 5, 22)
    assert out[1]["d2"] is None  # mismatch → NULL, not a panic


def test_token_count_known_values(spark):
    df = spark.createDataFrame([("Hello, world! x2",)], "t string")
    # tokens: hello , world ! x2  → 5 (word pieces + punctuation singles)
    assert df.select(token_count(F.col("t")).alias("n")).collect()[0]["n"] == 5


def test_neardup_clusters_transitive(spark):
    """Chains collapse to one component; disjoint pairs stay apart."""
    from skopje_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


# --- multimodal ------------------------------------------------------

def test_multimodal_resize_and_frames_and_features(spark):
    from skopje_spark.operators.multimodal import (
        attach_payload,
        extract_features,
        resize_media,
        sample_frames,
    )

    d = spark.createDataFrame(
        [(1, "abcdefgh" * 4), (2, "xy")], "doc_id bigint, text string"
    )
    m = attach_payload(d, "text")

    r = {row["doc_id"]: row for row in resize_media(m, width=4, height=4).collect()}
    assert all(len(bytes(row["payload"])) == 16 for row in r.values())
    assert bytes(r[2]["payload"])[:2] == b"xy"          # content preserved
    assert bytes(r[2]["payload"])[2:] == b"\0" * 14     # padded

    frames = sample_frames(m, every_n=1).collect()
    by_doc = {}
    for row in frames:
        by_doc.setdefault(row["doc_id"], []).append(row)
    # decode-stub arithmetic: n_frames = len % 8 + 1 → 32B → 1, 2B → 3
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 3

    feats = {row["doc_id"]: row["embedding"]
             for row in extract_features(m, dim=8).collect()}
    assert len(feats[1]) == 8
    import math
    assert math.isclose(sum(x * x for x in feats[1]), 1.0, rel_tol=1e-5)


def test_banded_range_join_boundary_semantics(spark):
    from skopje_spark.operators.rangejoin import banded_range_join

    left = spark.createDataFrame([(1, 100.0), (2, 500.0)], "lid int, lv double")
    right = spark.createDataFrame(
        [(10, 50.0), (11, 150.0), (12, 151.0), (13, 400.0)],
        "rid int, rv double",
    )
    inner = banded_range_join(left, right, "lv", "rv", 50.0).collect()
    pairs = {(r["lid"], r["rid"]) for r in inner}
    # inclusive at exactly radius (150-100=50); 151 excluded; 400 vs 500 excluded
    assert pairs == {(1, 10), (1, 11)}

    left_j = banded_range_join(left, right, "lv", "rv", 50.0, how="left")
    got = {(r["lid"], r["rid"]) for r in left_j.collect()}
    assert got == {(1, 10), (1, 11), (2, None)}  # unmatched left retained


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-validation of the union-window asof against
    pandas.merge_asof (fixed seeds → deterministic)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    for trial in range(3):
        n_l, n_r = 40, 30
        left = pd.DataFrame({
            "uid": rng.randint(0, 5, n_l).astype(str),
            "ts": pd.to_datetime(rng.randint(0, 10_000, n_l), unit="s"),
            "lid": np.arange(n_l),
        }).sort_values("ts").reset_index(drop=True)
        right = pd.DataFrame({
            "uid": rng.randint(0, 5, n_r).astype(str),
            "rts": pd.to_datetime(rng.randint(0, 10_000, n_r), unit="s"),
            "val": rng.randint(0, 1000, n_r),
        }).drop_duplicates(["uid", "rts"]).sort_values("rts").reset_index(drop=True)

        expect = pd.merge_asof(
            left, right, left_on="ts", right_on="rts", by="uid",
            direction="backward",
        )
        from skopje_spark.operators.asof import asof_join

        sl = spark.createDataFrame(left)
        sr = spark.createDataFrame(right)
        got = asof_join(
            sl, sr, ["uid"], "ts", "rts", direction="backward",
            left_id=["lid"],
        ).toPandas().sort_values("lid").reset_index(drop=True)

        exp_vals = expect.sort_values("lid")["val"].astype("float64").reset_index(drop=True)
        got_vals = got["val"].astype("float64").reset_index(drop=True)
        pd.testing.assert_series_equal(exp_vals, got_vals, check_names=False)


def test_winnow_fingerprints_edit_robust(spark):
    """A local edit changes only nearby fingerprints: the winnowed
    sets of original vs locally-edited text overlap heavily, while the
    whole-document sha256 fingerprint changes completely."""
    from skopje_spark.operators.text import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    edited = base.replace("lazy", "hazy", 1)  # one local edit
    df = spark.createDataFrame([(1, base), (2, edited)], "doc_id bigint, text string")
    fps = winnow_fingerprints(df, "doc_id", "text").collect()
    s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    overlap = len(s1 & s2) / len(s1 | s2)
    assert overlap > 0.5  # most fingerprints survive the edit
    assert s1 != s2       # but the edit is detectable


def test_neardup_clusters_star_matches_label(spark):
    """Large-star/small-star reaches the same fixpoint as min-label
    propagation on assorted graph shapes."""
    import random

    from skopje_spark.operators.dedup import neardup_clusters

    random.seed(23)
    edges = set()
    # several random components over disjoint id ranges
    for lo in (0, 100, 200):
        ids = list(range(lo, lo + 30))
        for _ in range(40):
            edges.add((random.choice(ids), random.choice(ids)))
    pairs = spark.createDataFrame(sorted(edges), "id_a bigint, id_b bigint")
    by_label = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(pairs, algorithm="label", max_iterations=60).collect()
    }
    by_star = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(pairs, algorithm="star").collect()
    }
    assert by_star == by_label


def test_neardup_clusters_star_deep_chain_bounded(spark):
    """A 60-node path graph: min-label would need 60 diameter rounds;
    the star alternation contracts it in O(log n) checkpointed rounds
    (pre-checkpoint lineage growth made this shape hang)."""
    from skopje_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a bigint, id_b bigint"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(pairs, algorithm="star", max_iterations=12).collect()
    }
    assert got == {i: 0 for i in range(61)}


def test_neardup_clusters_label_deep_chain_checkpointed(spark):
    """min-label on a 25-deep path completes in bounded time: each round
    is checkpointed so the plan stays flat instead of doubling 25x."""
    from skopje_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], "id_a bigint, id_b bigint"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(pairs, max_iterations=30).collect()
    }
    assert got == {i: 0 for i in range(26)}


def test_neardup_clusters_frees_intermediate_generations(spark):
    """At most the final label generation stays in storage after the
    loop — superseded checkpoints are unpersisted as they are replaced."""
    from skopje_spark.operators.dedup import neardup_clusters

    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a bigint, id_b bigint"
    )
    neardup_clusters(pairs).collect()
    after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    assert len(after - before) <= 1


# --- quantitative accuracy floors (no query is "rows >= 0"-verified) --

def test_kmeans_training_numpy_final_assignment_is_codegen(spark, sf_dir):
    """The numpy training rounds are an internal optimization: the
    RETURNED assignment must be exactly kmeans_assign (the
    literal-codegen map downstream oracles bind) evaluated at the
    returned centroids, and the whole trainer must be deterministic
    across runs (value-sorted partial fold)."""
    from skopje_spark.operators.similarity import kmeans_assign, kmeans_cells
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(300)
    assigned, cents = kmeans_cells(
        e, id_col="vec_id", vec_col="embedding", k=5, iters=2
    )
    got = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    want = {
        r["vec_id"]: r["cell"]
        for r in kmeans_assign(e, cents, vec_col="embedding").collect()
    }
    assert got == want
    _, cents2 = kmeans_cells(
        e, id_col="vec_id", vec_col="embedding", k=5, iters=2
    )
    assert cents == cents2  # bit-identical across runs


def test_ivf_kmeans_recall_beats_label_quantizer(spark):
    """On clustered data a true k-means quantizer recovers the cluster
    structure: probing 2/8 cells keeps >= 90% of the exact top-10,
    while geometry-blind label cells lose most of it. (The random
    embeddings fixture has no cluster structure, so this contract is
    only testable on data that does.)"""
    import random

    from skopje_spark.operators.similarity import kmeans_cells

    random.seed(31)
    dim, per = 32, 30
    centers = [
        [random.gauss(0, 1) for _ in range(dim)] for _ in range(8)
    ]
    rows = []
    for c, center in enumerate(centers):
        for j in range(per):
            vec = [x + random.gauss(0, 0.05) for x in center]
            vid = c * per + j
            rows.append((vid, vec, vid % 8))  # label uncorrelated w/ geometry
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")

    q = e.orderBy("vec_id").limit(1)
    exact = {r["vec_id"] for r in cosine_topk(e, q, k=10).collect()}

    assigned, cents = kmeans_cells(e, id_col="vec_id", vec_col="embedding", k=8, iters=3)
    qa = assigned.orderBy("vec_id").limit(1)
    got_kmeans = {
        r["vec_id"]
        for r in ivf_topk(assigned, qa, cell_col="cell", n_probe=2, k=10).collect()
    }
    got_label = {
        r["vec_id"]
        for r in ivf_topk(e, q, cell_col="label", n_probe=2, k=10).collect()
    }
    recall_kmeans = len(got_kmeans & exact) / 10
    recall_label = len(got_label & exact) / 10
    assert len(cents) == 8
    assert recall_kmeans >= 0.9
    assert recall_kmeans > recall_label


def test_ivf_kmeans_recall_holds_with_strict_subsample(spark):
    """The sample-trained quantizer's contract in the regime the
    fixtures never reach (train_sample < corpus): training on 64 of
    480 clustered vectors must still recover the cluster structure —
    the IVF recall floor holds (r14 advisor item: the sampled path
    needs coverage where the sample genuinely subsets the input)."""
    import random

    from skopje_spark.operators.similarity import kmeans_cells

    random.seed(47)
    dim, per = 32, 60
    centers = [[random.gauss(0, 1) for _ in range(dim)] for _ in range(8)]
    rows = []
    for c, center in enumerate(centers):
        for j in range(per):
            vec = [x + random.gauss(0, 0.05) for x in center]
            rows.append((c * per + j, vec))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    q = e.orderBy("vec_id").limit(1)
    exact = {r["vec_id"] for r in cosine_topk(e, q, k=10).collect()}
    assigned, cents = kmeans_cells(
        e, id_col="vec_id", vec_col="embedding", k=8, iters=3,
        train_sample=64,
    )
    qa = assigned.orderBy("vec_id").limit(1)
    got = {
        r["vec_id"]
        for r in ivf_topk(assigned, qa, cell_col="cell", n_probe=2, k=10).collect()
    }
    assert len(cents) == 8
    assert len(got & exact) / 10 >= 0.9


def test_lsh_bucket_recall_on_near_duplicates(spark):
    """Vectors with cosine ~1 must collide: tiny perturbations of a
    base vector land in the same bucket >= 90% of the time, while
    random vector pairs are spread across many buckets."""
    import math
    import random

    from skopje_spark.operators.similarity import rh_lsh_buckets

    random.seed(5)
    dim = 64
    rows = []
    for i in range(60):
        base = [random.gauss(0, 1) for _ in range(dim)]
        near = [x + random.gauss(0, 1e-4) for x in base]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, near))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = {
        r["vec_id"]: r["lsh_bucket"]
        for r in rh_lsh_buckets(df, n_planes=8, dim=dim).collect()
    }
    same = sum(1 for i in range(60) if b[2 * i] == b[2 * i + 1])
    assert same >= 54  # >= 90% near-dup pair collision
    assert len(set(b.values())) >= 8  # corpus spreads over many buckets


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ estimate is within 3x the configured rsd of the exact
    distinct count (not merely 'returns rows')."""
    from skopje_spark.tables import load_table

    l = load_table(spark, sf_dir, "lineitem")
    rows = (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.06 * r["exact"])


def test_approx_percentile_error_bound(spark, sf_dir):
    """approx_percentile ranks land within the configured accuracy's
    rank tolerance of the exact percentiles."""
    from skopje_spark.tables import load_table

    l = load_table(spark, sf_dir, "lineitem")
    vals = sorted(r["l_extendedprice"] for r in l.select("l_extendedprice").collect())
    n = len(vals)
    got = l.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("p")
    ).collect()[0]["p"]
    for pct, g in zip((0.5, 0.95, 0.99), got):
        # rank error bound: accuracy=10000 -> within n/10000 ranks
        lo = vals[max(0, int(pct * n) - max(2, n // 10000) - 1)]
        hi = vals[min(n - 1, int(pct * n) + max(2, n // 10000) + 1)]
        assert lo <= g <= hi


def test_decode_media_real_codec_feature_gate(spark):
    """With codecs installed the real PIL kernel decodes true
    dimensions; without, the stub path still works and forcing
    real=True fails fast on the driver. Skipped-not-failed either way."""
    from skopje_spark.operators.multimodal import (
        HAVE_CODECS,
        attach_payload,
        decode_media,
    )

    d = spark.createDataFrame([(1, "abc" * 10)], "doc_id bigint, text string")
    m = attach_payload(d, "text")
    # auto mode always works: stub here, PIL where codecs exist
    rows = decode_media(m).collect()
    assert rows[0]["byte_len"] == 30

    if not HAVE_CODECS:
        import pytest as _pytest

        with _pytest.raises(NotImplementedError, match="PIL"):
            decode_media(m, real=True)
        _pytest.skip("no media codecs in this container; real path gated off")

    # real-codec branch (runs only where PIL exists): decode a 1x1 PNG
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (3, 2)).save(buf, format="PNG")
    png = spark.createDataFrame([(7, bytearray(buf.getvalue()))],
                                "doc_id bigint, payload binary")
    out = decode_media(png, real=True).collect()[0]
    assert (out["width"], out["height"]) == (3, 2)


# --- bloom membership ------------------------------------------------

def test_bloom_anti_join_equals_exact_anti_join(spark):
    """The bloom path must be an accelerator, not an approximation:
    result set identical to the plain left_anti join (false positives
    are confirmed away; no false negatives exist by construction)."""
    import random

    from skopje_spark.operators.bloom import bloom_anti_join

    random.seed(17)
    train = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(400)], "id long, key string"
    )
    seen_ids = random.sample(range(400), 150) + [10_000 + i for i in range(50)]
    seen = spark.createDataFrame(
        [(f"key-{i}",) for i in seen_ids], "key string"
    )
    got = {r["id"] for r in bloom_anti_join(train, seen, train_key="key").collect()}
    exact = {r["id"] for r in train.join(seen, "key", "left_anti").collect()}
    assert got == exact


def test_bloom_no_false_negatives_and_low_fpp(spark):
    """Every seen key probes True; fresh keys probe True at well under
    the configured fpp envelope (m=2^20, k=5, n=500 -> fpp ~ 1e-10)."""
    from skopje_spark.operators.bloom import build_bloom, might_contain

    seen = spark.createDataFrame([(f"s{i}",) for i in range(500)], "key string")
    fresh = spark.createDataFrame([(f"f{i}",) for i in range(500)], "key string")
    bm = build_bloom(seen, "key")
    hits_seen = might_contain(seen, bm, "key").filter("might_contain").count()
    hits_fresh = might_contain(fresh, bm, "key").filter("might_contain").count()
    assert hits_seen == 500      # no false negatives, ever
    assert hits_fresh <= 5       # ~0 expected at this m/n


def test_neardup_clusters_star_nonconverged_one_row_per_node(spark):
    """Cut off before the star-forest fixpoint: every node still gets
    exactly ONE (doc_id, cluster_id) row — the post-loop min-collapse
    degrades to a possibly-non-minimal label, never duplicate rows."""
    from skopje_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a bigint, id_b bigint"
    )
    rows = neardup_clusters(pairs, algorithm="star", max_iterations=1).collect()
    ids = [r["doc_id"] for r in rows]
    assert sorted(ids) == list(range(41))        # one row per node, no dupes
    assert all(r["cluster_id"] <= r["doc_id"] for r in rows)


def test_bloom_non_multiple_of_8_bits(spark):
    """num_bits that isn't a byte multiple: probes reach bit num_bits-1,
    so the bitmap must round UP — and build/probe must agree."""
    import pytest

    from skopje_spark.operators.bloom import (
        bloom_anti_join, build_bloom, might_contain,
    )

    train = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(60)], "id long, key string"
    )
    seen = spark.createDataFrame([(f"key-{i}",) for i in range(0, 60, 3)], "key string")
    got = {
        r["id"]
        for r in bloom_anti_join(
            train, seen, train_key="key", num_bits=1021, k=3
        ).collect()
    }
    exact = {r["id"] for r in train.join(seen, "key", "left_anti").collect()}
    assert got == exact
    # mismatched num_bits between build and probe is rejected up front
    bm = build_bloom(seen, "key", num_bits=64)
    with pytest.raises(ValueError):
        might_contain(train, bm, "key", num_bits=1 << 20)


def test_cosine_topk_batch_matches_single_query_calls(spark, sf_dir):
    """The batched one-pass top-k must equal k independent
    single-query cosine_topk calls, per query."""
    from skopje_spark.operators.similarity import cosine_topk, cosine_topk_batch
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in cosine_topk_batch(
        e, queries, qid_col="query_id", k=5
    ).collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cos_sim"]))
    for qr in queries.collect():
        single = cosine_topk(
            e, e.filter(F.col("vec_id") == qr["query_id"]), k=5
        ).collect()
        want = [(r["vec_id"], r["cos_sim"]) for r in single]
        assert got[qr["query_id"]] == want, qr["query_id"]


def test_ivf_index_persist_and_probe(spark, sf_dir, tmp_path):
    """Persisted IVF index: probing the on-disk index returns the same
    top-k as the in-memory IVF over identical cells, and the probe
    scan partition-prunes to exactly the probed cell directories."""
    from skopje_spark.operators.similarity import (
        ivf_index_topk,
        ivf_index_write,
        ivf_topk,
        kmeans_cells,
    )
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_index_write(e, path, k=8, iters=3)

    q = e.orderBy("vec_id").limit(1)
    got = ivf_index_topk(spark, path, q, n_probe=3, k=10)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell#" in plan and " IN (" in plan, plan

    assigned, _ = kmeans_cells(e, k=8, iters=3)
    want = ivf_topk(assigned, q, cell_col="cell", n_probe=3, k=10)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_bloom_rejects_smaller_probe_range(spark):
    """The dangerous mismatch direction: probing with a SMALLER
    num_bits than the build passes an index-bounds check yet maps keys
    to different bit positions — silent false negatives. Both
    directions must be rejected up front."""
    from skopje_spark.operators.bloom import build_bloom, might_contain

    seen = spark.createDataFrame([(f"k{i}",) for i in range(50)], "key string")
    train = spark.createDataFrame([(1, "k1")], "id long, key string")
    bm = build_bloom(seen, "key", num_bits=1 << 12)
    with pytest.raises(ValueError):
        might_contain(train, bm, "key", num_bits=64)


def test_star_clusters_every_node_labeled_on_early_cut(spark):
    """A deep chain with max_iterations=1: the star loop cannot
    converge, but the post-loop min-collapse + one-hop label
    compression must still emit exactly one row per node (ids may be
    non-canonical — the documented early-cut degradation)."""
    from skopje_spark.operators.dedup import neardup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    out = neardup_clusters(
        chain, id_a="id_a", id_b="id_b", max_iterations=1, algorithm="star"
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert sorted(ids) == list(range(13))  # one row per node, none dropped
    for r in out:
        assert r["cluster_id"] <= r["doc_id"]


def test_cosine_zero_norm_convention_unified(spark):
    """A zero vector must score ~0 (never NaN) in BOTH the HOF cosine
    path and the batched numpy kernel, so single-query and batch
    top-k rank degenerate corpora identically (advice r5)."""
    from skopje_spark.operators.similarity import cosine_topk, cosine_topk_batch

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0]),   # degenerate corpus vector
        (3, [0.5, 0.5, 0.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = e.filter(F.col("vec_id") == 1).select("vec_id", "embedding")

    single = cosine_topk(e, q, k=3).collect()
    assert [r["vec_id"] for r in single] == [1, 3, 2]
    zero_row = [r for r in single if r["vec_id"] == 2][0]
    assert zero_row["cos_sim"] == 0.0  # clamped denominator, not NaN

    batch = cosine_topk_batch(
        e, q.select(F.col("vec_id").alias("query_id"), "embedding"), k=3
    ).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in sorted(batch, key=lambda r: -r["cos_sim"])] == [
        (r["vec_id"], r["cos_sim"]) for r in single
    ]


def test_ivf_index_append_matches_rebuild_on_probed_cells(spark, sf_dir, tmp_path):
    """Appending to a persisted IVF index (no re-quantize) must be
    indistinguishable at query time from an index whose vectors/ dirs
    were built from the union with the SAME frozen centroids: the
    probed-cell top-k equals brute-force over the union rows assigned
    to the probed cells. The append also reports a staleness metric
    anchored to the build-time fit baseline."""
    from skopje_spark.operators.similarity import (
        cosine_topk,
        ivf_index_append,
        ivf_index_topk,
        kmeans_assign,
    )
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    base = e.filter(F.col("vec_id") % 5 != 0)
    extra = e.filter(F.col("vec_id") % 5 == 0)

    from skopje_spark.operators.similarity import ivf_index_write

    path = str(tmp_path / "ivf")
    ivf_index_write(base, path, k=8, iters=3)
    stats = ivf_index_append(extra, path)

    assert stats["n_appended"] == extra.count()
    assert stats["build_mean_cos"] is not None
    # same-distribution append: fit within a few percent of build fit
    assert abs(stats["staleness_drop"]) < 0.1, stats

    q = e.orderBy("vec_id").limit(1)
    got = ivf_index_topk(spark, path, q, n_probe=3, k=10)

    # expected: re-derive the probe set with the FROZEN stored
    # centroids (the same deterministic rule ivf_index_topk applies:
    # 6-dp-rounded cosine, cell-id tiebreak), re-assign the union with
    # those frozen centroids, brute-force only the probed cells
    import math

    from skopje_spark.queries.rounding import dround_scalar

    cents = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    cent_list = [[float(x) for x in r["centroid"]] for r in cents]
    qv = [float(x) for x in q.select("embedding").collect()[0][0]]
    qn = math.sqrt(sum(x * x for x in qv))

    def score(c):
        dot = sum(a * b for a, b in zip(c, qv))
        return dround_scalar(dot / (math.sqrt(sum(a * a for a in c)) * qn), 6)

    ranked = sorted(
        ((score(cent_list[i]), r["cell"]) for i, r in enumerate(cents)),
        key=lambda t: (-t[0], t[1]),
    )
    probe = [cell for _, cell in ranked[:3]]

    # kmeans_assign emits list POSITIONS; remap to the index's actual
    # cell ids exactly like ivf_index_append does (robust to an empty
    # build cell making the id space non-contiguous)
    cell_of_pos = F.array(*[F.lit(int(r["cell"])) for r in cents])
    union_assigned = kmeans_assign(
        base.unionByName(extra), cent_list, out_col="__pos"
    ).withColumn("cell", F.element_at(cell_of_pos, F.col("__pos") + 1))
    candidates = union_assigned.filter(F.col("cell").isin(probe))
    want = cosine_topk(candidates, q, k=10)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_ivf_index_rebuild_resets_stats_and_empty_append(spark, sf_dir, tmp_path):
    """A rebuild at the same path must reset the stats history (the
    next append reads the FRESH build baseline, not a stale one), and
    an empty append returns n_appended=0 instead of crashing (r6
    self-review)."""
    from skopje_spark.operators.similarity import ivf_index_append, ivf_index_write
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    base = e.filter(F.col("vec_id") % 5 != 0)
    extra = e.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "ivf")

    ivf_index_write(base, path, k=4, iters=2)
    ivf_index_append(extra, path)
    # rebuild on the union: stats history must collapse to one build row
    ivf_index_write(base.unionByName(extra), path, k=4, iters=2)
    stats = spark.read.parquet(f"{path}/stats")
    assert stats.count() == 1
    assert stats.collect()[0]["phase"] == "build"

    empty = extra.limit(0)
    res = ivf_index_append(empty, path)
    assert res["n_appended"] == 0
    assert res["append_mean_cos"] is None and res["staleness_drop"] is None
    # a real append after the rebuild sees the fresh baseline
    res2 = ivf_index_append(extra.limit(50), path)
    assert res2["build_mean_cos"] is not None
    assert res2["staleness_drop"] is not None


def test_dup_span_coverage_interval_union(spark):
    """Hand-computed: docs 1 and 2 share a 10-token run (overlapping
    duplicated 8-gram windows must merge, not double-count); doc 3 is
    unique. Coverage(1) = 10/14, coverage(2) = 10/12, coverage(3)=0,
    and a short doc (<8 tokens) reports 0 without erroring."""
    from skopje_spark.operators.dedup import dup_span_coverage

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    d = spark.createDataFrame(
        [
            (1, "one two three four " + shared),          # 4 + 10 = 14 tokens
            (2, shared + " kilo lima"),                   # 10 + 2 = 12 tokens
            (3, "totally unrelated words live here without any twin at all"),
            (4, "too short for windows"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dup_span_coverage(d, "doc_id", "text", n=8).collect()
    }
    assert got[1]["covered_tokens"] == 10 and got[1]["n_tokens"] == 14
    assert abs(got[1]["dup_coverage"] - round(10 / 14, 6)) < 1e-9
    assert got[2]["covered_tokens"] == 10 and got[2]["n_tokens"] == 12
    assert got[3]["covered_tokens"] == 0
    assert got[4]["covered_tokens"] == 0 and got[4]["n_tokens"] == 4


def test_table_digest_invariance_and_sensitivity(spark):
    """Digests are pure functions of table CONTENT: invariant under
    repartitioning and row order; a single-cell change flips exactly
    the one bucket holding that key (both tiers); the bounded tier's
    sum digest is mergeable (union == per-bucket sum of parts)."""
    from pyspark.sql import functions as F

    from skopje_spark.operators.quality import table_digest

    rows = [(i, f"v{i % 17}", f"p{i % 5}") for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, a string, b string")
    keys, cols, nb = ["k"], ["k", "a", "b"], 16

    def snap(frame, **kw):
        return {
            r["bucket"]: tuple(r[c] for c in frame.columns if c != "bucket")
            for r in frame.collect()
        }

    d1 = snap(table_digest(df.repartition(1), keys, cols, n_buckets=nb))
    d17 = snap(table_digest(df.repartition(17), keys, cols, n_buckets=nb))
    assert d1 == d17 and len(d1) == nb

    flipped = df.withColumn(
        "a", F.when(F.col("k") == 123, F.lit("CHANGED")).otherwise(F.col("a"))
    )
    d_flip = snap(table_digest(flipped, keys, cols, n_buckets=nb))
    assert sum(1 for b in d1 if d1[b] != d_flip[b]) == 1

    # bounded tier: same invariance + sensitivity + additive merge
    b_all = snap(table_digest(df, keys, cols, n_buckets=nb, exact=False))
    b_flip = snap(table_digest(flipped, keys, cols, n_buckets=nb, exact=False))
    assert sum(1 for b in b_all if b_all[b] != b_flip[b]) == 1
    lo = table_digest(df.filter(F.col("k") < 250), keys, cols, n_buckets=nb, exact=False)
    hi = table_digest(df.filter(F.col("k") >= 250), keys, cols, n_buckets=nb, exact=False)
    merged = {
        r["bucket"]: (r["n"], r["s"])
        for r in lo.unionByName(hi)
        .groupBy("bucket")
        .agg(F.sum("n_rows").alias("n"), F.sum("digest_sum").alias("s"))
        .collect()
    }
    assert merged == {b: (v[0], v[1]) for b, v in b_all.items()}


def test_table_digest_null_position_sensitivity(spark):
    """Rows differing only in WHICH column is NULL must hash
    differently: concat_ws drops NULL args, so without the chr(0)
    sentinel (x, NULL, 'v') and (x, 'v', NULL) would both canonicalize
    to 'x\\x1fv' and the digest could not see the drift."""
    from skopje_spark.operators.quality import table_digest

    a = spark.createDataFrame([(1, None, "v")], "k bigint, a string, b string")
    b = spark.createDataFrame([(1, "v", None)], "k bigint, a string, b string")
    keys, cols = ["k"], ["k", "a", "b"]
    for exact in (True, False):
        da = table_digest(a, keys, cols, n_buckets=4, exact=exact).collect()
        db = table_digest(b, keys, cols, n_buckets=4, exact=exact).collect()
        assert len(da) == len(db) == 1 and da[0]["bucket"] == db[0]["bucket"]
        assert tuple(da[0]) != tuple(db[0]), f"exact={exact}"


def test_digest_compare_checks_every_state_column(spark):
    """digest_compare on the bounded tier must compare digest_sum AND
    digest_xor (and n_rows): a change pair whose row-hash xors cancel
    while the sums differ must report match=0 — comparing only the
    last column would degrade the 120-bit checksum to the 60-bit xor."""
    from decimal import Decimal

    from skopje_spark.operators.quality import digest_compare

    schema = (
        "bucket bigint, n_rows bigint, digest_sum decimal(38,0), digest_xor bigint"
    )
    a = spark.createDataFrame([(0, 2, Decimal(100), 7)], schema)
    # same xor, same count, different sum — the xor-cancelling drift
    b = spark.createDataFrame([(0, 2, Decimal(164), 7)], schema)
    assert digest_compare(a, b).collect()[0]["match"] == 0
    assert digest_compare(a, a).collect()[0]["match"] == 1
    # exact tier still works (n_rows + digest both in the struct)
    ea = spark.createDataFrame([(0, 2, "abc")], "bucket bigint, n_rows bigint, digest string")
    eb = spark.createDataFrame([(0, 2, "abd")], "bucket bigint, n_rows bigint, digest string")
    assert digest_compare(ea, eb).collect()[0]["match"] == 0
    assert digest_compare(ea, ea).collect()[0]["match"] == 1


def test_dup_span_trim_keep_first_policy(spark):
    """Exact-substring removal (operators/dedup.py:dup_span_trim):
    cross-doc duplicated 3-gram spans are excised everywhere but
    their corpus-first occurrence; intra-doc-only repeats are NOT
    trimmed (cross-doc predicate); fully-duplicated docs survive as
    empty rows; residual coverage on the trimmed corpus is zero;
    deterministic under repartitioning."""
    from skopje_spark.operators.dedup import dup_span_coverage, dup_span_trim

    rows = [
        (1, "a b c d e f"),            # corpus-first: untouched
        (2, "x y a b c d z"),          # shares 'a b c','b c d' -> loses a..d
        (3, "a b c d e f"),            # exact copy -> fully removed
        (4, "p q r"),                  # unique -> untouched
        (5, "m n o m n o m n o"),      # intra-doc repeats only -> untouched
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r for r in dup_span_trim(df, "doc_id", "text", n=3).collect()
    }
    assert got[1]["trimmed_text"] == "a b c d e f" and got[1]["kept_tokens"] == 6
    assert got[2]["trimmed_text"] == "x y z" and got[2]["kept_tokens"] == 3
    assert got[3]["trimmed_text"] == "" and got[3]["kept_tokens"] == 0
    assert got[3]["n_tokens"] == 6
    assert got[4]["trimmed_text"] == "p q r"
    assert got[5]["trimmed_text"] == "m n o m n o m n o"

    trimmed = dup_span_trim(df, "doc_id", "text", n=3).withColumnRenamed(
        "trimmed_text", "text"
    )
    residual = dup_span_coverage(
        trimmed.filter(F.col("kept_tokens") > 0), "doc_id", "text", n=3
    ).collect()
    assert all(r["covered_tokens"] == 0 for r in residual)

    again = {
        r["doc_id"]: r
        for r in dup_span_trim(
            df.repartition(7), "doc_id", "text", n=3
        ).collect()
    }
    assert {k: v["trimmed_text"] for k, v in got.items()} == {
        k: v["trimmed_text"] for k, v in again.items()
    }


def test_semantic_dedup_clustered_twins(spark):
    """Composed semantic dedup (operators/dedup.py:semantic_dedup):
    planted near-identical twins are pruned within their k-means
    cell, all distinct vectors survive, rank_col flips the survivor,
    and accounting columns carry the keeper + similarity."""
    import math

    from skopje_spark.operators.dedup import semantic_dedup

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = []
    # two well-separated clusters of distinct vectors
    for i in range(8):
        rows.append((i, unit(0.15 * i), 1.0 + i))            # cluster A
        rows.append((100 + i, unit(3.1416 + 0.15 * i), 1.0)) # cluster B
    # identical twins of vec 3 and vec 104 (higher ids)
    rows.append((900, unit(0.15 * 3), 0.5))
    rows.append((901, unit(3.1416 + 0.15 * 4), 0.5))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, quality double")

    out = {r["vec_id"]: r for r in semantic_dedup(
        df, id_col="vec_id", vec_col="embedding", threshold=0.999, k=2, iters=3
    ).collect()}
    assert len(out) == len(rows)
    assert out[900]["kept"] == 0 and out[900]["dup_of"] == 3
    assert out[901]["kept"] == 0 and out[901]["dup_of"] == 104
    assert abs(out[900]["dup_cos"] - 1.0) < 1e-9
    kept = [v for v in out.values() if v["kept"] == 1]
    assert sorted(v["vec_id"] for v in kept) == sorted(
        r[0] for r in rows if r[0] not in (900, 901)
    )
    # twins share their original's cell by construction
    assert out[900]["cell"] == out[3]["cell"]

    # rank policy: make the twin BETTER than the original -> it wins
    df2 = df.withColumn(
        "quality",
        F.when(F.col("vec_id") == 900, 99.0).otherwise(F.col("quality")),
    )
    out2 = {r["vec_id"]: r for r in semantic_dedup(
        df2, id_col="vec_id", vec_col="embedding", threshold=0.999, k=2,
        iters=3, rank_col="quality",
    ).collect()}
    assert out2[900]["kept"] == 1
    assert out2[3]["kept"] == 0 and out2[3]["dup_of"] == 900


def test_semantic_dedup_multiprobe_catches_boundary_straddlers(spark):
    """Multi-probe pairing (semantic_dedup n_probe=2): a near-dup
    pair whose members assign to DIFFERENT top-1 cells is missed at
    probe=1 (the documented SemDeDup approximation) and caught at
    probe=2 via the union of 2nd-nearest-cell memberships; single-cell
    results are otherwise unchanged. Cells are pinned with explicit
    centroids so the boundary construction is deterministic."""
    from skopje_spark.operators.dedup import semantic_dedup

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [0.72, 0.694]),   # top-1 cell 0, 2nd cell 1
        (2, [0.694, 0.72]),   # top-1 cell 1, 2nd cell 0 — twin of 1
        (3, [1.0, 0.0]),      # cell-0 anchor
        (4, [0.0, 1.0]),      # cell-1 anchor
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    out1 = {r["vec_id"]: r for r in semantic_dedup(
        df, id_col="vec_id", vec_col="embedding", threshold=0.99,
        centroids=cents,
    ).collect()}
    assert out1[1]["cell"] == 0 and out1[2]["cell"] == 1
    assert all(out1[i]["kept"] == 1 for i in (1, 2, 3, 4))  # pair missed

    out2 = {r["vec_id"]: r for r in semantic_dedup(
        df, id_col="vec_id", vec_col="embedding", threshold=0.99,
        centroids=cents, n_probe=2,
    ).collect()}
    assert out2[2]["kept"] == 0 and out2[2]["dup_of"] == 1  # pair caught
    assert out2[2]["dup_cos"] > 0.99
    assert out2[1]["kept"] == 1 and out2[3]["kept"] == 1 and out2[4]["kept"] == 1
    # stored cell column keeps top-1 semantics under multi-probe
    assert out2[1]["cell"] == 0 and out2[2]["cell"] == 1


def test_bloom_tree_reduce_bit_identical_and_bounded_driver_rows(spark):
    """Two-level bitmap OR (operators/bloom.py:build_bloom
    tree_groups): bit-identical to the legacy single-level driver OR
    at every fan-in, while the frame reaching collect() carries at
    most tree_groups rows instead of one per partition."""
    import numpy as np

    from skopje_spark.operators.bloom import _bloom_partials, build_bloom

    seen = spark.createDataFrame(
        [(f"key{i}",) for i in range(2000)], "key string"
    ).repartition(64)
    nb, k = 1 << 14, 5
    legacy = build_bloom(seen, "key", num_bits=nb, k=k, tree_groups=None)
    for groups in (1, 4, 32):
        tree = build_bloom(seen, "key", num_bits=nb, k=k, tree_groups=groups)
        assert np.array_equal(tree, legacy), f"groups={groups}"
        n_rows = _bloom_partials(
            seen, "key", num_bits=nb, k=k, tree_groups=groups
        ).count()
        assert n_rows <= groups
    # legacy path really is per-partition (the thing the tree removes)
    assert (
        _bloom_partials(seen, "key", num_bits=nb, k=k, tree_groups=None).count()
        > 32
    )


def test_ann_probe_report_recall_monotone_cost_increasing(spark, tmp_path):
    """IVF tuning report (operators/similarity.py:ann_probe_report):
    on clustered data, recall@k is monotonically non-decreasing in
    n_probe and reaches 1.0 at full probe; scan cost strictly grows;
    costs are the true per-cell file/row counts."""
    import math
    import random

    from skopje_spark.operators.similarity import ann_probe_report, ivf_index_write

    rng = random.Random(7)
    rows = []
    # 4 well-separated clusters in 8-d
    for c in range(4):
        center = [0.0] * 8
        center[c * 2] = 10.0
        for i in range(60):
            rows.append(
                (
                    c * 1000 + i,
                    [x + rng.uniform(-0.5, 0.5) for x in center],
                )
            )
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    path = str(tmp_path / "ivfrep")
    ivf_index_write(e, path, k=4, iters=3)

    queries = spark.createDataFrame(
        [rows[5], rows[65], rows[130]], "vec_id bigint, embedding array<double>"
    )
    rep = {
        r["n_probe"]: r
        for r in ann_probe_report(
            spark, path, queries, nprobes=(1, 2, 4), k=10
        ).collect()
    }
    recalls = [rep[p]["mean_recall_at_k"] for p in (1, 2, 4)]
    assert recalls == sorted(recalls), "recall must be monotone in n_probe"
    assert math.isclose(rep[4]["mean_recall_at_k"], 1.0)
    assert rep[1]["mean_recall_at_k"] > 0.5  # clustered: 1 probe finds most
    rows_scanned = [rep[p]["mean_rows_scanned"] for p in (1, 2, 4)]
    assert rows_scanned == sorted(rows_scanned) and rows_scanned[0] < rows_scanned[-1]
    files = [rep[p]["mean_files_read"] for p in (1, 2, 4)]
    assert files == sorted(files) and files[0] > 0
    assert math.isclose(rep[4]["frac_rows_scanned"], 1.0)


def test_contamination_report_flags_leaked_docs(spark):
    """Decontamination screen (operators/dedup.py:contamination_report):
    a train doc embedding a benchmark 3-gram is flagged with the right
    shared-gram count and fraction; clean and short docs report 0."""
    from skopje_spark.operators.dedup import contamination_report

    bench = spark.createDataFrame(
        [(100, "the capital of france is paris")], "doc_id bigint, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "we know the capital of france is paris obviously"),  # leaked
            (2, "completely unrelated text about spark engines here"),
            (3, "to be"),  # < n tokens -> no grams
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r
        for r in contamination_report(
            train, bench, n=3, min_shared=2
        ).collect()
    }
    # doc 1: tokens 3..8 match bench exactly -> shared 3-grams =
    # all 4 windows of "the capital of france is paris"
    assert got[1]["n_shared"] == 4 and got[1]["flagged"] == 1
    assert got[1]["n_grams"] == 7  # 9 tokens -> 7 distinct 3-grams
    assert abs(got[1]["contamination"] - round(4 / 7, 6)) < 1e-9
    assert got[2]["n_shared"] == 0 and got[2]["flagged"] == 0
    assert got[3]["n_grams"] == 0 and got[3]["contamination"] == 0.0


def test_bm25_golden_ranking(spark):
    """BM25 (operators/text.py:bm25_scores): rare-term matches outrank
    common-term matches; tf saturates; scores match a hand-computed
    golden value."""
    import math

    from skopje_spark.operators.text import bm25_scores

    docs = [
        (1, "apple banana cherry"),
        (2, "apple apple apple banana"),
        (3, "banana banana banana banana"),
        (4, "durian elderberry fig"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_scores(
        df, ["apple"], k1=1.2, b=0.75, top_k=10
    ).collect()}
    assert set(got) == {1, 2}  # only docs containing 'apple'
    assert got[2] > got[1]  # higher tf wins (same-ish length)
    # golden: doc 1 -> tf=1, dl=3, avgdl=3.5, N=4, df=2
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    expect = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 3 / 3.5))
    assert abs(got[1] - round(expect, 6)) < 1e-6
    # multi-term query unions postings
    got2 = {r["doc_id"]: r["score"] for r in bm25_scores(
        df, ["apple", "fig"], top_k=10
    ).collect()}
    assert set(got2) == {1, 2, 4}
    assert got2[4] > got2[2]  # rare term (df=1) outscores saturated tf


def test_leakage_safe_split_families_never_straddle(spark):
    """leakage_safe_split (operators/sampling.py): a near-dup family
    always lands in ONE split; singletons degrade exactly to
    split_assign on their own id."""
    from skopje_spark.operators.sampling import leakage_safe_split, split_assign

    fam = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, fam),
        (2, fam + " extra"),           # near-dup of 1
        (3, fam.replace("dog", "cat")),  # near-dup of 1
        (10, "completely different text about spark engines here today"),
        (11, "another unrelated document concerning parquet file layouts"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    splits = {"train": 0.5, "test": 0.5}
    out = {r["doc_id"]: r for r in leakage_safe_split(
        df, splits, threshold=0.5
    ).collect()}
    fam_splits = {out[i]["split"] for i in (1, 2, 3)}
    assert len(fam_splits) == 1, "family must not straddle splits"
    assert all(out[i]["cluster_id"] == 1 for i in (1, 2, 3))
    plain = {r["doc_id"]: r["split"] for r in split_assign(
        df, "doc_id", splits
    ).collect()}
    for i in (10, 11):  # singletons: cluster_id = own id -> same as plain
        assert out[i]["cluster_id"] == i
        assert out[i]["split"] == plain[i]


def test_dup_span_trim_scope_all_collapses_intra_doc_repeats(spark):
    """scope='all' extends the duplication predicate to intra-document
    repeats (the full exact-substring-dedup treatment): the second
    occurrence of a repeated run inside ONE doc is excised, while
    scope='cross' leaves it (cross-doc predicate only)."""
    from skopje_spark.operators.dedup import dup_span_trim

    rows = [(5, "m n o x y m n o z w")]  # 'm n o' repeats within doc 5
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    cross = dup_span_trim(df, "doc_id", "text", n=3, scope="cross").collect()[0]
    assert cross["trimmed_text"] == "m n o x y m n o z w"
    allsc = dup_span_trim(df, "doc_id", "text", n=3, scope="all").collect()[0]
    assert allsc["trimmed_text"] == "m n o x y z w"
    assert allsc["kept_tokens"] == 7

    import pytest as _pytest

    with _pytest.raises(ValueError, match="scope"):
        dup_span_trim(df, "doc_id", "text", n=3, scope="bogus")


def test_ivf_stream_sink_ledger_exactly_once(spark, sf_dir, tmp_path):
    """Streaming IVF ingestion (similarity.ivf_apply_stream_batch /
    ivf_index_stream_sink): batches append through a per-incarnation
    ledger; a replayed batch id is skipped whole (no double-counted
    vectors), a new batch id lands, and the streamed vectors become
    searchable via the persisted index."""
    from skopje_spark.operators.similarity import (
        ivf_apply_stream_batch,
        ivf_index_topk,
        ivf_index_write,
    )
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    base = e.filter("vec_id % 2 = 0")
    path = str(tmp_path / "ivfidx")
    ivf_index_write(base, path, k=4, iters=2)
    n0 = spark.read.parquet(f"{path}/vectors").count()

    batch1 = e.filter("vec_id % 2 = 1").limit(20)
    summaries = []
    assert ivf_apply_stream_batch(
        path, batch1, 0, "streamA", on_batch=summaries.append
    )
    n1 = spark.read.parquet(f"{path}/vectors").count()
    assert n1 == n0 + 20 and summaries[0]["n_appended"] == 20

    # replay of batch 0: skipped whole, vector count unchanged
    assert not ivf_apply_stream_batch(
        path, batch1, 0, "streamA", on_batch=summaries.append
    )
    assert spark.read.parquet(f"{path}/vectors").count() == n1
    assert len(summaries) == 1

    # a different incarnation's batch 0 is a DIFFERENT ledger key
    batch2 = e.filter("vec_id % 2 = 1").orderBy("vec_id").limit(5)
    assert ivf_apply_stream_batch(path, batch2, 0, "streamB")
    assert spark.read.parquet(f"{path}/vectors").count() == n1 + 5

    # a streamed vector is findable: querying with an appended vector
    # must return itself as the top hit (cos = 1)
    q = e.filter("vec_id % 2 = 1").orderBy("vec_id").limit(1)
    qid = q.collect()[0]["vec_id"]
    top = ivf_index_topk(spark, path, q, n_probe=2, k=3).collect()
    assert top[0]["vec_id"] == qid


def test_ivf_torn_append_replay_does_not_skew_topk(spark, sf_dir, tmp_path):
    """Torn window (crash AFTER ivf_index_append, BEFORE the ledger
    write): the replay re-appends the same vectors. The read path's
    id-dedup must keep top-k free of duplicate ids and identical to
    the pre-duplication result."""
    from skopje_spark.operators.similarity import (
        ivf_apply_stream_batch,
        ivf_index_append,
        ivf_index_topk,
        ivf_index_write,
    )
    from skopje_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfidx")
    ivf_index_write(e.filter("vec_id % 2 = 0"), path, k=4, iters=2)
    batch = e.filter("vec_id % 2 = 1").limit(10)
    assert ivf_apply_stream_batch(path, batch, 0, "streamT")
    q = batch.orderBy("vec_id").limit(1)
    before = [r["vec_id"] for r in
              ivf_index_topk(spark, path, q, n_probe=2, k=5).collect()]

    # simulate the crashed attempt's duplicate data append (ledger and
    # first append already landed; the retry re-appends the batch)
    ivf_index_append(batch, path)

    after = [r["vec_id"] for r in
             ivf_index_topk(spark, path, q, n_probe=2, k=5).collect()]
    assert len(set(after)) == len(after), f"duplicate ids in top-k: {after}"
    assert set(after) == set(before)


def test_ivf_stream_sink_end_to_end(spark, tmp_path):
    """The writeStream wiring itself: vectors streamed from json files
    land in the index exactly once under availableNow."""
    import json
    import os as _os
    import time as _time

    from skopje_spark.operators.similarity import (
        ivf_index_stream_sink,
        ivf_index_write,
    )
    from skopje_spark.streaming.streams import file_stream

    dim = 4
    base = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.0, float(i % 2)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "idx")
    ivf_index_write(base, path, k=2, iters=2)
    n0 = spark.read.parquet(f"{path}/vectors").count()

    src = tmp_path / "src"
    src.mkdir()
    now = _time.time()
    for b in range(2):
        f = src / f"b{b}.json"
        rows = [
            {"vec_id": 100 + b * 10 + i, "embedding": [0.1 * i, 1.0, 0.5, 0.2]}
            for i in range(10)
        ]
        f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        _os.utime(f, (now - (2 - b) * 10, now - (2 - b) * 10))

    stream = file_stream(
        spark, str(src), schema="vec_id long, embedding array<double>",
        max_files_per_trigger=1,
    )
    q = ivf_index_stream_sink(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert spark.read.parquet(f"{path}/vectors").count() == n0 + 20
    ledger = spark.read.parquet(f"{path}/_batch_ledger")
    assert ledger.count() == 2

    # restart on the SAME checkpoint: offsets already committed, no
    # re-append, count stable
    stream2 = file_stream(
        spark, str(src), schema="vec_id long, embedding array<double>",
        max_files_per_trigger=1,
    )
    q2 = ivf_index_stream_sink(stream2, path, str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert spark.read.parquet(f"{path}/vectors").count() == n0 + 20


def test_ann_probe_report_is_batched_not_per_query(spark, tmp_path):
    """The tuning sweep is corpus-shaped, not query-shaped: all M
    queries ride ONE exact pass plus one masked pass per n_probe
    (cosine_topk_batch), so the Spark job count is independent of M —
    the naive per-(query, probe) loop would launch 4x per query here.
    Values keep the recall/cost contract of the sibling test."""
    import math
    import random

    from skopje_spark.operators.similarity import (
        ann_probe_report,
        ivf_index_write,
    )

    rng = random.Random(11)
    rows = []
    for c in range(4):
        center = [0.0] * 8
        center[c * 2] = 10.0
        for i in range(40):
            rows.append(
                (c * 1000 + i, [x + rng.uniform(-0.5, 0.5) for x in center])
            )
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    path = str(tmp_path / "ivfbatch")
    ivf_index_write(e, path, k=4, iters=3)
    sc = spark.sparkContext

    def run(m: int, tag: str):
        queries = spark.createDataFrame(
            [rows[i * 13] for i in range(m)],
            "vec_id bigint, embedding array<double>",
        )
        sc.setJobGroup(tag, "ann_probe_report job count")
        try:
            rep = {
                r["n_probe"]: r
                for r in ann_probe_report(
                    spark, path, queries, nprobes=(1, 2, 4), k=5
                ).collect()
            }
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return rep, len(sc.statusTracker().getJobIdsForGroup(tag))

    _, jobs_small = run(3, "probe-batch-3")
    rep, jobs_big = run(12, "probe-batch-12")
    # the job count must NOT scale with the query count: the naive
    # per-(query, probe) loop adds >= (1 + |sweep|) jobs per extra
    # query (here: +36 going from 3 to 12 queries); the batched sweep
    # adds none — allow small AQE jitter only.
    assert jobs_big <= jobs_small + 4, (
        f"{jobs_small} jobs @3 queries vs {jobs_big} @12 — "
        "sweep is scaling with queries"
    )
    assert math.isclose(rep[4]["mean_recall_at_k"], 1.0)
    recalls = [rep[p]["mean_recall_at_k"] for p in (1, 2, 4)]
    assert recalls == sorted(recalls) and recalls[0] > 0.5


def test_unicode_clean_and_mojibake(spark):
    """NFC collapses combining sequences, NFKC folds compatibility
    forms, controls strip (structure survives); mojibake repair fixes
    the UTF-8-as-cp1252 wreck and NEVER touches text that merely
    looks Latin."""
    from pyspark.sql import functions as F

    from skopje_spark.operators.text import fix_mojibake, unicode_clean

    rows = [
        (0, "Café x\x07y\x00z\nok\tt"),   # combining + controls
        (1, "ﬁne ①"),                   # ﬁ ligature, ① (NFKC)
        (2, None),
        (3, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    nfc = {
        r["i"]: r["c"]
        for r in df.select(
            "i", unicode_clean(F.col("t")).alias("c")
        ).collect()
    }
    assert nfc[0] == "Café xyz\nok\tt"  # é precomposed, \x07 \x00 gone
    assert nfc[1] == "ﬁne ①"  # NFC keeps compatibility chars
    assert nfc[2] is None and nfc[3] == "plain ascii"
    nfkc = {
        r["i"]: r["c"]
        for r in df.select(
            "i", unicode_clean(F.col("t"), form="NFKC").alias("c")
        ).collect()
    }
    assert nfkc[1] == "fine 1"  # ligature + circled digit folded
    import pytest as _pytest

    with _pytest.raises(ValueError, match="normalization form"):
        unicode_clean(F.col("t"), form="NFX")

    moji = [
        (0, "Ã©tÃ©"),          # UTF-8 'été' read as cp1252
        (1, "café"),            # legitimate Latin-1 text: untouched
        (2, "naÃ¯ve â\x80\x94 ok"),  # incl. em dash wreck
        (3, None),
    ]
    mdf = spark.createDataFrame(moji, "i long, t string")
    got = {
        r["i"]: r["m"]
        for r in mdf.select("i", fix_mojibake(F.col("t")).alias("m")).collect()
    }
    assert got[0] == "été"
    assert got[1] == "café"
    assert got[2] == "naïve — ok"
    assert got[3] is None
