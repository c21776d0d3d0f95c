"""Property-based tests (SURVEY §5 item 3) for the parity-critical
primitives.

`dround` is the lynchpin: every float-valued oracle comparison rests
on Spark and DuckDB computing bit-identical rounded doubles. The
property tests drive all three implementations (Spark Column, DuckDB
SQL, pure-Python reference) over generated inputs in one batch per
example set, not one job per value."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from skopje_spark.operators.keymap import keymap_assign
from skopje_spark.queries.rounding import dround, dround_sql

FLOATS = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


def _py_dround(x: float, n: int) -> float:
    s = float(10 ** n)
    return -(math.floor(-x * s + 0.5) / s) if x < 0 else math.floor(x * s + 0.5) / s


@settings(max_examples=10, deadline=None)
@given(st.lists(FLOATS, min_size=1, max_size=50), st.integers(0, 6))
def test_dround_spark_duckdb_python_agree(spark_global, values, n):
    spark = spark_global
    sdf = spark.createDataFrame([(v,) for v in values], "x double")
    got_spark = [
        r["y"] for r in sdf.select(dround("x", n).alias("y")).collect()
    ]
    con = duckdb.connect()
    sql = f"SELECT {dround_sql('?::DOUBLE', n)}"
    nparams = sql.count("?")  # dround_sql repeats the expression
    got_duck = [con.execute(sql, [v] * nparams).fetchone()[0] for v in values]
    expect = [_py_dround(v, n) for v in values]
    assert got_spark == expect
    assert got_duck == expect


@settings(max_examples=8, deadline=None)
@given(
    st.sets(st.integers(0, 30), max_size=8),
    st.sets(st.text(st.characters(categories=("Ll",)), min_size=1, max_size=5), max_size=6),
)
def test_keymap_gapfill_matches_sequential_reference(spark_global, keys, values):
    """Distributed gap-fill == the reference's sequential scan-from-0
    (keymap.rs:129-147) for arbitrary key sets and incoming values."""
    spark = spark_global
    existing = sorted(keys)
    dim_rows = [(k, f"v{k}") for k in existing]
    dim = spark.createDataFrame(dim_rows or [(0, "v0")], "key bigint, value string")
    if not dim_rows:
        dim = dim.limit(0)
    new_vals = sorted(v for v in values if v not in {f"v{k}" for k in existing})
    incoming = spark.createDataFrame(
        [(v,) for v in new_vals] or [("x",)], "value string"
    )
    if not new_vals:
        incoming = incoming.limit(0)

    out = {r["value"]: r["key"] for r in
           keymap_assign(dim, incoming, policy="gapfill").collect()}

    # sequential reference: assign smallest free key, in value order
    used = set(existing)
    expect = {f"v{k}": k for k in existing}
    for v in new_vals:
        k = 0
        while k in used:
            k += 1
        used.add(k)
        expect[v] = k
    assert out == expect


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12).map(" ".join),
        min_size=2, max_size=6,
    )
)
def test_jaccard_bounds_and_hash_space_equivalence(spark_global, texts):
    """Pair scores stay in (0, 1]; hashed-shingle jaccard equals
    string-shingle jaccard computed in python (collision-free at this
    scale)."""
    from skopje_spark.operators.dedup import jaccard_pairs

    spark = spark_global
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }

    def sset(t):
        toks = t.split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    for (a, b), j in got.items():
        sa, sb = sset(texts[a]), sset(texts[b])
        expect = len(sa & sb) / len(sa | sb)
        assert j == pytest.approx(_py_dround(expect, 6))
        assert 0.0 < j <= 1.0


@pytest.fixture(scope="module")
def spark_global(spark):
    """Module-scoped alias so hypothesis examples reuse one session."""
    return spark


URL_CHARS = st.text(
    alphabet="abcXYZ0189-._~/?#&=%",
    min_size=0,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(URL_CHARS, min_size=1, max_size=20))
def test_canonical_url_idempotent_and_cross_engine(spark_global, tails):
    """canonical_url over adversarial query/fragment tails: always
    idempotent, always identical between the Spark expression chain
    and the generated DuckDB twin (one rule table, two engines)."""
    from pyspark.sql import functions as F

    from skopje_spark.operators.webtext import canonical_url, canonical_url_sql

    spark = spark_global
    urls = [f"HTTPS://Ex.COM:443/p/{t}" for t in tails]
    sdf = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["i", "u"])
    once = {
        r["i"]: r["c"]
        for r in sdf.select("i", canonical_url(F.col("u")).alias("c")).collect()
    }
    twice = {
        r["i"]: r["c"]
        for r in sdf.select(
            "i", canonical_url(canonical_url(F.col("u"))).alias("c")
        ).collect()
    }
    assert once == twice
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, '{u.replace(chr(39), chr(39) * 2)}')"
            for i, u in enumerate(urls)
        )
        + ") v(i, u)"
    )
    duck = dict(
        con.execute(f"SELECT i, {canonical_url_sql('u')} FROM u").fetchall()
    )
    assert once == duck


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Lu", "Nd", "Zs"),
                whitelist_characters="<>&;#/\"'!.-",
            ),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_html_to_text_never_leaves_markup(spark_global, bodies):
    """html_to_text over generated bodies wrapped in nested markup:
    the output never contains a tag, a script/style payload, or an
    UNDECODED entity from the table — whatever the body contents."""
    from pyspark.sql import functions as F

    from skopje_spark.operators.webtext import HTML_ENTITIES, html_to_text

    spark = spark_global
    pages = [
        f"<div a=1><!-- c --><script>var x;</script><p>{b}</p>"
        f"<style>.z{{}}</style></div>"
        for b in bodies
    ]
    sdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], ["i", "h"]
    )
    out = [
        r["t"] for r in sdf.select(html_to_text(F.col("h")).alias("t")).collect()
    ]
    for t in out:
        assert "<script" not in t.lower() and "<style" not in t.lower()
        assert "var x;" not in t and ".z{}" not in t
        # no remaining complete tags (angle brackets may legitimately
        # survive via decoded entities or raw body text)
        import re

        assert not re.search(r"<[a-zA-Z/][^>]*>", t), t


# ---------------------------------------------------------------------------
# manifest segment chunking (sinks/versioned.py:_write_segments)
# ---------------------------------------------------------------------------


@given(
    st.sets(
        st.text(alphabet="0123456789abcdef", min_size=8, max_size=12),
        min_size=1,
        max_size=120,
    ),
    st.randoms(),
)
@settings(max_examples=40, deadline=None)
def test_segment_chunking_roundtrip_and_edit_locality(names, rnd):
    """Content-defined manifest chunking: (a) concatenating the
    written segments reproduces exactly the sorted entry list —
    nothing lost, duplicated, or reordered; (b) removing or inserting
    ONE entry changes at most two segment files on each side of the
    diff (the FastCDC locality argument the segment-diff commit
    economics rest on)."""
    import json as _json
    import os as _os
    import tempfile

    import skopje_spark.sinks.versioned as V

    def entry(name):
        return {
            "path": f"data/{name}.parquet",
            "bytes": 1,
            "rows": 1,
            "stats": {},
        }

    entries = [entry(n) for n in sorted(names)]
    with tempfile.TemporaryDirectory() as tmp:
        old_target = V._SEG_TARGET
        V._SEG_TARGET = 4
        try:
            refs = V._write_segments(tmp, list(entries))
            flat = []
            for r in refs:
                with open(_os.path.join(tmp, r["path"])) as f:
                    flat.extend(_json.load(f))
            assert flat == sorted(entries, key=lambda e: e["path"])
            assert sum(r["n"] for r in refs) == len(entries)

            # edit locality: drop one random entry
            if len(entries) > 1:
                victim = rnd.randrange(len(entries))
                smaller = entries[:victim] + entries[victim + 1:]
                refs2 = V._write_segments(tmp, list(smaller))
                a = {r["path"] for r in refs}
                b = {r["path"] for r in refs2}
                assert len(a - b) <= 2 and len(b - a) <= 2
            # and insert a fresh one
            extra = entry("zz" + "f" * 10)
            bigger = entries + [extra]
            refs3 = V._write_segments(tmp, list(bigger))
            a = {r["path"] for r in refs}
            c = {r["path"] for r in refs3}
            assert len(a - c) <= 2 and len(c - a) <= 2
        finally:
            V._SEG_TARGET = old_target
