"""Byte-level BPE tokenizer (operators/tokenizer.py): round-trip
identity, merge determinism, naive-vs-incremental training
equivalence, partitioning invariance, and the chunking/budget wiring.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from skopje_spark.operators.tokenizer import (
    PRETOKEN_PATTERN,
    BpeModel,
    bpe_decode,
    bpe_encode,
    bpe_train,
    bpe_train_from_counts,
    bpe_word_counts,
    chunk_by_bpe_tokens,
    token_count_bpe,
)

CORPUS = [
    (1, "the cat sat on the mat and the cat ate"),
    (2, "the dog sat on the log and the dog dug"),
    (3, "cats and dogs, dogs and cats -- the usual!"),
    (4, ""),
    (5, "   leading and   multiple   spaces   "),
    (6, "Ünïcødé: 北京 emoji 🎉 mixed with ascii the the the"),
    (7, "numbers 12345 67890 and punct !!! ??? ..."),
]


def _counts(texts) -> dict:
    import re

    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        c.update(re.findall(PRETOKEN_PATTERN, t))
    return {tuple(w.encode("utf-8")): n for w, n in c.items()}


def _naive_train(words: dict, num_merges: int, min_pair_count: int = 2) -> list:
    """Reference implementation: full pair recount every step — the
    incremental index in bpe_train_from_counts must match this."""
    from collections import Counter

    words = dict(words)
    merges = []
    for step in range(num_merges):
        pc: Counter = Counter()
        for syms, cnt in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] += cnt
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < min_pair_count:
            break
        new_id = 256 + step
        merges.append(best)
        nxt = {}
        for syms, cnt in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + cnt
        words = nxt
    return merges


def test_pretokenizer_tiles_losslessly():
    import re

    for _, t in CORPUS:
        assert "".join(re.findall(PRETOKEN_PATTERN, t)) == t


def test_incremental_training_matches_naive_reference():
    words = _counts([t for _, t in CORPUS])
    for n in (8, 32, 200):
        inc = bpe_train_from_counts(dict(words), num_merges=n).merges
        assert inc == _naive_train(words, n)


def test_encode_decode_roundtrip_and_shrinkage():
    model = bpe_train_from_counts(_counts([t for _, t in CORPUS]), num_merges=64)
    for _, t in CORPUS:
        ids = model.encode(t)
        assert model.decode(ids) == t
        assert len(ids) <= len(t.encode("utf-8"))
    # merges actually compress: the corpus re-encodes below byte length
    total_ids = sum(len(model.encode(t)) for _, t in CORPUS if t)
    total_bytes = sum(len(t.encode("utf-8")) for _, t in CORPUS if t)
    assert total_ids < total_bytes


def test_model_persistence_roundtrip():
    model = bpe_train_from_counts(_counts([t for _, t in CORPUS]), num_merges=32)
    back = BpeModel.from_rows(model.to_rows())
    assert back.merges == model.merges and back.vocab == model.vocab


def test_training_invariant_under_partitioning(spark):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    m1 = bpe_train(df.repartition(1), "text", num_merges=48)
    m7 = bpe_train(df.repartition(7), "text", num_merges=48)
    assert m1.merges == m7.merges
    # and the distributed word counts agree with the local regex
    got = {
        r["word"]: r["cnt"]
        for r in bpe_word_counts(df, "text").collect()
    }
    want_b = _counts([t for _, t in CORPUS])
    want = {bytes(k).decode("utf-8"): v for k, v in want_b.items()}
    assert got == want


def test_spark_encode_count_decode(spark):
    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    model = bpe_train(df, "text", num_merges=64)
    enc = bpe_encode(df, "text", model, out_col="ids")
    dec = bpe_decode(enc, "ids", model, out_col="rt")
    rows = token_count_bpe(dec, "text", model, out_col="n_tok").collect()
    for r in rows:
        assert r["rt"] == r["text"]
        assert r["n_tok"] == len(r["ids"])
        assert r["n_tok"] == len(model.encode(r["text"]))


def test_chunk_by_bpe_tokens_coverage_and_reassembly(spark):
    df = spark.createDataFrame(
        [r for r in CORPUS if r[1]], "doc_id bigint, text string"
    )
    model = bpe_train(df, "text", num_merges=64)

    # overlap=0: chunk BYTES concatenate back to the exact document
    # (chunk_text is the errors='replace' view — a token slice can
    # end mid-codepoint, so bytes are the lossless column)
    flat = chunk_by_bpe_tokens(
        df, model, tokens_per_chunk=4, overlap=0
    ).collect()
    by_doc: dict[int, list] = {}
    for r in flat:
        by_doc.setdefault(r["doc_id"], []).append(r)
    originals = {r[0]: r[1] for r in CORPUS}
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        joined = b"".join(bytes(c["chunk_bytes"]) for c in chunks)
        assert joined == originals[doc_id].encode("utf-8")
        assert all(c["n_chunk_tokens"] <= 4 for c in chunks)
        assert all(c["chunk_text"] is not None for c in chunks)

    # overlap=2: every chunk except possibly the last is full; token
    # coverage: n_chunks == ceil((n - overlap) / step) for n > overlap
    over = chunk_by_bpe_tokens(
        df, model, tokens_per_chunk=6, overlap=2
    ).collect()
    n_by_doc: dict[int, int] = {}
    for r in over:
        n_by_doc[r["doc_id"]] = n_by_doc.get(r["doc_id"], 0) + 1
    for doc_id, text in originals.items():
        n = len(model.encode(text))
        if n == 0:
            assert doc_id not in n_by_doc
            continue
        step = 6 - 2
        want = max(1, -(-(n - 2) // step))
        assert n_by_doc[doc_id] == want

    with pytest.raises(ValueError):
        chunk_by_bpe_tokens(df, model, tokens_per_chunk=4, overlap=4)


def test_budget_sample_with_bpe_counts(spark):
    """The wiring the verdict asked for: token_count_bpe produces the
    weight column budget_sample consumes — selection is deterministic
    and respects the subword budget exactly."""
    from skopje_spark.operators.sampling import budget_sample

    df = spark.createDataFrame(
        [(i, "src", ("word%d " % (i % 5)) * (i % 7 + 1)) for i in range(40)],
        "doc_id bigint, source string, text string",
    )
    model = bpe_train(df, "text", num_merges=32)
    d = token_count_bpe(df, "text", model, out_col="n_bpe_tokens")
    budget = 60
    picked = budget_sample(
        d, "source", "n_bpe_tokens", "doc_id", {"src": budget}
    )
    rows = picked.collect()
    assert rows, "budget should admit at least one row"
    total = sum(r["n_bpe_tokens"] for r in rows)
    assert total <= budget
    # deterministic: same inputs -> same selection
    again = budget_sample(
        d, "source", "n_bpe_tokens", "doc_id", {"src": budget}
    ).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again
    )


def test_bpe_model_parquet_roundtrip(spark, tmp_path):
    """Persisted merge table round-trips exactly: same merges, same
    vocab, same encodings — the deployment artifact contract."""
    from skopje_spark.operators.tokenizer import bpe_model_read, bpe_model_write

    df = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    model = bpe_train(df, "text", num_merges=48)
    path = str(tmp_path / "bpe_model")
    bpe_model_write(spark, model, path)
    back = bpe_model_read(spark, path)
    assert back.merges == model.merges and back.vocab == model.vocab
    for _, t in CORPUS:
        assert back.encode(t) == model.encode(t)


def test_bpe_property_roundtrip_arbitrary_unicode():
    """Hypothesis: the pre-tokenizer tiles ANY string losslessly and
    encode∘decode is the identity for ANY unicode text under ANY
    trained model — the byte-level no-unknown-tokens contract."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    model = bpe_train_from_counts(_counts([t for _, t in CORPUS]), num_merges=64)
    pat = re.compile(PRETOKEN_PATTERN)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=200))
    def check(t):
        assert "".join(pat.findall(t)) == t
        ids = model.encode(t)
        assert model.decode(ids) == t
        assert len(ids) <= len(t.encode("utf-8"))

    check()


def test_bpe_property_word_additivity():
    """Hypothesis: encoding a concatenation of pre-token-aligned parts
    equals concatenating the encodings — the law that makes the
    distinct-word corpus accounting path (q_text_bpe_tokens's second
    path) exact."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    model = bpe_train_from_counts(_counts([t for _, t in CORPUS]), num_merges=64)
    pat = re.compile(PRETOKEN_PATTERN)

    @settings(max_examples=100, deadline=None)
    @given(st.text(max_size=120))
    def check(t):
        words = pat.findall(t)
        whole = model.encode(t)
        parts = [i for w in words for i in model.encode_word(w)]
        assert whole == parts

    check()


def test_pack_sequences_with_bpe_counts(spark):
    """BPE counts drive sequence packing: pack_concat_chunk consumes
    token_count_bpe's column, and the span accounting conserves every
    subword token exactly (sum of per-sequence contributions == total
    BPE tokens)."""
    from skopje_spark.operators.packing import pack_concat_chunk

    df = spark.createDataFrame(
        [(i, ("alpha beta gamma " * (i % 5 + 1)).strip()) for i in range(30)],
        "doc_id bigint, text string",
    )
    model = bpe_train(df, "text", num_merges=32)
    d = token_count_bpe(df, "text", model, out_col="n_bpe_tokens")
    ctx = 16
    packed = pack_concat_chunk(d, id_col="doc_id", tokens_col="n_bpe_tokens", ctx_len=ctx)
    rows = packed.collect()
    total = sum(r["n_bpe_tokens"] for r in d.collect())
    assert sum(r["seq_tokens"] for r in rows) == total
    assert all(r["seq_tokens"] <= ctx for r in rows)


def test_bpe_compression_ratio_separates_junk(spark):
    from skopje_spark.operators.tokenizer import bpe_compression_ratio

    nat = [(i, "the cat sat on the mat and the cat ate the mat") for i in range(8)]
    gib = [(100 + i, f"a1f{i}b9c04d{i}e7f2{i}8cbb1{i}d0e9a3f4") for i in range(8)]
    d = spark.createDataFrame(nat, "doc_id int, text string")
    model = bpe_train(d, "text", num_merges=64, max_words=1024)
    both = spark.createDataFrame(nat + gib, "doc_id int, text string")
    out = bpe_compression_ratio(both, "text", model, out_col="r").collect()
    nat_r = [r["r"] for r in out if r["doc_id"] < 100]
    gib_r = [r["r"] for r in out if r["doc_id"] >= 100]
    assert max(nat_r) < min(gib_r)  # trained-corpus text compresses harder
    assert all(r > 0 for r in nat_r + gib_r)


def test_bpe_compression_ratio_empty_text_is_zero(spark):
    from skopje_spark.operators.tokenizer import bpe_compression_ratio

    d = spark.createDataFrame([(1, "the cat"), (2, "")], "doc_id int, text string")
    model = bpe_train(d, "text", num_merges=8, max_words=64)
    rows = {r["doc_id"]: r["r"] for r in
            bpe_compression_ratio(d, "text", model, out_col="r").collect()}
    assert rows[2] == 0.0 and rows[1] > 0


def test_bpe_train_from_counts_does_not_mutate_input():
    words = {tuple(b"the"): 10, tuple(b"then"): 5, tuple(b"he"): 7}
    snapshot = dict(words)
    m1 = bpe_train_from_counts(words, num_merges=8)
    assert words == snapshot  # caller's dict untouched
    m2 = bpe_train_from_counts(words, num_merges=8)
    assert m1.merges == m2.merges  # retraining reproduces, not drifts


def test_bpe_drift_monitor_flags_distribution_shift(spark, tmp_path):
    """Frozen-model ingest drift (tokenizer.bpe_ingest_check, the IVF
    staleness pattern): an in-distribution batch scores drift ~ 0; a
    drifted batch (hex junk into a prose tokenizer) shows positive
    compression drift AND merged-fraction drop; the stats sidecar
    accumulates one row per ingest."""
    from skopje_spark.operators.tokenizer import (
        bpe_baseline_write,
        bpe_ingest_check,
        bpe_model_read,
        bpe_model_write,
    )

    nat = [(i, "the cat sat on the mat and the cat ate the mat") for i in range(8)]
    d = spark.createDataFrame(nat, "doc_id int, text string")
    model = bpe_train(d, "text", num_merges=64, max_words=1024)
    path = str(tmp_path / "bpe")
    bpe_model_write(spark, model, path)
    base = bpe_baseline_write(spark, d, "text", model, path)
    assert 0 < base["tokens_per_byte"] < 1 and base["merged_frac"] > 0.5

    # model round-trips with the sidecar in place (underscore-hidden)
    assert bpe_model_read(spark, path).merges == model.merges

    indist = spark.createDataFrame(
        [(50 + i, "the mat sat on the cat and the mat ate the cat")
         for i in range(4)],
        "doc_id int, text string",
    )
    ok = bpe_ingest_check(spark, indist, "text", path)
    assert abs(ok["compression_drift"]) < 0.1
    assert abs(ok["merged_frac_drop"]) < 0.2

    junk = spark.createDataFrame(
        [(100 + i, f"a1f{i}b9c04d{i}e7f2{i}8cbb1{i}d0e9a3f4") for i in range(4)],
        "doc_id int, text string",
    )
    bad = bpe_ingest_check(spark, junk, "text", path)
    assert bad["compression_drift"] > 0.3
    assert bad["merged_frac_drop"] > 0.3
    assert bad["compression_drift"] > ok["compression_drift"]

    hist = spark.read.parquet(f"{path}/_drift_stats")
    assert hist.filter(F.col("phase") == "ingest").count() == 2
    assert hist.filter(F.col("phase") == "build").count() == 1
