"""Trainable byte-level BPE tokenizer — the subword counter every
token-denominated operator needs.

The engine's other text operators count regex word pieces
(operators/text.py:token_count), which drifts 1.3-1.5x from any real
LM tokenizer's subword counts. This module closes that gap with a
from-scratch byte-pair-encoding stack (Sennrich et al. 2016 /
GPT-2-style byte level), split Spark-first:

- **Word statistics are distributed**: pre-token frequencies come from
  one ``regexp_extract_all`` + explode + map-side-combined groupBy
  over the corpus — the only stage that touches every byte, and it
  scales like any other aggregation (100 TB of text -> a shuffle of
  distinct pre-tokens, Zipf-bounded).
- **Merge learning is bounded**: BPE training needs only the
  word-frequency table, and the mass above any frequency floor is
  carried by a bounded head of the Zipf curve — so the driver collects
  the top ``max_words`` (default 32768) rows (same bounded-artifact
  pattern as k-means centroids / PQ codebooks elsewhere in this repo)
  and learns ``num_merges`` merges with an incremental pair-count
  loop (pair->words inverted index; only words containing the merged
  pair are touched per step).
- **Encoding is distributed again**: the learned merge table (a few
  hundred entries) ships inside an Arrow-batched pandas UDF closure;
  encoding memoizes per distinct pre-token within each batch, so hot
  words tokenize once per batch, not once per occurrence.

Byte-level means NO unknown tokens and exact round-trip: the base
vocabulary is the 256 byte values; any UTF-8 text encodes, and
``decode(encode(t)) == t`` exactly (property-tested).

Reference analog: the user-closure transform surface
(`/root/reference/src/extract/pg.rs:101-125`) — the per-row transform
every LLM-pipeline user defines is exactly this tokenizer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

# Pre-tokenizer: tiles any string losslessly into
#   " ?alnum-run" | " ?punct-run" | "space-run"
# (a leading space sticks to the following word, GPT-2 style, so
# merges learn " the" as one unit). ASCII classes only, so the Java
# regex (word-count stage) and Python regex (encode stage) agree.
PRETOKEN_PATTERN = " ?[A-Za-z0-9]+| ?[^A-Za-z0-9 ]+| +"


@dataclass
class BpeModel:
    """A learned tokenizer: ``merges[i] = (left_id, right_id)`` creates
    token ``256 + i``; ``vocab[token_id] -> bytes``. Plain data — small
    enough (num_merges entries) to ship in a UDF closure."""

    merges: list[tuple[int, int]]
    vocab: dict[int, bytes] = field(repr=False)

    @property
    def ranks(self) -> dict[tuple[int, int], int]:
        return {pair: i for i, pair in enumerate(self.merges)}

    def encode_word(self, word: str, _ranks=None) -> list[int]:
        """Standard lowest-rank-first merge loop over one pre-token."""
        ranks = _ranks if _ranks is not None else self.ranks
        syms = list(word.encode("utf-8"))
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [256 + best_rank]
        return syms

    def make_encoder(self):
        """A text->ids closure with a PERSISTENT pre-token memo and a
        prebuilt rank table — build one per Arrow batch so hot words
        merge once per batch, not once per occurrence."""
        import re

        pat = re.compile(PRETOKEN_PATTERN)
        ranks = self.ranks
        cache: dict[str, list[int]] = {}

        def enc(text: str) -> list[int]:
            out: list[int] = []
            for w in pat.findall(text):
                ids = cache.get(w)
                if ids is None:
                    ids = self.encode_word(w, ranks)
                    cache[w] = ids
                out.extend(ids)
            return out

        return enc

    def encode(self, text: str) -> list[int]:
        return self.make_encoder()(text)

    def decode_bytes(self, ids: list[int]) -> bytes:
        return b"".join(self.vocab[i] for i in ids)

    def decode(self, ids: list[int], errors: str = "strict") -> str:
        """Exact for any full encode() output; a SLICE of token ids
        can end mid-codepoint (byte-level tokens are not codepoint
        aligned), so slice consumers pass ``errors='replace'`` or use
        :meth:`decode_bytes`."""
        return self.decode_bytes(ids).decode("utf-8", errors)

    def to_rows(self) -> list[tuple[int, int, int]]:
        """(new_id, left_id, right_id) rows for persistence."""
        return [(256 + i, a, b) for i, (a, b) in enumerate(self.merges)]

    @classmethod
    def from_rows(cls, rows) -> "BpeModel":
        merges = [
            (r[1], r[2]) for r in sorted(rows, key=lambda r: r[0])
        ]
        vocab = {i: bytes([i]) for i in range(256)}
        for i, (a, b) in enumerate(merges):
            vocab[256 + i] = vocab[a] + vocab[b]
        return cls(merges=merges, vocab=vocab)


def bpe_word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Distributed pre-token frequency table ``(word, cnt)`` — the only
    corpus-wide pass in BPE training. Explode + groupBy: map-side
    partial aggregation bounds the shuffle at partitions x distinct
    pre-tokens; no UDF, whole-stage codegen up to the exchange."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(PRETOKEN_PATTERN), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int = 256,
    max_words: int = 32768,
    min_pair_count: int = 2,
) -> BpeModel:
    """Learn a byte-level BPE merge table from a corpus.

    Distributed word counts -> bounded driver head (top ``max_words``
    by (cnt desc, word) — a TOTAL order, so the trained merges are
    deterministic under any partitioning) -> incremental pair-count
    merge loop. Ties in pair frequency break to the lexicographically
    smallest (left_id, right_id) pair: determinism is a contract here
    (same corpus => same tokenizer => same token budgets), not a nice-
    to-have."""
    head = (
        bpe_word_counts(df, text_col)
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    words: dict[tuple[int, ...], int] = {
        tuple(r["word"].encode("utf-8")): r["cnt"] for r in head
    }
    return bpe_train_from_counts(
        words, num_merges=num_merges, min_pair_count=min_pair_count
    )


def bpe_train_from_counts(
    words: dict[tuple[int, ...], int],
    *,
    num_merges: int = 256,
    min_pair_count: int = 2,
) -> BpeModel:
    """Driver-side merge learning over a bounded word-frequency dict.

    Incremental bookkeeping: a pair->{words containing it} inverted
    index means each merge step re-counts only the words that actually
    contain the chosen pair — total work is O(sum word lengths) to
    build + O(touched words) per merge, not O(V) per merge.

    The caller's dict is copied up front (bounded by max_words, so
    cheap): the merge loop rewrites its working dict destructively,
    and training twice from the same counts must not see the first
    run's partially-merged leftovers."""
    from collections import Counter, defaultdict

    words = dict(words)
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for syms, cnt in words.items():
        for p in zip(syms, syms[1:]):
            pair_counts[p] += cnt
            pair_words[p].add(syms)

    vocab = {i: bytes([i]) for i in range(256)}
    merges: list[tuple[int, int]] = []
    for step in range(num_merges):
        if not pair_counts:
            break
        # max count, then smallest pair — deterministic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        new_id = 256 + step
        merges.append(best)
        vocab[new_id] = vocab[best[0]] + vocab[best[1]]

        touched = list(pair_words.pop(best, ()))
        for old in touched:
            cnt = words.pop(old, None)
            if cnt is None:
                continue
            # retract the old word's pair contributions
            for p in zip(old, old[1:]):
                pair_counts[p] -= cnt
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pw = pair_words.get(p)
                if pw is not None:
                    pw.discard(old)
                    if not pw:
                        del pair_words[p]
            # apply the merge left-to-right
            new_syms: list[int] = []
            i = 0
            while i < len(old):
                if i + 1 < len(old) and (old[i], old[i + 1]) == best:
                    new_syms.append(new_id)
                    i += 2
                else:
                    new_syms.append(old[i])
                    i += 1
            new = tuple(new_syms)
            words[new] = words.get(new, 0) + cnt
            for p in zip(new, new[1:]):
                pair_counts[p] += cnt
                pair_words[p].add(new)
    return BpeModel(merges=merges, vocab=vocab)


def bpe_encode(
    df: DataFrame, text_col: str, model: BpeModel, *, out_col: str = "bpe_ids"
) -> DataFrame:
    """Arrow-batched encode: adds ``out_col`` = array<int> of token
    ids. The merge table rides in the UDF closure (a few KB); per-
    batch memoization means each distinct pre-token is merged once per
    batch however often it occurs."""
    merges, vocab = model.merges, dict(model.vocab)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _enc(texts: pd.Series) -> pd.Series:
        enc = BpeModel(merges=merges, vocab=vocab).make_encoder()
        return texts.map(lambda t: enc(t) if t is not None else None)

    return df.withColumn(out_col, _enc(F.col(text_col)))


def token_count_bpe(
    df: DataFrame, text_col: str, model: BpeModel, *, out_col: str = "n_bpe_tokens"
) -> DataFrame:
    """Opt-in subword counter for the token-denominated operators:
    produces the weight column that budget_sample /
    packing.pack_concat_chunk consume, counted with the SAME merge
    rules a real LM tokenizer would apply, not regex word pieces."""
    merges, vocab = model.merges, dict(model.vocab)

    @F.pandas_udf(LongType())
    def _cnt(texts: pd.Series) -> pd.Series:
        enc = BpeModel(merges=merges, vocab=vocab).make_encoder()
        return texts.map(lambda t: len(enc(t)) if t is not None else 0)

    return df.withColumn(out_col, _cnt(F.col(text_col)))


def bpe_compression_ratio(
    df: DataFrame, text_col: str, model: BpeModel, *, out_col: str = "bpe_ratio"
) -> DataFrame:
    """Subword-compression quality signal: BPE tokens per byte under a
    tokenizer TRAINED ON THE NATURAL CORPUS. Natural text compresses
    hard (merges fire constantly; ~0.18 tokens/byte on the fixtures at
    200 merges); random/hex/binary-ish junk barely compresses (~1.0)
    — so a mid-band threshold (0.5 here) separates the classes with a
    >4× margin on both sides. This is the "does it look like the
    training distribution" filter perplexity scoring approximates,
    at tokenizer cost instead of LM cost.

    Adds ``out_col`` (double, tokens/byte; 0.0 for empty text).
    Scale: one Arrow-batched encode pass (per-batch pre-token memo),
    no shuffle."""
    counted = token_count_bpe(df, text_col, model, out_col="__n_bpe")
    nbytes = F.octet_length(F.col(text_col))
    return counted.withColumn(
        out_col,
        F.when(nbytes > 0, F.col("__n_bpe").cast("double") / nbytes).otherwise(
            F.lit(0.0)
        ),
    ).drop("__n_bpe")


def bpe_decode(
    df: DataFrame, ids_col: str, model: BpeModel, *, out_col: str = "decoded_text"
) -> DataFrame:
    """Inverse of :func:`bpe_encode` — byte-level BPE is lossless, so
    this reconstructs the exact input text (the round-trip is the
    correctness oracle's verdict)."""
    merges, vocab = model.merges, dict(model.vocab)

    @F.pandas_udf("string")
    def _dec(ids: pd.Series) -> pd.Series:
        m = BpeModel(merges=merges, vocab=vocab)
        return ids.map(lambda v: m.decode(list(v)) if v is not None else None)

    return df.withColumn(out_col, _dec(F.col(ids_col)))


def chunk_by_bpe_tokens(
    df: DataFrame,
    model: BpeModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_chunk: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """BPE-counted sibling of packing.chunk_by_tokens: windows of
    ``tokens_per_chunk`` SUBWORD tokens (stride = chunk - overlap) —
    chunk boundaries fall between model tokens, and chunk token
    counts are the real context-length currency. Each chunk carries
    ``chunk_bytes`` (exact byte payload — concatenating overlap=0
    chunks reproduces the document byte-for-byte) and ``chunk_text``
    (decoded errors='replace': a token slice may end mid-codepoint,
    byte-level tokens are not codepoint aligned).

    Same coverage contract as chunk_by_tokens: every token lands in
    >= 1 chunk; the last window contributes at least one new token;
    tokenless documents yield no rows. One encode UDF + the same
    narrow sequence/posexplode/slice pipeline — no shuffle."""
    if not 0 <= overlap < tokens_per_chunk:
        raise ValueError("require 0 <= overlap < tokens_per_chunk")
    step = tokens_per_chunk - overlap
    enc = bpe_encode(df, text_col, model, out_col="__ids")
    n = F.size("__ids")
    max_start = F.floor(F.greatest(n - overlap - 1, F.lit(0)) / F.lit(step)) * step
    starts = F.when(
        n > 0, F.sequence(F.lit(0), max_start, F.lit(step))
    ).otherwise(F.array().cast("array<bigint>"))
    merges, vocab = model.merges, dict(model.vocab)

    @F.pandas_udf("binary")
    def _dec_bytes(ids: pd.Series) -> pd.Series:
        m = BpeModel(merges=merges, vocab=vocab)
        return ids.map(
            lambda v: m.decode_bytes(list(v)) if v is not None else None
        )

    @F.pandas_udf("string")
    def _dec_lossy(ids: pd.Series) -> pd.Series:
        m = BpeModel(merges=merges, vocab=vocab)
        return ids.map(
            lambda v: m.decode(list(v), errors="replace")
            if v is not None
            else None
        )

    chunked = (
        enc.select(
            F.col(id_col),
            F.col("__ids"),
            F.posexplode(starts).alias("chunk_id", "tok_start"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(
                F.col("__ids"), F.col("tok_start").cast("int") + 1, tokens_per_chunk
            ).alias("__chunk_ids"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk_ids").alias("n_chunk_tokens"),
            # exact payload: byte-level token slices can end mid-
            # codepoint, so the lossless column is BYTES; chunk_text
            # is the errors='replace' convenience view
            _dec_bytes(F.col("__chunk_ids")).alias("chunk_bytes"),
            _dec_lossy(F.col("__chunk_ids")).alias("chunk_text"),
        )
    )
    return chunked


def bpe_model_write(spark, model: BpeModel, path: str) -> None:
    """Persist the merge table as a tiny parquet artifact
    ``(new_id, left_id, right_id)`` — the build-once tokenizer a
    deployment trains on one corpus snapshot and reuses for every
    later encode/count job (token budgets must not drift because a
    re-train saw new data). The byte-level base vocab is implicit
    (ids 0-255), so the file IS the whole model."""
    rows = model.to_rows()
    spark.createDataFrame(
        rows, "new_id int, left_id int, right_id int"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def bpe_model_read(spark, path: str) -> BpeModel:
    """Load a persisted merge table back into a :class:`BpeModel`;
    round-trips exactly (merge order restored from new_id)."""
    rows = [
        (r["new_id"], r["left_id"], r["right_id"])
        for r in spark.read.parquet(path).collect()
    ]
    return BpeModel.from_rows(rows)


# ---------------------------------------------------------------------------
# Frozen-model ingest drift: the IVF staleness pattern (a build-time
# fit baseline persisted beside the artifact, each ingest batch scored
# against it) applied to the tokenizer. A deployment trains BPE once
# and encodes forever-after with the frozen merges; when the corpus
# drifts (new language, code into a prose tokenizer, junk), merges
# fire less — tokens/byte rises and the merged-token fraction falls —
# and token budgets silently inflate. The monitor quantifies that so
# the crawl loop knows when a retrain is due.
# ---------------------------------------------------------------------------

_DRIFT_STATS = "_drift_stats"


def bpe_corpus_stats(df: DataFrame, text_col: str, model: BpeModel) -> dict:
    """One Arrow-batched encode pass over ``df`` → corpus-level fit of
    the FROZEN model: ``tokens_per_byte`` (byte-weighted — total
    tokens / total bytes, not a mean of per-doc ratios) and
    ``merged_frac`` (fraction of emitted tokens that are MERGED ids
    ≥ 256 — the OOV-pressure proxy: text the merges were not trained
    on falls back to raw bytes). No shuffle; one 3-number aggregate."""
    counted = bpe_encode(df, text_col, model, out_col="__ids")
    row = counted.agg(
        F.sum(F.octet_length(F.col(text_col))).alias("b"),
        F.sum(F.size("__ids")).alias("t"),
        F.sum(F.size(F.filter(F.col("__ids"), lambda x: x >= 256))).alias("m"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    b, t, m = int(row["b"] or 0), int(row["t"] or 0), int(row["m"] or 0)
    return {
        "n_docs": int(row["n"]),
        "n_bytes": b,
        "n_tokens": t,
        "tokens_per_byte": (t / b) if b else 0.0,
        "merged_frac": (m / t) if t else 0.0,
    }


def bpe_baseline_write(
    spark, df: DataFrame, text_col: str, model: BpeModel, path: str
) -> dict:
    """Persist the build-time fit baseline next to a model written at
    ``path`` (underscore-prefixed subdir — hidden from parquet scans
    of the model itself, like every stats sidecar here). Overwrites:
    a retrain at the same path must reset its baseline too
    (the ivf_index_write stats contract). Returns the stats."""
    s = bpe_corpus_stats(df, text_col, model)
    spark.createDataFrame(
        [("build", s["n_docs"], s["n_bytes"], s["n_tokens"],
          float(s["tokens_per_byte"]), float(s["merged_frac"]))],
        "phase string, n_docs long, n_bytes long, n_tokens long, "
        "tokens_per_byte double, merged_frac double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/{_DRIFT_STATS}")
    return s


def bpe_ingest_check(
    spark, df: DataFrame, text_col: str, path: str, *, model: BpeModel | None = None
) -> dict:
    """Score one ingest batch against the frozen model at ``path``:
    returns the batch stats plus ``compression_drift`` (batch
    tokens/byte − build baseline; positive = the frozen merges
    compress the new data worse) and ``merged_frac_drop`` (baseline
    merged-token fraction − batch's; positive = OOV pressure). The
    batch's own row is appended to the stats sidecar (phase='ingest')
    so drift history is queryable. Callers threshold the drift —
    exactly :func:`~skopje_spark.operators.similarity.ivf_index_append`'s
    ``staleness_drop`` contract; both fields are None for models
    persisted before baselines existed."""
    if model is None:
        model = bpe_model_read(spark, path)
    s = bpe_corpus_stats(df, text_col, model)
    base_tpb = base_mf = None
    try:
        b = [
            r
            for r in spark.read.parquet(f"{path}/{_DRIFT_STATS}")
            .filter(F.col("phase") == "build")
            .collect()
        ]
        if b:
            base_tpb = float(b[0]["tokens_per_byte"])
            base_mf = float(b[0]["merged_frac"])
    except Exception:  # pre-baseline model layout
        pass
    spark.createDataFrame(
        [("ingest", s["n_docs"], s["n_bytes"], s["n_tokens"],
          float(s["tokens_per_byte"]), float(s["merged_frac"]))],
        "phase string, n_docs long, n_bytes long, n_tokens long, "
        "tokens_per_byte double, merged_frac double",
    ).write.mode("append").parquet(f"{path}/{_DRIFT_STATS}")
    return dict(
        s,
        baseline_tokens_per_byte=base_tpb,
        baseline_merged_frac=base_mf,
        compression_drift=(
            s["tokens_per_byte"] - base_tpb if base_tpb is not None else None
        ),
        merged_frac_drop=(
            base_mf - s["merged_frac"] if base_mf is not None else None
        ),
    )
