"""Multimodal columns (SURVEY.md §2C D5): opaque binary payloads with
typed metadata, processed by Arrow-batched pandas functions.

Container constraint: no image/audio codecs are installed, so the
*decode kernels* are stubbed (deterministic fake or
``NotImplementedError``), while everything Spark-side is real and
tested: schema, binary source, partition sizing, ``mapInPandas``
batch shape, and metadata extraction.

Scale notes:
- payloads stay in executor memory as Arrow binary columns — never
  collected, never round-tripped through Python row-at-a-time;
- ``spark.sql.files.maxPartitionBytes`` bounds per-task bytes for the
  ``binaryFile`` source; for row-group parquet payloads the same knob
  applies to the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried alongside every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture:
    payload = utf-8 bytes of the text (stand-in for image/audio bytes)
    + typed metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def read_binary_dir(spark, path: str, pattern: str = "*") -> DataFrame:
    """Binary/multimodal source: one row per file with (path,
    modificationTime, length, content) — the engine's blob-ingestion
    analog of the reference's download/unzip staging
    (``/root/reference/src/extract/http.rs:74-124``,
    ``/root/reference/src/extract/fs.rs:19-60``)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )


def decode_media_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB decode kernel — deterministic fake dimensions derived from
    the payload bytes (a real deployment would call PIL/ffmpeg here;
    those codecs are not installed in this container).

    The fake is pure arithmetic on byte length and first byte so tests
    (and the SQL oracle) can verify the full plumbing end-to-end.
    """
    byte_len = payloads.apply(len).astype("int64")
    first = payloads.apply(lambda b: b[0] if len(b) else 0).astype("int64")
    return pd.DataFrame(
        {
            "byte_len": byte_len,
            "width": (first % 64 + 1).astype("int32") * 16,
            "height": ((byte_len % 64) + 1).astype("int32") * 16,
            "n_frames": ((byte_len % 8) + 1).astype("int32"),
        }
    )


def _pil():  # pragma: no cover - container has no codecs
    """Feature-detect a real image codec once per process."""
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


HAVE_CODECS = _pil() is not None


def decode_media_real(payloads: pd.Series) -> pd.DataFrame:
    """Real codec decode: PIL when available (width/height from the
    actual image header, n_frames from the container), otherwise
    raises — callers choose it via ``decode_media(real=True)``, which
    feature-checks first."""
    Image = _pil()
    if Image is None:  # pragma: no cover - exercised only with codecs
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "decode_media(real=False) uses the deterministic stub kernel"
        )
    import io  # pragma: no cover - below runs only with codecs installed

    def one(b):
        with Image.open(io.BytesIO(bytes(b))) as im:
            return len(b), im.width, im.height, getattr(im, "n_frames", 1)

    rows = [one(b) for b in payloads]
    return pd.DataFrame(
        rows, columns=["byte_len", "width", "height", "n_frames"]
    ).astype({"width": "int32", "height": "int32", "n_frames": "int32"})


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 real: bool | None = None) -> DataFrame:
    """Arrow-batched decode over ``mapInPandas``: batches stream
    through Python with zero row-at-a-time overhead; output schema is
    fixed (DECODED_SCHEMA) so downstream plans stay columnar.

    ``real=None`` auto-selects: the PIL kernel when codecs exist in
    the environment, the deterministic stub otherwise. Forcing
    ``real=True`` without codecs raises up front (on the driver), not
    per-task on executors."""
    if real is None:
        real = HAVE_CODECS
    if real and _pil() is None:
        raise NotImplementedError(
            "decode_media(real=True) requires PIL, which is not installed"
        )
    kernel = decode_media_real if real else decode_media_batch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = kernel(pdf["payload"])
            out.insert(0, "doc_id", pdf[id_col].astype("int64").values)
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return df.select(F.col(id_col), "payload").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def resize_media(df: DataFrame, *, width: int = 32, height: int = 32,
                 id_col: str = "doc_id") -> DataFrame:
    """STUB resize over ``mapInPandas``: the fake kernel truncates/pads
    the payload to width*height bytes (a real deployment swaps in
    PIL.Image.resize — codecs absent in this container); the Spark
    side — Arrow batching, fixed output schema, payload staying off
    the driver — is the real, tested plumbing."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].apply(
                lambda b: bytes(b[:target]).ljust(target, b"\0")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def sample_frames(df: DataFrame, *, every_n: int = 2,
                  id_col: str = "doc_id") -> DataFrame:
    """STUB frame sampling: the decode stub's n_frames partitions the
    payload into equal byte slices ("frames"); every ``every_n``-th is
    emitted — a one-to-many ``mapInPandas`` expansion, the shape real
    video frame-sampling has (one input row, k output rows, no
    driver involvement)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, chunks = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) % 8) + 1  # decode-stub arithmetic
                step = max(len(b) // n_frames, 1)
                for fno in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    nos.append(fno)
                    chunks.append(b[fno * step:(fno + 1) * step])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame_bytes": chunks}
            )

    return df.select(F.col(id_col), "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def extract_features(df: DataFrame, *, dim: int = 16,
                     id_col: str = "doc_id") -> DataFrame:
    """STUB feature extraction: a deterministic byte-histogram
    embedding (real deployments swap in a vision/audio encoder). The
    output column is ``array<float>`` — exactly what the similarity
    operators consume, closing the multimodal → embedding →
    dedup/search loop inside the engine."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist, _ = np.histogram(arr % dim, bins=dim, range=(0, dim))
                v = hist.astype("float64")
                n = float(np.linalg.norm(v))
                feats.append((v / n if n else v).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "embedding": feats}
            )

    return df.select(F.col(id_col), "payload").mapInPandas(
        run, schema="doc_id long, embedding array<float>"
    )
