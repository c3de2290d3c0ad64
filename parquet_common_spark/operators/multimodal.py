"""Multimodal column plumbing: opaque binary media + typed metadata.

The container has no image/audio libraries, so the decode step is a
clearly-marked deterministic STUB — but the Spark-side plumbing is real
and tested: binary columns, typed metadata structs, Arrow-batched
mapInPandas with an explicit output schema, and batch-shape control via
maxRecordsPerBatch.  Swapping `_decode_stub` for PIL/librosa is a
one-function change; the plan shape (map-only, no shuffle, columnar Arrow
transfer) is the part that matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic opaque binary payload from text — stands in
    for real image/audio bytes so the binary-column plumbing is exercised
    end-to-end."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        mt.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _decode_stub(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """STUB decode: real decode (PIL / libav / librosa) is unavailable in
    this container.  Returns deterministic fake (width, height, n_frames)
    derived from the payload so tests are stable.  Replace this function
    to productionize; the mapInPandas plumbing around it is final."""
    n = len(payload)
    if media_type == "image":
        return (n % 640 + 1, n % 480 + 1, 1)
    if media_type == "video":
        return (n % 640 + 1, n % 480 + 1, n % 300 + 1)
    if media_type == "audio":
        return (0, 0, n % 48000 + 1)
    raise NotImplementedError(f"unknown media type {media_type!r}")


def decode_media(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    mapInPandas (not a row UDF): payloads stay in Arrow buffers per batch;
    per-batch Python overhead is amortized.  Map-only — no shuffle."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def decode_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            meta = [_decode_stub(mt, bytes(p)) for mt, p in zip(pdf["media_type"], pdf["payload"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame —
    the row-exploding mapInPandas shape (variable fan-out per input row).
    Frame extraction itself is the documented STUB (deterministic payload
    slices); the plumbing — binary in, multiple binary rows out, Arrow
    batches both ways — is the real scale path."""

    def explode_frames(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_payload": []}
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if mt != "video":
                    continue
                raw = bytes(payload)
                n_frames = len(raw) % 300 + 1  # matches _decode_stub
                for idx in range(0, n_frames, every_k):
                    # STUB frame: a deterministic slice standing in for a
                    # decoded frame buffer
                    lo = idx % max(len(raw), 1)
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame_payload"].append(raw[lo : lo + 16])
            yield pd.DataFrame(out)

    return df.mapInPandas(explode_frames, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_media(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stub for image rows: computes the target geometry for a
    max-side constraint (real arithmetic) and passes the payload through
    (STUB — PIL unavailable; swapping in a real resampler touches only
    the inner function)."""

    def resize(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "media_type": [], "width": [], "height": [], "payload": []}
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                raw = bytes(payload)
                w, h, _ = _decode_stub(mt, raw) if mt in ("image", "video") else (0, 0, 0)
                if w and max(w, h) > max_side:
                    scale = max_side / max(w, h)
                    w, h = max(int(w * scale), 1), max(int(h * scale), 1)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["width"].append(w)
                out["height"].append(h)
                out["payload"].append(raw)
            yield pd.DataFrame(out)

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)
