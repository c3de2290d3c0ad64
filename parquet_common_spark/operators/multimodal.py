"""Multimodal column plumbing: opaque binary media + typed metadata.

The decode step is REAL for the formats a stdlib-only container can
honestly decode: PNG full pixel decode at every bit depth incl. Adam7
(functions/mediacodec.py), JPEG full pixel decode — baseline AND
progressive (functions/jpegcodec.py), WAV PCM sample decode, MP4
ISO-BMFF metadata (geometry/duration/frame counts) AND full video-track
DEMUX (per-frame byte ranges/timestamps/keyframes from the sample
tables; sample_frames emits the exact access units) — detected by magic
bytes.  Payloads with no known container magic (the synthetic corpus
attach_fake_media builds) fall back to a deterministic synthetic
decode so the plumbing tests stay closed-form; only PIXEL decode of a
demuxed video access unit still needs codecs (libav/PyAV in
production).  The
Spark-side shape is the part that matters at 100 TB and is final
either way: binary columns, typed metadata structs, Arrow-batched
mapInPandas with an explicit output schema, batch-shape control via
maxRecordsPerBatch, map-only plans.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
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


def _decode_synthetic(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic synthetic decode for payloads with no container
    magic (the corpus attach_fake_media builds): fake (width, height,
    n_frames) derived from the payload length, stable for tests."""
    n = len(payload)
    if media_type == "image":
        return (n % 640 + 1, n % 480 + 1, 1)
    if media_type == "video":
        return (n % 640 + 1, n % 480 + 1, n % 300 + 1)
    if media_type == "audio":
        return (0, 0, n % 48000 + 1)
    raise NotImplementedError(f"unknown media type {media_type!r}")


def _decode_media(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Real decode where the format allows (see module doc): PNG pixels,
    JPEG geometry, WAV frames; synthetic fallback for magic-less
    payloads; NotImplementedError for real video containers."""
    from parquet_common_spark.functions import mediacodec as MC

    fmt = MC.sniff_media(payload)
    if fmt == "png":
        w, h, _pixels = MC.decode_png(payload)
        return (w, h, 1)
    if fmt == "jpeg":
        try:
            # full pixel decode, baseline AND progressive
            # (functions/jpegcodec.py); lossless/arithmetic streams
            # fall back to geometry-only
            from parquet_common_spark.functions import jpegcodec as JC

            w, h, _pixels = JC.decode_jpeg(payload)
        except NotImplementedError:
            w, h = MC.jpeg_dimensions(payload)
        return (w, h, 1)
    if fmt == "wav":
        _ch, _rate, frames = MC.wav_info(payload)
        return (0, 0, frames)
    if fmt == "flac":
        from parquet_common_spark.functions import flaccodec as FC

        _ch, _rate, _bits, frames = FC.flac_info(payload)
        return (0, 0, frames)
    if fmt == "gif":
        from parquet_common_spark.functions import gifcodec as GC

        w, h, frames = GC.gif_info(payload)
        return (w, h, frames)
    if fmt == "tiff":
        from parquet_common_spark.functions import tiffcodec as TC

        w, h, _spp = TC.tiff_info(payload)
        return (w, h, 1)
    if fmt == "bmp":
        from parquet_common_spark.functions import bmpcodec as BC

        w, h, _bits = BC.bmp_info(payload)
        return (w, h, 1)
    if fmt == "ico":
        from parquet_common_spark.functions import icocodec as IC

        ents = IC.ico_entries(payload)
        big = max(ents, key=lambda e: e["width"] * e["height"])
        return (big["width"], big["height"], len(ents))
    if fmt == "mp4":
        # real METADATA via the ISO-BMFF box walk; pixel/frame decode
        # still needs libav/PyAV and raises in sample_frames
        w, h, _dur, frames = MC.mp4_info(payload)
        return (w, h, frames)
    return _decode_synthetic(media_type, payload)


# Back-compat alias: the r1-r4 surface exposed the stub under this name.
_decode_stub = _decode_media


def decode_media(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    mapInPandas (not a row UDF): payloads stay in Arrow buffers per batch;
    per-batch Python overhead is amortized.  Map-only — no shuffle."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def decode_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        def safe(mt, p):
            # a corrupt payload in a billion-document corpus must NOT
            # kill the job: undecodable rows yield NULL metadata (the
            # pipeline can filter `width IS NULL` into a quarantine)
            try:
                return _decode_media(mt, p)
            except Exception:  # noqa: BLE001 — any malformed container
                return (None, None, None)

        for pdf in batches:
            meta = [safe(mt, bytes(p)) for mt, p in zip(pdf["media_type"], pdf["payload"])]
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


def sample_frames(
    df: DataFrame, every_k: int = 10, keyframes_only: bool = False
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame —
    the row-exploding mapInPandas shape (variable fan-out per input row).
    MP4 payloads take the REAL path: ``mp4_demux`` reconstructs the
    sample tables (ISO/IEC 14496-12) and ``frame_payload`` is the exact
    demuxed access unit sliced out of ``mdat`` (PIXEL decode of that
    unit still needs a video codec downstream).  ``keyframes_only``
    restricts to sync samples (stss).  Magic-less synthetic payloads
    keep the deterministic slice fallback so the plumbing tests stay
    closed-form."""

    def explode_frames(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        from parquet_common_spark.functions import mediacodec as MC

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_payload": []}
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                if mt != "video":
                    continue
                raw = bytes(payload)
                fmt = MC.sniff_media(raw)
                if fmt == "gif":
                    # animated GIF: composite every frame (disposal/
                    # transparency honored), sample every_k-th, and
                    # emit each sampled frame re-encoded as lossless
                    # PNG — a decodable standalone payload downstream,
                    # unlike a bare indexed sub-rect.  GIF has no
                    # sync-sample notion; every composited frame is
                    # self-contained, so keyframes_only is a no-op.
                    from parquet_common_spark.functions import gifcodec as GC

                    rgb_frames, _delays = GC.gif_frames(raw)
                    for idx in range(0, len(rgb_frames), every_k):
                        out["doc_id"].append(int(doc_id))
                        out["frame_idx"].append(idx)
                        out["frame_payload"].append(MC.encode_png(rgb_frames[idx]))
                elif fmt == "mp4":
                    frames = MC.mp4_demux(raw)
                    if frames:
                        if keyframes_only:
                            frames = [fr for fr in frames if fr["keyframe"]]
                        for fr in frames[::every_k]:
                            out["doc_id"].append(int(doc_id))
                            out["frame_idx"].append(fr["idx"])
                            out["frame_payload"].append(MC.mp4_frame_bytes(raw, fr))
                    else:
                        # metadata-only mp4 (no stsz sample table): frame
                        # GRID from the stts count, stub payload slices
                        for idx in range(0, MC.mp4_info(raw)[3], every_k):
                            lo = idx % max(len(raw), 1)
                            out["doc_id"].append(int(doc_id))
                            out["frame_idx"].append(idx)
                            out["frame_payload"].append(raw[lo : lo + 16])
                else:
                    n_frames = len(raw) % 300 + 1  # matches _decode_stub
                    for idx in range(0, n_frames, every_k):
                        # synthetic frame: a deterministic slice standing
                        # in for a demuxed access unit
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
    """Resize for image rows.  PNG and JPEG (baseline + progressive)
    payloads take the REAL path: pixel decode -> nearest-neighbor
    resample -> re-encode (stdlib codecs in functions/mediacodec.py +
    functions/jpegcodec.py).  Other payloads compute the target
    geometry and pass bytes through (synthetic payloads; lossless/
    arithmetic JPEG)."""

    def resize(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd

        from parquet_common_spark.functions import jpegcodec as JC
        from parquet_common_spark.functions import mediacodec as MC

        for pdf in batches:
            out = {"doc_id": [], "media_type": [], "width": [], "height": [], "payload": []}
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                raw = bytes(payload)
                pixels = None
                fmt = MC.sniff_media(raw) if mt in ("image", "video") else None
                if fmt == "png":
                    # single full decode: geometry AND pixels (the
                    # per-scanline unfilter dominates this operator —
                    # never pay it twice for the same payload)
                    w, h, pixels = MC.decode_png(raw)
                elif fmt == "jpeg":
                    try:
                        w, h, pixels = JC.decode_jpeg(raw)
                    except NotImplementedError:  # lossless/arithmetic: geometry only
                        w, h = MC.jpeg_dimensions(raw)
                elif mt in ("image", "video"):
                    w, h, _ = _decode_media(mt, raw)
                else:
                    w, h = 0, 0
                if w and max(w, h) > max_side:
                    scale = max_side / max(w, h)
                    w, h = max(int(w * scale), 1), max(int(h * scale), 1)
                    if pixels is not None:
                        small = MC.resize_nearest(pixels, w, h)
                        if fmt == "jpeg":
                            raw = JC.encode_jpeg(
                                small[:, :, 0] if small.shape[2] == 1 else small
                            )
                        else:
                            raw = MC.encode_png(small)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["width"].append(w)
                out["height"].append(h)
                out["payload"].append(raw)
            yield pd.DataFrame(out)

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def audio_features(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Per-payload audio features for audio rows: channel/rate/frame
    geometry plus signal stats (RMS, absolute peak) computed over the
    REAL PCM samples for WAV payloads (functions/mediacodec.wav_samples
    — integer 8/16/24/32 and IEEE-float PCM, G.711, IMA ADPCM) and
    FLAC payloads (functions/flaccodec.flac_samples, normalized by
    2^(bits-1)).  Payloads with neither magic keep the synthetic frame
    count with NULL signal stats — geometry is derivable, waveforms are
    not.  Arrow-batched map-only plan, same shape discipline as
    decode_media."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def feats(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import numpy as np
        import pandas as pd

        from parquet_common_spark.functions import mediacodec as MC

        for pdf in batches:
            rows = {k.name: [] for k in AUDIO_SCHEMA.fields}
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                raw = bytes(payload)
                ch = rate = None
                frames = 0
                dur = rms = peak = None
                fmt = MC.sniff_media(raw)
                if fmt == "wav":
                    try:
                        x, rate = MC.wav_samples(raw)
                        frames, ch = x.shape
                        dur = frames / rate if rate else None
                        if frames:
                            rms = float(np.sqrt(np.mean(x * x)))
                            peak = float(np.abs(x).max())
                    except NotImplementedError:
                        ch, rate, frames = MC.wav_info(raw)
                        dur = frames / rate if rate else None
                elif fmt == "flac":
                    from parquet_common_spark.functions import flaccodec as FC

                    _c, _r, bits, _n = FC.flac_info(raw)
                    pcm, rate = FC.flac_samples(raw)
                    x = pcm.astype(np.float64) / float(1 << (bits - 1))
                    frames, ch = x.shape
                    dur = frames / rate if rate else None
                    if frames:
                        rms = float(np.sqrt(np.mean(x * x)))
                        peak = float(np.abs(x).max())
                else:
                    _w, _h, frames = _decode_synthetic(str(mt), raw)
                rows["doc_id"].append(int(doc_id))
                rows["n_channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["n_frames"].append(int(frames))
                rows["duration_s"].append(dur)
                rows["rms"].append(rms)
                rows["peak"].append(peak)
            yield pd.DataFrame(rows)

    return df.where(F.col("media_type") == "audio").mapInPandas(
        feats, schema=AUDIO_SCHEMA
    )
