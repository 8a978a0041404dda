"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` kernels so each Python worker processes
whole record batches (the only Python shape that survives 100 TB).

The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernels are deterministic FAKES, clearly
marked: they compute real byte-level statistics (so tests assert real
values) where a production kernel would call the codec. The Spark-side
plumbing — schema, batch iteration, partitioning, output shape — is
the real deliverable and is fully exercised.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<source:string, declared_len:long>"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "byte_sum long, first_byte int, fake_width int, fake_height int"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"

RESIZE_SCHEMA = (
    "doc_id long, n_bytes long, stride int, out_bytes long, out_sum long"
)


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a multimodal table from the documents fixture: the text
    bytes stand in for an opaque media payload (deterministic)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            # declared_len describes the PAYLOAD, so it must count the
            # payload's BYTES — length() over the source text counts
            # characters, which disagrees with the encoded payload for
            # any multi-byte text ('café' is 4 chars, 5 bytes): a
            # consumer validating payload integrity against
            # declared_len would flag every non-ASCII document corrupt
            F.length(payload).cast("long").alias("declared_len"),
        ).alias("meta"),
    )


def _norm(payload) -> bytes:
    """NULL payloads read as zero-length media (n_bytes 0, no frames)
    instead of killing the whole task with a TypeError inside the
    kernel — one undecodable row must not fail a 100 TB job."""
    return payload if payload is not None else b""


def decode_features(media_df: DataFrame) -> DataFrame:
    """'Decode' each payload and emit per-item features.

    PRODUCTION: replace the body of ``kernel`` with a real decoder
    (PIL.Image.open(io.BytesIO(b)) etc.). The fake derives width/height
    deterministically from byte statistics so the pipeline is testable
    without codec libraries.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(_norm)
            n_bytes = payloads.map(len)
            byte_sum = payloads.map(lambda b: sum(b) if len(b) else 0)
            first = payloads.map(lambda b: b[0] if len(b) else -1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    "first_byte": first.astype("int32"),
                    # FAKE decode: a real kernel returns the image's
                    # actual dimensions here
                    "fake_width": (n_bytes % 640).astype("int32"),
                    "fake_height": (byte_sum % 480).astype("int32"),
                }
            )

    return media_df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sample each payload: split the byte stream into
    ``n_frames`` evenly spaced chunks (a real kernel would seek keyframes
    with a video codec). One row out per (item, frame)."""
    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = _norm(payload)
                n = len(payload)
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    start = i * step
                    if start >= n:
                        break
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_bytes.append(bytes(payload[start : start + step]))
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return media_df.mapInPandas(kernel, schema=FRAME_SCHEMA)


def resize_media(media_df: DataFrame, target_bytes: int = 256) -> DataFrame:
    """'Resize' each payload down to a byte budget by uniform striding
    (every k-th byte, k = ceil(n / target)) — the downsampling shape of
    an image-resize / audio-decimation kernel. PRODUCTION: replace the
    stride with a real resampler (PIL thumbnail / librosa resample);
    the output contract (bounded payload per row, stride recorded for
    provenance) stays the same. Emits byte-exact summary stats so the
    fake is differentially checkable."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, st, ob, osum = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = _norm(payload)
                n = len(payload)
                k = max(-(-n // target_bytes), 1)
                resized = payload[::k]
                ids.append(doc_id)
                nb.append(n)
                st.append(k)
                ob.append(len(resized))
                osum.append(int(sum(resized)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "stride": pd.Series(st, dtype="int32"),
                    "out_bytes": pd.Series(ob, dtype="int64"),
                    "out_sum": pd.Series(osum, dtype="int64"),
                }
            )

    return media_df.mapInPandas(kernel, schema=RESIZE_SCHEMA)
