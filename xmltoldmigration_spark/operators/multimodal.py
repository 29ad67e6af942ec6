"""Multimodal decode / feature-extract plumbing (stubbed decoders).

The container has no image/audio/video libraries, so actual decoding is
stubbed: `decode_image`/`decode_audio` raise NotImplementedError with the
intended real implementation documented, while `fake_decode` provides a
deterministic stand-in so the distributed plumbing (binary columns, Arrow
batch shapes, mapInPandas schemas, partitioning) is fully testable.

At scale: payloads stay opaque `binary` columns (parquet/Iceberg store them
page-compressed); decode runs inside mapInPandas so each Arrow batch moves
once; frame/feature outputs explode rows *inside* the UDF, which keeps the
shuffle downstream of the explode sized by output rows, not input bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def decode_image(payload: bytes) -> "object":
    """STUB — real impl: PIL.Image.open(io.BytesIO(payload)) -> ndarray."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this container; "
        "use fake_decode() for plumbing tests"
    )


def decode_audio(payload: bytes) -> "object":
    """STUB — real impl: soundfile.read(io.BytesIO(payload)) -> (ndarray, sr)."""
    raise NotImplementedError(
        "audio decoding requires soundfile/librosa, not available in this container"
    )


def fake_decode(payload: bytes, every_n_bytes: int) -> list[tuple[int, str]]:
    """Deterministic decoder stand-in: 'frames' are md5 digests of
    consecutive byte windows — same shape as a real frame sampler."""
    frames = []
    for idx, off in enumerate(range(0, len(payload), every_n_bytes)):
        window = payload[off : off + every_n_bytes]
        frames.append((idx, hashlib.md5(window).hexdigest()))
    return frames


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """media: DataFrame[doc_id, payload binary, mime_type] ->
    DataFrame[doc_id, frame_idx, frame_sig] (one row per sampled frame)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_sig = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, sig in fake_decode(bytes(payload), every_n_bytes):
                    out_ids.append(doc_id)
                    out_idx.append(idx)
                    out_sig.append(sig)
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_sig": out_sig}
            )

    return media.mapInPandas(op, schema="doc_id long, frame_idx int, frame_sig string")
