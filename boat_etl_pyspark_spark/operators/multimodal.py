"""Multimodal column plumbing (SURVEY.md §2.9 / north-star spec).

Image/audio/video payloads are carried as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``
operators. The *decode* step (PIL/librosa/ffmpeg) is stubbed — those
libraries aren't in this container — behind an import-try that raises
``NotImplementedError``, with a deterministic fake used to exercise
the real Spark plumbing: schema declaration, Arrow batch iteration,
row explosion (frame sampling), and partition-preserving execution.

The fixture has no binary table, so ``attach_binary`` manufactures a
payload column from ``documents.text`` (UTF-8 bytes). At production
scale the payload column comes straight from parquet/lance binary
columns; everything downstream is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id BIGINT, byte_len BIGINT, kind STRING, checksum BIGINT"
FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_len BIGINT"
FEATURE_SCHEMA = "doc_id BIGINT, feature ARRAY<DOUBLE>"

_KINDS = ["image", "audio", "video", "blob"]


def attach_binary(docs: DataFrame) -> DataFrame:
    """Manufacture an opaque binary payload column (UTF-8 bytes of the
    text) plus the id; stand-in for a real binary source column."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def binary_metadata(with_payload: DataFrame) -> DataFrame:
    """Typed metadata per payload: length, sniffed kind, checksum.

    The kind sniff and checksum are deterministic functions of the
    bytes so the DuckDB oracle can reproduce them; a real
    implementation would parse magic numbers here.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            lens = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": lens,
                    "kind": [_KINDS[n % 4] for n in lens],
                    # cheap rolling checksum over the raw bytes —
                    # vectorized per payload (a pure-Python byte loop
                    # is ~100x slower at Arrow batch sizes)
                    "checksum": [
                        int(np.frombuffer(b, dtype=np.uint8).sum()) % 1_000_003
                        for b in pdf["payload"]
                    ],
                }
            )

    return with_payload.mapInPandas(batches, META_SCHEMA)


def frame_sample(
    with_payload: DataFrame, chunk: int = 1024, stride: int = 2
) -> DataFrame:
    """Sample every ``stride``-th fixed-size chunk ("frame") of each
    payload — the row-exploding shape of video frame extraction. Each
    input row yields a variable number of output rows; mapInPandas
    keeps it Arrow-batched and partition-local (no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lens = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = (n + chunk - 1) // chunk
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(min(chunk, n - i * chunk))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens}
            )

    return with_payload.mapInPandas(batches, FRAME_SCHEMA)


def decode_features(with_payload: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract. The real decoder needs image/audio
    libraries that aren't in this container; the deterministic fake
    exercises identical plumbing (schema, batching, output shape)."""
    try:  # pragma: no cover - decoder libs absent by design
        import PIL  # noqa: F401

        raise NotImplementedError(
            "real image decode is stubbed in this environment; "
            "plug a PIL/librosa decoder into `batches` below"
        )
    except ImportError:
        pass

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                [float((len(b) * (j + 1)) % 997) for j in range(dim)]
                for b in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return with_payload.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id BIGINT, src_len BIGINT, out_w INT, out_h INT, "
    "out_len BIGINT, scale_num BIGINT"
)


def resize(with_payload: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Resize each payload to a fixed (w, h): the canonical image
    normalization step before feature extraction. The pixel resample
    itself needs a decoder (absent by design — see ``decode_features``);
    the deterministic fake keeps the exact production plumbing:
    per-row variable input -> fixed-size output descriptor, Arrow
    batches, no shuffle, no driver. ``scale_num`` stands in for the
    resample ratio (source bytes per output cell, floor) so the
    output is a checkable function of the input."""
    try:  # pragma: no cover - decoder libs absent by design
        import PIL  # noqa: F401

        raise NotImplementedError(
            "real image resize is stubbed in this environment; "
            "plug a PIL.Image.resize into `batches` below"
        )
    except ImportError:
        pass

    cells = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_len": lens,
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_len": cells * 3,  # RGB bytes
                    "scale_num": [n // cells for n in lens],
                }
            )

    return with_payload.mapInPandas(batches, RESIZE_SCHEMA)
