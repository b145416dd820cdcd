"""Multimodal column plumbing (SURVEY.md §2.9 / north-star spec).

Image/audio/video payloads are carried as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``
operators — schema declaration, Arrow batch iteration, row explosion
(frame sampling), and partition-preserving execution are exactly the
production shapes.

The *decode* step is a real, pure-numpy raster decode: a payload is
interpreted as a grayscale image with fixed row stride ``RASTER_W``
(the "raw frame" layout), the tail row zero-padded. ``resize`` then
performs a true nearest-neighbor resample of that raster and
``decode_features`` extracts an intensity-band profile — all exact
integer math over the actual bytes, reproduced bit-for-bit by the
DuckDB oracles. A container with PIL/librosa/ffmpeg would swap the
raster decode for a codec decode; every other line (schemas, Arrow
batching, partitioning) is unchanged.

The fixture has no binary table, so ``attach_binary`` manufactures a
payload column from ``documents.text`` (UTF-8 bytes). At production
scale the payload column comes straight from parquet/lance binary
columns; everything downstream is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id BIGINT, byte_len BIGINT, kind STRING, checksum BIGINT"
FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_len BIGINT"
FEATURE_SCHEMA = "doc_id BIGINT, feature ARRAY<DOUBLE>"

_KINDS = ["image", "audio", "video", "blob"]

# Fixed row stride of the raw-raster decode. A power of two, so the
# oracle's index arithmetic stays exact integer math (no sqrt — float
# sqrt of a perfect square can land on either side of the integer in
# different engines).
RASTER_W = 128


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
    keeps it Arrow-batched and partition-local (no shuffle). The chunk
    math is whole-batch numpy (repeat + cumulative offsets), no
    per-payload Python loop."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            n_frames = (n + chunk - 1) // chunk
            counts = (n_frames + stride - 1) // stride  # sampled per row
            total = int(counts.sum())
            ids = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), counts)
            starts = np.cumsum(counts) - counts
            idxs = (np.arange(total) - np.repeat(starts, counts)) * stride
            lens = np.minimum(chunk, np.repeat(n, counts) - idxs * chunk)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens}
            )

    return with_payload.mapInPandas(batches, FRAME_SCHEMA)


def decode_features(with_payload: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract: the payload's byte stream is split
    into ``dim`` equal index bands and each feature is the band's mean
    intensity (the coarse profile a downsampled grayscale decode
    yields). Real math over the real bytes, vectorized across the
    whole Arrow batch: one concatenated buffer + ``np.add.reduceat``
    on per-row band boundaries — no per-payload Python loop."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            payloads = pdf["payload"].tolist()
            n = np.array([len(b) for b in payloads], dtype=np.int64)
            # one zero sentinel byte: every band boundary (including a
            # trailing empty payload's offset == total length) is then
            # a valid reduceat index, and the sentinel adds 0 to the
            # final band's sum
            flat = np.frombuffer(b"".join(payloads) + b"\x00", dtype=np.uint8)
            off = np.cumsum(n) - n
            j = np.arange(dim, dtype=np.int64)
            # band j of row i covers [j*n_i//dim, (j+1)*n_i//dim);
            # bands tile each row contiguously, so the lo boundaries
            # alone partition the concatenated buffer
            lo = off[:, None] + (j[None, :] * n[:, None]) // dim
            hi = off[:, None] + ((j[None, :] + 1) * n[:, None]) // dim
            cnt = (hi - lo).astype(np.float64)
            sums = np.add.reduceat(flat.astype(np.int64), lo.ravel()).astype(
                np.float64
            )
            # reduceat yields arr[lo] for empty segments; zero them
            sums[(hi - lo).ravel() == 0] = 0.0
            sums = sums.reshape(lo.shape)
            feats = np.divide(sums, cnt, out=np.zeros_like(sums), where=cnt > 0)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "feature": list(feats)}
            )

    return with_payload.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id BIGINT, src_len BIGINT, src_w INT, src_h INT, out_w INT, "
    "out_h INT, checksum BIGINT"
)


def resize(with_payload: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Nearest-neighbor resize of the raster decode to ``(out_w,
    out_h)`` — the canonical image normalization step before feature
    extraction, computed for real: payload bytes -> (h, RASTER_W)
    grayscale raster (tail zero-padded) -> index-mapped resample ->
    checksum of the resampled pixels. Arrow batches, no shuffle, no
    driver; a codec container would replace the raster step only."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sx = (np.arange(out_w, dtype=np.int64) * RASTER_W) // out_w
        for pdf in it:
            out = []
            lens = []
            heights = []
            for b in pdf["payload"]:
                n = len(b)
                h = max(1, (n + RASTER_W - 1) // RASTER_W)
                arr = np.zeros(h * RASTER_W, dtype=np.uint8)
                arr[:n] = np.frombuffer(b, dtype=np.uint8)
                raster = arr.reshape(h, RASTER_W)
                sy = (np.arange(out_h, dtype=np.int64) * h) // out_h
                resampled = raster[np.ix_(sy, sx)]
                out.append(int(resampled.astype(np.int64).sum()))
                lens.append(n)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_len": lens,
                    "src_w": RASTER_W,
                    "src_h": heights,
                    "out_w": out_w,
                    "out_h": out_h,
                    "checksum": out,
                }
            )

    return with_payload.mapInPandas(batches, RESIZE_SCHEMA)


PHASH_SCHEMA = "doc_id BIGINT, k0 BIGINT, k1 BIGINT, k2 BIGINT, k3 BIGINT"

_PHASH_DIM = 64


def phash_keys(with_payload: DataFrame) -> DataFrame:
    """Banded average-hash (aHash) of the payload: 64 intensity bands,
    each thresholded against the payload's OWN mean intensity — the
    bit-j test is the exact integer cross-multiplication
    ``band_sum * n > total_sum * band_len`` (no float mean), so the
    oracle reproduces every bit. The 64 bits pack into FOUR 16-bit
    band keys (k0..k3): equality on any one key is the
    hamming-space LSH band used for candidate generation, exactly the
    MinHash banding trick transplanted to image near-dup — similar
    payloads agree on whole 16-bit bands with high probability.
    Vectorized over the Arrow batch with one reduceat, no per-payload
    Python loop (the ``decode_features`` pattern)."""
    dim = _PHASH_DIM

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w16 = 1 << np.arange(15, -1, -1, dtype=np.int64)
        for pdf in it:
            if not len(pdf):
                continue
            payloads = pdf["payload"].tolist()
            n = np.array([len(b) for b in payloads], dtype=np.int64)
            flat = np.frombuffer(b"".join(payloads) + b"\x00", dtype=np.uint8)
            off = np.cumsum(n) - n
            j = np.arange(dim, dtype=np.int64)
            lo = off[:, None] + (j[None, :] * n[:, None]) // dim
            hi = off[:, None] + ((j[None, :] + 1) * n[:, None]) // dim
            cnt = hi - lo
            sums = np.add.reduceat(flat.astype(np.int64), lo.ravel())
            sums[cnt.ravel() == 0] = 0
            sums = sums.reshape(lo.shape)
            total = sums.sum(axis=1)  # bands tile the payload exactly
            bits = (sums * n[:, None]) > (total[:, None] * cnt)
            cols = {"doc_id": pdf["doc_id"]}
            for b in range(4):
                cols[f"k{b}"] = (
                    bits[:, b * 16 : (b + 1) * 16].astype(np.int64) * w16
                ).sum(axis=1)
            yield pd.DataFrame(cols)

    return with_payload.mapInPandas(batches, PHASH_SCHEMA)
