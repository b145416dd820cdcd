"""The vectorized multimodal operators must equal a naive per-byte
Python reference on adversarial payloads (empty, shorter than the band
count, exactly one raster row, multi-row)."""

from __future__ import annotations

from boat_etl_pyspark_spark.operators.multimodal import (
    RASTER_W,
    decode_features,
    frame_sample,
    resize,
)

PAYLOADS = [
    (1, b""),
    (2, b"abc"),  # shorter than dim=8
    (3, b"x" * 7),
    (4, bytes(range(200))),  # > one raster row
    (5, (b"spark" * 600)[: RASTER_W * 3 + 17]),  # several rows + tail
    (6, b"q" * 1024 * 3),  # multiple frames
]


def _df(spark):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in PAYLOADS], "doc_id long, payload binary"
    )


def test_decode_features_matches_naive(spark):
    got = {
        r["doc_id"]: r["feature"]
        for r in decode_features(_df(spark), dim=8).collect()
    }
    for doc_id, b in PAYLOADS:
        n = len(b)
        want = []
        for j in range(8):
            lo, hi = (j * n) // 8, ((j + 1) * n) // 8
            want.append(sum(b[lo:hi]) / (hi - lo) if hi > lo else 0.0)
        assert got[doc_id] == want, doc_id


def test_resize_matches_naive(spark):
    got = {r["doc_id"]: r.asDict() for r in resize(_df(spark), 64, 64).collect()}
    for doc_id, b in PAYLOADS:
        n = len(b)
        h = max(1, (n + RASTER_W - 1) // RASTER_W)
        padded = b + b"\x00" * (h * RASTER_W - n)
        checksum = 0
        for y in range(64):
            sy = (y * h) // 64
            for x in range(64):
                sx = (x * RASTER_W) // 64
                checksum += padded[sy * RASTER_W + sx]
        r = got[doc_id]
        assert (r["src_len"], r["src_h"], r["checksum"]) == (n, h, checksum), doc_id


def test_frame_sample_matches_naive(spark):
    rows = frame_sample(_df(spark), chunk=1024, stride=2).collect()
    got = sorted((r["doc_id"], r["frame_idx"], r["frame_len"]) for r in rows)
    want = []
    for doc_id, b in PAYLOADS:
        n = len(b)
        n_frames = (n + 1023) // 1024
        for i in range(0, n_frames, 2):
            want.append((doc_id, i, min(1024, n - i * 1024)))
    assert got == sorted(want)
