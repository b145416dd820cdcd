"""Oracle-checked queries for the multimodal binary operators.

The payloads are UTF-8 bytes of ``documents.text`` (stand-in for real
image/audio columns); the DuckDB oracle reproduces the byte math via
``hex(encode(text))`` so the checks hold for any byte content. The
decode/resize/feature steps are real pure-numpy raster math (see
``operators.multimodal``) — nothing in the checked path is stubbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_binary,
    binary_metadata,
    decode_features,
    frame_sample,
)
from ..sources.readers import load_table


def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return binary_metadata(attach_binary(docs))


_META_SQL = """
WITH b AS (
  SELECT doc_id, octet_length(encode(text)) AS byte_len, hex(encode(text)) AS hx
  FROM documents
)
SELECT doc_id, byte_len,
       (['image', 'audio', 'video', 'blob'])[byte_len % 4 + 1] AS kind,
       CAST(list_sum(list_transform(range(0, byte_len),
                i -> CAST(concat('0x', substring(hx, i * 2 + 1, 2)) AS BIGINT)))
         % 1000003 AS BIGINT) AS checksum
FROM b
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_binary(docs), chunk=1024, stride=2)


_FRAME_SQL = """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
f AS (
  SELECT doc_id, n,
         unnest(range(0, CAST((n + 1023) // 1024 AS BIGINT), 2)) AS frame_idx
  FROM b
)
SELECT doc_id, frame_idx,
       least(1024, n - frame_idx * 1024) AS frame_len
FROM f
"""


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = decode_features(attach_binary(docs), dim=8)
    return feats.select(
        "doc_id", F.posexplode("feature").alias("j", "value")
    )


# band j of a payload covers byte indexes [j*n//8, (j+1)*n//8); the
# feature is the band's mean byte value (0.0 for an empty band)
_FEATURES_SQL = """
WITH b AS (
  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hx
  FROM documents
),
e AS (SELECT doc_id, n, hx, unnest(range(0, 8)) AS j FROM b),
s AS (
  SELECT doc_id, CAST(j AS INT) AS j, hx,
         (j * n) // 8 AS lo, ((j + 1) * n) // 8 AS hi
  FROM e
)
SELECT doc_id, j,
       CASE WHEN hi > lo THEN
         CAST(list_sum(list_transform(range(lo, hi),
              i -> CAST(concat('0x', substring(hx, CAST(i * 2 + 1 AS INT), 2)) AS BIGINT)))
           AS DOUBLE) / (hi - lo)
       ELSE 0.0 END AS value
FROM s
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize

    docs = load_table(spark, sf_dir, "documents")
    return resize(attach_binary(docs), out_w=64, out_h=64)


# real nearest-neighbor resample of the stride-128 raster decode:
# output cell (x, y) reads source pixel (sy, sx) with sy=(y*h)//64,
# sx=(x*128)//64, byte index sy*128+sx (zero beyond the payload —
# the padded tail row); checksum = sum of the 64x64 resampled bytes
_RESIZE_SQL = """
WITH b AS (
  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hx
  FROM documents
),
d AS (SELECT doc_id, n, hx, greatest(1, (n + 127) // 128) AS h FROM b)
SELECT doc_id,
       n AS src_len,
       CAST(128 AS INT) AS src_w,
       CAST(h AS INT) AS src_h,
       CAST(64 AS INT) AS out_w,
       CAST(64 AS INT) AS out_h,
       CAST(list_sum(list_transform(range(0, 64 * 64),
            c -> CASE WHEN ((c // 64) * h) // 64 * 128 + ((c % 64) * 128) // 64 < n
                 THEN CAST(concat('0x', substring(hx,
                      CAST((((c // 64) * h) // 64 * 128 + ((c % 64) * 128) // 64) * 2 + 1 AS INT),
                      2)) AS BIGINT)
                 ELSE 0 END)) AS BIGINT) AS checksum
FROM d
"""


QUERIES = {
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_resize": multimodal_resize,
}

ORACLE = {
    "multimodal_binary_meta": _META_SQL,
    "multimodal_frame_sample": _FRAME_SQL,
    "multimodal_decode_features": _FEATURES_SQL,
    "multimodal_resize": _RESIZE_SQL,
}
