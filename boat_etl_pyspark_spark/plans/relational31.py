"""Round-5 batch 15: cogrouped-pandas API surface (SURVEY.md §2.8/2.9
UDF + join families; no reference counterpart).

  * ``join_asof_cogrouped`` — the as-of join expressed through
    PySpark's cogrouped-map API (``groupBy().cogroup().applyInPandas``
    with a per-key ``pandas.merge_asof``): the one major pandas-UDF
    entry point the package did not yet exercise. Result-identical to
    the relational tagged-union form (``join_asof_purchase_last_view``)
    and checked against the SAME SQL oracle — engine-parity across a
    DataFrame plan, a pandas cogroup plan, and DuckDB is the
    strongest three-way pin of the as-of semantics. Scale posture:
    cogroup shuffles BOTH inputs on user_id once and hands each key's
    two frames to Arrow — per-key work is linear (merge_asof over
    sorted frames), but the relational form stays the default because
    it keeps the whole plan in codegen; this op exists to cover (and
    test) the API, and as the template for per-key logic that SQL
    genuinely cannot express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

_ASOF_COG_SCHEMA = (
    "purchase_id bigint, user_id bigint, purchase_ts_us bigint, "
    "last_view_ts_us bigint, gap_us bigint"
)


def _asof_merge(purchases: pd.DataFrame, views: pd.DataFrame) -> pd.DataFrame:
    """Per-user backward merge_asof: last view ts <= purchase ts
    (exact matches allowed — mirrors the views-sort-before-purchases
    tie rule of the relational form). Either side may be empty."""
    if not len(purchases):
        return pd.DataFrame(
            columns=[
                "purchase_id", "user_id", "purchase_ts_us",
                "last_view_ts_us", "gap_us",
            ]
        )
    p = purchases.sort_values("ts_us").reset_index(drop=True)
    if len(views):
        v = (
            views.sort_values("ts_us")
            .reset_index(drop=True)[["ts_us"]]
            .rename(columns={"ts_us": "last_view_ts_us"})
        )
        merged = pd.merge_asof(
            p,
            v,
            left_on="ts_us",
            right_on="last_view_ts_us",
            allow_exact_matches=True,
            direction="backward",
        )
    else:
        merged = p.assign(last_view_ts_us=pd.NA)
    out = pd.DataFrame(
        {
            "purchase_id": merged["event_id"].astype("Int64"),
            "user_id": merged["user_id"].astype("Int64"),
            "purchase_ts_us": merged["ts_us"].astype("Int64"),
            "last_view_ts_us": merged["last_view_ts_us"].astype("Int64"),
        }
    )
    out["gap_us"] = (out["purchase_ts_us"] - out["last_view_ts_us"]).astype(
        "Int64"
    )
    return out


def join_asof_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas``: purchases and views
    both shuffle once on user_id; each key's two Arrow frames meet in
    one ``merge_asof``. Identical output (and the identical SQL
    oracle) to the tagged-union window form — the three-way parity
    pin for the as-of semantics and the package's coverage of the
    cogrouped-map API. Scoped to the deterministic 1-in-7 user
    subset: cogroup invokes Python once PER KEY, so the full-corpus
    form costs key-count x interpreter round-trips for an operator
    whose job is API coverage, not throughput (measured 6.9s vs the
    window form's 0.3s at sf0.1 full-corpus — which is exactly WHY
    the relational form is the default)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
        & (F.col("user_id") % 7 == 0)
    )
    base = ev.select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    purchases = base.where("event_type = 'purchase'").drop("event_type")
    views = base.where("event_type = 'view'").drop("event_type")
    return (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(_asof_merge, schema=_ASOF_COG_SCHEMA)
    )


# Identical semantics to _JOIN_ASOF_SQL (relational.py) — restated
# under this op's name so the driver pairs it independently.
_ASOF_COG_SQL = """
WITH t AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS kind
  FROM events
  WHERE event_type IN ('view', 'purchase') AND user_id % 7 = 0
), m AS (
  SELECT *,
         MAX(CASE WHEN kind = 0 THEN ts END) OVER (
           PARTITION BY user_id
           ORDER BY ts, kind, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS last_view_ts
  FROM t
)
SELECT event_id AS purchase_id,
       user_id,
       epoch_us(ts) AS purchase_ts_us,
       epoch_us(last_view_ts) AS last_view_ts_us,
       epoch_us(ts) - epoch_us(last_view_ts) AS gap_us
FROM m WHERE kind = 1
"""


QUERIES = {
    "join_asof_cogrouped": join_asof_cogrouped,
}

ORACLE = {
    "join_asof_cogrouped": _ASOF_COG_SQL,
}
