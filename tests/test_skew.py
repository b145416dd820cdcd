"""Salting recipes must be result-equivalent to their naive forms and
actually spread the hot key across reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from boat_etl_pyspark_spark.operators.skew import (
    salted_count_by_key,
    salted_join_big_skewed,
    skew_profile,
)
from boat_etl_pyspark_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_salted_count_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {
        (r["l_returnflag"], r["count"])
        for r in li.groupBy("l_returnflag").count().collect()
    }
    salted = {
        (r["l_returnflag"], r["count"])
        for r in salted_count_by_key(li, "l_returnflag", salts=16).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    sup = load_table(spark, SF_SMOKE, "supplier")
    plain = li.join(sup, li.l_suppkey == sup.s_suppkey).count()
    salted = salted_join_big_skewed(li, sup, "l_suppkey", "s_suppkey", salts=8)
    assert salted.count() == plain
    # replicated small side: every salt bucket carries the hot key
    per_salt = (
        li.withColumn(
            "__salt", F.pmod(F.hash(*[F.col(c) for c in li.columns]), F.lit(8))
        )
        .groupBy("__salt")
        .count()
    )
    assert per_salt.count() == 8  # hot rows actually spread over 8 buckets


def test_skew_profile_orders_by_weight(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    prof = skew_profile(orders, "o_orderstatus", top=3).collect()
    assert len(prof) == 3
    assert prof[0]["n"] >= prof[1]["n"] >= prof[2]["n"]
    assert abs(sum(r["share"] for r in prof) - 1.0) < 1e-9  # 3 statuses = all rows
