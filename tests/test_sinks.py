"""Sink/source coverage: partitioned parquet with partition pruning,
bucketed tables with shuffle-free joins, CSV/JSON round-trips. These
are the write-side halves of the 100 TB story — a partition layout
that can't prune or a join that re-shuffles bucketed data defeats the
point of writing it that way."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from boat_etl_pyspark_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_partitioned_write_prunes(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("order_year").parquet(out)

    back = spark.read.parquet(out).where(F.col("order_year") == 1997)
    plan = plan_of(back)
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters", 1)[1][:200]
    expected = orders.where(F.col("order_year") == 1997).count()
    assert back.count() == expected > 0


def test_bucketed_join_avoids_shuffle(spark):
    import shutil

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # in-memory catalog: a previous session's table dir survives
        # the (no-op) DROP, so clear the location too
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    # merge hint: at fixture scale AQE would broadcast instead and
    # never exercise the bucketed path a fact-fact join relies on
    joined = spark.table("b_orders").hint("merge").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = plan_of(joined, "simple")
    # co-bucketed sort-merge: no shuffle exchange on either side
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan
    assert joined.count() == li.count()


def test_csv_json_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF_SMOKE, "nation")
    csv_path = str(tmp_path / "nation_csv")
    json_path = str(tmp_path / "nation_json")
    nation.write.mode("overwrite").option("header", True).csv(csv_path)
    nation.write.mode("overwrite").json(json_path)

    csv_back = (
        spark.read.option("header", True)
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(csv_path)
    )
    json_back = spark.read.schema(
        "n_nationkey INT, n_name STRING, n_regionkey INT"
    ).json(json_path)
    orig = sorted(map(tuple, nation.collect()))
    assert sorted(map(tuple, csv_back.collect())) == orig
    assert sorted(map(tuple, json_back.collect())) == orig
