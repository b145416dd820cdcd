"""The generic operator API must reproduce the results of the
contract queries that instantiate the same patterns."""

from __future__ import annotations

from pyspark.sql import functions as F

from boat_etl_pyspark_spark.operators.library import (
    asof_join,
    sessionize,
    topk_per_group,
)
from boat_etl_pyspark_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_asof_join_matches_contract_query(spark):
    import __spark_entry__ as m

    ev = load_table(spark, SF_SMOKE, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    views = ev.where(F.col("event_type") == "view")
    lib = asof_join(purchases, views, by="user_id", left_ts="ts", right_ts="ts")
    got = {
        (r["event_id"], r["asof_ts"] and int(r["asof_ts"].timestamp() * 1e6))
        for r in lib.select("event_id", "asof_ts").collect()
    }
    want = {
        (r["purchase_id"], r["last_view_ts_us"])
        for r in m.queries()["join_asof_purchase_last_view"](spark, SF_SMOKE).collect()
    }
    assert got == want


def test_asof_join_duplicate_left_keys_not_multiplied(spark):
    # Regression: duplicate (by, left_ts) left rows used to be rejoined
    # on (key, ts) equality, multiplying N dups into N^2 output rows.
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (1, 10, "c"), (2, 5, "d")],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 7, 100), (1, 9, 200), (2, 9, 300)], "k int, ts int, v int"
    )
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="ts", value_cols=["v"])
    rows = sorted((r["k"], r["ts"], r["tag"], r["asof_v"]) for r in out.collect())
    assert rows == [
        (1, 10, "a", 200),
        (1, 10, "b", 200),
        (1, 10, "c", 200),
        (2, 5, "d", None),
    ]


def test_topk_matches_contract_query(spark):
    import __spark_entry__ as m

    orders = load_table(spark, SF_SMOKE, "orders")
    lib = topk_per_group(
        orders, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
    )
    got = {(r["o_custkey"], r["o_orderkey"]) for r in lib.collect()}
    want = {
        (r["o_custkey"], r["o_orderkey"])
        for r in m.queries()["window_topk_orders_per_customer"](spark, SF_SMOKE).collect()
    }
    assert got == want


def test_sessionize_matches_streaming_session_windows(spark):
    import __spark_entry__ as m

    ev = load_table(spark, SF_SMOKE, "events")
    sess = sessionize(ev, key="user_id", ts="ts", gap_seconds=30 * 60)
    lib = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start_us", "n_events")
    )
    got = sorted(map(tuple, lib.collect()))
    want = sorted(
        (r["user_id"], r["session_start_us"], r["n_events"])
        for r in m.queries()["stream_session_windows"](spark, SF_SMOKE).collect()
    )
    assert got == want


def test_locf_fill_matches_contract_query(spark):
    import __spark_entry__ as m

    from boat_etl_pyspark_spark.operators.library import locf_fill

    ev = load_table(spark, SF_SMOKE, "events")
    masked = ev.select(
        "event_id",
        "user_id",
        F.col("ts").alias("ts_us"),
        F.when(F.col("event_type") != "click", F.col("value")).alias("v"),
    )
    lib = locf_fill(masked, key="user_id", order_by=["ts_us", "event_id"], value="v")
    got = sorted(
        (r["event_id"], r["v_filled"]) for r in lib.collect()
    )
    want = sorted(
        (r["event_id"], r["filled"])
        for r in m.queries()["window_locf_fill"](spark, SF_SMOKE).collect()
    )
    assert got == want


def test_pack_sequences_matches_contract_query(spark):
    import __spark_entry__ as m

    from boat_etl_pyspark_spark.operators.library import pack_sequences

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    lib = pack_sequences(
        docs, stream_col="lang", order_col="doc_id", token_col="n_tok", budget=512
    )
    agg = lib.groupBy("lang", "seq_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    got = sorted(map(tuple, agg.collect()))
    want = sorted(
        (r["lang"], r["seq_id"], r["n_docs"], r["n_tokens"])
        for r in m.queries()["curate_pack_sequences"](spark, SF_SMOKE).collect()
    )
    assert got == want


def test_global_rank_matches_window_row_number(spark):
    from boat_etl_pyspark_spark.operators.library import global_rank

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    lib = {
        (r["o_orderkey"], r["rank"])
        for r in global_rank(
            orders, ["o_totalprice", "o_orderkey"], partitions=7
        ).collect()
    }
    from pyspark.sql import Window

    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        (r["o_orderkey"], r["rank"])
        for r in orders.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert lib == want


def test_salted_join_matches_plain_join(spark):
    from boat_etl_pyspark_spark.operators.library import salted_join

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lib = sorted(
        map(
            tuple,
            salted_join(
                li, orders, "l_orderkey", "o_orderkey", salt=4,
                left_salt_col="l_linenumber",
            ).collect(),
        )
    )
    plain = sorted(
        map(
            tuple,
            li.join(orders, li.l_orderkey == orders.o_orderkey).collect(),
        )
    )
    assert lib == plain


def test_salted_join_default_salt_spreads_hot_key(spark):
    # one hot key, default (row-varying) salt: every salt value must
    # receive some of the hot key's rows — the property a key-derived
    # salt would break
    from boat_etl_pyspark_spark.operators.library import salted_join

    left = spark.range(0, 400).select(F.lit(1).alias("k"), "id")
    right = spark.createDataFrame([(1, "x")], "k2 int, v string")
    joined = salted_join(left, right, "k", "k2", salt=4)
    assert joined.count() == 400
    n_salts = (
        left.withColumn(
            "s", F.pmod(F.monotonically_increasing_id(), F.lit(4))
        )
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts > 1
