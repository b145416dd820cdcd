"""Hostile-row builder for the TPC-H-ish relational tables.

The round-9 discovery probe (COVERAGE.md "Round-9 discovery probe")
appended domain-edge rows to orders/lineitem/customer/supplier/part
(and nation/region) and bisected every divergence to one table and one
row. This module is the PERMANENT, committed form of that fixture: one
deterministic hostile-row catalog per table, shared by the relational
hostile net (tests/test_relational_hostile_net.py) and the probe tool
(tools/hostile_probe.py), so every layer-2 fix lands WITH the row that
reproduces its divergence and stays pinned forever.

Row classes, mirroring the probe catalog:

* money: NULL / NaN / +Inf / -Inf / negative / absurd-but-TRY_CAST-
  castable 9.21e16 dollars (cents 9.21e18 — just inside INT64, so any
  multiplication overflows: DuckDB throws, Spark wraps). The ingest
  contract (plans/contract.py money domain |x| <= 1e12) must null
  these out identically in both engines BEFORE arithmetic.
* quantity: NULL / negative / 1e15 (the data contract documents
  l_quantity in [1, 50]).
* rates: NULL / negative / > 1 discount and tax.
* keys: duplicate primary keys, orphan and NULL foreign keys.
* enums: NULL and unknown status/flag/segment/priority values.
* dates: NULL and the int64-nanos domain edges (1677/2262).

Keys for NEW hostile entities start at 90_000_000 so they can never
collide with generated fixture keys at any committed SF; deliberate
duplicates copy a LOW key that exists at every SF (the generators
emit contiguous keys from 1).
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: 9.21e16 dollars -> 9.21e18 cents: TRY_CAST-castable (INT64 max is
#: ~9.223e18) but any product with a multiplier >= 2 overflows.
ABSURD_MONEY = 9.21e16

_DATE_LO = np.datetime64("1677-09-22T00:12:43.145224", "us")
_DATE_HI = np.datetime64("2262-04-11T23:47:16.854775", "us")
_DATE_MID = np.datetime64("2024-03-03T00:00:00.000000", "us")

K = 90_000_000  # hostile-entity key base


def _col(vals, typ):
    return pa.array(vals, typ)


def hostile_orders() -> pa.Table:
    """14 hostile order rows (keys K..; one duplicate of o_orderkey=1)."""
    n = 14
    price = [
        float("nan"), float("inf"), float("-inf"), ABSURD_MONEY,
        -ABSURD_MONEY, -12345.67, None, 424242.42, 1.5, 2.5,
        100.0, 100.0, 100.0, 77777.77,
    ]
    status = ["O", "F", "P", "X", None, "O", "F", "O", "F", "P",
              None, "O", "F", "O"]
    dates = [
        _DATE_MID, _DATE_MID, _DATE_MID, _DATE_MID, _DATE_MID, _DATE_MID,
        _DATE_MID, None, _DATE_LO, _DATE_HI, _DATE_MID, _DATE_MID,
        _DATE_MID, _DATE_MID,
    ]
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
            None, "9-BOGUS", "1-URGENT", "2-HIGH"]
    cust = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, None, K + 999_999, 12]
    keys = [K + i for i in range(n - 1)] + [1]  # last row: DUPLICATE pk
    return pa.table({
        "o_orderkey": _col(keys, pa.int64()),
        "o_custkey": _col(cust, pa.int64()),
        "o_orderstatus": _col(status, pa.string()),
        "o_totalprice": _col(price, pa.float64()),
        "o_orderdate": _col(dates, pa.timestamp("us")),
        "o_orderpriority": _col(prio, pa.string()),
    })


def hostile_lineitem() -> pa.Table:
    """16 hostile lineitem rows; last duplicates (l_orderkey=1, line 1)."""
    n = 16
    price = [
        float("nan"), float("inf"), float("-inf"), ABSURD_MONEY,
        -ABSURD_MONEY, None, -999.99, 1234.56, 10.0, 20.0, 30.0,
        40.0, 50.0, 60.0, 70.0, 80.0,
    ]
    qty = [
        10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0, None, 1.0e15, -5.0,
        0.25, 10.0, 10.0, 10.0, 10.0, 10.0,
    ]
    disc = [0.05] * 8 + [None, -0.5, 1.5, 0.05, 0.05, 0.05, 0.05, 0.05]
    tax = [0.02] * 11 + [None, -0.3, 1.2, 0.02, 0.02]
    rflag = ["N"] * 13 + [None, "Z", "N"]
    lstat = ["O"] * 14 + [None, "O"]
    dates = [_DATE_MID] * 9 + [None, _DATE_LO, _DATE_HI] + [_DATE_MID] * 4
    okeys = [K + i for i in range(n - 3)] + [K + 999_999, None, 1]
    pkeys = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, K + 999_999, None,
             13, 14]
    skeys = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, K + 999_999, None, 1, 2, 3, 4]
    return pa.table({
        "l_orderkey": _col(okeys, pa.int64()),
        "l_partkey": _col(pkeys, pa.int64()),
        "l_suppkey": _col(skeys, pa.int64()),
        "l_linenumber": _col([1] * n, pa.int32()),
        "l_quantity": _col(qty, pa.float64()),
        "l_extendedprice": _col(price, pa.float64()),
        "l_discount": _col(disc, pa.float64()),
        "l_tax": _col(tax, pa.float64()),
        "l_returnflag": _col(rflag, pa.string()),
        "l_linestatus": _col(lstat, pa.string()),
        "l_shipdate": _col(dates, pa.timestamp("us")),
    })


def hostile_customer() -> pa.Table:
    """12 hostile customer rows; last duplicates c_custkey=1."""
    n = 12
    bal = [
        float("nan"), float("inf"), float("-inf"), ABSURD_MONEY,
        -ABSURD_MONEY, None, -1000.0, 555.55, 1.0, 2.0, 3.0, 999.0,
    ]
    seg = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
           "MACHINERY", "AUTOMOBILE", "BUILDING", None, "BOGUSSEG",
           "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    nk = [0, 1, 2, 3, 4, 5, 6, 7, None, 99_999, 8, 9]
    names = [f"Customer#{K + i}" for i in range(n - 2)] + [None,
                                                           "Customer#dup"]
    keys = [K + i for i in range(n - 1)] + [1]
    return pa.table({
        "c_custkey": _col(keys, pa.int64()),
        "c_name": _col(names, pa.string()),
        "c_nationkey": _col(nk, pa.int32()),
        "c_acctbal": _col(bal, pa.float64()),
        "c_mktsegment": _col(seg, pa.string()),
    })


def hostile_supplier() -> pa.Table:
    """8 hostile supplier rows; last duplicates s_suppkey=1."""
    n = 8
    bal = [float("nan"), float("inf"), float("-inf"), ABSURD_MONEY,
           None, -500.0, 123.45, 999.0]
    nk = [0, 1, 2, None, 99_999, 3, 4, 5]
    names = [f"Supplier#{K + i}" for i in range(n - 2)] + [None,
                                                           "Supplier#dup"]
    keys = [K + i for i in range(n - 1)] + [1]
    return pa.table({
        "s_suppkey": _col(keys, pa.int64()),
        "s_name": _col(names, pa.string()),
        "s_nationkey": _col(nk, pa.int32()),
        "s_acctbal": _col(bal, pa.float64()),
    })


def hostile_part() -> pa.Table:
    """10 hostile part rows; last duplicates p_partkey=1."""
    n = 10
    price = [float("nan"), float("inf"), float("-inf"), ABSURD_MONEY,
             None, -77.0, 88.88, 1.0, 2.0, 999.0]
    brand = ["Brand#1", "Brand#2", None, "Brand#3", "Brand#4", "Brand#5",
             None, "Brand#1", "Brand#2", "Brand#3"]
    ptype = ["STANDARD BRUSHED TIN", None, "SMALL PLATED COPPER",
             "PROMO BURNISHED NICKEL", None, "ECONOMY POLISHED STEEL",
             None, "STANDARD BRUSHED TIN", "PROMO PLATED BRASS",
             "MEDIUM BURNISHED COPPER"]
    names = [f"hostile part {i}" for i in range(n - 2)] + [None,
                                                           "dup part"]
    size = [1, 5, None, -3, 50, 7, 9, 11, 13, 15]
    keys = [K + i for i in range(n - 1)] + [1]
    return pa.table({
        "p_partkey": _col(keys, pa.int64()),
        "p_name": _col(names, pa.string()),
        "p_brand": _col(brand, pa.string()),
        "p_type": _col(ptype, pa.string()),
        "p_size": _col(size, pa.int32()),
        "p_retailprice": _col(price, pa.float64()),
    })


def hostile_nation() -> pa.Table:
    """5 hostile nation rows; last duplicates n_nationkey=0."""
    keys = [K + 0, K + 1, K + 2, K + 3, 0]
    names = ["HOSTILIA", None, "ORPHANIA", "NULLANDIA", "DUPLANDIA"]
    rk = [0, 1, 99_999, None, 1]
    return pa.table({
        "n_nationkey": _col(keys, pa.int32()),
        "n_name": _col(names, pa.string()),
        "n_regionkey": _col(rk, pa.int32()),
    })


def hostile_region() -> pa.Table:
    """3 hostile region rows; last duplicates r_regionkey=0."""
    return pa.table({
        "r_regionkey": _col([K + 0, K + 1, 0], pa.int32()),
        "r_name": _col(["HOSTILE REGION", None, "DUP REGION"], pa.string()),
    })


HOSTILE_BUILDERS = {
    "orders": hostile_orders,
    "lineitem": hostile_lineitem,
    "customer": hostile_customer,
    "supplier": hostile_supplier,
    "part": hostile_part,
    "nation": hostile_nation,
    "region": hostile_region,
}


def build_hostile_dir(src_dir: str, dst_dir: str,
                      tables: tuple[str, ...] = tuple(HOSTILE_BUILDERS)):
    """Copy ``src_dir``'s parquet fixture into ``dst_dir`` appending
    the hostile catalog rows to every table in ``tables`` (others are
    copied verbatim). int32 key columns stay int32: pyarrow raises on
    silent overflow, and K fits int32."""
    os.makedirs(dst_dir, exist_ok=True)
    for p in glob.glob(os.path.join(src_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        out = os.path.join(dst_dir, os.path.basename(p))
        if name not in tables or name not in HOSTILE_BUILDERS:
            shutil.copy(p, out)
            continue
        real = pq.read_table(p)
        extra = HOSTILE_BUILDERS[name]()
        extra = extra.select(real.column_names).cast(real.schema)
        pq.write_table(pa.concat_tables([real, extra]), out, version="2.6")
    return dst_dir
