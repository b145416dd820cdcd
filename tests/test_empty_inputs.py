"""Degenerate-input robustness: every contract query must execute
(not crash) against schema-identical but EMPTY tables — the shape of
a fresh partition, a fully-filtered scan, or a cold-start stream.
Empty inputs flush out driver-side .collect()[0] assumptions, window
frames over nothing, and divide-by-zero in ratio queries."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    for p in glob.glob(os.path.join(SRC, "*.parquet")):
        table = pq.read_table(p).slice(0, 0)
        pq.write_table(table, os.path.join(d, os.path.basename(p)), version="2.6")
    return d


def all_query_names():
    import __spark_entry__ as m

    return sorted(m.queries())


@pytest.mark.parametrize("name", all_query_names())
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    import __spark_entry__ as m

    df = m.queries()[name](spark, empty_sf_dir)
    rows = df.collect()
    assert isinstance(rows, list)  # executed without raising
