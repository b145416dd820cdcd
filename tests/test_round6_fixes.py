"""Round-6 hardening regressions (ADVICE.md items): Fisher exact on
near-symmetric marginals must agree between engines despite exact pmf
ties; the table checksum must stay mod-bounded (DECIMAL accumulate,
modulus re-applied after the sum); community modularity's DECIMAL
numerator path must still match pure-Python exact integers."""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE
from tests.test_oracle_parity import frames_equal


def _part_table(n: int, r1: int, c1: int, k_obs: int) -> pa.Table:
    """A part table whose p_size<=3 slice realizes the 2x2 table
    (n, r1, c1, k_obs): r1 rows Brand#1*, c1 rows SMALL*, k_obs in
    the intersection."""
    assert k_obs <= min(r1, c1) and r1 + c1 - k_obs <= n
    brands, types = [], []
    for i in range(n):
        in_r1 = i < r1
        # first k_obs of the Brand#1 block are SMALL; the remaining
        # c1 - k_obs SMALL rows come from the Brand#2 block
        in_c1 = (i < k_obs) or (r1 <= i < r1 + (c1 - k_obs))
        brands.append("Brand#13" if in_r1 else "Brand#23")
        types.append("SMALL PLATED TIN" if in_c1 else "LARGE POLISHED TIN")
    return pa.table(
        {
            "p_partkey": pa.array(range(1, n + 1), pa.int64()),
            "p_name": pa.array([f"part {i}" for i in range(n)]),
            "p_brand": pa.array(brands),
            "p_type": pa.array(types),
            "p_size": pa.array([1] * n, pa.int32()),
            "p_retailprice": pa.array([100.0 + i for i in range(n)]),
        }
    )


# (n, r1, c1, k_obs): symmetric marginals r1 == c1 and complementary
# marginals r1 + c1 == n — both produce EXACT hypergeometric pmf ties,
# the regime where a raw double compare could flip n_more_extreme
# between JVM Math.log and libm (ADVICE.md, relational50.py tie guard).
_TIE_TABLES = [
    (20, 10, 10, 5),
    (20, 8, 8, 3),
    (24, 10, 14, 6),
    (30, 15, 15, 7),
]


@pytest.mark.parametrize("n,r1,c1,k_obs", _TIE_TABLES)
def test_fisher_exact_symmetric_marginals_parity(
    spark, oracle, tmp_path_factory, n, r1, c1, k_obs
):
    import __spark_entry__ as m

    d = str(tmp_path_factory.mktemp(f"fisher_{n}_{r1}_{c1}_{k_obs}"))
    pq.write_table(_part_table(n, r1, c1, k_obs), os.path.join(d, "part.parquet"))

    spark_pd = m.queries()["agg_fisher_exact"](spark, d).toPandas()
    con = oracle(d)
    oracle_pd = con.execute(m.oracle_sql()["agg_fisher_exact"]).fetchdf()
    problems = frames_equal(spark_pd, oracle_pd)
    assert not problems, "; ".join(problems)

    # third implementation with the same tie guard
    lf = [0.0, 0.0]
    for i in range(2, n + 1):
        lf.append(lf[-1] + math.log(float(i)))
    lnconst = lf[r1] + lf[n - r1] + lf[c1] + lf[n - c1] - lf[n]
    kmin, kmax = max(0, r1 + c1 - n), min(r1, c1)
    lnpmf = {
        k: lnconst - lf[k] - lf[r1 - k] - lf[c1 - k] - lf[n - r1 - c1 + k]
        for k in range(kmin, kmax + 1)
    }
    obs = lnpmf[k_obs]
    n_extreme = sum(1 for v in lnpmf.values() if v <= obs + 1e-9)
    row = spark_pd.iloc[0]
    assert (row.n, row.r1, row.c1, row.k_obs) == (n, r1, c1, k_obs)
    assert row.n_more_extreme == n_extreme
    # every table whose pmf exactly ties the observed one must be
    # counted as extreme — the guarantee the tie guard exists for
    ties = [k for k, v in lnpmf.items() if k != k_obs and abs(v - obs) <= 1e-9]
    assert row.n_more_extreme >= 1 + len(ties)


def test_table_checksum_is_mod_bounded(spark):
    """checksum_sum must be the post-sum modulus (DECIMAL accumulate
    then % 1e9+7), never the raw residue sum — the raw sum wraps
    int64 past ~9e9 rows."""
    import __spark_entry__ as m

    row = m.queries()["validate_table_checksum"](spark, SF_SMOKE).toPandas().iloc[0]
    assert 0 <= row.checksum_sum < 1_000_000_007
    assert row.n_rows > 0
