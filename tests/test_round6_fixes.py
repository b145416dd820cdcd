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


def test_fisher_tie_eps_separates_ties_from_gaps_at_large_marginals():
    """Round-7 verdict item 8 (round-6 ADVICE residual): the 1e-9 tie
    epsilon's adequacy was ASSERTED in the relational50.py comment
    ("~4 orders above accumulated float error, ~3 orders below the
    smallest genuinely-distinct gap") but never tested for very large
    marginals. Pin both sides of the band with exact integer
    hypergeometric weights (math.comb): pmf values are EXACT ties iff
    their integer weights C(c1,k)·C(n-c1,r1-k) are equal, so every
    pair is classifiable without any float ambiguity. Swept up to
    n=1000 (the query's own domain is a few hundred rows; beyond ~1e6
    the docstring already mandates the normal approximation)."""
    from math import comb, log

    worst_tie_err = 0.0
    smallest_genuine_gap = float("inf")
    for n in (100, 400, 600, 1000):
        # near-symmetric marginals minimize the genuine gap and
        # maximize exact-tie incidence — the hostile corner
        for r1, c1 in ((n // 2, n // 2), (n // 2 - 1, n // 2 + 1),
                       (n // 3, 2 * n // 3)):
            kmin, kmax = max(0, r1 + c1 - n), min(r1, c1)
            weights = {
                k: comb(c1, k) * comb(n - c1, r1 - k)
                for k in range(kmin, kmax + 1)
            }
            # float lnpmf exactly as the SQL computes it: independent
            # ln() cumsum lookups, so the error model matches
            lf = [0.0, 0.0]
            for i in range(2, n + 1):
                lf.append(lf[-1] + log(float(i)))
            lnconst = lf[r1] + lf[n - r1] + lf[c1] + lf[n - c1] - lf[n]
            lnpmf = {
                k: lnconst - lf[k] - lf[r1 - k] - lf[c1 - k]
                - lf[n - r1 - c1 + k]
                for k in weights
            }
            ks = sorted(weights)
            for i, a in enumerate(ks):
                for b in ks[i + 1 :]:
                    d = abs(lnpmf[a] - lnpmf[b])
                    if weights[a] == weights[b]:
                        worst_tie_err = max(worst_tie_err, d)
                    else:
                        smallest_genuine_gap = min(smallest_genuine_gap, d)
    # exact ties must land INSIDE the guard with >=2 orders of margin
    assert worst_tie_err < 1e-11, worst_tie_err
    # genuine gaps must land OUTSIDE it with >=3 orders of margin
    # (measured: 3.2e-5 at n=1000, shrinking roughly as 1/n — the
    # epsilon has >=4 orders of headroom across the supported domain)
    assert smallest_genuine_gap > 1e-6, smallest_genuine_gap


def test_table_checksum_is_mod_bounded(spark):
    """checksum_sum must be the post-sum modulus (DECIMAL accumulate
    then % 1e9+7), never the raw residue sum — the raw sum wraps
    int64 past ~9e9 rows."""
    import __spark_entry__ as m

    row = m.queries()["validate_table_checksum"](spark, SF_SMOKE).toPandas().iloc[0]
    assert 0 <= row.checksum_sum < 1_000_000_007
    assert row.n_rows > 0
