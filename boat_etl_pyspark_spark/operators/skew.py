"""Skew-mitigation recipes (SURVEY.md §7 Phase 3).

AQE's skew-join splitting handles sort-merge joins automatically
(enabled in session defaults), but two shapes still need explicit
salting at 100 TB:

  * aggregation on a skewed key (one reducer owns the hot key), and
  * a shuffled join where one side's hot key overwhelms a partition
    and AQE's split heuristics don't fire (e.g. aggregate-below-join).

Both helpers are deterministic (salt = pmod(hash(...), S), no rand())
so results remain reproducible run to run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_by_key(df: DataFrame, key: str, salts: int = 16) -> DataFrame:
    """Two-stage count on a skewed key: partial count on (key, salt)
    spreads the hot key over ``salts`` reducers, then a cheap final
    combine on key. Same result as ``groupBy(key).count()``."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").alias("count"))


def salted_join_big_skewed(
    big: DataFrame, small: DataFrame, big_key: str, small_key: str, salts: int = 16
) -> DataFrame:
    """Join a skewed big side against a small side by replicating the
    small side ``salts`` times and salting the big side's key: the hot
    key's rows land on ``salts`` different partitions instead of one.
    Result equals ``big.join(small, big[big_key] == small[small_key])``.
    """
    salt_values = F.explode(
        F.sequence(F.lit(0), F.lit(salts - 1))
    )
    small_rep = small.withColumn("__salt", salt_values)
    big_salted = big.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salts))
    )
    return (
        big_salted.join(
            small_rep,
            (big_salted[big_key] == small_rep[small_key])
            & (big_salted["__salt"] == small_rep["__salt"]),
        )
        .drop("__salt")
    )


def skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Key-distribution diagnostic: top-N heaviest keys with their
    share of total rows — the number you look at before choosing a
    salt factor."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n")).collect()[0][0]
    return (
        counts.withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.desc("n"), F.asc(key))
        .limit(top)
    )
