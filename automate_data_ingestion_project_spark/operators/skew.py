"""Skew-handling operators: salted aggregation and salted broadcast-side
replication join (SURVEY.md §7 Phase 5 scale notes; AQE's skew-join
handles sort-merge skew automatically, these cover the shapes it
doesn't).

Salted two-phase aggregation — for low-cardinality/hot group keys
(e.g. ``top3_orders_per_priority``'s 5-value partition key, the
canonical 100 TB skew shape):

    phase 1: groupBy(key, salt = crc32(id) % N)  → N× the parallelism,
             partial results per (key, salt);
    phase 2: groupBy(key) over the N partials    → tiny reduce.

Works for any algebraic aggregate (sum/count/min/max — pass the
re-combination explicitly).

Salted join — replicates the SMALL side N× with an exploded salt column
so a hot key on the big side spreads over N tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_col: str, n_salts: int, name: str = "_salt") -> DataFrame:
    """Deterministic salt from an existing id column (crc32 % n) — no
    rand(), so retries/replays are stable."""
    return df.withColumn(
        name, (F.crc32(F.col(id_col).cast("string")) % n_salts).cast("int")
    )


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof sum+count per group: (group, sum, count)."""
    salted = with_salt(df, id_col, n_salts)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.sum(value_col).alias("_s"), F.count("*").alias("_c")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_s").alias(f"sum_{value_col}"),
        F.sum("_c").cast("long").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: big rows get a deterministic
    salt, the small side is replicated across all salts, and the join key
    becomes (key, salt) — a hot key's rows land on n_salts tasks.

    ``salt_from`` must be a big-side column whose values VARY WITHIN a
    join key (a row id, not the key itself) — salting from the key would
    send every row of a hot key to the same salt and change nothing.

    Cost: small side shuffles n_salts× (or broadcasts once) — the
    standard trade for unblocking a straggler task."""
    big_s = with_salt(big, salt_from, n_salts)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
