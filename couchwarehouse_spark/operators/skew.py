"""Skew handling: salted two-phase aggregation and salted joins.

When a shuffle key has few (or heavy-hitter) values, all rows for a
hot key land on one reducer regardless of cluster size. AQE's skew
join split (enabled in session.py) handles the join case at runtime;
salting is the explicit, planner-independent technique for both aggs
and joins — mandated scale equipment (SURVEY.md / BASELINE north
star "salting for skew").

* ``salted_aggregate`` — phase 1 groups by (key, salt) spreading each
  hot key over N reducers; phase 2 merges the N partials. Works for
  any algebraic aggregate (sum/count/min/max; avg = sum+count).
* ``salted_join`` — replicate the small side N× (one copy per salt),
  salt the big side uniformly, join on (key, salt): each hot key's
  rows split across N tasks. The small side must tolerate N×
  replication (it's the broadcast side's generalization when the big
  side is too skewed even for broadcast-hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_cw_salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Uniform random salt in [0, n_salts) — deterministic per row via
    a hash of the whole row rather than rand() so replays/retries of a
    task salt identically (rand() breaks retry idempotence)."""
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int"),
    )


def salted_aggregate(
    df: DataFrame,
    key: str | Column,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 shuffles on (key, salt) — the hot
    key spreads over ``n_salts`` reducers; phase 2 shuffles n_salts
    rows per key — trivial.
    """
    phase1_exprs = []
    phase2_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(out))
            phase2_exprs.append(F.sum(out).alias(out))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(out))
            phase2_exprs.append(F.sum(out).alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(out))
            phase2_exprs.append(F.min(out).alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(out))
            phase2_exprs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}; decompose it first")
    keyed = df.select(
        (F.col(key) if isinstance(key, str) else key).alias("_cw_key"), df["*"]
    )
    salted = with_salt(keyed, n_salts)
    partial = salted.groupBy("_cw_key", SALT_COL).agg(*phase1_exprs)
    return (
        partial.groupBy("_cw_key")
        .agg(*phase2_exprs)
        .withColumnRenamed("_cw_key", key if isinstance(key, str) else "key")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    partitions: int | None = None,
    keep_salt: bool = False,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side
    N× (one copy per salt value), join on (key, salt).

    ``partitions``: explicitly hash-partition BOTH sides on
    (key, salt) with this exact count before joining. Needed when the
    join is compute-dense but byte-light (pair generation, per-row
    hashing): AQE sizes post-shuffle partitions by BYTES and will
    happily coalesce a kilobyte-sized but quadratic-compute shuffle
    down to one task, undoing the salt's parallelism. An explicit
    ``repartition(n, keys)`` is exempt from AQE coalescing and, with
    both sides partitioned identically on the join keys, the join
    reuses it instead of adding its own exchange."""
    salted_big = with_salt(big, n_salts)
    replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    if partitions:
        salted_big = salted_big.repartition(partitions, on, SALT_COL)
        replicated = replicated.repartition(partitions, on, SALT_COL)
    joined = salted_big.join(replicated, on=[on, SALT_COL], how=how)
    # keep_salt: a downstream same-key aggregate can partial-aggregate
    # per (key, salt) — riding the salted exchange — before the final
    # |n_salts|-row-per-key merge (see plans.skew_plan.salted_skew_join).
    return joined if keep_salt else joined.drop(SALT_COL)
