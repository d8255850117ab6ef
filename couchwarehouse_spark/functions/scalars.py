"""Scalar expression helpers shared by the scalar-family plans.

All JVM-side ``pyspark.sql.functions`` built-ins (SURVEY.md §2.C) —
the reference's transform hook made arbitrary per-doc computation
part of its surface (reference index.js:46-49; documented example
drops a field, trims, joins strings — reference README.md:178-196).
Python UDFs appear ONLY in the dedicated UDF-surface entries
(plans.scalar.pandas_udf_disc_price / grouped_demean), and there as
Arrow-vectorized pandas UDFs, never row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_col(c: Column | str) -> Column:
    """Column form of identifier sanitisation (R16, lib/util.js:1-3)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(col, "-", "")


def acctbal_bucket(c: Column | str) -> Column:
    """Conditional bucketing used by the conditional-family plan."""
    col = F.col(c) if isinstance(c, str) else c
    return (
        F.when(col < 0, "negative")
        .when(col < 5000, "mid")
        .otherwise("high")
    )
