"""Scalar/aggregate function families (SURVEY.md §2.5, §2.8-2.14).

Each module defines a mixin that :class:`ibis_spark.expr.column.Column`
inherits, so every reference operator is a method on Column lowered
directly to a JVM-side ``pyspark.sql.functions`` expression — no Python
row UDFs anywhere in these paths.
"""

from ibis_spark.functions.generic import (
    case,
    cases,
    coalesce,
    greatest,
    ifelse,
    least,
    now,
    today,
    random,
    uuid,
    e,
    pi,
)
from ibis_spark.functions.analytic import (
    cume_dist,
    dense_rank,
    ntile,
    percent_rank,
    rank,
    row_number,
)
from ibis_spark.functions.collections import array, map_, struct
from ibis_spark.functions.temporal import (
    date,
    interval,
    time,
    timestamp,
    timestamp_from_unix,
    integer_range,
    timestamp_range,
)

__all__ = [
    "array",
    "case",
    "cases",
    "coalesce",
    "cume_dist",
    "date",
    "dense_rank",
    "e",
    "greatest",
    "ifelse",
    "integer_range",
    "interval",
    "least",
    "map_",
    "now",
    "ntile",
    "percent_rank",
    "pi",
    "random",
    "rank",
    "time",
    "timestamp_from_unix",
    "row_number",
    "struct",
    "timestamp",
    "timestamp_range",
    "today",
    "uuid",
]
