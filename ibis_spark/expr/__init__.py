"""Expression layer: Column / Table / windows / deferred.

The design collapses the reference's IR-node + 25-dialect-visitor pipeline
(ibis/expr/operations/*, ibis/backends/sql/compilers/*) into a thin typed
veneer over the PySpark DataFrame API: ``Table`` wraps a lazy
:class:`pyspark.sql.DataFrame` (Spark's logical plan IS our IR) and
``Column`` wraps :class:`pyspark.sql.Column` while preserving the
reference's value semantics (0-based indexing, division→float64,
Monday-0 weekdays, whitespace strip, ...). Catalyst remains the sole
optimizer, exactly as SURVEY.md §4 prescribes.
"""

from ibis_spark.expr.column import Column, Param, literal, null, param
from ibis_spark.expr.core import Expr, ExistsSubquery, ScalarValue, SortKey, exists
from ibis_spark.expr.deferred import Deferred, _, resolve
from ibis_spark.expr.table import GroupedTable, Table, desc, asc
from ibis_spark.expr.window import (
    Window,
    cumulative_window,
    following,
    preceding,
    range_window,
    rows_window,
    trailing_range_window,
    trailing_window,
    window,
)

__all__ = [
    "Column",
    "Deferred",
    "ExistsSubquery",
    "GroupedTable",
    "ScalarValue",
    "SortKey",
    "Table",
    "Window",
    "_",
    "asc",
    "cumulative_window",
    "desc",
    "exists",
    "Expr",
    "following",
    "literal",
    "null",
    "param",
    "preceding",
    "range_window",
    "resolve",
    "rows_window",
    "trailing_range_window",
    "trailing_window",
    "window",
]
