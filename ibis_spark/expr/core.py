"""Shared helpers between the Column core and the function mixins.

Kept import-cycle-free: function mixin modules import this, and
``column.py`` imports the mixins.
"""

from __future__ import annotations

import datetime
import decimal
from typing import Any, Optional

import pyspark.sql.functions as F
from pyspark.sql import Column as SparkColumn


def wrap(sc: SparkColumn, post=None):
    """Wrap a pyspark Column into our Column."""
    from ibis_spark.expr.column import Column

    return Column(sc, post=post)


def unwrap(value: Any) -> SparkColumn:
    """Coerce a value (our Column | pyspark Column | python literal) to a
    pyspark Column expression."""
    from ibis_spark.expr.column import Column

    if isinstance(value, Column):
        return value.spark()
    if isinstance(value, SparkColumn):
        return value
    return F.lit(value)


def is_literal(value: Any) -> bool:
    return isinstance(
        value,
        (
            int,
            float,
            str,
            bytes,
            bool,
            decimal.Decimal,
            datetime.date,
            datetime.datetime,
            datetime.timedelta,
            type(None),
        ),
    )


def name_of(value: Any, default: Optional[str] = None) -> Optional[str]:
    from ibis_spark.expr.column import Column

    if isinstance(value, Column):
        return value.get_name() or default
    if isinstance(value, str):
        return value
    return default
