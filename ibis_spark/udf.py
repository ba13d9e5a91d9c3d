"""UDF decorators (reference: ibis/expr/operations/udf.py:46-753,
decorators :183/:257/:416/:545, agg-builtin :685; Spark registration
ibis/backends/pyspark/__init__.py:407-455).

Four input kinds, mirroring the reference:

- ``@udf.scalar.builtin`` — name-only passthrough to an engine function
  (``F.call_function``; zero Python in the hot path).
- ``@udf.scalar.python`` — row-at-a-time Python (``F.udf``). Slowest path;
  kept for parity, prefer pandas.
- ``@udf.scalar.pandas`` — vectorized Series→Series (``F.pandas_udf``,
  Arrow batches; the fast Python path at scale).
- ``@udf.scalar.pyarrow`` — Arrow-native (``F.udf(useArrow=True)``).

Aggregates: ``@udf.agg.builtin`` (engine aggregate by name) and
``@udf.agg.pandas`` (Series→scalar GROUPED_AGG pandas UDF).

Return types come from the function's return annotation: a Python type
(int/float/str/bool/bytes), an ibis-style dtype string ("int64",
"array<float64>"), or a pyspark DataType.
"""

from __future__ import annotations

import datetime
import functools
from typing import Any, Callable, Optional

import pyspark.sql.functions as F
from pyspark.sql import types as st

from ibis_spark.expr.core import unwrap, wrap

_PY_TO_SPARK = {
    int: st.LongType(),
    float: st.DoubleType(),
    str: st.StringType(),
    bool: st.BooleanType(),
    bytes: st.BinaryType(),
    datetime.date: st.DateType(),
    datetime.datetime: st.TimestampType(),
}


def _return_type(fn: Callable, override: Any = None) -> st.DataType:
    ann = override if override is not None else fn.__annotations__.get("return")
    if ann is None:
        raise TypeError(
            f"udf {fn.__name__!r} needs a return type annotation "
            "(python type, dtype string, or pyspark DataType)"
        )
    if isinstance(ann, st.DataType):
        return ann
    if isinstance(ann, type) and ann in _PY_TO_SPARK:
        return _PY_TO_SPARK[ann]
    if isinstance(ann, str):
        from ibis_spark.functions.generic import _spark_type

        return _spark_type(ann)
    from ibis_spark.functions.generic import _spark_type

    return _spark_type(ann)


def _wrap_caller(spark_fn: Callable, name: str, is_reduction: bool = False):
    @functools.wraps(spark_fn)
    def call(*args):
        out = spark_fn(*[unwrap(a) for a in args])
        return wrap(out, name=name, is_reduction=is_reduction)

    return call


class scalar:
    """Scalar UDF decorators (udf.py:183-545)."""

    @staticmethod
    def python(fn=None, *, returns: Any = None, name: Optional[str] = None):
        def deco(f):
            rt = _return_type(f, returns)
            spark_fn = F.udf(f, rt)
            return _wrap_caller(spark_fn, name or f.__name__)

        return deco(fn) if fn is not None else deco

    @staticmethod
    def pandas(fn=None, *, returns: Any = None, name: Optional[str] = None):
        def deco(f):
            rt = _return_type(f, returns)
            # shield the user function behind an annotation-free shim:
            # the user annotates logical types (int/str/...) like the
            # reference decorator, while Spark 4's pandas_udf wants
            # pd.Series hints; with no hints it takes returnType as given
            shim = functools.wraps(f)(lambda *a: f(*a))
            del shim.__wrapped__
            shim.__annotations__ = {}
            spark_fn = F.pandas_udf(shim, rt)
            return _wrap_caller(spark_fn, name or f.__name__)

        return deco(fn) if fn is not None else deco

    @staticmethod
    def pyarrow(fn=None, *, returns: Any = None, name: Optional[str] = None):
        def deco(f):
            rt = _return_type(f, returns)
            spark_fn = F.udf(f, rt, useArrow=True)
            return _wrap_caller(spark_fn, name or f.__name__)

        return deco(fn) if fn is not None else deco

    @staticmethod
    def builtin(fn=None, *, name: Optional[str] = None):
        """Engine-function passthrough (udf.py:183): the body is never
        executed; the function *name* is called JVM-side."""

        def deco(f):
            called = name or f.__name__

            @functools.wraps(f)
            def call(*args):
                return wrap(
                    F.call_function(called, *[unwrap(a) for a in args]), name=called
                )

            return call

        return deco(fn) if fn is not None else deco


class agg:
    """Aggregate UDF decorators (udf.py:685 agg.builtin; pandas
    GROUPED_AGG is a Spark-native extension)."""

    @staticmethod
    def builtin(fn=None, *, name: Optional[str] = None):
        def deco(f):
            called = name or f.__name__

            @functools.wraps(f)
            def call(*args):
                return wrap(
                    F.call_function(called, *[unwrap(a) for a in args]),
                    name=called,
                    is_reduction=True,
                )

            return call

        return deco(fn) if fn is not None else deco

    @staticmethod
    def pandas(fn=None, *, returns: Any = None, name: Optional[str] = None):
        def deco(f):
            import inspect

            import pandas as pd

            rt = _return_type(f, returns)
            # Spark 4 infers GROUPED_AGG from type hints (Series... ->
            # scalar); the PandasUDFType.GROUPED_AGG enum is deprecated.
            # Wrap the user fn in a fixed-arity adapter carrying the hints
            # so users never have to annotate their own function.
            nargs = len(inspect.signature(f).parameters)
            args = ", ".join(f"a{i}" for i in range(nargs))
            ns = {"__f__": f}
            exec(f"def _adapter({args}): return __f__({args})", ns)
            adapter = ns["_adapter"]
            adapter.__annotations__ = {f"a{i}": pd.Series for i in range(nargs)}
            adapter.__annotations__["return"] = float
            spark_fn = F.pandas_udf(adapter, rt)
            return _wrap_caller(spark_fn, name or f.__name__, is_reduction=True)

        return deco(fn) if fn is not None else deco
