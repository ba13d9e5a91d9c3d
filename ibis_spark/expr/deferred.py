"""Deferred expressions — the ``_`` placeholder.

Reference: ibis/common/deferred.py (Deferred builder resolved against the
enclosing table). Ours records an attribute/operator/call chain and replays
it against a :class:`ibis_spark.expr.table.Table` at bind time — no IR, the
replay directly produces a pyspark ``Column`` via our :class:`Column`.
"""

from __future__ import annotations

from typing import Any


class Deferred:
    """A recorded chain of operations replayed against a Table."""

    __slots__ = ("_ops",)

    def __init__(self, ops=()):
        object.__setattr__(self, "_ops", tuple(ops))

    def _chain(self, op):
        return Deferred(self._ops + (op,))

    # -- resolution ---------------------------------------------------------
    def resolve(self, table) -> Any:
        out: Any = table
        for kind, payload in self._ops:
            if kind == "getattr":
                out = getattr(out, payload)
            elif kind == "getitem":
                out = out[_resolve_arg(payload, table)]
            elif kind == "call":
                args, kwargs = payload
                args = [_resolve_arg(a, table) for a in args]
                kwargs = {k: _resolve_arg(v, table) for k, v in kwargs.items()}
                out = out(*args, **kwargs)
            elif kind == "binop":
                name, other, reflected = payload
                other = _resolve_arg(other, table)
                if reflected:
                    out = getattr(out, name)(other)
                else:
                    out = getattr(out, name)(other)
            elif kind == "unop":
                out = getattr(out, payload)()
        return out

    # -- recording ----------------------------------------------------------
    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return self._chain(("getattr", name))

    def __getitem__(self, key):
        return self._chain(("getitem", key))

    def __call__(self, *args, **kwargs):
        return self._chain(("call", (args, kwargs)))

    def __repr__(self):
        return "_" + "".join(_fmt_op(o) for o in self._ops)

    def __hash__(self):
        return hash(self._ops)

    def __bool__(self):
        raise TypeError("Deferred expressions cannot be coerced to bool")


def _fmt_op(op):
    kind, payload = op
    if kind == "getattr":
        return f".{payload}"
    if kind == "getitem":
        return f"[{payload!r}]"
    if kind == "call":
        return "(...)"
    if kind == "binop":
        return f".{payload[0]}(...)"
    return f".{payload}()"


def _binop(name, reflected=False):
    def method(self, other):
        return self._chain(("binop", (name, other, reflected)))

    return method


def _unop(name):
    def method(self):
        return self._chain(("unop", name))

    return method


for _n in (
    "__add__", "__sub__", "__mul__", "__truediv__", "__floordiv__",
    "__mod__", "__pow__", "__and__", "__or__", "__xor__",
    "__eq__", "__ne__", "__lt__", "__le__", "__gt__", "__ge__",
    "__radd__", "__rsub__", "__rmul__", "__rtruediv__", "__rfloordiv__",
    "__rmod__", "__rpow__", "__rand__", "__ror__", "__rxor__",
):
    setattr(Deferred, _n, _binop(_n))
for _n in ("__neg__", "__invert__", "__abs__"):
    setattr(Deferred, _n, _unop(_n))
del _n


def _resolve_arg(value, table):
    if isinstance(value, Deferred):
        return value.resolve(table)
    from ibis_spark.expr.column import Param

    if isinstance(value, Param):
        # substituted from the execution-time bindings; raises
        # UnboundParamError when none are in scope, which turns the
        # enclosing Table operation into a pending ParamTable
        return value._bound()
    return value


def resolve(value, table):
    """Resolve ``value`` against ``table`` if it is Deferred or callable."""
    if isinstance(value, Deferred):
        return value.resolve(table)
    if callable(value) and not hasattr(value, "spark"):
        return value(table)
    return value


_ = Deferred()
