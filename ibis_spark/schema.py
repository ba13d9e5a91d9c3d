"""Ordered, immutable schema: name → DataType.

Reference parity: ibis/expr/schema.py:27 (Schema is an ordered frozen
mapping str → DataType; every relation has a fixed, known schema).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Iterator

import pyspark.sql.types as T

from . import datatypes as dt


class Schema(Mapping):
    __slots__ = ("_fields",)

    def __init__(self, fields):
        if isinstance(fields, Schema):
            self._fields = dict(fields._fields)
        else:
            self._fields = {str(k): dt.dtype(v) for k, v in dict(fields).items()}

    # Mapping protocol -------------------------------------------------------
    def __getitem__(self, name: str) -> dt.DataType:
        return self._fields[name]

    def __iter__(self) -> Iterator[str]:
        return iter(self._fields)

    def __len__(self) -> int:
        return len(self._fields)

    def __eq__(self, other):
        if isinstance(other, Schema):
            return self._fields == other._fields
        return NotImplemented

    def __hash__(self):
        return hash(tuple((k, v._key()) for k, v in self._fields.items()))

    def __repr__(self):
        inner = ",\n  ".join(f"{k}: {v!r}" for k, v in self._fields.items())
        return f"Schema({{\n  {inner}\n}})"

    # helpers ----------------------------------------------------------------
    @property
    def names(self) -> tuple:
        return tuple(self._fields)

    @property
    def types(self) -> tuple:
        return tuple(self._fields.values())

    def to_spark(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(name, typ.to_spark(), typ.nullable)
                for name, typ in self._fields.items()
            ]
        )

    @classmethod
    def from_spark(cls, struct: T.StructType) -> "Schema":
        return cls(
            {f.name: dt.from_spark(f.dataType, f.nullable) for f in struct.fields}
        )


def schema(fields) -> Schema:
    return Schema(fields)
