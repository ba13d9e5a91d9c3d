"""Data type system.

Mirrors the reference's type lattice (ibis/expr/datatypes/core.py) re-expressed
for Spark: every type knows its Spark physical representation
(``to_spark()``) and we can recover a logical type from a Spark schema
(``from_spark()``).  Gaps vs Spark (unsigned ints, Time, sub-microsecond
timestamps) follow the widening strategy documented in SURVEY.md §1.2.

Reference parity: ibis/expr/datatypes/core.py:46 (DataType root),
ibis/backends/pyspark/datatypes.py:17-71 (Spark mapping).
"""

from __future__ import annotations

import re
from typing import Optional

import pyspark.sql.types as T

__all__ = [
    "DataType",
    "Null",
    "Boolean",
    "Int8",
    "Int16",
    "Int32",
    "Int64",
    "UInt8",
    "UInt16",
    "UInt32",
    "UInt64",
    "Float32",
    "Float64",
    "Decimal",
    "String",
    "Binary",
    "Date",
    "Time",
    "Timestamp",
    "Interval",
    "Array",
    "Map",
    "Struct",
    "JSON",
    "UUID",
    "dtype",
    "from_spark",
    "parse",
]


class DataType:
    """Base class for all logical data types."""

    __slots__ = ("nullable",)

    name: str = "unknown"

    def __init__(self, nullable: bool = True):
        self.nullable = nullable

    # -- identity ----------------------------------------------------------
    def _key(self):
        return (type(self).__name__, self.nullable)

    def __eq__(self, other):
        return isinstance(other, DataType) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def _render(self) -> str:
        return self.name

    def __repr__(self):
        base = self._render()
        if not self.nullable:
            base = f"!{base}"
        return base

    # -- predicates --------------------------------------------------------
    @property
    def is_numeric(self) -> bool:
        return isinstance(self, (_Integer, _Floating, Decimal))

    @property
    def is_integer(self) -> bool:
        return isinstance(self, _Integer)

    @property
    def is_floating(self) -> bool:
        return isinstance(self, _Floating)

    @property
    def is_string(self) -> bool:
        return isinstance(self, String)

    @property
    def is_temporal(self) -> bool:
        return isinstance(self, (Date, Time, Timestamp))

    @property
    def is_boolean(self) -> bool:
        return isinstance(self, Boolean)

    @property
    def is_array(self) -> bool:
        return isinstance(self, Array)

    @property
    def is_map(self) -> bool:
        return isinstance(self, Map)

    @property
    def is_struct(self) -> bool:
        return isinstance(self, Struct)

    # -- Spark mapping -------------------------------------------------------
    def to_spark(self) -> T.DataType:
        raise NotImplementedError(f"no Spark mapping for {self!r}")

    def copy(self, nullable: Optional[bool] = None) -> "DataType":
        import copy as _copy

        out = _copy.copy(self)
        if nullable is not None:
            out.nullable = nullable
        return out


class Null(DataType):
    name = "null"

    def to_spark(self):
        return T.NullType()


class Boolean(DataType):
    name = "boolean"

    def to_spark(self):
        return T.BooleanType()


class _Integer(DataType):
    _bits = 64
    _signed = True


class Int8(_Integer):
    name = "int8"
    _bits = 8

    def to_spark(self):
        return T.ByteType()


class Int16(_Integer):
    name = "int16"
    _bits = 16

    def to_spark(self):
        return T.ShortType()


class Int32(_Integer):
    name = "int32"
    _bits = 32

    def to_spark(self):
        return T.IntegerType()


class Int64(_Integer):
    name = "int64"
    _bits = 64

    def to_spark(self):
        return T.LongType()


# Spark has no unsigned ints: widen (UInt8→Short, UInt16→Int, UInt32→Long,
# UInt64→Decimal(20,0)), per SURVEY.md §1.2.
class UInt8(_Integer):
    name = "uint8"
    _bits = 8
    _signed = False

    def to_spark(self):
        return T.ShortType()


class UInt16(_Integer):
    name = "uint16"
    _bits = 16
    _signed = False

    def to_spark(self):
        return T.IntegerType()


class UInt32(_Integer):
    name = "uint32"
    _bits = 32
    _signed = False

    def to_spark(self):
        return T.LongType()


class UInt64(_Integer):
    name = "uint64"
    _bits = 64
    _signed = False

    def to_spark(self):
        return T.DecimalType(20, 0)


class _Floating(DataType):
    _bits = 64


class Float32(_Floating):
    name = "float32"
    _bits = 32

    def to_spark(self):
        return T.FloatType()


class Float64(_Floating):
    name = "float64"
    _bits = 64

    def to_spark(self):
        return T.DoubleType()


class Decimal(DataType):
    name = "decimal"
    __slots__ = ("precision", "scale")

    def __init__(self, precision: int = 38, scale: int = 9, nullable: bool = True):
        super().__init__(nullable)
        if not 1 <= precision <= 38:
            raise ValueError(
                f"decimal precision must be in [1, 38] (Spark limit), got {precision}"
            )
        if not 0 <= scale <= precision:
            raise ValueError(
                f"decimal scale must be in [0, precision={precision}], got {scale}"
            )
        self.precision = precision
        self.scale = scale

    def _key(self):
        return ("Decimal", self.precision, self.scale, self.nullable)

    def _render(self):
        return f"decimal({self.precision}, {self.scale})"

    def to_spark(self):
        return T.DecimalType(self.precision, self.scale)


class String(DataType):
    name = "string"

    def to_spark(self):
        return T.StringType()


class Binary(DataType):
    name = "binary"

    def to_spark(self):
        return T.BinaryType()


class Date(DataType):
    name = "date"

    def to_spark(self):
        return T.DateType()


class Time(DataType):
    """Time-of-day.  Spark has no time type: stored as microseconds since
    midnight in a LongType (SURVEY.md §1.2 gap strategy)."""

    name = "time"

    def to_spark(self):
        return T.LongType()


class Timestamp(DataType):
    name = "timestamp"
    __slots__ = ("timezone", "scale")

    def __init__(
        self,
        timezone: Optional[str] = None,
        scale: Optional[int] = None,
        nullable: bool = True,
    ):
        super().__init__(nullable)
        self.timezone = timezone
        self.scale = scale  # Spark is µs; scale > 6 is lossy

    def _key(self):
        return ("Timestamp", self.timezone, self.scale, self.nullable)

    def _render(self):
        if self.timezone:
            return f"timestamp('{self.timezone}')"
        return "timestamp"

    def to_spark(self):
        if self.timezone is None:
            return T.TimestampNTZType()
        return T.TimestampType()


_INTERVAL_UNITS = {"Y", "Q", "M", "W", "D", "h", "m", "s", "ms", "us", "ns"}


class Interval(DataType):
    name = "interval"
    __slots__ = ("unit",)

    def __init__(self, unit: str = "s", nullable: bool = True):
        super().__init__(nullable)
        if unit not in _INTERVAL_UNITS:
            raise ValueError(f"invalid interval unit {unit!r}")
        self.unit = unit

    def _key(self):
        return ("Interval", self.unit, self.nullable)

    def _render(self):
        return f"interval('{self.unit}')"

    def to_spark(self):
        # Preserve the unit: single-field Spark interval (mirrors the
        # reference's unit table, ibis/backends/pyspark/datatypes.py:63-71).
        if self.unit in ("Y", "Q"):
            return T.YearMonthIntervalType(
                T.YearMonthIntervalType.YEAR, T.YearMonthIntervalType.YEAR
            )
        if self.unit == "M":
            return T.YearMonthIntervalType(
                T.YearMonthIntervalType.MONTH, T.YearMonthIntervalType.MONTH
            )
        field = {
            "W": T.DayTimeIntervalType.DAY,
            "D": T.DayTimeIntervalType.DAY,
            "h": T.DayTimeIntervalType.HOUR,
            "m": T.DayTimeIntervalType.MINUTE,
            "s": T.DayTimeIntervalType.SECOND,
            "ms": T.DayTimeIntervalType.SECOND,
            "us": T.DayTimeIntervalType.SECOND,
            "ns": T.DayTimeIntervalType.SECOND,
        }[self.unit]
        return T.DayTimeIntervalType(field, field)


class Array(DataType):
    name = "array"
    __slots__ = ("value_type",)

    def __init__(self, value_type: DataType, nullable: bool = True):
        super().__init__(nullable)
        self.value_type = value_type

    def _key(self):
        return ("Array", self.value_type._key(), self.nullable)

    def _render(self):
        return f"array<{self.value_type!r}>"

    def to_spark(self):
        return T.ArrayType(self.value_type.to_spark(), self.value_type.nullable)


class Map(DataType):
    name = "map"
    __slots__ = ("key_type", "value_type")

    def __init__(self, key_type: DataType, value_type: DataType, nullable: bool = True):
        super().__init__(nullable)
        self.key_type = key_type
        self.value_type = value_type

    def _key(self):
        return ("Map", self.key_type._key(), self.value_type._key(), self.nullable)

    def _render(self):
        return f"map<{self.key_type!r}, {self.value_type!r}>"

    def to_spark(self):
        return T.MapType(
            self.key_type.to_spark(),
            self.value_type.to_spark(),
            self.value_type.nullable,
        )


class Struct(DataType):
    name = "struct"
    __slots__ = ("fields",)

    def __init__(self, fields: dict, nullable: bool = True):
        super().__init__(nullable)
        self.fields = {k: dtype(v) for k, v in dict(fields).items()}

    def _key(self):
        return (
            "Struct",
            tuple((k, v._key()) for k, v in self.fields.items()),
            self.nullable,
        )

    def __repr__(self):
        inner = ", ".join(f"{k}: {v!r}" for k, v in self.fields.items())
        return f"struct<{inner}>"

    def to_spark(self):
        return T.StructType(
            [
                T.StructField(k, v.to_spark(), v.nullable)
                for k, v in self.fields.items()
            ]
        )


class JSON(DataType):
    """JSON stored as a string column + JSON functions (Spark convention)."""

    name = "json"

    def to_spark(self):
        return T.StringType()


class UUID(DataType):
    name = "uuid"

    def to_spark(self):
        return T.StringType()


# ---------------------------------------------------------------------------
# conversion / inference
# ---------------------------------------------------------------------------

_SIMPLE: dict = {}
for _cls in (
    Null,
    Boolean,
    Int8,
    Int16,
    Int32,
    Int64,
    UInt8,
    UInt16,
    UInt32,
    UInt64,
    Float32,
    Float64,
    String,
    Binary,
    Date,
    Time,
    JSON,
    UUID,
):
    _SIMPLE[_cls.name] = _cls

_ALIASES = {
    "int": "int64",
    "integer": "int32",
    "bigint": "int64",
    "smallint": "int16",
    "tinyint": "int8",
    "float": "float64",
    "double": "float64",
    "real": "float32",
    "bool": "boolean",
    "varchar": "string",
    "str": "string",
    "bytes": "binary",
    "halffloat": "float32",
    "float16": "float32",
}


def dtype(value) -> DataType:
    """Coerce a value (DataType | str | spark type | python type) to DataType."""
    if isinstance(value, DataType):
        return value
    if isinstance(value, str):
        return parse(value)
    if isinstance(value, T.DataType):
        return from_spark(value)
    if isinstance(value, type):
        mapping = {
            bool: Boolean,
            int: Int64,
            float: Float64,
            str: String,
            bytes: Binary,
        }
        if value in mapping:
            return mapping[value]()
    raise TypeError(f"cannot interpret {value!r} as a DataType")


def from_spark(styp: T.DataType, nullable: bool = True) -> DataType:
    """Recover the logical type from a Spark type."""
    if isinstance(styp, T.NullType):
        return Null(nullable)
    if isinstance(styp, T.BooleanType):
        return Boolean(nullable)
    if isinstance(styp, T.ByteType):
        return Int8(nullable)
    if isinstance(styp, T.ShortType):
        return Int16(nullable)
    if isinstance(styp, T.IntegerType):
        return Int32(nullable)
    if isinstance(styp, T.LongType):
        return Int64(nullable)
    if isinstance(styp, T.FloatType):
        return Float32(nullable)
    if isinstance(styp, T.DoubleType):
        return Float64(nullable)
    if isinstance(styp, T.DecimalType):
        return Decimal(styp.precision, styp.scale, nullable)
    if isinstance(styp, T.StringType):
        return String(nullable)
    if isinstance(styp, T.BinaryType):
        return Binary(nullable)
    if isinstance(styp, T.DateType):
        return Date(nullable)
    if isinstance(styp, T.TimestampNTZType):
        # scale=None so x == from_spark(x.to_spark()) holds for the default
        return Timestamp(None, None, nullable)
    if isinstance(styp, T.TimestampType):
        # Spark TimestampType is session-tz-adjusted (UTC-normalized storage)
        return Timestamp("UTC", None, nullable)
    if isinstance(styp, T.DayTimeIntervalType):
        if styp.startField == styp.endField:
            unit = {
                T.DayTimeIntervalType.DAY: "D",
                T.DayTimeIntervalType.HOUR: "h",
                T.DayTimeIntervalType.MINUTE: "m",
                T.DayTimeIntervalType.SECOND: "s",
            }[styp.startField]
            return Interval(unit, nullable)
        return Interval("s", nullable)
    if isinstance(styp, T.YearMonthIntervalType):
        if styp.startField == styp.endField == T.YearMonthIntervalType.YEAR:
            return Interval("Y", nullable)
        return Interval("M", nullable)
    if isinstance(styp, T.ArrayType):
        return Array(from_spark(styp.elementType, styp.containsNull), nullable)
    if isinstance(styp, T.MapType):
        return Map(
            from_spark(styp.keyType, True),
            from_spark(styp.valueType, styp.valueContainsNull),
            nullable,
        )
    if isinstance(styp, T.StructType):
        return Struct(
            {f.name: from_spark(f.dataType, f.nullable) for f in styp.fields},
            nullable,
        )
    raise TypeError(f"unsupported Spark type: {styp}")


# -- string grammar parser ("array<struct<a: int64>>", "decimal(38, 9)") ----

_TOKEN = re.compile(r"\s*([<>(),:!]|[A-Za-z_][A-Za-z_0-9]*|\d+|'[^']*')\s*")


def _tokenize(text: str):
    pos = 0
    tokens = []
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"cannot parse type string {text!r} at {pos}")
        tokens.append(m.group(1))
        pos = m.end()
    return tokens


def parse(text: str) -> DataType:
    """Parse the ibis-style type grammar into a DataType.

    Reference parity: ibis/expr/datatypes/parse.py.
    """
    tokens = _tokenize(text)
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else None

    def advance():
        nonlocal pos
        if pos >= len(tokens):
            raise ValueError(f"unexpected end of type string {text!r}")
        tok = tokens[pos]
        pos += 1
        return tok

    def expect(tok):
        got = advance()
        if got != tok:
            raise ValueError(f"expected {tok!r}, got {got!r} in {text!r}")

    def parse_type() -> DataType:
        nonlocal pos
        nullable = True
        if peek() == "!":
            advance()
            nullable = False
        name = advance().lower()
        name = _ALIASES.get(name, name)
        if name in _SIMPLE:
            return _SIMPLE[name](nullable)
        if name in ("decimal", "numeric"):
            if peek() == "(":
                advance()
                p = int(advance())
                expect(",")
                s = int(advance())
                expect(")")
                return Decimal(p, s, nullable)
            return Decimal(nullable=nullable)
        if name == "timestamp":
            tz = None
            scale = None
            if peek() == "(":
                advance()
                arg = advance()
                if arg.startswith("'"):
                    tz = arg.strip("'")
                else:
                    scale = int(arg)
                if peek() == ",":
                    advance()
                    scale = int(advance())
                expect(")")
            return Timestamp(tz, scale, nullable)
        if name == "interval":
            unit = "s"
            if peek() == "(":
                advance()
                unit = advance().strip("'")
                expect(")")
            return Interval(unit, nullable)
        if name == "array":
            expect("<")
            inner = parse_type()
            expect(">")
            return Array(inner, nullable)
        if name == "map":
            expect("<")
            k = parse_type()
            expect(",")
            v = parse_type()
            expect(">")
            return Map(k, v, nullable)
        if name == "struct":
            expect("<")
            fields = {}
            while True:
                fname = advance()
                expect(":")
                fields[fname] = parse_type()
                if peek() == ",":
                    advance()
                    continue
                break
            expect(">")
            return Struct(fields, nullable)
        raise ValueError(f"unknown type name {name!r} in {text!r}")

    result = parse_type()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens in type string {text!r}")
    return result


# -- numeric promotion lattice (ibis/expr/datatypes/cast.py, simplified) -----

_INT_ORDER = [Int8, Int16, Int32, Int64]
_UINT_ORDER = [UInt8, UInt16, UInt32, UInt64]


def _int_decimal_digits(t: _Integer) -> int:
    """Max decimal digits an integer type can need."""
    digits = {8: 3, 16: 5, 32: 10, 64: 19}[t._bits]
    if not t._signed and t._bits == 64:
        digits = 20
    return digits


def promote(a, b) -> DataType:
    """Binary-op result type: smallest type both sides fit in losslessly.

    Follows the reference's implicit-cast lattice (ibis/expr/datatypes/cast.py):
    signedness-aware integer widening, UInt64 escapes to Decimal(20, 0),
    int32/int64 with float32 promote to float64 (float32's 24-bit mantissa
    can't hold them), decimals widen by precision/scale arithmetic.
    """
    a, b = dtype(a), dtype(b)
    nullable = a.nullable or b.nullable

    def out(t: DataType) -> DataType:
        return t.copy(nullable=nullable)

    if isinstance(a, Null):
        return out(b)
    if isinstance(b, Null):
        return out(a)
    if a._key()[:-1] == b._key()[:-1]:
        return out(a)

    if a.is_floating or b.is_floating:
        if a.is_floating and b.is_floating:
            return out(Float64() if max(a._bits, b._bits) > 32 else Float32())
        flt, other = (a, b) if a.is_floating else (b, a)
        if not other.is_numeric:
            raise TypeError(f"cannot promote {a!r} and {b!r}")
        if flt._bits == 64 or isinstance(other, Decimal):
            return out(Float64())
        # float32 keeps only integers up to 2**24: int32+ must widen
        if other._bits <= 16:
            return out(Float32())
        return out(Float64())

    if isinstance(a, Decimal) or isinstance(b, Decimal):
        def as_ps(t):
            if isinstance(t, Decimal):
                return t.precision, t.scale
            if t.is_integer:
                return _int_decimal_digits(t), 0
            raise TypeError(f"cannot promote {a!r} and {b!r}")

        p1, s1 = as_ps(a)
        p2, s2 = as_ps(b)
        s = max(s1, s2)
        i = max(p1 - s1, p2 - s2)
        return out(Decimal(min(38, i + s), s))

    if a.is_integer and b.is_integer:
        if (not a._signed and a._bits == 64) or (not b._signed and b._bits == 64):
            # uint64 cannot fit any signed 64-bit type; matches UInt64.to_spark
            return out(Decimal(20, 0))
        if a._signed == b._signed:
            bits = max(a._bits, b._bits)
            order = _INT_ORDER if a._signed else _UINT_ORDER
            for cls in order:
                if cls._bits >= bits:
                    return out(cls())
        # mixed signedness: need a signed type strictly wider than the
        # unsigned operand
        u, s_ = (a, b) if not a._signed else (b, a)
        need = max(u._bits * 2, s_._bits)
        for cls in _INT_ORDER:
            if cls._bits >= need:
                return out(cls())
        return out(Decimal(20, 0))

    if isinstance(a, Timestamp) and isinstance(b, Date):
        return out(a)
    if isinstance(a, Date) and isinstance(b, Timestamp):
        return out(b)
    if type(a) is type(b):
        return out(a)
    raise TypeError(f"cannot promote {a!r} and {b!r}")
