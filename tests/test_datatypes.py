"""Unit tests for the type lattice, parser, and Spark round-trips."""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from ibis_spark import datatypes as dt
from ibis_spark.schema import Schema


def test_parse_simple():
    assert dt.parse("int64") == dt.Int64()
    assert dt.parse("string") == dt.String()
    assert dt.parse("float64") == dt.Float64()
    assert dt.parse("bool") == dt.Boolean()


def test_parse_nonnullable_bang():
    t = dt.parse("!int64")
    assert t == dt.Int64(nullable=False)
    assert not t.nullable


@pytest.mark.parametrize(
    "t",
    [
        dt.Int64(nullable=False),
        dt.String(nullable=False),
        dt.Array(dt.Int32(), nullable=False),
        dt.Int8(),
        dt.Decimal(12, 3),
        dt.Timestamp("UTC"),
        dt.Interval("h"),
        dt.Struct({"a": dt.Int64(), "b": dt.String()}),
        dt.Map(dt.String(), dt.Float64()),
    ],
)
def test_repr_parse_roundtrip(t):
    assert dt.parse(repr(t)) == t


def test_parse_nested():
    t = dt.parse("array<struct<a: int64, b: string>>")
    assert t == dt.Array(dt.Struct({"a": dt.Int64(), "b": dt.String()}))


def test_decimal_validation():
    with pytest.raises(ValueError):
        dt.Decimal(50, 2)
    with pytest.raises(ValueError):
        dt.Decimal(10, 50)
    with pytest.raises(ValueError):
        dt.Decimal(0, 0)
    with pytest.raises(ValueError):
        dt.Decimal(10, -1)


@pytest.mark.parametrize(
    "t",
    [
        dt.Int64(),
        dt.Float32(),
        dt.String(),
        dt.Timestamp(),  # NTZ
        dt.Timestamp("UTC"),
        dt.Date(),
        dt.Decimal(20, 4),
        dt.Interval("h"),
        dt.Interval("D"),
        dt.Interval("M"),
        dt.Interval("Y"),
        dt.Array(dt.Int64()),
        dt.Map(dt.String(), dt.Int64()),
        dt.Struct({"x": dt.Float64(), "y": dt.Array(dt.String())}),
    ],
)
def test_spark_roundtrip_identity(t):
    assert dt.from_spark(t.to_spark()) == t


def test_schema_spark_roundtrip():
    s = Schema({"a": dt.Int64(), "b": dt.String(), "c": dt.Array(dt.Float32())})
    assert Schema.from_spark(s.to_spark()) == s


def test_interval_unit_preserved():
    st = dt.Interval("h").to_spark()
    assert isinstance(st, T.DayTimeIntervalType)
    assert st.startField == st.endField == T.DayTimeIntervalType.HOUR


# -- promotion lattice --------------------------------------------------------


def test_promote_int_widening():
    assert dt.promote(dt.Int8(), dt.Int16()) == dt.Int16()
    assert dt.promote(dt.Int32(), dt.Int64()) == dt.Int64()
    assert dt.promote(dt.UInt8(), dt.UInt16()) == dt.UInt16()


def test_promote_mixed_signedness():
    assert dt.promote(dt.UInt8(), dt.Int8()) == dt.Int16()
    assert dt.promote(dt.UInt32(), dt.Int32()) == dt.Int64()
    assert dt.promote(dt.UInt32(), dt.Int64()) == dt.Int64()


def test_promote_uint64_escapes_to_decimal():
    assert dt.promote(dt.UInt64(), dt.Int8()) == dt.Decimal(20, 0)
    assert dt.promote(dt.UInt64(), dt.Int64()) == dt.Decimal(20, 0)
    assert dt.promote(dt.UInt64(), dt.UInt64()) == dt.UInt64()


def test_promote_int32_float32_is_float64():
    # float32 mantissa is 24 bits: int32 doesn't fit
    assert dt.promote(dt.Int32(), dt.Float32()) == dt.Float64()
    assert dt.promote(dt.Int64(), dt.Float32()) == dt.Float64()
    assert dt.promote(dt.Int16(), dt.Float32()) == dt.Float32()


def test_promote_decimal_precision_scale():
    assert dt.promote(dt.Decimal(10, 2), dt.Decimal(12, 4)) == dt.Decimal(12, 4)
    assert dt.promote(dt.Decimal(10, 2), dt.Int64()) == dt.Decimal(21, 2)
    assert dt.promote(dt.Decimal(38, 10), dt.Decimal(10, 0)) == dt.Decimal(38, 10)


def test_promote_incompatible_raises():
    with pytest.raises(TypeError):
        dt.promote(dt.String(), dt.Int64())


def test_promote_null_passthrough():
    assert dt.promote(dt.Null(), dt.Int64()) == dt.Int64()


def test_promote_nullable_propagates():
    t = dt.promote(dt.Int8(nullable=False), dt.Int16())
    assert t.nullable
    t = dt.promote(dt.Int8(nullable=False), dt.Int16(nullable=False))
    assert not t.nullable
