"""Selector expansion tests (reference ibis/selectors.py semantics)."""

from __future__ import annotations

import pytest

import ibis_spark as ib
from ibis_spark import selectors as s


@pytest.fixture(scope="module")
def t(spark):
    con = ib.connect(spark)
    return con.memtable(
        {
            "a_int": [1, 2],
            "b_float": [1.5, 2.5],
            "c_str": ["x", "y"],
            "tmp_junk": [0, 0],
        }
    )


def test_numeric(t):
    assert t.select(s.numeric()).columns == ["a_int", "b_float", "tmp_junk"]


def test_string_and_invert(t):
    assert t.select(s.string()).columns == ["c_str"]
    assert t.select(~s.string()).columns == ["a_int", "b_float", "tmp_junk"]


def test_combinators(t):
    assert t.select(s.numeric() & s.startswith("a")).columns == ["a_int"]
    assert t.select(s.string() | s.endswith("junk")).columns == ["c_str", "tmp_junk"]


def test_of_type_and_matches(t):
    assert t.select(s.of_type("float64")).columns == ["b_float"]
    assert t.select(s.matches(r"^[ab]_")).columns == ["a_int", "b_float"]


def test_drop_and_group_by_with_selector(t):
    assert t.drop(s.startswith("tmp_")).columns == ["a_int", "b_float", "c_str"]
    out = t.group_by(s.string()).aggregate(n=lambda x: x.a_int.count())
    assert out.columns == ["c_str", "n"]


def test_across_mutate(t):
    out = t.select("c_str", s.across(s.numeric() & ~s.startswith("tmp"), lambda c: c * 2, names="{col}_x2"))
    assert out.columns == ["c_str", "a_int_x2", "b_float_x2"]
    row = out.order_by("a_int_x2").df.collect()[0]
    assert row.a_int_x2 == 2 and row.b_float_x2 == 3.0


def test_across_aggregate(t):
    out = t.group_by("c_str").aggregate(
        s.across(s.numeric() & ~s.startswith("tmp"), lambda c: c.sum(), names="{col}_sum")
    )
    assert sorted(out.columns) == ["a_int_sum", "b_float_sum", "c_str"]


def test_find_with_end(spark):
    con = ib.connect(spark)
    t = con.memtable({"x": ["hello bello"]})
    # expectations mirror python str.find: "hello bello".find("llo", i, j)
    got = t.select(
        a=t.x.find("llo"),
        b=t.x.find("llo", start=4),
        c=t.x.find("llo", end=5),
        d=t.x.find("llo", start=3, end=5),
    ).df.collect()[0]
    assert (got.a, got.b, got.c, got.d) == (2, 8, 2, -1)


def test_positional_and_set_selectors(con):
    import ibis_spark.selectors as s

    t = con.memtable({"a": [1, -2], "b": [4.0, -5.0], "name": ["x", "y"]})
    assert s.all().expand(t) == ["a", "b", "name"]
    assert s.none().expand(t) == []
    assert s.first().expand(t) == ["a"]
    assert s.last().expand(t) == ["name"]
    assert s.any_of("a", s.endswith("me")).expand(t) == ["a", "name"]
    assert s.all_of(s.numeric(), s.cols("a", "name")).expand(t) == ["a"]
    assert (s.first() | s.numeric()).expand(t) == ["a", "b"]
    assert (~s.first()).expand(t) == ["b", "name"]


def test_if_any_if_all(con):
    import ibis_spark as ib
    import ibis_spark.selectors as s

    t = con.memtable({"a": [1, -2, 3], "b": [4.0, 5.0, -6.0], "g": list("xyz")})
    assert t.filter(s.if_any(s.numeric(), lambda c: c < 0)).count() == 2
    assert t.filter(s.if_all(s.numeric(), ib._ > 0)).count() == 1
