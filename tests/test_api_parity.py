"""ibis-native method-name parity: every reference user-API spelling added
in round 5 (arrays sums/means/..., boolean cum/not aggs, interval unit
views, string/integer parse ctors, histogram, struct lift, JSON accessors,
expression conveniences) executes with the reference's semantics.

Reference surfaces: ibis/expr/types/{arrays,logical,temporal,strings,
numeric,structs,json,core,generic}.py.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

import ibis_spark as ib


@pytest.fixture(scope="module")
def arr_t(con):
    return con.memtable(
        {
            "a": [[1, 2, None], [None], [], None, [3, 4]],
            "b": [[True, None], [False, False], [None], [], [True, True]],
        }
    )


def test_array_named_reductions(arr_t):
    t = arr_t
    out = t.select(
        sums=t.a.sums(),
        means=t.a.means(),
        mins=t.a.mins(),
        maxs=t.a.maxs(),
        modes=t.a.modes(),
    ).execute()
    assert out["sums"].tolist()[0] == 3.0
    assert out["sums"].tolist()[4] == 7.0
    # empty / all-null / NULL arrays yield NULL
    assert pd.isna(out["sums"].tolist()[1])
    assert pd.isna(out["sums"].tolist()[2])
    assert pd.isna(out["sums"].tolist()[3])
    assert out["means"].tolist()[4] == 3.5
    assert out["mins"].tolist()[0] == 1 and out["maxs"].tolist()[0] == 2


def test_array_anys_alls(arr_t):
    t = arr_t
    out = t.select(anys=t.b.anys(), alls=t.b.alls()).execute()
    assert out["anys"].tolist()[0] is True  # [True, None] → True
    assert out["anys"].tolist()[1] is False  # [False, False]
    assert pd.isna(out["anys"].tolist()[2])  # [None] → NULL
    assert pd.isna(out["anys"].tolist()[3])  # [] → NULL
    assert out["alls"].tolist()[0] is True  # non-null elements all true
    assert out["alls"].tolist()[1] is False


def test_array_transform_spellings(arr_t):
    t = arr_t
    out = t.select(
        srt=t.a.sort(),
        uniq=t.a.unique(),
        rm=t.a.remove(1),
        fl=t.a.filter(lambda x: x > 1),
        mp=t.a.map(lambda x: x * 10),
        zp=t.a.zip(t.a),
    ).execute()
    rm0 = list(out["rm"].tolist()[0])
    assert rm0[0] == 2 and pd.isna(rm0[1])
    assert list(out["fl"].tolist()[0]) == [2]
    mp0 = list(out["mp"].tolist()[0])
    assert mp0[:2] == [10, 20] and pd.isna(mp0[2])
    assert list(out["zp"].tolist()[4]) == [
        {"f1": 3, "f2": 3},
        {"f1": 4, "f2": 4},
    ]


def test_flatten_and_map_hybrid(con):
    t = con.memtable({"n": [[[1, 2], [3]], [[4]]]})
    flat = [list(v) for v in t.select(f=t.n.flatten()).execute()["f"]]
    assert flat == [[1, 2, 3], [4]]


def test_boolean_not_reductions(con):
    t = con.memtable({"x": [1, 2, 3, 4]})
    assert (t.x > 4).notany().execute() is True
    assert (t.x > 1).notany().execute() is False
    assert (t.x > 0).notall().execute() is False
    assert (t.x > 2).notall(where=t.x > 2).execute() is False
    assert (t.x > 2).notany(where=t.x < 2).execute() is True


def test_boolean_cumany_cumall(con):
    t = con.memtable({"i": [1, 2, 3, 4], "f": [False, True, False, False]})
    w = ib.window(order_by=t.i)
    out = (
        t.mutate(ca=t.f.cumany().over(w), cl=(~t.f).cumall().over(w))
        .order_by(t.i)
        .execute()
    )
    assert out["ca"].tolist() == [False, True, True, True]
    assert out["cl"].tolist() == [True, False, False, False]


def test_interval_unit_views(con):
    iv = ib.interval(seconds=95445)  # 1 day 2:30:45
    t = con.memtable({"one": [1]})
    row = t.select(
        d=iv.days,
        h=iv.hours,
        m=iv.minutes,
        s=iv.seconds,
        ms=iv.milliseconds,
        us=iv.microseconds,
        w=iv.weeks,
    ).execute().iloc[0]
    assert row["d"] == 1 and row["h"] == 26 and row["m"] == 1590
    assert row["s"] == 95445 and row["ms"] == 95445000
    assert row["us"] == 95445000000 and row["w"] == 0
    ym = ib.interval(months=27)
    row2 = t.select(y=ym.years, q=ym.quarters, mo=ym.months).execute().iloc[0]
    assert row2["y"] == 2 and row2["q"] == 9 and row2["mo"] == 27


def test_interval_as_unit_roundtrip(con):
    t = con.memtable({"one": [1]})
    iv = ib.interval(seconds=95445)
    # converting to minutes truncates the 45 s remainder
    assert t.select(s=iv.as_unit("m").seconds).execute().iloc[0]["s"] == 95400
    with pytest.raises(ValueError):
        iv.as_unit("ns")


def test_integer_as_interval_as_timestamp(con):
    t = con.memtable({"n": [90, 3700]})
    out = t.select(
        m=t.n.as_interval("s").minutes,
        ts=t.n.as_timestamp("s"),
        d=t.n.as_interval("D").days,
    ).execute()
    assert out["m"].tolist() == [1, 61]
    assert out["ts"].tolist()[0] == pd.Timestamp("1970-01-01 00:01:30")
    assert out["d"].tolist() == [90, 3700]


def test_string_parse_spellings(con):
    t = con.memtable({"s": ["2021-03-04 05:06:07"]})
    out = t.select(
        ts=t.s.as_timestamp("%Y-%m-%d %H:%M:%S"),
        d=t.s.as_date("%Y-%m-%d %H:%M:%S"),
        tm=t.s.as_time("%Y-%m-%d %H:%M:%S"),
    ).execute().iloc[0]
    assert out["ts"] == pd.Timestamp("2021-03-04 05:06:07")
    assert out["d"] == datetime.date(2021, 3, 4)
    assert out["tm"] == "05:06:07"


def test_iso_year_epoch_days(con):
    t = con.memtable(
        {"d": [datetime.date(2021, 1, 1), datetime.date(2024, 12, 30)]}
    )
    out = t.select(iy=t.d.iso_year(), ed=t.d.epoch_days()).execute()
    # 2021-01-01 is ISO week 53 of 2020; 2024-12-30 is ISO week 1 of 2025
    assert out["iy"].tolist() == [2020, 2025]
    assert out["ed"].tolist() == [18628, 20087]


def test_histogram_matches_reference_example(con):
    t = con.memtable({"v": [-1.0, 3, 5, 6, 8, 10, 11, 23, 25]})
    out = t.mutate(h=t.v.histogram(nbins=5)).order_by(t.v).execute()
    # binwidth = (25 - (-1 - eps))/5 = 5.2: reference doc example bins
    assert out["h"].tolist() == [0, 0, 1, 1, 1, 2, 2, 4, 4]
    # binwidth given → nbins = ceil((max - base)/binwidth) = ceil(2+ε) = 3,
    # so 25 lands in bin floor(26/13) = 2 (same as the reference formula)
    out2 = t.mutate(h=t.v.histogram(binwidth=13.0)).order_by(t.v).execute()
    assert out2["h"].tolist() == [0, 0, 0, 0, 0, 0, 0, 1, 2]
    with pytest.raises(ValueError):
        t.v.histogram(nbins=5, binwidth=1.0)
    with pytest.raises(ValueError):
        t.v.histogram()


def test_struct_fields_lift(con):
    base = con.memtable({"p": [1, 2], "q": ["a", "b"]})
    t = base.mutate(s=ib.struct({"p": base.p, "q": base.q}))
    assert set(t.s.fields) == {"p", "q"}
    lifted = t.s.lift()
    assert lifted.columns == ["p", "q"]
    assert lifted.execute()["p"].tolist() == [1, 2]


def test_json_accessors(con):
    t = con.memtable({"js": ['{"x": 1}', '"hi"', "[1,2]", "true", "3.5", "7"]})
    out = t.select(
        s=t.js.str,
        i=t.js.int,
        f=t.js.float,
        b=t.js.bool,
        a=t.js.array,
        m=t.js.map,
    ).execute()
    assert out["s"].tolist()[1] == "hi" and pd.isna(out["s"].tolist()[0])
    assert out["i"].tolist()[5] == 7 and pd.isna(out["i"].tolist()[4])
    assert out["f"].tolist()[4] == 3.5
    assert out["b"].tolist()[3] is True
    assert list(out["a"].tolist()[2]) == ["1", "2"]
    assert dict(out["m"].tolist()[0]) == {"x": "1"}


def test_map_named_spellings(con):
    t = con.memtable({"one": [1]})
    m = ib.map(["k", "j"], [1, 2])
    out = t.select(
        ks=m.keys(), vs=m.values(), g=m.get("missing", 0), g2=m.get("j", 0)
    ).execute().iloc[0]
    assert sorted(out["ks"]) == ["j", "k"]
    assert sorted(out["vs"]) == [1, 2]
    assert out["g"] == 0 and out["g2"] == 2


def test_column_conveniences(con):
    t = con.memtable({"x": [3, 1, 2], "g": ["a", "a", "b"]})
    assert sorted(t.x.to_list()) == [1, 2, 3]
    assert len(t.x.preview(2)) == 2
    assert t.x.type() == ib.dtype("int64")
    assert t.x.equals(t.x)
    assert not t.x.equals(t.g)
    assert t.x.pipe(lambda c: c.sum()).execute() == 6
    # as_scalar: reduction → broadcast scalar in a projection
    out = t.mutate(frac=(t.x / t.x.sum().as_scalar())).execute()
    assert abs(sum(out["frac"])) == pytest.approx(1.0)


def test_column_nth(con):
    t = con.memtable({"i": [1, 2, 3], "x": [10, 20, 30]})
    w = ib.window(order_by=t.i)
    out = t.mutate(second=t.x.nth(1).over(w)).order_by(t.i).execute()
    assert out["second"].tolist()[-1] == 20


def test_table_conveniences(con):
    t = con.memtable({"x": list(range(50))})
    assert t.pipe(lambda s: s.filter(s.x > 47)).count() == 2
    assert t.pipe((lambda n, data: data.limit(n), "data"), 3).count() == 3
    assert t.equals(t)
    assert not t.equals(t.limit(3))
    assert len(t.preview(7)) == 7
    assert type(t.get_backend()).__name__ == "Backend"
    batches = list(t.to_pandas_batches(chunk_size=20))
    assert sum(len(b) for b in batches) == 50
    assert t.dropna().count() == 50
    c = t.cache()
    assert c.release() is c


def test_reduction_shape_algebra(con):
    """A dunder combination of only reductions stays scalar-shaped: the
    q14 pattern 100 * sum(a) / sum(b) must aggregate directly, not
    auto-lift either side to a scalar subquery mid-aggregate."""
    t = con.memtable({"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0]})
    out = t.aggregate(pct=(100 * t.a.sum() / t.b.sum())).execute()
    assert out["pct"].tolist() == [50.0]
    # mixed shape still lifts: column compared to a bare reduction
    assert t.filter(t.a > t.a.mean()).count() == 1
    # windowed aggregates stay columnar even though built from reductions
    w = ib.window(order_by=t.a)
    out2 = t.mutate(cs=t.a.sum().over(w)).order_by(t.a).execute()
    assert out2["cs"].tolist() == [1.0, 3.0, 6.0]


def test_rowid_to_array_interchange(con):
    t = con.memtable({"x": [10.0, 20.0, 30.0], "g": ["a", "b", "a"]})
    assert sorted(t.rowid().to_list()) == [0, 1, 2]
    # as_scalar() no-arg (reference Table.as_scalar: 1-col table as scalar)
    mx = t.aggregate(m=t.x.max()).as_scalar()
    assert t.filter(t.x == mx).execute()["x"].tolist() == [30.0]
    with pytest.raises(ValueError):
        t.as_scalar()  # two columns
    # to_array (deprecated spelling) usable inside a projection
    sel = t.select("g").distinct().filter(ib._.g == "a").to_array()
    assert t.mutate(ga=sel).execute()["ga"].tolist() == ["a"] * 3
    # __dataframe__ interchange protocol
    assert list(t.__dataframe__().column_names()) == ["x", "g"]
    # column-level deprecated fillna spelling (NULL, not NaN, semantics)
    t2 = con.memtable({"y": [1, None, 3]})
    assert t2.select(z=t2.y.fillna(0)).execute()["z"].tolist() == [1, 0, 3]


def test_map_constructor_export(con):
    t = con.memtable({"one": [1]})
    m = ib.map(["a", "b"], [1, 2])
    out = t.select(v=m.get("b", 0)).execute()
    assert out["v"].tolist() == [2]


def test_module_level_api(con):
    import datetime

    t = con.memtable({"x": [1, 2, 3, 4], "g": ["a", "b", "a", "b"]})
    u = con.memtable({"x": [5], "g": ["c"]})
    assert isinstance(t, ib.Expr) and isinstance(t.x, ib.Expr)
    assert not isinstance(3, ib.Expr)
    assert t.filter(ib.and_(t.x > 1, t.g == "a")).count() == 1
    assert t.filter(ib.or_(t.x > 3, t.g == "a")).count() == 3
    assert ib.union(t, u).count() == 5
    assert ib.intersect(t, t).count() == 4
    assert ib.difference(t, u).count() == 4
    assert ib.cross_join(t, u).count() == 4
    agg = ib.aggregate(t, by="g", total=ib._.x.sum()).order_by("g").execute()
    assert agg["total"].tolist() == [4, 6]
    assert t.filter(ib.deferred.x > 2).count() == 2
    assert ib.watermark("ts", datetime.timedelta(minutes=5)) == ("ts", "300000 milliseconds")
    assert ib.watermark("ts", "10 minutes") == ("ts", "10 minutes")
    assert ib.preceding(5) == -5 and ib.following(3) == 3
    assert ib.BaseBackend is ib.Backend
    assert hasattr(ib.selectors, "across")


def test_module_level_windows(con):
    t = con.memtable({"x": [1, 2, 3, 4]})
    rw = ib.rows_window(preceding=1, following=0, order_by=t.x)
    out = t.mutate(s=t.x.sum().over(rw)).order_by(t.x).execute()
    assert out["s"].tolist() == [1, 3, 5, 7]
    gw = ib.range_window(preceding=1, following=1, order_by=t.x)
    out2 = t.mutate(s=t.x.sum().over(gw)).order_by(t.x).execute()
    assert out2["s"].tolist() == [3, 6, 9, 7]
    tw = ib.trailing_range_window(1, order_by=t.x)
    out3 = t.mutate(s=t.x.sum().over(tw)).order_by(t.x).execute()
    assert out3["s"].tolist() == [1, 3, 5, 7]


def test_ranges_and_inference(con):
    import datetime

    t = con.memtable({"one": [1]})
    r = t.select(
        n=ib.range(3),
        ts=ib.range(
            "2024-01-01", "2024-01-03", datetime.timedelta(days=1)
        ).array_length(),
    ).execute().iloc[0]
    assert list(r["n"]) == [0, 1, 2] and r["ts"] == 2
    assert str(ib.infer_dtype(3)) == "int8"
    assert str(ib.infer_dtype(300)) == "int16"
    assert str(ib.infer_dtype(2**40)) == "int64"
    assert str(ib.infer_dtype([1, 2])) == "array<int8>"
    assert "a: int64" in str(ib.infer_schema({"a": "int64"}))


def test_default_backend(con):
    ib.set_backend(con)
    assert ib.get_backend() is con
    t = con.memtable({"one": [1]})
    assert type(ib.get_backend(t)).__name__ == "Backend"
    with pytest.raises(ValueError):
        ib.set_backend("duckdb")


def test_options_interactive_repr(con):
    t = con.memtable({"x": list(range(15))})
    assert repr(t) == "Table[x: bigint]"
    ib.options.interactive = True
    try:
        r = repr(t)
        assert "…" in r and "Table[x: bigint]" in r
        assert "0" in repr(t.x)
    finally:
        ib.options.interactive = False
    assert repr(t) == "Table[x: bigint]"


def test_table_alias_sql(con):
    t = con.memtable({"x": [1, 2, 3]})
    n = t.alias("aliased_t").sql("SELECT COUNT(*) AS n FROM aliased_t")
    assert n.execute()["n"].tolist() == [3]


def test_pandas_udf_over_window(con):
    """Reference AnalyticVectorizedUDF (operations/vectorized.py): a
    pandas agg UDF applied over a window — Arrow-batched per frame, no
    row-at-a-time Python."""
    import pandas as pd

    from ibis_spark import udf

    @udf.agg.pandas
    def smax(s: pd.Series) -> float:
        return float(s.max())

    t = con.memtable(
        {"g": ["a", "a", "a", "b"], "i": [1, 2, 3, 1], "x": [3.0, 1.0, 2.0, 9.0]}
    )
    w = ib.window(group_by=t.g, order_by=t.i)
    out = t.mutate(m=smax(t.x).over(w)).order_by(t.g, t.i).execute()
    assert out["m"].tolist() == [3.0, 3.0, 3.0, 9.0]


def test_pivot_roundtrip_property(con):
    """pivot_longer then pivot_wider reconstructs the original relation
    (up to row/column order) — a structural inverse property, checked on
    random data."""
    import random

    rng = random.Random(5)
    rows = 40
    t = con.memtable(
        {
            "id": list(range(rows)),
            "m1": [round(rng.uniform(0, 100), 3) for _ in range(rows)],
            "m2": [round(rng.uniform(0, 100), 3) for _ in range(rows)],
            "m3": [round(rng.uniform(0, 100), 3) for _ in range(rows)],
        }
    )
    long = t.pivot_longer(["m1", "m2", "m3"], names_to="metric", values_to="v")
    assert long.count() == rows * 3
    wide = long.pivot_wider(
        names_from="metric", values_from="v", values_agg="max"
    )
    a = t.execute().sort_values("id").reset_index(drop=True)
    b = (
        wide.execute()
        .sort_values("id")
        .reset_index(drop=True)[["id", "m1", "m2", "m3"]]
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_review_fixes(con):
    """Regression tests for the round-5 self-review findings."""
    import datetime

    t = con.memtable({"i": [1, 2, 3, 4], "x": [1.0, 2.0, 3.0, 4.0]})
    # one-sided legacy frames leave the other side UNBOUNDED (builders.py:243)
    rw = ib.rows_window(preceding=1, order_by=t.i)
    out = t.mutate(s=t.x.sum().over(rw)).order_by(t.i).execute()
    assert out["s"].tolist() == [10.0, 10.0, 9.0, 7.0]  # [i-1, end]
    fw = ib.rows_window(following=1, order_by=t.i)
    out2 = t.mutate(s=t.x.sum().over(fw)).order_by(t.i).execute()
    assert out2["s"].tolist() == [3.0, 6.0, 10.0, 10.0]  # [unbounded, i+1]
    # off-center tuple frame
    tw = ib.rows_window(preceding=(3, 1), order_by=t.i)
    out3 = t.mutate(s=t.x.sum().over(tw)).order_by(t.i).execute()
    assert out3["s"].tolist()[3] == 6.0  # rows i-3..i-1 for i=4
    # ungrouped HAVING is applied, not dropped
    kept = ib.aggregate(t, total=ib._.x.sum(), having=ib._.x.sum() > 5)
    assert kept.execute()["total"].tolist() == [10.0]
    empty = ib.aggregate(t, total=ib._.x.sum(), having=ib._.x.sum() > 99)
    assert len(empty.execute()) == 0
    # equals distinguishes same-named columns from different relations
    t2 = con.memtable({"x": [9.0]})
    assert not t.x.equals(t2.x)
    assert t.x.equals(t.x)
    # sub-second watermark delays survive
    assert ib.watermark("ts", datetime.timedelta(milliseconds=500)) == (
        "ts",
        "500 milliseconds",
    )
    # JSON .str rejects multi-value garbage that bracket-wraps validly
    g = con.memtable({"js": ['"a","b"', '"ok"']})
    vals = g.select(s=g.js.str).execute()["s"].tolist()
    assert pd.isna(vals[0]) and vals[1] == "ok"
    # get_backend returns the registered instance
    ib.set_backend(con)
    assert t.get_backend() is con


def test_grouped_select_and_over(con):
    """GroupedTable.select projects only the windowed expressions;
    GroupedTable.over attaches a frame; scalar lifts (x / x.sum())
    re-bind to the group window, not a broadcast cross join."""
    t = con.memtable(
        {"g": ["a", "a", "a", "b", "b"], "i": [1, 2, 3, 1, 2],
         "x": [1.0, 2.0, 3.0, 10.0, 20.0]}
    )
    s = t.group_by("g").select(total=t.x.sum(), frac=t.x / t.x.sum())
    out = s.execute()
    assert list(out.columns) == ["total", "frac"]
    assert sorted(out["total"]) == [6.0, 6.0, 6.0, 30.0, 30.0]
    g2 = t.group_by("g").over(rows=(-1, 0), order_by=t.i)
    m = g2.mutate(trail=t.x.sum()).order_by("g", "i").execute()
    assert m["trail"].tolist() == [1.0, 3.0, 5.0, 10.0, 30.0]
    m2 = t.group_by("g").mutate(frac=t.x / t.x.sum()).order_by("g", "i").execute()
    assert "x" in m2.columns
    assert abs(m2["frac"].tolist()[0] - 1 / 6) < 1e-9


def test_string_plus_and_star_dispatch(con):
    """ibis string operators: + concatenates (StringConcat), * repeats
    (strings.py:1719) — dispatched from the schema without plan analysis;
    numeric fields keep arithmetic semantics."""
    t = con.memtable({"s": ["ab", "c"], "n": [2, 3]})
    out = t.select(
        r=t.s * 2, r2=2 * t.s, plus=t.s + "!", rplus="!" + t.s, mul=t.n * 2
    ).execute()
    assert out["r"].tolist() == ["abab", "cc"]
    assert out["r2"].tolist() == ["abab", "cc"]
    assert out["plus"].tolist() == ["ab!", "c!"]
    assert out["rplus"].tolist() == ["!ab", "!c"]
    assert out["mul"].tolist() == [4, 6]
    # string field + string field concatenates too
    u = con.memtable({"a": ["x"], "b": ["y"]})
    assert u.select(c=u.a + u.b).execute()["c"].tolist() == ["xy"]


def test_get_name_and_equals_connect_safe(con, orders, monkeypatch):
    """get_name/equals must not require DataFrame._jdf (absent under Spark
    Connect). get_name's primary path is the public semanticHash(); when
    even that fails, the schema-digest fallback must kick in rather than
    raise. The monkeypatch blocks _jdf after pre-caching the schema —
    modelling Connect, where .schema works without a JVM handle."""
    t = orders.select("o_orderkey")
    u = orders.select("o_orderkey")

    # normal session: stable plan-derived name, semantic equality
    assert t.get_name() == u.get_name()
    assert t.get_name().startswith("ibis_spark_table_")
    assert t.equals(u)
    assert not t.equals(orders.select("o_custkey"))

    # pre-cache schemas (classic pyspark fetches schema via _jdf once,
    # then caches; under Connect .schema never needs a JVM handle)
    _ = t.to_spark().schema, u.to_spark().schema

    def _raise(self):
        raise AttributeError("_jdf is unavailable under Spark Connect")

    monkeypatch.setattr(
        type(t.to_spark()), "_jdf", property(_raise), raising=False
    )
    name = t.get_name()  # must not raise
    assert name.startswith("ibis_spark_table_")
    assert name == u.get_name()  # same schema -> same fallback digest


def test_quantile_approx_escape(con):
    """quantile/median accept approx=True — the constant-memory sketch
    path for hot groups (the exact path buffers whole groups; see the
    docstring's 100 TB note)."""
    t = con.memtable({"g": ["a"] * 50 + ["b"] * 50, "v": list(range(100))})
    out = (
        t.group_by("g")
        .aggregate(
            med=t.v.median(approx=True),
            q90=t.v.quantile(0.9, approx=True),
            qs=t.v.quantile([0.25, 0.75], approx=True),
        )
        .order_by("g")
        .execute()
    )
    assert len(out) == 2
    # sketch is exact at this tiny size: group a holds 0..49, b holds 50..99
    assert abs(out["med"][0] - 24) <= 1 and abs(out["med"][1] - 74) <= 1
    assert abs(out["q90"][0] - 44) <= 1 and abs(out["q90"][1] - 94) <= 1
    assert len(out["qs"][0]) == 2
