"""Decode-once geo architecture (round 11): geo_decode / geo_encode /
DecodedGeo dispatch / decoded=True constructors.

The load-bearing contract is FORM EQUIVALENCE: for every measure and
predicate, WKB input and decoded input produce identical results (same
values, same NULL posture), and geometry-returning ops round-trip
through geo_encode bit-exactly.  Fixtures are the same dyadic/3-4-5
shapes as test_geo_measures, so equality is exact, not approx."""

from __future__ import annotations

import math
import struct

import pytest


def _pt(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)


def _line(pts):
    return (
        struct.pack("<BII", 1, 2, len(pts))
        + b"".join(struct.pack("<dd", x, y) for x, y in pts)
    )


def _poly(*rings):
    out = struct.pack("<BII", 1, 3, len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring))
        out += b"".join(struct.pack("<dd", x, y) for x, y in ring)
    return out


def _mpt(pts):
    return struct.pack("<BII", 1, 4, len(pts)) + b"".join(
        struct.pack("<BIdd", 1, 1, x, y) for x, y in pts
    )


def _mline(lines):
    return struct.pack("<BII", 1, 5, len(lines)) + b"".join(
        _line(l) for l in lines
    )


SQ4 = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
HOLE13 = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
L345 = [(0.0, 0.0), (3.0, 4.0), (9.0, -4.0)]

FIXTURES = [
    _pt(1.5, -2.0),
    _line(L345),
    _poly(SQ4),
    _poly(SQ4, HOLE13),
    _mpt([(1.0, 2.0), (3.0, 4.0), (1.0, 2.0)]),
    _mline([[(0.0, 0.0), (3.0, 4.0)], [(2.0, 2.0), (2.0, 6.0), (5.0, 2.0)]]),
    None,
    b"\x00foreign",
]


class TestDecodedParity:
    def _both(self, con):
        """(i, g WKB, d decoded-materialized) table."""
        from ibis_spark import geo

        t = con.memtable(
            [(i, g) for i, g in enumerate(FIXTURES)],
            schema={"i": "int64", "g": "binary"},
        )
        return t.mutate(d=geo.geo_decode(t.g))

    def _cmp(self, t, mk):
        """Assert measure(g WKB) == measure(d decoded) row by row."""
        rows = t.select("i", w=mk(t.g), e=mk(t.d)).df.collect()
        for r in rows:
            assert r.w == r.e, (r.i, r.w, r.e)
        return {r.i: r.w for r in rows}

    def test_roundtrip_encode_decode(self, con):
        from ibis_spark import geo

        t = self._both(con)
        rows = t.select("i", "g", rt=geo.geo_encode(t.d)).df.collect()
        for r in rows:
            if r.g is not None and r.g[:1] == b"\x01":
                assert r.rt == r.g, r.i
            else:
                assert r.rt is None, r.i

    def test_scalar_measures_parity(self, con):
        from ibis_spark import geo

        t = self._both(con)
        got = self._cmp(t, geo.geo_length)
        assert got[1] == 15.0 and got[2] == 0.0 and got[6] is None
        got = self._cmp(t, geo.geo_perimeter)
        assert got[2] == 16.0 and got[3] == 24.0 and got[1] == 0.0
        got = self._cmp(t, geo.geo_geometry_type)
        assert got[0] == "POINT" and got[5] == "MULTILINESTRING"
        got = self._cmp(t, geo.geo_n_points)
        assert got[3] == 10 and got[4] == 3 and got[5] == 5
        got = self._cmp(t, geo.geo_n_rings)
        assert got[3] == 2 and got[0] == 0
        got = self._cmp(t, geo.geo_area)
        assert got[2] == 16.0 and got[3] == 12.0 and got[1] is None
        got = self._cmp(t, geo.geo_x_min)
        assert got[1] == 0.0 and got[4] == 1.0
        got = self._cmp(t, geo.geo_x_max)
        assert got[1] == 9.0
        got = self._cmp(t, geo.geo_y_min)
        assert got[1] == -4.0
        got = self._cmp(t, geo.geo_y_max)
        assert got[3] == 4.0
        got = self._cmp(t, geo.geo_x)
        assert got[0] == 1.5 and got[1] is None
        got = self._cmp(t, geo.geo_y)
        assert got[0] == -2.0

    def test_geometry_returning_parity(self, con):
        """start/end/point_n/centroid/envelope/flip: decoded results
        re-encode to the same bytes the WKB path emits."""
        from ibis_spark import geo

        t = self._both(con)

        def enc(mk):
            rows = t.select(
                "i", w=mk(t.g), e=geo.geo_encode(mk(geo.decoded(t.d)))
            ).df.collect()
            for r in rows:
                assert r.w == r.e, (r.i, r.w, r.e)

        enc(geo.geo_start_point)
        enc(geo.geo_end_point)
        enc(lambda g: geo.geo_point_n(g, 2))
        enc(lambda g: geo.geo_point_n(g, -1))
        enc(geo.geo_centroid)
        enc(geo.geo_envelope)
        enc(geo.geo_flip_coordinates)

    def test_pairwise_parity(self, con):
        from ibis_spark import geo

        geoms = [
            _pt(1.0, 1.0),
            _pt(20.0, 20.0),
            _line([(0.0, 0.0), (10.0, 10.0)]),
            _line([(0.0, 10.0), (10.0, 0.0)]),
            _poly(SQ4),
            _poly(SQ4, HOLE13),
        ]
        pairs = [(a, b) for a in geoms for b in geoms]
        t = con.memtable(
            [(i, a, b) for i, (a, b) in enumerate(pairs)],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        t = t.mutate(da=geo.geo_decode(t.a), db=geo.geo_decode(t.b))
        for mk in (
            geo.geo_intersects,
            geo.geo_max_distance,
            lambda a, b: geo.geo_d_fully_within(a, b, 15.0),
            geo.geo_contains,
        ):
            rows = t.select(
                "i", w=mk(t.a, t.b), e=mk(t.da, t.db), m=mk(t.da, t.b)
            ).df.collect()
            for r in rows:
                assert r.w == r.e, (r.i, r.w, r.e)
                assert r.w == r.m, (r.i, r.w, r.m)

    def test_point_ops_parity(self, con):
        from ibis_spark import geo

        t = con.memtable(
            [(0, _pt(0.0, 0.0), _pt(3.0, 4.0)), (1, _pt(1.0, 1.0), _pt(1.0, 1.0))],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        t = t.mutate(da=geo.geo_decode(t.a), db=geo.geo_decode(t.b))
        for mk in (
            geo.geo_distance,
            lambda a, b: geo.geo_dwithin(a, b, 5.0),
            geo.geo_equals,
            geo.geo_azimuth,
        ):
            rows = t.select("i", w=mk(t.a, t.b), e=mk(t.da, t.db)).df.collect()
            for r in rows:
                assert r.w == r.e, (r.i, r.w, r.e)

    def test_line_locate_and_substring(self, con):
        from ibis_spark import geo

        line = _line([(0.0, 0.0), (3.0, 4.0), (9.0, -4.0)])
        t = con.memtable(
            [(0, line, _pt(3.0, 8.0)), (1, line, _pt(6.0, 0.0))],
            schema={"i": "int64", "l": "binary", "p": "binary"},
        )
        t = t.mutate(dl=geo.geo_decode(t.l), dp=geo.geo_decode(t.p))
        rows = t.select(
            "i",
            w=geo.geo_line_locate_point(t.l, t.p),
            e=geo.geo_line_locate_point(t.dl, t.dp),
        ).df.collect()
        for r in rows:
            assert r.w == r.e, (r.i, r.w, r.e)
        rows = t.select(
            "i",
            w=geo.geo_line_substring(t.l, 0.25, 0.75),
            e=geo.geo_encode(geo.geo_line_substring(t.dl, 0.25, 0.75)),
        ).df.collect()
        for r in rows:
            assert r.w == r.e, r.i

    def test_decoded_constructors(self, con):
        """decoded=True ctors == geo_decode(WKB ctor) for in-domain
        input; NULL contract matches (mismatch/short/out-of-domain)."""
        from ibis_spark import geo

        t = con.memtable(
            [
                (0, [0.0, 3.0, 9.0], [0.0, 4.0, -4.0]),
                (1, [1.0], [2.0]),            # too short for a line
                (2, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0]),  # open ring
                (3, [0.0, 2.0**62], [0.0, 1.0]),  # out of domain
                (4, [0.0, 1.0], [0.0]),       # mismatched sizes
            ],
            schema={
                "i": "int64",
                "xs": "array<float64>",
                "ys": "array<float64>",
            },
        )
        for wkb_mk, dec_mk in (
            (
                lambda: geo.geo_linestring(t.xs, t.ys),
                lambda: geo.geo_linestring(t.xs, t.ys, decoded=True),
            ),
            (
                lambda: geo.geo_polygon(t.xs, t.ys),
                lambda: geo.geo_polygon(t.xs, t.ys, decoded=True),
            ),
            (
                lambda: geo.geo_multipoint(t.xs, t.ys),
                lambda: geo.geo_multipoint(t.xs, t.ys, decoded=True),
            ),
        ):
            rows = t.select(
                "i", w=wkb_mk(), e=geo.geo_encode(dec_mk())
            ).df.collect()
            for r in rows:
                assert r.w == r.e, (r.i, r.w, r.e)
        # point ctor
        t2 = con.memtable(
            [(0, 1.5, -2.0), (1, None, 3.0), (2, 2.0**62, 0.0)],
            schema={"i": "int64", "x": "float64", "y": "float64"},
        )
        rows = t2.select(
            "i",
            w=geo.geo_point(t2.x, t2.y),
            e=geo.geo_encode(geo.geo_point(t2.x, t2.y, decoded=True)),
        ).df.collect()
        for r in rows:
            assert r.w == r.e, (r.i, r.w, r.e)


def test_decoded_column_parquet_roundtrip(con, tmp_path):
    """The 100 TB guidance (SCALE.md round 11) is to STORE the decoded
    struct column: it must survive a parquet write/read with schema
    intact, measures must take the decoded fast path on the re-read
    column (source-schema detection), and geo_encode must still
    reproduce the original bytes."""
    from ibis_spark import geo

    t = con.memtable(
        [(i, g) for i, g in enumerate(FIXTURES) if g is not None],
        schema={"i": "int64", "g": "binary"},
    )
    t = t.mutate(d=geo.geo_decode(t.g))
    out = str(tmp_path / "geoms.parquet")
    t.select("i", "g", "d").to_parquet(out)
    r = con.read_parquet(out)
    rows = r.select(
        "i",
        n=geo.geo_n_points(r.d),          # schema-path decoded dispatch
        rt=(geo.geo_encode(r.d) == r.g),
        ln=geo.geo_length(r.d),
    ).df.collect()
    got = {x.i: x for x in rows}
    assert got[1].n == 3 and got[1].ln == 15.0 and got[1].rt is True
    assert got[3].n == 10 and got[3].rt is True   # holed polygon
    assert got[5].n == 5 and got[5].rt is True    # multilinestring
