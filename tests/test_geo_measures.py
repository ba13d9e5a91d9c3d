"""Linestring + measures geo slice (round 10): constructors, lengths,
counts, bbox/envelope, vertex accessors, centroid, flip, azimuth,
intersects — reference ibis/expr/operations/geospatial.py:92-497.

Fixtures use 3-4-5 integer right triangles and dyadic-rational
coordinates throughout, so every expected value (length 5, centroid
492/96) is EXACT in FP and the asserts are equality, not approx."""

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


SQ4 = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
SQ10 = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
HOLE13 = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
DIAMOND345 = [(0.0, 0.0), (3.0, 4.0), (6.0, 0.0), (3.0, -4.0), (0.0, 0.0)]


class TestGeoMeasures:
    def _tbl(self, con, geoms):
        return con.memtable(
            [(i, g) for i, g in enumerate(geoms)],
            schema={"i": "int64", "g": "binary"},
        )

    def _vals(self, t, expr):
        rows = t.select("i", v=expr).df.collect()
        return {r.i: r.v for r in rows}

    def test_geo_linestring_constructor(self, con):
        from ibis_spark import geo

        rows = [
            (1, [0.0, 3.0, 6.0], [0.0, 4.0, 0.0]),
            (2, [1.5], [2.5]),            # too short
            (3, [0.0, 1.0, 2.0], [0.0, 1.0]),  # size mismatch
            (4, [0.0, float("nan")], [0.0, 1.0]),  # out of domain
        ]
        t = con.memtable(
            rows,
            schema={"i": "int64", "xs": "array<float64>", "ys": "array<float64>"},
        )
        got = {
            r.i: r.g
            for r in t.select("i", g=geo.geo_linestring(t.xs, t.ys)).df.collect()
        }
        assert bytes(got[1]) == _line([(0, 0), (3, 4), (6, 0)])
        assert got[2] is None and got[3] is None and got[4] is None

    def test_geo_length_and_perimeter(self, con):
        from ibis_spark import geo

        t = self._tbl(
            con,
            [
                _line([(0.0, 0.0), (3.0, 4.0), (6.0, 0.0)]),  # 5 + 5
                _pt(7.0, 8.0),
                _poly(SQ4),
                _poly(SQ10, HOLE13),  # 40 + 8
                _poly(DIAMOND345),    # 4 x 5
                b"\x00\x01\x02",      # foreign
            ],
        )
        lens = self._vals(t, geo.geo_length(t.g))
        assert lens[0] == 10.0
        assert lens[1] == 0.0 and lens[2] == 0.0 and lens[3] == 0.0
        assert lens[5] is None
        per = self._vals(t, geo.geo_perimeter(t.g))
        assert per[0] == 0.0 and per[1] == 0.0
        assert per[2] == 16.0
        assert per[3] == 48.0
        assert per[4] == 20.0
        assert per[5] is None

    def test_geo_counts_and_type(self, con):
        from ibis_spark import geo

        t = self._tbl(
            con,
            [
                _pt(1.0, 2.0),
                _line([(0.0, 0.0), (3.0, 4.0), (6.0, 0.0)]),
                _poly(SQ10, HOLE13),
                b"\x00\x01\x02",
            ],
        )
        np_ = self._vals(t, geo.geo_n_points(t.g))
        assert np_ == {0: 1, 1: 3, 2: 10, 3: None}
        nr = self._vals(t, geo.geo_n_rings(t.g))
        assert nr == {0: 0, 1: 0, 2: 2, 3: None}
        ty = self._vals(t, geo.geo_geometry_type(t.g))
        assert ty == {0: "POINT", 1: "LINESTRING", 2: "POLYGON", 3: None}

    def test_geo_bbox_and_envelope(self, con):
        from ibis_spark import geo

        diamond = [(2.0, 0.0), (4.0, 2.0), (2.0, 4.0), (0.0, 2.0), (2.0, 0.0)]
        t = self._tbl(
            con,
            [
                _poly(diamond),
                _line([(1.0, -2.0), (5.0, 6.0)]),
                _pt(3.5, -7.25),
                _line([(2.0, 1.0), (2.0, 9.0)]),  # vertical -> envelope LINESTRING
                b"\xff\xfe",
            ],
        )
        for expr, exp in (
            (geo.geo_x_min(t.g), {0: 0.0, 1: 1.0, 2: 3.5, 3: 2.0, 4: None}),
            (geo.geo_x_max(t.g), {0: 4.0, 1: 5.0, 2: 3.5, 3: 2.0, 4: None}),
            (geo.geo_y_min(t.g), {0: 0.0, 1: -2.0, 2: -7.25, 3: 1.0, 4: None}),
            (geo.geo_y_max(t.g), {0: 4.0, 1: 6.0, 2: -7.25, 3: 9.0, 4: None}),
        ):
            assert self._vals(t, expr) == exp
        env = self._vals(t, geo.geo_envelope(t.g))
        assert bytes(env[0]) == _poly(
            [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
        )
        assert bytes(env[1]) == _poly(
            [(1.0, -2.0), (5.0, -2.0), (5.0, 6.0), (1.0, 6.0), (1.0, -2.0)]
        )
        assert bytes(env[2]) == _pt(3.5, -7.25)
        assert bytes(env[3]) == _line([(2.0, 1.0), (2.0, 9.0)])
        assert env[4] is None

    def test_geo_start_end_point_n(self, con):
        from ibis_spark import geo

        line = _line([(0.0, 0.0), (3.0, 4.0), (6.0, 0.0)])
        t = self._tbl(con, [line, _pt(1.0, 1.0), _poly(SQ4)])
        sp = self._vals(t, geo.geo_start_point(t.g))
        ep = self._vals(t, geo.geo_end_point(t.g))
        assert bytes(sp[0]) == _pt(0.0, 0.0)
        assert bytes(ep[0]) == _pt(6.0, 0.0)
        # NULL for non-linestrings (the reference's documented contract)
        assert sp[1] is None and sp[2] is None
        assert ep[1] is None and ep[2] is None
        # point_n: 1-based, negative counts from the end, 0/overflow NULL
        for n, exp in [
            (1, _pt(0.0, 0.0)),
            (2, _pt(3.0, 4.0)),
            (3, _pt(6.0, 0.0)),
            (-1, _pt(6.0, 0.0)),
            (-3, _pt(0.0, 0.0)),
            (0, None),
            (4, None),
            (-4, None),
        ]:
            got = self._vals(t, geo.geo_point_n(t.g, n))
            if exp is None:
                assert got[0] is None, n
            else:
                assert bytes(got[0]) == exp, n
            assert got[1] is None and got[2] is None

    def test_geo_centroid(self, con):
        from ibis_spark import geo

        t = self._tbl(
            con,
            [
                _pt(9.0, -3.5),
                _line([(0.0, 0.0), (3.0, 4.0), (6.0, 0.0)]),
                _line([(2.0, 3.0), (2.0, 3.0)]),  # zero length
                _poly(SQ4),
                _poly(SQ10, HOLE13),
                # clockwise square: winding-insensitive
                _poly(list(reversed(SQ4))),
                b"\x00",
            ],
        )
        got = self._vals(t, geo.geo_centroid(t.g))
        assert bytes(got[0]) == _pt(9.0, -3.5)
        # two 5-length segments, midpoints (1.5,2) and (4.5,2)
        assert bytes(got[1]) == _pt(3.0, 2.0)
        assert bytes(got[2]) == _pt(2.0, 3.0)
        assert bytes(got[3]) == _pt(2.0, 2.0)
        # (100*5 - 4*2) / 96 = 492/96 = 5.125 exactly, both axes
        assert bytes(got[4]) == _pt(5.125, 5.125)
        assert bytes(got[5]) == _pt(2.0, 2.0)
        assert got[6] is None

    def test_geo_flip_coordinates(self, con):
        from ibis_spark import geo

        line = _line([(0.0, 1.0), (2.0, 3.0), (4.0, 5.0)])
        poly = _poly(SQ10, HOLE13)
        t = self._tbl(con, [_pt(1.5, -2.25), line, poly, b"\x00\x09"])
        got = self._vals(t, geo.geo_flip_coordinates(t.g))
        assert bytes(got[0]) == _pt(-2.25, 1.5)
        assert bytes(got[1]) == _line([(1.0, 0.0), (3.0, 2.0), (5.0, 4.0)])
        assert bytes(got[2]) == _poly(
            [(y, x) for x, y in SQ10], [(y, x) for x, y in HOLE13]
        )
        assert got[3] is None
        # involution: flip(flip(g)) == g byte-for-byte
        t2 = t.mutate(f2=geo.geo_flip_coordinates(geo.geo_flip_coordinates(t.g)))
        for r in t2.df.collect():
            if r.g is not None and bytes(r.g)[:1] == b"\x01":
                assert bytes(r.f2) == bytes(r.g)

    def test_geo_azimuth(self, con):
        from ibis_spark import geo

        origin = _pt(0.0, 0.0)
        cases = [
            (_pt(0.0, 1.0), 0.0),                 # north
            (_pt(1.0, 0.0), math.pi / 2),          # east
            (_pt(0.0, -1.0), math.pi),             # south
            (_pt(-1.0, 0.0), 3 * math.pi / 2),     # west
            (_pt(1.0, 1.0), math.atan2(1.0, 1.0)),  # northeast
            (_pt(0.0, 0.0), None),                 # coincident -> NULL
        ]
        t = con.memtable(
            [(i, origin, b) for i, (b, _) in enumerate(cases)],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        got = self._vals(t, geo.geo_azimuth(t.a, t.b))
        for i, (_, exp) in enumerate(cases):
            assert got[i] == exp, i

    def test_geo_intersects(self, con):
        from ibis_spark import geo

        sq = _poly(SQ10)
        holed = _poly(SQ10, [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0), (2.0, 2.0)])
        cases = [
            # (a, b, expected)
            (_pt(1.0, 2.0), _pt(1.0, 2.0), True),
            (_pt(1.0, 2.0), _pt(1.0, 2.5), False),
            # point on a segment (collinear-touch branch)
            (_pt(3.0, 4.0), _line([(0.0, 0.0), (6.0, 8.0)]), True),
            (_pt(3.0, 5.0), _line([(0.0, 0.0), (6.0, 8.0)]), False),
            # point vs polygon (ray-cast branch)
            (_pt(5.0, 5.0), sq, True),
            (_pt(15.0, 5.0), sq, False),
            (_pt(5.0, 5.0), holed, False),  # sealed inside the hole
            # line crossing / inside / disjoint polygon
            (_line([(-2.0, 5.0), (12.0, 5.0)]), sq, True),
            (_line([(4.0, 4.0), (6.0, 6.0)]), sq, True),   # fully inside
            (_line([(11.0, 0.0), (15.0, 4.0)]), sq, False),
            (_line([(4.0, 4.0), (6.0, 6.0)]), holed, False),  # inside hole
            # line/line
            (_line([(0.0, 0.0), (4.0, 4.0)]), _line([(0.0, 4.0), (4.0, 0.0)]), True),
            (_line([(0.0, 0.0), (4.0, 4.0)]), _line([(5.0, 0.0), (9.0, 4.0)]), False),
            # poly/poly: overlap, nested, disjoint, shared vertex
            (sq, _poly([(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0)]), True),
            (sq, _poly([(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0), (3.0, 3.0)]), True),
            (sq, _poly([(20.0, 0.0), (30.0, 0.0), (30.0, 10.0), (20.0, 10.0), (20.0, 0.0)]), False),
            (sq, _poly([(10.0, 10.0), (20.0, 10.0), (20.0, 20.0), (10.0, 20.0), (10.0, 10.0)]), True),  # vertex touch
            # nested inside a hole: no contact
            (holed, _poly([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]), False),
            # foreign bytes -> NULL
            (b"\x00\x01", sq, None),
        ]
        t = con.memtable(
            [(i, a, b) for i, (a, b, _) in enumerate(cases)],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        got = self._vals(t, geo.geo_intersects(t.a, t.b))
        for i, (_, _, exp) in enumerate(cases):
            assert got[i] == exp, i
        # symmetry on a few representative pairs
        got_r = self._vals(t, geo.geo_intersects(t.b, t.a))
        for i, (_, _, exp) in enumerate(cases):
            assert got_r[i] == exp, f"symmetry {i}"

    def test_geo_line_locate_point(self, con):
        from ibis_spark import geo

        line = _line([(0.0, 0.0), (3.0, 4.0), (9.0, -4.0)])  # lens 5, 10
        cases = [
            # (point, expected fraction)
            (_pt(0.0, 0.0), 0.0),                  # start vertex
            (_pt(9.0, -4.0), 1.0),                 # end vertex
            (_pt(3.0, 8.0), 5.0 / 15.0),           # ties -> FIRST best edge
            (_pt(6.0, 0.0), 10.0 / 15.0),          # interior of edge 2, d=0
            (_pt(1.5, 2.0), 2.5 / 15.0),           # midpoint of edge 1
        ]
        t = con.memtable(
            [(i, line, p) for i, (p, _) in enumerate(cases)],
            schema={"i": "int64", "g": "binary", "p": "binary"},
        )
        got = self._vals(t, geo.geo_line_locate_point(t.g, t.p))
        for i, (_, exp) in enumerate(cases):
            assert got[i] == exp, i
        # non-linestring and zero-length inputs
        t2 = self._tbl(con, [_pt(1.0, 1.0), _line([(2.0, 3.0), (2.0, 3.0)])])
        t2 = t2.mutate(p2=(t2.i * 0.0))
        got2 = self._vals(
            t2, geo.geo_line_locate_point(t2.g, geo.geo_point(t2.p2, t2.p2))
        )
        assert got2[0] is None      # point input -> NULL
        assert got2[1] == 0.0       # zero-length line -> 0.0

    def test_geo_line_substring(self, con):
        from ibis_spark import geo

        line = _line([(0.0, 0.0), (3.0, 4.0), (9.0, -4.0)])  # L = 15
        t = self._tbl(con, [line, _pt(1.0, 1.0)])
        # [0.25, 0.75] -> arc 3.75..11.25: interp on edge1 at t=0.75,
        # keep vertex (3,4) at arc 5, interp on edge2 at t=0.625 —
        # every coordinate dyadic, asserts exact
        got = self._vals(t, geo.geo_line_substring(t.g, 0.25, 0.75))
        assert bytes(got[0]) == _line([(2.25, 3.0), (3.0, 4.0), (6.75, -1.0)])
        assert got[1] is None
        # full line reproduces the input bytes
        full = self._vals(t, geo.geo_line_substring(t.g, 0.0, 1.0))
        assert bytes(full[0]) == line
        # degenerate start == end -> 2-vertex linestring at that point
        degen = self._vals(t, geo.geo_line_substring(t.g, 1.0 / 3.0, 1.0 / 3.0))
        import struct as _s
        n, = _s.unpack("<I", bytes(degen[0])[5:9])
        assert n == 2
        xs = _s.unpack("<dd", bytes(degen[0])[9:25])
        assert xs == (3.0, 4.0)  # arc 5 = shared vertex
        # validation
        with pytest.raises(ValueError):
            geo.geo_line_substring(t.g, 0.8, 0.2)

    def test_geo_multipoint_and_multis(self, con):
        from ibis_spark import geo
        import struct as _s

        def _mpt(pts):
            return _s.pack("<BII", 1, 4, len(pts)) + b"".join(
                _pt(x, y) for x, y in pts
            )

        def _mline(lines):
            return _s.pack("<BII", 1, 5, len(lines)) + b"".join(
                _line(l) for l in lines
            )

        def _mpoly(polys):
            return _s.pack("<BII", 1, 6, len(polys)) + b"".join(
                _poly(*p) for p in polys
            )

        mpt = _mpt([(1.0, 2.0), (3.0, -4.0), (0.5, 0.25)])
        mline = _mline([[(0.0, 0.0), (3.0, 4.0)], [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)]])
        mpoly = _mpoly([[SQ4], [SQ10, HOLE13]])
        t = self._tbl(con, [mpt, mline, mpoly])
        ty = self._vals(t, geo.geo_geometry_type(t.g))
        assert ty == {0: "MULTIPOINT", 1: "MULTILINESTRING", 2: "MULTIPOLYGON"}
        np_ = self._vals(t, geo.geo_n_points(t.g))
        assert np_ == {0: 3, 1: 5, 2: 15}
        # geometry_n slices full child WKB values, 1-based
        g2 = self._vals(t, geo.geo_geometry_n(t.g, 2))
        assert bytes(g2[0]) == _pt(3.0, -4.0)
        assert bytes(g2[1]) == _line([(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)])
        assert bytes(g2[2]) == _poly(SQ10, HOLE13)
        for bad in (0, 4, -1):
            gb = self._vals(t, geo.geo_geometry_n(t.g, bad))
            assert gb == {0: None, 1: None, 2: None}, bad
        # single geometry: n=1 returns the input itself
        t1 = self._tbl(con, [_pt(7.0, 8.0)])
        assert bytes(self._vals(t1, geo.geo_geometry_n(t1.g, 1))[0]) == _pt(7.0, 8.0)
        # bbox + envelope + centroid over MULTIPOINT
        assert self._vals(t, geo.geo_x_min(t.g))[0] == 0.5
        assert self._vals(t, geo.geo_y_max(t.g))[0] == 2.0
        cen = self._vals(t, geo.geo_centroid(t.g))
        assert bytes(cen[0]) == _pt((1.0 + 3.0 + 0.5) / 3.0, (2.0 - 4.0 + 0.25) / 3.0)
        # constructor matches the packed layout
        t2 = con.memtable(
            [(1, [1.0, 3.0, 0.5], [2.0, -4.0, 0.25])],
            schema={"i": "int64", "xs": "array<float64>", "ys": "array<float64>"},
        )
        got = t2.select(g=geo.geo_multipoint(t2.xs, t2.ys)).df.collect()[0].g
        assert bytes(got) == mpt

    def test_geo_unary_union(self, con):
        from ibis_spark import geo
        import struct as _s

        # two groups; group 1 has a DUPLICATE point that must collapse
        rows = [
            (1, _pt(3.0, 4.0)),
            (1, _pt(1.0, 2.0)),
            (1, _pt(3.0, 4.0)),
            (2, _pt(-1.0, 0.0)),
        ]
        t = con.memtable(rows, schema={"grp": "int64", "p": "binary"})
        agg = t.group_by("grp").aggregate(mp=geo.geo_unary_union(t.p))
        got = {r.grp: bytes(r.mp) for r in agg.df.collect()}
        n1, = _s.unpack("<I", got[1][5:9])
        assert n1 == 2  # duplicate collapsed
        n2, = _s.unpack("<I", got[2][5:9])
        assert n2 == 1
        # children are full point WKBs, sorted by bytes (deterministic)
        kids = [got[1][9 + 21 * i: 9 + 21 * (i + 1)] for i in range(2)]
        assert sorted(kids) == kids
        assert set(kids) == {_pt(3.0, 4.0), _pt(1.0, 2.0)}
        # non-point member poisons the group to NULL
        rows2 = rows + [(2, _line([(0.0, 0.0), (1.0, 1.0)]))]
        t2 = con.memtable(rows2, schema={"grp": "int64", "p": "binary"})
        agg2 = t2.group_by("grp").aggregate(mp=geo.geo_unary_union(t2.p))
        got2 = {r.grp: r.mp for r in agg2.df.collect()}
        assert got2[2] is None and got2[1] is not None

    def test_geo_max_distance_fully_within(self, con):
        from ibis_spark import geo

        sq_far = _poly([(10.0, 10.0), (14.0, 10.0), (14.0, 14.0),
                        (10.0, 14.0), (10.0, 10.0)])
        cases = [
            # (a, b, expected max distance)
            (_pt(0.0, 0.0), _pt(3.0, 4.0), 5.0),
            (_pt(0.0, 0.0), _line([(3.0, 4.0), (6.0, 8.0)]), 10.0),
            (_poly(SQ4), sq_far, math.sqrt(392.0)),  # (0,0)-(14,14)
            # center of SQ4: all four corners at sqrt(8)
            (_pt(2.0, 2.0), _poly(SQ4), math.sqrt(8.0)),
            (b"\x00", _pt(0.0, 0.0), None),
        ]
        t = con.memtable(
            [(i, a, b) for i, (a, b, _) in enumerate(cases)],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        got = self._vals(t, geo.geo_max_distance(t.a, t.b))
        for i, (_, _, exp) in enumerate(cases):
            assert got[i] == exp, (i, got[i])
        # fully-within: boundary inclusive, squared-domain compare
        fw5 = self._vals(t, geo.geo_d_fully_within(t.a, t.b, 5.0))
        assert fw5[0] is True and fw5[1] is False and fw5[4] is None
        fw10 = self._vals(t, geo.geo_d_fully_within(t.a, t.b, 10.0))
        assert fw10[1] is True
        fwneg = self._vals(t, geo.geo_d_fully_within(t.a, t.b, -1.0))
        assert fwneg[0] is False


class TestGeoNullPropagation:
    """r11 ADVICE fixes: out-of-codec-domain foreign WKB must degrade
    the whole result to NULL, never silently drop a vertex/edge."""

    def _tbl(self, con, geoms):
        return con.memtable(
            [(i, g) for i, g in enumerate(geoms)],
            schema={"i": "int64", "g": "binary"},
        )

    def _vals(self, t, expr):
        rows = t.select("i", v=expr).df.collect()
        return {r.i: r.v for r in rows}

    def test_max_distance_null_vertex_propagates(self, con):
        from ibis_spark import geo

        far = 2.0**62  # outside the |x| <= 2**61 codec domain
        bad_line = _line([(0.0, 0.0), (far, 0.0)])
        good_line = _line([(0.0, 0.0), (3.0, 4.0)])
        t = con.memtable(
            [(0, _pt(0.0, 0.0), bad_line), (1, _pt(0.0, 0.0), good_line)],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        md = self._vals(t, geo.geo_max_distance(t.a, t.b))
        assert md[0] is None and md[1] == 5.0
        fw = self._vals(t, geo.geo_d_fully_within(t.a, t.b, 1e30))
        assert fw[0] is None and fw[1] is True

    def test_line_locate_point_null_y_gate(self, con):
        from ibis_spark import geo

        line = _line([(0.0, 0.0), (10.0, 0.0)])
        bad_pt = _pt(1.0, 2.0**62)  # y outside codec domain
        t = con.memtable(
            [(0, line, bad_pt), (1, line, _pt(5.0, 1.0))],
            schema={"i": "int64", "l": "binary", "p": "binary"},
        )
        got = self._vals(t, geo.geo_line_locate_point(t.l, t.p))
        assert got[0] is None and got[1] == 0.5

    def test_contains_null_vertex_propagates(self, con):
        from ibis_spark import geo

        far = 2.0**62
        bad_poly = _poly(
            [(0.0, 0.0), (4.0, 0.0), (far, 4.0), (0.0, 4.0), (0.0, 0.0)]
        )
        t = con.memtable(
            [(0, bad_poly, _pt(1.0, 1.0)), (1, _poly(SQ4), _pt(1.0, 1.0))],
            schema={"i": "int64", "poly": "binary", "p": "binary"},
        )
        got = self._vals(t, geo.geo_contains(t.poly, t.p))
        assert got[0] is None and got[1] is True

    def test_polygon_ctor_empty_arrays_null(self, con):
        """Empty coordinate arrays must fall through to NULL (the
        pre-r11 element_at(1) threw under ANSI mode)."""
        from ibis_spark import geo

        t = con.memtable(
            [(0, [], []), (1, [0.0, 4.0, 0.0], [0.0, 0.0, 4.0])],
            schema={
                "i": "int64",
                "xs": "array<float64>",
                "ys": "array<float64>",
            },
        )
        got = self._vals(t, geo.geo_polygon(t.xs, t.ys))
        assert got[0] is None and got[1] is not None
        line = self._vals(t, geo.geo_linestring(t.xs, t.ys))
        assert line[0] is None and line[1] is not None

    def test_line_locate_point_null_line_vertex(self, con):
        from ibis_spark import geo

        bad_line = _line([(0.0, 0.0), (2.0**62, 0.0)])
        t = con.memtable(
            [(0, bad_line, _pt(1.0, 1.0))],
            schema={"i": "int64", "l": "binary", "p": "binary"},
        )
        got = self._vals(t, geo.geo_line_locate_point(t.l, t.p))
        assert got[0] is None
