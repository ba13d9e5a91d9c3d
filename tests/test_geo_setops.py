"""Geometric set operations (round 12): geo_intersection /
geo_difference / geo_union — reference
ibis/expr/operations/geospatial.py:362-468 (GeoUnion:362,
GeoDifference:375, GeoIntersection:388) — plus the MULTIPOLYGON
area/perimeter extensions that back their multipolygon results.

Fixtures are hand-verified exact geometry (integer coordinates,
power-of-two spans -> bit-exact expression arithmetic).  Every case
also checks the two algebraic identities that pin the piece
decomposition: area(a&b) + area(a-b) == area(a) and
area(a|b) == area(a) + area(b) - area(a&b)."""

from __future__ import annotations

import struct

import pytest


def _poly(*rings):
    out = struct.pack("<BII", 1, 3, len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring))
        out += b"".join(struct.pack("<dd", x, y) for x, y in ring)
    return out


def _sq(x0, y0, s):
    return [
        (x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)
    ]


TRI = [(0.0, 0.0), (6.0, 0.0), (3.0, 6.0), (0.0, 0.0)]
LSHAPE = [
    (0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0),
    (0.0, 4.0), (0.0, 0.0),
]
HEXA = [
    (2.0, 0.0), (4.0, 0.0), (6.0, 2.0), (4.0, 4.0), (2.0, 4.0),
    (0.0, 2.0), (2.0, 0.0),
]


@pytest.fixture(scope="module")
def setops(con):
    from ibis_spark import geo

    rows = [
        (0, _poly(_sq(0, 0, 4)), _poly(_sq(2, 0, 4))),    # overlap
        (1, _poly(_sq(0, 0, 4)), _poly(_sq(4, 0, 4))),    # edge touch
        (2, _poly(_sq(0, 0, 4)), _poly(_sq(10, 0, 4))),   # disjoint
        (3, _poly(_sq(0, 0, 4)), _poly(_sq(0, 0, 4))),    # equal
        (4, _poly(_sq(0, 0, 4)), _poly(_sq(1, 1, 2))),    # b inside a
        (5, _poly(_sq(1, 1, 2)), _poly(_sq(0, 0, 4))),    # a inside b
        (6, _poly(TRI), _poly(_sq(0, 0, 3))),             # triangle x square
        (7, _poly(LSHAPE), _poly(_sq(1, 1, 4))),          # non-convex subject
        (8, _poly(_sq(0, 0, 4)), _poly(LSHAPE)),          # non-convex CLIP
        (9, _poly(_sq(0, 0, 6)), _poly(HEXA)),            # convex hexagon
        (10, _poly(_sq(0, 0, 4), _sq(1, 1, 1)), _poly(_sq(0, 0, 2))),  # holed a
        (11, None, _poly(_sq(0, 0, 4))),                  # NULL propagation
        (12, _poly(_sq(0, 0, 4), _sq(1, 1, 1)), _poly(_sq(10, 10, 2))),  # holed a, disjoint b
        (13, _poly(LSHAPE), _poly(_sq(10, 10, 2))),       # non-convex a, disjoint b
    ]
    t = con.memtable(rows, schema={"i": "int64", "a": "binary", "b": "binary"})
    t = t.mutate(da=geo.geo_decode(t.a), db=geo.geo_decode(t.b))
    t = t.mutate(
        g_in=geo.geo_intersection(t.da, t.db),
        g_df=geo.geo_difference(t.da, t.db),
        g_un=geo.geo_union(t.da, t.db),
    )
    out = t.select(
        "i",
        ia=geo.geo_area(t.g_in),
        dfa=geo.geo_area(t.g_df),
        una=geo.geo_area(t.g_un),
        aa=geo.geo_area(t.da),
        ba=geo.geo_area(t.db),
        iw=geo.geo_as_text(t.g_in),
        dw=geo.geo_as_text(t.g_df),
        uw=geo.geo_as_text(t.g_un),
        it=geo.geo_geometry_type(t.g_in),
        dt=geo.geo_geometry_type(t.g_df),
        dperim=geo.geo_perimeter(t.g_df),
    ).df.collect()
    return {r.i: r for r in out}


class TestSetOps:
    def test_intersection_values(self, setops):
        r = setops
        assert r[0].ia == 8.0
        assert r[0].iw == "POLYGON ((2 0, 4 0, 4 4, 2 4, 2 0))"
        assert r[1].ia is None          # touching -> zero area -> NULL
        assert r[2].ia is None          # disjoint
        assert r[3].ia == 16.0          # equal
        assert r[4].ia == 4.0 and r[5].ia == 4.0
        assert r[6].ia == 6.75          # triangle clip, exact
        assert r[6].iw == "POLYGON ((0 0, 3 0, 3 3, 1.5 3, 0 0))"
        assert r[7].ia == 5.0           # non-convex subject stays exact
        assert r[9].ia == 16.0          # hexagon inside square
        assert r[10].ia == 3.0          # hole survives the clip
        assert r[10].iw == (
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
        )
        assert r[10].it == "POLYGON"

    def test_difference_and_union_values(self, setops):
        r = setops
        assert r[0].dfa == 8.0 and r[0].una == 24.0
        assert r[1].dfa == 16.0 and r[1].una == 32.0
        assert r[2].dfa == 16.0 and r[2].una == 32.0
        # disjoint: a passes through UNSPLIT as MULTIPOLYGON([a])
        assert r[2].dw == "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)))"
        assert r[2].uw == (
            "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
            "((10 0, 14 0, 14 4, 10 4, 10 0)))"
        )
        assert r[3].dfa == 0.0          # equal -> MULTIPOLYGON EMPTY
        assert r[3].dw == "MULTIPOLYGON EMPTY"
        assert r[3].una == 16.0
        assert r[4].dfa == 12.0 and r[4].una == 16.0
        assert r[5].dfa == 0.0 and r[5].una == 16.0
        assert r[6].dfa == 11.25 and r[6].una == 20.25
        assert r[7].dfa == 7.0          # non-convex subject difference
        assert r[9].dfa == 20.0 and r[9].una == 36.0
        # bbox-apart fast path: ANY polygons pass through, holes and
        # non-convex shapes included
        assert r[12].dfa == 15.0 and r[12].una == 19.0
        assert r[12].dw == (
            "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 2 1, 2 2, 1 2, 1 1)))"
        )
        assert r[13].dfa == 12.0 and r[13].una == 16.0
        assert r[0].dt == "MULTIPOLYGON"
        # multipolygon perimeter: [0,2]x[0,4] strip = 12
        assert r[0].dperim == 12.0

    def test_unsupported_inputs_null(self, setops):
        r = setops
        # non-convex CLIP with overlapping bbox degrades to NULL,
        # never a wrong ring
        assert r[8].ia is None and r[8].dfa is None and r[8].una is None
        # overlap branches require convexity / hole-freedom
        assert r[7].una is None
        assert r[10].dfa is None and r[10].una is None
        # NULL propagation
        assert r[11].ia is None and r[11].dfa is None and r[11].una is None

    def test_area_identities(self, setops):
        for i, r in setops.items():
            ia = r.ia if r.ia is not None else 0.0
            if r.dfa is not None and r.aa is not None:
                assert ia + r.dfa == pytest.approx(r.aa, abs=1e-9), i
            if r.una is not None and r.aa is not None and r.ba is not None:
                assert r.una == pytest.approx(r.aa + r.ba - ia, abs=1e-9), i


def test_setops_accept_wkb_and_decoded(con):
    """Both forms on both sides produce identical results (the ops
    decode internally when handed raw WKB)."""
    from ibis_spark import geo

    t = con.memtable(
        [(0, _poly(_sq(0, 0, 4)), _poly(_sq(2, 0, 4)))],
        schema={"i": "int64", "a": "binary", "b": "binary"},
    )
    t = t.mutate(da=geo.geo_decode(t.a), db=geo.geo_decode(t.b))
    r = t.select(
        w=geo.geo_area(geo.geo_intersection(t.a, t.b)),
        d=geo.geo_area(geo.geo_intersection(t.da, t.db)),
        m=geo.geo_area(geo.geo_intersection(t.a, t.db)),
    ).df.collect()[0]
    assert r.w == r.d == r.m == 8.0


def test_multipolygon_roundtrip_and_measures(con):
    """MULTIPOLYGON decode/encode byte round-trip + the r12 measure
    extensions (area with holes, perimeter, n_rings/n_points on both
    forms, WKT, validity, EWKB splice)."""
    from ibis_spark import geo

    def mpoly(*polys):
        return struct.pack("<BII", 1, 6, len(polys)) + b"".join(
            _poly(*p) for p in polys
        )

    g1 = mpoly([_sq(0, 0, 4), _sq(1, 1, 1)], [_sq(10, 10, 2)])
    g2 = mpoly([_sq(0, 0, 2)])
    g3 = struct.pack("<BII", 1, 6, 0)  # MULTIPOLYGON EMPTY
    t = con.memtable(
        [(0, g1), (1, g2), (2, g3), (3, None)],
        schema={"i": "int64", "g": "binary"},
    )
    t = t.mutate(d=geo.geo_decode(t.g))
    rows = t.select(
        "i",
        rt=(geo.geo_encode(t.d) == t.g),
        ar=geo.geo_area(t.d),
        arw=geo.geo_area(t.g),
        pe=geo.geo_perimeter(t.d),
        pew=geo.geo_perimeter(t.g),
        np=geo.geo_n_points(t.d),
        nr=geo.geo_n_rings(t.d),
        nrw=geo.geo_n_rings(t.g),
        ty=geo.geo_geometry_type(t.g),
        va=geo.geo_is_valid(t.g),
        wk=geo.geo_as_text(t.d),
        ew=geo.geo_as_ewkb(t.g, 4326),
    ).df.collect()
    r = {x.i: x for x in rows}
    assert r[0].rt and r[1].rt and r[2].rt
    assert r[0].ar == 19.0 and r[0].arw == 19.0     # 16 - 1 + 4
    assert r[0].pe == 16.0 + 4.0 + 8.0
    assert r[0].pew == r[0].pe
    assert r[0].np == 15 and r[0].nr == 3 and r[0].nrw == 3
    assert r[0].ty == "MULTIPOLYGON" and r[0].va
    assert r[1].wk == "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)))"
    assert r[2].wk == "MULTIPOLYGON EMPTY" and r[2].ar == 0.0
    assert r[0].ew == g1[:4] + b"\x20" + struct.pack("<I", 4326) + g1[5:]
    assert r[3].rt is None and r[3].ew is None


def test_geo_multipolygon_ctor(con):
    """geo_multipolygon builds the flattened encoding from decoded
    member polygons; non-polygon members NULL the result."""
    import ibis_spark as ib
    from ibis_spark import geo

    t = con.memtable([(2.0,)], schema={"x": "float64"})
    z = t.x - t.x
    p1 = geo.geo_polygon(
        ib.array(z, z + 4.0, z + 4.0, z),
        ib.array(z, z, z + 4.0, z + 4.0),
        decoded=True,
    )
    p2 = geo.geo_polygon(
        ib.array(z + 10.0, z + 12.0, z + 12.0, z + 10.0),
        ib.array(z + 10.0, z + 10.0, z + 12.0, z + 12.0),
        decoded=True,
    )
    pt = geo.geo_point(t.x, t.x, decoded=True)
    r = t.select(
        w=geo.geo_as_text(geo.geo_multipolygon(p1, p2)),
        a=geo.geo_area(geo.geo_multipolygon(p1, p2)),
        bad=geo.geo_as_text(geo.geo_multipolygon(p1, pt)),
    ).df.collect()[0]
    assert r.w == (
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "((10 10, 12 10, 12 12, 10 12, 10 10)))"
    )
    assert r.a == 20.0
    assert r.bad is None


def _mline(*parts):
    return struct.pack("<BII", 1, 5, len(parts)) + b"".join(
        struct.pack("<BII", 1, 2, len(p))
        + b"".join(struct.pack("<dd", x, y) for x, y in p)
        for p in parts
    )


def test_geo_line_merge(con):
    """ST_LineMerge semantics (reference GeoLineMerge,
    geospatial.py:219): merge at degree-2 endpoints only; junctions
    and closed members stay split; full merge lowers to LINESTRING."""
    from ibis_spark import geo

    rows = [
        (0, _mline([(0, 0), (1, 0)], [(2, 0), (3, 0)], [(1, 0), (2, 0)])),
        (1, _mline([(0, 0), (1, 0)], [(1, 0), (2, 0)], [(10, 0), (11, 0)])),
        (2, _mline([(0, 0), (1, 0)], [(1, 0), (2, 0)], [(1, 0), (1, 5)])),
        (3, _mline([(3, 0), (2, 0)], [(0, 0), (1, 0)], [(3, 0), (4, 0)])),
        (4, _mline([(0, 0), (1, 0), (1, 1)], [(1, 1), (0, 1), (0, 0)])),
        (5, struct.pack("<BII", 1, 2, 2) + struct.pack("<dddd", 0, 0, 5, 5)),
        (6, struct.pack("<BIdd", 1, 1, 0.0, 0.0)),
        (7, None),
    ]
    t = con.memtable(rows, schema={"i": "int64", "g": "binary"})
    t = t.mutate(m=geo.geo_line_merge(t.g))
    out = {
        r.i: r
        for r in t.select(
            "i", ty=geo.geo_geometry_type(t.m), w=geo.geo_as_text(t.m)
        ).df.collect()
    }
    assert out[0].ty == "LINESTRING"
    assert out[0].w == "LINESTRING (0 0, 1 0, 2 0, 3 0)"
    assert out[1].w == "MULTILINESTRING ((0 0, 1 0, 2 0), (10 0, 11 0))"
    # degree-3 junction at (1,0): NOTHING merges
    assert out[2].w == (
        "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (1 0, 1 5))"
    )
    # orientation-reversing merge
    assert out[3].w == "MULTILINESTRING ((4 0, 3 0, 2 0), (0 0, 1 0))"
    # two open lines closing a loop -> closed LINESTRING
    assert out[4].w == "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)"
    assert out[5].w == "LINESTRING (0 0, 5 5)"   # passthrough
    assert out[6].w is None and out[7].w is None


def test_geo_multilinestring_ctor(con):
    import ibis_spark as ib
    from ibis_spark import geo

    t = con.memtable([(1.0,)], schema={"x": "float64"})
    z = t.x - t.x
    l1 = geo.geo_linestring(ib.array(z, z + 1.0), ib.array(z, z), decoded=True)
    l2 = geo.geo_linestring(
        ib.array(z + 1.0, z + 2.0), ib.array(z, z), decoded=True
    )
    pt = geo.geo_point(t.x, t.x, decoded=True)
    r = t.select(
        w=geo.geo_as_text(geo.geo_multilinestring(l1, l2)),
        m=geo.geo_as_text(geo.geo_line_merge(geo.geo_multilinestring(l1, l2))),
        bad=geo.geo_as_text(geo.geo_multilinestring(l1, pt)),
    ).df.collect()[0]
    assert r.w == "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0))"
    assert r.m == "LINESTRING (0 0, 1 0, 2 0)"
    assert r.bad is None
