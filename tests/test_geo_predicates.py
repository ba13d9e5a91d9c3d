"""DE-9IM predicate tranche + WKT + simplify (round 11): geo_touches /
geo_crosses / geo_disjoint / geo_overlaps / geo_covers / geo_covered_by
/ geo_within / geo_contains_properly / geo_ordering_equals /
geo_is_valid / geo_as_text / geo_simplify — reference
ibis/expr/operations/geospatial.py:42-185, 409, 440, 490.

The pairing matrix pins every predicate on 18 hand-verified geometry
relations (integer coordinates -> exact orientation products)."""

from __future__ import annotations

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
SQ2IN = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
SQ_ADJ = [(4.0, 0.0), (8.0, 0.0), (8.0, 4.0), (4.0, 4.0), (4.0, 0.0)]
SQ_OVER = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0)]
SQ_FAR = [(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0)]

# (name, a, b, touches, disjoint, crosses, overlaps, covers, contains_properly)
MATRIX = [
    ("pt_eq", _pt(1.0, 1.0), _pt(1.0, 1.0), False, False, False, False, True, True),
    ("pt_far", _pt(1.0, 1.0), _pt(2.0, 2.0), False, True, False, False, False, False),
    ("pt_on_ring", _poly(SQ4), _pt(4.0, 2.0), True, False, False, False, True, False),
    ("pt_inside", _poly(SQ4), _pt(2.0, 2.0), False, False, False, False, True, True),
    ("pt_line_end", _line([(0.0, 0.0), (4.0, 0.0)]), _pt(0.0, 0.0), True, False, False, False, True, False),
    ("pt_line_mid", _line([(0.0, 0.0), (4.0, 0.0)]), _pt(2.0, 0.0), False, False, False, False, True, True),
    ("ll_X", _line([(0.0, 0.0), (4.0, 4.0)]), _line([(0.0, 4.0), (4.0, 0.0)]), False, False, True, False, False, False),
    ("ll_T", _line([(0.0, 0.0), (4.0, 0.0)]), _line([(2.0, 0.0), (2.0, 4.0)]), True, False, False, False, False, False),
    ("ll_shared_end", _line([(0.0, 0.0), (4.0, 0.0)]), _line([(4.0, 0.0), (8.0, 0.0)]), True, False, False, False, False, False),
    ("ll_col_overlap", _line([(0.0, 0.0), (4.0, 0.0)]), _line([(2.0, 0.0), (8.0, 0.0)]), False, False, False, True, False, False),
    ("ll_covered", _line([(0.0, 0.0), (8.0, 0.0)]), _line([(2.0, 0.0), (4.0, 0.0)]), False, False, False, False, True, False),
    ("poly_adj", _poly(SQ4), _poly(SQ_ADJ), True, False, False, False, False, False),
    ("poly_overlap", _poly(SQ4), _poly(SQ_OVER), False, False, False, True, False, False),
    ("poly_in", _poly(SQ4), _poly(SQ2IN), False, False, False, False, True, True),
    ("poly_far", _poly(SQ4), _poly(SQ_FAR), False, True, False, False, False, False),
    ("line_thru_poly", _poly(SQ4), _line([(-2.0, 2.0), (6.0, 2.0)]), False, False, True, False, False, False),
    ("line_in_poly", _poly(SQ4), _line([(1.0, 1.0), (3.0, 3.0)]), False, False, False, False, True, True),
    ("line_on_ring", _poly(SQ4), _line([(0.0, 0.0), (4.0, 0.0)]), True, False, False, False, True, False),
]


class TestGeoPredicates:
    def test_pairing_matrix(self, con):
        from ibis_spark import geo

        t = con.memtable(
            [(i, a, b) for i, (_, a, b, *_e) in enumerate(MATRIX)],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        res = t.select(
            "i",
            touches=geo.geo_touches(t.a, t.b),
            disjoint=geo.geo_disjoint(t.a, t.b),
            crosses=geo.geo_crosses(t.a, t.b),
            overlaps=geo.geo_overlaps(t.a, t.b),
            covers=geo.geo_covers(t.a, t.b),
            cp=geo.geo_contains_properly(t.a, t.b),
            cb=geo.geo_covered_by(t.a, t.b),
            wi=geo.geo_within(t.a, t.b),
        ).df.collect()
        got = {r.i: r for r in res}
        for i, (name, _a, _b, to, dj, cr, ov, cv, cp) in enumerate(MATRIX):
            r = got[i]
            assert r.touches == to, (name, "touches", r.touches)
            assert r.disjoint == dj, (name, "disjoint", r.disjoint)
            assert r.crosses == cr, (name, "crosses", r.crosses)
            assert r.overlaps == ov, (name, "overlaps", r.overlaps)
            assert r.covers == cv, (name, "covers", r.covers)
            assert r.cp == cp, (name, "contains_properly", r.cp)

    def test_predicates_decoded_parity(self, con):
        from ibis_spark import geo

        t = con.memtable(
            [(i, a, b) for i, (_, a, b, *_e) in enumerate(MATRIX[:8])],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        t = t.mutate(da=geo.geo_decode(t.a), db=geo.geo_decode(t.b))
        for mk in (geo.geo_touches, geo.geo_crosses, geo.geo_covers):
            rows = t.select("i", w=mk(t.a, t.b), e=mk(t.da, t.db)).df.collect()
            for r in rows:
                assert r.w == r.e, (r.i, r.w, r.e)

    def test_symmetry_and_nulls(self, con):
        from ibis_spark import geo

        mpt = struct.pack("<BII", 1, 4, 1) + _pt(0.0, 0.0)
        t = con.memtable(
            [
                (0, _poly(SQ4), _poly(SQ_OVER)),
                (1, _poly(SQ4), None),
                (2, _poly(SQ4), mpt),  # MULTI -> NULL domain
            ],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        rows = t.select(
            "i",
            ab=geo.geo_touches(t.a, t.b),
            ba=geo.geo_touches(t.b, t.a),
            ov=geo.geo_overlaps(t.a, t.b),
            dj=geo.geo_disjoint(t.a, t.b),
        ).df.collect()
        got = {r.i: r for r in rows}
        assert got[0].ab == got[0].ba == False  # noqa: E712
        assert got[0].ov is True
        assert got[1].ab is None and got[1].dj is None
        assert got[2].ab is None and got[2].ov is None

    def test_within_covered_by(self, con):
        from ibis_spark import geo

        t = con.memtable(
            [
                (0, _poly(SQ2IN), _poly(SQ4)),      # strictly inside
                (1, _line([(0.0, 0.0), (4.0, 0.0)]), _poly(SQ4)),  # in boundary
                (2, _pt(2.0, 2.0), _poly(SQ4)),
                (3, _pt(4.0, 2.0), _poly(SQ4)),     # on ring: covered, within
            ],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        rows = t.select(
            "i", cb=geo.geo_covered_by(t.a, t.b), wi=geo.geo_within(t.a, t.b)
        ).df.collect()
        got = {r.i: (r.cb, r.wi) for r in rows}
        assert got[0] == (True, True)
        # line lying IN the boundary: covered but interiors don't meet
        assert got[1] == (True, False)
        assert got[2] == (True, True)
        # point ON the ring: interior of point meets boundary, not interior
        assert got[3] == (True, False)

    def test_ordering_equals_and_is_valid(self, con):
        from ibis_spark import geo

        rev = list(reversed(SQ4))
        open_ring = struct.pack("<BII", 1, 3, 1) + struct.pack("<I", 4) + b"".join(
            struct.pack("<dd", x, y) for x, y in SQ4[:4]
        )
        t = con.memtable(
            [
                (0, _poly(SQ4), _poly(SQ4)),
                (1, _poly(SQ4), _poly(rev)),   # same set, different order
                (2, _line([(0.0, 0.0), (1.0, 1.0)]), _line([(0.0, 0.0), (1.0, 1.0)])),
                (3, _pt(1.0, 2.0), _line([(1.0, 2.0), (3.0, 4.0)])),  # type differs
            ],
            schema={"i": "int64", "a": "binary", "b": "binary"},
        )
        rows = t.select("i", oe=geo.geo_ordering_equals(t.a, t.b)).df.collect()
        got = {r.i: r.oe for r in rows}
        assert got[0] is True and got[1] is False
        assert got[2] is True and got[3] is False

        tv = con.memtable(
            [
                (0, _poly(SQ4)),
                (1, open_ring),               # unclosed ring
                (2, _line([(1.0, 1.0)])),     # 1-point line
                (3, b"\x00junk"),
                (4, None),
                (5, _pt(0.5, 0.5)),
            ],
            schema={"i": "int64", "g": "binary"},
        )
        rows = tv.select("i", v=geo.geo_is_valid(tv.g)).df.collect()
        got = {r.i: r.v for r in rows}
        assert got[0] is True and got[5] is True
        assert got[1] is False and got[2] is False and got[3] is False
        assert got[4] is None

    def test_as_text(self, con):
        from ibis_spark import geo

        mpt = struct.pack("<BII", 1, 4, 2) + _pt(1.0, 2.0) + _pt(3.0, 4.0)
        mline = struct.pack("<BII", 1, 5, 2) + _line(
            [(0.0, 0.0), (1.0, 1.0)]
        ) + _line([(2.0, 2.0), (3.5, 3.0)])
        hole = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
        t = con.memtable(
            [
                (0, _pt(1.5, -2.0)),
                (1, _line([(0.0, 0.0), (3.0, 4.0)])),
                (2, _poly(SQ4, hole)),
                (3, mpt),
                (4, mline),
                (5, b"\x00junk"),
                (6, None),
            ],
            schema={"i": "int64", "g": "binary"},
        )
        rows = t.select("i", w=geo.geo_as_text(t.g)).df.collect()
        got = {r.i: r.w for r in rows}
        assert got[0] == "POINT (1.5 -2)"
        assert got[1] == "LINESTRING (0 0, 3 4)"
        assert got[2] == (
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 3 1, 3 3, 1 3, 1 1))"
        )
        assert got[3] == "MULTIPOINT (1 2, 3 4)"
        assert got[4] == "MULTILINESTRING ((0 0, 1 1), (2 2, 3.5 3))"
        assert got[5] is None and got[6] is None

    def test_simplify(self, con):
        from ibis_spark import geo

        z_small = _line([(0.0, 0.0), (5.0, 0.5), (10.0, 0.0)])
        z_big = _line([(0.0, 0.0), (5.0, 2.0), (10.0, 0.0)])
        collinear = _line([(0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (9.0, 0.0)])
        pz = _poly(
            [(0.0, 0.0), (4.0, 0.2), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0), (0.0, 0.0)]
        )
        tiny_hole = _poly(
            [(0.0, 0.0), (8.0, 0.0), (8.0, 8.0), (0.0, 8.0), (0.0, 0.0)],
            [(3.0, 3.0), (3.2, 3.1), (3.4, 3.0), (3.2, 3.05), (3.0, 3.0)],
        )
        t = con.memtable(
            [(0, z_small), (1, z_big), (2, collinear), (3, pz), (4, tiny_hole),
             (5, _pt(1.0, 1.0)), (6, None)],
            schema={"i": "int64", "g": "binary"},
        )
        s = t.mutate(s=geo.geo_simplify(t.g, 1.0))
        rows = s.select("i", n=geo.geo_n_points(s.s), b=s.s).df.collect()
        got = {r.i: r.n for r in rows}
        assert got[0] == 2 and got[1] == 3 and got[2] == 2
        assert got[3] == 5      # zigzag ring vertex dropped
        assert got[4] == 5      # collapsed hole dropped
        assert got[5] == 1      # point passes through
        assert {r.i: r.b for r in rows}[6] is None
        # preserve_collapsed keeps the tiny hole verbatim
        s2 = t.mutate(s=geo.geo_simplify(t.g, 1.0, preserve_collapsed=True))
        rows = s2.select("i", n=geo.geo_n_points(s2.s)).df.collect()
        assert {r.i: r.n for r in rows}[4] == 10
        # decoded input accepted — takes the r12 expression path
        # (decoded struct out, no Python node in the plan)
        d = t.mutate(d=geo.geo_decode(t.g))
        d = d.mutate(s=geo.geo_simplify(d.d, 1.0))
        sel = d.select("i", n=geo.geo_n_points(d.s))
        plan = sel.df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        rows = sel.df.collect()
        assert {r.i: r.n for r in rows}[0] == 2

    def test_simplify_expression_udf_parity(self, con):
        """The decoded expression-path DP and the WKB Arrow-UDF DP make
        IEEE-identical keep decisions: encode(simplify(decode(g))) ==
        simplify(g) byte-for-byte over random lines (incl. equal-d2
        ties and a degenerate all-coincident run), holed polygons
        (collapse + preserve_collapsed), and multilinestrings."""
        import random

        from ibis_spark import geo

        random.seed(7)
        rows, i = [], 0
        for _ in range(25):
            n = random.randint(2, 9)
            rows.append(
                (i, _line([(random.uniform(-10, 10), random.uniform(-10, 10))
                           for _ in range(n)]))
            )
            i += 1
        rows.append((i, _line([(0, 0), (5, 2), (5, -2), (10, 0)]))); i += 1
        rows.append((i, _line([(0, 0), (0, 0), (0, 0)]))); i += 1
        for _ in range(6):
            ring = [(0, 0), (8, random.uniform(-0.5, 2)), (8, 8),
                    (random.uniform(-1, 1), 8), (0, 0)]
            hole = [(3, 3), (3.2, 3.1), (3.4, 3.0), (3.2, 3.05), (3, 3)]
            rows.append((i, _poly(ring, hole))); i += 1
        mline = struct.pack("<BII", 1, 5, 2) + _line(
            [(0, 0), (5, 0.5), (10, 0)]
        ) + _line([(0, 0), (5, 3), (10, 0)])
        rows.append((i, mline)); i += 1
        rows.append((i, _pt(1.0, 2.0))); i += 1
        rows.append((i, None)); i += 1
        t = con.memtable(rows, schema={"i": "int64", "g": "binary"})
        for pc in (False, True):
            u = t.mutate(s=geo.geo_simplify(t.g, 1.0, preserve_collapsed=pc))
            udf = {r.i: r.s for r in u.select("i", "s").df.collect()}
            d = t.mutate(d=geo.geo_decode(t.g))
            d = d.mutate(s=geo.geo_simplify(d.d, 1.0, preserve_collapsed=pc))
            d = d.mutate(w=geo.geo_encode(d.s))
            ex = {r.i: r.w for r in d.select("i", "w").df.collect()}
            assert udf == ex, [k for k in udf if udf[k] != ex[k]]


def test_identical_polygons_de9im(con):
    """Boundary-coincident containment (r11 strict-check regression):
    IDENTICAL squares cover each other, are within each other, and do
    NOT touch or overlap (DE-9IM: equal geometries' interiors meet)."""
    from ibis_spark import geo

    t = con.memtable(
        [(0, _poly(SQ4), _poly(SQ4)),
         (1, _poly(SQ4), _poly(list(reversed(SQ4))))],
        schema={"i": "int64", "a": "binary", "b": "binary"},
    )
    rows = t.select(
        "i",
        to=geo.geo_touches(t.a, t.b),
        ov=geo.geo_overlaps(t.a, t.b),
        cv=geo.geo_covers(t.a, t.b),
        wi=geo.geo_within(t.a, t.b),
    ).df.collect()
    for r in rows:
        assert (r.to, r.ov, r.cv, r.wi) == (False, False, True, True), r.i


def test_relate_parity(con):
    """geo_relate's batched fields must equal the individual predicate
    functions on the full pairing matrix (both untagged-WKB and
    statically-typed decoded ctor inputs)."""
    from ibis_spark import geo

    t = con.memtable(
        [(i, a, b) for i, (_, a, b, *_e) in enumerate(MATRIX)],
        schema={"i": "int64", "a": "binary", "b": "binary"},
    )
    t = t.mutate(rel=geo.geo_relate(t.a, t.b))
    # four fields, not all ten: untagged relate + individual predicates
    # in ONE projection is the deliberately-pathological full-dispatch
    # build (the matrix test already pins every individual predicate;
    # this one checks relate's combos agree) — 8 fields took ~10 min of
    # driver-side expression build alone
    rows = t.select(
        "i",
        r_to=t.rel["touches"], r_ov=t.rel["overlaps"],
        r_cv=t.rel["covers"], r_wi=t.rel["within"],
        s_to=geo.geo_touches(t.a, t.b), s_ov=geo.geo_overlaps(t.a, t.b),
        s_cv=geo.geo_covers(t.a, t.b), s_wi=geo.geo_within(t.a, t.b),
    ).df.collect()
    for r in rows:
        for f in ("to", "ov", "cv", "wi"):
            assert getattr(r, f"r_{f}") == getattr(r, f"s_{f}"), (r.i, f)


def test_static_pruning_parity(con):
    """Constructor-tagged (static gtype) inputs must give the same
    answers as untagged WKB inputs for every predicate."""
    import ibis_spark as ib
    from ibis_spark import geo

    t = con.memtable(
        [(k,) for k in range(13)], schema={"k": "int64"}
    )
    d = t.k.cast("float64") - 6.0
    zero = d - d

    def sq(x0):
        return geo.geo_polygon(
            ib.array(x0, x0 + 4.0, x0 + 4.0, x0),
            ib.array(zero, zero, zero + 4.0, zero + 4.0),
            decoded=True,
        )

    a, b = sq(zero), sq(d)
    rel = geo.geo_relate(a, b)
    # same geometry as WKB (untagged)
    aw = geo.geo_polygon(
        ib.array(zero, zero + 4.0, zero + 4.0, zero),
        ib.array(zero, zero, zero + 4.0, zero + 4.0),
    )
    bw = geo.geo_polygon(
        ib.array(d, d + 4.0, d + 4.0, d),
        ib.array(zero, zero, zero + 4.0, zero + 4.0),
    )
    rows = t.mutate(rel=rel).select(
        "k",
        p_to=ib._.rel["touches"],
        p_ov=ib._.rel["overlaps"],
        p_cv=ib._.rel["covers"],
        w_to=geo.geo_touches(aw, bw),
        w_ov=geo.geo_overlaps(aw, bw),
        w_cv=geo.geo_covers(aw, bw),
    ).df.collect()
    for r in rows:
        assert r.p_to == r.w_to, (r.k, "touches")
        assert r.p_ov == r.w_ov, (r.k, "overlaps")
        assert r.p_cv == r.w_cv, (r.k, "covers")


def test_as_ewkt(con):
    from ibis_spark import geo

    t = con.memtable([(0, _pt(1.5, -2.0))], schema={"i": "int64", "g": "binary"})
    rows = t.select("i", e=geo.geo_as_ewkt(t.g, 4326)).df.collect()
    assert rows[0].e == "SRID=4326;POINT (1.5 -2)"
