"""geo_buffer (round 12) — reference GeoBuffer
(ibis/expr/operations/geospatial.py:362).  Point buffers are the
regular 4*quad_segs-gon on the circle; convex-polygon buffers are the
exact offset polygon (edges shifted along normals, vertex arcs at the
same angular step).  Everything else degrades to NULL.

The closed forms pin exactness: a 4q-gon's area is
(4q/2) r^2 sin(2*pi/4q); a convex buffer adds perimeter*r plus the
same full-circle fan (the vertex arcs of any convex polygon sum to
one full turn).
"""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def buf(con):
    import ibis_spark as ib
    from ibis_spark import geo

    t = con.memtable(
        [(1, 2.0), (2, 3.0), (3, 0.5), (4, -1.0)],
        schema={"i": "int64", "r": "float64"},
    )
    z = (t.i - t.i).cast("float64")
    p = geo.geo_point(z + 10.0, z + 20.0, decoded=True)
    sq = geo.geo_polygon(
        ib.array(z, z + 4.0, z + 4.0, z), ib.array(z, z, z + 4.0, z + 4.0),
        decoded=True,
    )
    # clockwise spelling of the same square: orientation must not matter
    sq_cw = geo.geo_polygon(
        ib.array(z, z, z + 4.0, z + 4.0), ib.array(z, z + 4.0, z + 4.0, z),
        decoded=True,
    )
    tri = geo.geo_polygon(
        ib.array(z, z + 6.0, z + 3.0), ib.array(z, z, z + 6.0), decoded=True
    )
    nonconv = geo.geo_polygon(
        ib.array(z, z + 4.0, z + 4.0, z + 2.0, z + 2.0, z),
        ib.array(z, z, z + 2.0, z + 2.0, z + 4.0, z + 4.0),
        decoded=True,
    )
    line = geo.geo_linestring(ib.array(z, z + 1.0), ib.array(z, z), decoded=True)
    # r13: 2-vertex segments buffer; multi-segment / zero-length NULL
    line3 = geo.geo_linestring(
        ib.array(z, z + 1.0, z + 2.0), ib.array(z, z, z + 1.0), decoded=True
    )
    linez = geo.geo_linestring(ib.array(z, z), ib.array(z, z), decoded=True)
    diag = geo.geo_linestring(
        ib.array(z + 7.0, z + 10.0), ib.array(z + 1.0, z + 5.0), decoded=True
    )
    bp, bs = geo.geo_buffer(p, t.r), geo.geo_buffer(sq, t.r)
    out = t.mutate(
        pa=geo.geo_area(bp),
        pn=geo.geo_n_points(bp),
        pxmin=geo.geo_x_min(bp),
        pxmax=geo.geo_x_max(bp),
        pymin=geo.geo_y_min(bp),
        pymax=geo.geo_y_max(bp),
        pt_type=geo.geo_geometry_type(bp),
        sa=geo.geo_area(bs),
        sn=geo.geo_n_points(bs),
        sa_cw=geo.geo_area(geo.geo_buffer(sq_cw, t.r)),
        ta=geo.geo_area(geo.geo_buffer(tri, t.r)),
        q1a=geo.geo_area(geo.geo_buffer(p, t.r, quad_segs=1)),
        na=geo.geo_area(geo.geo_buffer(nonconv, t.r)),
        la=geo.geo_area(geo.geo_buffer(line, t.r)),
        ln_np=geo.geo_n_points(geo.geo_buffer(line, t.r)),
        ltyp=geo.geo_geometry_type(geo.geo_buffer(line, t.r)),
        la3=geo.geo_area(geo.geo_buffer(line3, t.r)),
        laz=geo.geo_area(geo.geo_buffer(linez, t.r)),
        da=geo.geo_area(geo.geo_buffer(diag, t.r)),
    ).df.collect()
    return {r.i: r for r in out}


RADII = {1: 2.0, 2: 3.0, 3: 0.5}


class TestGeoBuffer:
    def test_point_buffer_closed_form(self, buf):
        for i, r in RADII.items():
            row = buf[i]
            assert row.pt_type == "POLYGON"
            assert row.pn == 33  # 32 vertices + close
            exp = 16.0 * r * r * math.sin(math.pi / 16.0)
            assert row.pa == pytest.approx(exp, rel=1e-12)
            assert row.pxmin == 10.0 - r and row.pxmax == 10.0 + r
            assert row.pymin == pytest.approx(20.0 - r, abs=1e-9)
            assert row.pymax == pytest.approx(20.0 + r, abs=1e-9)

    def test_convex_polygon_buffer_closed_form(self, buf):
        for i, r in RADII.items():
            row = buf[i]
            fan = 16.0 * r * r * math.sin(math.pi / 16.0)
            assert row.sa == pytest.approx(16.0 + 16.0 * r + fan, rel=1e-12)
            assert row.sn == 37  # 4 vertices x 9 arc points + close
            assert row.sa_cw == pytest.approx(row.sa, rel=1e-12)
            # triangle: non-right vertex angles sample FINER than the
            # quad_segs step (k = ceil(delta/step)) — mirror the fan
            peri = 6.0 + math.hypot(3.0, 6.0) * 2.0
            step = math.pi / 16.0
            tri = [(0.0, 0.0), (6.0, 0.0), (3.0, 6.0)]
            tri_fan = 0.0
            for j in range(3):
                ax, ay = tri[j - 1]
                bx, by = tri[j]
                cx, cy = tri[(j + 1) % 3]
                t_in = math.atan2(-(bx - ax), by - ay)
                t_out = math.atan2(-(cx - bx), cy - by)
                dl = (t_out - t_in) % (2.0 * math.pi)
                k = math.ceil(dl / step)
                tri_fan += k * (r * r / 2.0) * math.sin(dl / k)
            assert row.ta == pytest.approx(18.0 + peri * r + tri_fan, rel=1e-9)

    def test_quad_segs_one_is_the_square_fan(self, buf):
        for i, r in RADII.items():
            exp = 2.0 * r * r * math.sin(math.pi / 2.0)
            assert buf[i].q1a == pytest.approx(exp, rel=1e-12)

    def test_unsupported_and_negative_null(self, buf):
        for i in RADII:
            assert buf[i].na is None   # non-convex polygon
            assert buf[i].la3 is None  # multi-segment polyline
            assert buf[i].laz is None  # zero-length segment
        assert buf[4].pa is None and buf[4].sa is None  # negative radius
        assert buf[4].la is None  # negative radius on a segment

    def test_segment_buffer_closed_forms(self, buf):
        """r13: a 2-vertex segment buffers to the disjoint rect + two
        half-disc caps MULTIPOLYGON: area 2rL + 16 r^2 sin(pi/16),
        41 vertices, and rotation invariance (the 3-4-5 diagonal of
        length 5 matches the same closed form)."""
        cap = 16.0 * math.sin(math.pi / 16.0)
        for i, r in RADII.items():
            assert buf[i].la == pytest.approx(
                2.0 * r * 1.0 + cap * r * r, rel=1e-12
            )
            assert buf[i].ln_np == 41
            assert buf[i].ltyp == "MULTIPOLYGON"
            assert buf[i].da == pytest.approx(
                2.0 * r * 5.0 + cap * r * r, rel=1e-12
            )

    def test_quad_segs_validation(self, con):
        from ibis_spark import geo

        t = con.memtable([(1,)], schema={"i": "int64"})
        z = (t.i - t.i).cast("float64")
        p = geo.geo_point(z, z, decoded=True)
        with pytest.raises(ValueError):
            geo.geo_buffer(p, 1.0, quad_segs=0)
