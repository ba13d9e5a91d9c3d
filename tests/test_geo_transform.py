"""CRS transforms (round 12): geo_convert / geo_transform — reference
GeoConvert (ibis/expr/operations/geospatial.py:459) and GeoTransform
(:450).  Pure projection arithmetic: spherical Web Mercator closed
form and the Snyder transverse-Mercator series (USGS PP 1395) for UTM.

Evidence: known-coordinate fixtures (Eiffel Tower against the values
every geodesy tool publishes), round-trip closure at fuzzing scale,
domain-gate NULLs (poles, out-of-zone UTM), geometry-type
preservation, and build-time NotImplementedError for proj territory.
"""

from __future__ import annotations

import random

import pytest


@pytest.fixture(scope="module")
def pts(con):
    from ibis_spark import geo
    import ibis_spark as ib

    rows = [
        (1, 2.2945, 48.8584),      # Eiffel Tower (UTM zone 31N)
        (2, 0.0, 0.0),             # equator/meridian anchors
        (3, 3.0, 0.0),             # zone 31 central meridian
        (4, 0.0, 91.0),            # pole overshoot -> NULL
        (5, 151.2153, -33.8568),   # Sydney — outside zone 31 -> NULL on UTM31
    ]
    t = con.memtable(rows, schema={"i": "int64", "lon": "float64", "lat": "float64"})
    p = geo.geo_point(t.lon, t.lat, decoded=True)
    wm = geo.geo_convert(p, 4326, 3857)
    back = geo.geo_convert(wm, "EPSG:3857", "EPSG:4326")
    u31 = geo.geo_convert(p, "WGS84", 32631)
    uback = geo.geo_convert(u31, 32631, 4326)
    out = t.mutate(
        wx=geo.geo_x(wm), wy=geo.geo_y(wm),
        bx=geo.geo_x(back), by=geo.geo_y(back),
        ux=geo.geo_x(u31), uy=geo.geo_y(u31),
        rx=geo.geo_x(uback), ry=geo.geo_y(uback),
    ).df.collect()
    return {r.i: r for r in out}


class TestGeoConvert:
    def test_web_mercator_known_values(self, pts):
        r = pts[1]
        # published EPSG:3857 easting/northing of (2.2945, 48.8584)
        assert r.wx == pytest.approx(255422.57, abs=0.01)
        assert r.wy == pytest.approx(6250868.90, abs=0.5)
        assert pts[2].wx == 0.0
        assert abs(pts[2].wy) < 1e-9

    def test_web_mercator_roundtrip_exact_scale(self, pts):
        for i in (1, 2, 3):
            assert pts[i].bx == pytest.approx(pts[i].lon, abs=1e-12)
            assert pts[i].by == pytest.approx(pts[i].lat, abs=1e-12)

    def test_utm_known_values(self, pts):
        r = pts[1]
        # Eiffel Tower UTM 31N (published ~448252 E, 5411935 N; the
        # Snyder series is cm-accurate, anchor loosely)
        assert r.ux == pytest.approx(448252.0, abs=30.0)
        assert r.uy == pytest.approx(5411950.0, abs=30.0)
        # central meridian, equator: easting exactly 500000
        assert pts[3].ux == pytest.approx(500000.0, abs=1e-6)
        assert pts[3].uy == pytest.approx(0.0, abs=1e-6)

    def test_utm_roundtrip(self, pts):
        for i in (1, 2, 3):
            assert pts[i].rx == pytest.approx(pts[i].lon, abs=1e-8)
            assert pts[i].ry == pytest.approx(pts[i].lat, abs=1e-8)

    def test_domain_gates_null(self, pts):
        assert pts[4].wx is None and pts[4].wy is None   # |lat| >= 90
        assert pts[5].ux is None and pts[5].uy is None   # out of zone 31

    def test_unsupported_crs_raises_at_build(self, con):
        from ibis_spark import geo

        t = con.memtable([(1, 1.0, 2.0)], schema={"i": "int64", "x": "float64", "y": "float64"})
        p = geo.geo_point(t.x, t.y, decoded=True)
        with pytest.raises(NotImplementedError, match="proj"):
            # r14 implemented 27700 and 2154; NAD83 state plane (conic,
            # datum-shifted) is still a build-time error
            geo.geo_convert(p, 4326, 32019)

    def test_identity_and_transform_alias(self, con):
        from ibis_spark import geo

        t = con.memtable([(1, 10.0, 20.0)], schema={"i": "int64", "x": "float64", "y": "float64"})
        p = geo.geo_point(t.x, t.y, decoded=True)
        same = geo.geo_convert(p, 4326, "EPSG:4326")
        tr = geo.geo_transform(p, 3857)
        r = t.mutate(
            sx=geo.geo_x(same), tx=geo.geo_x(tr),
            wx=geo.geo_x(geo.geo_convert(p, 4326, 3857)),
        ).df.collect()[0]
        assert r.sx == 10.0
        assert r.tx == r.wx

    def test_geometry_types_preserved(self, con):
        import ibis_spark as ib
        from ibis_spark import geo

        t = con.memtable([(1,)], schema={"i": "int64"})
        z = (t.i - t.i).cast("float64")
        line = geo.geo_linestring(
            ib.array(z, z + 1.0, z + 2.0), ib.array(z, z + 1.0, z), decoded=True
        )
        poly = geo.geo_polygon(
            ib.array(z, z + 1.0, z + 1.0, z), ib.array(z, z, z + 1.0, z + 1.0),
            decoded=True,
        )
        out = t.mutate(
            lt=geo.geo_geometry_type(geo.geo_convert(line, 4326, 3857)),
            pt=geo.geo_geometry_type(geo.geo_convert(poly, 4326, 3857)),
            parea_pos=geo.geo_area(geo.geo_convert(poly, 4326, 3857)) > 0.0,
        ).df.collect()[0]
        assert out.lt == "LINESTRING"
        assert out.pt == "POLYGON"
        assert out.parea_pos

    def test_roundtrip_fuzz(self, con):
        import ibis_spark as ib
        from ibis_spark import geo

        rng = random.Random(1212)
        rows = [
            (i, rng.uniform(-179.9, 179.9), rng.uniform(-84.9, 84.9))
            for i in range(300)
        ]
        t = con.memtable(rows, schema={"i": "int64", "lon": "float64", "lat": "float64"})
        p = geo.geo_point(t.lon, t.lat, decoded=True)
        back = geo.geo_convert(geo.geo_convert(p, 4326, 3857), 3857, 4326)
        # UTM round trip inside zone 33 (central 15 deg): remap lon
        lon33 = (t.lon / 60.0) + 15.0  # within +-3 deg of central
        p33 = geo.geo_point(lon33, t.lat.clip(-79.9, 83.9) if hasattr(t.lat, "clip") else t.lat, decoded=True)
        u = geo.geo_convert(p33, 4326, 32633)
        uback = geo.geo_convert(u, 32633, 4326)
        out = t.mutate(
            ewm=(geo.geo_x(back) - t.lon).abs() + (geo.geo_y(back) - t.lat).abs(),
            eu=(geo.geo_x(uback) - lon33).abs(),
        ).df.collect()
        assert all(r.ewm < 1e-9 for r in out)
        assert all(r.eu is None or r.eu < 1e-8 for r in out)
        # at least most utm rows in range (lat gate may null a few)
        assert sum(1 for r in out if r.eu is not None) > 250

    def test_osgb_bng_known_values(self, con):
        """EPSG:27700 (r14, the first datum-shift family): the full
        WGS84 -> geocentric -> Helmert -> Bowring -> Airy TM chain,
        pinned to the pure-Python prototype values (validated against
        the OSGB projection test vector to the published mm) plus the
        domain gate and a <5 cm round-trip closure."""
        import pandas as pd

        import ibis_spark as ib  # noqa: F401
        from ibis_spark import geo

        pts_ = [
            # (lon, lat, expected E, expected N) — prototype doubles
            (-0.0005833, 51.476853, 538949.6876643669, 177216.7375250964),
            (-5.003508, 56.796889, 216677.40867840697, 771285.8623442472),
            (1.718, 52.658, 651541.4731009421, 313186.4509521006),
        ]
        t = con.memtable(pd.DataFrame({
            "i": range(len(pts_)),
            "lon": [p[0] for p in pts_],
            "lat": [p[1] for p in pts_],
        }))
        p = geo.geo_point(t.lon, t.lat, decoded=True)
        bng = geo.geo_convert(p, 4326, 27700)
        back = geo.geo_convert(bng, 27700, 4326)
        out = t.mutate(
            e=geo.geo_x(bng), n=geo.geo_y(bng),
            dlon=(geo.geo_x(back) - t.lon).abs(),
            dlat=(geo.geo_y(back) - t.lat).abs(),
        ).order_by("i").df.collect()
        for row, (_, _, ee, en) in zip(out, pts_):
            assert row.e == ee and row.n == en  # bit parity w/ prototype
            assert row.dlon < 1e-5 and row.dlat < 1e-5
        # out-of-box -> NULL, both directions
        t2 = con.memtable(pd.DataFrame({"i": [0], "lon": [-20.0], "lat": [55.0]}))
        g2 = geo.geo_convert(
            geo.geo_point(t2.lon, t2.lat, decoded=True), 4326, 27700
        )
        assert t2.mutate(e=geo.geo_x(g2)).df.collect()[0].e is None

    def test_lambert93_known_values(self, con):
        """EPSG:2154 (r14, the first conic family): Snyder LCC on
        GRS80 — pinned to the defining vector ((lon0, lat0) ->
        exactly the false origin), the published Paris grid, unit
        scale at both standard parallels (by construction), and a
        1e-9-degree round-trip closure."""
        import pandas as pd

        from ibis_spark import geo

        pts_ = [(3.0, 46.5), (2.3522, 48.8566)]
        t = con.memtable(pd.DataFrame({
            "i": range(len(pts_)),
            "lon": [p[0] for p in pts_],
            "lat": [p[1] for p in pts_],
        }))
        p = geo.geo_point(t.lon, t.lat, decoded=True)
        l93 = geo.geo_convert(p, 4326, 2154)
        back = geo.geo_convert(l93, 2154, 4326)
        out = t.mutate(
            e=geo.geo_x(l93), n=geo.geo_y(l93),
            dlon=(geo.geo_x(back) - t.lon).abs(),
            dlat=(geo.geo_y(back) - t.lat).abs(),
        ).order_by("i").df.collect()
        assert out[0].e == pytest.approx(700000.0, abs=1e-6)
        assert out[0].n == pytest.approx(6600000.0, abs=1e-6)
        # Paris (published Lambert-93 grid, metre-level)
        assert out[1].e == pytest.approx(652469.02, abs=0.5)
        assert out[1].n == pytest.approx(6862035.26, abs=0.5)
        for row in out:
            assert row.dlon < 1e-9 and row.dlat < 1e-9
        # out-of-box -> NULL
        t2 = con.memtable(pd.DataFrame({"i": [0], "lon": [-20.0], "lat": [46.0]}))
        g2 = geo.geo_convert(
            geo.geo_point(t2.lon, t2.lat, decoded=True), 4326, 2154
        )
        assert t2.mutate(e=geo.geo_x(g2)).df.collect()[0].e is None
