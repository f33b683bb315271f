"""Unit tests for the planar geospatial family (functions/geo.py,
operators/spatial.py) — known-shape pins + brute-force equivalence for the
grid distance join. The DuckDB differential for the geo_* queries runs in
test_oracle_diff.py."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from trino_spark.functions import geo
from trino_spark.operators.spatial import distance_join


def _ring(spark, verts):
    return spark.createDataFrame(
        [Row(ring=[Row(x=float(x), y=float(y)) for x, y in verts])]
    )


def test_area_perimeter_centroid_square(spark):
    df = _ring(spark, [(0, 0), (2, 0), (2, 2), (0, 2)])
    row = df.select(
        geo.st_area("ring").alias("a"),
        geo.st_perimeter("ring").alias("p"),
        geo.st_centroid("ring").alias("c"),
        geo.st_num_points("ring").alias("n"),
    ).first()
    assert row.a == 4.0 and row.p == 8.0 and row.n == 4
    assert (row.c.x, row.c.y) == (1.0, 1.0)


def test_area_clockwise_is_positive(spark):
    df = _ring(spark, [(0, 0), (0, 3), (4, 3), (4, 0)])  # CW winding
    assert df.select(geo.st_area("ring").alias("a")).first().a == 12.0


def test_contains_concave(spark):
    # Concave "M" pentagon: the notch at (2, 2) excludes points above it.
    verts = [(0, 0), (4, 0), (4, 5), (2, 2), (0, 5)]
    df = _ring(spark, verts)
    checks = {(1.0, 1.0): True, (2.0, 3.5): False, (0.5, 4.0): True, (5.0, 1.0): False}
    for (px, py), expect in checks.items():
        got = df.select(
            geo.st_contains("ring", geo.st_point(F.lit(px), F.lit(py))).alias("c")
        ).first()
        assert got.c is expect, (px, py)


def test_envelope_and_distance(spark):
    df = _ring(spark, [(1, -2), (5, 0), (3, 7)])
    env = df.select(geo.st_envelope("ring").alias("e")).first().e
    assert (env.xmin, env.ymin, env.xmax, env.ymax) == (1.0, -2.0, 5.0, 7.0)
    d = (
        df.select(
            geo.st_distance(
                geo.st_point(F.lit(0.0), F.lit(3.0)), geo.st_point(F.lit(4.0), F.lit(0.0))
            ).alias("d")
        )
        .first()
        .d
    )
    assert d == 5.0


def test_wkt_roundtrip(spark):
    wkt = "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 3.0, 0.0 0.0))"
    df = spark.createDataFrame([Row(w=wkt)])
    parsed = df.select(geo.st_geometry_from_text("w").alias("ring"))
    row = parsed.select(
        geo.st_num_points("ring").alias("n"),
        geo.st_area("ring").alias("a"),
        geo.st_as_text("ring").alias("txt"),
    ).first()
    assert row.n == 3  # closing vertex dropped
    assert row.a == 6.0
    assert row.txt == wkt


def test_wkt_point(spark):
    df = spark.createDataFrame([Row(w="POINT (2.5 -1.25)")])
    p = df.select(geo.st_geometry_from_text("w").alias("r")).select(
        F.element_at("r", 1).alias("p")
    ).first().p
    assert (p.x, p.y) == (2.5, -1.25)


def test_distance_join_matches_bruteforce(spark):
    # Deterministic scattered points, including cross-cell and same-cell pairs.
    pa = [(i, float((i * 53) % 97), float((i * 31) % 89)) for i in range(120)]
    pb = [(j, float((j * 41) % 97), float((j * 59) % 89)) for j in range(80)]
    a = spark.createDataFrame(pa, "ida int, ax double, ay double")
    b = spark.createDataFrame(pb, "idb int, bx double, by double")
    r = 3.0

    got = {
        (row.ida, row.idb)
        for row in distance_join(a, b, r, lx="ax", ly="ay", rx="bx", ry="by").collect()
    }
    expect = {
        (i, j)
        for (i, ax, ay) in pa
        for (j, bx, by) in pb
        if math.dist((ax, ay), (bx, by)) <= r
    }
    assert got == expect and len(expect) > 0


class TestPolygonHolesMulti:
    def test_area_with_holes_and_multi(self, spark):
        from trino_spark.functions import geo
        from pyspark.sql import functions as F

        shell = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
        hole = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)]
        tri = [(20.0, 0.0), (24.0, 0.0), (20.0, 3.0)]

        def ring(vs):
            return F.array(*[F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in vs])

        df = spark.range(1).select(
            geo.st_area_polygon(F.array(ring(shell), ring(hole))).alias("a_holes"),
            geo.st_area_multi(
                F.array(F.array(ring(shell), ring(hole)), F.array(ring(tri)))
            ).alias("a_multi"),
            geo.st_contains_polygon(
                F.array(ring(shell), ring(hole)), geo.st_point(F.lit(3.0), F.lit(3.0))
            ).alias("in_hole"),
            geo.st_contains_polygon(
                F.array(ring(shell), ring(hole)), geo.st_point(F.lit(7.0), F.lit(7.0))
            ).alias("in_shell"),
            geo.st_contains_multi(
                F.array(F.array(ring(shell), ring(hole)), F.array(ring(tri))),
                geo.st_point(F.lit(21.0), F.lit(0.5)),
            ).alias("in_tri"),
        ).collect()[0]
        assert df.a_holes == 96.0  # 100 - 4
        assert df.a_multi == 102.0  # 96 + 6
        assert df.in_hole is False and df.in_shell is True and df.in_tri is True

    def test_polygon_from_text_with_hole(self, spark):
        from trino_spark.functions import geo
        from pyspark.sql import functions as F

        wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
        row = spark.range(1).select(
            geo.st_area_polygon(geo.st_polygon_from_text(F.lit(wkt))).alias("a")
        ).collect()[0]
        assert row.a == 96.0

    def test_sphere_distance_and_area(self, spark):
        from trino_spark.functions import geo
        from pyspark.sql import functions as F

        # London -> Paris ~ 343-344 km; 1-degree square at the equator
        eq_ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
        row = spark.range(1).select(
            geo.st_sphere_distance(
                geo.st_point(F.lit(-0.1278), F.lit(51.5074)),
                geo.st_point(F.lit(2.3522), F.lit(48.8566)),
            ).alias("d"),
            geo.st_sphere_area(
                F.array(*[F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in eq_ring])
            ).alias("a"),
        ).collect()[0]
        assert 330 < row.d < 360
        # 1 deg^2 at the equator ~ 111.19^2 km^2 ~ 12363; allow 2%
        assert abs(row.a - 12363) / 12363 < 0.02


class TestMultiPolygonWkt:
    def test_multipolygon_from_text(self, spark):
        from trino_spark.functions import geo
        from pyspark.sql import functions as F

        wkt = (
            "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), "
            "(2 2, 4 2, 4 4, 2 4, 2 2)), ((20 0, 24 0, 20 3, 20 0)))"
        )
        polys = geo.st_multi_polygon_from_text(F.lit(wkt))
        row = spark.range(1).select(
            geo.st_area_multi(polys).alias("a"),
            F.size(polys).alias("n"),
            F.size(F.element_at(polys, 1)).alias("rings1"),
            geo.st_contains_multi(polys, geo.st_point(F.lit(3.0), F.lit(3.0))).alias("in_hole"),
            geo.st_contains_multi(polys, geo.st_point(F.lit(21.0), F.lit(1.0))).alias("in_tri"),
        ).collect()[0]
        assert row.a == 102.0  # (100 - 4) + 6
        assert row.n == 2 and row.rings1 == 2
        assert row.in_hole is False and row.in_tri is True

    def test_multipolygon_single_member_and_whitespace(self, spark):
        from trino_spark.functions import geo
        from pyspark.sql import functions as F

        wkt = "multipolygon ( (( 0 0 , 4 0 , 0 3 , 0 0 )) )"
        polys = geo.st_multi_polygon_from_text(F.lit(wkt))
        row = spark.range(1).select(
            geo.st_area_multi(polys).alias("a"), F.size(polys).alias("n")
        ).collect()[0]
        assert row.a == 6.0 and row.n == 1


class TestSphereContains:
    def test_sphere_contains_basic(self, spark):
        from trino_spark.functions import geo
        from pyspark.sql import functions as F

        def ring(verts):
            return F.array(
                *[F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in verts]
            )

        # 10-degree box around Paris (lon 2.35, lat 48.86)
        box = [(-3.0, 44.0), (8.0, 44.0), (8.0, 54.0), (-3.0, 54.0)]
        row = spark.range(1).select(
            geo.st_sphere_contains(ring(box), geo.st_point(F.lit(2.35), F.lit(48.86))).alias("inside"),
            geo.st_sphere_contains(ring(box), geo.st_point(F.lit(20.0), F.lit(48.86))).alias("east_out"),
            geo.st_sphere_contains(ring(box), geo.st_point(F.lit(2.35), F.lit(30.0))).alias("south_out"),
            # antipodal point -> far hemisphere -> NULL, not a wrong answer
            geo.st_sphere_contains(ring(box), geo.st_point(F.lit(-177.65), F.lit(-48.86))).alias("anti"),
        ).collect()[0]
        assert row.inside is True
        assert row.east_out is False and row.south_out is False
        assert row.anti is None

    def test_sphere_contains_matches_planar_near_equator(self, spark):
        # Tiny polygon at the equator: gnomonic distortion negligible ->
        # agrees with the planar predicate on lon/lat.
        from trino_spark.functions import geo
        from pyspark.sql import functions as F

        tri = [(0.0, 0.0), (0.2, 0.0), (0.0, 0.2)]
        ring = F.array(*[F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in tri])
        pts = [(0.05, 0.05, True), (0.15, 0.15, False), (0.19, 0.005, True)]
        for lon, lat, want in pts:
            got = spark.range(1).select(
                geo.st_sphere_contains(ring, geo.st_point(F.lit(lon), F.lit(lat))).alias("g")
            ).first().g
            assert got is want, (lon, lat)

    def test_sphere_contains_polar_cap(self, spark):
        # A ring circling the pole at lat 80: the planar lon/lat ray-cast
        # CANNOT represent this region; the gnomonic form gets it right.
        from trino_spark.functions import geo
        from pyspark.sql import functions as F

        cap = [(float(lon), 80.0) for lon in range(-180, 180, 45)]
        ring = F.array(*[F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in cap])
        row = spark.range(1).select(
            geo.st_sphere_contains(ring, geo.st_point(F.lit(0.0), F.lit(89.0))).alias("near_pole"),
            geo.st_sphere_contains(ring, geo.st_point(F.lit(0.0), F.lit(40.0))).alias("mid_lat"),
        ).collect()[0]
        assert row.near_pole is True
        assert row.mid_lat is False
