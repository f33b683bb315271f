"""Verbatim-SQL geospatial surface (geospatial.md parity) through
TrinoEngine.sql — WKT carrier for GEOMETRY, EWKT tag for SPHERICAL
GEOGRAPHY, struct tiles for Bing. Kernel algorithms are pinned in
closed form (areas, the docs' polyline example, Microsoft quadkey
round-trips)."""

from __future__ import annotations

import pytest

from trino_spark.dialect.engine import TrinoEngine

SQ = "ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')"
SQ2 = "ST_GeometryFromText('POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))')"


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return TrinoEngine(spark, sf_dir)


def _one(eng, sql):
    return eng.sql(sql).collect()[0][0]


def test_constructors_accessors(eng):
    assert _one(eng, "SELECT ST_AsText(ST_Point(1, 2))") == "POINT (1 2)"
    assert _one(eng, "SELECT ST_X(ST_Point(1.5, 2.5))") == 1.5
    assert _one(eng, "SELECT ST_GeometryType(ST_Point(1,2))") == "ST_Point"
    assert _one(eng, f"SELECT ST_NumPoints({SQ})") == 5
    assert _one(eng, "SELECT ST_AsText(ST_StartPoint(ST_GeometryFromText('LINESTRING (1 2, 3 4)')))") == "POINT (1 2)"
    assert _one(eng, "SELECT ST_AsText(ST_PointN(ST_GeometryFromText('LINESTRING (1 2, 3 4)'), 2))") == "POINT (3 4)"
    assert _one(eng, f"SELECT ST_Dimension({SQ})") == 2
    assert _one(eng, f"SELECT ST_IsValid({SQ})") is True
    assert (
        _one(eng, "SELECT geometry_invalid_reason(ST_GeometryFromText('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))'))")
        == "Polygon ring self-intersects"
    )


def test_wkb_roundtrip(eng):
    got = _one(eng, "SELECT ST_AsText(ST_GeomFromBinary(ST_AsBinary(ST_Point(1, 2))))")
    assert got == "POINT (1 2)"


def test_measures(eng):
    assert _one(eng, f"SELECT ST_Area({SQ})") == 16.0
    assert _one(eng, "SELECT ST_Length(ST_GeometryFromText('LINESTRING (0 0, 3 4)'))") == 5.0
    assert _one(eng, f"SELECT ST_AsText(ST_Centroid({SQ}))") == "POINT (2 2)"
    assert _one(eng, "SELECT ST_Distance(ST_Point(0,0), ST_Point(3,4))") == 5.0
    assert (
        _one(eng, "SELECT ST_AsText(ST_Envelope(ST_GeometryFromText('LINESTRING (0 0, 2 3)')))")
        == "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"
    )


def test_predicates(eng):
    assert _one(eng, f"SELECT ST_Contains({SQ}, ST_Point(2, 2))") is True
    assert _one(eng, f"SELECT ST_Contains({SQ}, ST_Point(0, 0))") is False  # boundary
    assert _one(eng, f"SELECT ST_Intersects({SQ}, {SQ2})") is True
    assert _one(eng, f"SELECT ST_Overlaps({SQ}, {SQ2})") is True
    assert _one(eng, f"SELECT ST_Disjoint({SQ}, ST_Point(9, 9))") is True
    assert _one(eng, f"SELECT ST_Crosses(ST_GeometryFromText('LINESTRING (-1 2, 5 2)'), {SQ})") is True
    assert (
        _one(eng, f"SELECT ST_Touches({SQ}, ST_GeometryFromText('POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))'))")
        is True
    )
    assert _one(eng, f"SELECT ST_Equals({SQ}, ST_GeometryFromText('POLYGON ((4 0, 4 4, 0 4, 0 0, 4 0))'))") is True
    assert _one(eng, f"SELECT ST_Within(ST_Point(2, 2), {SQ})") is True


def test_boolean_ops(eng):
    assert _one(eng, f"SELECT ST_Area(ST_Intersection({SQ}, {SQ2}))") == 4.0
    assert _one(eng, f"SELECT ST_Area(ST_Union({SQ}, {SQ2}))") == 28.0
    assert _one(eng, f"SELECT ST_Area(ST_Difference({SQ}, {SQ2}))") == 12.0
    assert _one(eng, f"SELECT ST_Area(ST_SymDifference({SQ}, {SQ2}))") == 24.0
    # hole creation: containment difference -> donut
    donut = _one(
        eng,
        f"SELECT ST_AsText(ST_Difference({SQ}, ST_GeometryFromText('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')))",
    )
    assert donut.startswith("POLYGON ((0 0") and "(1 1" in donut


def test_convex_hull_and_simplify(eng):
    got = _one(
        eng,
        "SELECT ST_AsText(ST_ConvexHull(ST_GeometryFromText('MULTIPOINT ((0 0), (4 0), (2 2), (4 4), (0 4))')))",
    )
    assert got == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    got = _one(
        eng,
        "SELECT ST_AsText(simplify_geometry(ST_GeometryFromText('LINESTRING (0 0, 1 0.01, 2 0, 4 0)'), 0.1))",
    )
    assert got == "LINESTRING (0 0, 4 0)"


def test_spherical_geography(eng):
    # GeoFunctions.java great-circle example: BNA -> LAX = 2886.45 km
    got = _one(eng, "SELECT great_circle_distance(36.12, -86.67, 33.94, -118.40)")
    assert abs(got - 2886.45) < 0.01
    got = _one(
        eng,
        "SELECT ST_Distance(to_spherical_geography(ST_Point(-86.67, 36.12)),"
        " to_spherical_geography(ST_Point(-118.40, 33.94)))",
    )
    assert abs(got / 1000 - 2886.45) < 0.01


def test_geojson_polyline_codecs(eng):
    assert (
        _one(eng, "SELECT ST_AsText(from_geojson_geometry(to_geojson_geometry(ST_Point(1, 2))))")
        == "POINT (1 2)"
    )
    # the polyline spec's published example
    got = _one(
        eng,
        "SELECT to_encoded_polyline(ST_GeometryFromText("
        "'LINESTRING (-120.2 38.5, -120.95 40.7, -126.453 43.252)'))",
    )
    assert got == "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    back = _one(eng, f"SELECT ST_AsText(from_encoded_polyline('{got}'))")
    assert back.startswith("LINESTRING (-120.2 38.5")


def test_line_referencing(eng):
    assert (
        _one(eng, "SELECT ST_AsText(line_interpolate_point(ST_GeometryFromText('LINESTRING (0 0, 4 0)'), 0.25))")
        == "POINT (1 0)"
    )
    assert _one(eng, "SELECT line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 4 0)'), ST_Point(1, 5))") == 0.25
    got = _one(
        eng,
        "SELECT ST_AsText(geometry_nearest_points(ST_GeometryFromText('LINESTRING (0 0, 4 0)'), ST_Point(2, 3))[0])",
    )
    assert got == "POINT (2 0)"


def test_bing_tiles(eng):
    # Microsoft quadkey spec round-trip
    qk = _one(eng, "SELECT bing_tile_quadkey(bing_tile(85, 88, 8))")
    back = _one(eng, f"SELECT bing_tile_coordinates(bing_tile('{qk}'))")
    assert (back["x"], back["y"]) == (85, 88)
    assert _one(eng, f"SELECT bing_tile_zoom_level(bing_tile('{qk}'))") == 8
    assert _one(eng, "SELECT cardinality(bing_tiles_around(47.6, -122.3, 8))") == 9
    poly = _one(eng, "SELECT bing_tile_polygon(bing_tile(0, 0, 1))")
    assert poly.startswith("POLYGON")
    n = _one(
        eng,
        "SELECT cardinality(geometry_to_bing_tiles(ST_GeometryFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'), 10))",
    )
    assert n >= 1


def test_geo_aggregates(eng):
    got = _one(
        eng,
        "SELECT ST_Area(geometry_union_agg(g)) FROM (SELECT CASE WHEN x = 0"
        f" THEN {SQ} ELSE {SQ2} END AS g FROM (SELECT explode(sequence(0, 1)) AS x))",
    )
    assert got == 28.0
    got = _one(
        eng,
        "SELECT convex_hull_agg(g) FROM (SELECT ST_Point(CAST(x AS DOUBLE),"
        " CAST(x * x AS DOUBLE)) AS g FROM (SELECT explode(sequence(0, 4)) AS x))",
    )
    assert got.startswith("POLYGON")
    got = _one(
        eng,
        "SELECT geometry_collect_agg(g) FROM (SELECT ST_Point(CAST(x AS DOUBLE), 0.0) AS g"
        " FROM (SELECT explode(sequence(0, 2)) AS x))",
    )
    assert got == "GEOMETRYCOLLECTION (POINT (0 0), POINT (1 0), POINT (2 0))"


def test_rings_and_parts(eng):
    donut = "ST_GeometryFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))')"
    assert _one(eng, f"SELECT ST_NumInteriorRing({donut})") == 1
    assert _one(eng, f"SELECT ST_AsText(ST_ExteriorRing({donut}))").startswith("LINESTRING (0 0")
    assert _one(eng, f"SELECT ST_Area({donut})") == 96.0
    mp = "ST_GeometryFromText('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))')"
    assert _one(eng, f"SELECT ST_NumGeometries({mp})") == 2
    assert _one(eng, f"SELECT ST_AsText(ST_GeometryN({mp}, 2))").startswith("POLYGON ((5 5")


def test_misc_transforms(eng):
    assert _one(eng, "SELECT ST_SRID(ST_Point(1,2))") == 0
    assert _one(eng, "SELECT ST_SRID(to_spherical_geography(ST_Point(1, 2)))") == 4326
    assert _one(eng, "SELECT ST_AsText(ST_Multi(ST_Point(1, 2)))") == "MULTIPOINT ((1 2))"
    assert (
        _one(eng, "SELECT ST_AsText(ST_ReducePrecision(ST_Point(1.23456, 2.34567), 2))")
        == "POINT (1.23 2.35)"
    )
    got = _one(eng, f"SELECT ST_AsText(ST_PointOnSurface({SQ}))")
    assert got.startswith("POINT")
    assert _one(eng, "SELECT ST_Buffer(ST_Point(0, 0), 1.0)").startswith("POLYGON")
    circle = _one(eng, "SELECT ST_MinimumBoundingCircle(ST_GeometryFromText('MULTIPOINT ((0 0), (4 0))'))")
    assert circle.startswith("POLYGON")
