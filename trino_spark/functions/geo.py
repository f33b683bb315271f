"""Geospatial scalar functions — the planar subset of Trino's geospatial
plugin, expression-only (JVM codegen, no UDFs).

Reference: plugin/trino-geospatial/src/main/java/io/trino/plugin/geospatial/
GeoFunctions.java:1 (ST_Point, ST_X, ST_Y, ST_Distance, ST_Area,
ST_Centroid, ST_Contains, ST_Envelope, ST_NumPoints, ST_AsText,
ST_GeometryFromText). Trino backs these with the ESRI geometry library and
a serialized GEOMETRY type; we pick a Spark-native representation instead:

- POINT      -> struct<x:double, y:double>
- POLYGON    -> array<struct<x:double, y:double>> (single ring, open form:
                the closing vertex is NOT repeated; functions close the
                ring arithmetically)

Everything below is a composition of higher-order array expressions
(`zip_with`, `aggregate`, `transform`) so polygons stay columnar and all
math runs inside whole-stage codegen — a million-polygon column never
leaves the JVM. Extended representations:

- POLYGON (with holes) -> array<ring> — rings[0] is the shell, the rest
  are holes (st_area_polygon / st_contains_polygon / st_polygon_from_text)
- MULTIPOLYGON -> array<polygon> (st_area_multi / st_contains_multi)
- Geodesic: st_sphere_distance (haversine, Trino's
  great_circle_distance radius) and st_sphere_area (spherical shoelace)
  treat x as longitude and y as latitude, matching the reference's
  SphericalGeographyType functions (GeoFunctions.java ST_Distance on
  SPHERICAL_GEOGRAPHY).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def st_point(x: Column | str, y: Column | str) -> Column:
    """GeoFunctions.java ST_Point: planar point constructor."""
    return F.struct(_c(x).cast("double").alias("x"), _c(y).cast("double").alias("y"))


def st_x(p: Column | str) -> Column:
    return _c(p)["x"]


def st_y(p: Column | str) -> Column:
    return _c(p)["y"]


def st_distance(a: Column | str, b: Column | str) -> Column:
    """GeoFunctions.java ST_Distance for points (euclidean, planar)."""
    a, b = _c(a), _c(b)
    return F.sqrt(
        (a["x"] - b["x"]) * (a["x"] - b["x"]) + (a["y"] - b["y"]) * (a["y"] - b["y"])
    )


def _edges(ring: Column) -> Column:
    """Closed edge list of an open ring: zip vertices with the ring rotated
    by one, yielding array<struct<x1,y1,x2,y2>>."""
    n = F.size(ring)
    rotated = F.concat(F.slice(ring, 2, n - 1), F.slice(ring, 1, 1))
    return F.zip_with(
        ring,
        rotated,
        lambda a, b: F.struct(
            a["x"].alias("x1"), a["y"].alias("y1"), b["x"].alias("x2"), b["y"].alias("y2")
        ),
    )


def st_num_points(ring: Column | str) -> Column:
    return F.size(_c(ring))


def st_area(ring: Column | str) -> Column:
    """GeoFunctions.java ST_Area — shoelace formula over the edge list."""
    return F.abs(_signed_area2(_c(ring))) / 2.0


def _signed_area2(ring: Column) -> Column:
    return F.aggregate(
        _edges(ring),
        F.lit(0.0),
        lambda acc, e: acc + (e["x1"] * e["y2"] - e["x2"] * e["y1"]),
    )


def st_perimeter(ring: Column | str) -> Column:
    return F.aggregate(
        _edges(_c(ring)),
        F.lit(0.0),
        lambda acc, e: acc
        + F.sqrt(
            (e["x2"] - e["x1"]) * (e["x2"] - e["x1"])
            + (e["y2"] - e["y1"]) * (e["y2"] - e["y1"])
        ),
    )


def st_centroid(ring: Column | str) -> Column:
    """GeoFunctions.java ST_Centroid for polygons: area-weighted centroid
    (cx, cy) = sum((v_i + v_{i+1}) * cross_i) / (3 * sum(cross_i))."""
    ring = _c(ring)
    acc = F.aggregate(
        _edges(ring),
        F.struct(F.lit(0.0).alias("a2"), F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy")),
        lambda s, e: F.struct(
            (s["a2"] + (e["x1"] * e["y2"] - e["x2"] * e["y1"])).alias("a2"),
            (s["sx"] + (e["x1"] + e["x2"]) * (e["x1"] * e["y2"] - e["x2"] * e["y1"])).alias("sx"),
            (s["sy"] + (e["y1"] + e["y2"]) * (e["x1"] * e["y2"] - e["x2"] * e["y1"])).alias("sy"),
        ),
    )
    return F.struct(
        (acc["sx"] / (3.0 * acc["a2"])).alias("x"),
        (acc["sy"] / (3.0 * acc["a2"])).alias("y"),
    )


def st_contains(ring: Column | str, p: Column | str) -> Column:
    """GeoFunctions.java ST_Contains (polygon ⊇ point) via ray casting:
    a rightward ray from the point crosses an odd number of edges iff the
    point is inside. Boundary points are implementation-defined (as in the
    ESRI library); callers should keep test points off edges."""
    p = _c(p)
    crossings = F.aggregate(
        _edges(_c(ring)),
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["y1"] > p["y"]) != (e["y2"] > p["y"]))
            & (
                p["x"]
                < (e["x2"] - e["x1"]) * (p["y"] - e["y1"]) / (e["y2"] - e["y1"]) + e["x1"]
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def st_envelope(ring: Column | str) -> Column:
    """Bounding box as struct<xmin,ymin,xmax,ymax> (ST_Envelope)."""
    ring = _c(ring)
    xs = F.transform(ring, lambda v: v["x"])
    ys = F.transform(ring, lambda v: v["y"])
    return F.struct(
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    )


def st_geometry_from_text(wkt: Column | str) -> Column:
    """WKT parser for the supported subset (GeoFunctions.java
    ST_GeometryFromText). POLYGON ((...)) single ring -> open vertex array
    (the WKT closing vertex is dropped); POINT (x y) -> 1-element ring.
    Pure string expressions: split on ',' then on whitespace."""
    wkt = F.trim(_c(wkt))
    body = F.regexp_extract(wkt, r"\(\(?([^()]*)\)?\)", 1)
    verts = F.transform(
        F.split(body, r"\s*,\s*"),
        lambda s: F.struct(
            F.split(F.trim(s), r"\s+")[0].cast("double").alias("x"),
            F.split(F.trim(s), r"\s+")[1].cast("double").alias("y"),
        ),
    )
    # WKT rings repeat the first vertex last; drop it when present.
    closed = (F.size(verts) > 1) & (F.element_at(verts, 1) == F.element_at(verts, -1))
    return F.when(closed, F.slice(verts, 1, F.size(verts) - 1)).otherwise(verts)


# ---------------------------------------------- polygons with holes / multi


def st_area_polygon(rings: Column | str) -> Column:
    """Area of a polygon with holes (rings[0] = shell, rest = holes):
    shell area minus hole areas (GeoFunctions.java ST_Area on POLYGON)."""
    rings = _c(rings)
    shell = F.element_at(rings, 1)
    holes = F.slice(rings, 2, F.greatest(F.size(rings) - 1, F.lit(0)))
    return st_area(shell) - F.aggregate(
        holes, F.lit(0.0), lambda acc, r: acc + st_area(r)
    )


def st_contains_polygon(rings: Column | str, p: Column | str) -> Column:
    """Point-in-polygon honoring holes: inside the shell and not inside
    any hole ring."""
    rings, p = _c(rings), _c(p)
    holes = F.slice(rings, 2, F.greatest(F.size(rings) - 1, F.lit(0)))
    return st_contains(F.element_at(rings, 1), p) & ~F.exists(
        holes, lambda r: st_contains(r, p)
    )


def st_area_multi(polys: Column | str) -> Column:
    """MULTIPOLYGON area: sum of member polygon areas."""
    return F.aggregate(_c(polys), F.lit(0.0), lambda acc, rings: acc + st_area_polygon(rings))


def st_contains_multi(polys: Column | str, p: Column | str) -> Column:
    """MULTIPOLYGON contains: any member polygon contains the point."""
    p = _c(p)
    return F.exists(_c(polys), lambda rings: st_contains_polygon(rings, p))


def _rings_from_body(body: Column) -> Column:
    """'(x y, ...), (x y, ...)' -> array<ring> (each parenthesized vertex
    list becomes one open ring)."""
    bodies = F.regexp_extract_all(body, F.lit(r"\(([^()]+)\)"), F.lit(1))
    return F.transform(
        bodies,
        lambda b: _open_ring(
            F.transform(
                F.split(b, r"\s*,\s*"),
                lambda s: F.struct(
                    F.split(F.trim(s), r"\s+")[0].cast("double").alias("x"),
                    F.split(F.trim(s), r"\s+")[1].cast("double").alias("y"),
                ),
            )
        ),
    )


def st_polygon_from_text(wkt: Column | str) -> Column:
    """POLYGON ((shell), (hole), ...) WKT -> array<ring> (holes kept)."""
    return _rings_from_body(_c(wkt))


def st_multi_polygon_from_text(wkt: Column | str) -> Column:
    """MULTIPOLYGON WKT -> array<polygon> = array<array<ring>>, shell/hole
    grouping preserved per member polygon (GeoFunctions.java
    ST_GeometryFromText on multipolygons).

    Pure-expression parse: polygons inside the outer wrapper are delimited
    by `)), ((`; we canonicalize that delimiter to `|`, split, then reuse
    the per-polygon ring extraction. No UDF — a WKT column parses inside
    whole-stage codegen."""
    s = F.regexp_replace(F.trim(_c(wkt)), r"(?i)^MULTIPOLYGON\s*\(", "")
    s = F.regexp_replace(s, r"\)\s*$", "")
    s = F.regexp_replace(s, r"\)\s*\)\s*,\s*\(\s*\(", "))|((")
    return F.transform(F.split(s, r"\|"), _rings_from_body)


def _open_ring(verts: Column) -> Column:
    closed = (F.size(verts) > 1) & (F.element_at(verts, 1) == F.element_at(verts, -1))
    return F.when(closed, F.slice(verts, 1, F.size(verts) - 1)).otherwise(verts)


# ------------------------------------------------------------- geodesic math

_EARTH_RADIUS_KM = 6371.01  # Trino MathFunctions.java great_circle_distance


def st_sphere_distance(a: Column | str, b: Column | str) -> Column:
    """Haversine distance in km between two points whose x is longitude
    and y is latitude (GeoFunctions.java ST_Distance on
    SPHERICAL_GEOGRAPHY; same mean-Earth radius as great_circle_distance)."""
    a, b = _c(a), _c(b)
    rlat1, rlon1 = F.radians(a["y"]), F.radians(a["x"])
    rlat2, rlon2 = F.radians(b["y"]), F.radians(b["x"])
    dlat = (rlat2 - rlat1) / 2
    dlon = (rlon2 - rlon1) / 2
    h = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return 2 * _EARTH_RADIUS_KM * F.asin(F.sqrt(h))


def st_sphere_area(ring: Column | str) -> Column:
    """Approximate spherical ring area in km^2 via the spherical shoelace
    formula sum((lon2-lon1) * (2 + sin(lat1) + sin(lat2))) * R^2 / 2 —
    the standard small-polygon approximation (GeoFunctions.java ST_Area on
    SPHERICAL_GEOGRAPHY uses the same family of spherical-excess math)."""
    acc = F.aggregate(
        _edges(_c(ring)),
        F.lit(0.0),
        lambda s, e: s
        + (F.radians(e["x2"]) - F.radians(e["x1"]))
        * (2.0 + F.sin(F.radians(e["y1"])) + F.sin(F.radians(e["y2"]))),
    )
    return F.abs(acc) * _EARTH_RADIUS_KM * _EARTH_RADIUS_KM / 2.0


def st_as_text(ring: Column | str) -> Column:
    """ST_AsText for the polygon subset (re-closes the ring)."""
    ring = _c(ring)
    pts = F.transform(ring, lambda v: F.concat_ws(" ", v["x"], v["y"]))
    first = F.element_at(pts, 1)
    return F.concat(
        F.lit("POLYGON (("), F.array_join(pts, ", "), F.lit(", "), first, F.lit("))")
    )


def st_sphere_contains(ring: Column | str, p: Column | str) -> Column:
    """Point-in-spherical-polygon (ST_Contains on SPHERICAL_GEOGRAPHY,
    GeoFunctions.java geodesic predicates).

    Gnomonic-projection reduction, expression-only: project every vertex
    onto the tangent plane at the query point (great circles map to
    straight lines under gnomonic projection), then run the SAME planar
    ray-cast used by st_contains. Exact for polygons contained in the
    hemisphere centered at the point — vertices on the far hemisphere
    (cos_c <= 0) make the result NULL rather than silently wrong. x is
    longitude, y latitude, ring an open vertex array like every other
    polygon function here."""
    r, pt = _c(ring), _c(p)
    lat0, lon0 = F.radians(pt["y"]), F.radians(pt["x"])

    def _project(v: Column) -> Column:
        lat, lon = F.radians(v["y"]), F.radians(v["x"])
        cos_c = F.sin(lat0) * F.sin(lat) + F.cos(lat0) * F.cos(lat) * F.cos(lon - lon0)
        return F.struct(
            (F.cos(lat) * F.sin(lon - lon0) / cos_c).alias("x"),
            (
                (
                    F.cos(lat0) * F.sin(lat)
                    - F.sin(lat0) * F.cos(lat) * F.cos(lon - lon0)
                )
                / cos_c
            ).alias("y"),
            cos_c.alias("c"),
        )

    proj = F.transform(r, _project)
    in_hemisphere = F.forall(proj, lambda v: v["c"] > 0)
    planar = F.transform(proj, lambda v: F.struct(v["x"].alias("x"), v["y"].alias("y")))
    origin = F.struct(F.lit(0.0).alias("x"), F.lit(0.0).alias("y"))
    return F.when(in_hemisphere, st_contains(planar, origin)).otherwise(F.lit(None))
