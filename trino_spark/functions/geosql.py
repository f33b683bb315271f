"""SQL-callable geospatial surface — Trino's geospatial plugin spelling.

Reference: docs/src/main/sphinx/functions/geospatial.md and
plugin/trino-geospatial GeoFunctions.java / BingTileFunctions.java.

Representation: a GEOMETRY value is its WKT varchar; a SPHERICAL
GEOGRAPHY value is EWKT-tagged WKT (``SRID=4326;POINT (lng lat)``), so
`ST_Distance`/`ST_Area` dispatch planar-vs-geodesic exactly where Trino
overloads on the type. A BingTile is ``struct<x:int, y:int, zoom:int>``.

All functions run through the pure-Python kernel
(functions/geomkernel.py) as scalar UDFs — the hot distributed path
remains the expression-only Column API (functions/geo.py, tiles.py) and
the grid-bucketed spatial join (operators/spatial.py); these UDFs exist
so verbatim reference SQL evaluates.

Documented out-of-scope names (raise / unregistered): ST_Relate (DE-9IM
matrix), ST_Transform (CRS reprojection), ST_VoronoiPolygons,
ST_Polygonize, ST_TransformXY (lambda argument), geometry_from_hadoop_shape
(Esri shapefile binary), spatial_partitioning / spatial_partitions (the
grid-bucketed join is this engine's partitioning story), KML/EWKB codecs,
Z-coordinate carriers (engine is 2D planar).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from trino_spark.functions import geomkernel as K

_SPHERE_TAG = "SRID=4326;"


def _parse(w):
    if w.startswith(_SPHERE_TAG):
        w = w[len(_SPHERE_TAG) :]
    return K.parse_wkt(w)


def _is_sphere(w):
    return w.startswith(_SPHERE_TAG)


def _g1(fn):
    """Wrap kernel fn(geom) with WKT boundary + null passthrough."""

    def run(w, *rest):
        if w is None or any(r is None for r in rest):
            return None
        return fn(_parse(w), *rest)

    return run


def _g2(fn):
    def run(a, b, *rest):
        if a is None or b is None or any(r is None for r in rest):
            return None
        return fn(_parse(a), _parse(b), *rest)

    return run


def _gw(fn):
    """Kernel fn returning a geometry -> WKT."""

    def run(*args):
        if any(a is None for a in args):
            return None
        out = fn(*args)
        return None if out is None else K.to_wkt(out)

    return run


# ------------------------------------------------------------ bing tiles


def _bing_dims(zoom):
    if not (0 <= zoom <= 23):
        raise ValueError("zoom must be in [0, 23]")
    return 1 << zoom


def _bing_tile(*args):
    if any(a is None for a in args):
        return None
    if len(args) == 1:  # quadkey form
        qk = args[0]
        x = y = 0
        for ch in qk:
            d = int(ch)
            x = (x << 1) | (d & 1)
            y = (y << 1) | (d >> 1)
        return (x, y, len(qk))
    x, y, zoom = (int(a) for a in args)
    n = _bing_dims(zoom)
    if not (0 <= x < n and 0 <= y < n):
        raise ValueError("tile coordinates out of range for zoom")
    return (x, y, zoom)


def _latlng_to_tile(lat, lng, zoom):
    lat = min(85.05112878, max(-85.05112878, float(lat)))
    lng = float(lng)
    n = _bing_dims(zoom)
    x = int((lng + 180.0) / 360.0 * n)
    s = math.sin(math.radians(lat))
    y = int((0.5 - math.log((1 + s) / (1 - s)) / (4 * math.pi)) * n)
    return (min(n - 1, max(0, x)), min(n - 1, max(0, y)), zoom)


def _tile_xyz(tile):
    """Struct arguments reach Python UDFs as Row, dict, or plain tuple
    depending on the execution path — normalize to (x, y, zoom)."""
    if isinstance(tile, (tuple, list)):
        return int(tile[0]), int(tile[1]), int(tile[2])
    return int(tile["x"]), int(tile["y"]), int(tile["zoom"])


def _tile_bounds(tile):
    x, y, zoom = _tile_xyz(tile)
    n = _bing_dims(zoom)

    def lng(px):
        return px / n * 360.0 - 180.0

    def lat(py):
        t = math.pi * (1 - 2 * py / n)
        return math.degrees(math.atan(math.sinh(t)))

    return lng(x), lat(y + 1), lng(x + 1), lat(y)  # w, s, e, n


def _bing_quadkey(tile):
    if tile is None:
        return None
    x, y, zoom = _tile_xyz(tile)
    out = []
    for i in range(zoom, 0, -1):
        d = 0
        mask = 1 << (i - 1)
        if x & mask:
            d += 1
        if y & mask:
            d += 2
        out.append(str(d))
    return "".join(out)


def _bing_polygon(tile):
    if tile is None:
        return None
    w, s, e, n = _tile_bounds(tile)
    return K.to_wkt(("POLYGON", [[(w, s), (e, s), (e, n), (w, n), (w, s)]]))


def _bing_tiles_around(*args):
    if any(a is None for a in args):
        return None
    lat, lng, zoom = float(args[0]), float(args[1]), int(args[2])
    if len(args) == 4:  # radius_km form
        radius = float(args[3])
        deg_lat = radius / 111.32
        deg_lng = radius / (111.32 * max(0.01, math.cos(math.radians(lat))))
        x0, y1, z = _latlng_to_tile(lat + deg_lat, lng - deg_lng, zoom)
        x1, y0, z = _latlng_to_tile(lat - deg_lat, lng + deg_lng, zoom)
        return [(x, y, zoom) for x in range(x0, x1 + 1) for y in range(min(y0, y1), max(y0, y1) + 1)]
    cx, cy, _ = _latlng_to_tile(lat, lng, zoom)
    n = _bing_dims(zoom)
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            x, y = cx + dx, cy + dy
            if 0 <= x < n and 0 <= y < n:
                out.append((x, y, zoom))
    return out


def _geometry_to_bing_tiles(wkt, zoom):
    if wkt is None or zoom is None:
        return None
    g = _parse(wkt)
    pts = K._points_of(g)
    if not pts:
        return []
    zoom = int(zoom)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    x0, y1, _ = _latlng_to_tile(max(ys), min(xs), zoom)
    x1, y0, _ = _latlng_to_tile(min(ys), max(xs), zoom)
    return [
        (x, y, zoom)
        for x in range(x0, x1 + 1)
        for y in range(min(y0, y1), max(y0, y1) + 1)
    ]


# ----------------------------------------------------------- registration

_TILE_T = "struct<x:int,y:int,zoom:int>"


def register_geo_functions(spark: SparkSession) -> None:
    reg = spark.udf.register

    # constructors / codecs
    reg("st_point", lambda x, y: None if None in (x, y) else K.to_wkt(("POINT", (float(x), float(y)))), "string")
    reg("st_geometryfromtext", lambda w: None if w is None else K.to_wkt(_parse(w)), "string")
    reg("st_linefromtext", lambda w: None if w is None else K.to_wkt(_parse(w)), "string")
    reg("st_polygon", lambda w: None if w is None else K.to_wkt(_parse(w)), "string")
    reg("st_astext", lambda w: None if w is None else K.to_wkt(_parse(w)), "string")
    reg("st_asbinary", lambda w: None if w is None else K.to_wkb(_parse(w)), "binary")
    reg("st_geomfrombinary", lambda b: None if b is None else K.to_wkt(K.from_wkb(bytes(b))), "string")
    reg(
        "st_linestring",
        lambda pts: None if pts is None else K.to_wkt(("LINESTRING", [_parse(p)[1] for p in pts])),
        "string",
    )
    reg(
        "st_multipoint",
        lambda pts: None if pts is None else K.to_wkt(("MULTIPOINT", [_parse(p)[1] for p in pts])),
        "string",
    )
    reg(
        "st_makeline",
        lambda gs: None
        if gs is None
        else K.to_wkt(("LINESTRING", [p for g in gs for p in K._points_of(_parse(g))])),
        "string",
    )

    def _make_polygon(w):
        if w is None:
            return None
        g = _parse(w)
        if g[0] != "LINESTRING" or g[1][0] != g[1][-1]:
            raise ValueError("ST_MakePolygon requires a closed LineString")
        return K.to_wkt(("POLYGON", [g[1]]))

    reg("st_makepolygon", _make_polygon, "string")
    reg("to_geojson_geometry", _g1(K.to_geojson), "string")
    reg("from_geojson_geometry", lambda s: None if s is None else K.to_wkt(K.from_geojson(s)), "string")
    reg(
        "to_encoded_polyline",
        _g1(lambda g: K.encode_polyline(K._points_of(g))),
        "string",
    )
    reg(
        "from_encoded_polyline",
        lambda s: None if s is None else K.to_wkt(("LINESTRING", K.decode_polyline(s))),
        "string",
    )

    # accessors
    reg("st_x", _g1(lambda g: g[1][0] if g[0] == "POINT" and g[1] else None), "double")
    reg("st_y", _g1(lambda g: g[1][1] if g[0] == "POINT" and g[1] else None), "double")
    for name, idx, agg in (("st_xmin", 0, min), ("st_xmax", 0, max), ("st_ymin", 1, min), ("st_ymax", 1, max)):
        reg(
            name,
            _g1(lambda g, _i=idx, _a=agg: _a((p[_i] for p in K._points_of(g)), default=None)),
            "double",
        )
    reg("st_numpoints", _g1(lambda g: len(K._points_of(g))), "bigint")
    reg(
        "st_numgeometries",
        _g1(lambda g: 0 if g[1] is None else (len(g[1]) if g[0].startswith("MULTI") or g[0] == "GEOMETRYCOLLECTION" else 1)),
        "bigint",
    )

    def _geometry_n(w, n):
        if w is None or n is None:
            return None
        g = _parse(w)
        n = int(n)
        if g[0] == "GEOMETRYCOLLECTION":
            parts = g[1]
            return K.to_wkt(parts[n - 1]) if 1 <= n <= len(parts) else None
        if g[0].startswith("MULTI"):
            inner = g[0][5:]
            parts = g[1] or []
            return K.to_wkt((inner, parts[n - 1])) if 1 <= n <= len(parts) else None
        return K.to_wkt(g) if n == 1 else None

    reg("st_geometryn", _geometry_n, "string")
    reg(
        "st_geometries",
        _g1(
            lambda g: None
            if g[1] is None
            else (
                [K.to_wkt(s) for s in g[1]]
                if g[0] == "GEOMETRYCOLLECTION"
                else [K.to_wkt((g[0][5:], p)) for p in g[1]]
                if g[0].startswith("MULTI")
                else [K.to_wkt(g)]
            )
        ),
        "array<string>",
    )
    def _point_n(w, n):
        if w is None or n is None:
            return None
        g = _parse(w)
        if g[0] == "LINESTRING" and 1 <= int(n) <= len(g[1]):
            return K.to_wkt(("POINT", g[1][int(n) - 1]))
        return None

    reg("st_pointn", _point_n, "string")
    reg(
        "st_startpoint",
        _g1(lambda g: K.to_wkt(("POINT", g[1][0])) if g[0] == "LINESTRING" and g[1] else None),
        "string",
    )
    reg(
        "st_endpoint",
        _g1(lambda g: K.to_wkt(("POINT", g[1][-1])) if g[0] == "LINESTRING" and g[1] else None),
        "string",
    )
    reg("st_points", _g1(lambda g: [K.to_wkt(("POINT", p)) for p in K._points_of(g)]), "array<string>")
    reg(
        "st_exteriorring",
        _g1(lambda g: K.to_wkt(("LINESTRING", g[1][0])) if g[0] == "POLYGON" and g[1] else None),
        "string",
    )
    reg(
        "st_interiorringn",
        lambda w, n: None
        if w is None or n is None
        else (
            K.to_wkt(("LINESTRING", _parse(w)[1][int(n)]))
            if _parse(w)[0] == "POLYGON" and 1 <= int(n) < len(_parse(w)[1])
            else None
        ),
        "string",
    )
    reg(
        "st_interiorrings",
        _g1(lambda g: [K.to_wkt(("LINESTRING", r)) for r in (g[1] or [])[1:]] if g[0] == "POLYGON" else None),
        "array<string>",
    )
    reg(
        "st_numinteriorring",
        _g1(lambda g: max(0, len(g[1] or []) - 1) if g[0] == "POLYGON" else None),
        "bigint",
    )
    _TYPE_NAMES = {
        "POINT": "ST_Point", "MULTIPOINT": "ST_MultiPoint", "LINESTRING": "ST_LineString",
        "MULTILINESTRING": "ST_MultiLineString", "POLYGON": "ST_Polygon",
        "MULTIPOLYGON": "ST_MultiPolygon", "GEOMETRYCOLLECTION": "ST_GeomCollection",
    }
    reg("st_geometrytype", _g1(lambda g: _TYPE_NAMES[g[0]]), "string")
    reg("st_dimension", _g1(K._dim), "int")
    reg("st_coorddim", _g1(lambda g: 2), "int")
    reg("st_isempty", _g1(lambda g: g[1] is None or g[1] == []), "boolean")
    reg(
        "st_isclosed",
        _g1(
            lambda g: all(line[0] == line[-1] for line in (g[1] if g[0] == "MULTILINESTRING" else [g[1]]))
            if g[0] in ("LINESTRING", "MULTILINESTRING") and g[1]
            else None
        ),
        "boolean",
    )
    reg(
        "st_isring",
        _g1(lambda g: g[0] == "LINESTRING" and bool(g[1]) and g[1][0] == g[1][-1] and K.is_simple(g)),
        "boolean",
    )
    reg("st_issimple", _g1(K.is_simple), "boolean")
    reg("st_isvalid", _g1(K.is_valid), "boolean")
    reg("geometry_invalid_reason", _g1(K.invalid_reason), "string")

    # measures
    def _area(w):
        if w is None:
            return None
        g = _parse(w)
        return K.spherical_area_m2(g) if _is_sphere(w) else K.area(g)

    reg("st_area", _area, "double")
    reg("st_length", _g1(K.length), "double")
    reg("st_perimeter", _g1(lambda g: K.length(g)), "double")

    def _distance(a, b):
        if a is None or b is None:
            return None
        if _is_sphere(a) and _is_sphere(b):
            ga, gb = _parse(a), _parse(b)
            if ga[0] == "POINT" and gb[0] == "POINT":
                return K.spherical_distance_m(ga[1], gb[1])
            raise ValueError("geodesic ST_Distance supports points")
        return K.distance(_parse(a), _parse(b))

    reg("st_distance", _distance, "double")
    reg("st_centroid", _g1(lambda g: None if K.centroid(g) is None else K.to_wkt(("POINT", K.centroid(g)))), "string")
    reg("st_envelope", _g1(lambda g: K.to_wkt(K.envelope(g))), "string")
    reg(
        "st_envelopeaspts",
        _g1(
            lambda g: (
                lambda pts: None
                if not pts
                else [
                    K.to_wkt(("POINT", (min(p[0] for p in pts), min(p[1] for p in pts)))),
                    K.to_wkt(("POINT", (max(p[0] for p in pts), max(p[1] for p in pts)))),
                ]
            )(K._points_of(g))
        ),
        "array<string>",
    )

    def _boundary(g):
        if g[1] is None:
            return (g[0], None)
        if g[0] == "POLYGON":
            rings = [("LINESTRING", r) for r in g[1]]
            return rings[0] if len(rings) == 1 else ("MULTILINESTRING", [r[1] for r in rings])
        if g[0] == "MULTIPOLYGON":
            return ("MULTILINESTRING", [r for poly in g[1] for r in poly])
        if g[0] == "LINESTRING":
            return ("MULTIPOINT", [g[1][0], g[1][-1]]) if g[1][0] != g[1][-1] else ("MULTIPOINT", [])
        return ("GEOMETRYCOLLECTION", [])

    reg("st_boundary", _g1(lambda g: K.to_wkt(_boundary(g))), "string")

    # predicates
    reg("st_contains", _g2(K.contains), "boolean")
    reg("st_within", _g2(K.within), "boolean")
    reg("st_intersects", _g2(K.intersects), "boolean")
    reg("st_disjoint", _g2(K.disjoint), "boolean")
    reg("st_equals", _g2(K.equals), "boolean")
    reg("st_touches", _g2(K.touches), "boolean")
    reg("st_crosses", _g2(K.crosses), "boolean")
    reg("st_overlaps", _g2(K.overlaps), "boolean")

    # constructive
    reg("st_union", _g2(lambda a, b: K.to_wkt(K.union(a, b))), "string")
    reg("st_intersection", _g2(lambda a, b: K.to_wkt(K.intersection(a, b))), "string")
    reg("st_difference", _g2(lambda a, b: K.to_wkt(K.difference(a, b))), "string")
    reg("st_symdifference", _g2(lambda a, b: K.to_wkt(K.sym_difference(a, b))), "string")
    reg(
        "st_convexhull",
        _g1(
            lambda g: K.to_wkt(
                (lambda h: ("POINT", h[0]) if len(h) == 1 else ("LINESTRING", h) if len(h) == 2 else ("POLYGON", [h + [h[0]]]))(
                    K.convex_hull(K._points_of(g))
                )
            )
        ),
        "string",
    )
    reg("st_buffer", lambda w, d: None if w is None or d is None else K.to_wkt(K.buffer_geometry(_parse(w), float(d))), "string")
    reg("simplify_geometry", lambda w, t: None if w is None or t is None else K.to_wkt(K.simplify(_parse(w), float(t))), "string")
    reg(
        "st_minimumboundingcircle",
        _g1(
            lambda g: (
                lambda c: K.to_wkt(K.buffer_geometry(("POINT", (c[0], c[1])), c[2]))
                if c and c[2] > 0
                else K.to_wkt(("POINT", (c[0], c[1])))
            )(K.min_bounding_circle(K._points_of(g)))
        ),
        "string",
    )
    reg(
        "geometry_nearest_points",
        _g2(lambda a, b: (lambda np_: None if np_ is None else [K.to_wkt(("POINT", np_[0])), K.to_wkt(("POINT", np_[1]))])(K.nearest_points(a, b))),
        "array<string>",
    )

    def _geometry_union_list(geoms):
        polys = []  # simple polygons kept separate until something overlaps
        others = []
        for g in geoms:
            if K._dim(g) == 2:
                for rings in K._polygons_of(g):
                    if len(rings) > 1:
                        raise ValueError("geometry_union: polygons with holes unsupported")
                    polys.append(("POLYGON", rings))
            elif g[1] is not None:
                others.append(g)
        merged: list = []
        for p in polys:
            i = 0
            while i < len(merged):
                if K.intersects(merged[i], p):
                    u = K.union(merged[i], p)
                    if u[0] == "POLYGON":
                        p = u
                        merged.pop(i)
                        i = 0
                        continue
                i += 1
            merged.append(p)
        if others and not merged:
            if len(others) == 1:
                return others[0]
            return ("GEOMETRYCOLLECTION", others)
        if not merged:
            return ("POLYGON", None)
        out = merged[0] if len(merged) == 1 else ("MULTIPOLYGON", [p[1] for p in merged])
        if others:
            return ("GEOMETRYCOLLECTION", [out] + others)
        return out

    reg(
        "geometry_union",
        lambda arr: None if arr is None else K.to_wkt(_geometry_union_list([_parse(w) for w in arr if w is not None])),
        "string",
    )

    # simple transforms
    reg("st_force2d", lambda w: None if w is None else K.to_wkt(_parse(w)), "string")
    reg("st_srid", lambda w: None if w is None else (4326 if _is_sphere(w) else 0), "int")
    reg(
        "st_setsrid",
        lambda w, srid: None if w is None or srid is None else ((_SPHERE_TAG if int(srid) == 4326 else "") + K.to_wkt(_parse(w))),
        "string",
    )
    reg(
        "st_multi",
        _g1(
            lambda g: K.to_wkt(
                g
                if g[0].startswith("MULTI") or g[0] == "GEOMETRYCOLLECTION"
                else ("MULTI" + g[0], [g[1]] if g[1] is not None else None)
            )
        ),
        "string",
    )

    def _normalize(g):
        def norm_ring(r, ccw):
            r = r[:-1]
            if (K.ring_area(r + [r[0]]) > 0) != ccw:
                r = r[::-1]
            k = r.index(min(r))
            r = r[k:] + r[:k]
            return r + [r[0]]

        if g[0] == "POLYGON" and g[1]:
            return ("POLYGON", [norm_ring(r, i == 0) for i, r in enumerate(g[1])])
        if g[0] == "MULTIPOLYGON" and g[1]:
            return ("MULTIPOLYGON", sorted(
                [[norm_ring(r, i == 0) for i, r in enumerate(poly)] for poly in g[1]]
            ))
        if g[0] == "MULTIPOINT" and g[1]:
            return ("MULTIPOINT", sorted(set(g[1])))
        return g

    reg("st_normalize", _g1(lambda g: K.to_wkt(_normalize(g))), "string")
    reg(
        "st_reduceprecision",
        lambda w, scale: None
        if w is None or scale is None
        else K.to_wkt(_map_coords(_parse(w), lambda p: (round(p[0], int(scale)), round(p[1], int(scale))))),
        "string",
    )
    reg(
        "st_pointonsurface",
        _g1(
            lambda g: K.to_wkt(
                ("POINT", (K._interior_point(K._polygons_of(g)[0]) if K._polygons_of(g) else K.centroid(g)))
            )
        ),
        "string",
    )
    reg(
        "st_linemerge",
        _g1(
            lambda g: K.to_wkt(
                (lambda m: ("LINESTRING", m[0]) if len(m) == 1 else ("MULTILINESTRING", m))(
                    K._merge_lines([list(line) for line in (g[1] if g[0] == "MULTILINESTRING" else [g[1]])])
                )
            )
        ),
        "string",
    )

    # line referencing
    reg(
        "line_locate_point",
        _g2(lambda line, pt: K.line_locate(line[1], pt[1]) if line[0] == "LINESTRING" else None),
        "double",
    )
    reg(
        "line_interpolate_point",
        lambda w, f: None
        if w is None or f is None
        else K.to_wkt(("POINT", K.line_interpolate(_parse(w)[1], float(f)))),
        "string",
    )
    reg(
        "line_interpolate_points",
        lambda w, f: None
        if w is None or f is None
        else [
            K.to_wkt(("POINT", K.line_interpolate(_parse(w)[1], min(1.0, float(f) * i))))
            for i in range(1, int(1.0 / float(f)) + 1)
        ],
        "array<string>",
    )

    # geodesy
    reg(
        "great_circle_distance",
        lambda lat1, lng1, lat2, lng2: None
        if None in (lat1, lng1, lat2, lng2)
        else K.great_circle_km(float(lat1), float(lng1), float(lat2), float(lng2)),
        "double",
    )
    reg("to_geometry", lambda w: None if w is None else K.to_wkt(_parse(w)), "string")

    def _to_sphere(w):
        if w is None:
            return None
        g = _parse(w)
        for (x, y) in K._points_of(g):
            if not (-180 <= x <= 180 and -90 <= y <= 90):
                raise ValueError("to_spherical_geography: coordinates out of lng/lat range")
        return _SPHERE_TAG + K.to_wkt(g)

    reg("to_spherical_geography", _to_sphere, "string")

    # bing tiles
    reg("bing_tile", _bing_tile, _TILE_T)
    reg(
        "bing_tile_at",
        lambda lat, lng, zoom: None if None in (lat, lng, zoom) else _latlng_to_tile(lat, lng, int(zoom)),
        _TILE_T,
    )
    reg(
        "bing_tile_coordinates",
        lambda t: None if t is None else _tile_xyz(t)[:2],
        "struct<x:int,y:int>",
    )
    reg("bing_tile_zoom_level", lambda t: None if t is None else _tile_xyz(t)[2], "int")
    reg("bing_tile_quadkey", _bing_quadkey, "string")
    reg("bing_tile_polygon", _bing_polygon, "string")
    reg("bing_tiles_around", _bing_tiles_around, f"array<{_TILE_T}>")
    reg("geometry_to_bing_tiles", _geometry_to_bing_tiles, f"array<{_TILE_T}>")

    # aggregates (Arrow GROUPED_AGG)
    @pandas_udf("string")
    def convex_hull_agg(w: pd.Series) -> str:
        pts = [p for wkt in w.dropna() for p in K._points_of(_parse(wkt))]
        h = K.convex_hull(pts)
        if not h:
            return None
        if len(h) == 1:
            return K.to_wkt(("POINT", h[0]))
        if len(h) == 2:
            return K.to_wkt(("LINESTRING", h))
        return K.to_wkt(("POLYGON", [h + [h[0]]]))

    @pandas_udf("string")
    def geometry_collect_agg(w: pd.Series) -> str:
        geoms = [_parse(wkt) for wkt in w.dropna()]
        return K.to_wkt(("GEOMETRYCOLLECTION", geoms)) if geoms else None

    @pandas_udf("string")
    def geometry_union_agg(w: pd.Series) -> str:
        geoms = [_parse(wkt) for wkt in w.dropna()]
        return K.to_wkt(_geometry_union_list(geoms)) if geoms else None

    reg("convex_hull_agg", convex_hull_agg)
    reg("geometry_collect_agg", geometry_collect_agg)
    reg("geometry_union_agg", geometry_union_agg)


def _map_coords(g, fn):
    gtype, data = g
    if data is None:
        return g
    if gtype == "POINT":
        return (gtype, fn(data))
    if gtype in ("MULTIPOINT", "LINESTRING"):
        return (gtype, [fn(p) for p in data])
    if gtype in ("MULTILINESTRING", "POLYGON"):
        return (gtype, [[fn(p) for p in part] for part in data])
    if gtype == "MULTIPOLYGON":
        return (gtype, [[[fn(p) for p in r] for r in poly] for poly in data])
    return (gtype, [_map_coords(s, fn) for s in data])
