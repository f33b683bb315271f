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

Round 5 closes two former gaps: ST_Relate evaluates the full DE-9IM
matrix (geomkernel.relate / relate_matrix — witness-set classification,
GeoFunctions.java:1951 stRelate parity), and ST_Transform /
ST_TransformXY reproject between EPSG:4326, EPSG:3857 (Web Mercator)
and the WGS84 UTM zones EPSG:326xx/327xx via the published spherical-
Mercator and Snyder transverse-Mercator series (GeoFunctions.java:513).
SRIDs ride the EWKT prefix (``SRID=n;WKT``) that the module already
uses for spherical geography.

Round 5 also adds ST_Polygonize (planar face walk over noded linework,
JTS Polygonizer role) and ST_VoronoiPolygons (dominance half-plane
cells, JTS VoronoiDiagramBuilder role) — see geomkernel.py.

Round 5 late additions: EWKB/EWKT/KML/hadoop-shape codecs (public
formats), spatial_partitioning / spatial_partitions (JSON KDB tree —
the reference's KdbTree role; the grid-bucketed join in
operators/spatial.py remains the default distributed partitioner).

Documented out-of-scope names (raise / unregistered): CRS definitions
beyond 4326/3857/UTM-WGS84 (a full EPSG database is a library, not a
function), Z-coordinate carriers (engine is 2D planar).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from trino_spark.functions import geomkernel as K

_SPHERE_TAG = "SRID=4326;"


def _srid_of(w: str) -> int:
    if w.startswith("SRID="):
        head, sep, _ = w.partition(";")
        if sep:
            try:
                return int(head[5:])
            except ValueError:
                pass
    return 0


def _strip_srid(w: str) -> str:
    return w.partition(";")[2] if w.startswith("SRID=") and ";" in w else w


def _parse(w):
    return K.parse_wkt(_strip_srid(w))


def _is_sphere(w):
    return w.startswith(_SPHERE_TAG)


# ---------------------------------------------------------- projections
#
# ST_Transform/ST_TransformXY (GeoFunctions.java:513): supported CRS =
# EPSG:4326 (lng/lat degrees), EPSG:3857 (spherical Web Mercator), and
# the WGS84 UTM zones EPSG:32601-32660 (N) / 32701-32760 (S). Formulas
# are the published spherical-Mercator equations and Snyder's (1987)
# transverse-Mercator series — sub-millimeter against proj for 3857 and
# sub-centimeter in-zone for UTM, plenty for an analytic engine.

_WEB_R = 6378137.0
_WGS_A = 6378137.0
_WGS_F = 1.0 / 298.257223563
_WGS_E2 = _WGS_F * (2.0 - _WGS_F)
_WGS_EP2 = _WGS_E2 / (1.0 - _WGS_E2)
_UTM_K0 = 0.9996


def _utm_params(srid: int):
    if 32601 <= srid <= 32660:
        return (srid - 32600, 0.0)  # zone, false northing
    if 32701 <= srid <= 32760:
        return (srid - 32700, 10000000.0)
    return None


def _tm_fwd(lng: float, lat: float, zone: int, fn: float):
    lat_r, lng_r = math.radians(lat), math.radians(lng)
    lng0 = math.radians(zone * 6 - 183)
    sin_l, cos_l, tan_l = math.sin(lat_r), math.cos(lat_r), math.tan(lat_r)
    n = _WGS_A / math.sqrt(1 - _WGS_E2 * sin_l * sin_l)
    t = tan_l * tan_l
    c = _WGS_EP2 * cos_l * cos_l
    a = cos_l * (lng_r - lng0)
    e2, e4, e6 = _WGS_E2, _WGS_E2**2, _WGS_E2**3
    m = _WGS_A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat_r
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * lat_r)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * lat_r)
        - (35 * e6 / 3072) * math.sin(6 * lat_r)
    )
    x = _UTM_K0 * n * (
        a
        + (1 - t + c) * a**3 / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * _WGS_EP2) * a**5 / 120
    ) + 500000.0
    y = fn + _UTM_K0 * (
        m
        + n
        * tan_l
        * (
            a * a / 2
            + (5 - t + 9 * c + 4 * c * c) * a**4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * _WGS_EP2) * a**6 / 720
        )
    )
    return x, y


def _tm_inv(x: float, y: float, zone: int, fn: float):
    e2, e4, e6 = _WGS_E2, _WGS_E2**2, _WGS_E2**3
    x -= 500000.0
    y -= fn
    m = y / _UTM_K0
    mu = m / (_WGS_A * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * math.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * math.sin(4 * mu)
        + (151 * e1**3 / 96) * math.sin(6 * mu)
        + (1097 * e1**4 / 512) * math.sin(8 * mu)
    )
    sin1, cos1, tan1 = math.sin(phi1), math.cos(phi1), math.tan(phi1)
    c1 = _WGS_EP2 * cos1 * cos1
    t1 = tan1 * tan1
    n1 = _WGS_A / math.sqrt(1 - e2 * sin1 * sin1)
    r1 = _WGS_A * (1 - e2) / (1 - e2 * sin1 * sin1) ** 1.5
    d = x / (n1 * _UTM_K0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d * d / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * _WGS_EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * _WGS_EP2 - 3 * c1 * c1)
        * d**6
        / 720
    )
    lng = math.radians(zone * 6 - 183) + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * _WGS_EP2 + 24 * t1 * t1) * d**5 / 120
    ) / cos1
    return math.degrees(lng), math.degrees(lat)


def _to_lnglat(srid: int, x: float, y: float):
    if srid == 4326:
        return x, y
    if srid == 3857:
        lng = math.degrees(x / _WEB_R)
        lat = math.degrees(2 * math.atan(math.exp(y / _WEB_R)) - math.pi / 2)
        return lng, lat
    utm = _utm_params(srid)
    if utm:
        return _tm_inv(x, y, *utm)
    raise ValueError(f"ST_Transform: unsupported SRID {srid} (4326/3857/UTM-WGS84)")


def _from_lnglat(srid: int, lng: float, lat: float):
    if srid == 4326:
        return lng, lat
    if srid == 3857:
        # the spherical-Mercator formula is defined up to ±90° exclusive
        # (GeoTools transforms latitudes beyond the ±85.06° tile cutoff
        # too — valid reference queries must not error here)
        if not -90.0 < lat < 90.0:
            raise ValueError("ST_Transform: latitude out of Web Mercator range")
        s = math.sin(math.radians(lat))
        return (
            _WEB_R * math.radians(lng),
            _WEB_R * 0.5 * math.log((1 + s) / (1 - s)),
        )
    utm = _utm_params(srid)
    if utm:
        return _tm_fwd(lng, lat, *utm)
    raise ValueError(f"ST_Transform: unsupported SRID {srid} (4326/3857/UTM-WGS84)")


def _map_coords(g, fn):
    gtype, data = g
    if data is None:
        return g
    if gtype == "POINT":
        return (gtype, fn(data))
    if gtype in ("LINESTRING", "MULTIPOINT"):
        return (gtype, [fn(p) for p in data])
    if gtype in ("POLYGON", "MULTILINESTRING"):
        return (gtype, [[fn(p) for p in ring] for ring in data])
    if gtype == "MULTIPOLYGON":
        return (gtype, [[[fn(p) for p in ring] for ring in poly] for poly in data])
    return (gtype, [_map_coords(s, fn) for s in data])  # GEOMETRYCOLLECTION


def _st_transform(w, target):
    if w is None or target is None:
        return None
    source = _srid_of(w)
    target = int(target)
    if source == 0:
        raise ValueError(
            "Cannot transform geometry with SRID 0; use ST_SetSRID to set the source SRID"
        )
    if target == 0:
        raise ValueError("targetSrid must be non-zero")
    g = _parse(w)
    if source != target and g[1] is not None:
        def conv(p):
            lng, lat = _to_lnglat(source, p[0], p[1])
            return _from_lnglat(target, lng, lat)
        g = _map_coords(g, conv)
    return f"SRID={target};" + K.to_wkt(g)


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
    # DE-9IM pattern relate (GeoFunctions.java:1951; JTS RelateNG parity)
    reg("st_relate", _g2(K.relate), "boolean")
    reg("st_relate_matrix", _g2(K.relate_matrix), "string")
    # EWKB / KML / hadoop-shape codecs (round 5; public PostGIS EWKB,
    # KML 2.2, and ESRI shapefile-record formats — geomkernel.py)
    reg(
        "st_asewkb",
        lambda w: None if w is None else K.to_ewkb(_parse(w), _srid_of(w)),
        "binary",
    )
    reg(
        "st_geomfromkml",
        lambda s: None if s is None else K.to_wkt(K.from_kml(s)),
        "string",
    )

    def _from_hadoop(b):
        if b is None:
            return None
        import struct as _s

        wkid = _s.unpack_from("<i", bytes(b), 0)[0]
        tag = f"SRID={wkid};" if wkid else ""
        return tag + K.to_wkt(K.from_hadoop_shape(b))

    reg("geometry_from_hadoop_shape", _from_hadoop, "string")
    # EWKT codecs — the engine's SRID-tagged WKT IS the EWKT shape, so
    # these are now native spellings rather than out-of-scope
    reg(
        "st_asewkt",
        lambda w: None
        if w is None
        else (
            (f"SRID={_srid_of(w)};" if _srid_of(w) else "") + K.to_wkt(_parse(w))
        ),
        "string",
    )
    reg(
        "st_geomfromewkt",
        lambda s: None
        if s is None
        else (
            (f"SRID={_srid_of(s)};" if _srid_of(s) else "") + K.to_wkt(_parse(s))
        ),
        "string",
    )

    def _st_collect(arr):
        if arr is None:
            return None
        gs = [_parse(w) for w in arr if w is not None]
        srids = {_srid_of(w) for w in arr if w is not None} - {0}
        if len(srids) > 1:
            raise ValueError("ST_Collect: inputs with different non-zero SRIDs")
        tag = f"SRID={srids.pop()};" if srids else ""
        kinds = {g[0] for g in gs}
        if kinds == {"POINT"}:
            out = ("MULTIPOINT", [g[1] for g in gs])
        elif kinds == {"LINESTRING"}:
            out = ("MULTILINESTRING", [g[1] for g in gs])
        elif kinds == {"POLYGON"}:
            out = ("MULTIPOLYGON", [g[1] for g in gs])
        else:
            out = ("GEOMETRYCOLLECTION", gs)
        return tag + K.to_wkt(out)

    reg("st_collect", _st_collect, "string")

    def _oriented_envelope(w):
        if w is None:
            return None
        g = _parse(w)
        pts = K._points_of(g)
        if not pts:
            return K.to_wkt(("POLYGON", None))
        hp = K.convex_hull(pts)  # returns the hull POINT list
        if len({(p[0], p[1]) for p in hp}) <= 2:
            # degenerate: point or segment — return the geometry itself
            # (JTS returns the equivalent degenerate envelope)
            if len(hp) == 1:
                return K.to_wkt(("POINT", hp[0]))
            return K.to_wkt(("LINESTRING", hp))
        # rotating calipers: the minimum-area rectangle is aligned with
        # some hull edge (published result; JTS MinimumAreaRectangle)
        best = None
        ring = hp[:-1] if hp[0] == hp[-1] else hp
        for i in range(len(ring)):
            ax, ay = ring[i]
            bx, by = ring[(i + 1) % len(ring)]
            ex, ey = bx - ax, by - ay
            ln = math.hypot(ex, ey)
            if ln < 1e-12:
                continue
            ux, uy = ex / ln, ey / ln  # edge direction; normal = (-uy, ux)
            us = [p[0] * ux + p[1] * uy for p in ring]
            vs = [-p[0] * uy + p[1] * ux for p in ring]
            area = (max(us) - min(us)) * (max(vs) - min(vs))
            if best is None or area < best[0]:
                best = (area, ux, uy, min(us), max(us), min(vs), max(vs))
        _, ux, uy, u0, u1, v0, v1 = best
        corners = [
            (u * ux - v * uy, u * uy + v * ux)
            for u, v in ((u0, v0), (u1, v0), (u1, v1), (u0, v1), (u0, v0))
        ]
        return K.to_wkt(("POLYGON", [corners]))

    reg("st_orientedenvelope", _oriented_envelope, "string")
    # linework polygonization + Voronoi tessellation (docs geospatial.md;
    # JTS Polygonizer / VoronoiDiagramBuilder roles)
    reg(
        "st_polygonize",
        lambda arr: None
        if arr is None
        else K.to_wkt(K.polygonize(_parse(w) for w in arr if w is not None)),
        "string",
    )
    @pandas_udf("string")
    def spatial_partitioning(w: pd.Series) -> str:
        # The dialect pre-samples the input (rewrites.py
        # _rewrite_spatial_sample: bottom-10k-by-hash via
        # TakeOrderedAndProject) so this GROUPED_AGG — which has no
        # partial merge — receives a bounded group. head(10000) is a
        # belt-and-braces cap for raw spark.sql callers.
        centers = []
        for wkt in w.dropna().head(10000):
            pts = K._points_of(_parse(wkt))
            if pts:
                xs = [p[0] for p in pts]
                ys = [p[1] for p in pts]
                centers.append(((min(xs) + max(xs)) / 2, (min(ys) + max(ys)) / 2))
        return _kdb_build(centers, 100)

    @pandas_udf("string")
    def spatial_partitioning_n(w: pd.Series, n: pd.Series) -> str:
        centers = []
        for wkt in w.dropna().head(10000):
            pts = K._points_of(_parse(wkt))
            if pts:
                xs = [p[0] for p in pts]
                ys = [p[1] for p in pts]
                centers.append(((min(xs) + max(xs)) / 2, (min(ys) + max(ys)) / 2))
        return _kdb_build(centers, int(n.iloc[0]))

    spark.udf.register("spatial_partitioning", spatial_partitioning)
    spark.udf.register("spatial_partitioning_n", spatial_partitioning_n)
    reg("spatial_partitions", _kdb_partitions, "array<int>")
    reg(
        "st_voronoipolygons",
        lambda w, tol=0.0: None
        if w is None or tol is None
        else K.to_wkt(K.voronoi_polygons(_parse(w), float(tol))),
        "string",
    )
    # CRS reprojection (GeoFunctions.java:513; 4326/3857/UTM-WGS84)
    reg("st_transform", _st_transform, "string")
    reg("st_transformxy", _st_transform, "string")  # engine is 2D: same map

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
    reg("st_srid", lambda w: None if w is None else _srid_of(w), "int")
    reg(
        "st_setsrid",
        lambda w, srid: None
        if w is None or srid is None
        else ((f"SRID={int(srid)};" if int(srid) != 0 else "") + K.to_wkt(_parse(w))),
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


# ----------------------------------------- spatial partitioning (r5)
#
# spatial_partitioning(geometry[, partition_count]) -> varchar and
# spatial_partitions(tree, geometry[, distance]) -> array(integer)
# (plugin/trino-geospatial SpatialPartitioningAggregateFunction.java /
# SpatialPartitionsFunction; docs geospatial.md:691). The varchar is a
# JSON KDB tree: recursive median splits of the sampled envelope
# centers on the wider axis until the leaf count reaches the requested
# partition count; boundary leaves extend to +-infinity so envelopes
# outside the sampled extent still land in an edge partition. The
# GRID-bucketed join (operators/spatial.py) remains this engine's
# default distributed-join partitioner; these names exist for verbatim
# reference SQL that co-partitions via unnest(spatial_partitions(...)).


def _kdb_build(centers, count):
    import json

    def build(pts, lo, hi, leaves_needed, next_id):
        if leaves_needed <= 1 or len(pts) <= 1:
            node = {"id": next_id[0]}
            next_id[0] += 1
            return node
        (x0, y0), (x1, y1) = lo, hi
        axis = 0 if (x1 - x0) >= (y1 - y0) else 1
        pts_sorted = sorted(pts, key=lambda p: p[axis])
        mid = len(pts_sorted) // 2
        cut = pts_sorted[mid][axis]
        left_n = leaves_needed // 2
        lpts, rpts = pts_sorted[:mid], pts_sorted[mid:]
        if axis == 0:
            lnode = build(lpts, lo, (cut, y1), left_n, next_id)
            rnode = build(rpts, (cut, y0), hi, leaves_needed - left_n, next_id)
        else:
            lnode = build(lpts, lo, (x1, cut), left_n, next_id)
            rnode = build(rpts, (x0, cut), hi, leaves_needed - left_n, next_id)
        return {"axis": "x" if axis == 0 else "y", "cut": cut,
                "left": lnode, "right": rnode}

    if not centers:
        return json.dumps({"extent": None, "root": {"id": 0}})
    xs = [c[0] for c in centers]
    ys = [c[1] for c in centers]
    lo, hi = (min(xs), min(ys)), (max(xs), max(ys))
    root = build(centers, lo, hi, max(int(count), 1), [0])
    return json.dumps({"extent": [lo[0], lo[1], hi[0], hi[1]], "root": root})


def _kdb_partitions(tree_json, w, distance=0.0):
    import json

    if tree_json is None or w is None:
        return None
    g = _parse(w)
    pts = K._points_of(g)
    if not pts:
        return None  # empty geometry per the docs
    d = float(distance or 0.0)
    x0 = min(p[0] for p in pts) - d
    x1 = max(p[0] for p in pts) + d
    y0 = min(p[1] for p in pts) - d
    y1 = max(p[1] for p in pts) + d
    tree = json.loads(tree_json)
    out = []

    def walk(node, bx0, by0, bx1, by1):
        if "id" in node:
            out.append(int(node["id"]))
            return
        cut = node["cut"]
        if node["axis"] == "x":
            if x0 <= cut:
                walk(node["left"], bx0, by0, cut, by1)
            if x1 >= cut:
                walk(node["right"], cut, by0, bx1, by1)
        else:
            if y0 <= cut:
                walk(node["left"], bx0, by0, bx1, cut)
            if y1 >= cut:
                walk(node["right"], bx0, cut, bx1, by1)

    walk(tree["root"], float("-inf"), float("-inf"), float("inf"), float("inf"))
    return sorted(set(out))
