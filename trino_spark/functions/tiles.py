"""Bing tile functions — expression-only port of Trino's geospatial
Bing-tile family.

Reference: plugin/trino-geospatial/src/main/java/io/trino/plugin/geospatial/
BingTileFunctions.java:1 (bing_tile, bing_tile_at, bing_tile_quadkey,
bing_tile_coordinates, bing_tile_zoom_level, bing_tiles_around,
bing_tile_polygon) and BingTile.java (the tile value type). Trino stores a
BingTile as a packed bigint; we use struct<x:int, y:int, zoom:int> — the
natural Spark row type, groupable and joinable.

All functions are compositions of built-in expressions (pow/floor/log/
transform/sequence) so tile math stays inside whole-stage codegen; a
100 TB geo table is tiled without a single Python round-trip. Quadkey
digits use floor-division by powers of two instead of bit shifts because
Spark's shiftright needs a literal shift amount while ours varies per
lambda index; powers of two up to 2^23 (max zoom) are exact in doubles,
so the two formulations are bit-identical.

The Microsoft tile-system math (public spec, also what the reference
implements): x01 = (lng+180)/360; y01 = 0.5 - ln((1+sin lat)/(1-sin lat))
/ (4*pi); pixel = clip(v*mapsize + 0.5, 0, mapsize-1); tile = pixel div
256, with latitude clamped to +-85.05112878.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LATITUDE = 85.05112878
MIN_LATITUDE = -85.05112878
TILE_PIXELS = 256.0


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _clamp(v: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(v, F.lit(lo)), F.lit(hi))


def bing_tile(x: Column | str, y: Column | str, zoom: Column | str) -> Column:
    """bing_tile(x, y, zoom) -> tile struct (BingTileFunctions.java toBingTile)."""
    return F.struct(
        _c(x).cast("int").alias("x"),
        _c(y).cast("int").alias("y"),
        _c(zoom).cast("int").alias("zoom"),
    )


def bing_tile_zoom_level(tile: Column | str) -> Column:
    return _c(tile)["zoom"]


def bing_tile_coordinates(tile: Column | str) -> Column:
    t = _c(tile)
    return F.struct(t["x"].alias("x"), t["y"].alias("y"))


def _map_size(zoom: Column) -> Column:
    return F.pow(F.lit(2.0), zoom.cast("double")) * F.lit(TILE_PIXELS)


def bing_tile_at(lat: Column | str, lng: Column | str, zoom: Column | str) -> Column:
    """Tile containing a WGS84 point (BingTileFunctions.java bingTileAt)."""
    z = _c(zoom).cast("int")
    lat_c = _clamp(_c(lat).cast("double"), MIN_LATITUDE, MAX_LATITUDE)
    lng_c = _clamp(_c(lng).cast("double"), -180.0, 180.0)
    x01 = (lng_c + F.lit(180.0)) / F.lit(360.0)
    sin_lat = F.sin(F.radians(lat_c))
    y01 = F.lit(0.5) - F.log((F.lit(1.0) + sin_lat) / (F.lit(1.0) - sin_lat)) / F.lit(
        4.0 * 3.141592653589793
    )
    msize = _map_size(z)
    # Microsoft formula: clip(v * mapsize + 0.5, 0, mapsize - 1) then div 256.
    px = F.least(F.greatest(x01 * msize + F.lit(0.5), F.lit(0.0)), msize - F.lit(1.0))
    py = F.least(F.greatest(y01 * msize + F.lit(0.5), F.lit(0.0)), msize - F.lit(1.0))
    return F.struct(
        F.floor(px / F.lit(TILE_PIXELS)).cast("int").alias("x"),
        F.floor(py / F.lit(TILE_PIXELS)).cast("int").alias("y"),
        z.alias("zoom"),
    )


def _digit(x: Column, y: Column, shift: Column) -> Column:
    """Quadkey digit for bit position `shift` (0-based from LSB)."""
    p = F.pow(F.lit(2.0), shift.cast("double"))
    xbit = (F.floor(x.cast("double") / p).cast("long") % 2).cast("int")
    ybit = (F.floor(y.cast("double") / p).cast("long") % 2).cast("int")
    return xbit + F.lit(2) * ybit


def bing_tile_quadkey(tile: Column | str) -> Column:
    """Quadkey string, MSB digit first (BingTileFunctions.java toQuadKey)."""
    t = _c(tile)
    x, y, z = t["x"], t["y"], t["zoom"]
    digits = F.transform(
        F.sequence(F.lit(1), z),  # i = 1..zoom, digit shift = zoom - i
        lambda i: _digit(x, y, z - i).cast("string"),
    )
    return F.array_join(digits, "")


def bing_tile_from_quadkey(quadkey: Column | str) -> Column:
    """Inverse: quadkey string -> tile (BingTileFunctions.java toBingTile(quadKey))."""
    qk = _c(quadkey)
    z = F.length(qk)
    chars = F.split(qk, "")
    idx = F.sequence(F.lit(1), z)

    def _weight(i: Column) -> Column:
        # digit at position i carries bit (zoom - i): weight 2^(zoom-i)
        return F.pow(F.lit(2.0), (z - i).cast("double")).cast("long")

    x = F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + (F.element_at(chars, i).cast("int") % 2).cast("long") * _weight(i),
    )
    y = F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.floor(F.element_at(chars, i).cast("int") / 2).cast("long") * _weight(i),
    )
    return F.struct(x.cast("int").alias("x"), y.cast("int").alias("y"), z.cast("int").alias("zoom"))


def bing_tiles_around(lat: Column | str, lng: Column | str, zoom: Column | str) -> Column:
    """3x3 neighborhood of the tile containing the point, clipped to the map
    (BingTileFunctions.java bingTilesAround)."""
    center = bing_tile_at(lat, lng, zoom)
    z = _c(zoom).cast("int")
    n = F.pow(F.lit(2.0), z.cast("double")).cast("long")  # tiles per axis
    offs = F.sequence(F.lit(-1), F.lit(1))
    grid = F.flatten(
        F.transform(
            offs,
            lambda dx: F.transform(
                offs,
                lambda dy: F.struct(
                    (center["x"] + dx).alias("x"),
                    (center["y"] + dy).alias("y"),
                    z.alias("zoom"),
                ),
            ),
        )
    )
    return F.filter(
        grid,
        lambda t: (t["x"] >= 0) & (t["y"] >= 0) & (t["x"] < n) & (t["y"] < n),
    )


def _tile_corner_lng(px: Column, msize: Column) -> Column:
    return F.lit(360.0) * (px / msize) - F.lit(180.0)


def _tile_corner_lat(py: Column, msize: Column) -> Column:
    y01 = F.lit(0.5) - (py / msize)
    pi = 3.141592653589793
    return F.lit(90.0) - F.lit(360.0 / pi) * F.atan(
        F.exp(-y01 * F.lit(2.0 * pi))
    )


def bing_tile_polygon(tile: Column | str) -> Column:
    """Tile bounding box as an open ring array<struct<x=lng, y=lat>>
    (BingTileFunctions.java tilePolygon), compatible with functions/geo.py."""
    t = _c(tile)
    msize = _map_size(t["zoom"])
    px0 = t["x"].cast("double") * F.lit(TILE_PIXELS)
    py0 = t["y"].cast("double") * F.lit(TILE_PIXELS)
    px1 = px0 + F.lit(TILE_PIXELS)
    py1 = py0 + F.lit(TILE_PIXELS)
    west, east = _tile_corner_lng(px0, msize), _tile_corner_lng(px1, msize)
    north, south = _tile_corner_lat(py0, msize), _tile_corner_lat(py1, msize)

    def pt(x: Column, y: Column) -> Column:
        return F.struct(x.alias("x"), y.alias("y"))

    return F.array(pt(west, south), pt(east, south), pt(east, north), pt(west, north))
