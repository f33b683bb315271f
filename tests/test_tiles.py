"""Bing tile function tests (BingTileFunctions.java parity).

The quadkey example is the canonical one from the public Bing Maps tile
system docs (tile x=3, y=5, zoom=3 -> "213"), which the reference
implements verbatim.
"""

import math

from pyspark.sql import functions as F

from trino_spark.functions import tiles as bt


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_quadkey_known_example(spark):
    qk = _one(spark, bt.bing_tile_quadkey(bt.bing_tile(F.lit(3), F.lit(5), F.lit(3))))
    assert qk == "213"


def test_quadkey_roundtrip(spark):
    df = spark.range(500).select(
        (F.col("id") * 7 % 1024).cast("int").alias("x"),
        (F.col("id") * 13 % 1024).cast("int").alias("y"),
    )
    tile = bt.bing_tile("x", "y", F.lit(10))
    rt = bt.bing_tile_from_quadkey(bt.bing_tile_quadkey(tile))
    bad = df.where(~((rt["x"] == F.col("x")) & (rt["y"] == F.col("y")) & (rt["zoom"] == 10))).count()
    assert bad == 0


def test_zoom_and_coordinates(spark):
    t = bt.bing_tile(F.lit(21), F.lit(9), F.lit(5))
    row = _one(
        spark,
        F.struct(
            bt.bing_tile_zoom_level(t).alias("z"),
            bt.bing_tile_coordinates(t).alias("c"),
        ),
    )
    assert row["z"] == 5 and row["c"]["x"] == 21 and row["c"]["y"] == 9


def _py_tile_at(lat, lng, zoom):
    """Independent Python restatement of the Microsoft formula."""
    lat = min(max(lat, bt.MIN_LATITUDE), bt.MAX_LATITUDE)
    lng = min(max(lng, -180.0), 180.0)
    x01 = (lng + 180.0) / 360.0
    s = math.sin(math.radians(lat))
    y01 = 0.5 - math.log((1 + s) / (1 - s)) / (4 * math.pi)
    msize = 256.0 * (1 << zoom)
    px = min(max(x01 * msize + 0.5, 0.0), msize - 1)
    py = min(max(y01 * msize + 0.5, 0.0), msize - 1)
    return int(px // 256), int(py // 256)


def test_tile_at_matches_reference_formula(spark):
    # Points chosen away from tile boundaries so 1-ulp libm differences
    # cannot flip the floor.
    pts = [(47.61, -122.11, 12), (48.8566, 2.3522, 10), (-33.87, 151.21, 8), (0.01, 0.01, 4)]
    for lat, lng, zoom in pts:
        got = _one(spark, bt.bing_tile_at(F.lit(lat), F.lit(lng), F.lit(zoom)))
        assert (got["x"], got["y"]) == _py_tile_at(lat, lng, zoom), (lat, lng, zoom)
        assert got["zoom"] == zoom


def test_tile_at_pole_clamps(spark):
    got = _one(spark, bt.bing_tile_at(F.lit(89.9), F.lit(0.0), F.lit(3)))
    assert got["y"] == 0  # clamped to MAX_LATITUDE band


def test_tiles_around_interior_and_corner(spark):
    interior = _one(spark, F.size(bt.bing_tiles_around(F.lit(30.0), F.lit(60.0), F.lit(6))))
    assert interior == 9
    # Map corner (north-west): center tile is (0, 0) -> only 4 neighbors exist.
    corner = _one(spark, F.size(bt.bing_tiles_around(F.lit(85.0), F.lit(-179.9), F.lit(6))))
    assert corner == 4


def test_tile_polygon_corners(spark):
    # Tile (0, 0, zoom 1) covers the north-west quadrant:
    # lng in [-180, 0], lat in [0, MAX_LATITUDE].
    ring = _one(spark, bt.bing_tile_polygon(bt.bing_tile(F.lit(0), F.lit(0), F.lit(1))))
    xs = sorted({round(p["x"], 9) for p in ring})
    ys = sorted({round(p["y"], 9) for p in ring})
    assert xs == [-180.0, 0.0]
    assert ys[0] == 0.0 and abs(ys[1] - bt.MAX_LATITUDE) < 1e-6
