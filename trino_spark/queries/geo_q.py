"""Geospatial queries — planar ST_* family + distributed spatial join.

Reference: plugin/trino-geospatial/.../GeoFunctions.java:1 (scalar family),
SpatialJoinOperator.java:41 + ExtractSpatialJoins.java:152 (join). The
testdata has no coordinate columns, so points are derived from integer keys
with modular arithmetic — the SAME closed-form expressions on the Spark and
DuckDB sides, keeping the differential comparison exact.

Oracles deliberately use a different formulation than the engine: the Spark
side runs the array-typed ring functions (functions/geo.py — columnar,
whole-stage codegen), while DuckDB recomputes via exploded edge rows +
window/group SQL. Same math, independent implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_spark.functions import geo
from trino_spark.queries.base import QueryRegistry, t

REG = QueryRegistry()

# Irregular pentagon (open ring) used by the point-in-polygon query.
_PENT = [(0.15, -7.33), (8.27, -1.41), (4.93, 7.81), (-5.57, 6.59), (-8.71, -3.97)]

# Metric-test rings: integer coordinates => all shoelace products exact in
# fp, so the oracle comparison has zero rounding risk. p3 is concave and
# wound clockwise (exercises abs() in area and sign-consistency in centroid).
_POLYS = {
    1: [(0, 0), (4, 0), (0, 3)],
    2: [(1, 1), (5, 1), (5, 4), (1, 4)],
    3: [(0, 0), (0, 5), (2, 2), (4, 5), (4, 0)],
}


def _ring_lit(verts: list[tuple[float, float]]):
    return F.array(
        *[
            F.struct(F.lit(float(x)).alias("x"), F.lit(float(y)).alias("y"))
            for x, y in verts
        ]
    )


def _pent_edges_values() -> str:
    rows = []
    for i, (x1, y1) in enumerate(_PENT):
        x2, y2 = _PENT[(i + 1) % len(_PENT)]
        rows.append(f"({x1}, {y1}, {x2}, {y2})")
    return ", ".join(rows)


@REG.add(
    "geo_point_in_polygon",
    f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey * 37 % 200 AS DOUBLE) / 10.0 - 10.0 AS px,
             CAST(c_custkey * 101 % 200 AS DOUBLE) / 10.0 - 10.0 AS py
      FROM customer
    ), edges(x1, y1, x2, y2) AS (
      VALUES {_pent_edges_values()}
    )
    SELECT c_custkey,
           (SUM(CASE WHEN ((y1 > py) <> (y2 > py))
                      AND px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
                THEN 1 ELSE 0 END) % 2 = 1) AS inside
    FROM pts CROSS JOIN edges
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Contains via ray casting (GeoFunctions.java ST_Contains) — the
    ring is a columnar array literal, the crossing count a single
    `aggregate` expression; oracle re-derives it from exploded edge rows."""
    c = t(spark, sf, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        "c_custkey",
        ((k * 37 % 200).cast("double") / 10.0 - 10.0).alias("px"),
        ((k * 101 % 200).cast("double") / 10.0 - 10.0).alias("py"),
    )
    return pts.select(
        "c_custkey",
        geo.st_contains(_ring_lit(_PENT), geo.st_point("px", "py")).alias("inside"),
    ).orderBy("c_custkey")


@REG.add(
    "geo_distance_join_grid",
    """
    WITH cp AS (
      SELECT c_custkey,
             CAST(c_custkey * 7 % 1000 AS DOUBLE) / 10.0 AS cx,
             CAST(c_custkey * 11 % 1000 AS DOUBLE) / 10.0 AS cy
      FROM customer
    ), sp AS (
      SELECT s_suppkey,
             CAST(s_suppkey * 13 % 1000 AS DOUBLE) / 10.0 AS sx,
             CAST(s_suppkey * 29 % 1000 AS DOUBLE) / 10.0 AS sy
      FROM supplier
    )
    SELECT c_custkey, s_suppkey,
           round(sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)), 6) AS dist
    FROM cp CROSS JOIN sp
    WHERE sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) <= 1.5
    ORDER BY c_custkey, s_suppkey
    """,
)
def geo_distance_join_grid(spark: SparkSession, sf: str) -> DataFrame:
    """Distance join WITHOUT a cross join (SpatialJoinOperator.java:41
    parity): grid-bucketed equi-join from operators/spatial.py — one hash
    shuffle per side, constant 9x replication of the smaller side, exact
    post-filter. The oracle IS the cross join (fine at sf0.01; the whole
    point is that ours isn't)."""
    from trino_spark.operators.spatial import distance_join

    c = t(spark, sf, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7 % 1000).cast("double") / 10.0).alias("cx"),
        ((F.col("c_custkey") * 11 % 1000).cast("double") / 10.0).alias("cy"),
    )
    s = t(spark, sf, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 13 % 1000).cast("double") / 10.0).alias("sx"),
        ((F.col("s_suppkey") * 29 % 1000).cast("double") / 10.0).alias("sy"),
    )
    joined = distance_join(c, s, 1.5, lx="cx", ly="cy", rx="sx", ry="sy")
    return joined.select(
        "c_custkey", "s_suppkey", F.round("dist", 6).alias("dist")
    ).orderBy("c_custkey", "s_suppkey")


def _poly_values() -> str:
    rows = []
    for pid, verts in _POLYS.items():
        for seq, (x, y) in enumerate(verts):
            rows.append(f"({pid}, {seq}, CAST({x} AS DOUBLE), CAST({y} AS DOUBLE))")
    return ", ".join(rows)


@REG.add(
    "geo_polygon_metrics",
    f"""
    WITH v(pid, seq, x, y) AS (
      VALUES {_poly_values()}
    ), e AS (
      SELECT pid, x AS x1, y AS y1,
             coalesce(lead(x) OVER w, first_value(x) OVER w) AS x2,
             coalesce(lead(y) OVER w, first_value(y) OVER w) AS y2
      FROM v
      WINDOW w AS (PARTITION BY pid ORDER BY seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT pid,
           CAST(count(*) AS BIGINT) AS n,
           round(abs(sum(x1 * y2 - x2 * y1)) / 2, 6) AS area,
           round(sum(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))), 6) AS perim,
           round(sum((x1 + x2) * (x1 * y2 - x2 * y1)) / (3 * sum(x1 * y2 - x2 * y1)), 6) AS cx,
           round(sum((y1 + y2) * (x1 * y2 - x2 * y1)) / (3 * sum(x1 * y2 - x2 * y1)), 6) AS cy,
           min(x1) AS xmin, min(y1) AS ymin, max(x1) AS xmax, max(y1) AS ymax
    FROM e
    GROUP BY pid
    ORDER BY pid
    """,
)
def geo_polygon_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Area / ST_Perimeter / ST_Centroid / ST_Envelope / ST_NumPoints
    over ring-array columns (GeoFunctions.java); oracle recomputes with
    window-lag edge SQL over the same vertex rows."""
    rows = [
        (pid, seq, float(x), float(y))
        for pid, verts in _POLYS.items()
        for seq, (x, y) in enumerate(verts)
    ]
    # SQL VALUES -> LocalRelation (createDataFrame(list) is RDD-backed and
    # scans with defaultParallelism tasks; PERF.md r2)
    values = ", ".join(f"({p}, {s}, CAST({x} AS DOUBLE), CAST({y} AS DOUBLE))" for p, s, x, y in rows)
    v = spark.sql(f"SELECT * FROM VALUES {values} AS v(pid, seq, x, y)")
    rings = v.groupBy("pid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seq", "x", "y"))),
            lambda s: F.struct(s["x"].alias("x"), s["y"].alias("y")),
        ).alias("ring")
    )
    cen = geo.st_centroid("ring")
    env = geo.st_envelope("ring")
    return rings.select(
        "pid",
        geo.st_num_points("ring").cast("long").alias("n"),
        F.round(geo.st_area("ring"), 6).alias("area"),
        F.round(geo.st_perimeter("ring"), 6).alias("perim"),
        F.round(cen["x"], 6).alias("cx"),
        F.round(cen["y"], 6).alias("cy"),
        env["xmin"].alias("xmin"),
        env["ymin"].alias("ymin"),
        env["xmax"].alias("xmax"),
        env["ymax"].alias("ymax"),
    ).orderBy("pid")


# Square shell with a square hole; integer coords keep fp exact.
_SHELL = [(-6.0, -6.0), (6.0, -6.0), (6.0, 6.0), (-6.0, 6.0)]
_HOLE = [(-2.0, -2.0), (2.0, -2.0), (2.0, 2.0), (-2.0, 2.0)]


def _edges_values(ring) -> str:
    rows = []
    for i, (x1, y1) in enumerate(ring):
        x2, y2 = ring[(i + 1) % len(ring)]
        rows.append(f"({x1}, {y1}, {x2}, {y2})")
    return ", ".join(rows)


@REG.add(
    "geo_polygon_holes",
    f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey * 37 % 200 AS DOUBLE) / 10.0 - 10.0 AS px,
             CAST(c_custkey * 101 % 200 AS DOUBLE) / 10.0 - 10.0 AS py
      FROM customer
    ), shell(x1, y1, x2, y2) AS (VALUES {{SHELL}}),
       hole(x1, y1, x2, y2) AS (VALUES {{HOLE}}),
    s AS (
      SELECT c_custkey,
             (SUM(CASE WHEN ((y1 > py) <> (y2 > py))
                        AND px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
                  THEN 1 ELSE 0 END) % 2 = 1) AS in_shell
      FROM pts CROSS JOIN shell GROUP BY c_custkey
    ), h AS (
      SELECT c_custkey,
             (SUM(CASE WHEN ((y1 > py) <> (y2 > py))
                        AND px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
                  THEN 1 ELSE 0 END) % 2 = 1) AS in_hole
      FROM pts CROSS JOIN hole GROUP BY c_custkey
    )
    SELECT s.c_custkey, (s.in_shell AND NOT h.in_hole) AS inside,
           128.0 AS poly_area
    FROM s JOIN h USING (c_custkey)
    ORDER BY s.c_custkey
    """.replace("{SHELL}", _edges_values(_SHELL)).replace("{HOLE}", _edges_values(_HOLE)),
)
def geo_polygon_holes(spark: SparkSession, sf: str) -> DataFrame:
    """Polygon-with-holes support (GeoFunctions.java ST_Contains/ST_Area on
    POLYGON with interior rings): ray-cast against the shell minus the
    hole, plus the hole-subtracted area, all as one columnar rings-array
    expression. Oracle re-derives both ring tests from exploded edges."""
    c = t(spark, sf, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        "c_custkey",
        ((k * 37 % 200).cast("double") / 10.0 - 10.0).alias("px"),
        ((k * 101 % 200).cast("double") / 10.0 - 10.0).alias("py"),
    )
    rings = F.array(_ring_lit(_SHELL), _ring_lit(_HOLE))
    return pts.select(
        "c_custkey",
        geo.st_contains_polygon(rings, geo.st_point("px", "py")).alias("inside"),
        geo.st_area_polygon(rings).alias("poly_area"),
    ).orderBy("c_custkey")


@REG.add(
    "geo_sphere_distance",
    """
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey * 53 % 360 AS DOUBLE) - 180.0 AS lon,
             CAST(c_custkey * 29 % 160 AS DOUBLE) - 80.0  AS lat
      FROM customer
    )
    SELECT c_custkey,
           round(2 * 6371.01 * asin(sqrt(
             sin(radians((lat - 48.8566) / 2)) * sin(radians((lat - 48.8566) / 2))
             + cos(radians(48.8566)) * cos(radians(lat))
             * sin(radians((lon - 2.3522) / 2)) * sin(radians((lon - 2.3522) / 2))
           )), 6) AS km
    FROM pts
    ORDER BY km, c_custkey
    LIMIT 50
    """,
)
def geo_sphere_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Geodesic distance (ST_Distance on SPHERICAL_GEOGRAPHY,
    GeoFunctions.java; haversine with Trino's 6371.01 km radius): the 50
    customers nearest Paris by key-derived lon/lat. Oracle restates the
    haversine identically in DuckDB trig."""
    c = t(spark, sf, "customer")
    k = F.col("c_custkey")
    pts = c.select(
        "c_custkey",
        ((k * 53 % 360).cast("double") - 180.0).alias("lon"),
        ((k * 29 % 160).cast("double") - 80.0).alias("lat"),
    )
    paris = geo.st_point(F.lit(2.3522), F.lit(48.8566))
    return (
        pts.select(
            "c_custkey",
            F.round(
                geo.st_sphere_distance(geo.st_point("lon", "lat"), paris), 6
            ).alias("km"),
        )
        .orderBy("km", "c_custkey")
        .limit(50)
    )


@REG.add(
    "geo_bing_tiles",
    """
    WITH tiles AS (
      SELECT c_custkey,
             CAST(c_custkey * 37 % 256 AS INTEGER) AS tx,
             CAST(c_custkey * 53 % 256 AS INTEGER) AS ty
      FROM customer
    ), qk AS (
      SELECT c_custkey, tx, ty,
             string_agg(
               CAST((tx // CAST(pow(2, 8 - i) AS INTEGER)) % 2
                    + 2 * ((ty // CAST(pow(2, 8 - i) AS INTEGER)) % 2) AS VARCHAR),
               '' ORDER BY i) AS quadkey
      FROM tiles CROSS JOIN generate_series(1, 8) AS g(i)
      GROUP BY c_custkey, tx, ty
    )
    SELECT substr(quadkey, 1, 4) AS parent,
           CAST(COUNT(*) AS BIGINT) AS n_tiles,
           MIN(quadkey) AS min_qk,
           MAX(quadkey) AS max_qk,
           round(SUM(tx * 360.0 / 256.0 - 180.0), 4) AS sum_west_lng,
           bool_and(TRUE) AS roundtrip_ok,
           CAST(SUM(9) AS BIGINT) AS sum_around
    FROM qk
    GROUP BY parent
    ORDER BY parent
    """,
)
def geo_bing_tiles(spark: SparkSession, sf: str) -> DataFrame:
    """Bing tile family (plugin/trino-geospatial BingTileFunctions.java:
    bing_tile, bing_tile_quadkey + inverse, bing_tile_polygon,
    bing_tiles_around) — all JVM expressions from functions/tiles.py.
    Tiles derive from integer keys so quadkey/corner math is exact on both
    engines; the oracle recomputes the quadkey digit-by-digit in SQL and
    pins the roundtrip (quadkey -> tile -> same x/y) and the 3x3
    neighborhood size for interior points."""
    from trino_spark.functions import tiles as bt

    c = t(spark, sf, "customer")
    k = F.col("c_custkey")
    d = c.select(
        "c_custkey",
        (k * 37 % 256).cast("int").alias("tx"),
        (k * 53 % 256).cast("int").alias("ty"),
        ((k * 13 % 140).cast("double") - 69.5).alias("lat"),
        ((k * 19 % 340).cast("double") - 169.5).alias("lng"),
    )
    tile = bt.bing_tile("tx", "ty", F.lit(8))
    qk = bt.bing_tile_quadkey(tile)
    d = d.select(
        "tx",
        "ty",
        qk.alias("quadkey"),
        bt.bing_tile_from_quadkey(qk).alias("rt"),
        F.element_at(bt.bing_tile_polygon(tile), 1)["x"].alias("west"),
        F.size(bt.bing_tiles_around("lat", "lng", F.lit(8))).alias("n_around"),
    )
    return (
        d.groupBy(F.substring("quadkey", 1, 4).alias("parent"))
        .agg(
            F.count("*").cast("bigint").alias("n_tiles"),
            F.min("quadkey").alias("min_qk"),
            F.max("quadkey").alias("max_qk"),
            F.round(F.sum("west"), 4).alias("sum_west_lng"),
            F.bool_and(
                (F.col("rt")["x"] == F.col("tx")) & (F.col("rt")["y"] == F.col("ty"))
            ).alias("roundtrip_ok"),
            F.sum("n_around").cast("bigint").alias("sum_around"),
        )
        .orderBy("parent")
    )


@REG.add(
    "geo_sql_surface",
    """
    SELECT c_custkey % 50 AS cell,
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(sqrt(power((c_custkey % 17) - 8.0, 2)
                        + power((c_custkey % 13) - 6.0, 2))) * 1e4 + 0.5) / 1e4
             AS sum_dist,
           CAST(sum(CASE WHEN (c_custkey % 17) > 2 AND (c_custkey % 17) < 14
                          AND (c_custkey % 13) > 2 AND (c_custkey % 13) < 10
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
    FROM customer
    GROUP BY c_custkey % 50
    ORDER BY cell
    """,
)
def geo_sql_surface(spark: SparkSession, sf: str) -> DataFrame:
    """The round-4 verbatim-SQL geospatial surface (functions/geosql.py
    over the WKT kernel), driven end-to-end through TrinoEngine.sql:
    ST_Point / ST_Distance / ST_GeometryFromText / ST_Contains evaluate
    as the reference spells them (GeoFunctions.java), while the DuckDB
    oracle recomputes the same closed forms in plain arithmetic —
    distance via the Euclidean formula, containment via strict interval
    bounds (matching OGC ST_Contains boundary exclusion). Integer-derived
    coordinates keep every value exact; the distance sum is grid-snapped
    on both sides."""
    from trino_spark.dialect import TrinoEngine

    return TrinoEngine(spark, sf).sql(
        """
        SELECT c_custkey % 50 AS cell,
               count(*) AS n,
               floor(sum(ST_Distance(
                   ST_Point(CAST(c_custkey % 17 AS DOUBLE),
                            CAST(c_custkey % 13 AS DOUBLE)),
                   ST_Point(8.0, 6.0))) * 1e4 + 0.5) / 1e4 AS sum_dist,
               sum(CASE WHEN ST_Contains(
                   ST_GeometryFromText('POLYGON ((2 2, 14 2, 14 10, 2 10, 2 2))'),
                   ST_Point(CAST(c_custkey % 17 AS DOUBLE),
                            CAST(c_custkey % 13 AS DOUBLE))) THEN 1 ELSE 0 END)
                 AS n_inside
        FROM customer
        GROUP BY c_custkey % 50
        ORDER BY cell
        """
    )


@REG.add(
    "geo_relate_transform",
    """
    WITH pts AS (
      SELECT n_nationkey AS k,
             CAST(n_nationkey % 5 AS DOUBLE) AS px,
             CAST(n_regionkey AS DOUBLE)     AS py,
             -123.0 + (n_nationkey % 5)      AS lng,
             30.0 + 2.0 * n_regionkey        AS lat
      FROM nation
    )
    SELECT CAST(k AS BIGINT) AS k,
           CASE WHEN px > 1 AND px < 3 AND py > 1 AND py < 3 THEN '0FFFFF212'
                WHEN px >= 1 AND px <= 3 AND py >= 1 AND py <= 3 THEN 'F0FFFF212'
                ELSE 'FF0FFF212' END AS de9im,
           (px > 1 AND px < 3 AND py > 1 AND py < 3) AS is_within,
           CAST(floor(6378137.0 * lng * pi() / 180.0 / 10.0) AS BIGINT) AS merc_x10,
           CAST(floor(6378137.0 * 0.5 * ln((1 + sin(lat * pi() / 180.0))
                                          / (1 - sin(lat * pi() / 180.0))) / 10.0) AS BIGINT)
             AS merc_y10
    FROM pts
    ORDER BY k
    """,
)
def geo_relate_transform(spark: SparkSession, sf: str) -> DataFrame:
    """Round-5 geo closures driven end-to-end through TrinoEngine.sql:
    ST_Relate's DE-9IM matrix (GeoFunctions.java:1951, JTS RelateNG) for
    point-vs-polygon over integer-derived coordinates, and ST_Transform
    4326 -> 3857 (GeoFunctions.java:513). The oracle restates the matrix
    by strict/closed interval arithmetic (interior '0FFFFF212',
    boundary 'F0FFFF212', exterior 'FF0FFF212') and recomputes the
    spherical-Mercator forward formula directly; outputs snap to a 10 m
    grid where every input sits >=15 cm from a boundary (precomputed),
    so cross-engine double noise (~1e-9 m) cannot flip a floor."""
    from trino_spark.queries.base import engine_for

    return engine_for(spark, sf).sql(
        """
        WITH pts AS (
          SELECT n_nationkey AS k,
                 ST_Point(CAST(n_nationkey % 5 AS DOUBLE),
                          CAST(n_regionkey AS DOUBLE)) AS p,
                 ST_SetSRID(ST_Point(-123.0 + (n_nationkey % 5),
                                     30.0 + 2.0 * n_regionkey), 4326) AS gp
          FROM nation
        )
        SELECT CAST(k AS BIGINT) AS k,
               st_relate_matrix(p, ST_GeometryFromText(
                   'POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')) AS de9im,
               ST_Relate(p, ST_GeometryFromText(
                   'POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'), 'T*F**F***') AS is_within,
               CAST(floor(ST_X(ST_Transform(gp, 3857)) / 10.0) AS BIGINT) AS merc_x10,
               CAST(floor(ST_Y(ST_Transform(gp, 3857)) / 10.0) AS BIGINT) AS merc_y10
        FROM pts
        ORDER BY k
        """
    )
