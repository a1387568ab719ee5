"""Distributed spatial join: points x polygons via grid bucketing.

The reference evaluates ONE query polygon against a raster
(`geometry.py` builds its mask on the driver); at engine scale the
spatial question inverts: millions of points against thousands of
polygons. The R-tree-less distributed plan every big engine uses:

1. pick a grid cell size (~polygon diameter);
2. each polygon registers in every cell its bbox overlaps (explode —
   a few cells per polygon, the index build);
3. each point lands in exactly ONE cell (pure projection);
4. equi-join on the cell key — candidates are only (point, polygon)
   pairs whose cell matches, never the cross product;
5. exact point-in-polygon verify on candidates, JVM-side.

Because a point has one cell and polygon cell sets are duplicate-free,
no post-join dedup is needed.

The verify predicate is the CONVEX half-plane test: for a
counter-clockwise convex polygon, a point is inside iff every edge's
cross product (v2-v1) x (p-v1) is >= 0 (boundary inclusive) — a
``forall`` fold over the vertex array, whole-stage-codegen friendly and
expressible identically in the DuckDB oracle. General (non-convex)
polygons need the ray-casting fold instead — same plan shape, different
predicate; the convex contract is documented, not a hidden limit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(coord: Column, cell_size: float) -> Column:
    return F.floor(coord / cell_size).cast("long")


def polygon_cells(
    polygons: DataFrame, *, cell_size: float, verts_col: str = "verts"
) -> DataFrame:
    """(cell_x, cell_y, poly_id): every grid cell a polygon's bbox
    overlaps. The build side of the spatial index."""
    xs = F.transform(F.col(verts_col), lambda v: v["x"])
    ys = F.transform(F.col(verts_col), lambda v: v["y"])
    out = (
        polygons.withColumn(
            "__cx",
            F.sequence(
                _cell(F.array_min(xs), cell_size),
                _cell(F.array_max(xs), cell_size),
            ),
        )
        .withColumn(
            "__cy",
            F.sequence(
                _cell(F.array_min(ys), cell_size),
                _cell(F.array_max(ys), cell_size),
            ),
        )
        .withColumn("cell_x", F.explode("__cx"))
        .withColumn("cell_y", F.explode("__cy"))
    )
    return out.drop("__cx", "__cy")


def convex_contains(
    verts_col: Column, px: Column, py: Column
) -> Column:
    """True iff (px, py) is inside/on the CCW convex polygon: every
    edge's cross product (v2-v1) x (p-v1) >= 0."""
    n = F.size(verts_col)
    closed = F.concat(verts_col, F.slice(verts_col, 1, 1))
    edges = F.arrays_zip(
        F.slice(closed, 1, n).alias("v1"),
        F.slice(closed, 2, n).alias("v2"),
    )
    return F.forall(
        edges,
        lambda e: (
            (e["v2"]["x"] - e["v1"]["x"]) * (py - e["v1"]["y"])
            - (e["v2"]["y"] - e["v1"]["y"]) * (px - e["v1"]["x"])
        )
        >= 0.0,
    )


def spatial_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    cell_size: float,
    point_id: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id: str = "poly_id",
    verts_col: str = "verts",
) -> DataFrame:
    """All (point_id, poly_id) pairs with the point inside/on the convex
    polygon. One equi-join on the grid cell; exact verify on candidates.
    """
    cells = polygon_cells(
        polygons, cell_size=cell_size, verts_col=verts_col
    ).select(poly_id, verts_col, "cell_x", "cell_y")
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col(x_col).alias("__px"),
        F.col(y_col).alias("__py"),
        _cell(F.col(x_col), cell_size).alias("cell_x"),
        _cell(F.col(y_col), cell_size).alias("cell_y"),
    )
    cand = pts.join(cells, ["cell_x", "cell_y"])
    hit = cand.where(
        convex_contains(F.col(verts_col), F.col("__px"), F.col("__py"))
    )
    return hit.select("point_id", poly_id)


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine, R = 6371.0088 mean Earth
    radius). Identical operation order on both engines keeps the
    contract deterministic."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    # clamp: for antipodal points 'a' exceeds 1.0 by 1 ulp in doubles and
    # asin(sqrt(a)) would be NaN instead of the half-circumference
    return 2.0 * 6371.0088 * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def nearest_site(
    points: DataFrame,
    sites: DataFrame,
    *,
    point_id: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    site_id: str = "site_id",
) -> DataFrame:
    """Assign every point to its nearest site (great-circle): the
    station-assignment / geofencing primitive. ``sites`` is a bounded
    reference table (weather stations, warehouses) broadcast into the
    point scan; the per-point argmin is ONE aggregation over
    min(struct(distance, site)) — lexicographic min, so km ties break
    by site id deterministically — never a window sort.

    For site tables too large to broadcast, pre-bucket both sides by
    geo cell (the ``spatial_join`` grid) and run the same argmin within
    the candidate cells.
    """
    # a NULL-coordinate site would produce a NULL distance, which sorts
    # FIRST in Spark's struct ordering and would hijack every argmin —
    # malformed reference rows are data, drop them from the index
    s = sites.select(
        F.col(site_id).alias("__sid"),
        F.col(lat_col).alias("__slat"),
        F.col(lon_col).alias("__slon"),
    ).where(F.col("__slat").isNotNull() & F.col("__slon").isNotNull())
    p = points.select(
        F.col(point_id).alias("point_id"),
        F.col(lat_col).alias("__plat"),
        F.col(lon_col).alias("__plon"),
    )
    dist = haversine_km(
        F.col("__plat"), F.col("__plon"), F.col("__slat"), F.col("__slon")
    )
    # 6-dp quantization by FLOOR(x*1e6 + 0.5) on the BINARY double, not
    # engine ROUND: haversine is a shared transcendental double, and
    # engine ROUND diverges cross-engine on repr-ties (29 diverging
    # cells at sf1 — Spark HALF_UPs the shortest decimal repr, DuckDB
    # rounds the binary value). floor-shift is the same arithmetic on
    # the same double everywhere, so the micro-km integer — and the
    # argmin it orders — is deterministic on any engine.
    micro = F.floor(dist * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    cand = p.crossJoin(F.broadcast(s)).select(
        "point_id",
        F.struct(micro.alias("km_u"), F.col("__sid").alias("sid")).alias(
            "__d"
        ),
    )
    best = cand.groupBy("point_id").agg(F.min("__d").alias("__best"))
    return best.select(
        "point_id",
        F.col("__best.sid").alias("site_id"),
        (F.col("__best.km_u").cast("double") / F.lit(1000000.0)).alias(
            "distance_km"
        ),
    )


def grid_density_clusters(
    points: DataFrame,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 5.0,
    min_pts: int = 25,
) -> DataFrame:
    """Grid-density spatial clustering (the cell-based DBSCAN variant,
    public): bucket points into cell_deg×cell_deg cells, keep cells with
    ≥ min_pts points ("core"), and merge 8-adjacent core cells into
    clusters via the engine's star-contraction connected components
    (dedup.duplicate_clusters) — density clustering without any
    point-to-point distance join.

    Shape: ONE corpus aggregation to the cell table, a bounded ×8
    neighbor-offset explode + equi-join for adjacency (the sliding-
    window trick — never a distance cross join), log-round contraction
    on the |core cells| graph, and a per-cluster rollup. Isolated core
    cells (no core neighbor) label themselves. Returns
    (cluster_id, n_cells, n_points, min/max cell coords).
    """
    from skope_api_spark.operators.dedup import duplicate_clusters

    if min_pts < 1 or cell_deg <= 0:
        raise ValueError("need min_pts >= 1 and cell_deg > 0")
    cx = F.floor(F.col(lat_col) / cell_deg).cast("long")
    cy = F.floor(F.col(lon_col) / cell_deg).cast("long")
    # positive single-key cell id: shift both axes well clear of zero
    cid = (cx + 1000) * 1_000_000 + (cy + 1000)
    cells = (
        points.groupBy(
            cx.alias("cx"), cy.alias("cy"), cid.alias("cell_id")
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .where(F.col("n_points") >= min_pts)
        .localCheckpoint(eager=True)
    )
    offs = [
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0)
    ]
    fanned = cells.select(
        "cell_id", "cx", "cy", F.explode(F.array(*offs)).alias("o")
    ).select(
        F.col("cell_id").alias("doc_a"),
        (
            (F.col("cx") + F.col("o.dx") + 1000) * 1_000_000
            + (F.col("cy") + F.col("o.dy") + 1000)
        ).alias("doc_b"),
    )
    edges = fanned.join(
        cells.select(F.col("cell_id").alias("doc_b")), "doc_b"
    ).where(F.col("doc_a") < F.col("doc_b"))
    labeled = duplicate_clusters(edges)
    full = cells.join(
        labeled.select(
            F.col("doc_id").alias("cell_id"), "cluster_id"
        ),
        "cell_id",
        "left",
    ).withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("cell_id"))
    )
    return full.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_points").alias("n_points"),
        F.min("cx").alias("min_cx"),
        F.max("cx").alias("max_cx"),
        F.min("cy").alias("min_cy"),
        F.max("cy").alias("max_cy"),
    )
