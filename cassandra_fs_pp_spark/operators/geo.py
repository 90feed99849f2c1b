"""Grid-bucketed spatial radius join.

The reference engine is a point-timeseries processor with no spatial
surface; fleet deployments (its multi-site generalization) immediately
need "which stations are within R meters of each other" for cross-site
QC and sensor-drift cross-checks. This is the planar version of that
primitive, built the way a 100 TB engine must build it:

naive radius join = O(n^2) distance evaluations. Grid blocking with
cell size == R makes it exact at hash-join cost: any pair within
distance R lies in the same or an adjacent cell (a disk of radius R
fits inside the 3x3 stencil of R-sized cells around its center), so
candidates = equi-join of an exploded stencil against "each point in
its own cell", then the exact distance filter. The stencil is
ORIENTED — only the home cell plus the four lexicographically-greater
neighbors (0,1),(1,-1),(1,0),(1,1) — so every unordered cross-cell
pair meets exactly once (the lower cell probes the higher, never the
reverse) and same-cell pairs are halved by ``id < id``: half the
explode volume and half the candidate pairs of the naive 9-stencil,
with no distinct pass.

At scale: the join shuffles on a single bigint cell key; dense urban
cells are the skew risk — AQE skew-join splitting or salting the hot
cells handles it, and the stencil fan-out is a fixed 9x (row-count
linear). Works unchanged for any metric with an exact bounding-box
lower bound (great-circle via per-latitude lon scaling, L1, chebyshev).

Coordinates here are integers (meters on a local tangent plane / web-
mercator tile offsets): integer squared distances are exact, overflow-
free within +-3e9 m, and engine-portable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_fs_pp_spark.session import local_table


def grid_radius_join(
    points: DataFrame,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    radius: int,
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` with squared euclidean distance
    ``<= radius**2``. Input columns must be integral (meters).

    Returns ``(id_a, id_b, dist_sq)`` — ``dist_sq`` as bigint keeps the
    output exact (callers wanting meters take ``sqrt`` themselves).
    """
    r = int(radius)
    # Single bigint cell key: cx * 2^31 + cy keeps the join key narrow
    # (one long, not a struct) and is collision-free while |cy| < 2^31
    # cells — at 1 m radius that is a ±2.1e9 m extent, beyond any
    # tangent-plane use (the base-2^31 digit encoding stays injective
    # for negative coordinates too).
    cx = F.floor(F.col(x_col) / r).cast("long")
    cy = F.floor(F.col(y_col) / r).cast("long")
    home = points.select(
        F.col(id_col).alias("__idb"),
        F.col(x_col).alias("__xb"),
        F.col(y_col).alias("__yb"),
        (cx * F.lit(1 << 31) + cy).alias("__cell"),
    )
    own = cx * F.lit(1 << 31) + cy
    stencil = F.array(
        *[
            (cx + F.lit(dx)) * F.lit(1 << 31) + (cy + F.lit(dy))
            for dx, dy in ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
        ]
    )
    probe = points.select(
        F.col(id_col).alias("__ida"),
        F.col(x_col).alias("__xa"),
        F.col(y_col).alias("__ya"),
        own.alias("__own"),
        F.explode(stencil).alias("__cell"),
    )
    dx = F.col("__xa") - F.col("__xb")
    dy = F.col("__ya") - F.col("__yb")
    same_cell = F.col("__own") == F.col("__cell")
    return (
        probe.join(home, on="__cell")
        .filter(
            (~same_cell & (F.col("__ida") != F.col("__idb")))
            | (same_cell & (F.col("__ida") < F.col("__idb")))
        )
        .withColumn("dist_sq", (dx * dx + dy * dy).cast("long"))
        .filter(F.col("dist_sq") <= F.lit(r * r))
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
            "dist_sq",
        )
    )


CELL_KEY_BASE = 1 << 31


def point_in_polygon_tag(
    df: DataFrame,
    polygons: list[tuple[int, list[tuple[int, int]]]],
    *,
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "region_id",
) -> DataFrame:
    """Projection form of :func:`point_in_polygon_join`: the polygon set
    is inlined as LITERAL edge arrays and the even-odd ray-cast runs as
    a higher-order ``aggregate`` expression per region — no join, no
    shuffle, no state, pure whole-stage-codegen map. One output row per
    (point, containing region); points outside every region drop.

    This is the streaming-native shape: a stateless projection makes
    the availableNow drain equal the batch run row-for-row by
    construction, and at 100 TB the tag rides the scan with zero
    exchanges. Use the join form when the region set is too large to
    inline as a literal (thousands+); fleet geofences are dozens.
    Same exact int64 crossing test as the join form (differential
    pytest pins them equal)."""
    px, py = F.col(x_col), F.col(y_col)

    def region_hit(rid: int, verts: list[tuple[int, int]]):
        n = len(verts)
        edges = F.array(
            *[
                F.struct(
                    F.lit(verts[i][0]).cast("long").alias("x1"),
                    F.lit(verts[i][1]).cast("long").alias("y1"),
                    F.lit(verts[(i + 1) % n][0]).cast("long").alias("x2"),
                    F.lit(verts[(i + 1) % n][1]).cast("long").alias("y2"),
                )
                for i in range(n)
            ]
        )

        def crossing(acc, e):
            dy = e["y2"] - e["y1"]
            num = (e["x1"] - px) * dy + (e["x2"] - e["x1"]) * (
                py - e["y1"]
            )
            straddles = (e["y1"] <= py) != (e["y2"] <= py)
            crosses = straddles & (
                F.when(dy > 0, num > 0).otherwise(num < 0)
            )
            return acc + crosses.cast("int")

        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        bbox = (
            px.between(min(xs), max(xs)) & py.between(min(ys), max(ys))
        )
        odd = F.aggregate(edges, F.lit(0), crossing) % 2 == 1
        return F.struct(
            F.lit(rid).cast("long").alias("rid"),
            (bbox & odd).alias("inside"),
        )

    tags = F.array(*[region_hit(rid, verts) for rid, verts in polygons])
    hits = F.transform(
        F.filter(tags, lambda t: t["inside"]), lambda t: t["rid"]
    )
    return df.withColumn(out_col, F.explode(hits))


def point_in_polygon_join(
    points: DataFrame,
    polygons: list[tuple[int, list[tuple[int, int]]]],
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    cell: int = 10_000,
) -> DataFrame:
    """Point-in-region join: ``(id, region_id)`` for every point strictly
    inside a polygon, by the even-odd (ray-casting) rule in EXACT integer
    arithmetic — the second geo primitive beside :func:`grid_radius_join`
    (geofencing / admin-region tagging over an event stream).

    Scale shape: the region set is small and static (a country has ~1e5
    admin polygons; this engine's fleet regions are dozens), so both
    derived tables broadcast — (cell -> candidate region) coverage from
    each polygon's bbox, and the edge list — and the points side stays a
    narrow streamed scan: cell-key the point (one integer), hash-join the
    broadcast coverage (prunes regions to the 1-2 whose bbox contains the
    cell), join the broadcast edges, and aggregate the per-edge crossing
    parity map-side. No shuffle touches the point stream except the final
    (id, region) parity count, which partial aggregation collapses before
    the exchange. The crossing test is division-free: an upward edge
    (y1 <= py < y2 half-open, so shared vertices count once) crosses the
    +x ray iff the point sits strictly left of the edge at py, i.e.
    ``sign((x1-px)*(y2-y1) + (x2-x1)*(py-y1)) == sign(y2-y1)`` — all
    int64, exact and engine-portable (the oracle inlines the same vertex
    literals)."""
    edge_rows = []
    cover_rows = []
    for rid, verts in polygons:
        n = len(verts)
        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            edge_rows.append((rid, x1, y1, x2, y2))
        for cx in range(min(xs) // cell, max(xs) // cell + 1):
            for cy in range(min(ys) // cell, max(ys) // cell + 1):
                cover_rows.append((cx * CELL_KEY_BASE + cy, rid))

    spark = points.sparkSession
    edges = local_table(
        spark, edge_rows, "region_id long, x1 long, y1 long, x2 long, y2 long"
    )
    cover = local_table(spark, cover_rows, "cellkey long, region_id long")

    px, py = F.col(x_col), F.col(y_col)
    keyed = points.select(
        F.col(id_col),
        px,
        py,
        (
            F.floor(px / cell).cast("long") * CELL_KEY_BASE
            + F.floor(py / cell).cast("long")
        ).alias("cellkey"),
    )
    cand = keyed.join(F.broadcast(cover), "cellkey").select(
        id_col, x_col, y_col, "region_id"
    )
    dy = F.col("y2") - F.col("y1")
    num = (F.col("x1") - px) * dy + (F.col("x2") - F.col("x1")) * (
        py - F.col("y1")
    )
    straddles = (F.col("y1") <= py) != (F.col("y2") <= py)
    crosses = straddles & (
        F.when(dy > 0, num > 0).otherwise(num < 0)
    )
    hits = (
        cand.join(F.broadcast(edges), "region_id")
        .groupBy(id_col, "region_id")
        .agg(F.sum(crosses.cast("long")).alias("__crossings"))
        .filter(F.col("__crossings") % 2 == 1)
    )
    return hits.select(id_col, "region_id")
