"""Spatial join primitives: grid-bucketed radius join.

Extension scope (no reference counterpart): proximity joins — "every
(left, right) pair within distance r" — naively cross-join; at scale
the standard remedy is the same device ``temporal.range_join`` uses in
one dimension: discretize space into cells at least as wide as the
search radius, give each LEFT point its one home cell, replicate each
RIGHT point to the 3x3 neighborhood, and equi-join on the cell id.
Every qualifying pair meets in exactly the left point's home cell
(the right copy covering it), so no dedup pass is needed; the residual
exact-distance filter runs per candidate pair only.

Coordinates are INTEGER grid units (milli-degrees, metres, whatever the
caller chose) so the squared-distance filter is exact int64 arithmetic
— no trig, no float knife edges, bit-identical in any engine. For
geodetic work, project to integer metres first (the planar
approximation every geohash/S2 bucket scheme makes within a cell).

Scale shape: map-only cell assignment (x9 replication on ONE side),
one cell equi-join whose per-cell candidate count is density-bounded,
and the exact filter. Cell width is the knob, exactly like
range_join's bucket width: ~the radius keeps replication at 9 while
per-cell candidates stay local-density-sized. Skewed hotspots (one
cell holding a city) are an AQE skew-join case — the join IS a plain
equi-join, so runtime splitting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_radius_join"]


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    radius: int,
    cell: int | None = None,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All (left, right) pairs with squared Euclidean distance
    <= radius² on integer coordinates.

    Both inputs carry integer ``x_col``/``y_col``. ``cell`` defaults to
    ``radius`` (must be >= radius for 3x3 correctness — enforced).
    Output: (left_id, right_id, dist2), exact.
    """
    if cell is None:
        cell = radius
    if cell < radius:
        raise ValueError("cell width must be >= radius")
    r2 = int(radius) * int(radius)

    lx, ly = F.col(x_col).cast("bigint"), F.col(y_col).cast("bigint")
    l = left.select(
        F.col(left_id),
        lx.alias("_lx"),
        ly.alias("_ly"),
        F.floor(lx / cell).alias("_cx"),
        F.floor(ly / cell).alias("_cy"),
    )
    off = F.explode(F.sequence(F.lit(-1), F.lit(1)))
    r = (
        right.select(
            F.col(right_id),
            F.col(x_col).cast("bigint").alias("_rx"),
            F.col(y_col).cast("bigint").alias("_ry"),
        )
        .withColumn("_dx", off)
        .withColumn("_dy", off)
        .select(
            right_id,
            "_rx",
            "_ry",
            (F.floor(F.col("_rx") / cell) + F.col("_dx")).alias("_cx"),
            (F.floor(F.col("_ry") / cell) + F.col("_dy")).alias("_cy"),
        )
    )
    d2 = (F.col("_lx") - F.col("_rx")) * (
        F.col("_lx") - F.col("_rx")
    ) + (F.col("_ly") - F.col("_ry")) * (F.col("_ly") - F.col("_ry"))
    return (
        l.join(r, ["_cx", "_cy"])
        .filter(d2 <= F.lit(r2))
        .select(left_id, right_id, d2.alias("dist2"))
    )
