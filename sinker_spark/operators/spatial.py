"""Spatial radius joins via grid bucketing — the classic trick for
"find all pairs within distance r" without a cartesian product.

Points are bucketed into square grid cells of side >= r (in the join
metric); any pair within r falls either in the same cell or in
horizontally/vertically/diagonally adjacent cells, so candidate
generation is an equi-join on cell ids with one side exploded to its
3x3 neighborhood. Shuffle cost: O(points * 9) keyed on the cell id —
never O(points²). Exact distance then decides.

This is also exactly the DataFusion/PostGIS "ST_DWithin with a
gridded index" plan shape, re-expressed as pure Catalyst expressions
(floor/explode/equi-join) — no spatial library, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Great-circle distance in km (haversine formula), all JVM math."""
    rl_a, rl_b = F.radians(lat_a), F.radians(lat_b)
    dphi = F.radians(lat_b - lat_a) / 2
    dlmb = F.radians(lon_b - lon_a) / 2
    h = F.sin(dphi) * F.sin(dphi) + F.cos(rl_a) * F.cos(rl_b) * F.sin(dlmb) * F.sin(dlmb)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> tuple[Column, Column]:
    return (
        F.floor(lat / F.lit(cell_deg)).cast("bigint"),
        F.floor(lon / F.lit(cell_deg)).cast("bigint"),
    )


def radius_pairs_deg(
    pts: DataFrame,
    radius_deg: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    round_digits: int = 6,
) -> DataFrame:
    """All unordered point pairs within ``radius_deg`` in planar degree
    space (the deterministic join metric: *, +, sqrt are exactly-rounded
    IEEE ops in every engine, so the boundary predicate can never flip
    between Spark and an oracle). Columns: id_a, id_b, dist_deg plus the
    great-circle km distance as a reporting column.

    Cell side = radius ⇒ the 3x3 neighborhood is a complete candidate
    cover. The neighbor explode happens on ONE side only (with self-cell
    pairs deduped by the id order predicate), so the shuffle is
    9·|pts| keyed rows."""
    cx, cy = grid_cell(F.col(lat_col), F.col(lon_col), radius_deg)
    base = pts.select(
        F.col(id_col), F.col(lat_col).alias("lat"), F.col(lon_col).alias("lon"),
        cx.alias("cx"), cy.alias("cy"),
    )
    off = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("lat").alias("lat_a"), F.col("lon").alias("lon_a"),
        "cx", "cy", off.alias("o"),
    ).select(
        "id_a", "lat_a", "lon_a",
        (F.col("cx") + F.col("o.dx")).alias("jx"), (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("lat").alias("lat_b"), F.col("lon").alias("lon_b"),
        F.col("cx").alias("jx"), F.col("cy").alias("jy"),
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b")) + (
        F.col("lon_a") - F.col("lon_b")
    ) * (F.col("lon_a") - F.col("lon_b"))
    return (
        a.join(b, ["jx", "jy"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(d2 <= F.lit(radius_deg) * F.lit(radius_deg))
        .select(
            "id_a",
            "id_b",
            F.round(F.sqrt(d2), round_digits).alias("dist_deg"),
            F.round(
                haversine_km(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")), 4
            ).alias("approx_km"),
        )
    )
