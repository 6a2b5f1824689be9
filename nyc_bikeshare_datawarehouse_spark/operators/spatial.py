"""Spatial self-join via grid-cell blocking — the geographic analogue of
LSH banding: bucket points into equirectangular degree cells, generate
candidates only between a point's cell and its 8 neighbors, verify with
the exact haversine distance. The reference domain (bikeshare stations
with lat/lon, warehouse/builders.py STATION_SCHEMA) is what this serves:
"stations within X km" without an all-pairs product.

Losslessness bound: a neighbor-cell join finds every pair within
`radius_km` iff one cell side is at least that long on the ground. A
`cell_deg`-degree cell spans 111.32·cell_deg km in latitude everywhere,
but only 111.32·cell_deg·cos(lat) km in longitude — so the guarantee
holds for radius_km ≤ 111.32·cell_deg·cos(max |lat|). Callers at high
latitudes raise cell_deg (cells get cheaper toward the poles anyway).

Scale shape: one explode(×9) on the probe side, an equi-join on the
(cell_lat, cell_lon) key — fixed-width ints, never coordinates-as-keys —
and a codegen haversine verify. Hot cells (dense cities) are the skew
case; AQE splits them, and the per-cell quadratic is bounded by urban
density, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    """Great-circle distance in km (haversine, public formula), built
    from JVM-side trig only."""
    dlat = F.radians(lat_b - lat_a) / 2
    dlon = F.radians(lon_b - lon_a) / 2
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat_a))
        * F.cos(F.radians(lat_b))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(h))


def points_within(
    df: DataFrame,
    radius_km: float,
    cell_deg: float = 1.0,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    round_to: int = 4,
) -> DataFrame:
    """All unordered point pairs within `radius_km`, found through the
    9-cell neighborhood join. Distance is floor-truncated to `round_to`
    decimals before the threshold compare (engine-parity rule — trig
    outputs are floats)."""
    cell_la = F.floor(F.col(lat_col) / cell_deg).cast("long")
    cell_lo = F.floor(F.col(lon_col) / cell_deg).cast("long")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("la"),
        F.col(lon_col).alias("lo"),
        cell_la.alias("cla"),
        cell_lo.alias("clo"),
    )
    # probe side explodes to its own + 8 neighbor cells
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("la").alias("la_a"),
        F.col("lo").alias("lo_a"),
        F.explode(offsets).alias("o"),
        "cla",
        "clo",
    ).select(
        "id_a",
        "la_a",
        "lo_a",
        (F.col("cla") + F.col("o.dy")).alias("jla"),
        (F.col("clo") + F.col("o.dx")).alias("jlo"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("la").alias("la_b"),
        F.col("lo").alias("lo_b"),
        F.col("cla").alias("jla"),
        F.col("clo").alias("jlo"),
    )
    scale = 10 ** round_to
    dist = (
        F.floor(
            haversine_km(F.col("la_a"), F.col("lo_a"), F.col("la_b"), F.col("lo_b"))
            * scale
        )
        / scale
    )
    return (
        a.join(b, ["jla", "jlo"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= radius_km)
    )
