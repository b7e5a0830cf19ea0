"""Grid-bucketed spatial join — nearest neighbor by space binning.

The reference's domain is global mobility; the spatial primitive its
analytics would eventually need (nearest depot / delivery clustering /
neighbor dedup) is a JOIN problem at scale: all-pairs distance is
quadratic, so production engines bin points into grid cells and only
compare within a cell neighborhood — the same candidate-generation
discipline as this repo's LSH/IVF operators, in coordinate space.

Determinism contract (what makes this oracle-checkable where real geo
libraries are not): distance is SQUARED EQUIRECTANGULAR DEGREES —
``(Δlat)² + (Δlon)²`` — one IEEE multiply/add chain, no haversine
(sin/cos are not correctly-rounded, so cross-engine bit equality is
impossible with them). A production deployment swaps in haversine and
keeps the identical join/bucket shape; the semantics pinned here are
the candidate generation and tie-breaking, which is where the scale
bugs live. Nearest is defined WITHIN the 3×3 cell neighborhood — a
point whose neighborhood holds no other point emits nothing (the
documented grid-radius contract, mirrored exactly by the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_nearest_neighbor(
    points: DataFrame,
    cell_deg: float = 5.0,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """For every point, its nearest OTHER point within the surrounding
    3×3 grid-cell neighborhood: ``(id, nearest_id, d2)`` with ``d2``
    the squared-degree distance; ties break on the neighbor id.

    Scale shape: cell assignment is map-side; the probe side explodes
    ×9 (its own cell + 8 neighbors) and hash-joins the build side on
    the cell key — candidate pairs ∝ local density, never all-pairs.
    Dense cells are ordinary join skew (AQE splits them); the per-point
    argmin is a single window over candidates, partitioned by the
    point id.
    """
    if cell_deg <= 0:
        raise ValueError(f"cell_deg must be positive: {cell_deg}")
    from pyspark.sql import Window

    g = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
        F.floor((F.col(lat_col) + 90.0) / cell_deg).cast("int").alias("gx"),
        F.floor((F.col(lon_col) + 180.0) / cell_deg).cast("int").alias("gy"),
    )
    offsets = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({dx} as dx, {dy} as dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    probe = g.select(
        "id", "lat", "lon", "gx", "gy", offsets.alias("o")
    ).select(
        "id",
        "lat",
        "lon",
        (F.col("gx") + F.col("o.dx")).alias("cx"),
        (F.col("gy") + F.col("o.dy")).alias("cy"),
    )
    b = g.select(
        F.col("id").alias("nb"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
        F.col("gx").alias("cx"),
        F.col("gy").alias("cy"),
    )
    dlat = F.col("lat") - F.col("blat")
    dlon = F.col("lon") - F.col("blon")
    cand = (
        probe.join(b, ["cx", "cy"])
        .filter(F.col("nb") != F.col("id"))
        .select("id", "nb", (dlat * dlat + dlon * dlon).alias("d2"))
    )
    w = Window.partitionBy("id").orderBy(F.col("d2").asc(), F.col("nb").asc())
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(F.col("id").alias(id_col), F.col("nb").alias("nearest_id"), "d2")
    )
