"""kNN nearest-stop join (SURVEY.md §2.3 — absent in the reference,
required by the north_rule).

Semantics: for each query point, the k nearest OTHER points by
great-circle distance, searched within a bounded hex-cell
neighborhood: the query's cell at ``res`` plus ``rings`` hex rings
around it (grid_disk). With res=6 (edge ≈3.2 km) and rings=1 the
search radius is ≥ one full cell (~6.5 km+) — neighbors beyond that
are out of scope by contract (documented bounded-radius kNN, the
standard cell-pruned formulation for distributed kNN joins).

Plan shape (scale notes):
* candidate generation: the probe side explodes each point into its
  grid_disk cells (7 cells at rings=1) — a narrow (cell, id, lon, lat)
  frame; the build side keeps each point once under its own cell.
* one shuffle on the cell id co-locates probes with targets
  (shuffle-hash / sort-merge chosen by AQE); dense urban cells are the
  skew risk — AQE skew-join splits oversized partitions, and the
  candidate frame carries only 4 columns so spill stays cheap.
* refine: exact haversine + per-query top-k via window row_number —
  no Python; the whole operator is built-in expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import hexgrid


@F.pandas_udf(T.ArrayType(T.StringType()))
def _disk_cells(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """grid_disk(cell(point), 1) at KNN_RES as string ids — Arrow-batched."""
    import numpy as np

    lo = lon.to_numpy(dtype="float64", na_value=np.nan)
    la = lat.to_numpy(dtype="float64", na_value=np.nan)
    q, r = hexgrid.cell_qr(np.nan_to_num(lo), np.nan_to_num(la), KNN_RES)
    out = []
    for i in range(len(lo)):
        if np.isnan(lo[i]) or np.isnan(la[i]):
            out.append(None)
        else:
            out.append(
                [f"h{KNN_RES}_{qq}_{rr}" for qq, rr in
                 hexgrid.grid_disk(int(q[i]), int(r[i]), KNN_RINGS)]
            )
    return pd.Series(out, dtype=object)


@F.pandas_udf(T.StringType())
def _own_cell(lon: pd.Series, lat: pd.Series) -> pd.Series:
    import numpy as np

    lo = lon.to_numpy(dtype="float64", na_value=np.nan)
    la = lat.to_numpy(dtype="float64", na_value=np.nan)
    cells = hexgrid.cell_id(np.nan_to_num(lo), np.nan_to_num(la), KNN_RES)
    cells[np.isnan(lo) | np.isnan(la)] = None
    return pd.Series(cells, dtype=object)


KNN_RES = 6
KNN_RINGS = 1


def haversine_expr(lon1, lat1, lon2, lat2):
    """Great-circle meters as a pure column expression (stays in
    whole-stage codegen — no UDF in the refine path)."""
    r = 6_371_008.8
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dp = p2 - p1
    dl = F.radians(lon2) - F.radians(lon1)
    a = F.pow(F.sin(dp / 2), 2) + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), 2)
    return F.lit(2.0 * r) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def knn_join(points: DataFrame, k: int = 3,
             id_col: str = "feature_id",
             lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Self-kNN: (id, neighbor_id, rank, dist_m) — matching knn_golden.

    rank is 1-based by ascending distance; ties broken by neighbor id
    for determinism across parallelism levels.
    """
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
    ).filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())

    probes = pts.select(
        "id", "lon", "lat", F.explode(_disk_cells("lon", "lat")).alias("cell")
    )
    targets = pts.select(
        F.col("id").alias("neighbor_id"),
        F.col("lon").alias("nlon"),
        F.col("lat").alias("nlat"),
        _own_cell("lon", "lat").alias("cell"),
    )
    cand = probes.join(targets, "cell").filter(F.col("id") != F.col("neighbor_id"))
    cand = cand.withColumn(
        "dist_m", haversine_expr(F.col("lon"), F.col("lat"), F.col("nlon"), F.col("nlat"))
    )
    w = Window.partitionBy("id").orderBy(F.col("dist_m").asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "dist_m",
        )
    )
