"""Weight-file interop: ESMF netCDF triplet files <-> weight DataFrames.

Mirrors ``read_weights`` (xesmf/smm.py:10-41): ESMF writes sparse
triplets with **1-based** Fortran indices (vars ``S double, col int,
row int`` on dim ``n_s``) — the 1->0-based fix (smm.py:36-37) and the
explicit ``(n_in, n_out)`` shape check (smm.py:20-27: max indices
under-determine the matrix shape) are reproduced here. The writer emits
the same 1-based layout so files round-trip with the ESMF ecosystem.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from xesmf_spark.netcdf3 import read_netcdf3, write_netcdf3


def read_weights_netcdf(
    spark: SparkSession, path: str, n_in: int, n_out: int
) -> DataFrame:
    """ESMF netCDF weight file -> (row, col, S) DataFrame (0-based)."""
    _, variables = read_netcdf3(path)
    missing = {"S", "col", "row"} - set(variables)
    if missing:
        raise ValueError(f"{path}: missing weight variables {sorted(missing)}")
    S = variables["S"].astype(np.float64)
    col = variables["col"].astype(np.int64) - 1  # 1-based fix (smm.py:36-37)
    row = variables["row"].astype(np.int64) - 1
    if len(S) and (row.min() < 0 or col.min() < 0 or row.max() >= n_out or col.max() >= n_in):
        raise ValueError(
            f"{path}: indices outside shape ({n_out}, {n_in}) — shape metadata "
            "must be supplied explicitly (xesmf/smm.py:20-27)"
        )
    import pandas as pd

    # Arrow path: the numpy triplet arrays go to the JVM as one Arrow
    # batch — no per-element Python row materialization
    pdf = pd.DataFrame({"row": row, "col": col, "S": S})
    return spark.createDataFrame(pdf, "row bigint, col bigint, S double")


def write_weights_netcdf(weights: DataFrame, path: str) -> None:
    """(row, col, S) DataFrame -> ESMF-layout netCDF triplet file
    (1-based indices, dim ``n_s``)."""
    trip = weights.select("row", "col", "S").toPandas()
    n_s = len(trip)
    write_netcdf3(
        path,
        dims={"n_s": n_s},
        variables={
            "S": (("n_s",), trip["S"].to_numpy(np.float64)),
            "col": (("n_s",), (trip["col"].to_numpy(np.int64) + 1).astype(np.int32)),
            "row": (("n_s",), (trip["row"].to_numpy(np.int64) + 1).astype(np.int32)),
        },
    )
