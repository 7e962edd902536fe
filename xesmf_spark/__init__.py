"""xesmf_spark — a PySpark-native regridding + data-pipeline engine.

A from-scratch engine with the query/data-processing capabilities of
xESMF (reference: JiaweiZhuang/xESMF v0.3.0), re-expressed as idiomatic
Spark DataFrame operations:

- weight generation  = spatial joins over grid cell tables
  (interval-overlap join for conservative, bracketing range join for
  bilinear, distance-ranked window for nearest_s2d / nearest_d2s);
- weight application = equi-join + hash aggregate
  (``out[row] = sum_col S(row, col) * in[col]``), the relational form of
  the scipy COO sparse matmul in the reference (xesmf/smm.py:44-95).

Plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) under ``xesmf_spark.pipeline``.
"""

from xesmf_spark.grids import Grid, grid_1d, grid_2d, grid_global, locstream, wave_smooth
from xesmf_spark.apply import smm_apply
from xesmf_spark.regridder import Regridder

__version__ = "0.1.0"

__all__ = [
    "Grid",
    "grid_1d",
    "grid_2d",
    "grid_global",
    "locstream",
    "wave_smooth",
    "smm_apply",
    "Regridder",
]
