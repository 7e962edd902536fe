"""Weight-builder queries — the Spark-native replacement for
``esmf_regrid_build`` (xesmf/backend.py:191-282, which runs in ESMF
Fortran). Each builder is a pure DataFrame query producing COO triplets
``(row BIGINT, col BIGINT, S DOUBLE)`` (FIXTURES.md §1.4).

Methods (xesmf/backend.py:241-246):
- ``conservative``  → interval-overlap join  (conservative.py)
- ``bilinear``      → bracketing range join  (bilinear.py)
- ``nearest_s2d`` / ``nearest_d2s`` → distance-ranked window (nearest.py)
- ``patch``         → Lagrange patch-recovery tensor build (patch.py);
  conservative and bilinear additionally dispatch to the curvilinear
  builders (conservative_clip.py / curvilinear.py) for 2-D meshes
"""

from xesmf_spark.weights.conservative import conservative_weights
from xesmf_spark.weights.conservative_clip import conservative_weights_clip
from xesmf_spark.weights.bilinear import bilinear_weights
from xesmf_spark.weights.nearest import nearest_weights, knn_join
from xesmf_spark.weights.patch import patch_weights
from xesmf_spark.weights.io import read_weights_netcdf, write_weights_netcdf

METHODS = ("bilinear", "conservative", "nearest_s2d", "nearest_d2s", "patch")

__all__ = [
    "conservative_weights",
    "conservative_weights_clip",
    "bilinear_weights",
    "nearest_weights",
    "patch_weights",
    "knn_join",
    "read_weights_netcdf",
    "write_weights_netcdf",
    "METHODS",
]
