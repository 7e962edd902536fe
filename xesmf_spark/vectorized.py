"""Vectorized physical strategy for weight application (SURVEY.md §4.3).

The relational join-agg (apply.py) is exact and scales to arbitrary
field sizes, but for dense many-field workloads the reference's
one-matmul-per-chunk design (scipy COO dot, xesmf/smm.py:90; dask
map_blocks, xesmf/frontend.py:375-389) is the faster shape. The Spark
analogue: fields as WIDE rows ``(extra dims..., values: array<double>)``
— one row per horizontal slice — processed by ``mapInPandas`` with the
sparse weight triplets broadcast to every executor.

The kernel is pure numpy (scipy is not available in this environment):
gather + multiply + ``np.bincount`` segment-sum per slice — the same
O(nnz) work as a CSR SpMV, C-speed, Arrow-batched.

Scale notes:
- weights are broadcast ONCE per job (sparkContext.broadcast), nnz ~
  4*n_out doubles — a few MB for typical grids, same premise as the
  broadcast-hash join in the relational path;
- each Arrow batch carries ``maxRecordsPerBatch`` rows x n_in doubles;
  callers with very wide grids should lower
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (bench.py uses 16);
- extra-dim parallelism = Spark partitioning of the wide rows; the
  horizontal dim is never chunked — exactly the reference's dask
  constraint (Dask.ipynb cells 16-17) turned into a layout invariant.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType


def smm_apply_vectorized(
    field_wide: DataFrame,
    weights: DataFrame,
    n_in: int,
    n_out: int,
    extra_cols: Sequence[str] = (),
    value_col: str = "values",
) -> DataFrame:
    """Apply COO weights to a wide field: one output array row per input
    row, ``out = A.dot(x)`` per slice (xesmf/smm.py:90 semantics,
    including unmapped-row -> 0 since Y starts as zeros)."""
    spark = field_wide.sparkSession
    trip = weights.select("row", "col", "S").toPandas()
    rows = trip["row"].to_numpy(np.int64)
    cols = trip["col"].to_numpy(np.int64)
    vals = trip["S"].to_numpy(np.float64)
    if len(rows) and (rows.max() >= n_out or cols.max() >= n_in):
        raise ValueError(
            f"weight indices exceed shape ({n_out}, {n_in}) — shape metadata is "
            "required because max indices under-determine it (xesmf/smm.py:20-27)"
        )
    # pre-sort triplets by destination row (CSR-style) so the kernel can
    # segment-sum with one np.add.reduceat per slice — measured ~12x
    # faster than a (batch, nnz) column gather + bincount loop
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    uniq_rows, seg_starts = np.unique(rows, return_index=True)
    bc = spark.sparkContext.broadcast((uniq_rows, seg_starts, cols, vals))

    extra_cols = list(extra_cols)
    out_fields = [field_wide.schema[c] for c in extra_cols]
    out_fields.append(StructField(value_col, ArrayType(DoubleType()), False))
    out_schema = StructType(out_fields)

    def kernel(batches):
        uniq, starts, c, s = bc.value
        for pdf in batches:
            X = np.stack(pdf[value_col].to_numpy())
            if X.shape[1] != n_in:
                raise ValueError(f"field has {X.shape[1]} cells, expected n_in={n_in}")
            b = X.shape[0]
            Y = np.zeros((b, n_out), dtype=np.float64)
            if len(c):
                for k in range(b):
                    contrib = X[k][c] * s      # gather from contiguous slice
                    Y[k, uniq] = np.add.reduceat(contrib, starts)
            out = pdf[extra_cols].copy()
            out[value_col] = list(Y)
            yield out

    return field_wide.mapInPandas(kernel, out_schema)


def long_to_wide(
    field: DataFrame,
    extra_keys: Sequence[str] = (),
    cell_col: str = "cell_id",
    value_col: str = "value",
) -> DataFrame:
    """(extra..., cell_id, value) long rows -> (extra..., values array)
    wide rows, positionally indexed by cell_id. The field must be DENSE
    (every cell present per extra combo) — the reference's N-D array
    contract (xesmf/smm.py:77-86) carried over."""
    extra = list(extra_keys)
    pairs = F.array_sort(F.collect_list(F.struct(F.col(cell_col), F.col(value_col))))
    return field.groupBy(*extra).agg(
        F.transform(pairs, lambda x: x[value_col]).alias("values")
    )


def wide_to_long(
    wide: DataFrame,
    extra_keys: Sequence[str] = (),
    value_col: str = "values",
) -> DataFrame:
    """(extra..., values array) -> (extra..., cell_id, value)."""
    extra = list(extra_keys)
    return wide.select(
        *extra, F.posexplode(value_col).alias("cell_id", "value")
    ).withColumn("cell_id", F.col("cell_id").cast("long"))
