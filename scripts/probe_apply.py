#!/usr/bin/env python
"""Phase-level probe of the dense-field apply path (smm_apply_files).

Runs the bench's 0.96 GB apply repeatedly and prints, per trial, the
wall time plus the scheduler-side gap and the per-task read / kernel /
write phase totals from vectorized.LAST_MANIFEST — the feedback loop
for deciding which phase to optimize next.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xesmf_spark.session import get_spark
from xesmf_spark.grids import grid_2d
from xesmf_spark.weights import bilinear_weights
from xesmf_spark import vectorized as V

IN_DIR = "/tmp/xesmf_bench_field_in"
OUT_DIR = "/tmp/xesmf_bench_field_out_probe"


def main():
    spark = get_spark("probe_apply")
    spark.sparkContext.setLogLevel("ERROR")
    g_in = grid_2d(spark, -120, 120, 0.4, -60, 60, 0.3)
    g_out = grid_2d(spark, -120, 120, 0.6, -60, 60, 0.4)
    w = bilinear_weights(g_in, g_out)
    w.persist().count()
    shutil.rmtree(OUT_DIR, ignore_errors=True)

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    for i in range(trials):
        t0 = time.perf_counter()
        V.smm_apply_files(
            spark, IN_DIR, w, OUT_DIR,
            n_in=g_in.n_cells, n_out=g_out.n_cells,
            extra_cols=("time", "lev"), part_naming="task",
        )
        wall = time.perf_counter() - t0
        m = V.LAST_MANIFEST
        rd = [r.read_ms for r in m]
        kn = [r.kernel_ms for r in m]
        wr = [r.write_ms for r in m]
        busy = [a + b + c for a, b, c in zip(rd, kn, wr)]
        print(
            f"trial {i}: wall={wall:6.3f}s tasks={len(m)} | "
            f"read max/mean={max(rd)}/{sum(rd)//len(rd)}ms "
            f"kernel max/mean={max(kn)}/{sum(kn)//len(kn)}ms "
            f"write max/mean={max(wr)}/{sum(wr)//len(wr)}ms | "
            f"task busy max={max(busy)}ms  sched_gap={wall*1000 - max(busy):.0f}ms"
        )
    spark.stop()


if __name__ == "__main__":
    main()
