#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> <query> [query ...]
       python scripts/dump_plans.py r15 before documents_suffix_ranks ...

Plans are captured at sf0.001 (plan SHAPE is sf-independent; the audit
convention of scripts/plan_audit.py) unless SPARK_GRAFT_SF_DIR says
otherwise.  Streaming queries are skipped (building them runs the
stream).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP = {"stream_hourly", "stream_sliding", "stream_sessionize", "stream_dedup",
        "stream_regrid", "stream_interval_join", "stream_rollup"}


def main():
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from xesmf_spark.session import get_spark

    spark = get_spark("dump_plans", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for name in names:
        if name in SKIP:
            print(f"{name}: SKIP (streaming)")
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"{name}: wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {e}")
        finally:
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
