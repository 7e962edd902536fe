#!/usr/bin/env python
"""Audit: which declared queries push EXPENSIVE derived expressions
into FileScan DataFilters?  The r16 session-2 pathology: a filter (or
an InferFiltersFromGenerate-derived `size(arr) > 0`) built from a
heavy expression chain (tokenize/shingle/regex/hash) sinks below the
parallelizing repartition into the single-task parquet scan, where it
evaluates the whole chain serially — and again above for the real
projection.  Flags any scan whose DataFilters contain one of the
heavy markers.

Usage: python scripts/scanfilter_audit.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = re.compile(
    r"DataFilters: \[[^]]*(transform\(|array_distinct\(|regexp_replace\(|"
    r"split\(|md5\(|sha2\(|xxhash64\(|concat_ws\(|aggregate\(|sequence\("
)

SKIP = {"stream_hourly", "stream_sliding", "stream_sessionize", "stream_dedup",
        "stream_regrid", "stream_interval_join", "stream_rollup"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    import __spark_entry__ as E
    from xesmf_spark.session import get_spark

    spark = get_spark("scanfilter_audit", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    names = sys.argv[1:] or [n for n in qs if n not in SKIP]
    flagged = []
    for name in names:
        if name in SKIP:
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:80]}")
            continue
        hits = [
            ln.strip()[:180]
            for ln in plan.splitlines()
            if "FileScan" in ln and HEAVY.search(ln)
        ]
        if hits:
            flagged.append(name)
            print(f"{name}: {len(hits)} heavy scan filter(s)")
            for h in hits[:2]:
                print(f"    {h}")
    print(f"\n{len(flagged)} flagged: {flagged}")


if __name__ == "__main__":
    main()
