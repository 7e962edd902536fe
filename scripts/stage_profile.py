#!/usr/bin/env python
"""Per-stage profile of declared queries: run each named query with the
bench's timed action and print every stage's task count, executor run
time, CPU time and shuffle bytes (guide §7.1 — find WHERE the time
goes before touching anything).  The killer pattern this catches:
a stage with tasks=1 and runTime ≈ the query's wall time = AQE's
byte-based coalescing funneling a CPU-heavy verification into one
task (found on pipeline_editdist_dedup in r16).

Usage: [PROFILE_ACTION=collect] python scripts/stage_profile.py q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    action = os.environ.get("PROFILE_ACTION", "collect")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from xesmf_spark import release_persisted

    spark = (
        SparkSession.builder.appName("stage_profile")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4098")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    qs = E.queries()
    spark.range(1000).count()  # JVM warmup

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            return json.load(r)

    for name in names:
        release_persisted()
        spark.catalog.clearCache()
        seen = {s["stageId"] for s in stages()}
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        if action == "collect":
            df.collect()
        elif action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        wall = time.perf_counter() - t0
        print(f"\n== {name}: wall {wall:.3f}s ({action})")
        rows = [s for s in stages() if s["stageId"] not in seen]
        rows.sort(key=lambda s: -s["executorRunTime"])
        for s in rows[:12]:
            print(
                f"  stage {s['stageId']:4d} tasks={s['numCompleteTasks']:4d} "
                f"run={s['executorRunTime'] / 1000:7.2f}s "
                f"cpu={s.get('executorCpuTime', 0) / 1e9:7.2f}s "
                f"in={s['inputBytes'] >> 20:5d}MB "
                f"shR={s['shuffleReadBytes'] >> 20:5d}MB "
                f"shW={s['shuffleWriteBytes'] >> 20:5d}MB"
            )
        n_more = len(rows) - 12
        if n_more > 0:
            rest = sum(s["executorRunTime"] for s in rows[12:]) / 1000
            print(f"  (+{n_more} more stages, {rest:.2f}s run total)")
    spark.stop()


if __name__ == "__main__":
    main()
