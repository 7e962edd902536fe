"""JSONL / CSV source-sink adapters: round-trips, corrupt-line
quarantine, explicit-schema discipline."""

import json
import os

import pytest
from pyspark.sql import functions as F

from xesmf_spark import sources as SRC


def test_documents_jsonl_roundtrip(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    SRC.write_documents_jsonl(docs, out, compression="gzip")
    back = SRC.read_documents_jsonl(spark, out)
    assert back.schema == docs.schema or set(back.columns) == set(docs.columns)
    a = sorted(tuple(r) for r in docs.select(*sorted(docs.columns)).collect())
    b = sorted(tuple(r) for r in back.select(*sorted(docs.columns)).collect())
    assert a == b


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    rows = [
        json.dumps({"doc_id": 1, "text": "ok one", "lang": "en", "source": "s", "n_chars": 6}),
        "{not valid json at all",
        json.dumps({"doc_id": 2, "text": "ok two", "lang": "fr", "source": "s", "n_chars": 6}),
        '{"doc_id": "NOT_A_NUMBER", "text": 3}',
    ]
    p.write_text("\n".join(rows) + "\n")
    clean = SRC.read_documents_jsonl(spark, str(p))
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    # Spark disallows corrupt-column-only queries on a raw JSON scan —
    # persist first (the documented quarantine pattern)
    kept = SRC.read_documents_jsonl(spark, str(p), keep_corrupt=True).cache()
    try:
        bad = kept.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 2  # both malformed lines quarantined
    finally:
        kept.unpersist()


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a,b", 1.5), (2, 'quoted "x"', -0.25)], "id long, s string, v double"
    )
    out = str(tmp_path / "csv_out")
    SRC.write_csv_table(df, out)
    back = SRC.read_csv_table(spark, out, "id long, s string, v double")
    assert sorted(tuple(r) for r in back.collect()) == sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip(spark, tmp_path):
    """ORC sink + source reproduce rows and schema exactly (footer
    schema, no inference)."""
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta  sp", -0.25), (3, None, 0.0)],
        "id long, s string, v double",
    )
    out = str(tmp_path / "orc_out")
    SRC.write_orc_table(df.repartition(2), out)
    back = SRC.read_orc_table(spark, out)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    """Hive-partitioned layout: values round-trip exactly (partition
    column reconstructed from dir names), and a partition-column filter
    shows up as PartitionFilters, not a post-scan Filter."""
    df = spark.createDataFrame(
        [(i, ["x", "y", "z"][i % 3], i * 1.0) for i in range(30)],
        "id long, cat string, v double",
    )
    out = str(tmp_path / "part_out")
    SRC.write_partitioned_parquet(df, out, ["cat"])
    back = SRC.read_partitioned_parquet(spark, out)
    assert sorted((r.id, r.cat, r.v) for r in back.collect()) == sorted(
        (r.id, r.cat, r.v) for r in df.collect()
    )
    sliced = back.filter(back.cat == "y")
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cat" in plan.split("PartitionFilters: [")[1].split("]")[0]
    assert sliced.count() == 10


def test_compact_files_bin_packs_without_shuffle(spark, tmp_path):
    """48 tiny files must compact to a handful of target-size outputs
    with content (rows, not order) preserved exactly; the session's
    scan confs must be restored afterward."""
    from xesmf_spark.sources import compact_files

    src, dst = str(tmp_path / "frag"), str(tmp_path / "packed")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 3)
    df.repartition(48).write.parquet(src)
    before_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    back = compact_files(spark, src, dst, target_bytes=64 << 20)
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == before_max

    import os

    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    n_out = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_in == 48 and 0 < n_out <= 4
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


def test_zorder_layout_skips_on_both_dims(spark, tmp_path):
    """Files written z-ordered on (a, b) must have tight footer min/max
    on BOTH columns: a narrow filter on either column intersects at
    most half the files, while a plain sort on `a` leaves `b`'s
    per-file ranges full-width (no skipping on b). Content must
    round-trip exactly."""
    import os

    import pyarrow.parquet as pq

    from xesmf_spark.sources import zorder_write

    # two independent uniform dims — the worst case for a single sort
    df = spark.range(0, 20000).select(
        (F.xxhash64("id", F.lit(1)) % 10000).alias("a"),
        (F.xxhash64("id", F.lit(2)) % 10000).alias("b"),
        F.col("id"),
    ).select(F.abs("a").alias("a"), F.abs("b").alias("b"), "id")
    zpath, spath = str(tmp_path / "zord"), str(tmp_path / "sorted")
    zorder_write(df, zpath, ["a", "b"], n_files=16)
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(spath)

    def ranges(path, col):
        out = []
        for fn in os.listdir(path):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, fn)).metadata
            i = md.schema.names.index(col)
            st = [md.row_group(g).column(i).statistics for g in range(md.num_row_groups)]
            out.append((min(s.min for s in st), max(s.max for s in st)))
        return out

    def touched(rs, lo, hi):
        return sum(1 for mn, mx in rs if mn <= hi and mx >= lo)

    # narrow (10%) filter on each dim
    za, zb = ranges(zpath, "a"), ranges(zpath, "b")
    assert touched(za, 0, 999) * 2 <= len(za)
    assert touched(zb, 0, 999) * 2 <= len(zb)
    # the plain a-sort serves a but NOT b: every file spans ~all of b
    sb = ranges(spath, "b")
    assert touched(sb, 0, 999) == len(sb)
    # content round-trips exactly
    got = sorted(tuple(r) for r in spark.read.parquet(zpath).collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
    # validation
    import pytest as _pytest

    from xesmf_spark.sources import zvalue

    with _pytest.raises(ValueError):
        zorder_write(df, str(tmp_path / "x"), [])
    with _pytest.raises(ValueError):
        zvalue(["a", "b", "c", "d", "e"])
    with _pytest.raises(ValueError):
        zvalue(["a", "b"], bits=32)


def test_snapshot_commit_append_overwrite_time_travel(spark, tmp_path):
    """Append chains file lists, overwrite resets them, and every
    historical version stays readable bit-for-bit after later commits
    (snapshot isolation + time travel)."""
    from xesmf_spark.sources import snapshot_commit, snapshot_read

    d = str(tmp_path / "tbl")
    df1 = spark.range(0, 5).withColumnRenamed("id", "k")
    df2 = spark.range(5, 8).withColumnRenamed("id", "k")
    df3 = spark.range(100, 102).withColumnRenamed("id", "k")
    assert snapshot_commit(df1, d, "append") == 1
    assert snapshot_commit(df2, d, "append") == 2
    assert snapshot_commit(df3, d, "overwrite") == 3
    v1 = {r.k for r in snapshot_read(spark, d, 1).collect()}
    v2 = {r.k for r in snapshot_read(spark, d, 2).collect()}
    v3 = {r.k for r in snapshot_read(spark, d).collect()}
    assert v1 == set(range(5))
    assert v2 == set(range(8))
    assert v3 == {100, 101}


def test_snapshot_uncommitted_parts_invisible(spark, tmp_path):
    """A data file dropped into parts/ without a manifest (a crashed
    writer) is invisible to every reader — manifests are the only
    source of truth."""
    import os

    from xesmf_spark.sources import snapshot_commit, snapshot_read

    d = str(tmp_path / "tbl")
    snapshot_commit(spark.range(0, 4).withColumnRenamed("id", "k"), d, "append")
    orphan_src = str(tmp_path / "orphan")
    spark.range(900, 910).withColumnRenamed("id", "k").coalesce(1).write.parquet(
        orphan_src
    )
    part = next(f for f in os.listdir(orphan_src) if f.endswith(".parquet"))
    os.rename(
        os.path.join(orphan_src, part),
        os.path.join(d, "parts", "part_orphan_00000.parquet"),
    )
    got = {r.k for r in snapshot_read(spark, d).collect()}
    assert got == set(range(4))


def test_snapshot_occ_link_race_retries(spark, tmp_path):
    """If the next manifest name is taken (a racing writer won), the
    commit retries at the following version instead of clobbering."""
    import json
    import os

    from xesmf_spark.sources import snapshot_commit, snapshot_read

    d = str(tmp_path / "tbl")
    snapshot_commit(spark.range(0, 3).withColumnRenamed("id", "k"), d, "append")
    # simulate a racing writer publishing v2 with an empty file list
    with open(os.path.join(d, "v2.manifest.json"), "w") as fh:
        json.dump({"version": 2, "mode": "overwrite", "files": []}, fh)
    v = snapshot_commit(
        spark.range(10, 12).withColumnRenamed("id", "k"), d, "append"
    )
    assert v == 3
    # the append recomputed against the WINNER (v2, empty), not v1
    assert {r.k for r in snapshot_read(spark, d, 3).collect()} == {10, 11}


def test_snapshot_tagged_commit_is_idempotent(spark, tmp_path):
    """A replayed commit with the same tag is a no-op returning the
    original version — the exactly-once rule streaming ingestion
    relies on; an untagged commit still always lands."""
    from xesmf_spark.sources import snapshot_commit, snapshot_read

    d = str(tmp_path / "tbl")
    df = spark.range(0, 5).withColumnRenamed("id", "k")
    v1 = snapshot_commit(df, d, "append", tag="batch-0")
    v_replay = snapshot_commit(df, d, "append", tag="batch-0")
    assert (v1, v_replay) == (1, 1)
    assert {r.k for r in snapshot_read(spark, d).collect()} == set(range(5))
    v2 = snapshot_commit(df, d, "append", tag="batch-1")
    assert v2 == 2
    assert snapshot_read(spark, d).count() == 10


def test_zvalue_int_columns_no_shift_wrap(spark):
    """IntegerType inputs must interleave identically to a pure-python
    Morton code even when target bit positions exceed 31 (Java int
    shifts wrap mod 32 — the column is cast to BIGINT first)."""
    from xesmf_spark.sources import zvalue

    def morton(vals, bits, n):
        out = 0
        for j, v in enumerate(vals):
            for i in range(bits):
                out |= ((v >> i) & 1) << (i * n + j)
        return out

    rows = [(40000, 1, 65535), (123, 45678, 7)]
    df = spark.createDataFrame(rows, "a int, b int, c int")
    got = [
        r.z for r in df.select(zvalue(["a", "b", "c"], bits=16).alias("z")).collect()
    ]
    assert got == [morton(v, 16, 3) for v in rows]


def test_snapshot_vacuum_retention_and_age_guard(spark, tmp_path):
    """keep_last=1 drops old manifests + their no-longer-referenced
    parts; the retained version stays byte-identical; an orphan part
    younger than min_age_sec survives (the in-flight-commit guard),
    then falls to a zero-age sweep; keep_last<1 rejected."""
    import pytest as _pytest

    from xesmf_spark.sources import (
        snapshot_commit,
        snapshot_read,
        snapshot_vacuum,
    )

    d = str(tmp_path / "snap")
    df1 = spark.createDataFrame([(1,), (2,)], "k long")
    df2 = spark.createDataFrame([(3,)], "k long")
    df3 = spark.createDataFrame([(9,)], "k long")
    assert snapshot_commit(df1, d, "append") == 1
    assert snapshot_commit(df2, d, "append") == 2
    assert snapshot_commit(df3, d, "overwrite") == 3
    # plant a young orphan (failed attempt's staging leftover)
    orphan = os.path.join(d, "parts", "part_orphan_00000.parquet")
    open(orphan, "wb").write(b"junk")

    stats = snapshot_vacuum(d, keep_last=1, min_age_sec=3600)
    assert stats["retained_versions"] == [3]
    assert stats["dropped_versions"] == [1, 2]
    # v1/v2 data files (not referenced by v3) are gone; young orphan kept
    assert os.path.exists(orphan)
    # ... and the age-gated skip is REPORTED, so a no-op vacuum under
    # the safe 7-day default is diagnosable from its stats
    assert "parts/part_orphan_00000.parquet" in stats["skipped_young_files"]
    assert {r.k for r in snapshot_read(spark, d).collect()} == {9}
    for v in (1, 2):
        with _pytest.raises(FileNotFoundError):
            snapshot_read(spark, d, v)
    # aged-out orphan collected by a zero-age sweep
    stats2 = snapshot_vacuum(d, keep_last=1, min_age_sec=0)
    assert not os.path.exists(orphan)
    assert "parts/part_orphan_00000.parquet" in stats2["deleted_files"]
    # disk now holds exactly the retained manifest's files
    import json as _json

    live = sorted(_json.load(open(os.path.join(d, "v3.manifest.json")))["files"])
    on_disk = sorted(
        os.path.join("parts", f) for f in os.listdir(os.path.join(d, "parts"))
    )
    assert on_disk == live
    with _pytest.raises(ValueError):
        snapshot_vacuum(d, keep_last=0)


def test_snapshot_vacuum_crash_between_phases_keeps_retained_readable(
    spark, tmp_path
):
    """The sweep deletes parts BEFORE manifests, so the worst crash
    state (unreferenced parts gone, dropped manifests still present)
    leaves every RETAINED version fully readable; the dropped versions
    are detectably broken (missing files), and a re-run of the sweep
    completes the job."""
    import pytest as _pytest

    from xesmf_spark.sources import (
        snapshot_commit,
        snapshot_read,
        snapshot_vacuum,
    )

    d = str(tmp_path / "snap")
    snapshot_commit(spark.createDataFrame([(1,)], "k long"), d, "append")
    snapshot_commit(spark.createDataFrame([(2,)], "k long"), d, "append")
    snapshot_commit(spark.createDataFrame([(9,)], "k long"), d, "overwrite")
    # simulate the crash state by hand: delete exactly what phase 1
    # would (parts referenced by no retained manifest), keep manifests
    live = set(json.load(open(os.path.join(d, "v3.manifest.json")))["files"])
    parts_dir = os.path.join(d, "parts")
    for f in list(os.listdir(parts_dir)):
        if os.path.join("parts", f) not in live:
            os.remove(os.path.join(parts_dir, f))
    # retained version: intact
    assert {r.k for r in snapshot_read(spark, d).collect()} == {9}
    # dropped versions: detectably broken (their manifests reference
    # deleted files), not silently wrong
    with _pytest.raises(Exception):
        snapshot_read(spark, d, 1).collect()
    # re-running the sweep completes: manifests removed, table healthy
    stats = snapshot_vacuum(d, keep_last=1)
    assert stats["dropped_versions"] == [1, 2]
    assert {r.k for r in snapshot_read(spark, d).collect()} == {9}


def test_snapshot_version_diff_composition(spark, tmp_path):
    """Time-travel reads of two manifest versions reconciled by
    table_diff: added/removed/changed/unchanged statuses match the
    constructed history exactly."""
    import pyspark.sql.functions as F

    from xesmf_spark.relational import table_diff
    from xesmf_spark.sources import snapshot_commit, snapshot_read

    d = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "k long, v long"
    )
    v1 = snapshot_commit(base, d, "append")
    # v2: keep k<6, change v on k%2==0, add k=100
    nxt = spark.createDataFrame(
        [(i, i * 10 + (1 if i % 2 == 0 else 0)) for i in range(6)] + [(100, 5)],
        "k long, v long",
    )
    v2 = snapshot_commit(nxt, d, "overwrite")
    diff = table_diff(
        snapshot_read(spark, d, v1).select("k", "v"),
        snapshot_read(spark, d, v2).select("k", "v"),
        "k",
    )
    got = {r["k"]: r["diff_status"] for r in diff.collect()}
    assert got[100] == "added"
    assert got[6] == got[7] == "removed"
    assert all(got[i] == "changed" for i in range(0, 6, 2))
    assert all(got[i] == "unchanged" for i in range(1, 6, 2))
