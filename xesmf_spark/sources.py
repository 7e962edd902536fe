"""Source/sink adapters beyond parquet.

Parquet is the primary at-rest format (columnar, predicate pushdown,
row-group splits). Real corpora additionally arrive as JSONL — the
interchange format of every web-scale text pipeline — and tabular
sidecars arrive as CSV. These readers make the formats first-class
WITHOUT giving up scale discipline:

- **explicit schema, never inference** — schema inference reads the
  whole input once before the real job (a second 100-TB scan);
- **permissive corrupt handling** — a malformed line must not kill a
  million-file ingest; it lands in ``_corrupt_record`` for quarantine;
- **gzip/zstd transparency** — Spark decompresses ``*.jsonl.gz``
  per-file; NOTE a gzipped file is one split (no parallelism inside),
  so at scale prefer many medium files over few huge ones (the
  docstring is the contract: this module does not try to out-smart the
  container format).

The reference engine has exactly one interchange format (netCDF weight
files, handled in ``weights.io``); this module is the beyond-reference
pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the canonical documents schema (mirrors testdata documents.parquet)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL document corpus with an EXPLICIT schema and
    PERMISSIVE corrupt-line handling.

    Malformed lines parse to all-null rows with the raw line preserved
    in ``_corrupt_record``; by default they are dropped (quarantine
    them yourself with ``keep_corrupt=True`` → filter on
    ``_corrupt_record IS NOT NULL`` and sink to a dead-letter path).
    NOTE Spark disallows a query that references ONLY the internal
    corrupt column of a raw JSON scan — persist the parsed frame (or
    select at least one data column alongside) before a
    corrupt-records-only count/sink.
    Scale shape: line-delimited JSON splits by line across tasks (for
    uncompressed/zstd input; gzip is one split per file)."""
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


def write_documents_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Sink a corpus as JSONL (optionally compressed). One file per
    partition — repartition upstream to control file count/size (the
    many-medium-files shape gzip needs for parallel re-reads)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV sidecar reader — explicit schema only (no inference pass),
    PERMISSIVE mode, standard quoting. For big tabular data prefer
    parquet; CSV is for interchange with external tooling."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_csv_table(df: DataFrame, path: str, header: bool = True) -> None:
    w = df.write.mode("overwrite").option("header", str(header).lower())
    w.csv(path)


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader — the other columnar interchange format (Hive/Trino
    ecosystems). ORC embeds its schema in the file footer, so no
    inference scan happens; predicate pushdown and column pruning work
    the same as parquet (min/max stripe statistics)."""
    return spark.read.orc(path)


def write_orc_table(df: DataFrame, path: str, compression: str = "snappy") -> None:
    """Sink as ORC — one file per partition, same file-count discipline
    as the other sinks."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned parquet layout — THE at-rest layout for a
    100-TB fact table: a filter on a partition column prunes entire
    directories at planning time (``PartitionFilters`` in the scan, no
    file even opened), independent of row-group statistics. Choose
    low-cardinality, always-filtered columns (date, category); never
    high-cardinality keys (one dir per value = small-files death)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back; partition columns are
    reconstructed from directory names (string-typed unless the session
    enables partition-column type inference — filters still prune)."""
    return spark.read.parquet(path)


def compact_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
) -> DataFrame:
    """Small-file COMPACTION — the OPTIMIZE/bin-packing maintenance op
    of Delta/Iceberg, Spark-first: re-reads a fragmented parquet
    directory with the scan planner's own file-packing knobs
    (``spark.sql.files.maxPartitionBytes`` = the target output size,
    ``openCostInBytes`` charging each extra file its real constant
    cost) so the FileScan itself BIN-PACKS many small files into
    ~target-size input partitions, then writes one output file per
    partition. ZERO shuffle — no repartition, no sort, no data
    movement beyond the rewrite itself; rows are preserved exactly
    (content is the contract, order is not — parquet directories carry
    no order).

    Why it matters at 100 TB: streaming sinks and over-parallel jobs
    leave millions of KB-scale files; every downstream scan then pays
    per-file open cost and the NameNode/listing pays per-file metadata.
    Compaction is the standing maintenance job that keeps scan
    parallelism matched to data volume. Returns the compacted frame
    (re-read from ``dst``).
    """
    confs = {
        "spark.sql.files.maxPartitionBytes": str(target_bytes),
        "spark.sql.files.openCostInBytes": str(1 << 20),
        # the packer's dynamic sizing divides total bytes by
        # minPartitionNum (default = core count), which would cap
        # partitions at ~totalBytes/cores and defeat compaction on a
        # wide session — a compaction job wants the TARGET to govern
        "spark.sql.files.minPartitionNum": "1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # plan (and therefore file->partition packing) is fixed at
        # write time, while the confs are in force
        spark.read.parquet(src).write.mode("overwrite").parquet(dst)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.read.parquet(dst)


def zvalue(cols: list, bits: int = 16) -> "F.Column":
    """Morton Z-VALUE of already-bucketized integer columns: interleave
    the low ``bits`` bits of each column (col j's bit i lands at
    position ``i * len(cols) + j``). Pure bitwise projection — stays in
    whole-stage codegen. Inputs must be non-negative ints in
    [0, 2^bits); use :func:`zorder_write`'s scaler for raw columns."""
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError(f"zvalue interleaves 1-4 columns, got {n}")
    if bits * n > 62:
        raise ValueError(f"bits * n_cols must be <= 62, got {bits * n}")
    terms = []
    for j, c in enumerate(cols):
        c = F.col(c) if isinstance(c, str) else c
        # shift in BIGINT: an IntegerType input would wrap the shift
        # amount mod 32 (Java int shift semantics) as soon as a target
        # bit position reaches 32, silently corrupting the Morton code
        # despite the bits*n <= 62 guard
        c = c.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet CLUSTERED ON A Z-ORDER (Morton) CURVE
    over ``cols`` — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` layout op.
    Each column is scaled to a ``bits``-bit integer against its global
    min/max (one tiny 1-row aggregate), the bits are interleaved into a
    single z-value, and the data is range-partitioned + sorted on it —
    so every output file covers a small HYPER-RECTANGLE of the key
    space and its parquet footer min/max statistics are tight on EVERY
    clustered column simultaneously. A filter on ANY of the columns
    then skips most files/row-groups at scan time, where a plain sort
    only serves its leading column.

    Scale shape: one pass for the min/max scalars, one range shuffle on
    the z-value (sampled range boundaries, skew-tolerant), a per-
    partition sort that feeds the parquet writer's row-group stats.
    The scaling min/max is layout-only — values are written verbatim,
    so correctness never depends on the bucketization."""
    import pyspark.sql.functions as _F

    if not cols:
        raise ValueError("zorder_write needs at least one column")
    stats = df.agg(
        *[_F.min(c).alias(f"mn_{c}") for c in cols],
        *[_F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(
                f"zorder_write: column {c!r} has no non-null values "
                "(empty input?) — nothing to cluster on"
            )
        span = max(int(mx) - int(mn), 1)
        # double arithmetic on purpose: (x-mn)*top overflows BIGINT for
        # epoch-ns columns, and the bucketization is LAYOUT-ONLY (values
        # are written verbatim) so last-ulp rounding cannot matter
        scaled.append(
            _F.least(
                _F.lit(top),
                _F.floor(
                    (_F.col(c) - _F.lit(int(mn))).cast("double")
                    / _F.lit(float(span))
                    * _F.lit(float(top))
                ).cast("long"),
            ).alias(f"__z_{c}")
        )
    tmp = df.select("*", *scaled)
    z = zvalue([f"__z_{c}" for c in cols], bits)
    (
        tmp.withColumn("__zval", z)
        .repartitionByRange(n_files, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval", *[f"__z_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Snapshot-versioned table (lakehouse-lite: MVCC manifests + time travel)
# ---------------------------------------------------------------------------

def _snapshot_manifests(table_dir: str) -> list[int]:
    """Committed snapshot versions, ascending.  A version EXISTS iff
    its manifest file exists — data files alone are invisible (the
    same readers-trust-the-manifest rule as
    :class:`xesmf_spark.datasource.ManifestJsonl`)."""
    import os
    import re

    if not os.path.isdir(table_dir):
        return []
    out = []
    for e in os.listdir(table_dir):
        m = re.fullmatch(r"v(\d+)\.manifest\.json", e)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def snapshot_commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    tag: str | None = None,
) -> int:
    """Commit ``df`` to a snapshot-versioned parquet table and return
    the new version number.  The table is an MVCC manifest chain — the
    minimal form of the Iceberg/Delta idea:

    - data files land under ``parts/`` with version-unique names and
      are IMMUTABLE once written (no overwrite-in-place, ever);
    - a manifest ``v{n}.manifest.json`` lists the FULL set of live
      files for snapshot ``n`` (``append`` = previous list + new
      files, ``overwrite`` = new files only);
    - the manifest is published atomically: staged to a dot-prefixed
      temp name, then ``os.link``-ed into place — link FAILS if the
      version already exists, which is the optimistic-concurrency
      check (a racing writer retries at n+1 rather than silently
      clobbering);
    - readers resolve a manifest FIRST, then read exactly its files:
      uncommitted parts, torn writes, and later versions are all
      invisible — snapshot isolation and time travel fall out of the
      same property.

    Old versions stay readable until :func:`snapshot_vacuum` expires
    them (retention sweep: keep-last + min-age two-condition delete);
    nothing in ``snapshot_commit`` itself ever deletes data files.

    Scale shape: the data write is an ordinary distributed parquet
    job; the manifest is O(files) driver-side JSON.  At 100 TB the
    manifest would hold per-file min/max stats for pruning — the
    Z-order writer (:func:`zorder_write`) shows that layout side."""
    import json
    import os
    import shutil
    import uuid

    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if tag is not None:
        done = _find_tagged_version(table_dir, tag)
        if done is not None:
            return done  # idempotent replay: this commit already landed
    parts_dir = os.path.join(table_dir, "parts")
    os.makedirs(parts_dir, exist_ok=True)
    stage = os.path.join(table_dir, f".stage_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        raise RuntimeError(f"parquet job left no _SUCCESS in {stage}")
    part_uid = uuid.uuid4().hex[:8]
    new_files = []
    for i, f in enumerate(sorted(os.listdir(stage))):
        if f.endswith(".parquet"):
            dst = f"part_{part_uid}_{i:05d}.parquet"
            os.rename(os.path.join(stage, f), os.path.join(parts_dir, dst))
            new_files.append(os.path.join("parts", dst))
    shutil.rmtree(stage, ignore_errors=True)
    while True:
        versions = _snapshot_manifests(table_dir)
        n = (versions[-1] + 1) if versions else 1
        if mode == "append" and versions:
            with open(
                os.path.join(table_dir, f"v{versions[-1]}.manifest.json")
            ) as fh:
                files = json.load(fh)["files"] + new_files
        else:
            files = list(new_files)
        tmp = os.path.join(table_dir, f".manifest_{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump({"version": n, "mode": mode, "tag": tag, "files": files}, fh)
        try:
            os.link(tmp, os.path.join(table_dir, f"v{n}.manifest.json"))
            os.unlink(tmp)
            return n
        except FileExistsError:
            os.unlink(tmp)  # lost the race: recompute against the winner
            if tag is not None:
                done = _find_tagged_version(table_dir, tag)
                if done is not None:
                    return done  # the "winner" was our own replayed tag


def _find_tagged_version(table_dir: str, tag: str) -> int | None:
    """Version whose committed manifest carries ``tag``, or None — the
    idempotence lookup that makes at-least-once callers (foreachBatch
    replays) exactly-once at the TABLE level: the tag is checked before
    committing and again after an os.link race, so a replayed commit
    lands zero or one time regardless of crash point.  The staged data
    files of a failed attempt remain as orphan parts — invisible by
    the manifest-scoped read rule."""
    import json as _json
    import os as _os

    for v in _snapshot_manifests(table_dir):
        with open(_os.path.join(table_dir, f"v{v}.manifest.json")) as fh:
            if _json.load(fh).get("tag") == tag:
                return v
    return None


def snapshot_read(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read a snapshot-versioned table AS OF ``version`` (default:
    latest committed).  Resolves the manifest, then scans exactly its
    file list — parts added by later commits are invisible, which is
    what makes a long-running job's input immutable while writers keep
    committing (snapshot isolation), and what makes ``version=k`` time
    travel trivial."""
    import json
    import os

    versions = _snapshot_manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {table_dir}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"snapshot v{version} not committed (have {versions})"
        )
    with open(os.path.join(table_dir, f"v{version}.manifest.json")) as fh:
        files = json.load(fh)["files"]
    reader = spark.read
    if merge_schema:
        # schema EVOLUTION read: union the per-file schemas (a column
        # added by a later commit reads as NULL on older parts) — the
        # additive-only evolution rule every lakehouse format shares
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[os.path.join(table_dir, f) for f in files])


def snapshot_vacuum(
    table_dir: str,
    keep_last: int = 1,
    min_age_sec: float = 7 * 24 * 3600.0,
) -> dict:
    """Retention sweep over a snapshot-versioned table — the VACUUM /
    expire-snapshots half of the MVCC lifecycle
    (:func:`snapshot_commit` never deletes anything):

    - retain the newest ``keep_last`` committed versions; delete the
      older versions' manifests (their time travel becomes a
      ``FileNotFoundError``, exactly like a never-committed version);
    - delete every file under ``parts/`` referenced by NO retained
      manifest AND older than ``min_age_sec`` — the age guard keeps
      the staged parts of an IN-FLIGHT commit (written before its
      manifest publishes) safe from a concurrent vacuum, the same
      two-condition rule as Delta's VACUUM retention check.

    Orphan parts from failed/aborted attempts are collected by the
    same sweep once they age out.  CAUTION (documented contract, same
    as every lakehouse): retention must exceed (a) the longest-running
    reader's lifetime — a reader that resolved a manifest before the
    vacuum may lose files under it — and (b) the streaming-replay
    horizon, because :func:`_find_tagged_version` idempotence forgets
    tags whose manifests were vacuumed.

    Driver-side O(files) metadata work only; returns
    ``{"retained_versions", "dropped_versions", "deleted_files",
    "kept_files", "skipped_young_files"}`` — the last lists unreferenced
    candidates the age gate refused to delete, so a vacuum that removed
    nothing under the (deliberately safe) 7-day default ``min_age_sec``
    is diagnosable from its stats instead of silently indistinguishable
    from a clean table."""
    import json
    import os
    import time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _snapshot_manifests(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {table_dir}")
    retained = versions[-keep_last:]
    dropped = [v for v in versions if v not in retained]
    live: set[str] = set()
    for v in retained:
        with open(os.path.join(table_dir, f"v{v}.manifest.json")) as fh:
            live.update(json.load(fh)["files"])
    deleted = []
    skipped_young = []
    parts_dir = os.path.join(table_dir, "parts")
    now = time.time()
    if os.path.isdir(parts_dir):
        for f in sorted(os.listdir(parts_dir)):
            rel = os.path.join("parts", f)
            p = os.path.join(parts_dir, f)
            if rel in live:
                continue
            if now - os.path.getmtime(p) < min_age_sec:
                # possibly an in-flight commit's staged part — report
                # it so an age-gated no-op vacuum is diagnosable
                skipped_young.append(rel)
                continue
            os.remove(p)
            deleted.append(rel)
    # manifests go LAST: if the sweep crashes mid-delete, a dropped
    # version's manifest may reference missing files (an unreadable
    # version, detectable), but no retained version ever loses a file
    for v in dropped:
        os.remove(os.path.join(table_dir, f"v{v}.manifest.json"))
    kept = sorted(os.listdir(parts_dir)) if os.path.isdir(parts_dir) else []
    return {
        "retained_versions": retained,
        "dropped_versions": dropped,
        "deleted_files": deleted,
        "kept_files": [os.path.join("parts", f) for f in kept],
        "skipped_young_files": skipped_young,
    }
