"""Custom PYTHON DATA SOURCE (Spark 4 `pyspark.sql.datasource`) — the
extension surface for reading systems Spark has no built-in connector
for, exercised end-to-end: schema declaration, option handling,
partition planning, and FILTER PUSHDOWN into the source itself.

`synthetic_docs` generates a deterministic document corpus directly in
the executors — one `InputPartition` per id range, no driver-side
materialization, and `pushFilters` narrows the GENERATED id range
before a single row exists (the source-level analogue of parquet's
row-group pruning: a `doc_id >= X` predicate shrinks every partition,
it does not scan-then-filter). The generator formula is pure integer
arithmetic on `doc_id`, so a DuckDB oracle can replay the whole corpus
symbolically — which is exactly what makes the connector's end-to-end
path (plan -> partitions -> Arrow batches -> SQL) value-checkable.

Why this matters at 100 TB: the Python DataSource API is the sanctioned
way to bring a bespoke system (feature store, internal KV dump, tick
archive) into the DataFrame planner WITH pushdown, instead of the
mapPartitions-over-opaque-blobs pattern that hides everything from
Catalyst. The reference has exactly one ingest format (netCDF weights,
`weights/io.py`); this is the beyond-reference connector surface.
"""

from __future__ import annotations

import os

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

#: generator constants — shared verbatim by the DuckDB oracle
TOK_VOCAB = 97
TOK_A, TOK_B = 13, 7
LEN_BASE, LEN_MOD = 5, 7


def doc_text(doc_id: int) -> str:
    """The deterministic text of document ``doc_id`` — THE spec the
    SQL oracle replays: L = LEN_BASE + id % LEN_MOD tokens, token i =
    'w' + (id*TOK_A + i*TOK_B) % TOK_VOCAB."""
    n = LEN_BASE + doc_id % LEN_MOD
    return " ".join(
        f"w{(doc_id * TOK_A + i * TOK_B) % TOK_VOCAB}" for i in range(n)
    )


@dataclass
class _IdRange(InputPartition):
    lo: int  # inclusive
    hi: int  # exclusive


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = max(1, int(options.get("n_parts", 8)))
        # generated id range [lo, hi) — pushFilters narrows it
        self.lo = 0
        self.hi = self.n_docs

    def pushFilters(self, filters):
        """Absorb simple doc_id range predicates into the generation
        bounds (fully handled — rows outside are never created); yield
        everything else back for Spark to apply post-scan."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",) and isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and isinstance(f.value, int):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                else:  # LessThanOrEqual
                    self.hi = min(self.hi, f.value + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = min(self.n_parts, max(1, hi - lo))
        step, rem = divmod(hi - lo, n)
        parts, cur = [], lo
        for i in range(n):
            w = step + (1 if i < rem else 0)
            parts.append(_IdRange(cur, cur + w))
            cur += w
        return parts

    def read(self, part: _IdRange):
        for d in range(part.lo, part.hi):
            yield (d, doc_text(d))


class SyntheticDocs(DataSource):
    """`spark.read.format("synthetic_docs").option("n_docs", N)` after
    `spark.dataSource.register(SyntheticDocs)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    # pushdown into Python sources is opt-in (the worker asserts if a
    # reader defines pushFilters while the conf is off)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocs)


# ---------------------------------------------------------------------------
# Batch WRITE connector: manifest-committed JSONL sink
# ---------------------------------------------------------------------------

@dataclass
class _PartFile(WriterCommitMessage):
    filename: str
    n_rows: int


class ManifestJsonlWriter(DataSourceWriter):
    """Transactional JSONL sink — the WRITE half of the Python
    DataSource API, with a real two-phase commit: each task streams its
    partition to a uniquely-named ``part-<uuid>.jsonl`` and returns a
    :class:`_PartFile` commit message; only the DRIVER's ``commit``
    publishes a ``_MANIFEST.json`` listing exactly the committed parts
    (+ row counts). Readers trust the manifest, never the directory
    listing — so a crashed/aborted/speculatively-duplicated task's
    orphan file is invisible, the same
    write-then-atomically-publish discipline as the streaming state
    store (:func:`streaming._publish_version`) applied at the
    connector layer. ``abort`` removes any files named by the messages
    that did arrive."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_jsonl writer requires a path option")
        self.overwrite = overwrite

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fn = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, fn), "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFile(filename=fn, n_rows=n)

    def commit(self, messages):
        import json as _json
        import os
        import uuid

        new_parts = [
            {"filename": m.filename, "n_rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        # append mode must UNION the committed manifest's parts, not
        # replace them — otherwise a second append silently orphans
        # every earlier part (the manifest is the source of truth, so
        # "invisible" means "lost" to readers).  The union is a
        # read-modify-write, so publication goes through the same
        # optimistic-concurrency gate as sources.snapshot_commit:
        # each commit claims generation file _MANIFEST.g{N}.json via
        # os.link, which FAILS if that generation already exists — a
        # racing appender re-reads the newer manifest and retries at
        # N+1 instead of silently dropping the other job's parts.
        while True:
            gen, prev = _latest_manifest(self.path)
            parts = list(new_parts)
            if not self.overwrite and prev is not None:
                parts = prev["parts"] + parts
            # legacy parts (pre-generation manifests) may lack n_rows;
            # summing them as 0 would silently understate the total, so
            # an unknown part makes the whole total unknown (null)
            manifest = {
                "parts": sorted(parts, key=lambda p: p["filename"]),
                "n_rows": (
                    None
                    if any("n_rows" not in p for p in parts)
                    else sum(p["n_rows"] for p in parts)
                ),
            }
            tmp = os.path.join(self.path, f"._MANIFEST.{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as f:
                _json.dump(manifest, f)
            target = os.path.join(self.path, f"_MANIFEST.g{gen + 1:06d}.json")
            try:
                os.link(tmp, target)
            except FileExistsError:
                os.remove(tmp)
                continue  # lost the race — merge against the winner
            os.remove(tmp)
            return

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class ManifestJsonl(DataSource):
    """``df.write.format("manifest_jsonl").option("path", d).save()``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema, overwrite: bool):
        return ManifestJsonlWriter(self.options, overwrite)


def _latest_manifest(path):
    """Resolve the highest-generation committed manifest: (gen, dict),
    or (0, None) for an empty/never-committed directory. Readers and
    appenders both resolve through here, so a torn or racing write is
    never observed — only os.link-published generations exist."""
    import json as _json
    import os
    import re

    best, manifest = 0, None
    if os.path.isdir(path):
        for f in os.listdir(path):
            m = re.fullmatch(r"_MANIFEST\.g(\d+)\.json", f)
            if m and int(m.group(1)) > best:
                best = int(m.group(1))
                with open(os.path.join(path, f)) as fh:
                    manifest = _json.load(fh)
        if manifest is None:
            # Legacy layout (pre-generation commits wrote a plain
            # _MANIFEST.json): treat it as generation 0 so an append
            # on an old directory chains from the existing parts
            # instead of silently orphaning them.
            legacy = os.path.join(path, "_MANIFEST.json")
            if os.path.isfile(legacy):
                with open(legacy) as fh:
                    manifest = _json.load(fh)
    return best, manifest


def read_manifest_jsonl(spark, path: str, schema):
    """Read back ONLY the parts listed by the newest committed
    manifest generation (orphan files from failed or uncommitted
    attempts are invisible by construction)."""
    gen, manifest = _latest_manifest(path)
    if manifest is None:
        raise FileNotFoundError(f"no committed _MANIFEST.g*.json in {path}")
    files = [os.path.join(path, p["filename"]) for p in manifest["parts"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


# ---------------------------------------------------------------------------
# STREAMING read connector: offset-tracked synthetic document stream
# ---------------------------------------------------------------------------

class SyntheticDocsStreamReader(DataSourceStreamReader):
    """Custom Python STREAMING source with real offset management —
    the `DataSourceStreamReader` surface: the driver-side reader
    advances a monotone `next_id` offset by `batch_size` per trigger
    (capped at `n_docs`), `partitions(start, end)` tiles exactly the
    [start, end) id range of that micro-batch across `n_parts`
    executor tasks, and Spark's checkpointed offset log makes delivery
    EXACTLY-ONCE across batches: every doc_id is generated in exactly
    one micro-batch, none repeat, none are skipped — asserted across a
    multi-batch run in tests. Rows share :func:`doc_text`, so the
    finite stream's union is symbolically replayable in SQL (the same
    oracle as the batch source — the streaming≡batch discipline)."""

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.batch = max(1, int(options.get("batch_size", 100)))
        self.n_parts = max(1, int(options.get("n_parts", 4)))
        # RESTART SAFETY: a fresh reader instance must not hand Spark
        # an offset BELOW the checkpointed one (the offset log would
        # regress and re-emit delivered ids). A real connector reads
        # its high-water mark from the external system; the synthetic
        # generator has none, so `state_path` (a sidecar json) plays
        # that role. Without it the mark is driver-memory only and the
        # exactly-once contract holds within a single run.
        self._state_path = options.get("state_path")
        self._hwm = self._load_hwm()
        # the offset this INSTANCE was born at: initialOffset must
        # return a stable value even though the engine may call
        # latestOffset first (returning the live mark there would skip
        # the first batch on a fresh start)
        self._start = self._hwm

    def _load_hwm(self) -> int:
        import json as _json
        import os

        if self._state_path and os.path.exists(self._state_path):
            try:
                with open(self._state_path) as f:
                    return int(_json.load(f)["hwm"])
            except (OSError, ValueError, KeyError):
                return 0
        return 0

    def _save_hwm(self) -> None:
        import json as _json
        import os

        if not self._state_path:
            return
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"hwm": self._hwm}, f)
        os.replace(tmp, self._state_path)

    def initialOffset(self) -> dict:
        return {"next_id": self._start}

    def latestOffset(self) -> dict:
        # advance the mark IN MEMORY only: persisting here would record
        # a batch that was planned but never committed, and a surviving
        # sidecar next to a fresh/deleted checkpoint would then skip
        # ids that were never delivered. The sidecar is written solely
        # in commit(), after Spark has durably logged the batch.
        self._hwm = min(self._hwm + self.batch, self.n_docs)
        return {"next_id": self._hwm}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["next_id"]), int(end["next_id"])
        # defense in depth for a lost sidecar: learn the checkpointed
        # offset from the planner's own call so the mark can never sit
        # below an offset Spark has already logged (a regressed batch
        # plans as EMPTY below — ids are never re-read). In-memory
        # only — durability waits for commit().
        if max(lo, hi) > self._hwm:
            self._hwm = max(lo, hi)
        n = max(1, min(self.n_parts, hi - lo)) if hi > lo else 1
        step, rem = divmod(max(hi - lo, 0), n)
        parts, cur = [], lo
        for i in range(n):
            w = step + (1 if i < rem else 0)
            parts.append(_IdRange(cur, cur + w))
            cur += w
        return parts

    def read(self, part: _IdRange):
        for d in range(part.lo, part.hi):
            yield (d, doc_text(d))

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpointed offset log; mirror them
        # into the sidecar so a restarted reader resumes monotone.
        # This is the ONLY place the sidecar is written: the in-memory
        # mark may run ahead (latestOffset/partitions), but durability
        # waits until Spark has committed the batch.
        self._hwm = max(self._hwm, int(end["next_id"]))
        self._save_hwm()


class SyntheticDocsStream(DataSource):
    """``spark.readStream.format("synthetic_docs_stream")`` after
    ``spark.dataSource.register(SyntheticDocsStream)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def streamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)
