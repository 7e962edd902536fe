"""Python UDTF surface (Spark 4 table functions).

The §2C UDx checklist has three rows: UDF-shaped kernels run as
``mapInPandas`` (vectorized apply), the UDAF surface is the
GROUPED_AGG pandas_udf (``events_geomean_udaf``), and THIS module is
the UDTF surface: a table-valued function invoked via ``LATERAL`` in
SQL, one input row fanning out to N output rows.

Design stance (same as the UDAF): the UDTF exists to prove the API
surface with an oracle, not to be the hot path — ``eval`` is
row-at-a-time Python, so the equivalent built-in Column form
(:func:`split_segments_expr` — regexp split + filter + posexplode,
whole-stage-codegen'd JVM execution) is the production path, and the
differential test + shared DuckDB oracle prove the two forms and the
oracle all agree row-for-row.

Determinism contract: delimiter patterns must avoid constructs whose
semantics differ between Python ``re``, Java regex (Spark), and RE2
(DuckDB) — in particular Python's ``\\s`` includes unicode whitespace
the other two don't, so :data:`SENT_SPLIT` spells the ASCII whitespace
class out explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

#: sentence delimiter with an explicit ASCII whitespace class
SENT_SPLIT = r"\.[ \t\n\r\f\v]+"


@udtf(returnType="seg_idx int, segment string, n_tokens int")
class SplitSegments:
    """Explode a document into segments on a regex delimiter, with a
    per-segment single-space token count. ``None`` text yields no
    rows; empty segments (adjacent delimiters, text starting/ending on
    a delimiter) are skipped so ``seg_idx`` stays dense from 0.
    Left-to-right non-overlapping split — identical in Python re, Java
    regex, and RE2 for the pattern subset documented above."""

    def eval(self, text, pattern):
        import re

        if text is None:
            return
        i = 0
        for p in re.split(pattern, text):
            if p != "":
                yield i, p, len(p.split(" "))
                i += 1


def register_split_segments(spark: SparkSession, name: str = "split_segments") -> None:
    """Register the UDTF for SQL ``LATERAL`` invocation."""
    spark.udtf.register(name, SplitSegments)


#: spec-string type names -> Spark SQL types accepted by JsonCols
_JSON_COL_TYPES = {"bigint": "bigint", "double": "double", "string": "string"}


class JsonCols:
    """POLYMORPHIC Python UDTF — the ``analyze`` surface: the output
    schema is not declared statically but DERIVED from the constant
    ``spec`` argument at plan time. ``json_cols(props, 'k:bigint')``
    produces a column ``k bigint``; ``'a:string,b:double'`` produces
    two columns — same class, schema per call site. This is the second
    UDTF next to :class:`SplitSegments` (static returnType) so the repo
    exercises both halves of Spark 4's UDTF API.

    Semantics per input row: malformed/NULL JSON yields NO row (the
    table-function form of a quarantine filter); a valid object yields
    exactly one row with each requested field extracted and coerced
    (bigint: JSON integers only — bools/floats/strings degrade to
    NULL; double: any JSON number; string: JSON strings verbatim),
    plus ``n_extra`` = count of keys present beyond the requested set.
    The coercion rules are chosen to agree exactly with the JVM twin
    (``from_json`` + ``json_object_keys``, :func:`json_cols_expr` —
    the whole-stage-codegen'd 100-TB path) and with DuckDB
    ``json_extract``/``json_keys`` so the differential test and the
    oracle hash both close.
    """

    @staticmethod
    def analyze(json_col, spec):  # AnalyzeArgument, AnalyzeArgument
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            LongType,
            StringType,
            StructField,
            StructType,
        )
        from pyspark.sql.udtf import AnalyzeResult

        if spec.value is None:
            raise ValueError("json_cols: spec must be a constant string")
        py = {"bigint": LongType(), "double": DoubleType(), "string": StringType()}
        fields = []
        for part in str(spec.value).split(","):
            name, _, typ = part.strip().partition(":")
            if typ not in _JSON_COL_TYPES:
                raise ValueError(f"json_cols: unsupported type {typ!r} in spec")
            fields.append(StructField(name, py[typ], True))
        fields.append(StructField("n_extra", IntegerType(), True))
        return AnalyzeResult(schema=StructType(fields))

    def eval(self, j, spec):
        import json as _json

        if not hasattr(self, "_fields"):
            self._fields = [
                tuple(p.strip().partition(":")[::2]) for p in spec.split(",")
            ]
        if j is None:
            return
        try:
            obj = _json.loads(j)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        out = []
        for name, typ in self._fields:
            v = obj.get(name)
            if typ == "bigint":
                out.append(v if isinstance(v, int) and not isinstance(v, bool) else None)
            elif typ == "double":
                out.append(
                    float(v)
                    if isinstance(v, (int, float)) and not isinstance(v, bool)
                    else None
                )
            else:
                out.append(v if isinstance(v, str) else None)
        requested = {name for name, _ in self._fields}
        yield (*out, sum(1 for k in obj if k not in requested))


def register_json_cols(spark: SparkSession, name: str = "json_cols") -> None:
    """Register the polymorphic UDTF for SQL ``LATERAL`` invocation.
    Registration wraps the class here (not at module import) because
    ``@udtf`` without returnType requires the analyze method — keeping
    the class un-decorated keeps it directly instantiable in tests."""
    spark.udtf.register(name, udtf(JsonCols))


def json_cols_expr(df: DataFrame, spec: str, json_col: str = "props") -> DataFrame:
    """The built-in-Column twin of :class:`JsonCols` — ``from_json``
    with the same derived schema + ``json_object_keys`` for the extra-
    key count, fully JVM-side (the production path; the UDTF is the
    API-surface form). NULL/malformed JSON rows are dropped, matching
    the UDTF's yield-nothing quarantine."""
    names, types = [], []
    for part in spec.split(","):
        name, _, typ = part.strip().partition(":")
        names.append(name)
        types.append(_JSON_COL_TYPES[typ])
    schema = ", ".join(f"`{n}` {t}" for n, t in zip(names, types))
    # from_json with FAILFAST off (default PERMISSIVE) nulls the struct
    # only for unparseable input; json_object_keys is NULL there too
    keep = [c for c in df.columns if c != json_col]
    parsed = df.select(
        *keep,
        F.from_json(F.col(json_col), schema).alias("__o"),
        F.json_object_keys(F.col(json_col)).alias("__keys"),
    ).filter(F.col("__keys").isNotNull())
    requested = F.array(*[F.lit(n) for n in names])
    n_extra = F.size(
        F.filter(F.col("__keys"), lambda k: ~F.array_contains(requested, k))
    ).cast("int")
    return parsed.select(
        *keep,
        *[F.col(f"__o.`{n}`").alias(n) for n in names],
        n_extra.alias("n_extra"),
    )


def split_segments_expr(
    df: DataFrame, pattern: str, text_col: str = "text"
) -> DataFrame:
    """The built-in-Column twin of :class:`SplitSegments` — regexp
    split + filter + posexplode, fully JVM-side (the production path
    for a 100-TB corpus; the UDTF is the API-surface form). Emits the
    same (seg_idx, segment, n_tokens) rows appended to ``df``'s other
    columns."""
    parts = F.filter(
        F.split(F.col(text_col), pattern), lambda x: x != F.lit("")
    )
    keep = [c for c in df.columns if c != text_col]
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(*keep, F.posexplode(parts).alias("seg_idx", "segment"))
        .select(
            *keep,
            F.col("seg_idx").cast("int"),
            "segment",
            F.size(F.split(F.col("segment"), " ", -1)).cast("int").alias("n_tokens"),
        )
    )
