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
