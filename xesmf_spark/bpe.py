"""Distributed byte-pair-encoding (BPE) subword tokenizer.

Beyond-reference operator class (the reference, `xesmf`, is a regrid
engine with no text surface — see SURVEY.md §2D): a training-data
pipeline chunks / packs / budgets documents by TOKENS, and whitespace
tokens (``pipeline.chunk_tokens``/``pack_contexts``) are a stand-in —
real pipelines tokenize with a learned subword vocabulary.  This
module trains that vocabulary and encodes with it, Spark-first.

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public knowledge):

- **train**: start from the word-frequency table (NOT the corpus —
  the classic optimization: merging is per-word, so distinct words
  weighted by frequency carry exactly the same pair statistics at a
  tiny fraction of the rows).  Each of ``n_merges`` iterations finds
  the most frequent adjacent symbol pair and fuses every
  greedy-left-to-right non-overlapping occurrence of it in every
  word.
- **encode**: apply the learned merges to a word's character sequence
  in rank order, one greedy sweep per merge.  One sweep per rank is
  EXACT (not an approximation of the priority-queue encoder): a merge
  only creates strictly longer symbols, and every pair involving a
  created symbol was learned at a later rank, so an earlier pattern
  can never re-appear once its sweep has run.

Determinism contract: pair counts are exact BIGINT sums; the winning
pair is ``max(count)`` tie-broken by ``(left, right)`` ascending —
bit-for-bit reproducible on any engine, which is what lets the DuckDB
oracle replay the whole training loop relationally (positional symbol
table + run-parity greedy selection; see ``pipeline_oracle.bpe_*``).

Scale shapes (the 100-TB view):

- word-count extraction: one map-side-combinable groupBy on the
  corpus — the only corpus-sized shuffle in training;
- per merge iteration: one groupBy-SUM over the vocab table's
  exploded adjacent pairs (vocab rows ~= distinct words, orders of
  magnitude below corpus rows) + ONE 1-row ``TakeOrdered`` collect
  (the winning pair — the same bounded driver scalar discipline as
  ``relational.pagerank``'s N) + a pure-projection fold applying the
  merge; lineage is truncated per iteration with ``localCheckpoint``;
- encode: zero-shuffle projection — merges are a driver-side list
  (the model artifact, like PQ codebooks in ``similarity``) compiled
  either into chained JVM ``aggregate`` folds (``use_kernel=False``,
  whole-plan expression, best for small merge counts) or into one
  Arrow-batched ``mapInPandas`` kernel with per-batch word
  memoization (``use_kernel=True``, the large-vocab path: per
  DISTINCT word work, no join, no shuffle).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .pipeline import normalize_text

__all__ = [
    "bpe_train",
    "bpe_encode",
    "bpe_word_counts",
    "bpe_apply_merges",
    "encode_word_python",
]


def bpe_word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` over the corpus: normalize, split on spaces,
    explode, one map-side-combinable groupBy — the single
    corpus-sized shuffle of BPE training."""
    return (
        df.select(F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars(word: Column) -> Column:
    """Word -> array of single-character symbols (engine-portable:
    DuckDB's ``string_split(w, '')`` produces the same list)."""
    return F.filter(F.split(word, ""), lambda c: F.length(c) > 0)


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """One greedy left-to-right sweep fusing adjacent ``(left, right)``
    into ``left||right`` — a pure JVM ``aggregate`` fold, no UDF.

    Greedy non-overlap falls out of the fold: once a pair is fused the
    accumulator's last element is the (strictly longer) merged symbol,
    which can never equal ``left`` again, so "aaa" under (a,a) yields
    ["aa","a"] exactly like the reference BPE implementations."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_apply_merges(
    syms: Column, merges: Iterable[tuple[str, str]]
) -> Column:
    """Chain one ``_merge_fold`` sweep per merge, rank order — the
    pure-expression encoder.  Expression depth grows with the merge
    count; fine to a few dozen merges (whole plan stays JVM-side),
    beyond that use ``bpe_encode(use_kernel=True)``."""
    for left, right in merges:
        syms = _merge_fold(syms, left, right)
    return syms


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list — the model artifact —
    ``[{"rank", "left", "right", "merged", "pair_count"}, ...]``.

    Stops early only when no adjacent pair reaches ``min_count``
    (default 1 = run all requested iterations while any pair exists),
    so a fixed-``n_merges`` call is exactly replayable by the oracle.

    Per iteration: one exploded-pairs groupBy-SUM over the vocab
    table, one 1-row TakeOrdered collect (bounded driver scalar), one
    projection applying the sweep; ``localCheckpoint`` truncates the
    per-iteration lineage (the ``relational.pagerank`` discipline)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    words = (
        bpe_word_counts(df, text_col)
        .select("word", "freq", _chars(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[dict] = []
    cur = words
    for rank in range(1, n_merges + 1):
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1),"
                        " (x, i) -> struct(x AS l, syms[i + 1] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        # deterministic winner: max count, then (l, r) ascending —
        # TakeOrderedAndProject, not a full sort
        top = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top or top[0]["cnt"] < min_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": cnt,
            }
        )
        cur = cur.select(
            "word", "freq", _merge_fold(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def encode_word_python(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder for one word: the same one-greedy-sweep-per-
    rank loop, in plain Python — shared by the Arrow kernel and the
    differential pytest."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[dict] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    use_kernel: bool = False,
) -> DataFrame:
    """Encode each document with the learned merges ->
    ``(id_col, tokens array<string>)``.  Zero-shuffle projection on
    either path:

    - ``use_kernel=False``: per-word chained JVM folds inside a
      ``transform`` lambda — everything stays on the JVM, best for
      small merge lists (expression depth = merge count);
    - ``use_kernel=True``: one Arrow-batched ``mapInPandas`` kernel,
      per-batch ``{word: tokens}`` memoization so cost is per
      DISTINCT word (real corpora repeat words heavily) — the
      large-vocab path where a thousand chained folds would sink
      codegen.
    """
    pairs = [
        (m["left"], m["right"]) if isinstance(m, dict) else (m[0], m[1])
        for m in merges
    ]
    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda w: F.length(w) > 0
    )
    if not use_kernel:
        toks = F.flatten(
            F.transform(words, lambda w: bpe_apply_merges(_chars(w), pairs))
        )
        return df.select(F.col(id_col), toks.alias("tokens"))

    import re

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, True),
            StructField("tokens", ArrayType(StringType()), True),
        ]
    )
    norm = df.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__norm")
    )

    def kernel(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col = []
            for text in pdf["__norm"]:
                toks: list[str] = []
                for w in re.split(" ", text or ""):
                    if not w:
                        continue
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word_python(w, pairs)
                        memo[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
            yield pdf[[id_col]].assign(tokens=toks_col)

    return norm.mapInPandas(kernel, out_schema)
