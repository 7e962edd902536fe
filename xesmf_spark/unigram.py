"""Distributed unigram-LM (SentencePiece-family) subword tokenizer.

Beyond-reference operator class (the reference, ``xesmf``, is a regrid
engine with no text surface — SURVEY.md §2D): the standing twin to the
BPE trainer (``xesmf_spark.bpe``) — the OTHER subword vocabulary real
pipelines train.  Algorithm family: Kudo 2018, "Subword Regularization:
Improving Neural Network Translation Models with Multiple Subword
Candidates" (public knowledge) — a unigram language model over subword
pieces, fit by EM from a substring-seeded vocabulary, pruned to a
target size; encoding segments each word by Viterbi under the piece
scores.

This implementation is the HARD-EM (Viterbi-counts) variant: the
E-step assigns each distinct word its single best segmentation instead
of forward-backward expected counts.  Hard EM is the standard
deterministic approximation, and determinism is load-bearing here —
every float enters through one quantization (piece score =
``FLOOR(micro · ln(total/count))``, an exact BIGINT micro-nat — the
repo-wide integer-exactness discipline), every DP compares exact
BIGINT sums, and ties break structurally (backtrace takes the LONGEST
piece achieving the optimum at each step, right to left), so the whole
training loop is bit-for-bit replayable by the DuckDB oracle
(``pipeline_oracle.unigram_train_sql`` — recursive-CTE Viterbi, an
independent second formulation, the ``bpe_train`` oracle discipline).

Scale shapes (the 100-TB view):

- word-count extraction: the ONE corpus-sized shuffle (shared
  ``bpe_word_counts``);
- seed: substring explode over DISTINCT words + one keyed groupBy-SUM;
  top-``n_seed`` selection is TakeOrderedAndProject (no global sort);
- per EM iteration: E-step = one Arrow-batched ``mapInPandas`` pass
  over the distinct-word table (per-word integer Viterbi against the
  broadcast score dict — the model artifact, like PQ codebooks /
  BPE merge lists); M-step = ONE keyed count shuffle (map-side
  combinable groupBy-SUM on piece) + a bounded ``≤ |vocab|``-row
  collect for the next iteration's scores.  No per-piece driver loop,
  no global sort, nothing corpus-sized after the word count;
- encode: zero-shuffle projection — per-word Viterbi in an Arrow
  kernel with per-batch word memoization (cost per DISTINCT word).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import bpe_word_counts
from .pipeline import normalize_text

__all__ = [
    "unigram_seed",
    "unigram_em_counts",
    "unigram_train",
    "unigram_encode",
    "viterbi_segment_python",
]

MICRO = 1_000_000
#: score for a vocab piece with zero Viterbi count (kept single chars
#: only — multi-char pieces with zero count are dropped): "very rare",
#: dominated by any real path but finite and engine-replayable
RARE_SCORE = 50 * MICRO
#: unreachable-prefix sentinel for the DP (never surfaces while every
#: single character is in the vocab); small enough that sentinel +
#: per-step scores cannot overflow BIGINT on either engine
_INF = 10**15


def unigram_seed(
    words: DataFrame, max_piece_len: int = 4, n_seed: int = 256
) -> DataFrame:
    """Seed vocabulary ``(piece, cnt)`` from substring frequencies of
    the distinct-word table: every substring of length 1..max_piece_len
    at every position, weighted by word freq (overlapping occurrences
    each count).  Multi-char pieces keep the top ``n_seed`` by
    ``(cnt DESC, piece ASC)`` — a TakeOrderedAndProject, never a global
    sort; ALL single characters are kept unconditionally (required
    coverage, the SentencePiece character-coverage analogue)."""
    w = F.col("word")
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_piece_len), F.length(w))),
            lambda l: F.transform(
                F.sequence(F.lit(0), F.length(w) - l),
                lambda i: w.substr(i + F.lit(1), l),
            ),
        )
    )
    counts = (
        words.select("freq", F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    multi = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(n_seed)
    )
    singles = counts.filter(F.length("piece") == 1)
    return multi.unionAll(singles)


def _score_vocab(vocab_counts: DataFrame, micro: int = MICRO, total: int | None = None) -> DataFrame:
    """``(piece, cnt)`` -> ``(piece, cnt, score)``: micro-nat
    ``FLOOR(micro · ln(total/cnt))`` over the vocab total; zero-count
    pieces (kept singles) get RARE_SCORE.  The ln runs JVM-side — the
    same libm pairing every ln-using oracle query in this repo is
    green under.  ``total`` may be passed by a caller that already
    holds the counts driver-side (exact integer sum == the agg —
    r16: saves one scalar-agg JOB per vocab rebuild, and for the
    un-materialized seed it saved a full re-execution of the seed
    aggregation); when omitted, one bounded scalar agg computes it."""
    if total is None:
        total = vocab_counts.agg(F.sum("cnt")).collect()[0][0] or 0
    return vocab_counts.select(
        "piece",
        "cnt",
        F.when(F.col("cnt") > 0, F.floor(
            F.lit(micro)
            * F.log(F.lit(float(total)) / F.col("cnt").cast("double"))
        )).otherwise(F.lit(RARE_SCORE)).cast("long").alias("score"),
    )


def _scored_rows_df(spark, rows: list, micro: int = MICRO) -> DataFrame:
    """Score a DRIVER-side ``[(piece, cnt), ...]`` vocab: the total is
    the exact integer sum of the rows in hand (identical to the
    scalar agg it replaces), so scoring costs ONE tiny JVM job (the
    ln still runs JVM-side for oracle parity) instead of two per
    rebuild (r16 — guide §5: the driver should not spawn jobs to
    learn what it already holds)."""
    total = sum(int(c) for _, c in rows)
    dfc = spark.createDataFrame(rows, "piece string, cnt long")
    return _score_vocab(dfc, micro, total=total)


def viterbi_segment_python(
    word: str, scores: dict[str, int], max_piece_len: int
) -> list[str]:
    """Reference segmenter for one word — the exact DP + tie-break the
    oracle replays: forward min-cost over exact ints, backtrace taking
    the LONGEST piece achieving the optimum at each step (right to
    left).  Shared by the Arrow kernels and the differential pytest."""
    L = len(word)
    dp = [0] + [_INF] * L
    for i in range(1, L + 1):
        best = _INF
        for l in range(1, min(max_piece_len, i) + 1):
            s = scores.get(word[i - l : i])
            if s is not None and dp[i - l] + s < best:
                best = dp[i - l] + s
        dp[i] = best
    out: list[str] = []
    i = L
    while i > 0:
        step = 1
        for l in range(min(max_piece_len, i), 0, -1):
            s = scores.get(word[i - l : i])
            if s is not None and dp[i - l] + s == dp[i]:
                step = l
                break
        out.append(word[i - step : i])
        i -= step
    return out[::-1]


def unigram_em_counts(
    words: DataFrame, scores: dict[str, int], max_piece_len: int
) -> DataFrame:
    """Hard-EM E+M step: Viterbi-segment every distinct word against
    the broadcast ``scores`` dict in one Arrow-batched ``mapInPandas``
    pass, emit its pieces weighted by word freq, and groupBy-SUM —
    the single keyed shuffle of the iteration.  Returns
    ``(piece, cnt)`` with cnt > 0 (unused pieces simply don't
    appear)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ps, ws = [], []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for piece in viterbi_segment_python(word, scores, max_piece_len):
                    ps.append(piece)
                    ws.append(int(freq))
            yield pd.DataFrame({"piece": ps, "w": ws})

    emitted = words.select("word", "freq").mapInPandas(
        kernel, "piece string, w long"
    )
    return emitted.groupBy("piece").agg(F.sum("w").alias("cnt"))


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    n_iters: int = 2,
    max_piece_len: int = 4,
    n_seed: int = 256,
    prune_to: int = 96,
    micro: int = MICRO,
) -> DataFrame:
    """Train the unigram-LM piece vocabulary; returns the final model
    table ``(piece, freq, score_micronat)``.

    Loop: substring seed -> ``n_iters`` hard-EM rounds (each: Viterbi
    counts under the previous scores; multi-char pieces with zero
    count DROP — the continuous pruning; every single char is KEPT,
    zero-count ones at RARE_SCORE) -> one explicit pruning round
    (multi-char pieces cut to the top ``prune_to`` by
    ``(cnt DESC, piece ASC)``) -> a final E-step whose counts/scores
    are the emitted model.  Every selection is deterministic and the
    DuckDB oracle replays the WHOLE loop relationally
    (recursive-CTE forward DP + longest-tie backtrace per iteration
    — ``pipeline_oracle.unigram_train_sql``)."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if max_piece_len < 2:
        raise ValueError(f"max_piece_len must be >= 2, got {max_piece_len}")
    words = bpe_word_counts(df, text_col).localCheckpoint(eager=True)
    spark = words.sparkSession

    # r16: collect the seed COUNTS once (bounded: n_seed + |charset|)
    # and score from driver rows — the old _score_vocab(seed) ran the
    # whole substring-explode aggregation TWICE (once under the total
    # agg, once under the collect of the scored frame)
    seed_rows = unigram_seed(words, max_piece_len, n_seed).collect()
    vocab_rows = _scored_rows_df(
        spark, [(r["piece"], int(r["cnt"])) for r in seed_rows], micro
    ).collect()
    singles = sorted(r["piece"] for r in vocab_rows if len(r["piece"]) == 1)

    def _rebuild(counts_rows: list, keep_multi: set | None) -> list:
        """Driver-side vocab rebuild from collected (piece, cnt) rows:
        multi-char cnt>0 (optionally restricted to keep_multi) +
        all singles (absent -> cnt 0)."""
        by_piece = {r["piece"]: int(r["cnt"]) for r in counts_rows}
        rows = [
            (p, c)
            for p, c in by_piece.items()
            if len(p) >= 2 and (keep_multi is None or p in keep_multi)
        ]
        rows += [(s, by_piece.get(s, 0)) for s in singles]
        return rows

    def _scored_df(rows: list) -> DataFrame:
        return _scored_rows_df(spark, rows, micro)

    for _ in range(n_iters):
        scores = {r["piece"]: int(r["score"]) for r in vocab_rows}
        counts = unigram_em_counts(words, scores, max_piece_len)
        vocab_rows = _scored_df(_rebuild(counts.collect(), None)).collect()

    # explicit pruning round: multi-char pieces cut to the strongest
    # prune_to by the SAME deterministic order the seed used
    multis = sorted(
        ((int(r["cnt"]), r["piece"]) for r in vocab_rows if len(r["piece"]) >= 2),
        key=lambda t: (-t[0], t[1]),
    )
    keep = {p for _, p in multis[:prune_to]}
    pruned_rows = [
        (r["piece"], int(r["cnt"]))
        for r in vocab_rows
        if len(r["piece"]) == 1 or r["piece"] in keep
    ]
    pruned = _scored_rows_df(spark, pruned_rows, micro)
    scores = {r["piece"]: int(r["score"]) for r in pruned.collect()}

    # final E-step = the emitted model's counts and scores
    final_counts = unigram_em_counts(words, scores, max_piece_len)
    out_rows = _rebuild(final_counts.collect(), keep)
    return _scored_df(out_rows).select(
        "piece",
        F.col("cnt").alias("freq"),
        F.col("score").alias("score_micronat"),
    )


def unigram_encode(
    df: DataFrame,
    vocab,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
) -> DataFrame:
    """Encode each document with a trained vocabulary ->
    ``(id_col, tokens array<string>)``: per-word Viterbi in one
    Arrow-batched ``mapInPandas`` kernel with per-batch word
    memoization — zero shuffle, cost per DISTINCT word (the
    ``bpe_encode(use_kernel=True)`` shape).  ``vocab`` is the trained
    model: rows/dicts with ``piece`` and a score column, or a
    ``{piece: score}`` mapping."""
    if isinstance(vocab, dict):
        scores = {p: int(s) for p, s in vocab.items()}
    else:
        scores = {
            r["piece"]: int(r["score_micronat"] if "score_micronat" in r else r["score"])
            for r in vocab
        }

    import re

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, True),
            StructField("tokens", ArrayType(StringType()), True),
        ]
    )
    norm = df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__norm"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                        enc = viterbi_segment_python(w, scores, max_piece_len)
                        memo[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
            yield pdf[[id_col]].assign(tokens=toks_col)

    return norm.mapInPandas(kernel, out_schema)
