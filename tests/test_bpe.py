"""Differential tests for the distributed BPE tokenizer.

Reference: a straight pure-Python transcription of the Sennrich et al.
(2016) algorithm (dict-based pair counting + per-word list rewrite),
compared against (a) ``bpe_train``'s distributed loop, (b) the
chained-JVM-fold encoder, and (c) the Arrow-kernel encoder.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xesmf_spark.bpe import (
    bpe_apply_merges,
    bpe_encode,
    bpe_train,
    bpe_word_counts,
    encode_word_python,
)


def _ref_train(word_freq: dict[str, int], n_merges: int):
    """Textbook BPE trainer: count adjacent pairs over the word-freq
    model, merge the (count desc, pair asc) winner everywhere,
    greedy-left-to-right, repeat."""
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": cnt,
            }
        )
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wide wider widest new low"),
    (3, "aaa aaaa baa aab"),  # overlap-greedy stress: runs of 'a'
    (4, "low new wide aaa"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _word_freq(docs_rows):
    wf: dict[str, int] = {}
    for _, text in docs_rows:
        for w in text.split():
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_bpe_train_matches_reference(spark, docs):
    ref_merges, _ = _ref_train(_word_freq(CORPUS), 10)
    got = bpe_train(docs, n_merges=10)
    assert got == ref_merges


def test_bpe_train_zero_and_exhaustion(spark, docs):
    assert bpe_train(docs, n_merges=0) == []
    # single-word corpus fully merges then stops early (no pairs left)
    one = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    merges = bpe_train(one, n_merges=5)
    assert [m["merged"] for m in merges] == ["ab"]  # then no pairs remain


def test_bpe_train_incremental_equals_full_recount(spark):
    """The delta-maintained pair table (incremental=True) must produce
    the EXACT same merge list — ranks, pairs, counts — as the
    full-recount twin, on a fuzzed corpus with repeated runs (overlap
    stress), shared prefixes/suffixes (pair-churn stress), and enough
    merges to cross a compact_every boundary."""
    import random

    rng = random.Random(1234)
    alphabet = "abcde"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
        for _ in range(60)
    ] + ["aaaa", "aaab", "abab", "lowlow"]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choices(words, k=rng.randint(1, 12)))) for i in range(25)],
        "doc_id long, text string",
    )
    full = bpe_train(docs, n_merges=20, incremental=False)
    inc = bpe_train(docs, n_merges=20, incremental=True, compact_every=4)
    assert inc == full
    # and both agree with the pure-Python reference
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    ref, _ = _ref_train(_word_freq(rows), 20)
    assert inc == ref


def test_word_counts(spark, docs):
    got = {r.word: r.freq for r in bpe_word_counts(docs).collect()}
    assert got == _word_freq(CORPUS)


def test_encoders_agree_fold_kernel_python(spark, docs):
    """All three encoders — chained JVM folds, Arrow kernel, plain
    Python — produce identical token streams, including on words the
    training corpus never saw."""
    merges = bpe_train(docs, n_merges=8)
    pairs = [(m["left"], m["right"]) for m in merges]
    unseen = spark.createDataFrame(
        [(100, "lowestest bnew aaaaaaa xyzzy"), (101, "")],
        "doc_id long, text string",
    )
    for frame in (docs, unseen):
        fold = {
            r.doc_id: r.tokens
            for r in bpe_encode(frame, merges, use_kernel=False).collect()
        }
        kern = {
            r.doc_id: r.tokens
            for r in bpe_encode(frame, merges, use_kernel=True).collect()
        }
        pyth = {
            r.doc_id: [
                t
                for w in r.text.lower().split()
                for t in encode_word_python(w, pairs)
            ]
            for r in frame.collect()
        }
        assert fold == kern == pyth


def test_encode_is_train_final_state(spark, docs):
    """Encoding the training corpus reproduces the trainer's final
    vocab state (the one-sweep-per-rank == priority-encode identity
    the oracle relies on)."""
    n = 6
    ref_merges, ref_vocab = _ref_train(_word_freq(CORPUS), n)
    merges = bpe_train(docs, n_merges=n)
    assert merges == ref_merges
    enc = bpe_encode(docs, merges, use_kernel=True)
    got_freq: dict[str, int] = {}
    for r in enc.select(F.explode("tokens").alias("t")).collect():
        got_freq[r.t] = got_freq.get(r.t, 0) + 1
    want_freq: dict[str, int] = {}
    wf = _word_freq(CORPUS)
    for w, syms in ref_vocab.items():
        for s in syms:
            want_freq[s] = want_freq.get(s, 0) + wf[w]
    assert got_freq == want_freq


def test_greedy_overlap_semantics():
    """'aaaa' under (a,a) -> ['aa','aa']; 'aaa' -> ['aa','a'] — the
    non-overlapping greedy sweep, not regex-replace-all."""
    assert encode_word_python("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert encode_word_python("aaa", [("a", "a")]) == ["aa", "a"]
    assert encode_word_python("aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]


def test_bpe_empty_and_degenerate_corpora(spark):
    """Empty corpus -> no merges; whitespace-only text -> no words;
    encode with zero merges -> plain character stream."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    empty = spark.createDataFrame([], schema)
    assert bpe_train(empty, n_merges=3) == []
    blank = spark.createDataFrame([(0, "   "), (1, "")], schema)
    assert bpe_train(blank, n_merges=3) == []
    docs = spark.createDataFrame([(0, "ab ba")], schema)
    for kernel in (False, True):
        enc = {r.doc_id: r.tokens for r in bpe_encode(docs, [], use_kernel=kernel).collect()}
        assert enc == {0: ["a", "b", "b", "a"]}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_train(docs, n_merges=-1)


def test_bpe_token_budget_integration(spark):
    """BPE token counts feed the budgeting/chunking stack: the encoded
    token count per doc equals the kernel encoding's length (the
    whitespace-token stand-in swaps out cleanly)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "low lower low"), (1, "newest newest")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=4)
    enc = bpe_encode(docs, merges, use_kernel=True)
    n = {r.doc_id: r.n_tok for r in enc.select("doc_id", F.size("tokens").alias("n_tok")).collect()}
    pairs = [(m["left"], m["right"]) for m in merges]
    for d, text in [(0, "low lower low"), (1, "newest newest")]:
        want = sum(len(encode_word_python(w, pairs)) for w in text.split())
        assert n[d] == want


def test_bpe_train_batched_equals_sequential(spark, docs):
    """batch_merges must emit a merge list BIT-IDENTICAL to the
    one-merge-per-round-trip trainer (the exactness argument on
    bpe_train): fixtures where overlap forces the batch to STOP early,
    ties at the bound force the TRIM, and created pairs (which the
    stop/trim guard against) dominate later ranks."""
    for m in (2, 3, 4, 8):
        assert bpe_train(docs, n_merges=10, batch_merges=m) == bpe_train(
            docs, n_merges=10
        )

    # overlap-chain stress: ranking is dominated by pairs sharing
    # symbols ((l,o) then (lo,w) then ...), so nearly every sweep stops
    # at its first or second candidate — the skip-free prefix rule
    chain = spark.createDataFrame(
        [(0, "wwww lowlow " * 3), (1, "low lowlow wow owl " * 2)],
        "doc_id long, text string",
    )
    for m in (2, 4):
        assert bpe_train(chain, n_merges=8, batch_merges=m) == bpe_train(
            chain, n_merges=8
        )

    # tie stress: equal counts at the bound exercise the strict trim
    # (a created pair may TIE the bound and win the (l, r) tie-break)
    ties = spark.createDataFrame(
        [(0, "ab ab cd cd ef ef abcd abcd")], "doc_id long, text string"
    )
    for m in (2, 3, 8):
        assert bpe_train(ties, n_merges=8, batch_merges=m) == bpe_train(
            ties, n_merges=8
        )


def test_bpe_train_batched_fuzz_and_validation(spark):
    """Fuzzed-corpus differential (the incremental test's corpus
    recipe) + parameter gates."""
    import random

    rng = random.Random(99)
    alphabet = "abcd"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        for _ in range(50)
    ] + ["aaaa", "abab", "baba", "abba"]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choices(words, k=rng.randint(1, 10)))) for i in range(20)],
        "doc_id long, text string",
    )
    seq = bpe_train(docs, n_merges=24)
    assert bpe_train(docs, n_merges=24, batch_merges=6) == seq
    # min_count interacts with the in-batch stop: both paths stop at
    # the same rank
    assert bpe_train(docs, n_merges=24, batch_merges=6, min_count=3) == bpe_train(
        docs, n_merges=24, min_count=3
    )
    with pytest.raises(ValueError, match="batch_merges"):
        bpe_train(docs, n_merges=2, batch_merges=0)
    with pytest.raises(ValueError, match="recount path"):
        bpe_train(docs, n_merges=2, batch_merges=2, incremental=True)
