"""Differential tests for the distributed unigram-LM tokenizer.

Reference: a straight dict-based transcription of the same hard-EM
loop (substring seed -> Viterbi counts -> rescore -> prune), kept
deliberately independent of the Spark implementation's plumbing."""

from __future__ import annotations

import math

import pytest

from xesmf_spark.unigram import (
    MICRO,
    RARE_SCORE,
    unigram_em_counts,
    unigram_encode,
    unigram_seed,
    unigram_train,
    viterbi_segment_python,
)

CORPUS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "wide wider widest new low"),
    (3, "aaa aaaa baa aab"),
    (4, "low new wide aaa"),
    (5, "internationalization and internationalism"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _word_freq(rows):
    wf: dict[str, int] = {}
    for _, text in rows:
        for w in text.split():
            wf[w] = wf.get(w, 0) + 1
    return wf


def _ref_seed(wf, P, n_seed):
    cnt: dict[str, int] = {}
    for w, f in wf.items():
        for l in range(1, P + 1):
            for i in range(len(w) - l + 1):
                p = w[i : i + l]
                cnt[p] = cnt.get(p, 0) + f
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:n_seed]
    singles = [(p, c) for p, c in cnt.items() if len(p) == 1]
    return dict(multi + singles)


def _ref_score(counts):
    total = sum(counts.values())
    return {
        p: (
            math.floor(MICRO * math.log(float(total) / float(c)))
            if c > 0
            else RARE_SCORE
        )
        for p, c in counts.items()
    }


def _ref_em(wf, scores, P):
    out: dict[str, int] = {}
    for w, f in wf.items():
        for piece in viterbi_segment_python(w, scores, P):
            out[piece] = out.get(piece, 0) + f
    return out


def _ref_train(wf, n_iters, P, n_seed, prune_to):
    counts = _ref_seed(wf, P, n_seed)
    singles = sorted(p for p in counts if len(p) == 1)
    scores = _ref_score(counts)
    for _ in range(n_iters):
        em = _ref_em(wf, scores, P)
        counts = {p: c for p, c in em.items() if len(p) >= 2}
        counts.update({s: em.get(s, 0) for s in singles})
        scores = _ref_score(counts)
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:prune_to]
    keep = {p for p, _ in multis}
    pruned = {p: c for p, c in counts.items() if len(p) == 1 or p in keep}
    scores = _ref_score(pruned)
    em = _ref_em(wf, scores, P)
    final = {p: c for p, c in em.items() if len(p) >= 2}
    final.update({s: em.get(s, 0) for s in singles})
    return {p: (c, _ref_score(final)[p]) for p, c in final.items()}


def test_viterbi_reference_properties():
    scores = {"a": 10, "b": 12, "c": 30, "ab": 15, "bc": 20, "abab": 100}
    assert viterbi_segment_python("abab", scores, 4) == ["ab", "ab"]
    assert viterbi_segment_python("abc", scores, 4) == ["a", "bc"]
    # longest-tie rule: make ab == a+b exactly, the longer piece wins
    tie = {"a": 10, "b": 10, "ab": 20}
    assert viterbi_segment_python("ab", tie, 4) == ["ab"]
    # missing multi-char coverage falls back to singles
    assert viterbi_segment_python("ba", scores, 4) == ["b", "a"]


def test_unigram_seed_matches_reference(spark, docs):
    from xesmf_spark.bpe import bpe_word_counts

    wf = _word_freq(CORPUS)
    words = bpe_word_counts(docs)
    got = {r.piece: r.cnt for r in unigram_seed(words, 4, 64).collect()}
    assert got == _ref_seed(wf, 4, 64)


def test_unigram_em_counts_match_reference(spark, docs):
    from xesmf_spark.bpe import bpe_word_counts

    wf = _word_freq(CORPUS)
    scores = _ref_score(_ref_seed(wf, 4, 64))
    words = bpe_word_counts(docs)
    got = {r.piece: r.cnt for r in unigram_em_counts(words, scores, 4).collect()}
    assert got == _ref_em(wf, scores, 4)


def test_unigram_train_matches_reference_incl_pruning(spark, docs):
    """Full-loop differential, n_iters x EM + the explicit pruning
    round: piece set, counts, and micro-nat scores all bit-equal."""
    wf = _word_freq(CORPUS)
    got = {
        r.piece: (r.freq, r.score_micronat)
        for r in unigram_train(
            docs, n_iters=2, max_piece_len=4, n_seed=48, prune_to=12
        ).collect()
    }
    assert got == _ref_train(wf, 2, 4, 48, 12)
    # pruning actually bit: no more than prune_to multi-char pieces
    assert sum(1 for p in got if len(p) >= 2) <= 12
    # singles all present (coverage guarantee)
    chars = {c for w in wf for c in w}
    assert chars <= set(got)


def test_unigram_encode_roundtrip(spark, docs):
    """Encode = per-word Viterbi under the trained model; corpus piece
    frequencies equal the trainer's final E-step counts (the encode
    oracle identity), and concatenating tokens rebuilds each word."""
    model = unigram_train(docs, n_iters=1, max_piece_len=4, n_seed=48, prune_to=16)
    rows = model.collect()
    enc = unigram_encode(docs, rows)
    out = {r.doc_id: r.tokens for r in enc.collect()}
    for did, text in CORPUS:
        assert "".join(out[did]) == text.replace(" ", "")
    # token freq == model freq for every used piece
    freq: dict[str, int] = {}
    for toks in out.values():
        for t in toks:
            freq[t] = freq.get(t, 0) + 1
    model_freq = {r.piece: r.freq for r in rows}
    for p, c in freq.items():
        assert model_freq[p] == c


def test_unigram_train_validation(spark, docs):
    with pytest.raises(ValueError, match="n_iters"):
        unigram_train(docs, n_iters=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_train(docs, max_piece_len=1)


def test_unigram_fuzzed_differential(spark):
    import random

    rng = random.Random(7)
    alphabet = "abcde"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
        for _ in range(60)
    ] + ["aaaa", "abab", "edcba"]
    rows = [
        (i, " ".join(rng.choices(words, k=rng.randint(1, 12)))) for i in range(25)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf = _word_freq(rows)
    got = {
        r.piece: (r.freq, r.score_micronat)
        for r in unigram_train(
            docs, n_iters=3, max_piece_len=4, n_seed=96, prune_to=24
        ).collect()
    }
    assert got == _ref_train(wf, 3, 4, 96, 24)
