import hashlib

import pytest
from pyspark.sql import functions as F

from xesmf_spark.search import (
    bm25_topk,
    cms_build,
    cms_estimates,
    term_counts,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_counts_normalizes_and_counts(spark):
    d = _docs(spark, [(1, "  A a\tb  "), (2, "b c")])
    got = {(r.doc_id, r.term): r.tf for r in term_counts(d, "doc_id", "text").collect()}
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "b"): 1, (2, "c"): 1}


def test_tfidf_ranks_distinctive_term_first(spark):
    """A term unique to one doc outranks corpus-wide terms there; ties
    break by term ASC; at most k rows per doc."""
    d = _docs(
        spark,
        [
            (1, "common common unique"),
            (2, "common other"),
            (3, "common other"),
        ],
    )
    rows = tfidf_top_terms(d, "doc_id", "text", k=2).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.score_micro, r.term))
    top1 = sorted(per_doc[1], reverse=True)[0]
    assert top1[1] == "unique"
    assert all(len(v) <= 2 for v in per_doc.values())
    # idf of a term in every doc is ln(1) = 0 => score 0
    assert any(s == 0 for s, t in per_doc[1] if t == "common") or all(
        t != "common" for _, t in per_doc[1]
    )


def _bm25_replay(rows, terms, k1m=1_200_000, bm=750_000):
    """Pure-python replay of the documented integer recurrence."""
    import math

    M = 1_000_000
    toks = {i: t.lower().split() for i, t in rows}
    n = len(toks)
    tot = sum(len(v) for v in toks.values())
    avg = (M * tot) // n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for i, v in toks.items():
        s = 0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or dfs[t] == 0:
                continue
            idf = math.floor(M * math.log((2 * n + 2) / float(2 * dfs[t] + 1)))
            norm = (M - bm) + (bm * len(v) * M) // avg
            den = tf * M + (k1m * norm) // M
            s += (idf * tf * (k1m + M)) // den
        if s:
            scores[i] = s
    return scores


def test_bm25_matches_integer_replay(spark):
    rows = [
        (1, "spark merge filter spark"),
        (2, "spark table row"),
        (3, "agg sort window"),
        (4, "merge merge merge filter spark table value"),
    ]
    d = _docs(spark, rows)
    got = {
        r.doc_id: r.score_micro
        for r in bm25_topk(d, ["spark", "merge", "filter"], "doc_id", "text", k=10).collect()
    }
    assert got == _bm25_replay(rows, ["spark", "merge", "filter"])
    assert 3 not in got  # no query term => no row


def _cms_replay(stream, terms, d=4, w=64):
    def h(i, t):
        return int(hashlib.md5(f"{i}:{t}".encode()).hexdigest()[:8], 16) % w

    counters = {}
    for t in stream:
        for i in range(d):
            key = (i, h(i, t))
            counters[key] = counters.get(key, 0) + 1
    return {
        t: min(counters.get((i, h(i, t)), 0) for i in range(d)) for t in terms
    }


def test_cms_estimates_match_replay_and_upper_bound(spark):
    """The 4x64 sketch reproduces the pure-python replay exactly, and
    the CM one-sided bound holds for every probe including an absent
    key; a deliberately tiny width (w=2) forces collisions and the
    bound still holds."""
    stream = (["hot"] * 20) + ["a", "b", "c", "d", "e"] * 3 + ["rare"]
    items = spark.createDataFrame([(t,) for t in stream], "term string")
    probes = ["hot", "rare", "absent", "a"]
    exact = {t: stream.count(t) for t in probes}
    for w in (64, 2):
        counters = cms_build(items, "term", d=4, w=w)
        got = {
            r.term: r.est_n
            for r in cms_estimates(spark, counters, probes, d=4, w=w).collect()
        }
        assert got == _cms_replay(stream, probes, d=4, w=w)
        for t in probes:
            assert got[t] >= exact[t]


def test_bm25_empty_corpus_returns_empty(spark):
    out = bm25_topk(
        spark.createDataFrame([], "doc_id long, text string"), ["spark"]
    )
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["doc_id", "score_micro"]


def test_hybrid_rrf_union_semantics_and_exact_points(spark):
    """RRF fusion: integer points 1e9 // (k + rank) summed per
    (query, neighbor); docs surfaced by only one leg contribute one
    term; ties break by neighbor id; topk enforced per query."""
    from xesmf_spark.search import hybrid_rrf

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id long, neighbor_id long, rank long",
    )
    sem = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (2, 21, 1)],
        "query_id long, neighbor_id long, rank long",
    )
    out = {
        (r.query_id, r.neighbor_id): (r.rrf_score, r.rank)
        for r in hybrid_rrf(lex, sem, k_rrf=60, topk=3).collect()
    }
    p = lambda r: 1_000_000_000 // (60 + r)  # noqa: E731
    # doc 11 fused from both legs — must dominate query 1
    assert out[(1, 11)] == (p(2) + p(1), 1)
    assert out[(1, 10)][0] == p(1)
    assert out[(1, 13)][0] == p(2)
    # one-leg docs rank by points then id: 10 (p1) > 13 (p2) > 12 (p3, cut)
    assert out[(1, 10)][1] == 2 and out[(1, 13)][1] == 3
    assert (1, 12) not in out  # topk=3 cut
    # query 2: equal single-leg points — tie broken by neighbor asc
    assert out[(2, 20)] == (p(1), 1) and out[(2, 21)] == (p(1), 2)


def test_textrank_query_ranks_hub_word_first(spark, tmp_path):
    """documents_textrank (the composition query): a word adjacent to
    many distinct words outranks words with one neighbor; stopwords
    and short tokens never appear; top-k ordering is (rank DESC,
    token ASC)."""
    import pyspark.sql.functions as F

    from xesmf_spark.queries import documents_textrank

    rows = [
        (0, "alpha bridge beta"),
        (1, "gamma bridge delta"),
        (2, "epsilon bridge zeta"),
        (3, "alpha beta"),
        (4, "the of is on xx yy"),  # stopwords + short tokens only
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = documents_textrank(spark, str(tmp_path)).collect()
    toks = [r["token"] for r in out]
    assert toks[0] == "bridge"  # 6 distinct neighbors
    assert "the" not in toks and "xx" not in toks
    ranks = [(r["rank_micro"], r["token"]) for r in out]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))


def test_proximity_pairs_ordered_and_unordered(spark):
    """proximity_pairs: ordered gap window, min_gap/n_matches exact;
    unordered counts both directions; adjacency is max_gap=1."""
    from xesmf_spark.search import proximity_pairs

    docs = spark.createDataFrame(
        [
            (1, "merge the big join now merge join"),
            (2, "join then merge"),          # only b-before-a
            (3, "merge far far far far join"),  # gap 5 > 3
            (4, "no terms here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["min_gap"])
        for r in proximity_pairs(docs, "merge", "join", max_gap=3).collect()
    }
    # doc 1 positions: merge@0, join@3, merge@5, join@6 ->
    # ordered pairs within 3: (0,3), (5,6) -> 2 matches, min gap 1
    assert got == {1: (2, 1)}
    un = {
        r["doc_id"]: (r["n_matches"], r["min_gap"])
        for r in proximity_pairs(
            docs, "merge", "join", max_gap=3, ordered=False
        ).collect()
    }
    # doc 2: join@0, merge@2 -> |gap| 2
    assert un[2] == (1, 2) and un[1][0] >= 2
    phrase = {
        r["doc_id"]
        for r in proximity_pairs(docs, "merge", "join", max_gap=1).collect()
    }
    assert phrase == {1}
