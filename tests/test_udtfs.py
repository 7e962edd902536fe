"""UDTF surface: the Python table function and its JVM Column twin
must agree row-for-row (the same proof pattern as the UDAF query)."""

from pyspark.sql import functions as F

from xesmf_spark import udtfs


def _rows(df):
    return sorted(
        (r.doc_id, r.seg_idx, r.segment, r.n_tokens)
        for r in df.collect()
    )


def test_udtf_matches_column_twin(spark):
    """Edge cases: adjacent delimiters (empty segment skipped, idx
    dense), leading/trailing delimiters, multi-space token counts,
    no-delimiter docs (single segment), NULL text (no rows)."""
    docs = spark.createDataFrame(
        [
            (1, "x y a p q a r"),
            (2, " a starts a a ends a "),
            (3, "no delimiter here"),
            (4, "double  space a tail"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    udtfs.register_split_segments(spark, "split_segments_t")
    docs.createOrReplaceTempView("udtf_docs_t")
    via_udtf = spark.sql(
        "SELECT d.doc_id, s.seg_idx, s.segment, s.n_tokens "
        "FROM udtf_docs_t d, LATERAL split_segments_t(d.text, '[ ]a[ ]') s"
    )
    via_expr = udtfs.split_segments_expr(docs, "[ ]a[ ]")
    got = _rows(via_udtf)
    assert got == _rows(via_expr)
    assert (1, 0, "x y", 2) in got and (1, 1, "p q", 2) in got
    assert (3, 0, "no delimiter here", 3) in got
    assert (4, 0, "double  space", 3) in got  # empty token counted, both engines
    assert not any(r[0] == 5 for r in got)  # NULL text -> no rows
    # seg_idx dense per doc
    for d in {r[0] for r in got}:
        idxs = sorted(r[1] for r in got if r[0] == d)
        assert idxs == list(range(len(idxs)))


def test_udtf_sentence_pattern(spark):
    """The documented sentence delimiter (ASCII whitespace class) on
    punctuated text: trailing period without following whitespace stays
    attached; empty segments between '. ' runs are skipped."""
    docs = spark.createDataFrame(
        [(1, "First one. Second two.  Third."), (2, "solo")],
        "doc_id long, text string",
    )
    out = _rows(udtfs.split_segments_expr(docs, udtfs.SENT_SPLIT))
    assert out == [
        (1, 0, "First one", 2),
        (1, 1, "Second two", 2),
        (1, 2, "Third.", 1),
        (2, 0, "solo", 1),
    ]
