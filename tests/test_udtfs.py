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


def test_json_cols_polymorphic_schema(spark):
    """The analyze() surface: the SAME class yields a different output
    schema per call site, derived from the constant spec argument."""
    udtfs.register_json_cols(spark, "json_cols_t")
    spark.createDataFrame(
        [(1, '{"a": 7, "b": 2.5, "c": "x", "d": 1}')], "id long, j string"
    ).createOrReplaceTempView("jc_one")
    wide = spark.sql(
        "SELECT f.* FROM jc_one, LATERAL json_cols_t(j, 'a:bigint,b:double,c:string') f"
    )
    assert [(f.name, f.dataType.simpleString()) for f in wide.schema.fields] == [
        ("a", "bigint"),
        ("b", "double"),
        ("c", "string"),
        ("n_extra", "int"),
    ]
    narrow = spark.sql(
        "SELECT f.* FROM jc_one, LATERAL json_cols_t(j, 'd:bigint') f"
    )
    assert [f.name for f in narrow.schema.fields] == ["d", "n_extra"]
    assert wide.collect() == [(7, 2.5, "x", 1)]
    assert narrow.collect() == [(1, 3)]


def test_json_cols_matches_column_twin(spark):
    """Differential: UDTF == from_json/json_object_keys twin on edge
    cases — missing key, extra keys, malformed JSON, NULL, non-object
    JSON — and on the real events table."""
    frame = spark.createDataFrame(
        [
            (1, '{"k": 87}'),
            (2, '{"k": 0, "z": 1, "w": "s"}'),
            (3, '{"other": 5}'),
            (4, "not json {"),
            (5, None),
            (6, "[1, 2, 3]"),
            (7, '{"k": "stringy"}'),
            (8, "{}"),
        ],
        "id long, props string",
    )
    udtfs.register_json_cols(spark, "json_cols_t2")
    frame.createOrReplaceTempView("jc_edge")
    via_udtf = spark.sql(
        "SELECT e.id, f.k, f.n_extra "
        "FROM jc_edge e, LATERAL json_cols_t2(e.props, 'k:bigint') f"
    )
    via_expr = udtfs.json_cols_expr(frame, "k:bigint").select("id", "k", "n_extra")
    got = sorted((r.id, r.k, r.n_extra) for r in via_udtf.collect())
    assert got == sorted((r.id, r.k, r.n_extra) for r in via_expr.collect())
    assert (1, 87, 0) in got
    assert (2, 0, 2) in got
    assert (3, None, 1) in got  # requested key missing -> NULL, not no-row
    assert (8, None, 0) in got
    ids = {r[0] for r in got}
    assert 4 not in ids and 5 not in ids and 6 not in ids  # quarantined

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "props"
    )
    ev.createOrReplaceTempView("jc_events")
    real_udtf = spark.sql(
        "SELECT e.event_id, f.k, f.n_extra "
        "FROM jc_events e, LATERAL json_cols_t2(e.props, 'k:bigint') f"
    )
    real_expr = udtfs.json_cols_expr(ev, "k:bigint").select(
        "event_id", "k", "n_extra"
    )
    assert sorted(map(tuple, real_udtf.collect())) == sorted(
        map(tuple, real_expr.collect())
    )


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


def test_variant_path_matches_udtf_coercion(spark):
    """The VARIANT extraction (parse once, schema_of_variant-gated
    typed get — events_props_variant's shape) must agree with the
    JsonCols UDTF contract on every coercion edge: JSON string "7",
    bool, decimal, array, malformed, NULL, missing key. VARIANT's raw
    try_variant_get WOULD coerce "7"->7 and true->1; the schema gate
    is what makes the two paths agree."""
    from pyspark.sql import functions as F

    frame = spark.createDataFrame(
        [
            (1, '{"k": 87}'),
            (2, '{"k": -3, "z": 1}'),
            (3, '{"k": "7"}'),
            (4, '{"k": true}'),
            (5, '{"k": 7.5}'),
            (6, "[1, 2]"),
            (7, "nope {"),
            (8, None),
            (9, '{"x": 1}'),
        ],
        "id long, props string",
    )
    v = F.try_parse_json("props")
    via_variant = (
        frame.select("id", v.alias("v"))
        .filter(F.schema_of_variant("v").startswith("OBJECT<"))
        .select("id", F.try_variant_get("v", "$.k", "variant").alias("kv"))
        .select(
            "id",
            F.when(
                F.schema_of_variant("kv") == "BIGINT",
                F.try_variant_get("kv", "$", "bigint"),
            ).alias("k"),
        )
    )
    via_udtf = udtfs.json_cols_expr(frame, "k:bigint").select("id", "k")
    got = sorted((r.id, r.k) for r in via_variant.collect())
    want = sorted((r.id, r.k) for r in via_udtf.collect())
    assert got == want
    # rows 6/7/8 quarantined; string/bool/decimal k degrade to NULL
    assert got == [(1, 87), (2, -3), (3, None), (4, None), (5, None), (9, None)]
