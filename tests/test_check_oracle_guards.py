"""Harness-parity guards for scripts/check_oracle.py.

Round-8 lesson: the LOCAL gate passed ``documents_inverted_index``
(its canon() stringifies lists) while the DRIVER's pandas
canonicalizer crashed on the ArrayType column — a local green that was
a driver red.  These tests pin the two guards that close that gap:

1. any query output with an Array/Map/Struct column is REJECTED
   locally, exactly as the driver would reject it;
2. a ``--record`` run whose key set differs from the live
   ``__spark_entry__.queries()`` registry exits nonzero (r8 committed
   a "full-surface" record that silently predated three registry
   additions).
"""

import importlib.util
import os
import sys

import pytest

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_check_oracle():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(REPO, "scripts", "check_oracle.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_nonscalar_columns_flags_array_map_struct(spark):
    co = _load_check_oracle()
    df = spark.sql(
        "SELECT 1 AS a, array(1,2) AS arr, map('k', 1) AS m, "
        "named_struct('x', 1) AS st, 'ok' AS s"
    )
    assert co.nonscalar_columns(df.schema) == ["arr", "m", "st"]
    clean = spark.sql("SELECT 1 AS a, 'b' AS b, 1.5 AS c")
    assert co.nonscalar_columns(clean.schema) == []


def test_inverted_index_query_output_is_scalar(spark):
    """The r8 offender specifically: documents_inverted_index must now
    emit postings_sample as a comma-joined STRING, not ArrayType."""
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata missing")
    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    co = _load_check_oracle()
    df = E.queries()["documents_inverted_index"](spark, sf_dir)
    assert co.nonscalar_columns(df.schema) == []
    row = df.orderBy(F.desc("df")).first()
    assert isinstance(row.postings_sample, str) and "," in row.postings_sample


def test_record_completeness_exit_code(tmp_path):
    """--record with a query subset must exit 2 (incomplete record),
    and the canonical full-record path is the only zero-exit one.
    Runs the real script on ONE query to keep it fast."""
    import subprocess

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata missing")
    rec = str(tmp_path / "partial.json")
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "check_oracle.py"),
            "--record",
            rec,
            sf_dir,
            "tpch_q1",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # isolate Derby metastore from other runs
    )
    assert p.returncode == 2, p.stdout + p.stderr
    assert "RECORD INCOMPLETE" in p.stdout


def test_oracle_sql_regex_literals_reach_duckdb_intact(spark):
    """r13 ADVICE regression: a '\\s+' doubled INSIDE an r\"\"\" oracle
    string ships DuckDB the two-character regex backslash-backslash-s
    (a no-op on whitespace), silently diverging from Spark's tokens()
    on any text with consecutive spaces/tabs.  Testdata has ZERO
    consecutive-whitespace docs, so the driver gate cannot catch this —
    this fixture does.

    Two layers: (1) no compiled oracle string may contain the broken
    double-backslash value; (2) the house normalizer collapses messy
    whitespace IDENTICALLY in Spark and DuckDB on a fixture doc that
    actually exercises it."""
    import duckdb

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    for name, sql in E.oracle_sql().items():
        assert "\\\\s+" not in sql, (
            f"oracle {name!r} ships a literal double-backslash regex to DuckDB"
        )

    from xesmf_spark.pipeline import tokens

    messy = "Hello  world\tand\n\nagain  \t mixed"
    got_spark = (
        spark.createDataFrame([(messy,)], "text string")
        .select(tokens(F.col("text")).alias("t"))
        .first()
        .t
    )
    got_duck = duckdb.sql(
        "SELECT string_split(lower(trim(regexp_replace(?, '\\s+', ' ', 'g'))), ' ')",
        params=[messy],
    ).fetchone()[0]
    assert got_spark == got_duck == ["hello", "world", "and", "again", "mixed"]
