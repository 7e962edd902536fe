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
