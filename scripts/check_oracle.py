#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()``
twin on DuckDB at the same sf, compare row count, column names, and
(order-insensitively) the values.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def nonscalar_columns(schema):
    """Columns whose type the DRIVER's canonicalizer cannot sort.

    The driver hashes query outputs via pandas ``sort_values``, which
    raises ``unhashable type`` on Array/Map/Struct cells — r8 lost
    ``documents_inverted_index`` to exactly this while the local gate
    (which canonicalizes lists itself) stayed green. Parity demands the
    local gate reject what the driver would reject: any complex-typed
    output column fails here, regardless of values."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def canon(rows, cols):
    """Sort columns by name, then rows; compare values at FULL repr
    precision with a python-type tag. The driver's hash is type-tagged
    and exact — r5's %.9g smoothing masked a last-ulp double divergence
    (local PASS, driver FAIL), so no float rounding here."""
    order = sorted(range(len(cols)), key=lambda k: cols[k])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "f:nan"
            return f"f:{v!r}"
        if isinstance(v, bool):
            return f"b:{v}"
        if isinstance(v, int):
            return f"i:{v}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return f"{type(v).__name__[:1]}:{v}"

    return sorted(tuple(norm(r[k]) for k in order) for r in rows)


# DuckDB result types that hash differently from the Spark type even when
# every value is numerically identical (the driver's hash is type-tagged).
# SUM(BIGINT) silently returns HUGEINT in DuckDB — r5 lost two queries to
# exactly this; oracles must CAST such aggregates back.
def typeof_audit(con, sql, spark_dtypes):
    """Return [(col, duck_type, spark_type)] for type pairings the
    driver would hash-mismatch on."""
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    sd = dict(spark_dtypes)
    bad = []
    for col, dtype, *_ in rows:
        st = sd.get(col, "?")
        d = dtype.upper()
        # int WIDTH differences are fine — the driver normalizes them
        # (r5 evidence: INTEGER-vs-bigint and BIGINT-vs-int queries were
        # driver-green). Only flag types whose pandas/arrow VALUE
        # representation changes: HUGEINT lands as float64, DECIMAL as
        # object, FLOAT truncates to 32-bit.
        if "HUGEINT" in d and not st.startswith("decimal"):
            bad.append((col, dtype, st))
        elif d.startswith("DECIMAL") and not st.startswith("decimal"):
            bad.append((col, dtype, st))
        elif d == "FLOAT" and st == "double":
            bad.append((col, dtype, st))
    return bad


def main():
    # --record FILE: write a full-surface JSON verdict (query ->
    # pass/fail + row counts) alongside the console report. The driver
    # gate only covers the first 50 registry entries; this record is
    # the committed evidence that the rotation TAIL was verified too
    # (r6 verdict: tail queries had no per-round driver verdict).
    argv = list(sys.argv[1:])
    record_path = None
    if "--record" in argv:
        i = argv.index("--record")
        record_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as E
    from xesmf_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=8, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = E.queries(), E.oracle_sql()
    n_pass = n_fail = 0
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        complex_cols = nonscalar_columns(sdf.schema)
        if complex_cols:
            n_fail += 1
            print(f"  {name}: FAIL complex-typed output columns {complex_cols} — the driver's canonicalizer cannot sort Array/Map/Struct; stringify them")
            record[name] = {"pass": False, "complex_cols": complex_cols}
            continue
        srows = [tuple(r) for r in sdf.collect()]
        if name not in os_:
            print(f"  {name}: rows={len(srows)} (no oracle — rows-only check)")
            # pass: None — an oracle-less query is VALUE-UNCHECKED;
            # pass: true here would let a full-surface record
            # over-claim (r9 ADVICE). Excluded from the pass count.
            record[name] = {"pass": None, "rows_spark": len(srows), "rows_only": True}
            continue
        res = con.execute(os_[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = canon(srows, scols) == canon(drows, dcols) if ok_cols and ok_count else False
        type_bad = typeof_audit(con, os_[name], sdf.dtypes) if ok_cols else []
        status = "PASS" if (ok_cols and ok_count and ok_vals and not type_bad) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"  {name}: {status} rows={len(srows)}/{len(drows)} cols_ok={ok_cols} vals_ok={ok_vals}")
        record[name] = {
            "pass": status == "PASS",
            "rows_spark": len(srows),
            "rows_oracle": len(drows),
            "cols_ok": ok_cols,
            "vals_ok": ok_vals,
        }
        if status == "FAIL":
            for col, dt, st in type_bad:
                print(f"    TYPE: {col} duck={dt} spark={st} (hash would be type-tagged)")
            if not ok_cols:
                print(f"    spark cols: {sorted(scols)}\n    duck  cols: {sorted(dcols)}")
            elif ok_count:
                a, b = canon(srows, scols), canon(drows, dcols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diffs:
                    print(f"    spark={x}\n    duck ={y}")
    print(f"{n_pass} pass, {n_fail} fail")
    incomplete = False
    if record_path:
        import json

        with open(record_path, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail, "queries": record},
                f,
                indent=1,
            )
        print(f"record written: {record_path}")
        # A record that silently covers only part of the registry is
        # worse than none: r8 committed a "full-surface" record written
        # before the last three registry additions, leaving two queries
        # with zero committed evidence. A --record run is only a valid
        # full-surface record when its key set equals queries().
        missing = sorted(set(qs) - set(record))
        extra = sorted(set(record) - set(qs))
        if missing or extra:
            incomplete = True
            print(f"RECORD INCOMPLETE: missing={missing} extra={extra} — not a full-surface record")
    spark.stop()
    sys.exit(2 if incomplete else (1 if n_fail else 0))


if __name__ == "__main__":
    main()
