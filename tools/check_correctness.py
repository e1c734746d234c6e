#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [jsonOut]

Reads each <verifyOutDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle_sql.json query in DuckDB over the same parquet tables, and
compares: row count, column names (sorted), and values (rows sorted, exact
for non-floats, exact-after-repr for floats). Prints per-query PASS/FAIL.
With a third argument, also writes a driver-style CORRECTNESS json
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) to that path.

Dev-only tool (python/duckdb are driver-side); never shipped in the jar.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_rows(rel):
    cols = [d[0] for d in rel.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return sorted(cols), sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    report = {}
    for name in sorted(oracle):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        report[name] = rec
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            rec["err"] = "no spark output"
            n_fail += 1
            continue
        try:
            spark_cols, spark_rows = table_rows(
                con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')"))
            ora_cols, ora_rows = table_rows(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            rec["err"] = str(e)
            n_fail += 1
            continue
        rec["spark_rows"] = len(spark_rows)
        rec["oracle_rows"] = len(ora_rows)
        rec["schema_match"] = spark_cols == ora_cols
        rec["rows_match"] = len(spark_rows) == len(ora_rows)
        rec["hash_match"] = (rec["schema_match"] and rec["rows_match"]
                             and spark_rows == ora_rows)
        if not rec["schema_match"]:
            print(f"FAIL {name}: cols spark={spark_cols} oracle={ora_cols}")
            n_fail += 1
        elif not rec["rows_match"]:
            print(f"FAIL {name}: rows spark={len(spark_rows)} oracle={len(ora_rows)}")
            n_fail += 1
        elif not rec["hash_match"]:
            diffs = [(a, b) for a, b in zip(spark_rows, ora_rows) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]} oracle={diffs[0][1]}  cols={spark_cols}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    if len(sys.argv) > 3:
        Path(sys.argv[3]).write_text(json.dumps(report, indent=2))
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
