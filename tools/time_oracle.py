#!/usr/bin/env python3
"""Time the DuckDB oracle over a testdata sf directory.

Usage: python3 tools/time_oracle.py <sfDir> <oracle_sql.json> <out.json> [reps=3]

Runs every oracle SQL (the file graft.Verify dumps) against the parquet
tables in <sfDir> with DuckDB's default thread count, `reps` times each,
and records the MINIMUM wall per query plus the total — the same
min-of-reps policy graft.Bench applies to the Spark side, so the two
artifacts are comparable.

Dev-only tool (python/duckdb are driver-side); never shipped in the jar.
"""
import json, sys, time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    oracle = json.loads(Path(oracle_path).read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times, errs = {}, {}
    total = 0.0
    for name in sorted(oracle):
        best = None
        try:
            for _ in range(reps):
                t0 = time.monotonic()
                con.sql(oracle[name]).fetchall()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001 - record and continue
            errs[name] = str(e).split("\n")[0][:300]
            continue
        times[name] = round(best, 3)
        total += best
        print(f"{name}: {best:.3f}s", flush=True)
    out = {
        "metric": "oracle_total", "value": round(total, 3), "unit": "sec",
        "sf": sf_dir, "reps": reps, "rep_policy": "min",
        "threads": con.sql("SELECT current_setting('threads')").fetchone()[0],
        "duckdb": duckdb.__version__,
        "queries": times,
    }
    if errs:
        out["errors"] = errs
    Path(out_path).write_text(json.dumps(out) + "\n")
    print(f"total {total:.1f}s over {len(times)} queries -> {out_path}"
          + (f" ({len(errs)} errors)" if errs else ""))


if __name__ == "__main__":
    main()
