#!/usr/bin/env python3
"""Time the DuckDB oracle over a testdata sf directory.

Usage: python3 tools/time_oracle.py <sfDir> <oracle_sql.json> <out.json>
           [reps=3] [resume.json]

Runs every oracle SQL (the file graft.Verify dumps) against the parquet
tables in <sfDir>. Rep policy mirrors graft.Bench (record the MINIMUM)
with one adaptation for the multi-minute sketch restatements: a query
whose FIRST rep exceeds ADAPTIVE_CUTOFF seconds records that single rep
(noise is irrelevant at 100x the floor; re-running a 25-minute
restatement twice more measures nothing). Each query also runs under a
QUERY_BUDGET wall-clock guard — on expiry the query is interrupted and
recorded under "timeouts" with the lower-bound wall, so one pathological
restatement cannot stall the artifact.

If a resume file is given, queries already present in its "queries" (or
"timeouts") are skipped and their values carried over — partial runs
compose.

Dev-only tool (python/duckdb are driver-side); never shipped in the jar.
"""
import json, sys, threading, time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ADAPTIVE_CUTOFF = 60.0   # s: first rep above this -> single-rep record
QUERY_BUDGET = 900.0     # s: per-rep interrupt guard


def timed_run(con, sql):
    """Run sql; return wall seconds or raise. Interrupts at QUERY_BUDGET."""
    done = threading.Event()

    def guard():
        if not done.wait(QUERY_BUDGET):
            con.interrupt()

    g = threading.Thread(target=guard, daemon=True)
    g.start()
    t0 = time.monotonic()
    try:
        con.sql(sql).fetchall()
    finally:
        done.set()
    return time.monotonic() - t0


def main():
    sf_dir, oracle_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    prior = {}
    prior_to = {}
    if len(sys.argv) > 5 and Path(sys.argv[5]).exists():
        pj = json.loads(Path(sys.argv[5]).read_text())
        prior = pj.get("queries", {})
        prior_to = pj.get("timeouts", {})
    oracle = json.loads(Path(oracle_path).read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times, errs, timeouts = dict(prior), {}, dict(prior_to)
    for name in sorted(oracle):
        if name in times or name in timeouts:
            continue
        best = None
        n_reps = 0
        try:
            for r in range(reps):
                dt = timed_run(con, oracle[name])
                n_reps += 1
                best = dt if best is None else min(best, dt)
                if dt > ADAPTIVE_CUTOFF:
                    break  # single-rep record for the multi-minute tail
        except Exception as e:  # noqa: BLE001 - interrupt or SQL error
            msg = str(e).split("\n")[0][:300]
            if "INTERRUPT" in msg.upper() or "interrupted" in msg.lower():
                timeouts[name] = QUERY_BUDGET
                print(f"{name}: TIMEOUT >{QUERY_BUDGET:.0f}s", flush=True)
            else:
                errs[name] = msg
                print(f"{name}: ERROR {msg}", flush=True)
            continue
        times[name] = round(best, 3)
        print(f"{name}: {best:.3f}s (reps={n_reps})", flush=True)
    total = sum(times.values()) + sum(timeouts.values())
    out = {
        "metric": "oracle_total", "value": round(total, 3), "unit": "sec",
        "sf": sf_dir, "reps": reps, "rep_policy":
            f"min; single-rep above {ADAPTIVE_CUTOFF:.0f}s; "
            f"interrupt at {QUERY_BUDGET:.0f}s",
        "threads": con.sql("SELECT current_setting('threads')").fetchone()[0],
        "duckdb": duckdb.__version__,
        "queries": times,
    }
    if timeouts:
        out["timeouts"] = timeouts  # lower bounds, included in total
    if errs:
        out["errors"] = errs
    Path(out_path).write_text(json.dumps(out) + "\n")
    print(f"total {total:.1f}s over {len(times)} queries "
          f"({len(timeouts)} timeouts, {len(errs)} errors) -> {out_path}")


if __name__ == "__main__":
    main()
