#!/usr/bin/env python3
"""Merge isolated-JVM ScaleSmoke .partial.json artifacts into one
SCALE100 artifact. Each partial carries its own calibration; the merged
entry keeps per-JVM calib so cross-round host-speed comparison survives.

Usage: merge_scale100.py <out.json> <partial1.json> [partial2.json ...]
"""
import json
import sys


def main():
    out, parts = sys.argv[1], sys.argv[2:]
    merged = {"provenance": "isolated-jvm per entry, min-of-reps",
              "mult": None, "sf_dir": None, "cpus": None, "reps": None,
              "entries": {}}
    for p in parts:
        d = json.load(open(p))
        for k in ("mult", "sf_dir", "cpus", "reps"):
            if merged[k] is None:
                merged[k] = d[k]
            elif merged[k] != d[k]:
                raise SystemExit(f"{p}: {k} mismatch {d[k]} != {merged[k]}")
        for name, e in d["entries"].items():
            e = dict(e)
            e["calib_st_ms"] = d["calib_st_ms"]
            e["calib_mt_ms"] = d["calib_mt_ms"]
            # shuffle codec is a per-JVM knob (zstd for entries whose lz4
            # shuffle outgrows this VM's disk) — keep it with the entry
            if "codec" in d:
                e["codec"] = d["codec"]
            merged["entries"][name] = e
    json.dump(merged, open(out, "w"), indent=2)
    print(f"wrote {out} with {len(merged['entries'])} entries")


if __name__ == "__main__":
    main()
