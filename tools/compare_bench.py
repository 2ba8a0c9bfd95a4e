#!/usr/bin/env python3
"""Compare two BENCH_FULL.json-style artifacts per query.

Usage: python3 tools/compare_bench.py OLD.json NEW.json [threshold]

Prints per-query deltas beyond `threshold` (default 0.3s), the
like-for-like total over common queries, and entries added/removed.
Works on any file with {"queries": {name: seconds}}.
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    common = sorted(set(old) & set(new))
    print(f"common {len(common)} queries: "
          f"{sum(old[k] for k in common):.1f}s -> "
          f"{sum(new[k] for k in common):.1f}s")
    moved = [(new[k] - old[k], k) for k in common
             if abs(new[k] - old[k]) >= thr]
    for d, k in sorted(moved):
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({d:+.2f}s)")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print("added: " + ", ".join(f"{k}={new[k]:.2f}s" for k in added))
    if removed:
        print("removed: " + ", ".join(removed))


if __name__ == "__main__":
    main()
