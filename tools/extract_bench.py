#!/usr/bin/env python3
"""Extract the bench stdout JSON line from an sbt-wrapped log and write
it to an artifact file (guards against the round-9 log-filter loss that
forced a stderr reconstruction for the batch-2 sf10 artifact).

Usage: python3 tools/extract_bench.py <sbt_log> <out_json>
"""
import json
import sys


def main(log_path, out_path):
    line = None
    with open(log_path) as f:
        for raw in f:
            s = raw.strip()
            if s.startswith("[info] "):
                s = s[len("[info] "):]
            if s.startswith('{"metric":"total"'):
                line = s
    if line is None:
        sys.exit(f"no bench JSON line found in {log_path}")
    d = json.loads(line)  # validate before committing
    n = len(d["queries"])
    with open(out_path, "w") as f:
        f.write(line + "\n")
    print(f"wrote {out_path}: {n} queries, errors={d['errors']}, "
          f"total={d['value']:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
