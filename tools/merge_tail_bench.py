#!/usr/bin/env python3
"""Merge the per-gate per-rep logs of tools/run_tail_bench.sh into one
tail-bench artifact: every rep is a COLD isolated JVM sample, so the
artifact reports the raw samples (wall + GC ms + memo-build seconds
attributed inside that JVM), their min (the least-contended cold
sample), and the per-gate step ratio against a reference map if given.

Usage: merge_tail_bench.py <logdir> <out_json> <sf_label> [ref_json sf_ref_label]
  ref_json: an extract_bench-style artifact at the previous scale whose
  "queries" values seed "ref_sec" / "step_ratio" per gate.
"""
import glob
import json
import os
import re
import sys

BENCH_RE = re.compile(r"\[bench\] (\S+) rep=\d+ t=([0-9.]+)s gc=(\d+)ms")
MEMO_RE = re.compile(r"\[memo\] build key=(\S+) t=([0-9.]+)s")


def main(logdir, out_path, sf_label, ref_path=None, ref_label=None):
    gates = {}
    for log in sorted(glob.glob(os.path.join(logdir, "*_rep*.log"))):
        name = os.path.basename(log)
        q = re.sub(r"_rep\d+\.log$", "", name)
        wall = gc = None
        builds = []
        with open(log) as f:
            for line in f:
                m = MEMO_RE.search(line)
                if m:
                    builds.append({"key": m.group(1),
                                   "seconds": float(m.group(2))})
                b = BENCH_RE.search(line)
                if b and b.group(1) == q:
                    wall, gc = float(b.group(2)), int(b.group(3))
        g = gates.setdefault(q, {"samples": [], "gc_ms": [],
                                 "memo_builds": [], "timeouts": 0})
        if wall is None:
            g["timeouts"] += 1  # killed before the rep line printed
        else:
            g["samples"].append(wall)
            g["gc_ms"].append(gc)
            g["memo_builds"].extend(builds)
    ref = {}
    if ref_path:
        ref = json.load(open(ref_path)).get("queries", {})
    out = {"sf": sf_label, "gates": {}}
    for q, g in sorted(gates.items()):
        row = dict(g)
        if g["samples"]:
            row["best"] = min(g["samples"])
            build_s = sum(b["seconds"] for b in g["memo_builds"])
            if build_s:
                row["best_marginal"] = round(
                    min(t - build_s for t in g["samples"]), 3)
        r = ref.get(q)
        if r is not None and not isinstance(r, dict) and g["samples"]:
            row["ref_sec"] = r
            row["ref_sf"] = ref_label
            row["step_ratio"] = round(min(g["samples"]) / r, 2)
        out["gates"][q] = row
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    for q, row in out["gates"].items():
        print(q, "samples=", [round(s, 1) for s in row.get("samples", [])],
              "gc_ms=", row.get("gc_ms"), "timeouts=", row["timeouts"],
              "step=", row.get("step_ratio"))


if __name__ == "__main__":
    main(*sys.argv[1:])
