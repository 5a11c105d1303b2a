#!/usr/bin/env python3
"""Extract the bench stdout JSON line from an sbt-wrapped log and write
it to an artifact file (guards against the round-9 log-filter loss that
forced a stderr reconstruction for the batch-2 sf10 artifact).

Also parses the stderr diagnostics into the artifact (VERDICT r11 #5 /
r12 #4): `[memo] build key=K t=Ts` receipts are attributed to the
query-rep that paid them (the next `[bench] q rep=N t=Ts gc=Gms` line —
bench prints the rep line after the rep completes, so a build always
precedes its payer), and each paying query gets a `queries_marginal`
entry: the median of its rep samples with the attributed build seconds
subtracted from the paying reps. Family-run constants (q_doc_pagerank
etc.) then stop billing the shared dedup_pairs build to whichever query
the shuffled order happens to run first.

Usage: python3 tools/extract_bench.py <sbt_log> <out_json>
"""
import json
import re
import statistics
import sys

MEMO_RE = re.compile(r"\[memo\] build key=(\S+) t=([0-9.]+)s")
BENCH_RE = re.compile(r"\[bench\] (\S+) rep=(\d+) t=([0-9.]+)s gc=(\d+)ms")
ERROR_RE = re.compile(r"\[bench\] (\S+) rep=(\d+) ERROR")


def strip_sbt(s):
    s = s.strip()
    for p in ("[info] ", "[error] "):
        if s.startswith(p):
            return s[len(p):]
    return s


def main(log_path, out_path):
    line = None
    pending = []          # memo builds awaiting their paying rep line
    builds = []           # {key, seconds, paid_by, rep}
    reps = {}             # query -> [(rep, wall, attributed_build_s)]
    with open(log_path) as f:
        for raw in f:
            s = strip_sbt(raw)
            m = MEMO_RE.search(s)
            if m:
                pending.append({"key": m.group(1), "seconds": float(m.group(2))})
                continue
            b = BENCH_RE.search(s)
            if b:
                q, rep, t = b.group(1), int(b.group(2)), float(b.group(3))
                paid = sum(p["seconds"] for p in pending)
                for p in pending:
                    p["paid_by"], p["rep"] = q, rep
                    builds.append(p)
                pending = []
                reps.setdefault(q, []).append((rep, t, paid))
                continue
            e = ERROR_RE.search(s)
            if e:
                # builds paid by an erroring rep have no wall-time sample
                # to subtract them from — flush them UNATTRIBUTED instead
                # of billing them to the next successful query's rep
                # (r13 ADVICE #3)
                for p in pending:
                    p["paid_by"], p["rep"] = None, None
                    builds.append(p)
                pending = []
                continue
            if s.startswith('{"metric":"total"'):
                # Bench prints TWO lines since r14: the full per-query map
                # first, then a tail-window-sized summary (subset of
                # queries + a queries_file pointer). Keep the fullest.
                try:
                    cand = json.loads(s)
                except json.JSONDecodeError:
                    continue
                if line is None or len(cand.get("queries", {})) > len(
                        line.get("queries", {})):
                    line = cand
    if line is None:
        sys.exit(f"no bench JSON line found in {log_path}")
    d = line
    n = len(d["queries"])
    # builds that never found a payer (e.g. during the post-loop error
    # retry, which prints no rep line) stay visible, unattributed
    for p in pending:
        p["paid_by"], p["rep"] = None, None
        builds.append(p)
    if builds:
        d["memo_builds"] = builds
        marginal = {}
        for q in {b["paid_by"] for b in builds if b["paid_by"]}:
            adj = [t - paid for (_, t, paid) in reps.get(q, [])]
            if adj:
                marginal[q] = round(statistics.median(adj), 3)
        if marginal:
            d["queries_marginal"] = marginal
    with open(out_path, "w") as f:
        f.write(json.dumps(d) + "\n")
    extra = (f", memo_builds={len(builds)}, marginal for "
             f"{sorted(d.get('queries_marginal', {}))}") if builds else ""
    print(f"wrote {out_path}: {n} queries, errors={d['errors']}, "
          f"total={d['value']:.1f}s{extra}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
