#!/usr/bin/env python3
"""Determinism-under-parallelism receipt (r13 verdict #1): compare two
graft.Verify output dirs (e.g. local[8] vs local[32] dumps of the same
sfDir) query by query and report whether every output is IDENTICAL —
same schema, same rows, same values bit-for-bit at repr precision.

The 204-exact oracle claim rests on the order-independence contract
(DECIMAL sums, fixed pivot lists, unique tiebreaks — SparkEntry
scaladoc); this makes that contract EMPIRICAL across shuffle-partition
counts instead of argued. Rows are re-ordered by the same ORDER BY ALL
NULLS FIRST the driver compare uses, so only genuine value/row-set
differences can fire. Floats compare at python-repr precision
(shortest round-trip — distinct doubles give distinct reprs, -0.0 is
distinguished from 0.0).

Usage: python3 tools/diff_verify.py <dirA> <dirB> <out_json>
"""
import hashlib
import json
import os
import sys

import duckdb


def query_hash(con, qdir):
    rel = con.sql(
        f"SELECT * FROM read_parquet('{qdir}/*.parquet') ORDER BY ALL NULLS FIRST")
    cols = list(zip(rel.columns, [str(t) for t in rel.types]))
    h = hashlib.sha256()
    h.update(repr(cols).encode())
    n = 0
    while True:
        rows = rel.fetchmany(10000)
        if not rows:
            break
        n += len(rows)
        for r in rows:
            h.update(repr(r).encode())
    return h.hexdigest(), n, cols


def main(dir_a, dir_b, out_path):
    con = duckdb.connect()
    qs_a = {d for d in os.listdir(dir_a)
            if os.path.isdir(os.path.join(dir_a, d))}
    qs_b = {d for d in os.listdir(dir_b)
            if os.path.isdir(os.path.join(dir_b, d))}
    report = {"dir_a": dir_a, "dir_b": dir_b,
              "only_in_a": sorted(qs_a - qs_b),
              "only_in_b": sorted(qs_b - qs_a),
              "n_compared": 0, "n_identical": 0,
              "mismatches": {}}
    for q in sorted(qs_a & qs_b):
        try:
            ha, na, ca = query_hash(con, os.path.join(dir_a, q))
            hb, nb, cb = query_hash(con, os.path.join(dir_b, q))
        except Exception as e:  # unreadable dump = a mismatch, not a skip
            report["mismatches"][q] = {"error": str(e)[:200]}
            report["n_compared"] += 1
            continue
        report["n_compared"] += 1
        if ha == hb:
            report["n_identical"] += 1
        else:
            report["mismatches"][q] = {
                "rows_a": na, "rows_b": nb,
                "schema_match": ca == cb, "hash_a": ha[:16], "hash_b": hb[:16]}
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    ok = (report["n_identical"] == report["n_compared"]
          and not report["only_in_a"] and not report["only_in_b"])
    print(f"{report['n_identical']}/{report['n_compared']} identical"
          f"{'' if ok else ' — MISMATCHES: ' + str(sorted(report['mismatches']))}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
