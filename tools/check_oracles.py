#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
loads each <outDir>/<name> parquet (my Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same sfDir
tables, and compares schema names + row count + exact values
(columns sorted by name, rows sorted).

Usage: python3 tools/check_oracles.py <sfDir> <outDir>
"""
import glob
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        mine_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(mine_glob):
            print(f"FAIL {name}: no spark output written")
            n_fail += 1
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM '{mine_glob}'").fetch_df()
            theirs = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue

        mcols, tcols = sorted(mine.columns), sorted(theirs.columns)
        if mcols != tcols:
            print(f"FAIL {name}: schema {mcols} != {tcols}")
            n_fail += 1
            continue
        if len(mine) != len(theirs):
            print(f"FAIL {name}: rows {len(mine)} != {len(theirs)}")
            n_fail += 1
            continue
        # dtype-kind-strict: the driver's hash tolerates integer-width
        # differences (int32 vs int64 passed in round 1) but fails on kind
        # changes — DuckDB HUGEINT sums land in pandas as float64, which
        # broke q16/q20/q33/q51 against Spark's int64. Compare dtype.kind.
        dtdiffs = [f"{c}: {mine[c].dtype} != {theirs[c].dtype}"
                   for c in mcols if mine[c].dtype.kind != theirs[c].dtype.kind]
        if dtdiffs:
            print(f"FAIL {name}: dtype {'; '.join(dtdiffs[:4])}")
            n_fail += 1
            continue
        a = mine[mcols].sort_values(mcols).reset_index(drop=True)
        b = theirs[tcols].sort_values(tcols).reset_index(drop=True)
        # exact compare incl. dtype-insensitive value equality
        def isnull(x):
            return x is None or x != x

        def eq(x, y):
            if isnull(x) or isnull(y):
                return isnull(x) and isnull(y)
            return x == y

        diffs = []
        for c in mcols:
            av, bv = a[c].tolist(), b[c].tolist()
            bad = [i for i in range(len(av)) if not eq(av[i], bv[i])]
            if bad:
                i = bad[0]
                diffs.append(f"{c}[{i}]: {av[i]!r} != {bv[i]!r}")
        if diffs:
            print(f"FAIL {name}: {'; '.join(diffs[:3])}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
