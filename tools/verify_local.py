#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query result parquet in outDir: registers the sfDir parquet
tables as DuckDB views, runs the oracle SQL, and compares
(schema-insensitively: columns sorted by name, rows sorted, values
stringified) against the Spark output. Prints PASS/FAIL per query.
"""
import json
import sys
import glob
import os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable comparison (mirrors a hash of printed values)
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: repr(v))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in spark_files])
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        cg, ce = canon(got), canon(exp)
        if list(cg.columns) != list(ce.columns):
            print(f"FAIL {name}: columns {list(cg.columns)} vs {list(ce.columns)}")
            n_fail += 1
        elif len(cg) != len(ce):
            print(f"FAIL {name}: rows {len(cg)} vs {len(ce)}")
            n_fail += 1
        elif len(cg) == 0:
            print(f"PASS {name} (0 rows — weak)")
            n_pass += 1
        elif not cg.equals(ce):
            neq = (cg != ce).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(cg)} differing rows; first:")
            print("  spark:", cg[neq].head(2).to_dict("records"))
            print("  duck :", ce[neq].head(2).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(cg)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
