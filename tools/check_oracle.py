#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (SURVEY §5.2).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with each fixture table
registered as a view, canonicalizes both frames (sort columns by name, round
doubles/floats to 6 decimals, sort rows), and diffs. Exit code 1 if any
query mismatches.
"""
import json, math, sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        # normalize timestamp-like to ns ints for stable compare
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures, passed, rows_only = [], 0, 0
    names = sorted(d.name for d in out.iterdir() if d.is_dir())
    for name in names:
        got = pd.read_parquet(out / name)
        if name not in oracle:
            if len(got) > 0:
                rows_only += 1
                print(f"  ~ {name}: rows-only ({len(got)} rows)")
            else:
                # an empty rows-only result is a silent regression, not a pass
                failures.append(name)
                print(f"  ✗ {name}: rows-only EMPTY")
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"  ✗ {name}: oracle SQL failed: {e}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"  ✗ {name}: columns differ spark={list(g.columns)} duck={list(w.columns)}")
        elif len(g) != len(w):
            failures.append(name)
            print(f"  ✗ {name}: rowcount spark={len(g)} duck={len(w)}")
        elif not g.equals(w):
            neq = (g != w).any(axis=1)
            failures.append(name)
            print(f"  ✗ {name}: {int(neq.sum())}/{len(g)} rows differ; first diff:")
            idx = neq.idxmax()
            print("    spark:", g.loc[idx].to_dict())
            print("    duck :", w.loc[idx].to_dict())
        else:
            passed += 1
            print(f"  ✓ {name} ({len(g)} rows)")
    print(f"\n{passed} passed, {len(failures)} failed, {rows_only} rows-only, "
          f"{len(oracle) - len([n for n in names if n in oracle])} oracle entries with no result dir")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
