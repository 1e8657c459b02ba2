#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only; the
engine itself is pure Scala/Spark). Runs DuckDB over the same parquet
tables for every oracleSql entry and compares against the parquet the
Verify main dumped: column names, dtypes-agnostic values, row content.

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df


def norm_cell(v):
    if isinstance(v, float):
        return v  # exact compare — our whole design promises bit-equality
    return v


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.loads((Path(outdir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pdir = Path(outdir) / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM '{pdir}/*.parquet'").fetchdf())
            want = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        mism = []
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                xn, yn = pd.isna(x), pd.isna(y)
                if xn and yn:
                    continue
                if xn != yn or norm_cell(x) != norm_cell(y):
                    mism.append((c, i, x, y))
                    break
        if mism:
            c, i, x, y = mism[0]
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} oracle={y!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    # rows-only queries (no oracle): report row counts
    for p in sorted(Path(outdir).iterdir()):
        if p.is_dir() and p.name not in oracle:
            n = con.execute(f"SELECT COUNT(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"rows {p.name}: {n}")
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
