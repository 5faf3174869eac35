#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle comparison.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01

For each query dir in verify_out: load Spark's parquet result, run the oracle
SQL in DuckDB over views of the testdata parquet tables, sort columns by
name, and compare shape + values (exact for non-floats; floats reported with
max abs diff so near-ulp issues are visible before the driver's exact hash).
"""
import json, math, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    return df


def main(outdir: str, sfdir: str) -> None:
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships single files; graft.DataGen output (e.g.
        # the sf1 scale-up) is a Spark directory of part files
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = norm(con.execute(sql).fetchdf())
            got = norm(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if list(exp.columns) != list(got.columns):
            problems.append(f"cols exp={list(exp.columns)} got={list(got.columns)}")
        elif len(exp) != len(got):
            problems.append(f"rows exp={len(exp)} got={len(got)}")
        else:
            for c in exp.columns:
                e_col, g_col = exp[c], got[c]
                if e_col.dtype.kind == "f" or g_col.dtype.kind == "f":
                    e_v = e_col.astype(float)
                    g_v = g_col.astype(float)
                    both_nan = e_v.isna() & g_v.isna()
                    diff = (e_v - g_v).abs()
                    bad = ~both_nan & ~(diff == 0)
                    if bad.any():
                        md = diff[bad].max()
                        problems.append(
                            f"col {c}: {int(bad.sum())} diffs, maxabs={md!r} "
                            f"first@{bad.idxmax()} exp={e_v[bad].iloc[0]!r} got={g_v[bad].iloc[0]!r}")
                else:
                    e_s = e_col.astype(str)
                    g_s = g_col.astype(str)
                    bad = e_s != g_s
                    if bad.any():
                        i = bad.idxmax()
                        problems.append(
                            f"col {c} ({e_col.dtype}/{g_col.dtype}): {int(bad.sum())} diffs "
                            f"first@{i} exp={e_col[i]!r} got={got[c][i]!r}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems[:4]:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"ok   {name} ({len(exp)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
