#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle comparison.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01

For each query dir in verify_out: load Spark's parquet result, run the oracle
SQL in DuckDB over views of the testdata parquet tables, sort columns by
name, and compare shape + values (exact for non-floats; floats reported with
max abs diff so near-ulp issues are visible before the driver's exact hash).

Declared column TYPES are compared too (DuckDB relation types vs the parquet
footer): the driver's hash is type-sensitive, and comparing pandas dtypes
alone is blind to it — pandas renders DuckDB HUGEINT and a nullable BIGINT
both as float64, which is exactly how q217's oracle-side HUGEINT leak
shipped in round 13.
"""
import glob, json, math, os, sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    return df


def canon_duck(t) -> str:
    """Canonical type kind for a DuckDB column type (str(DuckDBPyType))."""
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "UTINYINT", "USMALLINT",
             "UINTEGER"):
        return "int32" if s == "INTEGER" else "int<64"
    if s in ("BIGINT", "UBIGINT"):
        return "int64"
    if s == "HUGEINT":
        return "int128"        # the q217 leak class: never matches parquet
    if s in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s.endswith("[]") or s.startswith("LIST") or s.startswith("ARRAY"):
        return "list"
    return s


def canon_arrow(t) -> str:
    """Canonical type kind for a pyarrow field type (Spark parquet side)."""
    import pyarrow as pa
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_integer(t):
        return "int<64"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def spark_schema(result_dir: str):
    """column -> canonical kind, from the parquet footer (NOT pandas dtypes:
    pandas turns both HUGEINT and nullable-int into float64, which is the
    exact blind spot that let q217's oracle-side HUGEINT leak ship)."""
    parts = sorted(glob.glob(f"{result_dir}/*.parquet")) or [result_dir]
    sch = pq.read_schema(parts[0])
    return {f.name: canon_arrow(f.type) for f in sch}


def type_problems(con, sql: str, result_dir: str):
    duck = {c: canon_duck(t)
            for c, t in zip(con.sql(sql).columns, con.sql(sql).types)}
    spark = spark_schema(result_dir)
    probs = []
    for c in sorted(set(duck) | set(spark)):
        dk, sk = duck.get(c), spark.get(c)
        if dk is not None and sk is not None and dk != sk:
            probs.append(f"TYPE col {c}: oracle={dk} spark={sk} "
                         f"(driver hash is type-sensitive)")
    return probs


def main(outdir: str, sfdir: str, json_out: str = None) -> None:
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
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
            results[name] = False
            n_fail += 1
            continue
        problems = []
        try:
            problems += type_problems(con, sql, f"{outdir}/{name}")
        except Exception as e:
            problems.append(f"TYPE check errored: {type(e).__name__}: {e}")
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
        results[name] = not problems
        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems[:4]:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"ok   {name} ({len(exp)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        # the committed TYPESWEEP_r{N}.json artifact: one {query: ok} row
        # per oracle-paired query, ok meaning rows+schema+values+DECLARED
        # types all agree with DuckDB on this sf
        json.dump({"sf_dir": sfdir, "n_pass": n_pass, "n_fail": n_fail,
                   "queries": results}, open(json_out, "w"), indent=0,
                  sort_keys=True)


if __name__ == "__main__":
    out = sys.argv[3][7:] if len(sys.argv) > 3 and \
        sys.argv[3].startswith("--json=") else None
    main(sys.argv[1], sys.argv[2], out)
