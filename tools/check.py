#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs DuckDB on oracle_sql.json against the fixture tables, reads the
engine's parquet output per query, sorts columns by name, and compares
shape + values. Exact comparison for non-floats; exact-by-default for
floats with a reported max-abs-diff on mismatch (the real driver hashes
values, so we aim for exact).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_result(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    frames = [pd.read_parquet(f) for f in files]
    return pd.concat(frames, ignore_index=True)


def norm(df):
    import datetime, decimal
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        s = df[c]
        # dates: duckdb .df() gives datetime64, parquet-read gives date objects
        if s.dtype == object:
            sample = s.dropna().head(1)
            if len(sample):
                v = sample.iloc[0]
                if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                    df[c] = pd.to_datetime(s)
                elif isinstance(v, decimal.Decimal):
                    df[c] = s.astype(float)
        elif str(s.dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(s)
    return df


def compare(name, got, exp):
    got, exp = norm(got), norm(exp)
    if list(got.columns) != list(exp.columns):
        return f"FAIL cols: got {list(got.columns)} vs exp {list(exp.columns)}"
    if len(got) != len(exp):
        return f"FAIL rows: got {len(got)} vs exp {len(exp)}"
    problems = []
    for c in got.columns:
        g, e = got[c], exp[c]
        # Driver hashes typed values: int64 vs float64 on the same numbers
        # still hash-mismatches (e.g. DuckDB SUM(BIGINT)->HUGEINT->float64).
        gk = "f" if str(g.dtype).startswith("float") else (
             "i" if str(g.dtype).startswith(("int", "uint")) else "o")
        ek = "f" if str(e.dtype).startswith("float") else (
             "i" if str(e.dtype).startswith(("int", "uint")) else "o")
        if {gk, ek} == {"f", "i"}:
            problems.append(f"{c}: dtype class mismatch got {g.dtype} vs exp {e.dtype}")
            continue
        try:
            g2 = g.astype(object).where(pd.notnull(g), None)
            e2 = e.astype(object).where(pd.notnull(e), None)
            mism = 0
            maxdiff = 0.0
            for a, b in zip(g2, e2):
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if a != b and not (math.isnan(a) and math.isnan(b)):
                        mism += 1
                        maxdiff = max(maxdiff, abs(a - b))
                elif a != b:
                    mism += 1
            if mism:
                problems.append(f"{c}: {mism} mismatches"
                                + (f" maxdiff={maxdiff:.3e}" if maxdiff else ""))
        except Exception as ex:
            problems.append(f"{c}: compare error {ex}")
    return "OK" if not problems else "FAIL " + "; ".join(problems)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        got = load_result(outdir, name)
        if got is None:
            print(f"{name}: MISSING output")
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as ex:
            print(f"{name}: ORACLE ERROR {ex}")
            continue
        verdict = compare(name, got, exp)
        if verdict == "OK":
            n_ok += 1
        print(f"{name}: {verdict}")
    print(f"== {n_ok}/{len(oracle)} OK ==")
    # rows-only queries (no oracle): verify output exists and is non-empty
    import os
    for d in sorted(os.listdir(outdir)):
        if d.startswith("q") and d not in oracle:
            got = load_result(outdir, d)
            n = 0 if got is None else len(got)
            print(f"{d}: ROWS-ONLY rows={n}" + ("" if n > 0 else " (EMPTY!)"))


if __name__ == "__main__":
    main()
