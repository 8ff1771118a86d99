#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB correctness compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out_dir>/oracle_sql.json in DuckDB with the sf tables
registered as views, and compares row count, column names, and values
(rows sorted by all columns, column order normalized by name).
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def first_non_null(s: pd.Series):
    nn = s.dropna()
    return nn.iloc[0] if len(nn) else None


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns, naive. Column kind is sniffed
    # from the first NON-NULL value — a null in row 0 must not
    # misclassify the column (that failure class broke hof_transform).
    import datetime
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object and isinstance(first_non_null(df[c]), datetime.date):
            df[c] = pd.to_datetime(df[c])
    import numpy as np
    sortable = [c for c in df.columns
                if not isinstance(first_non_null(df[c]), (list, np.ndarray))]
    if sortable:
        df = df.sort_values(by=sortable)
    return df.reset_index(drop=True)


def cmp_vals(a, b) -> bool:
    import numpy as np
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        la = list(a) if a is not None else None
        lb = list(b) if b is not None else None
        if la is None or lb is None or len(la) != len(lb):
            return la == lb
        return all(cmp_vals(x, y) for x, y in zip(la, lb))
    # both-missing (None / nan / NaT) compares equal — pd.isna covers all
    # three scalar missing kinds (NaT-vs-NaT falsely diffed asof_quote_trade)
    try:
        na, nb = pd.isna(a), pd.isna(b)
        if na or nb:
            return bool(na) and bool(nb)
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        return a == b  # exact — the driver hash-compares, so we demand exact too
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            exp = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols spark={list(got.columns)} duck={list(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rows spark={len(got)} duck={len(exp)}")
        else:
            for c in got.columns:
                ga, ea = got[c].tolist(), exp[c].tolist()
                bad = [(i, ga[i], ea[i]) for i in range(len(ga)) if not cmp_vals(ga[i], ea[i])]
                if bad:
                    problems.append(f"col {c}: {len(bad)} diffs, first {bad[:3]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
