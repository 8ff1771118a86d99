#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB correctness compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out_dir>/oracle_sql.json in DuckDB with the sf tables
registered as views, and compares row count, column names, and values
(rows sorted by all columns, column order normalized by name).

Strictness contract (round 9): local red must equal driver red.
 - ARRAY-valued output columns FAIL outright: the driver's checker sorts
   by every column and numpy arrays crash its sort_values — a local pass
   on an array column would mask a guaranteed driver crash.
 - Numeric compares are DTYPE-STRICT: an int64 `1` vs a float64 `1.0` is
   a FAIL, because the driver hash-compares the rendered frames and those
   render differently (this is exactly how sessionize shipped red in r8).
"""
import json, os, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def first_non_null(s: pd.Series):
    nn = s.dropna()
    return nn.iloc[0] if len(nn) else None


class ArrayColumnError(Exception):
    pass


def norm(df: pd.DataFrame, side: str) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns, naive. Column kind is sniffed
    # from the first NON-NULL value — a null in row 0 must not
    # misclassify the column (that failure class broke hof_transform).
    import datetime
    import numpy as np
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object and isinstance(first_non_null(df[c]), datetime.date):
            df[c] = pd.to_datetime(df[c])
    arrayish = [c for c in df.columns
                if isinstance(first_non_null(df[c]), (list, np.ndarray))]
    if arrayish:
        # The driver sorts by ALL columns; ndarray cells crash its
        # sort_values (unhashable/unorderable). Emit scalars instead
        # (concat_ws / to_json / posexplode).
        raise ArrayColumnError(
            f"{side} emits array-valued column(s) {arrayish} — the driver "
            "gate crashes on these; serialize to a scalar")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)


def _num_kind(x):
    """'i' for integer-kind, 'f' for float-kind, None for non-numeric."""
    import numpy as np
    if isinstance(x, bool) or isinstance(x, np.bool_):
        return None
    if isinstance(x, (int, np.integer)):
        return "i"
    if isinstance(x, (float, np.floating)):
        return "f"
    return None


def cmp_vals(a, b) -> bool:
    # both-missing (None / nan / NaT) compares equal — pd.isna covers all
    # three scalar missing kinds (NaT-vs-NaT falsely diffed asof_quote_trade)
    try:
        na, nb = pd.isna(a), pd.isna(b)
        if na or nb:
            return bool(na) and bool(nb)
    except (TypeError, ValueError):
        pass
    ka, kb = _num_kind(a), _num_kind(b)
    if ka or kb:
        # dtype-strict: the driver hashes rendered frames, so 1 != 1.0
        if ka != kb:
            return False
        return a == b  # exact — the driver hash-compares, so we demand exact too
    return a == b


def dtype_mismatches(got: pd.DataFrame, exp: pd.DataFrame):
    """Column-level int-vs-float divergence — flag even when all values
    happen to compare equal numerically."""
    out = []
    for c in got.columns:
        # the driver contract is int-vs-float RENDERING (1 vs 1.0);
        # uint and int render identically, so treat 'u' as 'i' — an
        # int64-vs-uint64 pair must NOT fail locally when the driver
        # would pass it
        gk = {"u": "i"}.get(got[c].dtype.kind, got[c].dtype.kind)
        ek = {"u": "i"}.get(exp[c].dtype.kind, exp[c].dtype.kind)
        if {gk, ek} == {"i", "f"}:
            out.append(f"col {c}: dtype spark={got[c].dtype} duck={exp[c].dtype}")
    return out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata stores one parquet FILE per table; ScaleUp's
        # scale-probe dirs are Spark-written parquet DIRECTORIES
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"), "spark")
            exp = norm(con.sql(sql).df(), "oracle")
        except ArrayColumnError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
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
            problems.extend(dtype_mismatches(got, exp))
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
