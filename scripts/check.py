#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (exact equality) with the
parquet dumped by graft.Verify. Usage:
    python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize dtypes: ints to int64, floats to float64
    import datetime
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna().head(5)
            if len(sample) and all(
                    isinstance(v, datetime.date) and not isinstance(v, datetime.datetime)
                    for v in sample):
                df[c] = pd.to_datetime(df[c])
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = n_nooracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            n_nooracle += 1
            print(f"  {status:18s} {name} ({len(got)} rows)")
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  ORACLE-ERROR       {name}: {e}")
            n_fail += 1
            continue
        # Driver-contract strictness: the driver hashes raw values, so a
        # DuckDB HUGEINT (→ float64) vs Spark int64, or a -0.0 vs +0.0,
        # hash-mismatches even when int-coerced values agree. Flag both.
        dtype_warn = []
        got_kinds = {c: got[c].dtype.kind for c in got.columns}
        for c in want.columns:
            if (c in got_kinds and want[c].dtype.kind != got_kinds[c]
                    and {want[c].dtype.kind, got_kinds[c]} <= {"i", "u", "f"}):
                dtype_warn.append(
                    f"{c}: oracle {want[c].dtype} vs spark {got[c].dtype}")
        import numpy as np
        for frame, side in ((got, "spark"), (want, "oracle")):
            for c in frame.columns:
                if frame[c].dtype.kind == "f":
                    col = frame[c].to_numpy()
                    if bool(np.any(np.signbit(col) & (col == 0.0))):
                        dtype_warn.append(f"{c}: -0.0 present on {side} side")
        g, w = norm(got), norm(want)
        if sorted(g.columns) != sorted(w.columns):
            print(f"  COLS-MISMATCH      {name}: got {sorted(g.columns)} want {sorted(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"  ROWS-MISMATCH      {name}: got {len(g)} want {len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_exact=True, check_dtype=False)
            if dtype_warn:
                print(f"  HASH-WEAK          {name}: {'; '.join(dtype_warn)}")
                n_fail += 1
            else:
                print(f"  PASS               {name} ({len(g)} rows)")
                n_pass += 1
        except AssertionError as e:
            print(f"  VALUES-MISMATCH    {name}: {str(e).splitlines()[-1][:200]}")
            # show first differing cells
            neq = (g != w) & ~(g.isna() & w.isna())
            rows = neq.any(axis=1)
            print(g[rows].head(3))
            print(w[rows].head(3))
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_nooracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
