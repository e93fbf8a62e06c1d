#!/usr/bin/env python3
"""Cross-check the engine's TPC-H q1-q12 results against DuckDB and write
the golden blocks of src/test/resources/slt/tpch/q*.slt.

Inputs: target/tpch_dump/qN.{rows,meta} produced by
`sbt "Test/runMain graft.TpchGoldenDump"` (the engine's formatted rows for
the reference's verbatim SQL over the committed .tbl fixtures).

This script loads the same fixtures into DuckDB with the reference DDL
types (DECIMAL(15,2) money etc., tests/tpch/create_tables.slt), runs the
same SQL, and compares values cell-by-cell (exact for strings/dates,
tolerance 1e-9 relative for numerics — DuckDB types some results
differently, e.g. avg(DECIMAL) -> DOUBLE vs the engine's DECIMAL(p+4,s+4),
so byte-equality across engines is not the bar; value equality is).
Only if every query agrees are the goldens (re)written: reference SQL text
verbatim + the engine's formatted rows.

Run from repo root: python3 scripts/make_tpch_goldens.py
"""
import os
import re
import sys
from decimal import Decimal

import duckdb

DATA = "src/test/resources/slt/tpch/data"
DUMP = "target/tpch_dump"
OUT = "src/test/resources/slt/tpch"
REF = "/root/reference/qurious/tests/tpch"

SCHEMAS = {
    "supplier": [("s_suppkey", "BIGINT"), ("s_name", "VARCHAR"), ("s_address", "VARCHAR"),
                 ("s_nationkey", "BIGINT"), ("s_phone", "VARCHAR"),
                 ("s_acctbal", "DECIMAL(15,2)"), ("s_comment", "VARCHAR"), ("s_rev", "VARCHAR")],
    "part": [("p_partkey", "BIGINT"), ("p_name", "VARCHAR"), ("p_mfgr", "VARCHAR"),
             ("p_brand", "VARCHAR"), ("p_type", "VARCHAR"), ("p_size", "INTEGER"),
             ("p_container", "VARCHAR"), ("p_retailprice", "DECIMAL(15,2)"),
             ("p_comment", "VARCHAR"), ("p_rev", "VARCHAR")],
    "partsupp": [("ps_partkey", "BIGINT"), ("ps_suppkey", "BIGINT"),
                 ("ps_availqty", "INTEGER"), ("ps_supplycost", "DECIMAL(15,2)"),
                 ("ps_comment", "VARCHAR"), ("ps_rev", "VARCHAR")],
    "customer": [("c_custkey", "BIGINT"), ("c_name", "VARCHAR"), ("c_address", "VARCHAR"),
                 ("c_nationkey", "BIGINT"), ("c_phone", "VARCHAR"),
                 ("c_acctbal", "DECIMAL(15,2)"), ("c_mktsegment", "VARCHAR"),
                 ("c_comment", "VARCHAR"), ("c_rev", "VARCHAR")],
    "orders": [("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT"),
               ("o_orderstatus", "VARCHAR"), ("o_totalprice", "DECIMAL(15,2)"),
               ("o_orderdate", "DATE"), ("o_orderpriority", "VARCHAR"),
               ("o_clerk", "VARCHAR"), ("o_shippriority", "INTEGER"),
               ("o_comment", "VARCHAR"), ("o_rev", "VARCHAR")],
    "lineitem": [("l_orderkey", "BIGINT"), ("l_partkey", "BIGINT"), ("l_suppkey", "BIGINT"),
                 ("l_linenumber", "INTEGER"), ("l_quantity", "DECIMAL(15,2)"),
                 ("l_extendedprice", "DECIMAL(15,2)"), ("l_discount", "DECIMAL(15,2)"),
                 ("l_tax", "DECIMAL(15,2)"), ("l_returnflag", "VARCHAR"),
                 ("l_linestatus", "VARCHAR"), ("l_shipdate", "DATE"),
                 ("l_commitdate", "DATE"), ("l_receiptdate", "DATE"),
                 ("l_shipinstruct", "VARCHAR"), ("l_shipmode", "VARCHAR"),
                 ("l_comment", "VARCHAR"), ("l_rev", "VARCHAR")],
    "nation": [("n_nationkey", "BIGINT"), ("n_name", "VARCHAR"),
               ("n_regionkey", "BIGINT"), ("n_comment", "VARCHAR"), ("n_rev", "VARCHAR")],
    "region": [("r_regionkey", "BIGINT"), ("r_name", "VARCHAR"),
               ("r_comment", "VARCHAR"), ("r_rev", "VARCHAR")],
}

NUM = re.compile(r"^-?\d+(\.\d+)?$")


def load(con):
    for t, cols in SCHEMAS.items():
        colmap = ", ".join(f"'{n}': '{ty}'" for n, ty in cols)
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM read_csv('{DATA}/{t}.tbl', "
            f"delim='|', header=false, columns={{{colmap}}}, null_padding=true)")


def norm_token(t):
    """numeric tokens rounded for pairing keys; others verbatim."""
    if NUM.match(t):
        return f"{float(t):.6g}"
    return t


def tokens_match(a, b):
    if a == b:
        return True
    if NUM.match(a) and NUM.match(b):
        da, db = Decimal(a), Decimal(b)
        denom = max(abs(da), abs(db), Decimal(1))
        # 1e-6: DuckDB types some results as DOUBLE (e.g. avg over DECIMAL)
        # where the engine keeps DECIMAL(p+4,s+6) — rounding differs at the
        # last printed digit
        return abs(da - db) / denom < Decimal("1e-6")
    return False


def to_cells(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main():
    con = duckdb.connect()
    load(con)
    ok = True
    results = {}
    for n in range(1, 13):
        meta = open(f"{DUMP}/q{n}.meta").read().split("\n")
        sql = "\n".join(meta[2:]).strip().rstrip(";")
        spark_rows = [l for l in open(f"{DUMP}/q{n}.rows").read().split("\n") if l]
        duck = con.execute(sql).fetchall()
        if len(duck) != len(spark_rows):
            print(f"q{n}: ROW COUNT mismatch spark={len(spark_rows)} duck={len(duck)}")
            ok = False
            continue
        # Compare whitespace-tokenized rows: numeric tokens with tolerance,
        # everything else exact. Rows paired after sorting by normalized key
        # (engines may order ties differently).
        def toks(line):
            return line.split()
        def key(ts):
            return [norm_token(t) for t in ts]
        s_sorted = sorted((toks(l) for l in spark_rows), key=key)
        d_sorted = sorted((toks(" ".join(to_cells(c) for c in row)) for row in duck), key=key)
        bad = []
        for sr, dr in zip(s_sorted, d_sorted):
            if len(sr) != len(dr) or not all(tokens_match(a, b) for a, b in zip(sr, dr)):
                bad.append((sr, dr))
        if bad:
            ok = False
            print(f"q{n}: {len(bad)} row mismatches; first: {bad[0]}")
        else:
            print(f"q{n}: OK ({len(duck)} rows)")
            results[n] = spark_rows
    if not ok:
        print("NOT writing goldens — fix mismatches first")
        sys.exit(1)
    for n, rows in results.items():
        ref = open(f"{REF}/q{n}.slt").read().split("\n")
        sep = next(i for i, l in enumerate(ref) if l.startswith("----"))
        head = "\n".join(ref[: sep + 1])
        with open(f"{OUT}/q{n}.slt", "w") as f:
            f.write(head + "\n" + "\n".join(rows) + "\n")
    print(f"wrote {len(results)} golden files to {OUT}")


if __name__ == "__main__":
    main()
