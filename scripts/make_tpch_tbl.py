#!/usr/bin/env python3
"""Generate pipe-delimited TPC-H .tbl fixtures for the reference slt corpus.

The reference's tests/tpch corpus loads dbgen data via
`COPY t FROM './tests/tpch/data/t.tbl' ( DELIMITER '|' )` with the full
TPC-H schema (tests/tpch/create_tables.slt). dbgen output is not
redistributable, so these fixtures are derived from the driver parquet at
/root/testdata/sf0.001 (TESTDATA.md), with the columns the driver omits
synthesized DETERMINISTICALLY (pure functions of the row keys — no RNG), and
dates shifted back 2 years so the corpus queries' 1993-1996 date filters
select non-degenerate subsets. Lines end with '|' like real dbgen output
(absorbed by the *_rev VARCHAR column in the reference DDL).

Golden q*.slt blocks are regenerated against this data (scripts/
make_tpch_goldens.py); SQL text stays verbatim.

Run from repo root: python3 scripts/make_tpch_tbl.py
"""
import os
import datetime

import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
OUT = "src/test/resources/slt/tpch/data"

CONTAINERS = ["SM CASE", "SM BOX", "LG CASE", "LG BOX", "MED BAG", "JUMBO JAR",
              "WRAP PACK", "MED CAN"]
FINISH = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
MATERIAL = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
SHIPMODE = ["MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "REG AIR", "FOB"]
SHIPINSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

# dbgen nation names by nationkey (the driver data has NATION_k placeholders;
# the corpus queries filter on real names like GERMANY / FRANCE / BRAZIL).
# Region keys keep the driver's modular assignment — internally consistent.
NATIONS = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
           "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
           "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
           "ROMANIA", "RUSSIA", "SAUDI ARABIA", "VIETNAM", "UNITED KINGDOM",
           "UNITED STATES"]
SHADES = ["green", "navy", "rose", "ivory", "plum"]
# so q7 (FRANCE<->GERMANY), q8/q11 (BRAZIL/GERMANY suppliers) are non-empty
SUPP_NATION_OVERRIDE = {0: 2, 3: 6, 7: 7}


def shift2y(d):
    """date minus 2 years (Feb 29 -> Feb 28)."""
    try:
        return d.replace(year=d.year - 2)
    except ValueError:
        return d.replace(year=d.year - 2, day=28)


def dstr(ts):
    return shift2y(ts.date() if isinstance(ts, datetime.datetime) else ts).isoformat()


def money(x):
    return f"{x:.2f}"


def rows_of(table):
    return pq.read_table(f"{SRC}/{table}.parquet").to_pylist()


def write(table, lines):
    os.makedirs(OUT, exist_ok=True)
    with open(f"{OUT}/{table}.tbl", "w") as f:
        for cells in lines:
            f.write("|".join(str(c) for c in cells) + "|\n")
    print(f"{table}: {len(lines)} rows")


def main():
    write("region", [
        (r["r_regionkey"], r["r_name"], f"region comment {r['r_regionkey']}")
        for r in rows_of("region")])

    write("nation", [
        (n["n_nationkey"], NATIONS[n["n_nationkey"]], n["n_regionkey"],
         f"nation comment {n['n_nationkey']}")
        for n in rows_of("nation")])

    def supp_nation(s):
        return SUPP_NATION_OVERRIDE.get(s["s_suppkey"], s["s_nationkey"])

    write("supplier", [
        (s["s_suppkey"], s["s_name"], f"addr_{s['s_suppkey']}", supp_nation(s),
         f"{10 + supp_nation(s):02d}-{(s['s_suppkey'] * 37) % 1000:03d}-"
         f"{(s['s_suppkey'] * 71) % 1000:03d}-{(s['s_suppkey'] * 913) % 10000:04d}",
         money(s["s_acctbal"]), f"supplier comment {s['s_suppkey']}")
        for s in rows_of("supplier")])

    def p_type(p):
        # a deterministic slice matches q8's exact 'ECONOMY ANODIZED STEEL';
        # every size-15 part is BRASS so q2's `like '%BRASS' and p_size = 15`
        # selects rows
        pk = p["p_partkey"]
        if pk % 29 == 0:
            return "ECONOMY ANODIZED STEEL"
        material = "BRASS" if p["p_size"] == 15 else MATERIAL[(pk // 5) % 5]
        return f"{p['p_type']} {FINISH[pk % 5]} {material}"

    parts = rows_of("part")
    write("part", [
        (p["p_partkey"],
         f"{p['p_name']} {SHADES[p['p_partkey'] % 5]}",  # q9 needs '%green%'
         f"Manufacturer#{1 + p['p_partkey'] % 5}",
         p["p_brand"], p_type(p),
         p["p_size"], CONTAINERS[p["p_partkey"] % len(CONTAINERS)],
         money(p["p_retailprice"]), f"part comment {p['p_partkey']}")
        for p in parts])

    supkeys = [s["s_suppkey"] for s in rows_of("supplier")]
    ps = []
    for p in parts:
        pk = p["p_partkey"]
        for k in range(4):
            sk = supkeys[(pk + k * 7) % len(supkeys)]
            ps.append((pk, sk, (pk * 13 + k * 5) % 9990 + 10,
                       money(((pk * 31 + sk * 17 + k * 7) % 99900 + 100) / 100.0),
                       f"partsupp comment {pk} {sk}"))
    write("partsupp", ps)

    write("customer", [
        (c["c_custkey"], c["c_name"], f"addr_{c['c_custkey']}", c["c_nationkey"],
         f"{10 + c['c_nationkey']:02d}-{(c['c_custkey'] * 41) % 1000:03d}-"
         f"{(c['c_custkey'] * 67) % 1000:03d}-{(c['c_custkey'] * 733) % 10000:04d}",
         money(c["c_acctbal"]), c["c_mktsegment"], f"customer comment {c['c_custkey']}")
        for c in rows_of("customer")])

    write("orders", [
        (o["o_orderkey"], o["o_custkey"], o["o_orderstatus"], money(o["o_totalprice"]),
         dstr(o["o_orderdate"]), o["o_orderpriority"],
         f"Clerk#{o['o_orderkey'] % 1000:09d}", 0, f"order comment {o['o_orderkey']}")
        for o in rows_of("orders")])

    lines = []
    for l in rows_of("lineitem"):
        ship = shift2y(l["l_shipdate"].date())
        key = l["l_orderkey"] * 7 + l["l_linenumber"]
        commit = ship + datetime.timedelta(days=key % 31 - 15)
        receipt = ship + datetime.timedelta(days=key % 14 + 1)
        lines.append((
            l["l_orderkey"], l["l_partkey"], l["l_suppkey"], l["l_linenumber"],
            money(l["l_quantity"]), money(l["l_extendedprice"]),
            f"{l['l_discount']:.2f}", f"{l['l_tax']:.2f}",
            l["l_returnflag"], l["l_linestatus"], ship.isoformat(),
            commit.isoformat(), receipt.isoformat(),
            SHIPINSTRUCT[key % 4], SHIPMODE[key % 7], f"lineitem comment {key}"))
    write("lineitem", lines)


if __name__ == "__main__":
    main()
