"""Materialize an sf10 TPC-H slice (~100x sf0.1) at sf10_tpch/.

Same key-remapped replication discipline as tools/make_sf1.py (which
documents WHY replication, not dbgen: the repo's synthetic literals
must keep matching), sourced from sf1_data/ with MULT=10 so every
query's selectivity stays identical while rows grow another decade.
Only the seven TPC-H tables — the pipeline tables have their own sf10
fixture (tools/make_sf10.py) built with the seeded-permutation maps.

Purpose: the sf0.1/sf1 TPC-H columns are fixed-overhead-dominated for
BOTH engines (Spark's JVM floor, DuckDB's sub-100 ms walls); sf10
(~60 M lineitem rows) is the first decade where the data term
dominates, i.e. the decade that actually speaks to the 100 TB
question.  Timing-anchor data only; nothing here is read by tests/ or
the driver.

Usage: python tools/make_sf10_tpch.py [out_dir]   (default: sf10_tpch/)
"""

import os
import sys

import duckdb

SRC = "sf1_data"
MULT = 10

# sf1 key domains (10x the sf0.1 domains in make_sf1.py)
D_CUST = 150000
D_SUPP = 10000
D_PART = 200000
D_ORD = 1500000


def main(out_dir: str = "sf10_tpch") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({MULT})) AS k")

    def write(name: str, select_sql: str) -> None:
        out = os.path.join(out_dir, f"{name}.parquet")
        con.execute(
            f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET, "
            f"COMPRESSION SNAPPY)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}')"
        ).fetchone()[0]
        print(f"{name}: {n} rows -> {out}", flush=True)

    for dim in ("nation", "region"):
        write(dim, f"SELECT * FROM read_parquet('{SRC}/{dim}.parquet')")

    write("customer", f"""
        SELECT (c_custkey + k * {D_CUST})::BIGINT AS c_custkey,
               printf('Customer#%09d', c_custkey + k * {D_CUST}) AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet'), reps
    """)

    write("supplier", f"""
        SELECT (s_suppkey + k * {D_SUPP})::BIGINT AS s_suppkey,
               printf('Supplier#%09d', s_suppkey + k * {D_SUPP}) AS s_name,
               s_nationkey, s_acctbal
        FROM read_parquet('{SRC}/supplier.parquet'), reps
    """)

    write("part", f"""
        SELECT (p_partkey + k * {D_PART})::BIGINT AS p_partkey,
               CASE WHEN k = 0 THEN p_name
                    ELSE p_name || ' %' || k::VARCHAR END AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM read_parquet('{SRC}/part.parquet'), reps
    """)

    write("orders", f"""
        SELECT (o_orderkey + k * {D_ORD})::BIGINT AS o_orderkey,
               (o_custkey + k * {D_CUST})::BIGINT AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), reps
    """)

    write("lineitem", f"""
        SELECT (l_orderkey + k * {D_ORD})::BIGINT AS l_orderkey,
               (l_partkey + k * {D_PART})::BIGINT AS l_partkey,
               (l_suppkey + k * {D_SUPP})::BIGINT AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), reps
    """)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "sf10_tpch")
