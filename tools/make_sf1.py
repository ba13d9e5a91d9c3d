"""Materialize an sf1 bench anchor (~10x sf0.1) at sf1_data/.

Why replication instead of DuckDB ``CALL dbgen(sf=1)``: the repo's
testdata is the driver's SYNTHETIC TPC-H-ish schema (subset columns,
'Customer#%09d' / 'Brand#N' / 'NATION_N' literals, 1995-2001 dates,
plus events/documents/embeddings tables dbgen doesn't have). Real dbgen
output would silently zero out every literal-filtered query (q5's
region name, q19's brands, ...) and leave the five heaviest pipeline
ops with no input at all. Key-remapped replication keeps every query's
selectivity IDENTICAL to sf0.1, which is exactly what a marginal-cost
anchor needs: same plans, 10x the rows.

Replication discipline (mirrors SCALE.md's fresh-territory protocol):
  - fact/dim keys get +k*DOMAIN offsets per replica k so referential
    joins stay within-replica (TPC-H's own scaling behavior);
  - entity names are regenerated from the NEW key (name-grouped
    aggregates scale like the keys do);
  - nation/region stay fixed (25/5 rows), as in TPC-H;
  - document texts get one replica token appended so near-dup density
    stays FIXED (identical copies would turn each doc into a 10-clique
    and grow LSH candidate pairs quadratically, which is not what 10x
    real data does);
  - embeddings get a deterministic per-replica perturbation with the
    same rationale, then re-normalized to unit length.

Timing-anchor data only — the correctness gate stays the sf0.01 DuckDB
oracle; nothing here is read by tests/ or the driver.

Usage: python tools/make_sf1.py [out_dir]   (default: sf1_data/)
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
MULT = 10

DOMAINS = {
    "customer": ("c_custkey", 15000),
    "supplier": ("s_suppkey", 1000),
    "part": ("p_partkey", 20000),
    "orders": ("o_orderkey", 150000),
    "events": ("event_id", 100000),
    "documents": ("doc_id", 5000),
    "embeddings": ("vec_id", 2000),
}


def main(out_dir: str = "sf1_data") -> None:
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
        print(f"{name}: {n} rows -> {out}")

    # nation / region: fixed dimensions, byte-identical copy
    for dim in ("nation", "region"):
        write(dim, f"SELECT * FROM read_parquet('{SRC}/{dim}.parquet')")

    write("customer", f"""
        SELECT (c_custkey + k * 15000)::BIGINT AS c_custkey,
               printf('Customer#%09d', c_custkey + k * 15000) AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet'), reps
    """)

    write("supplier", f"""
        SELECT (s_suppkey + k * 1000)::BIGINT AS s_suppkey,
               printf('Supplier#%09d', s_suppkey + k * 1000) AS s_name,
               s_nationkey, s_acctbal
        FROM read_parquet('{SRC}/supplier.parquet'), reps
    """)

    # p_name gets a suffix for k>0: contains/LIKE filters keep matching,
    # name-grouped cardinality scales with the key domain
    write("part", f"""
        SELECT (p_partkey + k * 20000)::BIGINT AS p_partkey,
               CASE WHEN k = 0 THEN p_name
                    ELSE p_name || ' #' || k::VARCHAR END AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM read_parquet('{SRC}/part.parquet'), reps
    """)

    write("orders", f"""
        SELECT (o_orderkey + k * 150000)::BIGINT AS o_orderkey,
               (o_custkey + k * 15000)::BIGINT AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), reps
    """)

    write("lineitem", f"""
        SELECT (l_orderkey + k * 150000)::BIGINT AS l_orderkey,
               (l_partkey + k * 20000)::BIGINT AS l_partkey,
               (l_suppkey + k * 1000)::BIGINT AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), reps
    """)

    # events: fresh users per replica, same time window (10x concurrent
    # traffic, per-user session density fixed)
    write("events", f"""
        SELECT (event_id + k * 100000)::BIGINT AS event_id, ts,
               (user_id + k * 1500)::BIGINT AS user_id,
               event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'), reps
    """)

    # documents: per-replica lowercase-alphabet ROTATION (bijective
    # character map, whitespace/digits untouched). Within a replica the
    # map is one-to-one, so every within-replica dup/near-dup relation
    # and every token/shingle count is preserved EXACTLY; across
    # replicas the shingle sets become disjoint, so dup pairs scale
    # linearly (10x). The first attempt — appending one replica token —
    # left cross-replica Jaccard at ~0.98, turning every doc into a
    # 10-clique of near-dups: verified-edge volume went ~45x and
    # dedup_clusters measured a phantom 7.8x wall blow-up that was the
    # DATA's fault, not the plan's.
    alpha = "abcdefghijklmnopqrstuvwxyz"
    doc_parts = []
    for k in range(MULT):
        rot = alpha[k:] + alpha[:k]
        doc_parts.append(f"""
        SELECT (doc_id + {k * 5000})::BIGINT AS doc_id,
               translate(text, '{alpha}', '{rot}') AS text,
               lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet')
        """)
    write("documents", " UNION ALL ".join(doc_parts))

    # embeddings: deterministic per-replica direction nudge (~0.3 rad),
    # re-normalized — cross-replica cosine drops below dedup/ANN
    # thresholds, within-replica geometry untouched
    write("embeddings", f"""
        WITH shifted AS (
          SELECT (vec_id + k * 2000)::BIGINT AS vec_id,
                 list_transform(
                   embedding,
                   (x, i) -> CASE WHEN k = 0 THEN x::DOUBLE
                             ELSE x::DOUBLE
                                  + 0.3 * sin(((vec_id * 131 + k * 17
                                                + i * 7) % 97)::DOUBLE)
                             END) AS e,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'), reps),
        normed AS (
          SELECT vec_id,
                 sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm,
                 e, label
          FROM shifted)
        SELECT vec_id,
               list_transform(e, x -> (x / nrm)::FLOAT) AS embedding,
               label
        FROM normed
    """)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "sf1_data")
