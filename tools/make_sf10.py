"""Materialize the sf10 DOCUMENT/EMBEDDING slice (~100x sf0.1) at
sf10_data/ — the second scale decade for the three heaviest pipeline
ops (VERDICT r11 stretch item: dedup_clusters / embedding_clusters /
dedup_embedding on fresh territory, so densification doesn't confound
the read).

Same replication discipline as tools/make_sf1.py, with one upgrade:
the per-replica character map is a SEEDED PERMUTATION of the lowercase
alphabet (not a rotation — only 26 distinct rotations exist, and 100
replicas would collide, recreating the cross-replica dup cliques the
sf1 rotation was built to avoid).  A bijection preserves every
within-replica token/shingle relation exactly; distinct permutations
keep cross-replica shingle sets disjoint, so dup density stays FIXED
while volume grows 100x — which is what 100x of real data does.

Only documents and embeddings are materialized (the TPC-H side already
has its sf1 anchor; 100x lineitem would be ~1.1 GB of parquet for no
new signal).  Timing-anchor data only — nothing here is read by
tests/ or the driver.

Usage: python tools/make_sf10.py [out_dir]   (default: sf10_data/)
"""

import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
MULT = 100


def main(out_dir: str = "sf10_data") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    alpha = "abcdefghijklmnopqrstuvwxyz"
    rng = random.Random(1210)
    doc_parts = []
    for k in range(MULT):
        perm = list(alpha)
        if k:
            rng.shuffle(perm)
        perm = "".join(perm)
        doc_parts.append(f"""
        SELECT (doc_id + {k * 5000})::BIGINT AS doc_id,
               translate(text, '{alpha}', '{perm}') AS text,
               lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet')
        """)
    out = os.path.join(out_dir, "documents.parquet")
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{out}' "
        f"(FORMAT PARQUET, COMPRESSION SNAPPY)"
    )
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"documents: {n} rows -> {out}")

    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({MULT})) AS k")
    out = os.path.join(out_dir, "embeddings.parquet")
    con.execute(f"""
        COPY (
          WITH shifted AS (
            SELECT (vec_id + k * 2000)::BIGINT AS vec_id,
                   list_transform(
                     embedding,
                     (x, i) -> CASE WHEN k = 0 THEN x::DOUBLE
                               ELSE x::DOUBLE
                                    + 0.3 * sin(((vec_id * 131 + k * 17
                                                  + i * 7) % 97)::DOUBLE)
                                    + 0.2 * cos(((vec_id * 29 + k * 41
                                                  + i * 13) % 89)::DOUBLE)
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
        ) TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)
    """)
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"embeddings: {n} rows -> {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "sf10_data")
