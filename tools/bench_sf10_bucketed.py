"""sf10 TPC-H over BUCKETED fixtures (VERDICT r13 next-round #1,
lever b): registers the tools/make_sf10_bucketed.py layout —
lineitem/orders CLUSTERED BY orderkey, customer by custkey, one file
per bucket, SORTED BY the key — and times the same entry-module
queries through _t's "catalog:" scheme, so the orders<->lineitem
SortMergeJoin runs storage-partitioned: no exchange on either side.
DuckDB replays the identical oracle SQL over the same parquet files
(bucketing is invisible to it — plain parquet globs).

Usage: python tools/bench_sf10_bucketed.py [out.json] [fixture_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_sf1 import TPCH  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem".split()


def register(spark, fix_dir):
    with open(os.path.join(fix_dir, "_bucketed_meta.json")) as f:
        meta = json.load(f)
    n = meta["buckets"]
    for name, t in meta["tables"].items():
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")
        cluster = (
            f"CLUSTERED BY ({t['key']}) SORTED BY ({t['key']}) "
            f"INTO {n} BUCKETS"
            if t["key"]
            else ""
        )
        spark.sql(
            f"CREATE TABLE b_{name} ({t['schema_ddl']}) USING parquet "
            f"{cluster} LOCATION '{t['location']}'"
        )
    return meta


def main(out_path="BENCH_SF10_TPCH_BUCKETED_r14.json", fix_dir="sf10_bucketed"):
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    fix_dir = os.path.abspath(fix_dir)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.warehouse.dir", os.path.join(fix_dir, "_wh"))
        .appName("ibis_spark-sf10-bucketed")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    meta = register(spark, fix_dir)
    qs = entry_mod.queries()
    res = {}
    for name in TPCH:
        if name not in qs:
            continue
        best = None
        try:
            df = qs[name](spark, "catalog:b_")
            for _ in range(2):
                df.write.format("noop").mode("overwrite").save()
            for _ in range(3):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                best = min(best or 1e9, time.time() - t0)
        except Exception as e:
            print(f"spark error {name}: {e}", file=sys.stderr)
            res[name] = {"spark_sf10": None}
            continue
        res[name] = {"spark_sf10": round(best, 3)}
        print(f"{name}: spark sf10 bucketed = {best:.3f}s", flush=True)
    spark.stop()

    import duckdb

    osql = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        loc = meta["tables"][t]["location"]
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{loc}/*.parquet')"
        )
    for name in res:
        sql = osql.get(name)
        if not sql:
            res[name]["duckdb_sf10"] = None
            continue
        try:
            con.execute(sql).fetchall()
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                con.execute(sql).fetchall()
                best = min(best, time.time() - t0)
            res[name]["duckdb_sf10"] = round(best, 3)
        except Exception as e:
            print(f"duckdb error {name}: {e}", file=sys.stderr)
            res[name]["duckdb_sf10"] = None
        print(f"duckdb {name}: {res[name]['duckdb_sf10']}s", flush=True)

    sp = [v["spark_sf10"] for v in res.values() if v.get("spark_sf10")]
    du = [v["duckdb_sf10"] for v in res.values() if v.get("duckdb_sf10")]
    out = {
        "queries": res,
        "metric": "tpch_sf10_bucketed_total_wall",
        "layout": "bucketed32_sorted_orderkey",
        "spark_total": round(sum(sp), 3),
        "duckdb_total": round(sum(du), 3),
        "ratio": round(sum(sp) / sum(du), 2) if du else None,
        "sf": 10.0,
        "n": len(sp),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*(sys.argv[1:3] or ["BENCH_SF10_TPCH_BUCKETED_r14.json"]))
