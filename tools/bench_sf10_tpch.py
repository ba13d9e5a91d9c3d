"""TPC-H at sf10 (~60M lineitem rows): the first decade where the data
term dominates both engines' fixed overheads — the scale-relevant
comparison the sf0.1/sf1 columns can't give (BENCH gate context;
SCALE.md r13).  Emits BENCH_SF10_TPCH_r13-style JSON: per-query spark
wall + in-run DuckDB on the identical oracle SQL over the same
parquet, plus aggregate totals and ratio.

Usage: python tools/bench_sf10_tpch.py [out.json] [data_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_sf1 import TPCH  # noqa: E402


def main(out_path="BENCH_SF10_TPCH_r13.json", data_dir="sf10_tpch"):
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .appName("ibis_spark-sf10-tpch")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    res = {}
    for name in TPCH:
        if name not in qs:
            continue
        best = None
        try:
            df = qs[name](spark, data_dir)
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
        print(f"{name}: spark sf10 = {best:.3f}s", flush=True)
    spark.stop()

    import duckdb

    osql = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{data_dir}/{t}.parquet')"
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
        "metric": "tpch_sf10_total_wall",
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
    main(*(sys.argv[1:3] or ["BENCH_SF10_TPCH_r13.json"]))
