"""sf1 bench anchor (VERDICT r9 item 2): the 22 TPC-H entries + the 5
heaviest pipeline ops, timed warm at sf0.1 and sf1 (tools/make_sf1.py
output) with bench.py's exact protocol (2 consecutive warmups, then
best-of-3, noop sink), plus DuckDB running the identical oracle SQL on
the same sf1 parquet. Emits one JSON file (default SF1_ANCHOR.json).

Usage: python tools/bench_sf1.py [out.json] [--only-geo]
  --only-geo times just the GEO list and MERGES the rows into an
  existing out.json (r11: adds the geo slice to the r10 anchor
  without re-running the 27 TPC-H/pipeline entries).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TPCH = [
    "q1", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_priority_shipping",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_cnt", "q17_small_quantity", "q18_large_volume_customer",
    "q19_discounted_revenue", "q20_big_suppliers",
    "q21_suppliers_kept_waiting", "q22_global_sales_opportunity",
]
HEAVY = [
    "embedding_clusters", "dedup_embedding", "dedup_clusters",
    "connected_components_isolated", "ann_recall",
]
# r11 (VERDICT r10 item 8): the geo slice measured above the JVM floor
# with the same clean protocol — the decode-once rewires + the DE-9IM
# relate entry, plus the grid-join/CC pair.
GEO = [
    "geo_polygon_contains", "geo_segment_cross", "geo_line_metrics",
    "geo_cluster", "geo_dbscan", "geo_square_relations",
]
# r12: the two row-scaling new entries (expression-path DP simplify and
# the set-op sweep); --only-r12 merges just these into an existing
# anchor without re-running the rest (line_merge_report at sf1 would be
# ~20 min of interpreted fold — its sf0.1 cost is recorded in SCALE.md
# round 12 and scales linearly by the same mechanism as clip).
R12 = ["geo_simplify_tolerance", "geo_clip_report"]
# r12-late: the batch set-op path, CRS transforms, buffer, and the
# repartitioned heavies whose sf0.1 walls changed; --only-r12b merges.
R12B = [
    "geo_clip_batch_report", "geo_clip_general_report",
    "geo_transform_report", "geo_buffer_report",
    "geo_wkt_export", "geo_line_cross_report",
]


def main(out_path: str = "SF1_ANCHOR.json", only_geo: bool = False,
         only_r12: bool = False, only_r12b: bool = False,
         only_tpch: bool = False) -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .appName("ibis_spark-sf1-anchor")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    wanted = (
        TPCH if only_tpch
        else R12B if only_r12b
        else R12 if only_r12
        else (GEO if only_geo else TPCH + HEAVY + GEO)
    )
    names = [n for n in wanted if n in qs]
    missing = [n for n in wanted if n not in qs]
    if missing:
        print(f"not in queries(): {missing}", file=sys.stderr)

    def time_one(name, sf_dir):
        best = None
        try:
            for _ in range(2):
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best or 1e9, time.time() - t0)
        except Exception as e:
            print(f"error {name} @ {sf_dir}: {e}", file=sys.stderr)
            return None
        return round(best, 3)

    res = {}
    for name in names:
        t01 = time_one(name, "/root/testdata/sf0.1")
        t1 = time_one(name, "sf1_data")
        res[name] = {"spark_sf0.1": t01, "spark_sf1": t1}
        ratio = round(t1 / t01, 2) if t01 and t1 else None
        print(f"{name}: sf0.1={t01}s sf1={t1}s wall-ratio={ratio}",
              flush=True)
    spark.stop()

    # DuckDB on the identical oracle SQL over the same sf1 parquet
    import duckdb

    osql = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('sf1_data/{t}.parquet')"
        )
    # known-pathological oracles at sf1: the cluster/dbscan closure is
    # a recursive DNF DuckDB needed >720 s for at sf1 (SCALE.md round
    # 10 sf1 anchor) — recording null instead of hanging the run.
    DUCK_SKIP_SF1 = {"geo_cluster", "geo_dbscan"}
    for name in names:
        sql = osql.get(name)
        if not sql or name in DUCK_SKIP_SF1:
            res[name]["duckdb_sf1"] = None
            continue
        try:
            con.execute(sql).fetchall()  # warm
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                con.execute(sql).fetchall()
                best = min(best, time.time() - t0)
            res[name]["duckdb_sf1"] = round(best, 3)
        except Exception as e:
            print(f"duckdb error {name}: {e}", file=sys.stderr)
            res[name]["duckdb_sf1"] = None
        print(f"duckdb {name}: {res[name]['duckdb_sf1']}s", flush=True)

    if (only_geo or only_r12 or only_r12b) and os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
        merged.update(res)
        res = merged
    if only_tpch:
        # BENCH_SF1_r{N}.json shape (VERDICT r12 item 7): the per-query
        # map plus the aggregate spark/duckdb totals and their ratio —
        # the at-scale counterpart of the sf0.1 headline gate
        sp = [v["spark_sf1"] for v in res.values() if v.get("spark_sf1")]
        du = [v["duckdb_sf1"] for v in res.values() if v.get("duckdb_sf1")]
        res = {
            "queries": res,
            "metric": "tpch_sf1_total_wall",
            "spark_total": round(sum(sp), 3),
            "duckdb_total": round(sum(du), 3),
            "ratio": round(sum(sp) / sum(du), 2) if du else None,
            "sf": 1.0,
            "n": len(sp),
        }
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    flags = ("--only-geo", "--only-r12", "--only-r12b", "--only-tpch")
    args = [a for a in sys.argv[1:] if a not in flags]
    main(
        args[0] if args else "SF1_ANCHOR.json",
        only_geo="--only-geo" in sys.argv,
        only_r12="--only-r12" in sys.argv,
        only_r12b="--only-r12b" in sys.argv,
        only_tpch="--only-tpch" in sys.argv,
    )
