"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect overhead). One warm-up pass amortizes session/JIT
startup; reported numbers are the steady-state wall time per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

HEADLINE = [
    "q1",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_customer",
    "agg_filtered",
    "agg_having",
    "join_inner_chain",
    "join_semi",
    "join_theta",
    "join_asof",
    "set_union_all",
    "set_difference_all",
    "window_rank",
    "window_cumsum",
    "in_subquery",
    "scalar_subquery",
    "q17_small_quantity",
    "scalar_numeric",
    "unnest_tokens",
    "dedup_exact",
    "dedup_minhash",
    "ann_cosine_topk",
    "tumble",
    "interval_range_window",
    "text_stats",
    "udf_pandas",
]


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .appName("ibis_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]

    def run(name):
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()

    # warm-up every query once: BASELINE.md's contract is steady-state
    # (warm session) per-query time — the first run pays plan analysis +
    # whole-stage codegen compilation, which at sf0.1 dwarfs execution
    for n in names:
        try:
            run(n)
        except Exception:
            pass

    times = {}
    for n in names:
        t0 = time.time()
        try:
            run(n)
            times[n] = round(time.time() - t0, 3)
        except Exception as e:
            print(f"bench error in {n}: {e}", file=sys.stderr)
            times[n] = None

    ok_times = [t for t in times.values() if t is not None]
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(ok_times), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
