"""Per-lever sf10 TPC-H measurements (VERDICT r13 next-round #1).

Times the slow sf10 queries (q3 61.8x, q4 17.6x, q5 16.0x, q21, q10,
q17) under runtime-settable physical levers, one fresh run per config:

  base   — the bench_sf10_tpch.py config (SMJ, AQE, 32 shuffle parts)
  shj    — spark.sql.join.preferSortMergeJoin=false (shuffled hash
           join: skips both sort legs of the orders<->lineitem exchange)
  parts64/128 — more initial shuffle partitions (AQE coalesces back;
           smaller sort runs, more scan->shuffle parallelism)
  shj+parts — combined

Usage: python tools/levers_sf10.py [data_dir] [qname ...]
Prints one JSON line per (query, config) and a summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLOW = [
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q17_small_quantity",
    "q21_suppliers_kept_waiting",
]

CONFIGS = {
    "base": {},
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
    "parts128": {"spark.sql.shuffle.partitions": "128"},
    "shj+parts128": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.shuffle.partitions": "128",
    },
}


def main(data_dir="sf10_tpch", names=None):
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
        .appName("ibis_spark-sf10-levers")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = names or SLOW
    defaults = {
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.shuffle.partitions": cpus,
    }
    out = {}
    for name in names:
        out[name] = {}
        for cfg_name, cfg in CONFIGS.items():
            for k, v in {**defaults, **cfg}.items():
                spark.conf.set(k, v)
            try:
                df = qs[name](spark, data_dir)
                df.write.format("noop").mode("overwrite").save()  # warm
                best = 1e9
                for _ in range(2):
                    t0 = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, time.time() - t0)
            except Exception as e:
                print(f"error {name}/{cfg_name}: {e}", file=sys.stderr)
                best = None
            out[name][cfg_name] = round(best, 3) if best else None
            print(json.dumps({"q": name, "cfg": cfg_name, "sec": out[name][cfg_name]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "sf10_tpch", sys.argv[2:] or None)
