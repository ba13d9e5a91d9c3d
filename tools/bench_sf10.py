"""sf10 anchor for the heaviest pipeline ops (VERDICT r11 stretch
item): dedup_clusters / embedding_clusters / dedup_embedding timed at
sf0.1, sf1 and sf10 (tools/make_sf10.py output) with bench.py's warm
protocol — the third decade of the banded-LSH scale story.  DuckDB is
deliberately absent: its oracle for the clustering closure is a
recursive DNF that did not finish at sf1 (SCALE.md round 10); the sf10
read is Spark-vs-itself wall-ratio per decade.

Usage: python tools/bench_sf10.py [out.json]   (default: SF10_ANCHOR.json)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = ["dedup_clusters", "embedding_clusters", "dedup_embedding"]
SFS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "sf1_data"), ("sf10", "sf10_data")]


def main(out_path: str = "SF10_ANCHOR.json") -> None:
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
        .appName("ibis_spark-sf10-anchor")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def time_one(name, sf_dir, reps=2):
        best = None
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            for _ in range(reps):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best or 1e9, time.time() - t0)
        except Exception as e:
            print(f"error {name} @ {sf_dir}: {e}", file=sys.stderr)
            return None
        return round(best, 3)

    res = {}
    for name in NAMES:
        row = {}
        for label, sf_dir in SFS:
            row[f"spark_{label}"] = time_one(name, sf_dir)
            print(f"{name} @ {label}: {row[f'spark_{label}']}s", flush=True)
        res[name] = row
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "SF10_ANCHOR.json")
