"""Ad-hoc single-query timer: `python tools/timeq.py name1 name2 ...`

Times the named `queries()` entries at $SPARK_GRAFT_SF_DIR (default
sf0.1) with the bench protocol shape (construct once, 1 warm, best of
2) — a fast feedback loop while optimizing one entry; the tracked
artifact remains bench.py's.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .appName("ibis_spark-timeq")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for n in names:
        t0 = time.time()
        df = qs[n](spark, SF_DIR)
        built = time.time() - t0
        df.write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"{n}: build={built:.2f}s exec_best={best:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
