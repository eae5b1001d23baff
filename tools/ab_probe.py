"""Dev-loop A/B probe: time queries AND count Spark jobs per run.

Usage: python tools/ab_probe.py [-n RUNS] [--sf SF_DIR] name [name ...]
Prints one line per query: name, per-run seconds, per-run job counts.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid19_spark.plans.registry import QUERY_REGISTRY  # noqa: E402
from covid19_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("covid19_spark_ab")
    from covid19_spark.sources.tables import load_table

    for t in ("region", "lineitem", "orders", "documents", "embeddings", "events"):
        load_table(spark, t, args.sf).count()

    def next_job_id() -> int:
        return int(spark._jsc.sc().dagScheduler().nextJobId())

    for name in args.names:
        fn = QUERY_REGISTRY[name].fn
        runs, jobs = [], []
        for _ in range(args.n):
            j0 = next_job_id()
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            jobs.append(next_job_id() - j0)
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            spark.range(1).count()
            time.sleep(0.2)
        print(f"{name}: sec={runs} (min {min(runs)}) jobs={jobs}", flush=True)


if __name__ == "__main__":
    main()
