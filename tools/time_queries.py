"""Focused timing harness: run selected registry queries N times at a given
sf dir and print per-run timings — the iteration loop for performance work
(bench.py is the official artifact; this is the dev loop).

Usage: python tools/time_queries.py [-n RUNS] [--sf SF_DIR] name [name ...]
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
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("covid19_spark_timing")
    from covid19_spark.sources.tables import load_table

    for t in ("region", "lineitem", "orders", "documents", "embeddings", "events"):
        load_table(spark, t, args.sf).count()

    for name in args.names:
        fn = QUERY_REGISTRY[name].fn
        runs = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            # identical settle protocol to bench.py, so "isolated" numbers
            # from this tool are comparable to in-sweep bench numbers —
            # without it, run 2+ reuses caches the bench clears, and retests
            # systematically flatter the query (VERDICT r04 called this out)
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
            spark.range(1).count()
            time.sleep(0.2)
        print(f"{name}: {runs} (min {min(runs)})", flush=True)


if __name__ == "__main__":
    main()
