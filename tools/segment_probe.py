"""Reproduce the bench's position-local inflation on an alphabetical
segment, and A/B the settle protocol.

The r14 midpoint sweep recorded ivfpq_cosine_topk at 5.63 s with AGREEING
runs while isolated min-of-3 with equal anchors gave 1.96 s — the r10
"pq_cosine_topk 9.9 s in-sweep, 2.9 s isolated" signature.  Hypothesis:
the predecessors' checkpoint/broadcast garbage (async ContextCleaner storm
+ heap churn) outlives the 0.2 s settle and lands inside the next timed
region; because sweep order is alphabetical and stable, the inflation is
position-systematic and the cross-sweep drift gate (which compares to the
equally-inflated previous sweep) never fires.

Usage:
    python tools/segment_probe.py --from hybrid_rrf_topk --to ivm_stream_replay \
        [--settle std|strong] [--probe ivfpq_cosine_topk] [--sf SF_DIR]

Runs the segment with the bench's exact per-query protocol (2 runs,
settle between), prints per-query [run1, run2], then re-times the probe
query isolated after a 3 s quiesce, plus anchor samples at start/end so
box drift is visible.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from covid19_spark.plans.registry import QUERY_REGISTRY  # noqa: E402
from covid19_spark.session import get_spark  # noqa: E402


def make_settle(spark, mode: str):
    def std() -> None:
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        spark.range(1).count()
        time.sleep(0.2)

    def strong() -> None:
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        spark.range(1).count()
        time.sleep(0.5)
        # second full GC after the cleaner had a beat: broadcasts/RDD blocks
        # enqueued by the first collection round get processed, then their
        # own garbage is collected instead of bleeding into the timed region
        spark._jvm.System.gc()
        spark.range(1).count()
        time.sleep(0.3)

    return std if mode == "std" else strong


def anchor(spark) -> float:
    t0 = time.perf_counter()
    (
        spark.range(0, 400_000_000, 1, 32)
        .select(
            (F.col("id") % 1000).alias("k"),
            F.pmod(F.col("id") * 2654435761, F.lit(4294967296)).alias("h"),
        )
        .groupBy("k")
        .agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("c"))
        .write.format("noop").mode("overwrite").save()
    )
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="lo", required=True)
    ap.add_argument("--to", dest="hi", required=True)
    ap.add_argument("--settle", default="std", choices=["std", "strong"])
    ap.add_argument("--probe", default="ivfpq_cosine_topk")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("covid19_spark_segment")
    settle = make_settle(spark, args.settle)
    from covid19_spark.sources.tables import load_table

    for t in ("region", "lineitem", "orders", "documents", "embeddings", "events"):
        load_table(spark, t, args.sf).count()

    names = sorted(QUERY_REGISTRY)
    seg = names[names.index(args.lo) : names.index(args.hi) + 1]
    print(f"segment: {len(seg)} queries, settle={args.settle}", flush=True)
    print(f"anchor_start: {min(anchor(spark), anchor(spark))}", flush=True)
    settle()

    for name in seg:
        fn = QUERY_REGISTRY[name].fn
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            settle()
        print(f"  {name}: {runs} (min {min(runs)})", flush=True)

    print(f"anchor_end: {min(anchor(spark), anchor(spark))}", flush=True)
    # isolated re-time after a long quiesce — the bench's end-of-sweep
    # arbitration environment
    settle()
    time.sleep(3.0)
    fn = QUERY_REGISTRY[args.probe].fn
    iso = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        iso.append(round(time.perf_counter() - t0, 3))
        settle()
    print(f"isolated {args.probe}: {iso} (min {min(iso)})", flush=True)
    print(f"anchor_iso: {min(anchor(spark), anchor(spark))}", flush=True)


if __name__ == "__main__":
    main()
