"""Session-age tax probe: time a probe set fresh, age the JVM by running the
full sweep once, re-time the probe set in the SAME session, and dump JVM
compiler/codecache state at both points.

The r14 midpoint bench showed HOF-heavy queries running ~3x slower in-sweep
than isolated (ivfpq_cosine_topk 1.96 s isolated vs 5.6 s at sweep position
~90), with the extra wall entirely inside Spark job durations (executor
side).  This probe separates "the plan is slow" from "the 214-query JVM is
slow" and lets JVM options (code cache size, tiered compilation) be A/B'd:

    SPARK_GRAFT_JVM_OPTS="-XX:ReservedCodeCacheSize=1g" python tools/aging_probe.py

Usage: python tools/aging_probe.py [--sf SF_DIR] [--age N] [probe ...]
"""

from __future__ import annotations

import argparse
import gc
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid19_spark.plans.registry import QUERY_REGISTRY  # noqa: E402
from covid19_spark.session import get_spark  # noqa: E402

DEFAULT_PROBES = [
    "ivfpq_cosine_topk",
    "sq8_cosine_topk",
    "maxsim_topk",
    "region_revenue",
    "price_quantiles",
    "simhash_pairs",
]


def jvm_stats(spark) -> str:
    pid = spark._jvm.java.lang.ProcessHandle.current().pid()
    out = []
    for cmd in ("Compiler.codecache", "VM.classloader_stats"):
        try:
            r = subprocess.run(
                ["jcmd", str(pid), cmd], capture_output=True, text=True, timeout=30
            )
            if cmd == "Compiler.codecache":
                out.append(r.stdout)
            else:
                tail = [l for l in r.stdout.splitlines() if l.startswith("Total")]
                out.append("\n".join(tail))
        except Exception as e:  # pragma: no cover - diagnostics only
            out.append(f"{cmd}: {e}")
    return "\n".join(out)


def settle(spark) -> None:
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()
    spark.range(1).count()
    time.sleep(0.2)


def time_set(spark, sf_dir, names, n=2) -> dict[str, float]:
    res = {}
    for name in names:
        fn = QUERY_REGISTRY[name].fn
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            settle(spark)
        res[name] = min(runs)
        print(f"  {name}: {runs}", flush=True)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("probes", nargs="*", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--age", type=int, default=0, help="age over first N sweep queries (0=all)")
    args = ap.parse_args()
    probes = args.probes or DEFAULT_PROBES

    extra = {}
    opts = os.environ.get("SPARK_GRAFT_JVM_OPTS")
    if opts:
        extra["spark.driver.extraJavaOptions"] = opts
    spark = get_spark("covid19_spark_aging", extra_conf=extra)
    from covid19_spark.sources.tables import load_table

    for t in ("region", "lineitem", "orders", "documents", "embeddings", "events"):
        load_table(spark, t, args.sf).count()

    print("== FRESH ==", flush=True)
    fresh = time_set(spark, args.sf, probes)
    print(jvm_stats(spark), flush=True)

    sweep = sorted(QUERY_REGISTRY)
    if args.age:
        sweep = sweep[: args.age]
    print(f"== AGING over {len(sweep)} queries ==", flush=True)
    t0 = time.perf_counter()
    for i, name in enumerate(sweep):
        fn = QUERY_REGISTRY[name].fn
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        settle(spark)
        if i % 50 == 49:
            print(f"  aged {i + 1}/{len(sweep)} ({time.perf_counter() - t0:.0f}s)", flush=True)
    print(f"  aging done in {time.perf_counter() - t0:.0f}s", flush=True)

    print("== AGED ==", flush=True)
    aged = time_set(spark, args.sf, probes)
    print(jvm_stats(spark), flush=True)

    print("== SUMMARY (fresh -> aged) ==", flush=True)
    for name in probes:
        f, a = fresh[name], aged[name]
        print(f"  {name}: {f} -> {a}  (x{a / f:.2f})", flush=True)


if __name__ == "__main__":
    main()
