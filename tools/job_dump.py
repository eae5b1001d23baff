"""Run one registry query (warm) and dump every Spark job it submitted —
id, duration, description/callsite — via the UI REST API.

Usage: python tools/job_dump.py [--sf SF_DIR] [-n WARMUPS] name
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid19_spark.plans.registry import QUERY_REGISTRY  # noqa: E402
from covid19_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-n", type=int, default=1, help="untracked warmup runs first")
    args = ap.parse_args()

    spark = get_spark("covid19_spark_jobdump", extra_conf={"spark.ui.enabled": "true"})
    from covid19_spark.sources.tables import load_table

    for t in ("region", "lineitem", "orders", "documents", "embeddings", "events"):
        load_table(spark, t, args.sf).count()

    fn = QUERY_REGISTRY[args.name].fn
    for _ in range(args.n):
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    j0 = int(spark._jsc.sc().dagScheduler().nextJobId())
    t0 = time.perf_counter()
    fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    app_id = spark.sparkContext.applicationId
    url = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app_id}/jobs?status=succeeded"
    jobs = json.loads(urllib.request.urlopen(url).read())
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    rows = []
    for j in jobs:
        if j["jobId"] < j0:
            continue
        sub = datetime.strptime(j["submissionTime"], fmt)
        end = datetime.strptime(j["completionTime"], fmt)
        rows.append((j["jobId"], sub, end, j.get("description") or j["name"]))
    rows.sort()
    print(f"== {args.name}: wall {wall:.2f}s, {len(rows)} jobs")
    prev_end = None
    for jid, sub, end, desc in rows:
        dur = (end - sub).total_seconds()
        gap = (sub - prev_end).total_seconds() if prev_end else 0.0
        prev_end = max(prev_end, end) if prev_end else end
        print(f"  job {jid:4d}  gap {gap:7.3f}s  dur {dur:7.3f}s  {desc[:110]}")
    print(f"  sum of job durations: {sum((r[2]-r[1]).total_seconds() for r in rows):.2f}s")


if __name__ == "__main__":
    main()
