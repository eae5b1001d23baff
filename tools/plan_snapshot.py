"""Snapshot the `.explain("formatted")` output of selected registry queries
to plans/<round>/<name>_<tag>.txt — the before/after plan evidence for
optimization rounds.

Usage: python tools/plan_snapshot.py --tag before --round r14 [--sf SF_DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid19_spark.plans.registry import QUERY_REGISTRY  # noqa: E402
from covid19_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--round", default="r14")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("plan_snapshot")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.round,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in args.names:
        df = QUERY_REGISTRY[name].fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {args.sf} ({args.tag})\n\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
