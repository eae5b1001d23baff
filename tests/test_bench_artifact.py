"""Pin the bench artifact schema (VERDICT r07 task #2).

``bench.py`` records, per query, the MIN across runs (round-over-round
comparable) AND the raw run list plus a ``spread_flags`` column naming the
queries whose runs disagreed >2x — so a load-sensitive query self-identifies
in the artifact instead of costing a day of adjudication separating a real
regression from environmental drift.

The full sweep takes minutes, so these tests exercise the artifact-building
logic directly: the in-repo BENCH_LOCAL.json (written by the last sweep)
must carry the schema, and the spread-flag rule is pinned as pure logic.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_LOCAL = os.path.join(REPO, "BENCH_LOCAL.json")


def _flags(all_runs):
    # mirror of bench.py's spread rule — keep the two in sync
    return sorted(
        n for n, rs in all_runs.items() if min(rs) > 0.5 and max(rs) > 2.0 * min(rs)
    )


def test_spread_flag_rule():
    runs = {
        "steady": [1.0, 1.1],
        "load_sensitive": [10.0, 4.0, 3.9],  # max > 2x min → flagged
        "tiny_noisy": [0.1, 0.4],  # sub-threshold absolute time → ignored
        "borderline": [2.0, 3.9],  # < 2x → not flagged
    }
    assert _flags(runs) == ["load_sensitive"]


def test_median3_divisor_smooths_single_outlier():
    # mirror of bench.py's _nearest_anchor — keep the two in sync.
    # r13's failure mode: one 0.575 s sample in an ~0.84 s series made every
    # query nearest that position read x1.5 "slower" on an unchanged plan.
    samples = [[0, 0.85], [25, 0.83], [50, 0.575], [75, 0.86], [100, 0.84]]

    def divisor(pos):
        near = sorted(samples, key=lambda s: abs(s[0] - pos))[:3]
        vals = sorted(a for _, a in near)
        return vals[len(vals) // 2]

    # queries near the outlier position normalize by a neighboring healthy
    # sample, not the outlier itself
    assert divisor(50) == 0.83
    assert divisor(49) == 0.83
    assert divisor(60) == 0.83
    # far from the outlier, untouched
    assert divisor(0) == 0.83  # median of [0.85, 0.83, 0.575] -> 0.83
    assert divisor(100) == 0.84
    # degrades sanely with a short series (early in the sweep)
    assert divisor(0) > 0


@pytest.mark.skipif(
    not os.path.exists(BENCH_LOCAL), reason="no local bench artifact yet"
)
def test_bench_local_schema():
    with open(BENCH_LOCAL) as f:
        art = json.loads(f.readline())
    for key in ("metric", "value", "unit", "queries", "runs", "spread_flags", "sf"):
        assert key in art, f"bench artifact missing {key!r}"
    assert set(art["runs"]) == set(art["queries"])
    for name, rs in art["runs"].items():
        # 2 in-sweep runs + up to one each of: in-sweep arbitration,
        # cross-sweep drift re-time, spread re-time (drift and spread are
        # mutually exclusive per query)
        assert isinstance(rs, list) and 2 <= len(rs) <= 4
        # the recorded headline number is the min of the raw runs
        assert abs(min(rs) - art["queries"][name]) < 1e-6, name
    assert art["spread_flags"] == _flags(art["runs"])
    # calibration anchor, interleaved form (VERDICT r08 task #2, reworked
    # r13 task #1): the fixed pure-Spark workload is re-sampled every
    # anchor_every queries; each query normalizes by the sample NEAREST
    # the sweep position of its recorded min (min_pos), and the whole
    # [position, sec] series is recorded so intra-sweep drift is visible.
    for key in (
        "anchor_sec", "anchor_start_sec", "anchor_end_sec",
        "anchor_samples", "anchor_every", "min_pos",
        "queries_norm", "value_norm", "value_norm_nearest",
    ):
        assert key in art, f"bench artifact missing {key!r}"
    samples = art["anchor_samples"]
    assert len(samples) >= 3 and all(a > 0 for _, a in samples)
    assert samples[0][0] == 0 and samples[0][1] == art["anchor_start_sec"]
    assert samples[-1][1] == art["anchor_end_sec"]
    # headline anchor_sec is the MEAN of every sample (value_norm keeps the
    # r08-r12 definition total/anchor_sec for cross-round continuity)
    assert abs(
        art["anchor_sec"] - round(sum(a for _, a in samples) / len(samples), 3)
    ) < 5e-3
    assert abs(art["value_norm"] - round(art["value"] / art["anchor_sec"], 3)) < 1e-6
    assert set(art["queries_norm"]) == set(art["queries"])
    assert set(art["min_pos"]) == set(art["queries"])

    # r14 (VERDICT r13 task #1): the per-query divisor is the MEDIAN of the
    # 3 samples nearest the query's min_pos ("median3"), robust to a single
    # outlier sample (r13's 0.575 s sample inflated ~25 sub-second queries'
    # norms x1.8-x2.5). Artifacts record which rule produced queries_norm;
    # an r13 artifact (no norm_rule key) recomputes under the old
    # single-nearest rule.
    rule = art.get("norm_rule", "nearest1")

    def divisor(pos):
        if rule == "nearest1":
            return min(samples, key=lambda s: abs(s[0] - pos))[1]
        near = sorted(samples, key=lambda s: abs(s[0] - pos))[:3]
        vals = sorted(a for _, a in near)
        return vals[len(vals) // 2]

    for name, norm in art["queries_norm"].items():
        want = round(art["queries"][name] / divisor(art["min_pos"][name]), 3)
        assert abs(norm - want) < 1e-6, name
    assert abs(
        art["value_norm_nearest"]
        - round(sum(art["queries_norm"].values()), 3)
    ) < 1e-6
