"""Registration-order contract: the driver's correctness sweep may cover only
a prefix of the registry, so the queries with no driver CORRECTNESS row yet
must register first (see the reorder block at the end of plans/registry.py).

The expectation is derived from the NEWEST CORRECTNESS_r*.json on disk, so
registering a query without adding it to _DRIVER_UNVERIFIED_FIRST — or
leaving the list stale after a new driver artifact lands — fails here
instead of silently losing driver coverage."""

from __future__ import annotations

import glob
import json
import os
import re

from covid19_spark.plans.registry import _DRIVER_UNVERIFIED_FIRST, QUERY_REGISTRY

_HERE = os.path.dirname(__file__)


def _latest_artifact() -> str:
    paths = glob.glob(os.path.join(_HERE, "..", "CORRECTNESS_r*.json"))
    assert paths, "no driver correctness artifact found"
    return max(paths, key=lambda p: int(re.search(r"r(\d+)\.json$", p).group(1)))


def test_unverified_queries_register_first():
    names = list(QUERY_REGISTRY)
    expected_front = [n for n in _DRIVER_UNVERIFIED_FIRST if n in QUERY_REGISTRY]
    assert names[: len(expected_front)] == expected_front


def test_every_query_missing_from_latest_artifact_is_in_front_list():
    """The rotation invariant: anything the latest driver sweep did NOT
    verify must be in the priority-front list so the next sweep reaches it.
    Catches both failure modes: a new query registered without a front-list
    entry, and a front list left stale after a new artifact lands."""
    with open(_latest_artifact()) as f:
        checked = set(json.load(f))
    names = set(QUERY_REGISTRY)
    missing = names - checked
    front = set(_DRIVER_UNVERIFIED_FIRST)
    assert missing <= front, f"not in front list: {sorted(missing - front)}"


def test_front_list_has_no_stale_entries():
    """Every front-list entry is a real registered query — a typo or a
    renamed query would silently shrink the prioritized prefix."""
    assert set(_DRIVER_UNVERIFIED_FIRST) <= set(QUERY_REGISTRY)


SWEEP_WINDOW = 50  # the driver's r02-r06 artifacts each cover a 50-query prefix


def _all_artifacts() -> dict[int, set]:
    out = {}
    for p in glob.glob(os.path.join(_HERE, "..", "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", p).group(1))
        with open(p) as f:
            out[rnd] = set(json.load(f))
    return out


def test_never_verified_queries_sort_before_rotated_out_ones():
    """VERDICT r06 task #1 regression: the old sort key put never-driver-
    verified queries LAST, so with |missing| > window the newest queries
    starved forever.  Replaying the real artifact history must put every
    never-verified query strictly before every ever-verified one."""
    from covid19_spark.plans.registry import derive_front_list

    artifacts = _all_artifacts()
    if not artifacts:
        return
    ever = set().union(*artifacts.values())
    front = derive_front_list(list(QUERY_REGISTRY), artifacts)
    never_positions = [i for i, n in enumerate(front) if n not in ever]
    ever_positions = [i for i, n in enumerate(front) if n in ever]
    if never_positions and ever_positions:
        assert max(never_positions) < min(ever_positions), (
            "never-verified queries must sort first: "
            f"{[front[i] for i in never_positions]}"
        )
    # The concrete r06 starvation set lands inside the sweep window.
    names = list(QUERY_REGISTRY)
    for q in ("corpus_drift", "dup_ngram_stats", "gopher_quality",
              "semantic_dedup_paper_policy"):
        if q in names and q not in ever:
            assert names.index(q) < SWEEP_WINDOW, (q, names.index(q))


def test_rotation_replay_covers_every_query_within_ceiling_rounds():
    """Starvation-freedom, simulated: seed with the real on-disk artifact
    history, then replay rounds where each sweep verifies the first
    SWEEP_WINDOW registry entries under the derived order.  Every registered
    query must appear in EVERY window of ceil(N / SWEEP_WINDOW) consecutive
    sweeps — the old sort key fails this replay (the 4 r06-new queries never
    enter any sweep)."""
    import math

    from covid19_spark.plans.registry import derive_front_list

    artifacts = dict(_all_artifacts())
    base_order = list(QUERY_REGISTRY)
    n_rounds_needed = math.ceil(len(base_order) / SWEEP_WINDOW)
    sweeps = []
    next_round = (max(artifacts) if artifacts else 0) + 1
    for _ in range(n_rounds_needed * 4):
        front = derive_front_list(base_order, artifacts)
        order = front + [n for n in base_order if n not in set(front)]
        sweep = set(order[:SWEEP_WINDOW])
        sweeps.append(sweep)
        artifacts[next_round] = sweep
        next_round += 1
    for i in range(len(sweeps) - n_rounds_needed + 1):
        window_union = set().union(*sweeps[i : i + n_rounds_needed])
        missing = set(base_order) - window_union
        assert not missing, (
            f"queries starved out of sweeps {i}..{i + n_rounds_needed - 1}: "
            f"{sorted(missing)}"
        )


def test_every_query_has_spec_fn_and_doc():
    for name, spec in QUERY_REGISTRY.items():
        assert callable(spec.fn), name
        assert spec.doc, name


def test_errored_rows_do_not_count_as_verified(tmp_path, monkeypatch):
    """Round-10 regression guard: a CORRECTNESS row with err set (the r09
    no_oracle rows) or rows_match false must NOT park the query outside the
    sweep window — load_correctness_artifacts drops it from the round's
    verified set so derive_front_list re-fronts it."""
    import json

    import covid19_spark.plans.registry as reg

    art = {
        "good": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "erred": {"rows_match": None, "schema_match": None, "hash_match": None, "err": "no_oracle"},
        "wrong": {"rows_match": False, "schema_match": True, "hash_match": False, "err": None},
    }
    (tmp_path / "CORRECTNESS_r42.json").write_text(json.dumps(art))
    monkeypatch.setattr(
        "os.path.abspath", lambda p: str(tmp_path), raising=True
    )
    loaded = reg.load_correctness_artifacts()
    assert loaded == {42: {"good"}}
    front = reg.derive_front_list(["good", "erred", "wrong", "brand_new"], loaded)
    assert "good" not in front
    assert set(front) == {"erred", "wrong", "brand_new"}
    assert front[0] == "brand_new"  # never-verified leads


def test_changed_queries_refront_until_reverified():
    """VERDICT r11 #7: a query whose plan/oracle changed in round N must
    re-enter the sweep front even though an OLDER green row exists — and
    must leave it again once any artifact from round >= N re-verifies it
    (the _CHANGED_IN_ROUND entry self-expires)."""
    import covid19_spark.plans.registry as reg

    arts = {11: {"changed_q", "fresh_q"}}
    try:
        reg._CHANGED_IN_ROUND["changed_q"] = 12
        front = reg.derive_front_list(["changed_q", "fresh_q", "new_q"], arts)
        assert "changed_q" in front  # stale green row: re-front
        assert "fresh_q" not in front
        # re-verified at round 12 -> expires out of the front
        front2 = reg.derive_front_list(
            ["changed_q", "fresh_q", "new_q"], {**arts, 12: {"changed_q"}}
        )
        assert "changed_q" not in front2
    finally:
        del reg._CHANGED_IN_ROUND["changed_q"]


def test_live_changed_entries_front_within_sweep_window():
    """Every _CHANGED_IN_ROUND entry not yet re-verified must sit inside
    the first SWEEP_WINDOW registry positions, so the next driver sweep
    actually re-checks the changed plan."""
    import covid19_spark.plans.registry as reg

    arts = reg.load_correctness_artifacts()
    last = {}
    for rnd, names in arts.items():
        for n in names:
            last[n] = max(last.get(n, -1), rnd)
    order = list(QUERY_REGISTRY)
    for name, rnd in reg._CHANGED_IN_ROUND.items():
        if name in QUERY_REGISTRY and last.get(name, -1) < rnd:
            assert order.index(name) < SWEEP_WINDOW, (
                f"{name} changed in r{rnd} but sits at position "
                f"{order.index(name)} — outside the sweep window"
            )
