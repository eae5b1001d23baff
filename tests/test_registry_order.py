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


def test_every_query_has_spec_fn_and_doc():
    for name, spec in QUERY_REGISTRY.items():
        assert callable(spec.fn), name
        assert spec.doc, name
