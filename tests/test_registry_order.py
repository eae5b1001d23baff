"""Registration-order contract: the driver's correctness sweep may cover only
a prefix of the registry, so the queries with no driver CORRECTNESS row yet
must register first (see the reorder block at the end of plans/registry.py)."""

from __future__ import annotations

import json
import os

from covid19_spark.plans.registry import _DRIVER_UNVERIFIED_FIRST, QUERY_REGISTRY

_R02 = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r02.json")


def test_unverified_queries_register_first():
    names = list(QUERY_REGISTRY)
    expected_front = [n for n in _DRIVER_UNVERIFIED_FIRST if n in QUERY_REGISTRY]
    assert names[: len(expected_front)] == expected_front


def test_reorder_is_pure_permutation_of_r02_plus_new():
    with open(_R02) as f:
        r02_checked = set(json.load(f))
    names = set(QUERY_REGISTRY)
    # every driver-checked query is still registered
    assert r02_checked <= names
    # everything NOT in the round-2 artifact is in the priority-front list
    assert names - r02_checked <= set(_DRIVER_UNVERIFIED_FIRST)


def test_every_query_has_spec_fn_and_doc():
    for name, spec in QUERY_REGISTRY.items():
        assert callable(spec.fn), name
        assert spec.doc, name
