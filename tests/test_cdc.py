"""CDC primitives: snapshot diff classification (incl. NULL-safe compare)
and SCD2 run-collapsing interval semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from covid19_spark.operators.cdc import scd2_intervals, snapshot_diff


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_snapshot_diff_classifies_all_types(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, None)],
        "k long, v double",
    )
    new = spark.createDataFrame(
        [(2, 20.0), (3, 31.0), (4, 40.0), (5, 50.0)],
        "k long, v double",
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out[1]["change_type"] == "delete" and out[1]["new_v"] is None
    assert 2 not in out                       # unchanged keys are dropped
    assert out[3]["change_type"] == "update" and (out[3]["old_v"], out[3]["new_v"]) == (30.0, 31.0)
    # NULL -> value is an update, not a false "unchanged" (NULL-safe compare)
    assert out[4]["change_type"] == "update" and out[4]["old_v"] is None
    assert out[5]["change_type"] == "insert" and out[5]["old_v"] is None


def test_snapshot_diff_multi_payload_any_column_triggers_update(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "a", 2.0)], "k long, s string, v double")
    rows = snapshot_diff(old, new, ["k"]).collect()
    assert len(rows) == 1 and rows[0]["change_type"] == "update"
    assert rows[0]["old_s"] == "a" and rows[0]["new_s"] == "a"


def test_scd2_collapses_runs_and_orders_versions(spark):
    df = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 00:00:00"), 1),
            (1, "A", _ts("2024-01-02 00:00:00"), 2),   # same attr -> same interval
            (1, "B", _ts("2024-01-03 00:00:00"), 3),
            (1, "A", _ts("2024-01-04 00:00:00"), 4),   # A again -> NEW interval (run, not group)
            (2, "X", _ts("2024-01-01 00:00:00"), 5),
        ],
        "k long, attr string, ts timestamp, eid long",
    )
    out = scd2_intervals(df, ["k"], "ts", ["attr"], tiebreak_cols=["eid"])
    rows = sorted(out.collect(), key=lambda r: (r["k"], r["version"]))
    k1 = [r for r in rows if r["k"] == 1]
    assert [(r["version"], r["attr"], r["n_events"]) for r in k1] == [
        (1, "A", 2), (2, "B", 1), (3, "A", 1),
    ]
    assert k1[0]["valid_from"] == _ts("2024-01-01 00:00:00")
    assert k1[0]["valid_to"] == _ts("2024-01-03 00:00:00")   # closed by next interval
    assert k1[1]["valid_to"] == _ts("2024-01-04 00:00:00")
    assert k1[2]["valid_to"] is None and k1[2]["is_current"]
    assert not k1[0]["is_current"] and not k1[1]["is_current"]
    k2 = [r for r in rows if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["is_current"] and k2[0]["version"] == 1


def test_scd2_duplicate_ts_tiebreak_is_deterministic(spark):
    t = _ts("2024-01-01 00:00:00")
    df = spark.createDataFrame(
        [(1, "A", t, 1), (1, "B", t, 2)], "k long, attr string, ts timestamp, eid long"
    )
    rows = sorted(
        scd2_intervals(df, ["k"], "ts", ["attr"], tiebreak_cols=["eid"]).collect(),
        key=lambda r: r["version"],
    )
    assert [(r["version"], r["attr"]) for r in rows] == [(1, "A"), (2, "B")]


def test_scd2_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 00:00:00"), 1)], "k long, attr string, ts timestamp, eid long"
    )
    out = scd2_intervals(df, ["k"], "ts", ["attr"], tiebreak_cols=["eid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # lag + running-sum windows and the lead window all hash-partition on k;
    # only the island groupBy may add a partial-agg exchange on (k, island).
    assert plan.count("Exchange hashpartitioning") <= 2
