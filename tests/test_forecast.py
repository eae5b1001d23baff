"""Holt linear smoothing (operators/forecast.py): hand-computed recurrence,
degenerate series handling, key independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19_spark.operators.forecast import holt_linear


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t int, y double")


def test_matches_hand_computed_recurrence(spark):
    # y = [10, 12, 15], alpha=0.5, beta=0.25
    # l0=10, b0=2
    # t=1 (y=12): l=0.5*12+0.5*(10+2)=12;     b=0.25*(12-10)+0.75*2=2
    # t=2 (y=15): l=0.5*15+0.5*(12+2)=14.5;   b=0.25*(14.5-12)+0.75*2=2.125
    df = _series(spark, [("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 15.0)])
    out = holt_linear(df, ["k"], "t", "y", alpha=0.5, beta=0.25, horizon=2)
    rows = {r.h: r for r in out.collect()}
    assert rows[1].level == 14.5
    assert rows[1].trend == 2.125
    assert rows[1].forecast == 14.5 + 2.125
    assert rows[2].forecast == 14.5 + 2 * 2.125
    assert rows[1].n_obs == 3


def test_constant_series_flat_forecast(spark):
    df = _series(spark, [("a", i, 7.0) for i in range(1, 6)])
    rows = holt_linear(df, ["k"], "t", "y").collect()
    for r in rows:
        assert r.level == 7.0 and r.trend == 0.0 and r.forecast == 7.0


def test_perfect_linear_series_extrapolates_exactly(spark):
    # y = 3 + 2t: level/trend lock on and h-step forecasts are exact
    df = _series(spark, [("a", t, 3.0 + 2.0 * t) for t in range(1, 8)])
    rows = {r.h: r for r in holt_linear(df, ["k"], "t", "y", horizon=3).collect()}
    last = 3.0 + 2.0 * 7
    for h in (1, 2, 3):
        assert rows[h].forecast == pytest.approx(last + 2.0 * h, abs=1e-6)


def test_single_point_keys_dropped_and_keys_independent(spark):
    df = _series(
        spark,
        [("lonely", 1, 5.0), ("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 10.0), ("b", 2, 30.0)],
    )
    out = holt_linear(df, ["k"], "t", "y", horizon=1).collect()
    ks = {r.k: r for r in out}
    assert "lonely" not in ks
    assert ks["a"].trend == 1.0 and ks["b"].trend == 20.0


def test_unordered_input_is_sorted_by_order_col(spark):
    shuffled = _series(spark, [("a", 3, 15.0), ("a", 1, 10.0), ("a", 2, 12.0)])
    ordered = _series(spark, [("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 15.0)])
    got_s = holt_linear(shuffled, ["k"], "t", "y", horizon=1).collect()[0]
    got_o = holt_linear(ordered, ["k"], "t", "y", horizon=1).collect()[0]
    assert (got_s.level, got_s.trend) == (got_o.level, got_o.trend)
