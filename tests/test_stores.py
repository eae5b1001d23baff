"""Serving materializer + StateStoresManager-equivalent query API."""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from covid19_spark.serving.stores import Materializer, StoreReader


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def store_env(spark):
    d = tempfile.mkdtemp(prefix="c19stores_")
    yield spark, d
    shutil.rmtree(d, ignore_errors=True)


def test_materialize_and_query_statewise(store_env):
    spark, d = store_env
    snapshots = spark.createDataFrame(
        [
            ("Assam", ts("2020-04-08T10:00:00"), 10, 0, 0),
            ("Assam", ts("2020-04-08T22:00:00"), 27, 1, 0),
            ("Assam", ts("2020-04-09T02:00:00"), 28, 1, 1),
            ("Delhi", ts("2020-04-08T12:00:00"), 5, 0, 0),
        ],
        ["state", "last_updated", "confirmed", "recovered", "deaths"],
    )
    m = Materializer(spark, d)
    m.refresh_statewise(snapshots)
    r = StoreReader(spark, d)

    # point lookup: latest delta per state
    delta = r.delta_stats_for_state("Assam").collect()
    assert len(delta) == 1
    assert delta[0].confirmed == 28 and delta[0].delta_confirmed == 1

    # daily count per (date, state)
    daily = r.daily_count_for(date=dt.date(2020, 4, 8), state="Assam").collect()
    assert daily[0].sum_delta_confirmed == 27 and daily[0].last_confirmed == 27

    # doubling rate materialized per (date, state)
    dr = r.doubling_rate_for("Assam", dt.date(2020, 4, 9)).collect()
    assert dr[0].doubling_days == 20  # round(70/(100*1/28))


def test_materialize_districts_and_dimensions(store_env):
    spark, d = store_env
    rows = spark.createDataFrame(
        [
            ("Maharashtra", "Mumbai", ts("2020-04-08T10:00:00"), 28, 0, 0),
            ("Maharashtra", "Mumbai", ts("2020-04-09T10:00:00"), 40, 5, 1),
            ("Maharashtra", "Nagpur", ts("2020-04-08T11:00:00"), 17, 0, 2),
        ],
        ["state", "district", "ts", "confirmed", "recovered", "deceased"],
    )
    m = Materializer(spark, d)
    m.refresh_districtwise(rows)
    zones = spark.createDataFrame(
        [("Maharashtra", "Mumbai", "RED"), ("Maharashtra", "Nagpur", "ORANGE")],
        ["state", "district", "zone"],
    )
    m.refresh_dimension(zones, "zones")

    r = StoreReader(spark, d)
    dd = {x.district: x for x in r.district_stats_for("Maharashtra").collect()}
    assert dd["Mumbai"].confirmed == 40 and dd["Mumbai"].delta_confirmed == 12
    assert dd["Nagpur"].confirmed == 17

    z = {x.district: x.zone for x in r.zones_for("Maharashtra").collect()}
    assert z == {"Mumbai": "RED", "Nagpur": "ORANGE"}

    with pytest.raises(KeyError):
        m.refresh_dimension(zones, "not_a_table")


def test_latest_test_data_within_14d(store_env):
    spark, d = store_env
    test_rows = spark.createDataFrame(
        [
            ("Delhi", dt.date(2020, 4, 20), 50000, 1500),
            ("Delhi", dt.date(2020, 4, 24), 53166, 1621),
            ("Delhi", dt.date(2020, 4, 1), 10000, 300),   # outside lookback
            ("Assam", dt.date(2020, 4, 25), 2000, 30),
        ],
        ["state", "date", "totaltested", "positive"],
    )
    Materializer(spark, d).refresh_dimension(test_rows, "statewise_test_data")
    r = StoreReader(spark, d)
    out = r.latest_test_data_within_14d("Delhi", dt.date(2020, 4, 26)).collect()
    assert len(out) == 1 and out[0].totaltested == 53166
