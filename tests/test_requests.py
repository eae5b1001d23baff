"""§3.2 user-request dispatch over materialized stores."""

import datetime as dt
import shutil
import tempfile

import pytest

from covid19_spark.serving.requests import handle_user_request
from covid19_spark.serving.stores import Materializer, StoreReader


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def reader(spark):
    d = tempfile.mkdtemp(prefix="c19req_")
    snapshots = spark.createDataFrame(
        [
            ("Maharashtra", ts("2020-04-08T10:00:00"), 10, 1, 1),
            ("Maharashtra", ts("2020-04-09T22:00:00"), 28, 2, 2),
            ("Delhi", ts("2020-04-08T12:00:00"), 5, 0, 0),
            ("Delhi", ts("2020-04-09T12:00:00"), 9, 1, 1),
            ("Total", ts("2020-04-09T22:00:00"), 37, 3, 3),
        ],
        ["state", "last_updated", "confirmed", "recovered", "deaths"],
    )
    m = Materializer(spark, d)
    m.refresh_statewise(snapshots)
    m.refresh_districtwise(
        spark.createDataFrame(
            [
                ("Maharashtra", "Mumbai", ts("2020-04-09T10:00:00"), 20, 1, 1),
                ("Maharashtra", "Mumbai", ts("2020-04-09T20:00:00"), 25, 2, 1),
            ],
            ["state", "district", "ts", "confirmed", "recovered", "deceased"],
        )
    )
    m.refresh_dimension(
        spark.createDataFrame([("Maharashtra", "https://news.example/mh")], ["state", "url"]),
        "news_sources",
    )
    m.refresh_dimension(
        spark.createDataFrame(
            [("Maharashtra", dt.date(2020, 4, 8), "53166", "1621", "26/04/2020")],
            ["state", "date", "totaltested", "positive", "updatedon"],
        ),
        "statewise_test_data",
    )
    yield StoreReader(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def test_summary_request(reader):
    out = handle_user_request(reader, "Summary", dt.date(2020, 4, 9), "09/04/2020 22:00:00")
    assert "Summary of all affected Indian States" in out
    assert "Mah  |     28|      2|     2" in out
    assert out.rstrip("</pre>").rstrip().endswith("Total|     37|      3|     3")


def test_today_request_daily_numbers(reader):
    out = handle_user_request(reader, "Today", dt.date(2020, 4, 9), "09/04/2020 22:00:00")
    # daily deltas for 04-09: Maharashtra +18, Delhi +4, Total +37 (first snapshot)
    assert "Mah  |     18|      1|     1" in out
    assert "Delhi|      4|      1|     1" in out


def test_state_request_full_block(reader):
    out = handle_user_request(reader, "Maharashtra", dt.date(2020, 4, 9))
    assert "<b>Maharashtra</b>" in out
    assert "Total cases  : (↑18) 28" in out
    assert "Positivity rate: 3.05%" in out       # testing block joined in
    assert "District-wise breakup (today)" in out
    # day's summed deltas: first snapshot seeds with zeros (delta=20) + 5
    # more later = 25; recoveries 1+1; deaths 1+0
    assert "25 new cases, 1 death, 2 recoveries in Mumbai" in out
    assert "Source: https://news.example/mh" in out


def test_unknown_state(reader):
    assert handle_user_request(reader, "Atlantis", dt.date(2020, 4, 9)) == "No data for Atlantis"
