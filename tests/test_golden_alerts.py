"""Golden-string tests ported 1:1 from the reference's test suite
(AlertTextTests.java, BotUtilsTest.java, DistrictAlertUtilsTest.java,
UtilTests.java — SURVEY §5). Expected strings are byte-identical."""

from covid19_spark.serving.format import (
    build_delta_alert_line,
    build_district_delta_alert_line,
    build_district_summary_alert_text,
    build_district_zone_text,
    build_districtwise_alert,
    build_statewise_alert_text,
    build_summary_alert_block,
    friendly_time,
)


def sd(rec=0, dead=0, conf=0, cur_rec=0, cur_dead=0, cur_conf=0, lu="", state=""):
    """StatewiseDelta constructor order (FIXTURES.md §2)."""
    return {
        "delta_recovered": rec, "delta_deaths": dead, "delta_confirmed": conf,
        "current_recovered": cur_rec, "current_deaths": cur_dead,
        "current_confirmed": cur_conf, "last_updated_time": lu, "state": state,
    }


def dw(state, district, conf, act, rec, dec, d_conf, d_rec, d_dec, notes=""):
    """DistrictwiseData constructor order (FIXTURES.md §3)."""
    return {
        "state": state, "district": district, "confirmed": conf, "active": act,
        "recovered": rec, "deceased": dec, "delta_confirmed": d_conf,
        "delta_recovered": d_rec, "delta_deceased": d_dec, "notes": notes,
    }


DELHI_TESTING = {
    "negative": "51161", "positive": "1621", "totaltested": "53166",
    "unconfirmed": "384", "updatedon": "26/04/2020",
    "testreportedtoday": "19462", "positivereportedtoday": "38", "state": "Delhi",
}


def test_delta_alert_line_single():  # AlertTextTests.java:22-31
    assert build_delta_alert_line(sd(conf=1, state="Delhi")) == "1 new case in Delhi\n"


def test_delta_alert_line_plural():  # :33-42
    assert build_delta_alert_line(sd(conf=10, state="Delhi")) == "10 new cases in Delhi\n"


def test_delta_alert_line_multiple_types():  # :44-63
    assert (
        build_delta_alert_line(sd(rec=9, conf=15, state="Maharashtra"))
        == "15 new cases, 9 recoveries in Maharashtra\n"
    )
    assert (
        build_delta_alert_line(sd(dead=4, conf=15, state="Delhi"))
        == "15 new cases, 4 deaths in Delhi\n"
    )
    assert (
        build_delta_alert_line(sd(rec=9, dead=3, state="Delhi"))
        == "3 deaths, 9 recoveries in Delhi\n"
    )


def test_summary_alert_block():  # :65-84
    expected = (
        "\n<b>Total</b>\n<pre>\n"
        "Total cases  : (↑15) 5341\n"
        "Active       : (↑2) 4729\n"
        "Recovered    : (↑9) 455\n"
        "Deaths       : (↑4) 157\n"
        "Doubling rate: 250 days\n"
        "</pre>"
    )
    out = build_summary_alert_block(
        [sd(9, 4, 15, 455, 157, 5341, "", "Total")],
        [sd(9, 4, 15, 0, 0, 0, "", "Total")],
        {},
        {"Total": "250"},
        {},
    )
    assert out == expected


def test_summary_alert_block_with_testing_data():  # :86-115
    expected = (
        "\n<b>Delhi</b>\n<pre>\n"
        "Total cases  : (↑15) 5341\n"
        "Active       : (↑2) 4729\n"
        "Recovered    : (↑9) 455\n"
        "Deaths       : (↑4) 157\n"
        "Doubling rate: 250 days\n"
        "</pre>"
        "\n<pre>"
        "Total tested   : (↑19462) 53166\n"
        "Positive       : (↑38) 1621\n"
        "Negative       : 51161\n"
        "Unconfirmed    : 384\n"
        "Positivity rate: 3.05%\n"
        "Last updated   : 26/04/2020\n"
        "</pre>\n"
    )
    out = build_summary_alert_block(
        [sd(9, 4, 15, 455, 157, 5341, "", "Delhi")],
        [sd(9, 4, 15, 0, 0, 0, "", "Delhi")],
        {"Delhi": DELHI_TESTING},
        {"Delhi": "250"},
        {},
    )
    assert out == expected


def test_summary_alert_block_with_testing_and_district_data():  # :117-152
    expected_tail = (
        "<b>District-wise breakup (today)</b>\n"
        "5 new cases, 3 deaths, 19 recoveries in East Delhi\n"
    )
    out = build_summary_alert_block(
        [sd(9, 4, 15, 455, 157, 5341, "", "Delhi")],
        [sd(9, 4, 15, 0, 0, 0, "", "Delhi")],
        {"Delhi": DELHI_TESTING},
        {"Delhi": "250"},
        {"Delhi": [dw("Delhi", "East Delhi", "38", "38", "0", "0", 5, 19, 3)]},
    )
    assert out.endswith(expected_tail)


def test_final_alert_text():  # :154-207
    expected = (
        "<i>April 08, 12:04 AM</i>\n\n"
        "1 new case in Assam\n"
        "9 new cases in Himachal Pradesh\n"
        "\n<b>Assam</b>\n<pre>\n"
        "Total cases  : (↑1) 28\n"
        "Active       : (↑1) 28\n"
        "Recovered    : (↑0) 0\n"
        "Deaths       : (↑0) 0\n"
        "Doubling rate: 19.44 days\n"
        "</pre>"
        "\n<b>Himachal Pradesh</b>\n<pre>\n"
        "Total cases  : (↑9) 27\n"
        "Active       : (↑9) 24\n"
        "Recovered    : (↑0) 1\n"
        "Deaths       : (↑0) 2\n"
        "Doubling rate: 2.10 days\n"
        "</pre>"
        "\n<b>Total</b>\n<pre>\n"
        "Total cases  : (↑31) 5341\n"
        "Active       : (↑20) 4729\n"
        "Recovered    : (↑8) 455\n"
        "Deaths       : (↑3) 157\n"
        "Doubling rate: 116 days\n"
        "</pre>"
    )
    dailies = [
        sd(0, 0, 1, 0, 0, 0, "08/04/2020 23:41:35", "Assam"),
        sd(0, 0, 9, 0, 0, 0, "08/04/2020 00:04:28", "Himachal Pradesh"),
        sd(8, 3, 31, 0, 0, 0, "08/04/2020 00:04:28", "Total"),
    ]
    deltas = [
        sd(0, 0, 1, 0, 0, 28, "08/04/2020 23:41:35", "Assam"),
        sd(0, 0, 9, 1, 2, 27, "08/04/2020 00:04:28", "Himachal Pradesh"),
        sd(0, 0, 9, 455, 157, 5341, "08/04/2020 00:04:28", "Total"),
    ]
    rates = {"Assam": "19.44", "Himachal Pradesh": "2.10", "Total": "116"}
    out = build_statewise_alert_text("April 08, 12:04 AM", deltas, dailies, {}, rates, [])
    assert out == expected


def test_statewise_alert_with_districts_filters_zero_rows():  # :209-253
    expected = (
        "<i>April 08, 12:04 AM</i>\n\n"
        "1 new case in Maharashtra\n\n"
        "<b>District-wise breakup</b>\n"
        "1 new case in Mumbai\n"
        "\n<b>Total</b>\n<pre>\n"
        "Total cases  : (↑31) 5341\n"
        "Active       : (↑20) 4729\n"
        "Recovered    : (↑8) 455\n"
        "Deaths       : (↑3) 157\n"
        "Doubling rate: 116 days\n"
        "</pre>"
        "\n<b>Maharashtra</b>\n<pre>\n"
        "Total cases  : (↑1) 28\n"
        "Active       : (↑1) 28\n"
        "Recovered    : (↑0) 0\n"
        "Deaths       : (↑0) 0\n"
        "Doubling rate: 19.44 days\n"
        "</pre>"
    )
    dailies = [
        sd(8, 3, 31, 0, 0, 0, "08/04/2020 00:04:28", "Total"),
        sd(0, 0, 1, 0, 0, 0, "08/04/2020 23:41:35", "Maharashtra"),
    ]
    deltas = [
        sd(0, 0, 9, 455, 157, 5341, "08/04/2020 00:04:28", "Total"),
        sd(0, 0, 1, 0, 0, 28, "08/04/2020 23:41:35", "Maharashtra"),
    ]
    districts = [
        dw("Maharashtra", "Mumbai", "28", "28", "0", "0", 1, 0, 0),
        dw("Maharashtra", "Nagpur", "17", "13", "0", "2", 0, 0, 0),  # zero-delta: ignored
    ]
    rates = {"Total": "116", "Maharashtra": "19.44"}
    out = build_statewise_alert_text(
        "April 08, 12:04 AM", deltas, dailies, {}, rates, districts
    )
    assert out == expected


def test_districtwise_alert():  # DistrictAlertUtilsTest.java:12-28
    deltas = [dw("Maharashtra", "Mumbai", "120", "90", "5", "9", 12, 3, 1)]
    dailies = [dw("Maharashtra", "Mumbai", "25", "40", "12", "3", 11, 23, 4)]
    assert (
        build_districtwise_alert(deltas, dailies)
        == "12 new cases, 1 death, 3 recoveries in Mumbai\n"
    )


def test_zones_text():  # BotUtilsTest.java:12-33 (HashMap order made explicit)
    data = {"Chandrapur": "Unknown", "Nagpur": "Red", "Pune": "Orange", "Mumbai": "Green"}
    expected = (
        "<b>Districts of Maharashtra</b>\n\n"
        "❓   Chandrapur\n"
        "\U0001f534   Nagpur\n"
        "\U0001f536   Pune\n"
        "\U0001f49a   Mumbai\n"
        "\nhttps://twitter.com/pib_india/status/1256468081896878080"
    )
    assert build_district_zone_text("Maharashtra", data) == expected


def test_friendly_time():  # BotUtilsTest.java:35-42
    assert friendly_time("05/12/2020 00:15:03") == "December 05, 12:15 AM"
    assert friendly_time("5/12/2020 00:15:03") == "December 05, 12:15 AM"
    assert friendly_time("garbage") is None


def test_district_summary_truncates_names():  # BotUtils.java:324-343 (W6)
    out = build_district_summary_alert_text(
        "Maharashtra",
        [dw("Maharashtra", "Mumbai Suburban Extra", "10", "5", "3", "2", 0, 0, 0)],
    )
    assert "Mumbai Suburb|" in out
