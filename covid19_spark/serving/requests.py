"""On-demand user-request dispatch (§3.2 query lifecycle).

Reference: ``UserRequestConsumer.listenForUserRequests``
(``request/UserRequestConsumer.java:87-142``) dispatches on request.state:
Summary → full-scan summary, Today/Yesterday → per-date summary (+ chart),
else per-state block assembled from six store lookups.

Spark shape: each branch is a handful of batch queries against the
materialized serving tables (``serving.stores.StoreReader``) plus the golden
format functions — the Kafka request/response round-trip is transport, not
engine (SURVEY §3.2: "capability to preserve = the queries"). Chart bytes
come from the visualizations table when present (S7 produces them).
"""

from __future__ import annotations

import datetime as dt

from covid19_spark.serving import format as fmt
from covid19_spark.serving.stores import StoreReader


def _delta_row_to_dict(r) -> dict:
    return {
        "state": r["state"],
        "delta_confirmed": r.get("delta_confirmed", r.get("sum_delta_confirmed", 0)),
        "delta_recovered": r.get("delta_recovered", r.get("sum_delta_recovered", 0)),
        "delta_deaths": r.get("delta_deaths", r.get("sum_delta_deaths", 0)),
        "current_confirmed": r.get("confirmed", r.get("last_confirmed", 0)),
        "current_recovered": r.get("recovered", r.get("last_recovered", 0)),
        "current_deaths": r.get("deaths", r.get("last_deaths", 0)),
    }


def handle_user_request(
    reader: StoreReader,
    state: str,
    today: dt.date,
    last_updated: str = "",
) -> str:
    """Answer one user request with the reference's dispatch semantics.

    ``state`` ∈ {"Summary", "Today", "Yesterday", <state name>}; returns the
    alert text (photo attachment is the caller's concern).
    """
    if state.lower() == "summary":
        rows = [
            _delta_row_to_dict(r.asDict())
            for r in reader._t("statewise_delta")
            .orderBy("confirmed", ascending=False)
            .collect()
        ]
        return fmt.build_state_summary_alert_text(rows, last_updated, daily=False)

    if state.lower() in ("today", "yesterday"):
        date = today if state.lower() == "today" else today - dt.timedelta(days=1)
        daily = reader.daily_count_for(date=date).orderBy(
            "sum_delta_confirmed", ascending=False
        )
        rows = [_delta_row_to_dict(r.asDict()) for r in daily.collect()]
        return fmt.build_state_summary_alert_text(rows, last_updated, daily=True)

    # per-state block: six store lookups -> one summary block
    # (reference: delta, daily, news source, 14d test data, yesterday's
    # doubling rate, district dailies — UserRequestConsumer.java:108-128)
    yesterday = today - dt.timedelta(days=1)
    delta_rows = reader.delta_stats_for_state(state).collect()
    if not delta_rows:
        return f"No data for {state}"
    delta = _delta_row_to_dict(delta_rows[0].asDict())
    daily_rows = reader.daily_count_for(date=today, state=state).collect()
    daily = (
        _delta_row_to_dict(daily_rows[0].asDict())
        if daily_rows
        else {"state": state, "delta_confirmed": 0, "delta_recovered": 0, "delta_deaths": 0}
    )
    testing: dict[str, dict] = {}
    test_rows = reader.latest_test_data_within_14d(state, today).collect()
    if test_rows:
        testing[state] = {k: v for k, v in test_rows[0].asDict().items()}
        testing[state].setdefault("updatedon", str(test_rows[0]["date"]))
    rate_rows = reader.doubling_rate_for(state, yesterday).collect()
    rates = {
        state: (
            str(int(rate_rows[0].doubling_days))
            if rate_rows and rate_rows[0].doubling_days is not None
            else "0"  # reference emits "0" when unavailable (Covid19Stats.java:198)
        )
    }
    districts = sorted(
        (r.asDict() for r in reader.district_stats_for(state, daily=True).collect()),
        key=lambda d: -(d.get("sum_delta_confirmed") or 0),
    )
    district_dicts = [
        {
            "district": d["district"],
            "delta_confirmed": d.get("sum_delta_confirmed", 0),
            "delta_recovered": d.get("sum_delta_recovered", 0),
            "delta_deceased": d.get("sum_delta_deceased", 0),
        }
        for d in districts
    ]
    text = fmt.build_summary_alert_block(
        [delta], [daily], testing, rates, {state: district_dicts}
    )
    news = reader.news_source_for(state).collect()
    if state.lower() != "total" and news:
        text += f"\nSource: {news[0].url}"
    return text
