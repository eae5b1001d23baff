"""Gap-based sessionization semantics."""

import datetime as dt

from covid19_spark.operators.sessions import session_stats, sessionize


def ts(s):
    return dt.datetime.fromisoformat(s)


ROWS = [
    (1, ts("2024-01-01T10:00:00"), 100),
    (1, ts("2024-01-01T10:10:00"), 101),  # same session (10 min gap)
    (1, ts("2024-01-01T11:00:00"), 102),  # new session (50 min gap)
    (1, ts("2024-01-01T11:29:59"), 103),  # same session (29:59 < 30m)
    (2, ts("2024-01-01T10:00:00"), 200),  # separate key
]


def test_sessionize_assigns_gap_sessions(spark):
    df = spark.createDataFrame(ROWS, ["user_id", "ts", "event_id"])
    out = sessionize(df, ["user_id"], "ts", gap="30 minutes", tiebreak_cols=["event_id"])
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == {100: 1, 101: 1, 102: 2, 103: 2, 200: 1}


def test_session_stats(spark):
    df = spark.createDataFrame(ROWS, ["user_id", "ts", "event_id"])
    out = session_stats(df, ["user_id"], "ts", gap="30 minutes", tiebreak_cols=["event_id"])
    rows = {(r.user_id, r.session_id): r for r in out.collect()}
    s = rows[(1, 1)]
    assert s.n_events == 2 and s.duration_sec == 600
    s2 = rows[(1, 2)]
    assert s2.n_events == 2 and s2.duration_sec == 1799
    assert rows[(2, 1)].n_events == 1 and rows[(2, 1)].duration_sec == 0


def test_boundary_exactly_gap_is_same_session(spark):
    # break requires ts > prev + gap; exactly +30:00 stays in-session
    rows = [(1, ts("2024-01-01T10:00:00"), 1), (1, ts("2024-01-01T10:30:00"), 2)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = sessionize(df, ["user_id"], "ts", gap="30 minutes", tiebreak_cols=["event_id"])
    assert {r.event_id: r.session_id for r in out.collect()} == {1: 1, 2: 1}
