"""Property-based tests (hypothesis): the distributed operators agree with
pure-Python reference models on randomized inputs — beyond the hand-picked
cases, any counterexample shrinks to a minimal repro."""

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from covid19_spark.operators.delta import running_delta
from covid19_spark.operators.sessions import sessionize

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # key
        st.integers(min_value=0, max_value=10_000),       # offset minutes
        st.integers(min_value=-100, max_value=100),       # value
    ),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


def _rows(raw):
    # unique (key, ts) per row: collapse duplicate timestamps deterministically
    seen = {}
    for k, mins, v in raw:
        seen[(k, mins)] = v
    return [
        (k, BASE + dt.timedelta(minutes=m), float(v), i)
        for i, ((k, m), v) in enumerate(sorted(seen.items()))
    ]


@given(events_strategy)
@SETTINGS
def test_running_delta_matches_python_model(spark, raw):
    rows = _rows(raw)
    df = spark.createDataFrame(rows, ["k", "ts", "v", "rid"])
    got = {
        (r.k, r.ts): r.delta_v
        for r in running_delta(df, ["k"], ["ts", "rid"], ["v"]).collect()
    }
    # python model: per key in ts order, delta = v - prev (first: v - 0)
    by_key: dict = {}
    for k, ts, v, _ in sorted(rows, key=lambda x: (x[0], x[1])):
        prev = by_key.get(k, 0.0)
        assert got[(k, ts)] == v - prev, (k, ts, v, prev)
        by_key[k] = v


@given(events_strategy)
@SETTINGS
def test_sessionize_matches_python_model(spark, raw):
    rows = _rows(raw)
    gap = dt.timedelta(minutes=30)
    df = spark.createDataFrame(rows, ["k", "ts", "v", "rid"])
    got = {
        (r.k, r.ts): r.session_id
        for r in sessionize(df, ["k"], "ts", "30 minutes", tiebreak_cols=["rid"]).collect()
    }
    last_ts: dict = {}
    sid: dict = {}
    for k, ts, _, _ in sorted(rows, key=lambda x: (x[0], x[1])):
        if k not in last_ts or ts > last_ts[k] + gap:
            sid[k] = sid.get(k, 0) + 1
        last_ts[k] = ts
        assert got[(k, ts)] == sid[k], (k, ts)


@given(
    st.lists(st.sampled_from(["aaa bbb ccc", "ddd eee fff", "aaa bbb ccc ddd"]), min_size=1, max_size=12)
)
@SETTINGS
def test_exact_dedup_counts_match_python(spark, texts):
    from covid19_spark.operators.dedup import exact_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.canonical_id: r.n_dupes for r in exact_dedup(df, "text", "doc_id").collect()}
    expect: dict = {}
    for i, t in rows:
        first = min(j for j, u in rows if u == t)
        expect[first] = expect.get(first, 0) + 1
    assert got == expect
