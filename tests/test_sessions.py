"""Gap-based sessionization (beats_spark.sessions)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from beats_spark.sessions import session_agg, sessionize
from tests.conftest import rows

T = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _ev(spark):
    data = [
        ("a", 1, T(0)), ("a", 2, T(5)), ("a", 3, T(15)),   # 5s,10s gaps
        ("a", 4, T(40)),                                    # 25s gap → new
        ("b", 5, T(0)), ("b", 6, T(100)),                   # new session
    ]
    return spark.createDataFrame(data, "k string, event_id long, ts timestamp_ntz")


def test_sessionize_assigns_ordinals(spark):
    out = rows(sessionize(_ev(spark), ["k"], gap="10 seconds",
                          order_col="event_id"),
               "k", "event_id", "session_no")
    assert out == [
        ("a", 1, 0), ("a", 2, 0), ("a", 3, 0),  # 10s gap merges (== gap)
        ("a", 4, 1),
        ("b", 5, 0), ("b", 6, 1),
    ]


def test_session_agg_matches_sessionize(spark):
    """The native session_window aggregate groups exactly the sessions
    the lag/cumsum assignment produces."""
    ev = _ev(spark)
    agg = rows(session_agg(ev, ["k"], gap="10 seconds"),
               "k", "session_start", "session_end", "n_events")
    via = rows(
        sessionize(ev, ["k"], gap="10 seconds", order_col="event_id")
        .groupBy("k", "session_no")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"),
             F.count(F.lit(1)).alias("n")),
        "k", "s", "e", "n",
    )
    assert agg == via
    assert ("a", T(0), T(15), 3) in agg
