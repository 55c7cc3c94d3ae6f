from datetime import datetime

from pyspark.sql import functions as F

from mriya_spark.ops import temporal


def _ev(spark):
    rows = [
        # user 1: login 10:00, purchase 10:05, login 10:30, purchase 10:31
        (1, datetime(2024, 1, 1, 10, 0), "login"),
        (2, datetime(2024, 1, 1, 10, 5), "purchase"),
        (3, datetime(2024, 1, 1, 10, 30), "login"),
        (4, datetime(2024, 1, 1, 10, 31), "purchase"),
        # user 2: purchase before any login -> null asof match
        (5, datetime(2024, 1, 1, 9, 0), "purchase"),
        (6, datetime(2024, 1, 1, 9, 30), "login"),
        # user 2: login exactly at purchase ts -> matched (>= semantics)
        (7, datetime(2024, 1, 1, 11, 0), "purchase"),
    ]
    uid = [1, 1, 1, 1, 2, 2, 2]
    return spark.createDataFrame(
        [(i + 1, u, ts, et) for (i, ((eid, ts, et), u)) in enumerate(zip(rows, uid))],
        ["event_id", "user_id", "ts", "event_type"],
    )


def test_asof_join_semantics(spark):
    ev = _ev(spark)
    # add a login for user 2 exactly at 11:00 (same ts as purchase 7)
    extra = spark.createDataFrame(
        [(99, 2, datetime(2024, 1, 1, 11, 0), "login")], ev.schema
    )
    ev = ev.unionByName(extra)
    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    logins = ev.filter("event_type = 'login'").select(
        "user_id", F.col("ts").alias("login_ts")
    )
    out = temporal.asof_join(
        purchases, logins, key="user_id", left_ts="ts", right_ts="login_ts",
        right_values={"last_login_ts": "login_ts"},
    )
    got = {r.event_id: r.last_login_ts for r in out.collect()}
    assert got[2] == datetime(2024, 1, 1, 10, 0)   # latest prior login
    assert got[4] == datetime(2024, 1, 1, 10, 30)  # advances to newer login
    assert got[5] is None                          # no prior login
    assert got[7] == datetime(2024, 1, 1, 11, 0)   # simultaneous matched (>=)


def test_band_join_bounds(spark):
    left = spark.createDataFrame([(1, 100.0), (2, 500.0)], ["id", "v"])
    right = spark.createDataFrame([(10, 120.0), (20, 700.0)], ["rid", "rv"])
    out = temporal.band_join(
        left, right,
        (left["v"] >= right["rv"] - 50) & (left["v"] <= right["rv"] + 50),
    )
    assert [(r.id, r.rid) for r in out.collect()] == [(1, 10)]


def test_sessionize_gap(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0)),
        (1, datetime(2024, 1, 1, 10, 10)),   # same session (10 min)
        (1, datetime(2024, 1, 1, 11, 30)),   # new session (80 min gap)
        (2, datetime(2024, 1, 1, 10, 0)),    # separate key
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = temporal.sessionize(df, key="user_id", ts="ts", gap_minutes=30)
    per_user = {
        (r.user_id, r.ts.minute + r.ts.hour * 60): r.session_id
        for r in out.collect()
    }
    assert per_user[(1, 600)] == 0
    assert per_user[(1, 610)] == 0
    assert per_user[(1, 690)] == 1
    assert per_user[(2, 600)] == 0


def test_funnel_steps_parameterized(spark):
    """funnel_steps beyond the oracle-covered 3-step shape: strict
    succession (same-timestamp events do NOT advance), users missing
    a middle step drop out of later steps, k=2 and k=4 both work, and
    an empty step list is refused."""
    import pytest

    rows = [
        # u1 completes a -> b -> c in order
        (1, "a", datetime(2024, 1, 1, 0, 0)),
        (1, "b", datetime(2024, 1, 1, 0, 5)),
        (1, "c", datetime(2024, 1, 1, 0, 9)),
        # u2 has b BEFORE a (and none after) -> stops at step 1
        (2, "b", datetime(2024, 1, 1, 0, 0)),
        (2, "a", datetime(2024, 1, 1, 0, 1)),
        # u3: b at the SAME instant as a -> strict '>' rejects it
        (3, "a", datetime(2024, 1, 1, 1, 0)),
        (3, "b", datetime(2024, 1, 1, 1, 0)),
        # u4 never does a -> appears nowhere
        (4, "b", datetime(2024, 1, 1, 2, 0)),
        (4, "c", datetime(2024, 1, 1, 2, 1)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])

    got = {
        (r.step, r.step_name): r.n_users
        for r in temporal.funnel_steps(ev, ["a", "b"]).collect()
    }
    assert got == {(1, "a"): 3, (2, "b"): 1}

    got4 = {
        r.step: r.n_users
        for r in temporal.funnel_steps(ev, ["a", "b", "c", "a"]).collect()
    }
    # only u1 reaches c; nobody does a again after c
    assert got4 == {1: 3, 2: 1, 3: 1, 4: 0}

    with pytest.raises(ValueError, match="at least one step"):
        temporal.funnel_steps(ev, [])
