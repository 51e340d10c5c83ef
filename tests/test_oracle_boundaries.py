"""Cross-engine boundary pins: cases that only diverge at exact edges.

ADVICE r01 flagged that Spark unix_timestamp() truncation vs DuckDB
epoch() micros made the 1800s/3600s session boundaries engine-dependent
(passing at sf0.01 only by luck). Both sides now use micros-precise
arithmetic; these tests pin the agreement AT the boundary, where the
divergence would reappear first.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from jcpg_spark.plans.driver_queries import (
    SQL_P6_SCOPE,
    SQL_W3_SESSIONIZE,
    SQL_W3_SESSION_WINDOW,
    q_p6_scope_interval,
    q_w3_session_window,
    q_w3_sessionize,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def boundary_dir(spark, tmp_path_factory):
    """events.parquet where consecutive gaps straddle the 1800s boundary by
    one microsecond, and offsets from t0 straddle 3600s likewise."""
    rows = []
    # user 1: gaps exactly 1800s, 1800.000001s, 1799.999999s
    ts = T0
    gaps = [1800.0, 1800.000001, 1799.999999]
    rows.append((100, ts, 1, "view", 1.0, "{}"))
    for i, g in enumerate(gaps):
        ts = ts + dt.timedelta(seconds=g)
        rows.append((101 + i, ts, 1, "view", 1.0, "{}"))
    # user 2: offsets from first event exactly 3600s +/- 1 microsecond
    for i, off in enumerate([0.0, 3599.999999, 3600.0, 3600.000001]):
        rows.append((200 + i, T0 + dt.timedelta(seconds=off), 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    base = str(tmp_path_factory.mktemp("boundary"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{base}/events.parquet")
    return base


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'")
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return {tuple(str(v) for v in row) for row in res.fetchall()}, cols


@pytest.mark.parametrize(
    "qfn,sql",
    [
        (q_w3_sessionize, SQL_W3_SESSIONIZE),
        (q_w3_session_window, SQL_W3_SESSION_WINDOW),
        (q_p6_scope_interval, SQL_P6_SCOPE),
    ],
)
def test_engines_agree_at_gap_boundaries(spark, boundary_dir, qfn, sql):
    sdf = qfn(spark, boundary_dir)
    got = {tuple(str(v) for v in row) for row in sdf.collect()}
    want, cols = _duck(boundary_dir, sql)
    assert cols == sdf.columns
    assert got == want
