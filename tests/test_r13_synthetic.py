"""Synthetic-data branch coverage for round-13 survival queries.

The shipped testdata has every user active across the whole 30-day
window, so the weekly life table carries deaths = 0 at every scale
factor and the Greenwood-variance / extinction branches of
evt_km_greenwood_bands are data-unreachable there.  This test builds a
tiny synthetic events table with real deaths in weeks 1-3 (plus one
censored survivor group) and checks the Spark query against the DuckDB
oracle on the SAME files — the exact cross-engine compare the parity
suite runs, on data that exercises the nonzero-deaths path.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("r13synth")
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def emit(uid, day):
        nonlocal eid
        eid += 1
        rows.append((eid, base + dt.timedelta(days=day), uid, "view", 10.0, "{}"))

    # 10 users die in week 1 (last activity day 2), 6 in week 2 (day 9),
    # 4 in week 3 (day 16); 8 survive to the horizon (censored).
    uid = 0
    for _ in range(10):
        uid += 1
        emit(uid, 0), emit(uid, 2)
    for _ in range(6):
        uid += 1
        emit(uid, 0), emit(uid, 9)
    for _ in range(4):
        uid += 1
        emit(uid, 0), emit(uid, 16)
    for _ in range(8):
        uid += 1
        emit(uid, 0), emit(uid, 29)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY ev TO '{d}/events.parquet' (FORMAT PARQUET)")
    return str(d)


def test_km_greenwood_bands_with_deaths(spark, synth_dir):
    from real_estate_data_pipeline_spark.queries import CATALOG

    got = [
        tuple(r)
        for r in CATALOG["evt_km_greenwood_bands"]
        .fn(spark, synth_dir)
        .orderBy("week")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{synth_dir}/events.parquet'"
    )
    want = [
        tuple(r)
        for r in con.execute(
            CATALOG["evt_km_greenwood_bands"].oracle + " ORDER BY week"
        ).fetchall()
    ]
    assert got == want
    # the life table itself: 28 at risk, then 18, 12, 8; deaths 10/6/4/0
    assert [(r[0], r[1], r[2]) for r in got] == [
        (1, 28, 10),
        (2, 18, 6),
        (3, 12, 4),
        (4, 8, 0),
    ]
    # survival strictly decreasing while deaths occur, se > 0 once deaths > 0
    surv = [r[3] for r in got]
    assert surv[0] > surv[1] > surv[2] == surv[3]
    assert all(r[4] > 0 for r in got)  # greenwood_se positive
    assert all(r[5] <= r[3] <= r[6] for r in got)  # lo <= s <= hi


def test_mean_residual_life_synthetic(spark, synth_dir):
    from real_estate_data_pipeline_spark.queries import CATALOG

    got = [
        tuple(r)
        for r in CATALOG["evt_mean_residual_life"]
        .fn(spark, synth_dir)
        .orderBy("threshold_week")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{synth_dir}/events.parquet'"
    )
    want = [
        tuple(r)
        for r in con.execute(
            CATALOG["evt_mean_residual_life"].oracle
        ).fetchall()
    ]
    assert got == want
    # lifetimes in weeks: 10x0, 6x1, 4x2, 8x4 -> MRL(0) = 46/28
    assert got[0][1] == 28
    assert got[0][2] == round(46 / 28, 6)
