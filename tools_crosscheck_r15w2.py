#!/usr/bin/env python
"""In-wave cross-check for r15 wave 2: independent pure-pandas
sessionization (strictly-greater 30-min gap, drop each user's final
session) vs the evt_stream_stateful_sessions_now oracle, and an
independent dict-based two-run SCD2 merge replica (with the silver
validation filter) vs the pipe_stream_silver_scd2_now oracle.

    python tools_crosscheck_r15w2.py [sf_dir]
"""
import sys

import duckdb
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("customer", "events"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")

ok = True


def check(name, got, want):
    global ok
    good = got == want
    print(f"{name:28s} got={got} want={want} {'OK' if good else 'FAIL'}")
    ok &= good


# --- sessionizer ---------------------------------------------------------
ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_id"])
ev["ts"] = pd.to_datetime(ev["ts"]).dt.tz_localize(None)
ev = ev.sort_values(["user_id", "ts", "event_id"])
rows = []
for uid, g in ev.groupby("user_id"):
    ns = g["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
    sessions = []
    start = last = None
    n = 0
    for v in ns:
        v = int(v)
        if last is None:
            start, n = v, 1
        elif v - last > 1800 * 10**9:
            sessions.append((start, last, n))
            start, n = v, 1
        else:
            n += 1
        last = v
    # the final (open) session is intentionally NOT emitted
    for st, en, cnt in sessions:
        rows.append(
            (
                uid,
                cnt,
                pd.Timestamp(st, unit="ns").strftime("%Y-%m-%d %H:%M:%S"),
                en // 10**9 - st // 10**9,
            )
        )
mine = pd.DataFrame(rows, columns=["user_id", "n_events", "session_start_s", "duration_secs"])
o = con.execute(CATALOG["evt_stream_stateful_sessions_now"].oracle).df()
check("sessions rows", len(mine), len(o))
check("sessions sum n_events", int(mine.n_events.sum()), int(o.n_events.sum()))
check("sessions sum duration", int(mine.duration_secs.sum()), int(o.duration_secs.sum()))
a = set(map(tuple, mine.itertuples(index=False)))
b = set(map(tuple, o[["user_id", "n_events", "session_start_s", "duration_secs"]].itertuples(index=False)))
check("sessions set equal", len(a ^ b), 0)

# --- scd2 pipeline -------------------------------------------------------
cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
cust = cust[cust.c_acctbal >= -900]  # silver validation reject
d1 = {int(r.c_custkey): r.c_mktsegment for r in cust.itertuples() if r.c_custkey % 3 != 0}
d2 = {
    int(r.c_custkey): ("CHANGED" if r.c_custkey % 5 == 0 else r.c_mktsegment)
    for r in cust.itertuples()
    if r.c_custkey % 2 == 0
}
final = []
for k, seg in d1.items():
    if k in d2 and d2[k] != seg:
        final.append((k, seg, seg[:3], False, "2024-01-01", "2024-01-02"))
        final.append((k, d2[k], d2[k][:3], True, "2024-01-02", None))
    else:
        final.append((k, seg, seg[:3], True, "2024-01-01", None))
for k, seg in d2.items():
    if k not in d1:
        final.append((k, seg, seg[:3], True, "2024-01-02", None))
o2 = con.execute(CATALOG["pipe_stream_silver_scd2_now"].oracle).df()
check("scd2 rows", len(final), len(o2))
got = set(final)
want = set(
    (int(r.c_custkey), r.c_mktsegment, r.segment_code, bool(r.is_current),
     r.valid_from_d, None if pd.isna(r.valid_to_d) else r.valid_to_d)
    for r in o2.itertuples()
)
check("scd2 set equal", len(got ^ want), 0)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
