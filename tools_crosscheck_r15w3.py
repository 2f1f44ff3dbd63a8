#!/usr/bin/env python
"""In-wave cross-check for r15 wave 3: independent float/loop
implementations (numpy ECDF newsvendor, pandas interval clipping,
python run-logic Nelson rules with FLOAT mean/sigma — deliberately not
the oracles' integer clearings) vs the DuckDB oracles.

    python tools_crosscheck_r15w3.py [sf_dir]
"""
import math
import statistics
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("orders", "lineitem", "events"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")

ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# newsvendor
daily = con.execute(
    "SELECT l_shipdate, SUM(CAST(l_quantity AS BIGINT)) FROM lineitem GROUP BY 1"
).fetchall()
v = np.sort(np.array([r[1] for r in daily], dtype=np.int64))
n = len(v)
o = con.execute(CATALOG["orders_newsvendor_levels"].oracle).df()
for _, row in o.iterrows():
    r = row.r100 / 100
    q = int(v[math.ceil(r * n) - 1])  # min v with ECDF >= r
    check(f"nv q r={row.r100}", row.stock_level, q, 0)
    check(f"nv service r={row.r100}", row.achieved_service, (v <= q).mean())
    check(f"nv over r={row.r100}", row.overage_mean, np.maximum(q - v, 0).mean(), 1e-5)
    check(f"nv short r={row.r100}", row.shortfall_mean, np.maximum(v - q, 0).mean(), 1e-5)

# little law
ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
ev["ts"] = pd.to_datetime(ev["ts"]).dt.tz_localize(None)
o = con.execute(CATALOG["evt_little_law_audit"].oracle).df().set_index("event_type")
for et, g in ev.groupby("event_type"):
    us = g["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1000
    hold_us = (g["value"].round(2) * 1e6).round().astype("int64").to_numpy()
    tmax = us.max()
    clip = np.minimum(us + hold_us, tmax) - us
    l_avg = clip.sum() / (tmax - us.min())
    row = o.loc[et]
    check(f"little L {et}", row.l_avg, l_avg, 1e-5)
    secs = g["ts"].astype("datetime64[s]").astype("int64")
    span_s = int(secs.max() - secs.min())
    lam = (len(g) - 1) / span_s
    w = g["value"].round(2).mean()
    check(f"little ratio {et}", row.little_ratio, l_avg / (lam * w), 1e-5)

# tracking signal
dc = con.execute(
    "SELECT date_trunc('day', ts), COUNT(*) FROM events GROUP BY 1 ORDER BY 1"
).fetchall()
c = np.array([r[1] for r in dc], dtype=np.int64)
errs = c[7:] - c[:-7]
cusum = np.cumsum(errs)
mad = np.cumsum(np.abs(errs)) / np.arange(1, len(errs) + 1)
tsig = cusum / mad
o = con.execute(CATALOG["evt_tracking_signal_seasonal"].oracle).df()
check("ts n_days", float(o.n_forecast_days[0]), len(errs), 0)
check("ts final", o.final_ts[0], tsig[-1], 1e-5)
check("ts max_abs", o.max_abs_ts[0], np.abs(tsig).max(), 1e-5)
check("ts beyond4", float(o.n_beyond_4[0]), float((np.abs(tsig) > 4).sum()), 0)

# capability
oc = con.execute(
    "SELECT o_orderdate, COUNT(*) FROM orders GROUP BY 1"
).fetchall()
cc = np.array([r[1] for r in oc], dtype=np.int64)
mu, sd = cc.mean(), cc.std(ddof=1)
med = statistics.median(cc.tolist())
usl, lsl = 1.2 * med, 0.8 * med
o = con.execute(CATALOG["orders_process_capability_daily"].oracle).df()
check("cap cp", o.cp[0], (usl - lsl) / (6 * sd), 1e-5)
check("cap cpk", o.cpk[0], min(usl - mu, mu - lsl) / (3 * sd), 1e-5)
check("cap cpm", o.cpm[0], (usl - lsl) / (6 * math.sqrt(sd**2 + (mu - med) ** 2)), 1e-5)

# nelson rules, float machinery
mu, sd = c.mean(), c.std(ddof=1)
r1 = int((np.abs(c - mu) > 3 * sd).sum())
side = np.sign(c - mu)
r2 = sum(
    1
    for i in range(8, len(c))
    if all(side[i - 8 : i + 1] > 0) or all(side[i - 8 : i + 1] < 0)
)
d = np.diff(c)
r3 = sum(
    1
    for i in range(5, len(c))
    if all(d[i - 5 : i] > 0) or all(d[i - 5 : i] < 0)
)
flips = d[1:] * d[:-1] < 0
r4 = sum(1 for i in range(13, len(c)) if all(flips[i - 13 : i - 1]))
o = con.execute(CATALOG["evt_nelson_rules_scan"].oracle).df()
check("nelson r1", float(o.r1_beyond_3sigma[0]), r1, 0)
check("nelson r2", float(o.r2_nine_one_side[0]), r2, 0)
check("nelson r3", float(o.r3_six_trending[0]), r3, 0)
check("nelson r4", float(o.r4_fourteen_alternating[0]), r4, 0)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
