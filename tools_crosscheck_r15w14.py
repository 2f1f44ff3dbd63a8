#!/usr/bin/env python
"""In-wave cross-check for r15 wave 14: independent pandas/numpy
reliability machinery (raw-array MCF, numpy-sorted exact TTT on the
minute bands, loop hazard, float polyfit Duane, brute covering-gap
scan) vs the DuckDB oracles.

    python tools_crosscheck_r15w14.py [sf_dir]
"""
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")

ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:24s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_id"])
ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
ev = ev.sort_values(["user_id", "sec", "event_id"])

# gaps
gaps = []
for uid, g in ev.groupby("user_id"):
    s = g["sec"].to_numpy()
    gaps.extend((s[1:] - s[:-1]).tolist())
gaps = np.array(gaps, dtype=np.int64)

# MCF
ev["day"] = ev["ts"].dt.floor("D")
daily = ev.groupby("day").size().sort_index()
nu = ev.user_id.nunique()
o = con.execute(CATALOG["evt_mean_cumulative_function_daily"].oracle).df()
cum = daily.cumsum().to_numpy()
check("mcf rows", float(len(o)), len(daily), 0)
check("mcf last", o.mcf.iloc[-1], cum[-1] / nu)
check("mcf first", o.mcf.iloc[0], cum[0] / nu)

# TTT on minute bands
gm = np.sort(gaps // 60)
n = len(gm)
sx = gm.sum()
o = con.execute(CATALOG["evt_ttt_transform_deciles"].oracle).df()
for _, row in o.iterrows():
    k = int(row.decile)
    r = (k * n + 9) // 10
    ttt = (gm[:r].sum() + (n - r) * gm[r - 1]) / sx
    check(f"ttt k={k}", row.ttt_scaled, float(ttt), 1e-9)

# hazard
gd = gaps // 86400
o = con.execute(CATALOG["evt_discrete_hazard_days"].oracle).df()
for _, row in o.iterrows():
    d = int(row.gap_days)
    evd = int((gd == d).sum())
    risk = int((gd >= d).sum())
    check(f"hz ev d={d}", float(row.n_events), evd, 0)
    if risk:
        check(f"hz d={d}", row.hazard, evd / risk, 1e-9)

# Duane
t0 = int(ev["day"].min().to_datetime64().astype("datetime64[s]").astype("int64"))
tt = (
    daily.index.to_numpy().astype("datetime64[s]").astype("int64") + 86400 - t0
).astype(float)
nn = cum.astype(float)
x = np.log(tt)
y = np.log(tt / nn)
slope = float(np.polyfit(x, y, 1)[0])
o = con.execute(CATALOG["evt_duane_growth_daily"].oracle).df()
check("duane", o.duane_alpha[0], slope, 1e-4)

# inspection paradox
tstar = (ev.sec.min() + ev.sec.max()) // 2
covs = []
for uid, g in ev.groupby("user_id"):
    s = g["sec"].to_numpy()
    lo = s[s <= tstar]
    hi = s[s > tstar]
    if len(lo) and len(hi):
        covs.append(int(hi.min()) - int(lo.max()))
o = con.execute(CATALOG["evt_inspection_paradox_census"].oracle).df()
check("insp ncov", float(o.n_cov[0]), len(covs), 0)
mg = gaps.mean(); mc = np.mean(covs)
check("insp ratio", o.length_bias_ratio[0], mc / mg, 1e-6)
check("insp cv2", o.implied_cv2[0], mc / mg - 1, 1e-5)
# sanity: implied CV^2 should be near the direct CV^2 of gaps
cv2 = float(gaps.var() / gaps.mean() ** 2)
print(f"direct gap CV^2 = {cv2:.4f} (renewal-theory sanity context)")

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
