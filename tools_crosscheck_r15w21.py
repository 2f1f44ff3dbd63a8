#!/usr/bin/env python
"""In-wave cross-check for r15 wave 21: independent numpy/hashlib
queueing + survey machinery (textbook Kingman/PK from float moments,
scipy-free Erlang B/C recursion, hour-of-day masses, hashlib-resampled
expansion/ratio/GREG estimators with np.polyfit slope) vs the DuckDB
oracles.

    python tools_crosscheck_r15w21.py [sf_dir]
"""
import hashlib
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("events", "orders"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


ev = pd.read_parquet(
    f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type", "value"]
)
ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
ev["v"] = (ev["value"].round(2) * 100).round().astype("int64")

# --- Kingman per type ---
o = con.execute(CATALOG["evt_kingman_vut_by_type"].oracle).df()
ev["d"] = ev["ts"].dt.floor("D")
for et, g in ev.groupby("event_type"):
    gaps = []
    for _, gg in g.sort_values(["sec", "event_id"]).groupby("d"):
        s = gg["sec"].to_numpy()
        gaps.extend((s[1:] - s[:-1]).tolist())
    gaps = np.array(gaps, dtype=float)
    ca2 = gaps.var(ddof=1) / gaps.mean() ** 2
    svc = g["v"].to_numpy(dtype=float) / 100
    cs2 = svc.var(ddof=0) / svc.mean() ** 2
    lam = (len(g) - 1) / (g["sec"].max() - g["sec"].min())
    es = svc.mean()
    rho = lam * es
    wq = (ca2 + cs2) / 2 * (rho / (1 - rho)) * es
    row = o[o.event_type == et].iloc[0]
    check(f"king ca2[{et}]", row.ca2, ca2, 1e-5)
    check(f"king cs2[{et}]", row.cs2, cs2, 1e-5)
    check(f"king wq[{et}]", row.kingman_wq_s, wq, 1e-4)

# --- Erlang C (recursion) ---
sec = ev["sec"].to_numpy()
svc = ev["v"].to_numpy(dtype=float) / 100
lam = (len(ev) - 1) / (sec.max() - sec.min())
es = svc.mean()
a = lam * es
B = 1.0
o = con.execute(CATALOG["evt_erlang_c_staffing"].oracle).df()
om = con.execute(CATALOG["evt_mgc_wait_approx"].oracle).df()
cs2 = svc.var(ddof=0) / es**2
for c in range(1, 11):
    B = a * B / (c + a * B)
    row = o[o.servers == c].iloc[0]
    check(f"erlB[{c}]", row.erlang_b, B, 1e-5)
    if a < c:
        C = c * B / (c - a * (1 - B))
        wq = C / (c / es - lam)
        check(f"erlC[{c}]", row.erlang_c, C, 1e-5)
        check(f"erlWq[{c}]", row.wq_seconds, wq, 1e-4)
        check(f"mgcWq[{c}]", om[om.servers == c].wq_mgc_seconds.iloc[0],
              (1 + cs2) / 2 * wq, 1e-4)

# --- hourly offered workload ---
o = con.execute(CATALOG["evt_workload_hourly_offered"].oracle).df()
nd = (ev["ts"].max().floor("D") - ev["ts"].min().floor("D")).days + 1
hod = ev["ts"].dt.hour
for h in (0, 7, 12, 23):
    mass = int(ev.loc[hod == h, "v"].sum())
    row = o[o.hour_of_day == h].iloc[0]
    check(f"work mass[{h}]", row.service_seconds, mass / 100, 1e-6)
    check(f"work erl[{h}]", row.offered_erlangs, mass / 100 / 3600 / nd, 1e-6)
check("work peak rows", float(o.is_peak.sum()), 1, 0)

# --- survey estimators ---
cy = con.execute(
    "SELECT o_custkey ck, COUNT(*) x, "
    "SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) y "
    "FROM orders GROUP BY 1"
).df()
keep = cy["ck"].map(
    lambda k: int(hashlib.sha256(f"{k}svy15".encode()).hexdigest()[:8], 16)
    < 429496730
)
s = cy[keep]
nn, xx, yy = len(cy), cy.x.sum(), cy.y.sum()
ns, sx, sy = len(s), s.x.sum(), s.y.sum()
y_exp = nn / ns * sy
y_ratio = sy / sx * xx
b = np.polyfit(s.x.astype(float), s.y.astype(float), 1)[0]
y_greg = y_exp + b * (xx - nn / ns * sx)
o = con.execute(CATALOG["cust_ratio_greg_estimators"].oracle).df().iloc[0]
check("svy n", float(o.n_sample), ns, 0)
check("svy truth", o.truth_dollars, yy / 100, 1e-6)
check("svy exp", o.expansion_dollars, y_exp / 100, 1e-6)
check("svy ratio", o.ratio_dollars, y_ratio / 100, 1e-6)
check("svy greg", o.greg_dollars, y_greg / 100, 1e-5)
check("svy greg err", o.greg_rel_err, (y_greg - yy) / yy, 1e-4)
print(
    f"context: |rel err| expansion {abs(o.expansion_rel_err):.4f} vs "
    f"ratio {abs(o.ratio_rel_err):.4f} vs GREG {abs(o.greg_rel_err):.4f}"
)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
