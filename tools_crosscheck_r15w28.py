#!/usr/bin/env python
"""In-wave cross-check for r15 wave 28: independent pandas/numpy
monitoring machinery (np.quantile HBOS re-binned and re-scored,
polyfit+groupby seasonal strengths, per-weekday variances, O(n^2)
loop SampEn, pandas date-offset calendar flags) vs the DuckDB oracles.

    python tools_crosscheck_r15w28.py [sf_dir]
"""
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("orders", "events"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


# --- HBOS ---
cy = con.execute(
    "SELECT o_custkey ck, COUNT(*) x1, "
    "SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) x2 "
    "FROM orders GROUP BY 1"
).df()
cy["x3"] = cy.x2 // cy.x1
N = len(cy)
bins = {}
for f in ("x1", "x2", "x3"):
    cuts = [
        math.floor(np.quantile(cy[f].astype(float), k / 10, method="linear") + 0.5)
        for k in range(1, 10)
    ]
    bins[f] = cy[f].map(lambda v: sum(v > c for c in cuts))
score = np.zeros(N)
for f in ("x1", "x2", "x3"):
    counts = bins[f].value_counts()
    score += bins[f].map(lambda b: math.log(N) - math.log(counts[b])).to_numpy()
cy["score"] = score
top = cy.sort_values(["score", "ck"], ascending=[False, True]).head(10)
o = con.execute(CATALOG["cust_hbos_outlier_scores"].oracle).df()
for i in range(10):
    check(f"hbos ck[{i}]", float(o.custkey.iloc[i]), top.ck.iloc[i], 0)
    check(f"hbos s[{i}]", o.hbos_score.iloc[i], top.score.iloc[i], 1e-4)

# --- seasonal strength ---
d = con.execute(
    "SELECT CAST(o_orderdate AS DATE) dy, COUNT(*) y FROM orders "
    "GROUP BY 1 ORDER BY 1"
).df()
d["dy"] = pd.to_datetime(d.dy)
x = (d.dy - d.dy.min()).dt.days.to_numpy(dtype=float)
y = d.y.to_numpy(dtype=float)
b, a = np.polyfit(x, y, 1)
det = y - (a + b * x)
wd = d.dy.dt.dayofweek.to_numpy()  # 0=Mon
smean = {w: det[wd == w].mean() for w in range(7)}
r = det - np.array([smean[w] for w in wd])
e = y - np.array([smean[w] for w in wd])
f_seas = max(0, 1 - r.var(ddof=1) / det.var(ddof=1))
f_trend = max(0, 1 - r.var(ddof=1) / e.var(ddof=1))
o = con.execute(CATALOG["orders_seasonal_strength_weekday"].oracle).df().iloc[0]
check("seas f_s", o.f_seasonal, f_seas, 1e-4)
check("seas f_t", o.f_trend, f_trend, 1e-4)

# --- Cochran / Hartley ---
vs = {w + 1: y[wd == w].var(ddof=1) for w in range(7)}
o = con.execute(CATALOG["orders_cochran_hartley_variance"].oracle).df().iloc[0]
check("cochran c", o.cochran_c, max(vs.values()) / sum(vs.values()), 1e-5)
check("hartley", o.hartley_fmax, max(vs.values()) / min(vs.values()), 1e-5)
check("maxvar wd", float(o.max_var_weekday), max(vs, key=vs.get), 0)

# --- SampEn ---
ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
t0 = ev.ts.min().floor("D")
nd = (ev.ts.max().floor("D") - t0).days + 1
hrs = ((ev.ts.astype("datetime64[s]").astype("int64")
        - int(t0.value // 1e9)) // 3600).to_numpy()
c = np.bincount(hrs, minlength=nd * 24).astype(np.int64)
rr = math.floor(0.2 * c.std(ddof=1) + 0.5)
n3 = len(c) - 2
B = A = 0
for i in range(n3):
    for j in range(i + 1, n3):
        if abs(c[i] - c[j]) <= rr and abs(c[i + 1] - c[j + 1]) <= rr:
            B += 1
            if abs(c[i + 2] - c[j + 2]) <= rr:
                A += 1
o = con.execute(CATALOG["evt_sample_entropy_hourly"].oracle).df().iloc[0]
check("sampen r", float(o.tolerance), rr, 0)
check("sampen B", float(o.n_matches_m2), B, 0)
check("sampen A", float(o.n_matches_m3), A, 0)
check("sampen", o.sample_entropy, -math.log(A / B), 1e-5)

# --- calendar edges ---
d["me"] = ((d.dy + pd.Timedelta(days=3)).dt.month != d.dy.dt.month).astype(int)
d["qe"] = (d.me == 1) & d.dy.dt.month.isin([3, 6, 9, 12])
o = con.execute(CATALOG["orders_calendar_edge_effects"].oracle).df().iloc[0]
m_me = d[d.me == 1].y.mean()
m_rest = d[d.me == 0].y.mean()
m_qe = d[d.qe].y.mean()
check("cal nme", float(o.n_month_end_days), int(d.me.sum()), 0)
check("cal me lift", o.month_end_lift, m_me / m_rest, 1e-6)
check("cal qe lift", o.quarter_end_lift, m_qe / m_rest, 1e-6)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
