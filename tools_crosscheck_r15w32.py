#!/usr/bin/env python
"""In-wave cross-check for r15 wave 32: independent pandas/numpy
machinery (Counter frequency-of-frequencies + np.polyfit Lotka,
per-user pandas moments Taylor, bincount digit chi2, per-customer
loop gap CVs, scipy-free 7x24 chi2 with the textbook expected-cell
form) vs the DuckDB oracles.

    python tools_crosscheck_r15w32.py [sf_dir]
"""
import math
import sys
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("orders", "lineitem", "events"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


# --- Lotka ---
ck = con.execute("SELECT o_custkey, COUNT(*) k FROM orders GROUP BY 1").df()
ff = Counter(ck.k)
x = np.log(np.array(sorted(ff), dtype=float))
y = np.log(np.array([ff[k] for k in sorted(ff)], dtype=float))
b, a = np.polyfit(x, y, 1)
r = np.corrcoef(x, y)[0, 1]
o = con.execute(CATALOG["cust_lotka_law_fit"].oracle).df().iloc[0]
check("lotka n", float(o.n_points), len(ff), 0)
check("lotka exp", o.lotka_exponent, -b, 1e-4)
check("lotka r2", o.r2, r * r, 1e-4)

# --- Taylor ---
ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
nd = (ev.ts.max().floor("D") - ev.ts.min().floor("D")).days + 1
ud = ev.groupby(["user_id", ev.ts.dt.floor("D")]).size()
means, varis = [], []
for uid, g in ud.groupby(level=0):
    s = g.sum()
    s2 = (g**2).sum()
    mean = s / nd
    var = (nd * s2 - s * s) / (nd * (nd - 1))
    if var > 0:
        means.append(mean)
        varis.append(var)
x = np.log(np.array(means))
y = np.log(np.array(varis))
b, a = np.polyfit(x, y, 1)
o = con.execute(CATALOG["evt_taylor_power_law"].oracle).df().iloc[0]
check("taylor n", float(o.n_users), len(means), 0)
check("taylor b", o.taylor_exponent, b, 1e-4)
check("taylor a", o.ln_intercept, a, 1e-3)
print(f"context: Taylor exponent {b:.3f} (1 = Poisson, 2 = clumped)")

# --- ending digits ---
dg = con.execute(
    "SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT) % 10 d "
    "FROM lineitem"
).df()
cnt = np.bincount(dg.d, minlength=10)
N = cnt.sum()
chi2 = float(((cnt - N / 10) ** 2 / (N / 10)).sum())
o = con.execute(CATALOG["lineitem_price_ending_digits"].oracle).df()
check("digits chi2", o.chi2_total.iloc[0], chi2, 1e-5)
for d in (0, 5, 9):
    check(f"digit n[{d}]", float(o[o.last_cent_digit == d].n_lineitems.iloc[0]),
          int(cnt[d]), 0)

# --- interpurchase regularity ---
od = con.execute(
    "SELECT o_custkey ck, CAST(o_orderdate AS DATE) dy, o_orderkey ok "
    "FROM orders ORDER BY ck, dy, ok"
).df()
od["dy"] = pd.to_datetime(od.dy)
cvs = []
for ck_, g in od.groupby("ck"):
    d = g.dy.to_numpy()
    gaps = ((d[1:] - d[:-1]) / np.timedelta64(1, "D")).astype(float)
    if len(gaps) >= 2 and gaps.sum() > 0:
        k = len(gaps)
        s, s2 = gaps.sum(), (gaps**2).sum()
        cv = math.sqrt(k * (k * s2 - s * s) / (k - 1) / (s * s))
        cvs.append(math.floor(cv * 1e6 + 0.5))
cvs = np.array(cvs)
o = con.execute(CATALOG["cust_interpurchase_regularity"].oracle).df().iloc[0]
check("reg n", float(o.n_customers), len(cvs), 0)
check("reg clockwork", o.share_clockwork, (cvs < 500000).mean(), 1e-6)
check("reg bursty", o.share_bursty, (cvs >= 1000000).mean(), 1e-6)
scv = np.sort(cvs)
check("reg median", o.median_cv,
      (scv[(len(scv) - 1) // 2] + scv[len(scv) // 2]) / 2e6, 1e-5)

# --- weekday x hour independence ---
e = con.execute(
    "SELECT isodow(ts) wd, EXTRACT(hour FROM ts) hod FROM events"
).df()
tab = e.groupby(["wd", "hod"]).size().unstack(fill_value=0)
O = tab.to_numpy(dtype=float)
N = O.sum()
E = O.sum(axis=1, keepdims=True) @ O.sum(axis=0, keepdims=True) / N
chi2 = float(((O - E) ** 2 / E)[E > 0].sum())
o = con.execute(CATALOG["evt_weekday_hour_independence"].oracle).df().iloc[0]
check("wh chi2", o.chi2, chi2, 1e-4)
check("wh v", o.cramers_v, math.sqrt(chi2 / (N * 6)), 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
