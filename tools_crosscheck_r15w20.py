#!/usr/bin/env python
"""In-wave cross-check for r15 wave 20: independent numpy robust-line
machinery (brute float scans of all 435 two-point candidates with
plain float losses, numpy median Siegel) vs the DuckDB oracles.  Also
sanity-checks the LAD winner against the OLS slope direction.

    python tools_crosscheck_r15w20.py [sf_dir]
"""
import math
import sys

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")

ok = True


def check(name, got, want, tol=2e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


d = con.execute(
    "SELECT date_trunc('day', ts) dy, SUM(CAST(round(value*100) AS BIGINT)) y "
    "FROM events GROUP BY 1 ORDER BY 1"
).df()
x = np.array([(t - d.dy.min()).days for t in d.dy], dtype=np.int64)
y = d.y.to_numpy(dtype=np.int64)
n = len(x)


def scan(loss_fn):
    best = None
    for i in range(n):
        for j in range(i + 1, n):
            dx, dyv = x[j] - x[i], y[j] - y[i]
            u = (y - y[i]) * dx - dyv * (x - x[i])
            key = loss_fn(u.astype(float)) / dx
            cand = (key, x[i], x[j], dyv / dx, (y[i] - dyv / dx * x[i]) / 100)
            if best is None or cand[:3] < best[:3]:
                best = cand
    return best


# LAD
k, xi, xj, slope, icept = scan(lambda u: np.abs(u).sum())
o = con.execute(CATALOG["ml_lad_regression_daily"].oracle).df().iloc[0]
check("lad i", float(o.day_i), xi, 0)
check("lad j", float(o.day_j), xj, 0)
check("lad slope", o.slope_cents_per_day, slope, 1e-6)
check("lad icept", o.intercept_dollars, icept, 1e-5)
check("lad loss", o.lad_loss_dollars, k / 100, 1e-6)

# Q75
k, xi, xj, slope, icept = scan(
    lambda u: (3 * np.maximum(u, 0) + np.maximum(-u, 0)).sum()
)
o = con.execute(CATALOG["ml_quantile_regression_daily_q75"].oracle).df().iloc[0]
check("q75 i", float(o.day_i), xi, 0)
check("q75 j", float(o.day_j), xj, 0)
check("q75 slope", o.slope_cents_per_day, slope, 1e-6)
check("q75 loss", o.q75_loss_dollars, k / 4 / 100, 1e-6)


def med2(a):
    s = np.sort(a)
    return float(s[(len(s) - 1) // 2] + s[len(s) // 2])


# LMS (key = (med|u|)^2/dx^2; compare via med2 to match the doubled median)
k, xi, xj, slope, icept = scan(lambda u: 0)  # placeholder, redo below
best = None
for i in range(n):
    for j in range(i + 1, n):
        dx, dyv = x[j] - x[i], y[j] - y[i]
        u = (y - y[i]) * dx - dyv * (x - x[i])
        m2 = med2(np.abs(u))
        key = (m2 / dx) ** 2
        cand = (key, x[i], x[j], dyv / dx, m2 / 2 / dx / 100)
        if best is None or cand[:3] < best[:3]:
            best = cand
o = con.execute(CATALOG["ml_lms_regression_daily"].oracle).df().iloc[0]
check("lms i", float(o.day_i), best[1], 0)
check("lms j", float(o.day_j), best[2], 0)
check("lms slope", o.slope_cents_per_day, best[3], 1e-6)
check("lms medabs", o.lms_med_abs_dollars, best[4], 1e-6)
check("lms sigma", o.lms_sigma_dollars, 1.4826 * best[4], 1e-6)

# LTA (20 smallest |u|)
best = None
for i in range(n):
    for j in range(i + 1, n):
        dx, dyv = x[j] - x[i], y[j] - y[i]
        u = (y - y[i]) * dx - dyv * (x - x[i])
        a20 = float(np.sort(np.abs(u))[:20].sum())
        key = a20 / dx
        cand = (key, x[i], x[j], dyv / dx, a20 / dx / 100)
        if best is None or cand[:3] < best[:3]:
            best = cand
o = con.execute(CATALOG["ml_lta_regression_daily"].oracle).df().iloc[0]
check("lta i", float(o.day_i), best[1], 0)
check("lta j", float(o.day_j), best[2], 0)
check("lta loss", o.lta_loss_dollars, best[4], 1e-6)

# Siegel repeated medians
slopes_med = []
for i in range(n):
    sl = [(y[j] - y[i]) / (x[j] - x[i]) for j in range(n) if j != i]
    slopes_med.append(med2(np.array(sl)) / 2)
b = med2(np.array(slopes_med)) / 2
icept = med2(y - b * x) / 2 / 100
o = con.execute(CATALOG["ml_siegel_repeated_medians_daily"].oracle).df().iloc[0]
check("siegel slope", o.siegel_slope_cents_per_day, b, 1e-6)
check("siegel icept", o.siegel_intercept_dollars, icept, 1e-5)

# context: OLS slope for comparison
ols = np.polyfit(x.astype(float), y.astype(float), 1)[0]
print(f"context: OLS slope {ols:.3f} vs LAD/Siegel robust slopes above")

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
