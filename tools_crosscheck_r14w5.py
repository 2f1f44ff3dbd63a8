#!/usr/bin/env python
"""In-wave cross-check for r14 wave 5 (forecast scores): brute-force
Python (direct CRPS double sums, sorted-window quantiles, DM from raw
floats) vs the DuckDB oracles."""
import sys
from decimal import Decimal

import duckdb

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


cents = [
    r[0]
    for r in con.execute("""
  SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT)
  ORDER BY CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT)
""").fetchall()
]

ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:22s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


days = [(cents[i], cents[i - 7 : i]) for i in range(7, len(cents))]

# CRPS
crps = []
for y, w in days:
    t1 = sum(abs(l - y) for l in w) / 7
    t2 = sum(abs(a - b) for a in w for b in w) / 98  # full grid / 2
    crps.append(t1 - t2)
row = oracle("evt_crps_empirical_window")
check("crps mean", row.mean_crps[0], sum(crps) / len(crps) / 100)
check("crps max", row.max_crps[0], max(crps) / 100)

# pinball
p10 = p50 = p90 = 0.0
for y, w in days:
    s = sorted(w)
    q10, q50, q90 = s[0], s[3], s[6]
    p10 += (y - q10) * 0.1 if y >= q10 else (q10 - y) * 0.9
    p50 += abs(y - q50) * 0.5
    p90 += (y - q90) * 0.9 if y >= q90 else (q90 - y) * 0.1
row = oracle("evt_pinball_quantile_window")
n = len(days)
check("pinball q10", row.pinball_q10[0], p10 / n / 100)
check("pinball q50", row.pinball_q50[0], p50 / n / 100)
check("pinball q90", row.pinball_q90[0], p90 / n / 100)

# winkler
wsum = cov = 0
for y, w in days:
    lo, hi = min(w), max(w)
    wsum += (hi - lo) + (10 * (lo - y) if y < lo else 0) + (10 * (y - hi) if y > hi else 0)
    cov += 1 if lo <= y <= hi else 0
row = oracle("evt_winkler_interval_score")
check("winkler mean", row.mean_winkler[0], wsum / n / 100)
check("winkler cover", row.coverage[0], cov / n)

# smape bundle
sm = mp = esum = ysum = 0.0
for y, w in days:
    f = w[0]  # 7 days before
    e = abs(y - f)
    sm += 2 * e / (y + f)
    mp += e / y
    esum += e
    ysum += y
row = oracle("evt_smape_bundle_seasonal")
check("smape", row.smape[0], sm / n, 1e-5)
check("mape", row.mape[0], mp / n, 1e-5)
check("wmape", row.wmape[0], esum / ysum)

# DM
ds = []
for i in range(7, len(cents)):
    ds.append(abs(cents[i] - cents[i - 1]) - abs(cents[i] - cents[i - 7]))
dbar = sum(ds) / len(ds)
var = sum((d - dbar) ** 2 for d in ds) / (len(ds) - 1)
dm = dbar / (var / len(ds)) ** 0.5
row = oracle("evt_diebold_mariano_naive")
check("dm stat", row.dm_stat[0], dm, 1e-5)
check("dm mean", row.mean_loss_diff[0], dbar / 100, 1e-5)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
