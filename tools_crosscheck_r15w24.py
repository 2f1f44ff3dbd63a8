#!/usr/bin/env python
"""In-wave cross-check for r15 wave 24: independent numpy EVT
machinery (np.sort order statistics, textbook Hill/Pickands/DEdH,
brute mean-excess, direct power sums) vs the DuckDB oracles.

    python tools_crosscheck_r15w24.py [sf_dir]
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


def check(name, got, want, tol=2e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_id"])
ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
ev = ev.sort_values(["user_id", "sec", "event_id"])
gaps = []
for uid, g in ev.groupby("user_id"):
    s = g["sec"].to_numpy()
    gaps.extend((s[1:] - s[:-1]).tolist())
gaps = np.array([g for g in gaps if g > 0], dtype=np.int64)
desc = np.sort(gaps)[::-1].astype(float)

# Hill at k = 100/200
o = con.execute(CATALOG["evt_hill_estimator_gaps"].oracle).df()
for k in (100, 200):
    h = np.log(desc[:k] / desc[k]).mean()
    row = o[o.k == k].iloc[0]
    check(f"hill[{k}]", row.hill_gamma, h, 1e-4)
    check(f"alpha[{k}]", row.implied_alpha, 1 / h, 1e-4)

# Pickands + DEdH at the same ranks
xk, x2k, x4k = desc[99], desc[199], desc[399]
pick = math.log((xk - x2k) / (x2k - x4k)) / math.log(2)
l = np.log(desc[:200] / desc[200])
m1, m2 = l.mean(), (l**2).mean()
dedh = m1 + 1 - 0.5 / (1 - m1 * m1 / m2)
o = con.execute(CATALOG["evt_pickands_dedh_estimators"].oracle).df().iloc[0]
check("pickands", o.pickands_gamma, pick, 1e-4)
check("dedh m1", o.m1, m1, 1e-4)
check("dedh", o.dedh_gamma, dedh, 1e-3)

# mean excess
o = con.execute(CATALOG["evt_mean_excess_thresholds"].oracle).df()
for lvl, q in ((50, 0.50), (75, 0.75), (90, 0.90), (95, 0.95), (99, 0.99)):
    u = math.floor(np.quantile(gaps.astype(float), q, method="linear") + 0.5)
    exc = gaps[gaps > u] - u
    row = o[o.pct_threshold == lvl].iloc[0]
    check(f"me u[{lvl}]", float(row.threshold_s), u, 0)
    check(f"me k[{lvl}]", float(row.n_exceed), len(exc), 0)
    check(f"me e[{lvl}]", row.mean_excess_s, exc.mean(), 1e-6)

# max-to-sum
o = con.execute(CATALOG["evt_max_to_sum_ratios"].oracle).df().iloc[0]
gf = gaps.astype(float)
for p, col in ((1, "r1"), (2, "r2"), (3, "r3"), (4, "r4")):
    check(f"maxsum r{p}", getattr(o, col), gf.max() ** p / (gf**p).sum(), 1e-6)

# Hill plot stability
o = con.execute(CATALOG["evt_hill_plot_stability"].oracle).df()
g6s = []
for k in (50, 100, 150, 200, 250):
    terms = [
        math.floor(round(math.log(desc[i] / desc[k]), 6) * 1e6 + 0.5)
        for i in range(k)
    ]
    g6 = math.floor(sum(terms) / k + 0.5)
    g6s.append(g6)
    check(f"hillplot[{k}]", o[o.k == k].hill_gamma_k.iloc[0], g6 / 1e6, 1e-6)
sg = sorted(g6s)
med2 = sg[2] * 2
check("hillplot spread", o.rel_spread.iloc[0], (max(g6s) - min(g6s)) * 2 / med2, 1e-6)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
