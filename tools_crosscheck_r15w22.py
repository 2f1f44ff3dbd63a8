#!/usr/bin/env python
"""In-wave cross-check for r15 wave 22: independent pandas/numpy
causal machinery (four-cell DiD by groupby, np.polyfit segment lines
for ITS and RDD, dict-loop stratified ATE, hashlib German tank) vs
the DuckDB oracles.

    python tools_crosscheck_r15w22.py [sf_dir]
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
for tname in ("orders", "customer", "lineitem", "events"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


# --- DiD ---
x = con.execute(
    "SELECT CASE WHEN c.c_mktsegment='BUILDING' THEN 1 ELSE 0 END tr, "
    "CASE WHEN EXTRACT(year FROM o.o_orderdate) >= 1998 THEN 1 ELSE 0 END post, "
    "CAST(CAST(o.o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) cents "
    "FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey"
).df()
g = x.groupby(["tr", "post"]).cents.mean()
did = (g[1, 1] - g[1, 0]) - (g[0, 1] - g[0, 0])
o = con.execute(CATALOG["ml_diff_in_diff_segments"].oracle).df().iloc[0]
check("did t1", o.treat_post_mean, g[1, 1] / 100, 1e-6)
check("did", o.did_dollars, did / 100, 1e-5)

# --- ITS ---
d = con.execute(
    "SELECT date_trunc('day', ts) dy, COUNT(*) y FROM events GROUP BY 1 ORDER BY 1"
).df()
xday = np.array([(t - d.dy.min()).days for t in d.dy], dtype=float)
y = d.y.to_numpy(dtype=float)
pre = xday < 15
b0, a0 = np.polyfit(xday[pre], y[pre], 1)
b1, a1 = np.polyfit(xday[~pre], y[~pre], 1)
o = con.execute(CATALOG["ml_its_segmented_daily"].oracle).df().iloc[0]
check("its pre slope", o.pre_slope, b0, 1e-5)
check("its post slope", o.post_slope, b1, 1e-5)
check("its jump", o.level_jump_at_cut, (a1 + 15 * b1) - (a0 + 15 * b0), 1e-4)

# --- RDD ---
od = con.execute(
    "SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) cents, "
    "(SUM(CAST(CAST(l.l_discount AS DECIMAL(18,2))*100 AS BIGINT))*10000)"
    "//COUNT(*) ymic "
    "FROM orders o JOIN lineitem l ON l.l_orderkey=o.o_orderkey "
    "GROUP BY o.o_orderkey, o.o_totalprice"
).df()
cents = od.cents.to_numpy(dtype=float)
c0 = math.floor(np.quantile(cents, 0.5) + 0.5)
h = math.floor((np.quantile(cents, 0.75) - np.quantile(cents, 0.25)) / 2 + 0.5)
w = od[abs(od.cents - c0) <= h]
lo = w[w.cents <= c0]
hi = w[w.cents > c0]
_, alo = np.polyfit((lo.cents - c0).astype(float), lo.ymic.astype(float), 1)
_, ahi = np.polyfit((hi.cents - c0).astype(float), hi.ymic.astype(float), 1)
o = con.execute(CATALOG["ml_rdd_sharp_median_price"].oracle).df().iloc[0]
check("rdd n_lo", float(o.n_lo), len(lo), 0)
check("rdd below", o.discount_at_cut_below, alo / 1e6, 1e-4)
check("rdd jump", o.rdd_jump, (ahi - alo) / 1e6, 1e-3)

# --- stratified ATE ---
ol = con.execute(
    "SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) cents, "
    "CASE WHEN o.o_orderpriority='1-URGENT' THEN 1 ELSE 0 END tr, "
    "MIN(date_diff('day', CAST(o.o_orderdate AS DATE), "
    "CAST(l.l_shipdate AS DATE))) lag "
    "FROM orders o JOIN lineitem l ON l.l_orderkey=o.o_orderkey "
    "GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderpriority"
).df()
qs = [
    math.floor(np.quantile(ol.cents.astype(float), q) + 0.5)
    for q in (0.2, 0.4, 0.6, 0.8)
]
strat = np.digitize(ol.cents, qs, right=True)
ate = 0.0
N = len(ol)
for s_id in range(5):
    grp = ol[strat == s_id]
    mt = grp[grp.tr == 1].lag.mean()
    mc = grp[grp.tr == 0].lag.mean()
    ate += (mt - mc) * len(grp) / N
naive = ol[ol.tr == 1].lag.mean() - ol[ol.tr == 0].lag.mean()
o = con.execute(CATALOG["ml_propensity_strat_ate"].oracle).df().iloc[0]
check("ate naive", o.naive_diff_days, naive, 1e-5)
check("ate strat", o.stratified_ate_days, ate, 1e-5)

# --- German tank ---
ck = con.execute("SELECT c_custkey FROM customer").df().c_custkey
keep = ck.map(
    lambda k: int(hashlib.sha256(f"{k}tank15".encode()).hexdigest()[:8], 16)
    < 429496730
)
s = (ck[keep] + 1).to_numpy()
k, m = len(s), int(s.max())
o = con.execute(CATALOG["cust_german_tank_estimate"].oracle).df().iloc[0]
check("tank k", float(o.n_sample), k, 0)
check("tank mvue", o.mvue_estimate, m * (k + 1) / k - 1, 1e-6)
check("tank moment", o.moment_estimate, 2 * s.mean() - 1, 1e-6)
check("tank truth", float(o.true_n), len(ck), 0)
print(
    f"context: true N={len(ck)}, MVUE={o.mvue_estimate:.1f} "
    f"(err {o.mvue_rel_err:+.4f}), moment={o.moment_estimate:.1f} "
    f"(err {o.moment_rel_err:+.4f})"
)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
