#!/usr/bin/env python
"""In-wave cross-check for r15 wave 9: independent pandas/numpy
implementations (dict-based BCG quadrants, float share sums for
Rosenbluth, rank covariance form of the concentration index, scipy-
free GPD MoM, float fixed-point ZTP) vs the DuckDB oracles.

    python tools_crosscheck_r15w9.py [sf_dir]
"""
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("orders", "lineitem", "part"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")

ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:24s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# BCG
rows = con.execute("""
  SELECT p.p_brand, year(l.l_shipdate) yr, SUM(round(l.l_extendedprice,2)) r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE year(l.l_shipdate) IN (1995, 1996) GROUP BY 1, 2""").fetchall()
br = {}
for b, yr, r in rows:
    br.setdefault(b, {}).setdefault(int(yr), float(r))
t96 = sum(v.get(1996, 0.0) for v in br.values())
nb = len(br)
quads = {}
for b, v in br.items():
    grew = v.get(1996, 0) > v.get(1995, 0)
    above = nb * v.get(1996, 0) > t96
    q = "STAR" if grew and above else "CASH_COW" if above else "QUESTION" if grew else "DOG"
    quads.setdefault(q, []).append(v.get(1996, 0.0))
o = con.execute(CATALOG["part_bcg_growth_share_matrix"].oracle).df().set_index("quadrant")
for q, vals in quads.items():
    check(f"bcg n {q}", float(o.loc[q].n_brands), len(vals), 0)
    check(f"bcg rev {q}", o.loc[q].revenue_1996, sum(vals), 1e-6)

# Rosenbluth
pr = con.execute(
    "SELECT l_partkey, SUM(round(l_extendedprice,2)) FROM lineitem GROUP BY 1 ORDER BY 2 DESC, 1"
).fetchall()
sh = np.array([r[1] for r in pr], dtype=float)
sh = sh / sh.sum()
wrs = float((np.arange(1, len(sh) + 1) * sh).sum())
o = con.execute(CATALOG["lineitem_rosenbluth_hti"].oracle).df()
check("hti wrs", o.weighted_rank_sum[0], 2 * wrs - 1, 1e-6)
check("hti", o.rosenbluth_hti[0], 1 / (2 * wrs - 1), 1e-6)

# concentration index via the covariance form: C = 2 cov(y, R)/mu
cm = con.execute("""
  SELECT o.o_custkey, SUM(round(l.l_extendedprice,2)) rev,
         SUM(round(l.l_extendedprice,2)*round(l.l_discount,2)) disc
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey GROUP BY 1
  ORDER BY rev, o.o_custkey""").fetchall()
y = np.array([r[2] for r in cm], dtype=float)
n = len(y)
R = (2 * np.arange(1, n + 1) - 1) / (2 * n)
C = 2 * float(((y - y.mean()) * (R - R.mean())).mean()) / y.mean()
o = con.execute(CATALOG["cust_concentration_index_discount"].oracle).df()
check("conc index", o.concentration_index[0], C, 1e-4)

# GPD MoM
cents = con.execute("SELECT CAST(round(o_totalprice,2)*100 AS BIGINT) FROM orders").fetchall()
c = np.sort(np.array([r[0] for r in cents], dtype=np.int64))
q = np.quantile(c, 0.9, method="linear")
exc = c[c > q] - q
m, v = exc.mean(), exc.var(ddof=1)
o = con.execute(CATALOG["ml_gpd_mom_excesses"].oracle).df()
check("gpd n", float(o.n_excess[0]), len(exc), 0)
check("gpd xi", o.xi_mom[0], (1 - m * m / v) / 2, 1e-5)
check("gpd sigma", o.sigma_mom[0], (m / 100) * (m * m / v + 1) / 2, 1e-4)

# ZTP (float fixed point, no 6dp snapping — tolerance covers it)
kk = con.execute("""
  SELECT COUNT(*) FROM lineitem GROUP BY l_orderkey""").fetchall()
ks = np.array([r[0] for r in kk], dtype=float)
mzt = ks.mean()
lam = mzt
for _ in range(3):
    lam = mzt * (1 - math.exp(-lam))
o = con.execute(CATALOG["ml_ztp_fit_order_items"].oracle).df()
check("ztp mean", o.mean_items[0], mzt, 1e-6)
check("ztp lam3", o.lambda3[0], lam, 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
