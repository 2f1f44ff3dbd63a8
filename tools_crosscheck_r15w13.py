#!/usr/bin/env python
"""In-wave cross-check for r15 wave 13: independent numpy Kakwani/
Suits (covariance and explicit-trapezoid forms), scipy-free Fisher-z
CI, pandas pivot_table GROUPING SETS replica, and a python-loop POT
declusterer vs the DuckDB oracles.

    python tools_crosscheck_r15w13.py [sf_dir]
"""
import math
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
    print(f"{name:24s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


cm = con.execute("""
  SELECT o.o_custkey ck, SUM(round(l.l_extendedprice,2)) rev,
         SUM(round(l.l_extendedprice,2)*round(l.l_discount,2)) disc
  FROM lineitem l JOIN orders o ON o.o_orderkey=l.l_orderkey GROUP BY 1
  ORDER BY rev, ck""").fetchall()
y = np.array([r[1] for r in cm]); d = np.array([r[2] for r in cm])
n = len(y)
i = np.arange(1, n + 1)
C = float((d * (2 * i - 1)).sum() / (n * d.sum())) - 1
G = float((y * (2 * i - 1)).sum() / (n * y.sum())) - 1
o = con.execute(CATALOG["lineitem_kakwani_discount_progressivity"].oracle).df()
check("conc", o.conc_discount[0], C, 1e-5)
check("gini", o.gini_revenue[0], G, 1e-5)
check("kakwani", o.kakwani[0], C - G, 1e-5)

# Suits via explicit trapezoid on cumulative SHARES
T = np.cumsum(d) / d.sum()
Y = np.cumsum(y) / y.sum()
Tprev = np.concatenate([[0.0], T[:-1]])
Yprev = np.concatenate([[0.0], Y[:-1]])
S = 1 - float(((T + Tprev) * (Y - Yprev)).sum())
o = con.execute(CATALOG["lineitem_suits_index_discount"].oracle).df()
check("suits", o.suits_index[0], S, 1e-4)

# Fisher z CI
qd = con.execute(
    "SELECT CAST(l_quantity AS BIGINT), round(l_discount, 2) FROM lineitem"
).fetchall()
q = np.array([r[0] for r in qd], dtype=float)
dd = np.array([r[1] for r in qd], dtype=float)
r = float(np.corrcoef(q, dd)[0, 1])
z = 0.5 * math.log((1 + r) / (1 - r))
hw = 1.959964 / math.sqrt(len(q) - 3)
o = con.execute(CATALOG["ml_fisher_z_corr_ci"].oracle).df()
check("pearson", o.pearson_r[0], r, 1e-6)
check("r_lo", o.r_lo[0], math.tanh(z - hw), 1e-5)
check("r_hi", o.r_hi[0], math.tanh(z + hw), 1e-5)

# grouping sets replica
od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderdate", "o_orderpriority", "o_totalprice"])
od["yr"] = pd.to_datetime(od.o_orderdate).dt.year
od["rev"] = od.o_totalprice.round(2)
o = con.execute(CATALOG["sql_interface_grouping_sets"].oracle).df()
total = od.rev.sum()
both = od.groupby(["yr", "o_orderpriority"]).rev.sum()
yr_only = od.groupby("yr").rev.sum()
pri_only = od.groupby("o_orderpriority").rev.sum()
check("gs rows", float(len(o)), len(both) + len(yr_only) + len(pri_only) + 1, 0)
gt = o[(o.g_yr == 1) & (o.g_pri == 1)]
check("gs total", float(gt.revenue.iloc[0]), float(total), 1e-6)
r0 = o[(o.g_yr == 0) & (o.g_pri == 0)].set_index(["yr", "pri"])
for (yy, pp), v in both.items():
    assert abs(r0.loc[(yy, pp)].revenue - v) < 1e-4, (yy, pp)
print("gs cells all match")

# POT clusters
dc = con.execute(
    "SELECT date_diff('day', DATE '1992-01-01', CAST(date_trunc('day', ts) AS DATE)),"
    " COUNT(*) FROM events GROUP BY 1 ORDER BY 1"
).fetchall()
days = np.array([r[0] for r in dc]); c = np.array([r[1] for r in dc])
sc = np.sort(c)
u = int(sc[math.ceil(0.9 * len(c)) - 1])
exc = days[c > u]
clusters = []
cur = 1
for a, b in zip(exc[:-1], exc[1:]):
    if b - a == 1:
        cur += 1
    else:
        clusters.append(cur)
        cur = 1
if len(exc):
    clusters.append(cur)
o = con.execute(CATALOG["evt_pot_cluster_count"].oracle).df()
check("pot u", float(o.threshold[0]), u, 0)
check("pot ne", float(o.n_exceedances[0]), len(exc), 0)
check("pot nc", float(o.n_clusters[0]), len(clusters), 0)
check("pot maxlen", float(o.max_cluster_len[0]), max(clusters) if clusters else 0, 0)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
