#!/usr/bin/env python
"""In-wave cross-check for r14 wave 13: independent Python (textbook
Gamma/Beta MoM fits, dict-based ABC/XYZ matrix, hat-matrix DFFITS and
PRESS from raw arrays) vs the DuckDB oracles."""
import math
import sys
from collections import defaultdict
from decimal import Decimal

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("orders", "lineitem"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


ok = True


def check(name, got, want, tol=1e-4):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:22s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# gamma
yv = np.array([float(Decimal(r[0])) for r in con.execute(
    "SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) FROM orders"
).fetchall()])
m, v = yv.mean(), yv.var(ddof=1)
s = math.log(m) - np.log(yv).mean()
row = oracle("ml_gamma_fit_order_totals")
check("gamma k_mom", row.k_moments[0], m * m / v, 1e-5)
check("gamma theta", row.theta_moments[0], v / m, 1e-5)
check("gamma k_mle", row.k_mle_approx[0],
      (3 - s + math.sqrt((s - 3) ** 2 + 24 * s)) / (12 * s), 1e-4)

# beta
cs = con.execute("""
  SELECT o.o_custkey, COUNT(*),
         SUM(CASE WHEN l.l_returnflag='R' THEN 1 ELSE 0 END)
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_custkey""").fetchall()
ps = np.array([r[2] / r[1] for r in cs])
mp, vp = ps.mean(), ps.var(ddof=1)
shape = mp * (1 - mp) / vp - 1
row = oracle("ml_beta_fit_return_share")
check("beta alpha", row.alpha_mom[0], mp * shape, 1e-3)
check("beta beta", row.beta_mom[0], (1 - mp) * shape, 1e-3)

# abc-xyz
pr = con.execute("""
  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
  FROM lineitem GROUP BY 1""").fetchall()
tc = sum(r[1] for r in pr)
cum = 0
abc = {}
for pk, cents in sorted(pr, key=lambda r: (-r[1], r[0])):
    cum += cents
    abc[pk] = "A" if 10 * cum <= 7 * tc else ("B" if 10 * cum <= 9 * tc else "C")
pm = defaultdict(lambda: defaultdict(int))
for pk, mth, q in con.execute("""
  SELECT l_partkey, (year(l_shipdate)-1995)*12 + month(l_shipdate)-1,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
  FROM lineitem GROUP BY 1, 2""").fetchall():
    pm[pk][mth] = q
xyz = {}
for pk, months in pm.items():
    qs = list(months.values())
    if len(qs) < 2:
        xyz[pk] = "S"
    else:
        cv = np.std(qs, ddof=1) / np.mean(qs)
        xyz[pk] = "X" if cv < 0.5 else ("Y" if cv < 1.0 else "Z")
cells = defaultdict(lambda: [0, 0])
prd = dict(pr)
for pk in abc:
    key = (abc[pk], xyz[pk])
    cells[key][0] += 1
    cells[key][1] += prd[pk]
row = oracle("lineitem_abc_xyz_matrix").set_index(["abc", "xyz"])
probe = sorted(cells)[0]
check(f"abcxyz{probe} n", float(row.loc[probe].n_parts), float(cells[probe][0]), 0)
check(f"abcxyz{probe} rev", row.loc[probe].revenue, cells[probe][1] / 100, 1e-9)
check("abcxyz cells", float(len(row)), float(len(cells)), 0)

# DFFITS / PRESS on the reproduced shared frame
rows = con.execute("""
  SELECT o.o_orderkey,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
         (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
  FROM orders o""").fetchall()
y = np.array([r[1] for r in rows], dtype=np.float64)
x = np.array([r[2] for r in rows], dtype=np.float64)
okey = np.array([r[0] for r in rows])
n = len(x)
sl6 = math.floor((n * (x * y).sum() - x.sum() * y.sum())
                 / (n * (x * x).sum() - x.sum() ** 2) * 1e6 + 0.5)
i6 = math.floor((y.sum() * 1e6 - sl6 * x.sum()) / n + 0.5)
e6 = y * 1e6 - (i6 + sl6 * x)
Sxx = ((x - x.mean()) ** 2).sum()
h = 1 / n + (x - x.mean()) ** 2 / Sxx
sse = (e6 * e6).sum()
s_i = np.sqrt((sse - e6 * e6 / (1 - h)) / (n - 3))
dffits = np.abs(e6 * np.sqrt(h) / (s_i * (1 - h)))
order = sorted(range(n), key=lambda i: (-math.floor(dffits[i] * 1e6 + 0.5), okey[i]))
row = oracle("ml_dffits_topk")
check("dffits top1", row.abs_dffits[0], dffits[order[0]], 1e-5)
check("dffits top1 key", float(row.o_orderkey[0]), float(okey[order[0]]), 0)
check("dffits top10 min", row.abs_dffits[9], dffits[order[9]], 1e-5)

press = ((e6 / (1 - h)) ** 2).sum() / 1e12 / 1e4  # micro-cents^2 -> dollars^2
sst = ((y - y.mean()) ** 2).sum() / 1e4
row = oracle("ml_press_predicted_r2")
check("press", row.press_dollars2[0], press, 1e-5)
check("pred r2", row.predicted_r2[0], 1 - press / sst, 1e-5)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
