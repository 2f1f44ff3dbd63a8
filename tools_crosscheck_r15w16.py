#!/usr/bin/env python
"""In-wave cross-check for r15 wave 16: independent pandas/numpy
actuarial + index-number machinery (dict-of-dicts chain-ladder with
float factors and per-origin products, textbook Törnqvist/Walsh/
Marshall-Edgeworth on the matched basket, float Theil T decomposition
with groupby loops) vs the DuckDB oracles.

    python tools_crosscheck_r15w16.py [sf_dir]
"""
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("lineitem", "orders", "customer"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


# --- chain ladder ---
tri = con.execute(
    "SELECT EXTRACT(year FROM o.o_orderdate) AS oy, "
    "EXTRACT(year FROM l.l_shipdate) - EXTRACT(year FROM o.o_orderdate) AS dev, "
    "SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS revc "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "WHERE o.o_orderdate <= DATE '2000-12-31' "
    "AND l.l_shipdate <= DATE '2000-12-31' "
    "AND l.l_shipdate >= o.o_orderdate GROUP BY 1, 2"
).df()
cum = {}
for oy, g in tri.groupby("oy"):
    g = g.sort_values("dev")
    cum[int(oy)] = dict(zip(g.dev.astype(int), g.revc.cumsum().astype(float)))

factors = {}
of = con.execute(CATALOG["orders_chain_ladder_factors"].oracle).df()
for j in range(6):
    s0 = s1 = 0.0
    n = 0
    for oy, row in cum.items():
        if oy + j + 1 <= 2000 and j in row and (j + 1) in row:
            s0 += row[j]
            s1 += row[j + 1]
            n += 1
    if n == 0:
        continue
    factors[j] = s1 / s0
    r = of[of.dev_age == j].iloc[0]
    check(f"cl f[{j}]", r.factor, s1 / s0, 1e-6)
    check(f"cl n[{j}]", float(r.n_origins), n, 0)

ou = con.execute(CATALOG["orders_chain_ladder_ultimates"].oracle).df()
for oy in sorted(cum):
    jmax = 2000 - oy
    lat = cum[oy][jmax]
    prod = 1.0
    for j in range(jmax, max(factors) + 1):
        if j in factors:
            prod *= factors[j]
    r = ou[ou.origin_year == oy].iloc[0]
    check(f"cl ult[{oy}]", r.ultimate, lat * prod / 100, 5e-5)
    check(f"cl ibnr[{oy}]", r.ibnr, lat * (prod - 1) / 100, 5e-4)

# --- indexes on the matched basket ---
b = con.execute(
    "WITH py AS (SELECT l_partkey pk, year(l_shipdate) yr, "
    "SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) revc, "
    "SUM(CAST(l_quantity AS BIGINT)) qty FROM lineitem "
    "WHERE year(l_shipdate) IN (1995, 2001) GROUP BY 1,2) "
    "SELECT p0.pk, p0.revc rev0, p0.qty qty0, p1.revc rev1, p1.qty qty1 "
    "FROM py p0 JOIN py p1 ON p0.pk=p1.pk AND p0.yr=1995 AND p1.yr=2001"
).df()
p0 = b.rev0 / b.qty0
p1 = b.rev1 / b.qty1
s0, s1 = b.rev0.sum(), b.rev1.sum()
w = 0.5 * (b.rev0 / s0 + b.rev1 / s1)
ln_t = float((w * np.log(p1 / p0)).sum())
o = con.execute(CATALOG["lineitem_tornqvist_index"].oracle).df().iloc[0]
check("tornqvist ln", o.ln_tornqvist, ln_t, 1e-4)
check("tornqvist", o.tornqvist, math.exp(ln_t), 1e-4)

sq = np.sqrt(b.qty0.astype(float) * b.qty1.astype(float))
walsh = float((p1 * sq).sum() / (p0 * sq).sum())
me = float((p1 * (b.qty0 + b.qty1)).sum() / (p0 * (b.qty0 + b.qty1)).sum())
o = con.execute(CATALOG["lineitem_walsh_me_indexes"].oracle).df().iloc[0]
check("walsh", o.walsh, walsh, 1e-5)
check("marshall-edgeworth", o.marshall_edgeworth, me, 1e-5)

# --- Theil decomposition ---
cr = con.execute(
    "SELECT c.c_nationkey nk, "
    "SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) xc "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY o.o_custkey, c.c_nationkey"
).df()
x = cr.xc.astype(float).to_numpy()
n, sx = len(x), x.sum()
mu = sx / n
theil = float(np.mean((x / mu) * np.log(x / mu)))
tb = tw = 0.0
for nk, g in cr.groupby("nk"):
    xg = g.xc.astype(float).to_numpy()
    sg, ng = xg.sum(), len(xg)
    mug = sg / ng
    tb += (sg / sx) * math.log((sg / sx) / (ng / n))
    tw += (sg / sx) * float(np.mean((xg / mug) * np.log(xg / mug)))
o = con.execute(CATALOG["cust_theil_inequality_decomp"].oracle).df().iloc[0]
check("theil total", o.theil_total, theil, 1e-4)
check("theil between", o.theil_between, tb, 1e-4)
check("theil within", o.theil_within, tw, 1e-4)
check("theil identity", theil, tb + tw, 1e-6)
check("theil gap", o.identity_gap + 1.0, 1.0, 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
