#!/usr/bin/env python
"""In-wave cross-check for r15 wave 27: independent numpy Aitchison
machinery (float clr straight from shares — verifying the count-based
shortcut ln n - mean ln n == ln s - mean ln s — np.var/np.linalg.norm
distances, np.polyfit alr trends) vs the DuckDB oracles.

    python tools_crosscheck_r15w27.py [sf_dir]
"""
import sys

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")

ok = True


def check(name, got, want, tol=2e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


cells = con.execute(
    "SELECT EXTRACT(year FROM o_orderdate) y, o_orderpriority p, COUNT(*) n "
    "FROM orders GROUP BY 1,2 ORDER BY 1,2"
).df()
years = sorted(cells.y.unique().astype(int))
parts = sorted(cells.p.unique())
N = np.zeros((len(years), len(parts)))
for _, r in cells.iterrows():
    N[years.index(int(r.y)), parts.index(r.p)] = r.n
S = N / N.sum(axis=1, keepdims=True)  # shares: clr identical to count clr
clr = np.log(S) - np.log(S).mean(axis=1, keepdims=True)

# total variance
var_p = clr.var(axis=0, ddof=1)
o = con.execute(CATALOG["orders_clr_total_variance_priority"].oracle).df().iloc[0]
check("clr totvar", o.total_log_ratio_variance, var_p.sum(), 1e-4)
assert o.most_variable_part == parts[int(np.argmax(var_p))], o.most_variable_part
print(f"most variable part OK: {o.most_variable_part}")

# consecutive distances
o = con.execute(CATALOG["orders_aitchison_distance_years"].oracle).df()
for i in range(len(years) - 1):
    d = float(np.linalg.norm(clr[i] - clr[i + 1]))
    check(f"aitch[{years[i]}]", o[o.year_from == years[i]].aitchison_distance.iloc[0],
          d, 1e-4)

# variation matrix
o = con.execute(CATALOG["orders_variation_matrix_priority"].oracle).df()
for i, pi in enumerate(parts):
    for pj in parts[i + 1:]:
        lr = np.log(S[:, i]) - np.log(S[:, parts.index(pj)])
        row = o[(o.part_i == pi) & (o.part_j == pj)].iloc[0]
        check(f"tau[{pi[:4]},{pj[:4]}]", row.tau, lr.var(ddof=1), 1e-4)

# center distances
center = clr.mean(axis=0)
o = con.execute(CATALOG["orders_comp_center_distances"].oracle).df()
dists = [float(np.linalg.norm(clr[i] - center)) for i in range(len(years))]
for i, y in enumerate(years):
    check(f"cdist[{y}]", o[o.year == y].dist_from_center.iloc[0], dists[i], 1e-4)
check("outlier year", float(o[o.is_outlier_year == 1].year.iloc[0]),
      years[int(np.argmax(dists))], 0)

# alr trends
ref = parts.index("5-LOW")
o = con.execute(CATALOG["orders_alr_trend_priority"].oracle).df()
for i, p in enumerate(parts):
    if p == "5-LOW":
        continue
    alr = np.log(S[:, i]) - np.log(S[:, ref])
    b, a = np.polyfit(np.array(years, dtype=float) - 1995, alr, 1)
    row = o[o.part == p].iloc[0]
    check(f"alr b[{p[:4]}]", row.alr_slope_per_year, b, 1e-3)
    check(f"alr a[{p[:4]}]", row.alr_intercept, a, 1e-3)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
