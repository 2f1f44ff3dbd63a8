#!/usr/bin/env python
"""In-wave cross-check for r15 wave 1: independent numpy linear
algebra (design-matrix lstsq fits, hat-matrix studentized residuals)
vs the DuckDB oracles — run at two scales:

    python tools_crosscheck_r15w1.py /root/testdata/sf0.001
    python tools_crosscheck_r15w1.py            # sf0.01 default
"""
import math
import sys

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
    print(f"{name:26s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


rows = con.execute(
    """
  SELECT o.o_totalprice,
         (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
  FROM orders o"""
).fetchall()
y = np.array([float(r[0]) for r in rows])  # dollars
x = np.array([float(r[1]) for r in rows])
n = len(y)

X1 = np.column_stack([np.ones(n), x])
X2 = np.column_stack([np.ones(n), x, x * x])
b1, *_ = np.linalg.lstsq(X1, y, rcond=None)
b2, *_ = np.linalg.lstsq(X2, y, rcond=None)
e1 = y - X1 @ b1
e2 = y - X2 @ b2
sse1, sse2 = float(e1 @ e1), float(e2 @ e2)
syy = float(((y - y.mean()) ** 2).sum())
r2_1, r2_2 = 1 - sse1 / syy, 1 - sse2 / syy

pf = oracle("ml_partial_f_add_quadratic")
check("sse_linear_d2", pf.sse_linear_d2[0], sse1, 1e-5)
check("sse_quad_d2", pf.sse_quad_d2[0], sse2, 1e-5)
check("r2_linear", pf.r2_linear[0], r2_1, 1e-5)
check("r2_quad", pf.r2_quad[0], r2_2, 1e-5)
check("partial_f", pf.partial_f[0], (sse1 - sse2) / (sse2 / (n - 3)), 1e-5)

s2 = sse2 / (n - 3)
cp = oracle("ml_mallows_cp_models")
check("s2_full_d2", cp.s2_full_d2[0], s2, 1e-5)
check("cp_linear", cp.cp_linear[0], sse1 / s2 - n + 4, 1e-5)
check("cp_quad_check", cp.cp_quad_check[0], 3.0, 1e-9)

ab = oracle("ml_aic_bic_order_models")
check("aic_linear", ab.aic_linear[0], n * math.log(sse1 / n) + 4, 1e-5)
check("aic_quad", ab.aic_quad[0], n * math.log(sse2 / n) + 6, 1e-5)
check("bic_linear", ab.bic_linear[0], n * math.log(sse1 / n) + 2 * math.log(n), 1e-5)
check("bic_quad", ab.bic_quad[0], n * math.log(sse2 / n) + 3 * math.log(n), 1e-5)

sb = oracle("ml_std_betas_quadratic")
sdy = math.sqrt(syy)
sdu = math.sqrt(float(((x - x.mean()) ** 2).sum()))
v = x * x
sdv = math.sqrt(float(((v - v.mean()) ** 2).sum()))
check("b_x_dollars", sb.b_x_dollars[0], b2[1], 1e-5)
check("b_x2_dollars", sb.b_x2_dollars[0], b2[2], 1e-4)
check("std_beta_x", sb.std_beta_x[0], b2[1] * sdu / sdy, 1e-5)
check("std_beta_x2", sb.std_beta_x2[0], b2[2] * sdv / sdy, 1e-5)

# externally studentized residuals on the LINEAR model, hat-matrix form
sxx = float(((x - x.mean()) ** 2).sum())
h = 1.0 / n + (x - x.mean()) ** 2 / sxx
s_loo2 = (sse1 - e1 * e1 / (1 - h)) / (n - 3)
tt = np.abs(e1 / (np.sqrt(s_loo2) * np.sqrt(1 - h)))
bo = oracle("ml_bonferroni_outlier_max_t")
check("max_abs_t", bo.max_abs_t[0], float(tt.max()), 1e-5)
check("n_above_4", float(bo.n_above_4[0]), float((tt > 4).sum()), 1e-9)
keys = con.execute("SELECT o_orderkey FROM orders").fetchall()
okeys = np.array([r[0] for r in keys])
cand = okeys[np.isclose(tt, tt.max(), rtol=1e-9)]
check("top_orderkey", float(bo.top_orderkey[0]), float(cand.min()), 1e-12)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
