#!/usr/bin/env python
"""In-wave cross-check for r14 wave 12: independent numpy (explicit
auxiliary OLS for White/RESET, textbook Sobel, full-precision Box-Cox
profile LL, Hausman from raw arrays) vs the DuckDB oracles."""
import sys
from math import log, sqrt

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


def ols2(u, v, w):
    """Centered 2-regressor fit; returns (b, c, SSR_u, SSR_r_on_u)."""
    uc, vc, wc = u - u.mean(), v - v.mean(), w - w.mean()
    Suu, Svv, Suv = (uc * uc).sum(), (vc * vc).sum(), (uc * vc).sum()
    Suw, Svw, Sww = (uc * wc).sum(), (vc * wc).sum(), (wc * wc).sum()
    det = Suu * Svv - Suv**2
    b = (Suw * Svv - Svw * Suv) / det
    c = (Svw * Suu - Suw * Suv) / det
    return b, c, Sww - b * Suw - c * Svw, Sww - Suw**2 / Suu, Suw, Svw, Sww


# shared residual frame reproduced independently
rows = con.execute("""
  SELECT o.o_orderkey,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
         (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
  FROM orders o""").fetchall()
y = np.array([r[1] for r in rows], dtype=np.float64)
x = np.array([r[2] for r in rows], dtype=np.float64)
n = len(x)
# the shared frame's quantized line (micro slope/intercept)
import math
sl6 = math.floor((n * (x * y).sum() - x.sum() * y.sum())
                 / (n * (x * x).sum() - x.sum() ** 2) * 1e6 + 0.5)
i6 = math.floor((y.sum() * 1e6 - sl6 * x.sum()) / n + 0.5)
e6 = y * 1e6 - (i6 + sl6 * x)
ec = np.floor(e6 / 1e6 + 0.5)

# White
b, c, ssru, ssrr, Suw, Svw, Sww = ols2(x, x * x, ec * ec)
r2 = (b * Suw + c * Svw) / Sww
row = oracle("ml_white_test_hetero")
check("white r2", row.r2_aux[0], r2, 1e-5)
check("white lm", row.white_lm[0], n * r2, 1e-4)

# RESET
b, c, ssru, ssrr, *_ = ols2(x, x * x, y)
row = oracle("ml_ramsey_reset_quadratic")
check("reset F", row.reset_f[0], (ssrr - ssru) / (ssru / (n - 3)), 1e-4)

# Sobel
li = con.execute("""
  SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
         CAST(l_quantity AS BIGINT),
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
  FROM lineitem""").fetchall()
xx = np.array([r[0] for r in li], dtype=np.float64)
mm = np.array([r[1] for r in li], dtype=np.float64)
yy = np.array([r[2] for r in li], dtype=np.float64)
nn = len(xx)
xc, mc, yc = xx - xx.mean(), mm - mm.mean(), yy - yy.mean()
Sxx = (xc * xc).sum()
Smm = (mc * mc).sum()
Sxm = (xc * mc).sum()
Sxy = (xc * yc).sum()
Smy = (mc * yc).sum()
Syy = (yc * yc).sum()
a = Sxm / Sxx
det = Smm * Sxx - Sxm**2
bq = (Smy * Sxx - Sxy * Sxm) / det
ssr_a = Smm - Sxm**2 / Sxx
cq = (Sxy * Smm - Smy * Sxm) / det
ssr_y = Syy - bq * Smy - cq * Sxy
var_a = (ssr_a / (nn - 2)) / Sxx
var_b = (ssr_y / (nn - 3)) * Sxx / det
z = a * bq / sqrt(bq**2 * var_a + a**2 * var_b)
row = oracle("ml_sobel_mediation_dmq")
check("sobel a", row.a_path[0], a, 1e-5)
check("sobel b", row.b_path[0], bq, 1e-5)
check("sobel z", row.sobel_z[0], z, 1e-4)

# Box-Cox
yv = np.array(
    [float(r[0]) for r in con.execute(
        "SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) FROM orders"
    ).fetchall()]
)
slny = np.log(yv).sum()
row = oracle("ml_box_cox_grid").set_index("lambda")
for lam in (-1.0, -0.5, 0.0, 0.5, 1.0):
    if lam == 0:
        zv = np.log(yv)
    else:
        zv = (yv**lam - 1) / lam
    sig2 = zv.var()
    ll = -(len(yv) / 2) * log(sig2) + (lam - 1) * slny
    check(f"boxcox LL[{lam}]", row.loc[lam].profile_loglik, ll, 1e-5)

# Hausman
zz2 = np.array(
    [float(r[0]) for r in con.execute(
        "SELECT CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) FROM lineitem"
    ).fetchall()]
)
zc = zz2 - zz2.mean()
Szz = (zc * zc).sum() / nn
Szx = (zc * xc).sum() / nn
yq = np.array([r[1] for r in li], dtype=np.float64)  # quantity is the DV here
yqc = yq - yq.mean()
Szy = (zc * yqc).sum() / nn
Cxx = Sxx / nn
Cxy = (xc * yqc).sum() / nn
Cyy = (yqc * yqc).sum() / nn
b_ols = Cxy / Cxx
b_iv = Szy / Szx
s2o = (Cyy - 2 * b_ols * Cxy + b_ols**2 * Cxx) / (nn - 2)
s2i = (Cyy - 2 * b_iv * Cxy + b_iv**2 * Cxx) / (nn - 2)
vd = s2i * Szz / Szx**2 - s2o / Cxx
row = oracle("ml_hausman_iv_vs_ols")
check("hausman H", row.hausman_h[0], (b_iv - b_ols) ** 2 / vd, 1e-4)
check("hausman vdiff", row.var_diff[0], vd, 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
