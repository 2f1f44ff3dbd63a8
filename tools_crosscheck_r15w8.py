#!/usr/bin/env python
"""In-wave cross-check for r15 wave 8: independent numpy linear
algebra (lstsq auxiliary regressions, float autocovariances, polyfit
segment lines) vs the DuckDB oracles.

    python tools_crosscheck_r15w8.py [sf_dir]
"""
import sys

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("orders", "events"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")

ok = True


def check(name, got, want, tol=1e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:22s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# daily event counts
dc = con.execute(
    "SELECT date_trunc('day', ts) d, COUNT(*) FROM events GROUP BY 1 ORDER BY 1"
).fetchall()
c = np.array([r[1] for r in dc], dtype=float)
n = len(c)
z = c - c.mean()
r = [1.0] + [float((z[k:] * z[:-k]).sum() / (z * z).sum()) for k in (1, 2, 3)]
o = con.execute(CATALOG["evt_pacf_durbin_levinson"].oracle).df()
check("r1", o.r1[0], r[1])
check("pacf2", o.pacf2[0], (r[2] - r[1] ** 2) / (1 - r[1] ** 2))
p21 = r[1] * (1 - r[2]) / (1 - r[1] ** 2)
p22 = (r[2] - r[1] ** 2) / (1 - r[1] ** 2)
check("pacf3", o.pacf3[0], (r[3] - p21 * r[2] - p22 * r[1]) / (1 - p21 * r[1] - p22 * r[2]))

phi1, phi2 = p21, p22
o = con.execute(CATALOG["evt_yule_walker_ar2"].oracle).df()
check("phi1", o.phi1[0], phi1)
check("phi2", o.phi2[0], phi2)
c0hat = float((z * z).sum()) / n
check("sigma2", o.sigma2_innov[0], c0hat * (1 - phi1 * r[1] - phi2 * r[2]), 1e-3)
pred_e = z[2:] - phi1 * z[1:-1] - phi2 * z[:-2]
check("rmse", o.rmse_one_step[0], float(np.sqrt((pred_e**2).mean())), 1e-4)

# daily order-count trend residuals (micro-quantized line like q49)
od = con.execute(
    "SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)), COUNT(*)"
    " FROM orders GROUP BY 1 ORDER BY 1"
).fetchall()
x = np.array([r_[0] for r_ in od], dtype=float)
y = np.array([r_[1] for r_ in od], dtype=float)
nn = len(x)
sl = float(((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum())
s6 = np.floor(sl * 1e6 + 0.5)
i6 = np.floor((y.sum() * 1e6 - s6 * x.sum()) / nn + 0.5)
e = (y * 1e6 - (i6 + s6 * x)) / 1e6  # count units

# BG lag-1
u, v, w = x[1:], e[:-1], e[1:]
X = np.column_stack([np.ones(len(u)), u, v])
b, *_ = np.linalg.lstsq(X, w, rcond=None)
resid = w - X @ b
r2 = 1 - (resid**2).sum() / ((w - w.mean()) ** 2).sum()
o = con.execute(CATALOG["ml_breusch_godfrey_lag1"].oracle).df()
check("bg r2", o.r2_aux[0], r2, 1e-5)
check("bg lm", o.bg_lm[0], len(u) * r2, 1e-4)

# GQ
k = nn // 3
def sse_fit(xs, ys):
    sl_ = float(((xs - xs.mean()) * (ys - ys.mean())).sum() / ((xs - xs.mean()) ** 2).sum())
    s6_ = np.floor(sl_ * 1e6 + 0.5)
    i6_ = np.floor((ys.sum() * 1e6 - s6_ * xs.sum()) / len(xs) + 0.5)
    ee = ys * 1e6 - (i6_ + s6_ * xs)
    return float((ee**2).sum()) / 1e12, len(xs)
sse0, k0 = sse_fit(x[:k], y[:k])
sse1, k1 = sse_fit(x[nn - k:], y[nn - k:])
o = con.execute(CATALOG["ml_goldfeld_quandt_daily"].oracle).df()
check("gq f", o.gq_f[0], (sse1 / (k1 - 2)) / (sse0 / (k0 - 2)), 1e-5)

# CO
rho = float((e[1:] * e[:-1]).sum() / (e[:-1] ** 2).sum())
ys = y[1:] - rho * y[:-1]
xs = x[1:] - rho * x[:-1]
slope_co = float(((xs - xs.mean()) * (ys - ys.mean())).sum() / ((xs - xs.mean()) ** 2).sum())
o = con.execute(CATALOG["ml_cochrane_orcutt_onestep"].oracle).df()
check("rho", o.rho[0], rho, 1e-5)
check("slope_co", o.slope_co[0], slope_co, 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
