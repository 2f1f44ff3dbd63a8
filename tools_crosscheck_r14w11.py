#!/usr/bin/env python
"""In-wave cross-check for r14 wave 11 (bivariate daily): independent
numpy implementations (lstsq-style Granger via explicit normal
equations on raw floats, direct CCF, dict-count transfer entropy,
textbook CCC and NW) vs the DuckDB oracles."""
import sys
from collections import Counter
from math import log, sqrt
from statistics import median

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


ok = True


def check(name, got, want, tol=1e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:26s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


rows = con.execute("""
  SELECT CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT) AS dn,
         CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN event_type='purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END) * 100, 0) AS BIGINT)
  FROM events GROUP BY 1 ORDER BY 1
""").fetchall()
x = np.array([r[1] for r in rows], dtype=np.float64)
y = np.array([r[2] for r in rows], dtype=np.float64)
n = len(rows)

# Granger via explicit centered normal equations
w = y[1:]
u = y[:-1]
v = x[:-1]
uc, vc, wc = u - u.mean(), v - v.mean(), w - w.mean()
Suu, Svv, Suv = (uc * uc).sum(), (vc * vc).sum(), (uc * vc).sum()
Suw, Svw, Sww = (uc * wc).sum(), (vc * wc).sum(), (wc * wc).sum()
det = Suu * Svv - Suv**2
b = (Suw * Svv - Svw * Suv) / det
c = (Svw * Suu - Suw * Suv) / det
ssr_u = Sww - b * Suw - c * Svw
ssr_r = Sww - Suw**2 / Suu
m = len(w)
row = oracle("evt_granger_clicks_to_purchases")
check("granger b", row.beta_y_lag[0], b, 1e-4)
check("granger c", row.beta_x_lag[0], c, 1e-4)
check("granger F", row.f_granger[0], (ssr_r - ssr_u) / (ssr_u / (m - 3)), 1e-4)

# CCF
row = oracle("evt_cross_correlation_lags").set_index("lag_days")
for l in range(-3, 4):
    if l >= 0:
        xa, yb = x[: n - l], y[l:]
    else:
        xa, yb = x[-l:], y[: n + l]
    r = np.corrcoef(xa, yb)[0, 1]
    check(f"ccf[{l}]", row.loc[l].ccf, r, 1e-5)

# transfer entropy
mx2, my2 = 2 * median(x.astype(int)), 2 * median(y.astype(int))
bx = (2 * x > mx2).astype(int)
by = (2 * y > my2).astype(int)


def te(src, dst):
    c3 = Counter(zip(dst[1:], dst[:-1], src[:-1]))
    cy = Counter(dst[:-1])
    cyx = Counter(zip(dst[:-1], src[:-1]))
    cyy = Counter(zip(dst[1:], dst[:-1]))
    nn = len(dst) - 1
    s = 0.0
    for (yp, yc, xc), cnt in c3.items():
        s += cnt / nn * log(cnt * cy[yc] / (cyx[(yc, xc)] * cyy[(yp, yc)]))
    return s


row = oracle("evt_transfer_entropy_binary")
check("te x->y", row.te_clicks_to_purchases[0], te(bx, by), 1e-4)
check("te y->x", row.te_purchases_to_clicks[0], te(by, bx), 1e-4)

# Lin CCC
act, fc = y[7:], y[:-7]
sxy = ((act - act.mean()) * (fc - fc.mean())).sum()
sxx = ((act - act.mean()) ** 2).sum()
syy = ((fc - fc.mean()) ** 2).sum()
mm = len(act)
ccc = 2 * sxy / (sxx + syy + mm * (act.mean() - fc.mean()) ** 2)
row = oracle("ml_lin_ccc_seasonal_forecast")
check("lin ccc", row.lin_ccc[0], ccc, 1e-5)
check("pearson", row.pearson_r[0], sxy / sqrt(sxx * syy), 1e-5)

# NW
yd = y / 100.0
ybar = yd.mean()
g = [((yd[: n - l] - ybar) * (yd[l:] - ybar)).sum() / n for l in range(6)]
nw = g[0] + 2 * sum((1 - l / 6) * g[l] for l in range(1, 6))
row = oracle("evt_newey_west_variance")
check("nw gamma0", row.gamma0[0], g[0], 1e-4)
check("nw var", row.nw_variance[0], nw, 1e-4)
check("nw inflation", row.hac_inflation[0], nw / g[0], 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
