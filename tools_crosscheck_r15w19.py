#!/usr/bin/env python
"""In-wave cross-check for r15 wave 19: independent numpy dependence
machinery (np.quantile type-7 thresholds re-snapped, brute joint
counts for the copula grid / tail lambdas / Blomqvist quadrants,
O(n^2) loop Hoeffding D, argsort Chatterjee xi) vs the DuckDB oracles.

    python tools_crosscheck_r15w19.py [sf_dir]
"""
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("orders", "customer", "events"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


xy = con.execute(
    "SELECT CAST(CAST(c.c_acctbal AS DECIMAL(18,2))*100 AS BIGINT) x, "
    "SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) y "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "GROUP BY c.c_custkey, c.c_acctbal"
).df()
x = xy.x.to_numpy(dtype=np.int64)
y = xy.y.to_numpy(dtype=np.int64)
n = len(x)


def snap_q(arr, q):
    return math.floor(np.quantile(arr.astype(float), q, method="linear") + 0.5)


# --- copula grid ---
o = con.execute(CATALOG["ml_empirical_copula_grid"].oracle).df()
for ku in (1, 3, 5):
    for kv in (2, 4):
        xq = snap_q(x, ku / 5.0)
        yq = snap_q(y, kv / 5.0)
        c = int(((x <= xq) & (y <= yq)).sum())
        row = o[(abs(o.u - ku / 5.0) < 1e-9) & (abs(o.v - kv / 5.0) < 1e-9)].iloc[0]
        check(f"cop n[{ku},{kv}]", float(row.n_joint), c, 0)
        check(f"cop C[{ku},{kv}]", row.copula, c / n, 1e-6)
        check(
            f"cop gap[{ku},{kv}]",
            row.independence_gap,
            c / n - (ku / 5.0) * (kv / 5.0),
            1e-6,
        )

# --- tail dependence ---
o = con.execute(CATALOG["ml_tail_dependence_customer"].oracle).df()
for q in (0.90, 0.95):
    xu, yu = snap_q(x, q), snap_q(y, q)
    xl, yl = snap_q(x, 1 - q), snap_q(y, 1 - q)
    nxu = int((x > xu).sum())
    nuu = int(((x > xu) & (y > yu)).sum())
    nxl = int((x <= xl).sum())
    nll = int(((x <= xl) & (y <= yl)).sum())
    row = o[abs(o.q - q) < 1e-9].iloc[0]
    check(f"tail lu[{q}]", row.lambda_upper, nuu / nxu, 1e-6)
    check(f"tail ll[{q}]", row.lambda_lower, nll / nxl, 1e-6)
    check(f"tail nxu[{q}]", float(row.n_x_upper), nxu, 0)
    check(f"tail nxl[{q}]", float(row.n_x_lower), nxl, 0)

# --- Blomqvist beta (exact doubled medians) ---
xs, ys = np.sort(x), np.sort(y)
mx2 = int(xs[(n - 1) // 2] + xs[n // 2])
my2 = int(ys[(n - 1) // 2] + ys[n // 2])
hx, hy = 2 * x > mx2, 2 * y > my2
n11 = int((hx & hy).sum())
n00 = int((~hx & ~hy).sum())
n10 = int((hx & ~hy).sum())
n01 = int((~hx & hy).sum())
o = con.execute(CATALOG["ml_blomqvist_beta_customer"].oracle).df().iloc[0]
check("blomqvist n11", float(o.n11), n11, 0)
check("blomqvist beta", o.blomqvist_beta, (n11 + n00 - n10 - n01) / n, 1e-6)

# --- daily pairs for Hoeffding / Chatterjee ---
d = con.execute(
    "SELECT date_trunc('day', ts) dy, COUNT(*) xx, "
    "SUM(CAST(round(value*100) AS BIGINT)) yy FROM events GROUP BY 1 ORDER BY 1"
).df()
nd = len(d)
order_x = sorted(range(nd), key=lambda i: (d.xx[i], d.dy[i]))
order_y = sorted(range(nd), key=lambda i: (d.yy[i], d.dy[i]))
R = [0] * nd
S = [0] * nd
for rank, i in enumerate(order_x, 1):
    R[i] = rank
for rank, i in enumerate(order_y, 1):
    S[i] = rank

Q = [1 + sum(1 for j in range(nd) if R[j] < R[i] and S[j] < S[i]) for i in range(nd)]
D1 = sum((q - 1) * (q - 2) for q in Q)
D2 = sum((R[i] - 1) * (R[i] - 2) * (S[i] - 1) * (S[i] - 2) for i in range(nd))
D3 = sum((R[i] - 2) * (S[i] - 2) * (Q[i] - 1) for i in range(nd))
hd = (
    30.0
    * ((nd - 2) * (nd - 3) * D1 + D2 - 2 * (nd - 2) * D3)
    / (nd * (nd - 1) * (nd - 2) * (nd - 3) * (nd - 4))
)
o = con.execute(CATALOG["ml_hoeffding_d_daily"].oracle).df().iloc[0]
check("hoeffding d1", float(o.d1), D1, 0)
check("hoeffding d2", float(o.d2), D2, 0)
check("hoeffding d3", float(o.d3), D3, 0)
check("hoeffding D", o.hoeffding_d, hd, 1e-6)

s_by_r = [S[i] for i in sorted(range(nd), key=lambda i: R[i])]
sad = sum(abs(s_by_r[i + 1] - s_by_r[i]) for i in range(nd - 1))
xi = 1 - 3 * sad / (nd * nd - 1)
o = con.execute(CATALOG["ml_chatterjee_xi_daily"].oracle).df().iloc[0]
check("chatterjee sad", float(o.sum_abs_diff), sad, 0)
check("chatterjee xi", o.chatterjee_xi, xi, 1e-6)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
