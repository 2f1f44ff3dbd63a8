#!/usr/bin/env python
"""In-wave cross-check for r15 wave 23: independent numpy financial
risk machinery (float log-returns straight from the cent series,
np.sort VaR/CVaR, textbook Sharpe/Sortino/Ulcer/Omega/Kappa/Kelly)
vs the DuckDB oracles.  Tolerances absorb the 6dp return snap.

    python tools_crosscheck_r15w23.py [sf_dir]
"""
import math
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


d = con.execute(
    "SELECT CAST(o_orderdate AS DATE) dy, "
    "SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) rev "
    "FROM orders GROUP BY 1 ORDER BY 1"
).df()
rev = d.rev.to_numpy(dtype=float)
r = np.log(rev[1:] / rev[:-1])
n = len(r)

# VaR / CVaR
o = con.execute(CATALOG["orders_var_cvar_daily"].oracle).df()
sr = np.sort(r)
for lvl in (95, 99):
    k = (100 - lvl) * n // 100 + (1 if ((100 - lvl) * n) % 100 else 0)
    var = -sr[k - 1]
    cvar = -sr[:k].mean()
    row = o[o.level_pct == lvl].iloc[0]
    check(f"var[{lvl}]", row.var_logret, var, 5e-5)
    check(f"cvar[{lvl}]", row.cvar_logret, cvar, 5e-5)
    check(f"ntail[{lvl}]", float(row.n_tail), k, 0)

# Sharpe / Sortino
mu, sd = r.mean(), r.std(ddof=1)
dd = math.sqrt((np.minimum(r, 0) ** 2).mean())
o = con.execute(CATALOG["orders_sharpe_sortino_daily"].oracle).df().iloc[0]
check("sharpe", o.sharpe_annual, mu / sd * math.sqrt(252), 1e-4)
check("sortino", o.sortino_annual, mu / dd * math.sqrt(252), 1e-4)

# Ulcer / Martin
peak = np.maximum.accumulate(rev)
ddq = (peak - rev) / peak
ui = math.sqrt((ddq**2).mean())
o = con.execute(CATALOG["orders_ulcer_martin_daily"].oracle).df().iloc[0]
check("ulcer", o.ulcer_index, ui, 1e-5)
check("martin", o.martin_ratio, mu / ui, 1e-4)
check("underwater", float(o.n_underwater), int((ddq > 0).sum()), 0)

# Omega / Kappa3
gains = r[r > 0].sum()
losses = -r[r < 0].sum()
lpm3 = ((np.maximum(-r, 0)) ** 3).mean()
o = con.execute(CATALOG["orders_omega_kappa_daily"].oracle).df().iloc[0]
check("omega", o.omega_ratio, gains / losses, 1e-4)
check("kappa3", o.kappa_3, mu / lpm3 ** (1 / 3), 1e-3)

# Kelly
v = r.var(ddof=0)
f = mu / v
o = con.execute(CATALOG["orders_kelly_growth_daily"].oracle).df().iloc[0]
check("kelly f", o.kelly_fraction, f, 1e-4)
check("kelly g", o.growth_full_kelly_annual, (f * mu - f * f * v / 2) * 252, 1e-3)
check(
    "kelly g half",
    o.growth_half_kelly_annual,
    ((f / 2) * mu - (f / 2) ** 2 * v / 2) * 252,
    1e-3,
)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
