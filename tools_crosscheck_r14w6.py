#!/usr/bin/env python
"""In-wave cross-check for r14 wave 6 (survey sampling): independent
Python estimators from raw rows (Decimal arithmetic, hashlib sha256
sample membership) vs the DuckDB oracles."""
import hashlib
import sys
from collections import defaultdict
from decimal import Decimal

import duckdb

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


rows = con.execute("""
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS tp
  FROM orders
""").fetchall()

ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:26s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


def u01(key):
    return int(hashlib.sha256(str(key).encode()).hexdigest()[:8], 16) / 4294967296.0


# Kish
wc = defaultdict(Decimal)
for k, c, st, pr, tp in rows:
    wc[c] += Decimal(tp)
ws = [float(v) for v in wc.values()]
sw, sw2, n = sum(ws), sum(w * w for w in ws), len(ws)
row = oracle("cust_kish_ess_revenue_weights")
check("kish ess", row.kish_ess[0], sw * sw / sw2, 1e-5)
check("kish deff", row.deff_weights[0], n * sw2 / (sw * sw), 1e-5)

# HT
PI = {"O": (0.1, 10), "F": (0.2, 5), "P": (0.5, 2)}
est = Decimal(0)
truth = Decimal(0)
for k, c, st, pr, tp in rows:
    truth += Decimal(tp)
    pi, inv = PI[st]
    if u01(k) < pi:
        est += Decimal(tp) * inv
row = oracle("ml_horvitz_thompson_total")
check("ht estimate", row.ht_estimate[0], float(est), 1e-9)
check("ht rel_err", row.rel_error[0], float((est - truth) / truth), 1e-4)

# Neyman
strat = defaultdict(lambda: [0, Decimal(0), Decimal(0)])
for k, c, st, pr, tp in rows:
    a = strat[pr]
    a[0] += 1
    a[1] += Decimal(tp)
    a[2] += Decimal(tp) * Decimal(tp)
sh = {}
for p, (m, sv, sv2) in strat.items():
    var = (float(sv2) - float(sv) ** 2 / m) / (m - 1)
    sh[p] = (m, var**0.5)
mass = sum(m * s for m, s in sh.values())
row = oracle("ml_neyman_allocation").set_index("stratum")
for p, (m, s) in sorted(sh.items()):
    check(f"neyman[{p[:8]}]", row.loc[p].neyman_share, m * s / mass, 1e-5)

# post-strat
smp = defaultdict(lambda: [0, Decimal(0)])
for k, c, st, pr, tp in rows:
    if u01(k) < 0.1:
        smp[pr][0] += 1
        smp[pr][1] += Decimal(tp)
N = len(rows)
ps = sum(
    (strat[p][0] / N) * (float(sv) / m) for p, (m, sv) in smp.items()
)
row = oracle("ml_poststratification_estimate")
check("poststrat mean", row.poststrat_mean[0], ps, 1e-5)

# ICC / deff
cl = defaultdict(list)
for k, c, st, pr, tp in rows:
    cl[c].append(float(Decimal(tp)))
k_ = len(cl)
n_ = sum(len(v) for v in cl.values())
gmean = sum(sum(v) for v in cl.values()) / n_
ssb = sum(len(v) * (sum(v) / len(v) - gmean) ** 2 for v in cl.values())
ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in cl.values())
msb = ssb / (k_ - 1)
msw = ssw / (n_ - k_)
m0 = (n_ - sum(len(v) ** 2 for v in cl.values()) / n_) / (k_ - 1)
icc = (msb - msw) / (msb + (m0 - 1) * msw)
deff = 1 + (n_ / k_ - 1) * icc
row = oracle("ml_cluster_deff_icc")
check("icc", row.icc[0], icc, 1e-4)
check("deff", row.deff[0], deff, 1e-4)
check("msb", row.ms_between[0], msb, 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
