#!/usr/bin/env python
"""In-wave cross-check for r15 wave 29: independent pandas/numpy ML
machinery (hashlib fold assignment + per-fold np.polyfit refits — NOT
the moment-subtraction identity, so the identity itself is tested —
sklearn-free R^2 via lstsq, dict LOO encodings, np two-sample KS on
bands) vs the DuckDB oracles.

    python tools_crosscheck_r15w29.py [sf_dir]
"""
import hashlib
import math
import sys

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("orders", "lineitem", "part"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


def hv(key, salt):
    return int(hashlib.sha256(f"{key}{salt}".encode()).hexdigest()[:8], 16)


oxy = con.execute(
    "SELECT o.o_orderkey ok, SUM(CAST(l.l_quantity AS BIGINT)) x, "
    "CAST(CAST(MIN(o.o_totalprice) AS DECIMAL(18,2))*100 AS BIGINT) y "
    "FROM orders o JOIN lineitem l ON l.l_orderkey=o.o_orderkey "
    "GROUP BY o.o_orderkey"
).df()
x = oxy.x.to_numpy(dtype=float)
y = oxy.y.to_numpy(dtype=float)

# --- kfold (explicit per-fold refits) ---
folds = oxy.ok.map(lambda k: hv(k, "cv15") * 5 // 2**32).to_numpy()
o = con.execute(CATALOG["ml_kfold_cv_order_model"].oracle).df()
for f in range(5):
    te = folds == f
    b, a = np.polyfit(x[~te], y[~te], 1)
    mse_te = float(((y[te] - a - b * x[te]) ** 2).mean())
    mse_tr = float(((y[~te] - a - b * x[~te]) ** 2).mean())
    row = o[o.fold == f].iloc[0]
    check(f"cv n_te[{f}]", float(row.n_test), int(te.sum()), 0)
    check(f"cv te[{f}]", row.test_mse_dollars2, mse_te / 1e4, 1e-5)
    check(f"cv tr[{f}]", row.train_mse_dollars2, mse_tr / 1e4, 1e-5)

# --- learning curve ---
is_te = oxy.ok.map(lambda k: hv(k, "lc15te") < 858993459).to_numpy()
htr = oxy.ok.map(lambda k: hv(k, "lc15tr")).to_numpy()
o = con.execute(CATALOG["ml_learning_curve_order_model"].oracle).df()
for q in (10, 20, 40, 80):
    tr = (~is_te) & (htr < q * 42949673)
    b, a = np.polyfit(x[tr], y[tr], 1)
    mse_te = float(((y[is_te] - a - b * x[is_te]) ** 2).mean())
    row = o[o.train_pct == q].iloc[0]
    check(f"lc n[{q}]", float(row.n_train), int(tr.sum()), 0)
    check(f"lc te[{q}]", row.test_mse_dollars2, mse_te / 1e4, 1e-5)

# --- drop-column importance ---
ox = con.execute(
    "SELECT SUM(CAST(l.l_quantity AS BIGINT)) x1, "
    "(SUM(CAST(CAST(l.l_discount AS DECIMAL(18,2))*100 AS BIGINT))*10000)"
    "//COUNT(*) x2, "
    "CAST(CAST(MIN(o.o_totalprice) AS DECIMAL(18,2))*100 AS BIGINT) y "
    "FROM orders o JOIN lineitem l ON l.l_orderkey=o.o_orderkey "
    "GROUP BY o.o_orderkey"
).df()
X = np.column_stack(
    [np.ones(len(ox)), ox.x1.astype(float), ox.x2.astype(float)]
)
yy = ox.y.to_numpy(dtype=float)
bet = np.linalg.lstsq(X, yy, rcond=None)[0]
sst = ((yy - yy.mean()) ** 2).sum()
r2f = 1 - ((yy - X @ bet) ** 2).sum() / sst
r21 = np.corrcoef(ox.x1.astype(float), yy)[0, 1] ** 2
r22 = np.corrcoef(ox.x2.astype(float), yy)[0, 1] ** 2
o = con.execute(CATALOG["ml_drop_column_importance"].oracle).df().iloc[0]
check("dc r2 full", o.r2_full, r2f, 1e-5)
check("dc r2 qty", o.r2_qty_only, r21, 1e-5)
check("dc imp qty", o.importance_qty, r2f - r22, 1e-5)
check("dc imp disc", o.importance_disc, r2f - r21, 1e-5)

# --- LOO target encoding ---
lx = con.execute(
    "SELECT p.p_brand g, CAST(l.l_quantity AS BIGINT) y "
    "FROM lineitem l JOIN part p ON p.p_partkey=l.l_partkey"
).df()
gs = lx.groupby("g").y.agg(["sum", "count"])
s = lx.g.map(gs["sum"]).to_numpy(dtype=np.int64)
nn = lx.g.map(gs["count"]).to_numpy(dtype=np.int64)
yv = lx.y.to_numpy(dtype=np.int64)
e_naive = (s * 1000000) // nn
e_loo = ((s - yv) * 1000000) // (nn - 1)
cn = np.corrcoef(e_naive.astype(float), yv.astype(float))[0, 1]
cl = np.corrcoef(e_loo.astype(float), yv.astype(float))[0, 1]
o = con.execute(CATALOG["ml_target_encoding_loo"].oracle).df().iloc[0]
check("te naive", o.corr_naive, cn, 1e-5)
check("te loo", o.corr_loo, cl, 1e-5)
check("te gap", o.leakage_gap, cn - cl, 1e-4)
print(f"context: naive corr {cn:+.4f} vs LOO {cl:+.4f} — the leak is visible")

# --- banded KS drift ---
od = con.execute(
    "SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)//100000 band, "
    "CASE WHEN EXTRACT(year FROM o_orderdate) < 1998 THEN 0 ELSE 1 END grp "
    "FROM orders"
).df()
b1 = np.bincount(od[od.grp == 0].band, minlength=int(od.band.max()) + 1)
b2 = np.bincount(od[od.grp == 1].band, minlength=int(od.band.max()) + 1)
c1, c2 = np.cumsum(b1), np.cumsum(b2)
n1, n2 = int(b1.sum()), int(b2.sum())
gaps = np.abs(c1.astype(np.int64) * n2 - c2.astype(np.int64) * n1)
# restrict to bands that exist in the data (the SQL frame has only those)
present = sorted(set(od.band))
gp = {b: gaps[b] for b in present}
ks = max(gp.values()) / (n1 * n2)
o = con.execute(CATALOG["ml_feature_drift_ks_banded"].oracle).df().iloc[0]
check("ks", o.ks_statistic, ks, 1e-6)
check("ks n1", float(o.n_pre), n1, 0)
check(
    "ks band",
    float(o.ks_band),
    min(b for b, g in gp.items() if g == max(gp.values())),
    0,
)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
