#!/usr/bin/env python
"""In-wave cross-check for r15 wave 30: independent pandas/numpy
machinery (explicit demeaned-regression FE — NOT the group-product
identity, so the identity is what gets tested — textbook Bland-Altman,
brute per-pair DeLong placements, hashlib PPS inclusion, sequential
numpy ESD) vs the DuckDB oracles.

    python tools_crosscheck_r15w30.py [sf_dir]
"""
import hashlib
import math
import sys

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("orders", "documents", "events"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


# --- panel FE (explicit demeaning) ---
p = con.execute(
    "SELECT o_custkey ck, EXTRACT(year FROM o_orderdate) yr, COUNT(*) x, "
    "SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) y "
    "FROM orders GROUP BY 1,2"
).df()
x = p.x.to_numpy(dtype=float)
y = p.y.to_numpy(dtype=float)
gm = p.groupby("ck")[["x", "y"]].transform("mean")
xd = x - gm.x.to_numpy()
yd = y - gm.y.to_numpy()
beta_fe = (xd * yd).sum() / (xd * xd).sum()
beta_pooled = np.polyfit(x, y, 1)[0]
mg = p.groupby("ck")[["x", "y"]].mean()
beta_btw = np.polyfit(mg.x, mg.y, 1)[0]
o = con.execute(CATALOG["cust_panel_fixed_effects"].oracle).df().iloc[0]
check("fe pooled", o.beta_pooled_dollars, beta_pooled / 100, 1e-4)
check("fe within", o.beta_within_dollars, beta_fe / 100, 1e-3)
check("fe between", o.beta_between_dollars, beta_btw / 100, 1e-3)
print(
    f"context: pooled {o.beta_pooled_dollars:.2f} / within "
    f"{o.beta_within_dollars:.2f} / between {o.beta_between_dollars:.2f} $/order"
)

# --- Bland-Altman ---
docs = con.execute("SELECT text, n_chars FROM documents").df()
m1 = docs.text.map(lambda s: len([w for w in s.lower().split(" ") if w]))
m2 = docs.n_chars // 5
d = (m1 - m2).to_numpy(dtype=float)
bias, sd = d.mean(), d.std(ddof=1)
o = con.execute(CATALOG["ml_bland_altman_token_methods"].oracle).df().iloc[0]
check("ba bias", o.bias, bias, 1e-5)
check("ba sd", o.sd_diff, sd, 1e-5)
check("ba loa lo", o.loa_lower, bias - 1.959964 * sd, 1e-4)
check(
    "ba outside",
    o.share_outside,
    float((np.abs(d - bias) > 1.959964 * sd).mean()),
    1e-6,
)

# --- DeLong (brute placements on bands) ---
od = con.execute(
    "SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)//100000 band, "
    "CASE WHEN o_orderpriority='1-URGENT' THEN 1 ELSE 0 END pos FROM orders"
).df()
pb = od[od.pos == 1].band.to_numpy()
nb = od[od.pos == 0].band.to_numpy()
NP, NN = len(pb), len(nb)
nsort = np.sort(nb)
v10 = (
    np.searchsorted(nsort, pb, side="left")
    + 0.5 * (np.searchsorted(nsort, pb, side="right")
             - np.searchsorted(nsort, pb, side="left"))
) / NN
psort = np.sort(pb)
v01 = (
    (NP - np.searchsorted(psort, nb, side="right"))
    + 0.5 * (np.searchsorted(psort, nb, side="right")
             - np.searchsorted(psort, nb, side="left"))
) / NP
auc = v10.mean()
se = math.sqrt(v10.var(ddof=1) / NP + v01.var(ddof=1) / NN)
o = con.execute(CATALOG["ml_delong_auc_variance"].oracle).df().iloc[0]
check("delong auc", o.auc, auc, 1e-5)
check("delong se", o.se_delong, se, 1e-4)
check("delong lo", o.ci_lower, auc - 1.959964 * se, 1e-4)

# --- PPS ---
v = con.execute(
    "SELECT o_orderkey ok, CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 "
    "AS BIGINT) cents FROM orders"
).df()
V = int(v.cents.sum())
N = len(v)
hv = v.ok.map(
    lambda k: int(hashlib.sha256(f"{k}pps15".encode()).hexdigest()[:8], 16)
).to_numpy(dtype=object)
inc = np.array(
    [int(h) * V < 150 * int(c) * 4294967296 for h, c in zip(hv, v.cents)]
)
s = v[inc]
ht = float((V / (150.0 * s.cents.astype(float))).sum())
o = con.execute(CATALOG["orders_pps_poisson_estimate"].oracle).df().iloc[0]
check("pps ns", float(o.n_sampled), int(inc.sum()), 0)
check("pps ht", o.ht_count_estimate, ht, 1e-4)
check("pps truth", float(o.true_n_orders), N, 0)
print(f"context: HT count estimate {ht:.1f} vs true {N} (rel {o.ht_rel_err:+.4f})")

# --- Rosner ESD ---
dd = con.execute(
    "SELECT date_trunc('day', ts) dy, COUNT(*) y FROM events GROUP BY 1 ORDER BY 1"
).df()
vals = list(zip(dd.dy, dd.y.astype(int)))
o = con.execute(CATALOG["evt_rosner_esd_outliers"].oracle).df()
for it in (1, 2, 3):
    ys = np.array([t[1] for t in vals], dtype=float)
    mean, sd_ = ys.mean(), ys.std(ddof=1)
    # argmax of |n*y - S| with day tie-break
    n_ = len(ys)
    S = ys.sum()
    key = [(-abs(n_ * t[1] - S), t[0]) for t in vals]
    idx = key.index(min(key))
    dy_, y_ = vals[idx]
    r = abs(y_ - mean) / sd_
    row = o[o.iteration == it].iloc[0]
    check(f"esd r[{it}]", row.esd_r, r, 1e-5)
    assert row.day == dy_.strftime("%Y-%m-%d"), (row.day, dy_)
    vals.pop(idx)
print("esd days OK:", list(o.day))

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
