#!/usr/bin/env python
"""In-wave cross-check for r15 wave 6: independent numpy ROC/
calibration machinery (raw-array cumulative ROC with trapezoid pAUC
and linear interpolation at FPR=0.2; per-item Brier sums rather than
band-closed forms) vs the DuckDB oracles.

    python tools_crosscheck_r15w6.py [sf_dir]
"""
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")

ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:30s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
cents = (od.o_totalprice.round(2) * 100).round().astype("int64")
band = (cents // 100000).to_numpy()
y = (od.o_orderpriority == "1-URGENT").to_numpy().astype(int)

# ROC over descending bands
bs = np.unique(band)[::-1]
n1 = np.array([(y[band == b]).sum() for b in bs])
n0 = np.array([((1 - y)[band == b]).sum() for b in bs])
tp = np.cumsum(n1); fp = np.cumsum(n0)
t1, t0 = int(tp[-1]), int(fp[-1])
fpr = np.concatenate([[0], fp]) / t0
tpr = np.concatenate([[0], tp]) / t1
# pAUC via EXACT rational trapezoids clipped at fpr = 1/5 (np.interp
# mis-evaluates at vertical ROC jumps near the cap — caught in-wave)
from fractions import Fraction

cap_f = Fraction(1, 5)
area = Fraction(0)
prev_fp = prev_tp = 0
for i in range(len(bs)):
    lo, hi = Fraction(prev_fp, t0), Fraction(int(fp[i]), t0)
    tplo, tphi = Fraction(prev_tp, t1), Fraction(int(tp[i]), t1)
    if hi <= cap_f:
        area += (hi - lo) * (tplo + tphi) / 2
    elif lo < cap_f:
        w = cap_f - lo
        tpcut = tplo + (tphi - tplo) * w / (hi - lo)
        area += w * (tplo + tpcut) / 2
    prev_fp, prev_tp = int(fp[i]), int(tp[i])
pauc = float(area)
o = con.execute(CATALOG["ml_partial_auc_price_urgent"].oracle).df()
check("pauc", o.pauc_fpr20[0], pauc, 1e-5)
check("pauc_norm", o.pauc_normalized[0], pauc / 0.2, 1e-5)

# KS
ks = float(np.max(np.abs(tp / t1 - fp / t0)))
o = con.execute(CATALOG["ml_ks_separation_price_urgent"].oracle).df()
check("ks", o.ks_stat[0], ks, 1e-9)
i = int(np.argmax(np.abs(tp * t0 - fp * t1)))
check("ks band", float(o.band_at_max[0]), float(bs[i]), 0)

# F-beta sweep
N = t1 + t0
o = con.execute(CATALOG["ml_fbeta_threshold_sweep"].oracle).df()
sorted_bands = np.sort(band)
for _, row in o.iterrows():
    k = int(row.decile)
    # min band with ecdf >= k/10
    tk = int(sorted_bands[math.ceil(k * N / 10) - 1])
    check(f"tk k={k}", float(row.threshold_band), tk, 0)
    pred = band > tk
    tp_ = int((pred & (y == 1)).sum()); fp_ = int((pred & (y == 0)).sum())
    fn_ = t1 - tp_; tn_ = t0 - fp_
    check(f"f1 k={k}", row.f1, 2 * tp_ / (2 * tp_ + fn_ + fp_) if tp_ else 0.0, 1e-9)
    check(f"f05 k={k}", row.f_half, 1.25 * tp_ / (1.25 * tp_ + 0.25 * fn_ + fp_) if tp_ else 0.0, 1e-9)
    check(f"f2 k={k}", row.f2, 5 * tp_ / (5 * tp_ + 4 * fn_ + fp_) if tp_ else 0.0, 1e-9)
    check(f"ba k={k}", row.balanced_acc, (tp_ / t1 + tn_ / t0) / 2, 1e-9)

# calibration: per-item Brier + Spiegelhalter from raw arrays
is_tr = (od.o_orderkey % 2 == 0).to_numpy()
tr_c, te_c = cents[is_tr].to_numpy(), cents[~is_tr].to_numpy()
edges = np.quantile(tr_c, np.arange(1, 10) / 10, method="linear")
def bandof(c):
    return 1 + (c[:, None] > edges[None, :]).sum(1)
btr, bte = bandof(tr_c), bandof(te_c)
ytr, yte = y[is_tr], y[~is_tr]
p_by_band = {b: ytr[btr == b].mean() for b in np.unique(btr)}
mask = np.isin(bte, list(p_by_band))
p_te = np.array([p_by_band[b] for b in bte[mask]])
yy = yte[mask]
num = float(((yy - p_te) * (1 - 2 * p_te)).sum())
den = float((p_te * (1 - p_te) * (1 - 2 * p_te) ** 2).sum())
o = con.execute(CATALOG["ml_spiegelhalter_z_calibration"].oracle).df()
check("spieg z", o.spiegelhalter_z[0], num / math.sqrt(den), 1e-4)
bs_model = float(((yy - p_te) ** 2).mean())
pbar = float(ytr.mean())
bs_clim = float(((yy - pbar) ** 2).mean())
o = con.execute(CATALOG["ml_brier_skill_score"].oracle).df()
check("bs_model", o.bs_model[0], bs_model, 1e-4)
check("bs_clim", o.bs_clim[0], bs_clim, 1e-4)
check("bss", o.brier_skill[0], 1 - bs_model / bs_clim, 1e-3)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
