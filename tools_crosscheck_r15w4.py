#!/usr/bin/env python
"""In-wave cross-check for r15 wave 4: independent formula
implementations (full expected-matrix chi-square rather than the
O^2/(rc) identity; np.linalg.solve for Stuart-Maxwell rather than the
hand 2x2 inverse; float-loop Woolf) vs the DuckDB oracles. The NB
verdict frame is pulled via the shared CTEs (the classifier itself is
oracle-verified elsewhere); the STATISTICS are recomputed from raw
cells independently.

    python tools_crosscheck_r15w4.py [sf_dir]
"""
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG
from real_estate_data_pipeline_spark.queries.q15_curation_r3 import _NB_CTES
from real_estate_data_pipeline_spark.queries.q31_r9_wave2_rank_embed import (
    _KAPPA_J_CTES,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("orders", "part", "documents"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")

ok = True


def check(name, got, want, tol=1e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# raw 2x2 from pandas (median convention: 2*value > lo+hi of middle pair)
od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice", "o_orderdate"])
cents = (od.o_totalprice.round(2) * 100).round().astype("int64")
sc = np.sort(cents.to_numpy())
n = len(sc)
m2 = int(sc[(n - 1) // 2] + sc[n // 2])
urgent = (od.o_orderpriority == "1-URGENT").to_numpy()
hi = 2 * cents.to_numpy() > m2
a = int((urgent & hi).sum()); b = int((urgent & ~hi).sum())
c = int((~urgent & hi).sum()); d = int((~urgent & ~hi).sum())
o = con.execute(CATALOG["ml_yule_q_y_2x2"].oracle).df()
check("yule a", float(o.a[0]), a, 0)
check("yule_q", o.yule_q[0], (a * d - b * c) / (a * d + b * c))
check("yule_y", o.yule_y[0],
      (math.sqrt(a * d) - math.sqrt(b * c)) / (math.sqrt(a * d) + math.sqrt(b * c)))

# contingency coefficient via FULL expected matrix
pt = pd.read_parquet(f"{SF}/part.parquet", columns=["p_brand", "p_size"])
tab = pd.crosstab(pt.p_brand, pt.p_size).to_numpy().astype(float)
N = tab.sum()
E = tab.sum(1)[:, None] * tab.sum(0)[None, :] / N
chi2 = float(((tab - E) ** 2 / E).sum())
q = min(tab.shape)
o = con.execute(CATALOG["ml_contingency_coef_brand_size"].oracle).df()
check("cont chi2", o.chi2[0], chi2, 1e-4)
check("cont C", o.pearson_c[0], math.sqrt(chi2 / (chi2 + N)), 1e-5)
check("cont sakoda", o.sakoda_c[0],
      math.sqrt(chi2 / (chi2 + N)) / math.sqrt((q - 1) / q), 1e-5)

# stuart-maxwell via np.linalg.solve on the verdict frame
jf = con.execute(
    f"WITH {_NB_CTES}, {_KAPPA_J_CTES} SELECT nb_pred, heur_pred FROM j"
).df()
marg = pd.concat([jf.nb_pred, jf.heur_pred]).value_counts()
top3 = sorted(marg.sort_values(ascending=False).index[:3])  # count desc, name tie
# replicate the count-desc-name tiebreak exactly
mm = marg.reset_index(); mm.columns = ["l", "c"]
mm = mm.sort_values(["c", "l"], ascending=[False, True])
top3 = sorted(mm.l.iloc[:3].tolist())
sub = jf[jf.nb_pred.isin(top3) & jf.heur_pred.isin(top3)]
M = pd.crosstab(sub.nb_pred, sub.heur_pred).reindex(index=top3, columns=top3, fill_value=0).to_numpy().astype(float)
r, cc_ = M.sum(1), M.sum(0)
dv = (r - cc_)[:2]
S = np.zeros((2, 2))
for i in range(2):
    S[i, i] = r[i] + cc_[i] - 2 * M[i, i]
S[0, 1] = S[1, 0] = -(M[0, 1] + M[1, 0])
sm = float(dv @ np.linalg.solve(S, dv))
o = con.execute(CATALOG["ml_stuart_maxwell_marginal"].oracle).df()
check("sm n_pairs", float(o.n_pairs[0]), len(sub), 0)
check("stuart_maxwell", o.stuart_maxwell_chi2[0], sm, 1e-5)

# woolf via float loop
yrs = od.o_orderdate.astype("datetime64[ns]").dt.year if od.o_orderdate.dtype != object else pd.to_datetime(od.o_orderdate).dt.year
ws, ls = [], []
for yr in sorted(yrs.unique()):
    m = yrs.to_numpy() == yr
    aa = int((urgent & hi & m).sum()); bb = int((urgent & ~hi & m).sum())
    cc2 = int((~urgent & hi & m).sum()); dd = int((~urgent & ~hi & m).sum())
    if min(aa, bb, cc2, dd) > 0:
        ws.append(1 / (1 / aa + 1 / bb + 1 / cc2 + 1 / dd))
        ls.append(math.log(aa * dd / (bb * cc2)))
ws, ls = np.array(ws), np.array(ls)
pooled = float((ws * ls).sum() / ws.sum())
woolf = float((ws * (ls - pooled) ** 2).sum())
o = con.execute(CATALOG["ml_woolf_or_homogeneity"].oracle).df()
check("woolf k", float(o.k_strata[0]), len(ws), 0)
check("woolf pooled", o.pooled_ln_or[0], pooled, 1e-5)
check("woolf chi2", o.woolf_chi2[0], woolf, 1e-4)

# symmetric lambda via pandas pivot
tab2 = pd.crosstab(pt.p_brand, pt.p_size).to_numpy()
lam = (
    tab2.max(1).sum() + tab2.max(0).sum() - tab2.sum(0).max() - tab2.sum(1).max()
) / (2 * tab2.sum() - tab2.sum(0).max() - tab2.sum(1).max())
o = con.execute(CATALOG["ml_lambda_symmetric_brand_size"].oracle).df()
check("lambda_sym", o.lambda_symmetric[0], float(lam), 1e-9)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
