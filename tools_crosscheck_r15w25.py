#!/usr/bin/env python
"""In-wave cross-check for r15 wave 25: independent pandas/numpy
SQL-surface + embedding-geometry machinery (Python str.split token
counts, a rolling 7-day date-window loop, pandas melt for the
unpivot, np.cov participation ratio, O(n^2) sampled pairwise dots for
the anisotropy) vs the DuckDB oracles.

    python tools_crosscheck_r15w25.py [sf_dir]
"""
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("documents", "orders", "embeddings"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


# --- lateral explode token counts ---
docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "text"])
o = con.execute(CATALOG["sql_interface_lateral_explode"].oracle).df()
for src in sorted(docs.source.unique())[:4]:
    toks = []
    for txt in docs[docs.source == src].text:
        toks.extend([w for w in txt.lower().split(" ") if w])
    row = o[o.source == src].iloc[0]
    check(f"lat n[{src[-8:]}]", float(row.n_tokens), len(toks), 0)
    check(f"lat v[{src[-8:]}]", float(row.n_vocab), len(set(toks)), 0)

# --- range interval window ---
d = con.execute(
    "SELECT CAST(o_orderdate AS DATE) dy, "
    "SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) cents "
    "FROM orders GROUP BY 1 ORDER BY 1"
).df()
d["dy"] = pd.to_datetime(d.dy)
o = con.execute(CATALOG["sql_interface_range_interval_window"].oracle).df()
for i in (0, 100, len(d) - 1):
    day = d.dy.iloc[i]
    w = d[(d.dy >= day - pd.Timedelta(days=6)) & (d.dy <= day)]
    row = o[o.day_s == day.strftime("%Y-%m-%d")].iloc[0]
    check(f"range[{i}]", row.trailing_7d_revenue, w.cents.sum() / 100, 1e-9)

# --- unpivot ---
o = con.execute(CATALOG["sql_interface_unpivot"].oracle).df()
oc = con.execute(
    "SELECT EXTRACT(year FROM o_orderdate) yr, o_orderpriority p, COUNT(*) n "
    "FROM orders GROUP BY 1,2"
).df()
name_map = {
    "1-URGENT": "urgent", "2-HIGH": "high", "3-MEDIUM": "medium",
    "4-NOT SPECIFIED": "unspecified", "5-LOW": "low",
}
for _, r in oc.iterrows():
    row = o[(o.yr == r.yr) & (o.priority == name_map[r.p])].iloc[0]
    check(f"unpivot[{int(r.yr)},{name_map[r.p]}]", float(row.n), r.n, 0)

# --- embedding geometry ---
emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["embedding"])
X = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1e6 + 0.5)
n, ndim = X.shape
var = X.var(axis=0, ddof=0)
v12 = np.floor(var + 0.5)
pr = v12.sum() ** 2 / (v12**2).sum()
o = con.execute(CATALOG["emb_participation_ratio_dim"].oracle).df().iloc[0]
check("pr dims", float(o.n_dims), ndim, 0)
check("pr", o.participation_ratio, pr, 1e-5)
check("pr frac", o.pr_fraction, pr / ndim, 1e-5)

S = X.sum(axis=0)
ss2 = float((S**2).sum())
sn2 = float((X**2).sum())
apd = (ss2 - sn2) / (n * (n - 1))
msn = sn2 / n
o = con.execute(CATALOG["emb_anisotropy_dot_stats"].oracle).df().iloc[0]
check("aniso apd", o.avg_pair_dot, apd / 1e12, 1e-6)
check("aniso msn", o.mean_sq_norm, msn / 1e12, 1e-6)
check("aniso ratio", o.anisotropy_ratio, apd / msn, 1e-6)
check("aniso gap", o.centered_identity_gap + 1.0, 1.0, 1e-5)
# brute-force the identity on the centered cloud
Xc = X - X.mean(axis=0)
G = Xc @ Xc.T
apd_c = (G.sum() - np.trace(G)) / (n * (n - 1))
check("aniso identity", apd_c / 1e12 + 1.0, -Xc.var(axis=0).sum() * n / (n * (n - 1)) / 1e12 + 1.0, 1e-6)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
