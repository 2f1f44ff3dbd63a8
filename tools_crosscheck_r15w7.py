#!/usr/bin/env python
"""In-wave cross-check for r15 wave 7: independent numpy cluster
validity (raw float64 centroids, textbook DB/CH/Dunn formulas) and a
hashlib-replicated Hopkins statistic vs the DuckDB oracles.

    python tools_crosscheck_r15w7.py [sf_dir]
"""
import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")

ok = True


def check(name, got, want, tol=1e-4):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:22s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


df = pd.read_parquet(f"{SF}/embeddings.parquet")
X = np.stack(df.embedding.to_numpy()).astype(np.float64)
lab = df.label.to_numpy()
ids = df.vec_id.to_numpy()
labs = np.unique(lab)
cent = {l: X[lab == l].mean(0) for l in labs}

# DB
s = {l: np.linalg.norm(X[lab == l] - cent[l], axis=1).mean() for l in labs}
R = np.zeros((len(labs), len(labs)))
for i, li in enumerate(labs):
    for j, lj in enumerate(labs):
        if i != j:
            R[i, j] = (s[li] + s[lj]) / np.linalg.norm(cent[li] - cent[lj])
db = float(np.mean([R[i].max() for i in range(len(labs))]))
o = con.execute(CATALOG["emb_davies_bouldin_labels"].oracle).df()
check("db_index", o.db_index[0], db, 1e-3)

# CH
gbar = X.mean(0)
W = sum(((X[lab == l] - cent[l]) ** 2).sum() for l in labs)
B = sum((lab == l).sum() * ((cent[l] - gbar) ** 2).sum() for l in labs)
n, k = len(X), len(labs)
o = con.execute(CATALOG["emb_calinski_harabasz_labels"].oracle).df()
check("w_ss", o.w_ss[0], W, 1e-4)
check("b_ss", o.b_ss[0], B, 1e-3)
check("ch", o.ch_index[0], (B / (k - 1)) / (W / (n - k)), 1e-3)

# Dunn (centroid form)
mind = min(
    np.linalg.norm(cent[a] - cent[b]) for i, a in enumerate(labs) for b in labs[i + 1 :]
)
diam = 2 * max(
    np.linalg.norm(X[lab == l] - cent[l], axis=1).max() for l in labs
)
o = con.execute(CATALOG["emb_dunn_centroid_index"].oracle).df()
check("dunn", o.dunn_centroid[0], mind / diam, 1e-4)


def u01(sstr):
    return int(hashlib.sha256(sstr.encode()).hexdigest()[:8], 16) / 4294967296.0


# Hopkins
order = sorted(range(len(ids)), key=lambda i: (
    int(hashlib.sha256((str(ids[i]) + "hopkins-s").encode()).hexdigest()[:8], 16),
    ids[i],
))
probe_idx = order[:25]
w_sum = 0.0
for i in probe_idx:
    d = np.linalg.norm(X - X[i], axis=1)
    d[i] = np.inf
    # exclude exact duplicates of the same row only by id, not value
    w_sum += d.min()
mn, mx = X.min(0), X.max(0)
u_sum = 0.0
for i in range(1, 26):
    r = np.array([mn[p - 1] + (mx[p - 1] - mn[p - 1]) * u01(f"{i}_{p}hopu")
                  for p in range(1, X.shape[1] + 1)])
    u_sum += np.linalg.norm(X - r, axis=1).min()
o = con.execute(CATALOG["emb_hopkins_clusterability"].oracle).df()
check("sum_w", o.sum_w[0], w_sum, 1e-4)
check("sum_u", o.sum_u[0], u_sum, 1e-4)
check("hopkins", o.hopkins[0], u_sum / (u_sum + w_sum), 1e-5)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
