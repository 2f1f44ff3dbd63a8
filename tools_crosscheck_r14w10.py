#!/usr/bin/env python
"""In-wave cross-check for r14 wave 10: independent Python — networkx-
free BFS over the dup pairs, numpy prefix-cosine rankings, and
closed-form estimators from raw float arrays — vs the DuckDB oracles."""
import sys
from collections import defaultdict, deque

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG
from real_estate_data_pipeline_spark.queries.q15_curation_r3 import (
    _minhash_portable_oracle,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("documents", "embeddings", "lineitem"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:26s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# BFS closeness/ecc
pairs = con.execute(_minhash_portable_oracle()).fetchall()
adj = defaultdict(set)
for a, b, *_ in pairs:
    adj[a].add(b)
    adj[b].add(a)
deg = sorted(adj, key=lambda n: (-len(adj[n]), n))
seeds = deg[:5]
row = oracle("graph_closeness_ecc_hubs").set_index("seed")
for s in seeds:
    dist = {s: 0}
    dq = deque([s])
    while dq:
        u = dq.popleft()
        if dist[u] >= 6:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    reached = len(dist) - 1
    dsum = sum(dist.values())
    check(f"bfs[{s}] reached", float(row.loc[s].n_reached), float(reached), 0)
    check(f"bfs[{s}] ecc", float(row.loc[s].eccentricity), float(max(dist.values())), 0)
    check(f"bfs[{s}] closeness", row.loc[s].closeness, reached / dsum, 1e-6)

# matryoshka
emb = con.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
ids = np.array([r[0] for r in emb])
M = np.array([r[1] for r in emb], dtype=np.float64)
qv = M[ids.tolist().index(0)]


def top10(d):
    num = M[:, :d] @ qv[:d]
    den = np.sqrt((M[:, :d] ** 2).sum(1)) * np.sqrt((qv[:d] ** 2).sum())
    c = num / den
    order = sorted(range(len(ids)), key=lambda i: (-c[i], ids[i]))
    return set(ids[order[:10]])


full = top10(64)
row = oracle("emb_matryoshka_recall_sweep").set_index("dim")
for d in (8, 16, 32):
    check(f"matry[{d}]", float(row.loc[d].overlap10), float(len(top10(d) & full)), 0)

# IV / Oaxaca / Deming
li = con.execute("""
  SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
         CAST(l_quantity AS BIGINT),
         CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT),
         l_returnflag
  FROM lineitem""").fetchall()
x = np.array([r[0] for r in li], dtype=np.float64)
y = np.array([r[1] for r in li], dtype=np.float64)
z = np.array([r[2] for r in li], dtype=np.float64)


def cov(a, b):
    return ((a - a.mean()) * (b - b.mean())).sum()


row = oracle("ml_iv_2sls_discount_qty")
check("iv beta", row.beta_iv[0], cov(z, y) / cov(z, x), 1e-5)
check("iv ols", row.beta_ols[0], cov(x, y) / cov(x, x), 1e-6)
r2 = cov(z, x) ** 2 / (cov(z, z) * cov(x, x))
check("iv F", row.first_stage_f[0], (len(x) - 2) * r2 / (1 - r2), 1e-4)

flags = np.array([r[3] for r in li])
row = oracle("ml_oaxaca_blinder_rn")
res = {}
for g in ("R", "N"):
    m = flags == g
    res[g] = (x[m].mean(), y[m].mean(), cov(x[m], y[m]) / cov(x[m], x[m]))
gap = res["R"][1] - res["N"][1]
expl = res["N"][2] * (res["R"][0] - res["N"][0])
check("oaxaca gap", row.total_gap[0], gap, 1e-5)
check("oaxaca expl", row.explained[0], expl, 1e-4)
check("oaxaca unexpl", row.unexplained[0], gap - expl, 1e-5)

row = oracle("ml_deming_regression_dq")
sxx, syy, sxy = cov(x, x), cov(y, y), cov(x, y)
beta = ((syy - sxx) + np.sqrt((syy - sxx) ** 2 + 4 * sxy**2)) / (2 * sxy)
check("deming beta", row.beta_deming[0], beta, 1e-6)
check("deming alpha", row.alpha_deming[0], y.mean() - beta * x.mean(), 1e-5)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
