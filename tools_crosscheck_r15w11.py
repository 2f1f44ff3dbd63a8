#!/usr/bin/env python
"""In-wave cross-check for r15 wave 11: independent dict/float graph
machinery (adjacency-list Katz/eigen iterations WITHOUT the 6dp
snapping, textbook BFS distances for harmonic/path stats) vs the
DuckDB oracles. The pair set is pulled via the shared portable-
MinHash oracle (itself hash-exact-verified elsewhere); the GRAPH
STATISTICS are recomputed independently.

    python tools_crosscheck_r15w11.py [sf_dir]
"""
import math
import sys
from collections import defaultdict, deque

import duckdb

from real_estate_data_pipeline_spark.queries import CATALOG
from real_estate_data_pipeline_spark.queries.q15_curation_r3 import (
    _minhash_portable_oracle,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

ok = True


def check(name, got, want, tol=1e-4):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:26s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


pairs = con.execute(_minhash_portable_oracle()).fetchall()
adj = defaultdict(set)
for a, b, *_ in pairs:
    adj[a].add(b)
    adj[b].add(a)
nodes = sorted(adj)

# Katz (float, 3 rounds)
k = {u: 1.0 for u in nodes}
for _ in range(3):
    k = {u: 1.0 + 0.1 * sum(k[v] for v in adj[u]) for u in nodes}
o = con.execute(CATALOG["graph_katz_centrality_rounds"].oracle).df()
top = sorted(nodes, key=lambda u: (-k[u], u))[:20]
for i in range(5):
    check(f"katz #{i}", o.katz[i], k[top[i]], 1e-4)
assert list(o.doc_id[:5]) == top[:5], (list(o.doc_id[:5]), top[:5])

# Eigen (float power, 3 rounds, max-norm)
x = {u: 1.0 for u in nodes}
for _ in range(3):
    s = {u: sum(x[v] for v in adj[u]) for u in nodes}
    mx = max(s.values())
    x = {u: s[u] / mx for u in nodes}
o = con.execute(CATALOG["graph_eigenvector_power_rounds"].oracle).df()
tope = sorted(nodes, key=lambda u: (-x[u], u))[:20]
for i in range(5):
    check(f"eig #{i}", o.eigen_score[i], x[tope[i]], 1e-4)

# BFS distances <= 3, rooted at the top-20 degree hubs (deg desc, id)
seeds = sorted(nodes, key=lambda u: (-len(adj[u]), u))[:20]
h = {}
cls = [0, 0, 0]
for u in seeds:
    dist = {u: 0}
    dq = deque([u])
    hsum = 0.0
    while dq:
        v = dq.popleft()
        if dist[v] >= 3:
            continue
        for w_ in adj[v]:
            if w_ not in dist:
                dist[w_] = dist[v] + 1
                dq.append(w_)
    for v, dv in dist.items():
        if v != u and dv <= 3:
            hsum += 1.0 / dv
            cls[dv - 1] += 1
    h[u] = hsum
o = con.execute(CATALOG["graph_harmonic_centrality_bounded"].oracle).df()
toph = sorted(seeds, key=lambda u: (-h[u], u))[:20]
for i in range(5):
    check(f"harm #{i}", o.harmonic[i], h[toph[i]], 1e-5)
assert list(o.doc_id[:5]) == toph[:5]

o = con.execute(CATALOG["graph_bounded_path_stats"].oracle).df()
c1, c2, c3 = cls
check("paths c1", float(o.pairs_d1[0]), c1, 0)
check("paths c2", float(o.pairs_d2[0]), c2, 0)
check("paths c3", float(o.pairs_d3[0]), c3, 0)
check("paths mean", o.mean_bounded_dist[0], (c1 + 2 * c2 + 3 * c3) / (c1 + c2 + c3))
n = len(nodes)
check("paths reach", o.reachable_share_3hop[0],
      (c1 + c2 + c3) / (len(seeds) * (n - 1)))

degs = [len(adj[u]) for u in nodes]
mean = sum(degs) / n
sk2 = sum(d * d for d in degs)
o = con.execute(CATALOG["graph_degree_heterogeneity"].oracle).df()
check("het", o.heterogeneity[0], n * sk2 / (sum(degs) ** 2))
var = (sk2 - sum(degs) ** 2 / n) / (n - 1)
check("deg cv", o.degree_cv[0], math.sqrt(var) / mean)
check("max/mean", o.max_over_mean[0], max(degs) / mean)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
