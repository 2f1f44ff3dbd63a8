#!/usr/bin/env python
"""In-wave cross-check for r14 wave 3 (ranker eval metrics): the rank
lists and gains come from the already-proven BM25/QL chains (via
DuckDB); the METRICS are recomputed here independently at full float
precision and compared to the catalog oracles."""
import sys
from math import log2

import duckdb

from real_estate_data_pipeline_spark.queries import CATALOG
from real_estate_data_pipeline_spark.queries.q26_r8_mixed import (
    _BM25_SQL_CHAIN,
    _BM25_TERMS,
    _QL_SQL_CHAIN,
    _TOK_SQL_CTES,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


ra = con.execute(f"""
  WITH {_TOK_SQL_CTES},
  gm AS (SELECT doc_id, COUNT(*) AS g FROM qtf GROUP BY doc_id)
  SELECT h.doc_id, gm.g FROM (SELECT doc_id, tf FROM qtf
                              WHERE tok = {_BM25_TERMS[0]!r}) h
  JOIN gm USING (doc_id)
  ORDER BY h.tf DESC, h.doc_id LIMIT 20
""").df()
rbo_a = con.execute(f"""
  WITH {_TOK_SQL_CTES}, {_BM25_SQL_CHAIN}
  SELECT doc_id FROM bscore ORDER BY b6 DESC, doc_id LIMIT 20
""").df()
rb = con.execute(f"""
  WITH {_TOK_SQL_CTES}, {_BM25_SQL_CHAIN}, {_QL_SQL_CHAIN}
  SELECT doc_id FROM qscore ORDER BY q6 DESC, doc_id LIMIT 20
""").df()
allg = con.execute(f"""
  WITH {_TOK_SQL_CTES}
  SELECT COUNT(*) AS g FROM qtf GROUP BY doc_id
""").df().g.tolist()
rel = set(
    con.execute(f"""
  WITH {_TOK_SQL_CTES}
  SELECT doc_id FROM qtf GROUP BY doc_id HAVING COUNT(*) = {len(_BM25_TERMS)}
""").df().doc_id
)

gains = ra.g.tolist()
docs_a = ra.doc_id.tolist()      # weak-ranker list (ndcg/err/map/rprec)
docs_rbo_a = rbo_a.doc_id.tolist()  # BM25 list (rbo)
docs_b = rb.doc_id.tolist()

ok = True


def check(name, got, want, tol=1e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:22s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# nDCG
def dcg(gs, k):
    return sum((2**g - 1) / log2(r + 2) for r, g in enumerate(gs[:k]))


ideal = sorted(allg, reverse=True)
row = oracle("doc_ranker_ndcg_at_k")
check("ndcg@10", row.ndcg_at_10[0], dcg(gains, 10) / dcg(ideal, 10))
check("ndcg@20", row.ndcg_at_20[0], dcg(gains, 20) / dcg(ideal, 20))

# ERR (power-of-two gains)
err, cont = 0.0, 1.0
for r, g in enumerate(gains, 1):
    R = 1 - 2.0**-g
    err += cont * R / r
    cont *= 1 - R
row = oracle("doc_ranker_err_pow2")
check("err@20", row.err_at_20[0], err)

# RBO
p = 0.9
pref = 0.0
for d in range(1, 21):
    xd = len(set(docs_rbo_a[:d]) & set(docs_b[:d]))
    pref += (xd / d) * p**d
pref *= (1 - p) / p
x20 = len(set(docs_rbo_a) & set(docs_b))
ext = pref + (x20 / 20) * p**20
row = oracle("doc_ranker_rbo_bm25_ql")
check("rbo_prefix", row.rbo_prefix[0], pref)
check("rbo_ext", row.rbo_ext[0], ext)
check("overlap20", float(row.overlap_at_20[0]), float(x20), 0)

# MAP@20
hits, ap = 0, 0.0
for r, d in enumerate(docs_a, 1):
    if d in rel:
        hits += 1
        ap += hits / r
ap /= min(len(rel), 20)
row = oracle("doc_ranker_map_at_20")
check("map@20", row.map_at_20[0], ap)

# P@k / R-prec
rr = min(len(rel), 20)
flags = [1 if d in rel else 0 for d in docs_a]
row = oracle("doc_ranker_rprec_sweep")
check("p@5", row.p_at_5[0], sum(flags[:5]) / 5)
check("p@20", row.p_at_20[0], sum(flags) / 20)
check("r_prec", row.r_precision[0], sum(flags[:rr]) / rr)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
