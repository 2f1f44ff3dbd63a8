#!/usr/bin/env python
"""In-wave cross-check for r14 wave 9: independent Python (full-float
richness formulas, dict-based MSTTR, cohort triangle, bullwhip and
Fisher from Decimal sums) vs the DuckDB oracles."""
import sys
from collections import Counter, defaultdict
from decimal import Decimal
from math import log, sqrt

import duckdb

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("documents", "orders", "lineitem"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


ok = True


def check(name, got, want, tol=1e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:26s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# richness
docs = con.execute("SELECT lang, lower(trim(text)) FROM documents").fetchall()
by_lang = defaultdict(list)
for lang, txt in docs:
    by_lang[lang].extend(w for w in txt.split() if w)
row = oracle("doc_lexical_richness_by_lang").set_index("lang")
for lang, toks in sorted(by_lang.items()):
    n, v = len(toks), len(set(toks))
    check(f"guiraud[{lang}]", row.loc[lang].guiraud_r, v / sqrt(n))
    check(f"herdan[{lang}]", row.loc[lang].herdan_c, log(v) / log(n))
    check(f"dugast[{lang}]", row.loc[lang].dugast_u, log(n) ** 2 / (log(n) - log(v)), 1e-4)
    check(f"summer[{lang}]", row.loc[lang].summer_s, log(log(v)) / log(log(n)), 1e-4)

# msttr
segs = []
for lang, txt in docs:
    toks = [w for w in txt.split() if w]
    for i in range(0, len(toks) - 24, 25):
        segs.append(len(set(toks[i : i + 25])))
row = oracle("doc_msttr_segmental_ttr")
check("msttr n_seg", float(row.n_segments[0]), float(len(segs)), 0)
check("msttr", row.msttr[0], sum(segs) / (25 * len(segs)))

# cohort triangle
od = con.execute("""
  SELECT o_custkey, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT),
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
  FROM orders""").fetchall()
first = {}
for c, y, tp in od:
    first[c] = min(first.get(c, y), y)
tri = defaultdict(lambda: [Decimal(0), set()])
for c, y, tp in od:
    key = (first[c], y - first[c])
    tri[key][0] += Decimal(tp)
    tri[key][1].add(c)
row = oracle("cust_order_cohort_triangle")
dfi = row.set_index(["cohort", "age"])
probe = sorted(tri)[len(tri) // 2]
check(
    f"cohort{probe} rev",
    dfi.loc[probe].revenue,
    float(tri[probe][0]),
    1e-9,
)
check(f"cohort{probe} buyers", float(dfi.loc[probe].buyers), float(len(tri[probe][1])), 0)
base = tri[(probe[0], 0)][0]
check(f"cohort{probe} vs0", dfi.loc[probe].vs_age0, float(tri[probe][0] / base), 1e-5)

# bullwhip
om = defaultdict(Decimal)
for c, y, tp in od:
    pass
om2 = con.execute("""
  SELECT strftime(o_orderdate, '%Y-%m'), CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
  FROM orders GROUP BY 1""").fetchall()
sm2 = con.execute("""
  SELECT strftime(l_shipdate, '%Y-%m'), CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
  FROM lineitem GROUP BY 1""").fetchall()


def var(vals):
    n = len(vals)
    mu = sum(vals) / n
    return sum((x - mu) ** 2 for x in vals) / (n - 1)


vo = var([float(Decimal(v)) for _, v in om2])
vs_ = var([float(Decimal(v)) for _, v in sm2])
row = oracle("lineitem_bullwhip_variance_ratio")
check("bullwhip ratio", row.bullwhip_ratio[0], vo / vs_, 1e-5)
check("bullwhip var_o", row.var_order_demand[0], vo, 1e-6)

# fisher
li = con.execute("""
  SELECT l_partkey, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT),
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
         CAST(l_quantity AS BIGINT)
  FROM lineitem""").fetchall()
y0 = min(r[1] for r in li)
y1 = max(r[1] for r in li)
agg = defaultdict(lambda: [Decimal(0), 0])
for pk, y, ep, q in li:
    if y in (y0, y1):
        agg[(pk, y)][0] += Decimal(ep)
        agg[(pk, y)][1] += q
p0q0 = p1q1 = p1q0 = p0q1 = 0.0
parts = 0
for pk in {k for k, y in agg if y == y0} & {k for k, y in agg if y == y1}:
    c0, q0 = float(agg[(pk, y0)][0]), agg[(pk, y0)][1]
    c1, q1 = float(agg[(pk, y1)][0]), agg[(pk, y1)][1]
    parts += 1
    p0q0 += c0
    p1q1 += c1
    p1q0 += c1 / q1 * q0
    p0q1 += c0 / q0 * q1
lp, pp = p1q0 / p0q0, p1q1 / p0q1
row = oracle("lineitem_fisher_index_decomposition")
check("fisher parts", float(row.matched_parts[0]), float(parts), 0)
check("laspeyres", row.laspeyres_price[0], lp, 1e-5)
check("paasche", row.paasche_price[0], pp, 1e-5)
check("fisher", row.fisher_price[0], sqrt(lp * pp), 1e-5)
check(
    "identity",
    row.fisher_price[0] * row.fisher_volume[0],
    row.value_ratio[0],
    1e-4,
)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
