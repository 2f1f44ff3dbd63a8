#!/usr/bin/env python
"""In-wave cross-check for r14 wave 7 (association measures):
independent Python implementations from raw rows vs the DuckDB
oracles (rule measures by set algebra, entropies at full float
precision, MCC/F1 from a dict confusion matrix, Breslow-Day with its
own quadratic solver)."""
import sys
from collections import Counter, defaultdict
from math import log, sqrt

import duckdb

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("lineitem", "part", "orders", "documents"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


ok = True


def check(name, got, want, tol=1e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# --- rule measures ----------------------------------------------------
bask = defaultdict(set)
for okey, item in con.execute(
    "SELECT l_orderkey, p_type FROM lineitem JOIN part ON p_partkey = l_partkey"
).fetchall():
    bask[okey].add(item)
n = len(bask)
isup = Counter()
co = Counter()
for its in bask.values():
    for i in its:
        isup[i] += 1
    s = sorted(its)
    for x in range(len(s)):
        for y in range(x + 1, len(s)):
            co[(s[x], s[y])] += 1
row = oracle("basket_ptype_rule_measures")
a, b = row.a[0], row.b[0]
c_ = co[(a, b)]
na, nb_ = isup[a], isup[b]
check("rule lift", row.lift[0], c_ * n / (na * nb_))
check("rule jaccard", row.jaccard[0], c_ / (na + nb_ - c_))
check("rule conviction", row.conviction_a_to_b[0], (1 - nb_ / n) / (1 - c_ / na))
check("rule leverage", row.leverage[0], c_ / n - na * nb_ / n**2, 1e-4)

# --- theil U / GK tau -------------------------------------------------
cells = Counter(
    con.execute("SELECT p_brand, p_type FROM part").fetchall()
)
mx = Counter()
my = Counter()
for (x, y), c in cells.items():
    mx[x] += c
    my[y] += c
N = sum(cells.values())
mi = sum((c / N) * log(c * N / (mx[x] * my[y])) for (x, y), c in cells.items())
hx = sum((v / N) * log(N / v) for v in mx.values())
hy = sum((v / N) * log(N / v) for v in my.values())
row = oracle("ml_theil_u_brand_type")
check("theil u(x|y)", row.u_brand_given_type[0], mi / hx)
check("theil u sym", row.u_symmetric[0], 2 * mi / (hx + hy))

# tau(Y|X): A = sum_xy n_xy^2/(n_x n); B = sum_y (n_y/n)^2
A_yx = sum(c * c / (mx[x] * N) for (x, y), c in cells.items())
B_y = sum((v / N) ** 2 for v in my.values())
A_xy = sum(c * c / (my[y] * N) for (x, y), c in cells.items())
B_x = sum((v / N) ** 2 for v in mx.values())
row = oracle("ml_gk_tau_brand_type")
check("gk tau(y|x)", row.tau_type_given_brand[0], (A_yx - B_y) / (1 - B_y))
check("gk tau(x|y)", row.tau_brand_given_type[0], (A_xy - B_x) / (1 - B_x))

# --- MCC / macro F1 ---------------------------------------------------
cm = Counter(
    con.execute("""
  WITH scored AS (
    SELECT lang,
           len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|a|is)\\b')) AS s_en,
           len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|los|es)\\b')) AS s_es,
           len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ein|ist|nicht)\\b')) AS s_de,
           len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|un|est)\\b')) AS s_fr
    FROM documents)
  SELECT lang, CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
                WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END
  FROM scored
""").fetchall()
)
s_ = sum(cm.values())
agree = sum(c for (tr, pr), c in cm.items() if tr == pr)
tk = Counter()
pk = Counter()
for (tr, pr), c in cm.items():
    tk[tr] += c
    pk[pr] += c
cls = set(tk) | set(pk)
spt = sum(tk[c] * pk[c] for c in cls)
st2 = sum(v * v for v in tk.values())
sp2 = sum(v * v for v in pk.values())
mcc = (agree * s_ - spt) / sqrt((s_ * s_ - sp2) * (s_ * s_ - st2))
f1s = [2 * cm.get((c, c), 0) / (tk[c] + pk[c]) for c in sorted(cls)]
row = oracle("ml_mcc_macro_f1_lang")
check("mcc rk", row.mcc_rk[0], mcc)
check("macro f1", row.macro_f1[0], sum(f1s) / len(f1s))
check("accuracy", row.accuracy[0], agree / s_)

# --- Breslow-Day ------------------------------------------------------
rows = con.execute("""
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT),
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
  FROM orders
""").fetchall()
centsv = sorted(r[2] for r in rows)
import statistics

m2 = int(2 * statistics.median(centsv))
cells4 = defaultdict(lambda: [0, 0, 0, 0])
for yr, u, cc in rows:
    hi = 2 * cc > m2
    idx = 0 if (u and hi) else 1 if u else 2 if hi else 3
    cells4[yr][idx] += 1
ad = sum(v[0] * v[3] / sum(v) for v in cells4.values())
bc = sum(v[1] * v[2] / sum(v) for v in cells4.values())
psi = ad / bc
bd = 0.0
for v in cells4.values():
    a, b, c, d = v
    nn_ = a + b + c + d
    r1, c1 = a + b, a + c
    qa, qb, qc = 1 - psi, (nn_ - r1 - c1) + psi * (r1 + c1), -psi * r1 * c1
    disc = sqrt(qb * qb - 4 * qa * qc)
    if abs(qa) < 1e-12:
        af = -qc / qb
    else:
        af = (-qb + disc) / (2 * qa)
        if not (max(0, r1 + c1 - nn_) <= af <= min(r1, c1)):
            af = (-qb - disc) / (2 * qa)
    var = 1 / (1 / af + 1 / (r1 - af) + 1 / (c1 - af) + 1 / (nn_ - r1 - c1 + af))
    bd += (a - af) ** 2 / var
row = oracle("ml_breslow_day_homogeneity")
check("breslow-day chi2", row.bd_chi2[0], bd, 1e-3)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
