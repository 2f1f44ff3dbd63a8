#!/usr/bin/env python
"""In-wave numpy cross-check for r14 wave 2 (partition agreement):
independent pair-counting / entropy implementations from the raw
label arrays vs the DuckDB oracles."""
import sys
from math import log, sqrt

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


df = con.execute("SELECT lang, source FROM documents").df()
langs = df.lang.to_numpy()
srcs = df.source.to_numpy()
n = len(df)
from collections import Counter

cells = Counter(zip(langs, srcs))
a = Counter(langs)
b = Counter(srcs)


def c2(x):
    return x * (x - 1) // 2


tp = sum(c2(v) for v in cells.values())
sa = sum(c2(v) for v in a.values())
sb = sum(c2(v) for v in b.values())
M = c2(n)

ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.9f} want={want:.9f} {'OK' if good else 'FAIL'}")
    ok &= good


row = oracle("ml_adjusted_rand_lang_source")
rand = (M - sa - sb + 2 * tp) / M
ari = (tp - sa * sb / M) / ((sa + sb) / 2 - sa * sb / M)
check("rand", row.rand_index[0], rand)
check("ari", row.ari[0], ari)

row = oracle("ml_fowlkes_mallows_lang_source")
check("fowlkes_mallows", row.fowlkes_mallows[0], tp / sqrt(sa * sb))

mi = sum(
    (c / n) * log(c * n / (a[l] * b[s])) for (l, s), c in cells.items()
)
hu = sum((v / n) * log(n / v) for v in a.values())
hv = sum((v / n) * log(n / v) for v in b.values())
row = oracle("ml_nmi_lang_source")
check("mi", row.mi_nats[0], mi, 1e-5)
check("nmi", row.nmi[0], 2 * mi / (hu + hv), 1e-5)

huv = sum((c / n) * log(b[s] / c) for (l, s), c in cells.items())
hvu = sum((c / n) * log(a[l] / c) for (l, s), c in cells.items())
h = 1 - huv / hu
c_ = 1 - hvu / hv
row = oracle("ml_v_measure_lang_source")
check("homogeneity", row.homogeneity[0], h, 1e-5)
check("completeness", row.completeness[0], c_, 1e-5)
check("v_measure", row.v_measure[0], 2 * h * c_ / (h + c_), 1e-5)

sp = sum(max(cells[(l, s)] for l in a if (l, s) in cells) for s in b)
si = sum(max(cells[(l, s)] for s in b if (l, s) in cells) for l in a)
row = oracle("ml_purity_fmeasure_lang_source")
check("purity", row.purity[0], sp / n)
check("inverse_purity", row.inverse_purity[0], si / n)
check("f_purity", row.f_purity[0], 2 * (sp / n) * (si / n) / (sp / n + si / n))

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
