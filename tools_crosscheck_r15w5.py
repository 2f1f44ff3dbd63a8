#!/usr/bin/env python
"""In-wave cross-check for r15 wave 5: independent Counter-based
ecology estimators (textbook ACE / Miller-Madow / Hill / Morisita-Horn
/ Bray-Curtis straight from tokenized text) vs the DuckDB oracles.

    python tools_crosscheck_r15w5.py [sf_dir]
"""
import math
import sys
from collections import Counter

import duckdb
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

ok = True


def check(name, got, want, tol=1e-5):
    global ok
    if got is None and want is None:
        print(f"{name:28s} both NULL OK")
        return
    if got is None or want is None or (isinstance(got, float) and math.isnan(got)) != (
        isinstance(want, float) and math.isnan(want)
    ):
        print(f"{name:28s} got={got} want={want} FAIL")
        globals()["ok"] = False
        return
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    globals()["ok"] = ok and good


docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "text"])
counts: dict[str, Counter] = {}
for src, g in docs.groupby("source"):
    cnt = Counter()
    for txt in g.text:
        cnt.update(tok for tok in txt.lower().strip().split() if tok)
    counts[src] = cnt

# ACE
o = con.execute(CATALOG["doc_vocab_ace_richness"].oracle).df().set_index("source")
for src, cnt in sorted(counts.items()):
    cs = list(cnt.values())
    s_ab = sum(1 for c in cs if c > 10)
    s_r = sum(1 for c in cs if c <= 10)
    n_r = sum(c for c in cs if c <= 10)
    f1 = sum(1 for c in cs if c == 1)
    sk2 = sum(c * (c - 1) for c in cs if c <= 10)
    want = None
    if n_r > 0 and n_r != f1 and n_r > 1:
        cace = 1 - f1 / n_r
        g2 = max(s_r / cace * sk2 / (n_r * (n_r - 1)) - 1, 0)
        want = s_ab + s_r / cace + f1 / cace * g2
    got = o.loc[src].ace
    got = None if pd.isna(got) else float(got)
    check(f"ace {src}", got, want, 1e-5)

# Miller-Madow + Hill
omm = con.execute(CATALOG["doc_miller_madow_entropy_sources"].oracle).df().set_index("source")
oh = con.execute(CATALOG["doc_hill_numbers_sources"].oracle).df().set_index("source")
for src, cnt in sorted(counts.items()):
    n = sum(cnt.values())
    v = len(cnt)
    h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
    check(f"mm h {src}", omm.loc[src].h_plugin, h)
    check(f"mm corr {src}", omm.loc[src].h_miller_madow, h + (v - 1) / (2 * n))
    sc2 = sum(c * c for c in cnt.values())
    check(f"hill q1 {src}", oh.loc[src].hill_q1, math.exp(h), 1e-4)
    check(f"hill q2 {src}", oh.loc[src].hill_q2, n * n / sc2, 1e-5)

# Morisita-Horn + Bray-Curtis
omh = con.execute(CATALOG["doc_morisita_horn_sources"].oracle).df()
obc = con.execute(CATALOG["doc_bray_curtis_sources"].oracle).df()
omh = omh.set_index(["src_a", "src_b"])
obc = obc.set_index(["src_a", "src_b"])
srcs = sorted(counts)
checked = 0
for i, sa in enumerate(srcs):
    for sb in srcs[i + 1 :]:
        ca, cb = counts[sa], counts[sb]
        X, Y = sum(ca.values()), sum(cb.values())
        sxy = sum(ca[t] * cb[t] for t in ca.keys() & cb.keys())
        da = sum(c * c for c in ca.values()) / X**2
        db = sum(c * c for c in cb.values()) / Y**2
        mh = 2 * sxy / ((da + db) * X * Y)
        smin = sum(min(ca[t], cb[t]) for t in ca.keys() & cb.keys())
        bc = 1 - 2 * smin / (X + Y)
        if checked < 6:  # spot-check a prefix; full set equality below
            check(f"mh {sa}-{sb}", omh.loc[(sa, sb)].morisita_horn, mh)
            check(f"bc {sa}-{sb}", obc.loc[(sa, sb)].bray_curtis, bc)
        else:
            assert abs(omh.loc[(sa, sb)].morisita_horn - mh) < 1e-5 * max(1, abs(mh))
            assert abs(obc.loc[(sa, sb)].bray_curtis - bc) < 1e-9
        checked += 1
print(f"pairs checked: {checked}")

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
