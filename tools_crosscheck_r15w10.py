#!/usr/bin/env python
"""In-wave cross-check for r15 wave 10: independent Counter/numpy
implementations (regex readability masses, Counter char entropy,
float Theil decomposition with the UM+US+UC=1 identity, numpy FFT
periodogram spectral entropy) vs the DuckDB oracles.

    python tools_crosscheck_r15w10.py [sf_dir]
"""
import math
import re
import sys
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tbl in ("documents", "events"):
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'")

ok = True


def check(name, got, want, tol=1e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:24s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "text"])
agg = {}
for src, g in docs.groupby("source"):
    w = s = lw = sy = 0
    chars = Counter()
    for txt in g.text:
        toks = [x for x in txt.lower().strip().split() if x]
        w += len(toks)
        s += max(len(re.findall(r"[.!?]+", txt)), 1)
        lw += sum(1 for x in toks if len(x) >= 7)
        sy += sum(max(len(re.findall(r"[aeiouy]+", x)), 1) for x in toks)
        chars.update(re.sub(r"\s+", "", txt.lower().strip()))
    agg[src] = (w, s, lw, sy, chars)

o1 = con.execute(CATALOG["doc_lix_rix_by_source"].oracle).df().set_index("source")
o2 = con.execute(CATALOG["doc_flesch_reading_ease_by_source"].oracle).df().set_index("source")
o3 = con.execute(CATALOG["doc_char_entropy_by_source"].oracle).df().set_index("source")
for src, (w, s, lw, sy, chars) in sorted(agg.items()):
    check(f"lix {src}", o1.loc[src].lix, w / s + 100 * lw / w)
    check(f"rix {src}", o1.loc[src].rix, lw / s)
    check(f"fre {src}", o2.loc[src].flesch_reading_ease,
          206.835 - 1.015 * w / s - 84.6 * sy / w)
    n = sum(chars.values())
    h = math.log(n) - sum(c * math.log(c) for c in chars.values()) / n
    check(f"charH {src}", o3.loc[src].char_entropy, h)

# Theil decomposition
dc = con.execute(
    "SELECT date_trunc('day', ts), COUNT(*) FROM events GROUP BY 1 ORDER BY 1"
).fetchall()
c = np.array([r[1] for r in dc], dtype=float)
a, f = c[7:], c[:-7]
mse = ((f - a) ** 2).mean()
sf_, sa_ = f.std(), a.std()
r = float(((f - f.mean()) * (a - a.mean())).mean() / (sf_ * sa_))
um = (f.mean() - a.mean()) ** 2 / mse
us = (sf_ - sa_) ** 2 / mse
uc = 2 * (1 - r) * sf_ * sa_ / mse
o = con.execute(CATALOG["ml_theil_u_decomposition"].oracle).df()
check("theil um", o.um_bias[0], um)
check("theil us", o.us_variance[0], us)
check("theil uc", o.uc_covariance[0], uc)
check("theil sum1", float(o.um_bias[0] + o.us_variance[0] + o.uc_covariance[0]), 1.0, 1e-6)

# spectral entropy via explicit DFT (same day indices as the oracle)
dd = con.execute(
    "SELECT date_diff('day', DATE '1992-01-01', CAST(date_trunc('day', ts) AS DATE)),"
    " COUNT(*) FROM events GROUP BY 1 ORDER BY 1"
).fetchall()
d_idx = np.array([r[0] for r in dd], dtype=float)
x = np.array([r[1] for r in dd], dtype=float)
P = []
for k in range(1, 15):
    ang = 2 * np.pi * ((d_idx * k) % 30) / 30
    P.append(float(x @ np.cos(ang)) ** 2 + float(x @ np.sin(ang)) ** 2)
P = np.array(P)
p = P / P.sum()
H = float(-(p[p > 0] * np.log(p[p > 0])).sum())
o = con.execute(CATALOG["evt_spectral_entropy_daily"].oracle).df()
check("spectral H", o.spectral_entropy[0], H, 1e-4)
check("spectral Hn", o.spectral_entropy_norm[0], H / math.log(14), 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
