#!/usr/bin/env python
"""In-wave cross-check for r15 wave 31: independent pandas/numpy
machinery (Counter-based Juilland D on float shares, dict entropy
production, np autocovariance ESS, scipy-free effect sizes, pandas
date_range month calendar) vs the DuckDB oracles.

    python tools_crosscheck_r15w31.py [sf_dir]
"""
import math
import sys
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("documents", "events", "orders", "customer"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-5):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


# --- Juilland D ---
docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "text"])
per_src = {}
glob = Counter()
for src, g in docs.groupby("source"):
    c = Counter()
    for txt in g.text:
        c.update(w for w in txt.lower().split(" ") if w)
    per_src[src] = c
    glob.update(c)
top = sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
o = con.execute(CATALOG["doc_juilland_d_dispersion"].oracle).df()
srcs = sorted(per_src)
for tok, gc in top[:5]:
    f = np.array(
        [per_src[s][tok] / sum(per_src[s].values()) for s in srcs], dtype=float
    )
    cv = f.std(ddof=1) / f.mean()
    dj = 1 - cv / math.sqrt(len(srcs) - 1)
    check(f"juilland[{tok[:6]}]", o[o.token == tok].juilland_d.iloc[0], dj, 1e-4)

# --- entropy production ---
ev = pd.read_parquet(
    f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
)
ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
ev = ev.sort_values(["user_id", "sec", "event_id"])
flows = Counter()
for uid, g in ev.groupby("user_id"):
    s = g.event_type.tolist()
    for i in range(len(s) - 1):
        if s[i] != s[i + 1]:
            flows[(s[i], s[i + 1])] += 1
tot = sum(flows.values())
ep = 0.0
nbi = nos = 0
states = sorted(ev.event_type.unique())
for i, a in enumerate(states):
    for b in states[i + 1:]:
        f, w = flows.get((a, b), 0), flows.get((b, a), 0)
        if f and w:
            nbi += 1
            ep += (f - w) * math.log(f / w)
        elif f or w:
            nos += 1
ep /= 2 * tot
o = con.execute(CATALOG["evt_entropy_production_rate"].oracle).df().iloc[0]
check("ep", o.entropy_production_nats, ep, 1e-4)
check("ep nbi", float(o.n_bidirectional_pairs), nbi, 0)
check("ep tot", float(o.n_offdiag_transitions), tot, 0)

# --- ESS ---
daily = ev.groupby(ev["ts"].dt.floor("D")).size().sort_index().to_numpy(float)
n = len(daily)
z = daily - daily.mean()
den = (z * z).sum()
sr = sum((z[k:] * z[:-k]).sum() / den for k in range(1, 11))
ess = n / (1 + 2 * sr)
o = con.execute(CATALOG["evt_effective_sample_size_daily"].oracle).df().iloc[0]
check("ess sumrho", o.sum_rho_1_10, sr, 1e-5)
check("ess", o.effective_n, ess, 1e-4)

# --- effect sizes ---
x = con.execute(
    "SELECT CASE WHEN c.c_mktsegment='BUILDING' THEN 1 ELSE 0 END grp, "
    "CAST(CAST(o.o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) cents "
    "FROM orders o JOIN customer c ON o.o_custkey=c.c_custkey "
    "WHERE c.c_mktsegment IN ('BUILDING','AUTOMOBILE')"
).df()
a = x[x.grp == 1].cents.astype(float)
b = x[x.grp == 0].cents.astype(float)
n1, n2 = len(a), len(b)
sp = math.sqrt(((n1 - 1) * a.var(ddof=1) + (n2 - 1) * b.var(ddof=1)) / (n1 + n2 - 2))
d = (a.mean() - b.mean()) / sp
J = 1 - 3 / (4 * (n1 + n2 - 2) - 1)
o = con.execute(CATALOG["ml_cohen_d_effect_sizes"].oracle).df().iloc[0]
check("cohen d", o.cohens_d, d, 1e-5)
check("hedges g", o.hedges_g, d * J, 1e-5)
check("glass", o.glass_delta, (a.mean() - b.mean()) / b.std(ddof=1), 1e-5)

# --- month uniformity ---
od = con.execute("SELECT CAST(o_orderdate AS DATE) dy FROM orders").df()
od["dy"] = pd.to_datetime(od.dy)
days = pd.date_range(od.dy.min(), od.dy.max(), freq="D")
days_m = pd.Series(days.month).value_counts().sort_index()
obs = od.dy.dt.month.value_counts().sort_index()
N, D = len(od), len(days)
chi2 = sum(
    (obs.get(m, 0) - N * days_m[m] / D) ** 2 / (N * days_m[m] / D)
    for m in days_m.index
)
peak = max(days_m.index, key=lambda m: (obs.get(m, 0) / (N * days_m[m] / D), -m))
o = con.execute(CATALOG["orders_month_uniformity_chi2"].oracle).df().iloc[0]
check("month chi2", o.chi2, chi2, 1e-4)
check("month peak", float(o.peak_month), peak, 0)
check("month df", float(o.df), len(days_m) - 1, 0)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
