#!/usr/bin/env python
"""In-wave cross-check for r15 wave 26: independent pandas/numpy
Markov machinery (dict trigram G2, numpy 5x5 matrix square for the CK
check, per-source 2xK chi2 loop, flow-asymmetry dict, float add-one
holdout perplexity) vs the DuckDB oracles.

    python tools_crosscheck_r15w26.py [sf_dir]
"""
import math
import sys
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")

ok = True


def check(name, got, want, tol=2e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


ev = pd.read_parquet(
    f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
)
ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
ev = ev.sort_values(["user_id", "sec", "event_id"])
t0 = int(ev["ts"].min().floor("D").value // 1_000_000_000)

seqs = []
for uid, g in ev.groupby("user_id"):
    seqs.append((g["event_type"].tolist(), g["sec"].tolist()))

states = sorted(ev.event_type.unique())
idx = {s: i for i, s in enumerate(states)}

# --- G2 memory test ---
tri = Counter()
for s, _ in seqs:
    for i in range(len(s) - 2):
        tri[(s[i], s[i + 1], s[i + 2])] += 1
nab = Counter()
nbc = Counter()
nb = Counter()
for (a, b, c), n in tri.items():
    nab[(a, b)] += n
    nbc[(b, c)] += n
    nb[b] += n
g2 = 2 * sum(
    n * math.log(n * nb[b] / (nab[(a, b)] * nbc[(b, c)]))
    for (a, b, c), n in tri.items()
)
o = con.execute(CATALOG["evt_markov_memory_g2"].oracle).df().iloc[0]
check("g2 n", float(o.n_trigrams), sum(tri.values()), 0)
check("g2", o.g2, g2, 1e-4)
check("g2 df", float(o.df), 5 * 16, 0)

# --- CK check ---
bi = Counter()
two = Counter()
for s, _ in seqs:
    for i in range(len(s) - 1):
        bi[(s[i], s[i + 1])] += 1
    for i in range(len(s) - 2):
        two[(s[i], s[i + 2])] += 1
P1 = np.zeros((5, 5))
for (a, b), n in bi.items():
    P1[idx[a], idx[b]] = n
P1 = P1 / P1.sum(axis=1, keepdims=True)
P2e = np.zeros((5, 5))
for (a, c), n in two.items():
    P2e[idx[a], idx[c]] = n
P2e = P2e / P2e.sum(axis=1, keepdims=True)
gap = np.abs(P1 @ P1 - P2e)
o = con.execute(CATALOG["evt_markov_ck_check"].oracle).df().iloc[0]
check("ck max", o.max_abs_gap, gap.max(), 1e-5)
check("ck mean", o.mean_abs_gap, gap.mean(), 1e-5)

# --- stationarity halves ---
mid = (ev["sec"].min() + ev["sec"].max()) // 2
cells = Counter()
for s, secs in seqs:
    for i in range(len(s) - 1):
        h = 0 if secs[i] <= mid else 1
        cells[(s[i], s[i + 1], h)] += 1
chi_tot = 0.0
df_tot = 0
for a in states:
    sub = {(b, h): n for (aa, b, h), n in cells.items() if aa == a}
    bs = sorted({b for b, _ in sub})
    N = sum(sub.values())
    rt = {h: sum(n for (b, hh), n in sub.items() if hh == h) for h in (0, 1)}
    ct = {b: sum(n for (bb, hh), n in sub.items() if bb == b) for b in bs}
    acc = sum(n * n / (rt[h] * ct[b]) for (b, h), n in sub.items())
    chi_tot += N * (acc - 1)
    df_tot += len(bs) - 1
o = con.execute(CATALOG["evt_markov_stationarity_halves"].oracle).df().iloc[0]
check("stat chi2", o.chi2_total, chi_tot, 1e-4)
check("stat df", float(o.df), df_tot, 0)

# --- reversibility ---
asym = 0
tot = 0
best = None
for i, a in enumerate(states):
    for b in states[i + 1:]:
        f, w = bi.get((a, b), 0), bi.get((b, a), 0)
        if f or w:
            tot += f + w
            asym += abs(f - w)
            cand = (abs(f - w), a, b, f, w)
            if best is None or (-cand[0], cand[1], cand[2]) < (
                -best[0], best[1], best[2]
            ):
                best = cand
o = con.execute(CATALOG["evt_markov_reversibility"].oracle).df().iloc[0]
check("rev tot", float(o.n_offdiag_transitions), tot, 0)
check("rev asym", float(o.asym_sum), asym, 0)
check("rev ratio", o.asym_ratio, asym / tot, 1e-6)
assert o.top_pair == f"{best[1]}->{best[2]}", (o.top_pair, best)
print(f"top pair OK: {o.top_pair} ({best[3]} vs {best[4]})")

# --- holdout perplexity ---
tr_bi, tr_bia = Counter(), Counter()
tr_tri, tr_triab = Counter(), Counter()
te_bi, te_tri = Counter(), Counter()
for s, secs in seqs:
    for i in range(len(s) - 1):
        dy = (secs[i] - t0) // 86400
        if dy <= 20:
            tr_bi[(s[i], s[i + 1])] += 1
            tr_bia[s[i]] += 1
        if dy >= 23:
            te_bi[(s[i], s[i + 1])] += 1
    for i in range(len(s) - 2):
        dy = (secs[i] - t0) // 86400
        if dy <= 18:
            tr_tri[(s[i], s[i + 1], s[i + 2])] += 1
            tr_triab[(s[i], s[i + 1])] += 1
        if dy >= 23:
            te_tri[(s[i], s[i + 1], s[i + 2])] += 1
lb = sum(
    m * math.log((tr_bi.get(k, 0) + 1) / (tr_bia.get(k[0], 0) + 5))
    for k, m in te_bi.items()
)
lt = sum(
    m * math.log((tr_tri.get(k, 0) + 1) / (tr_triab.get(k[:2], 0) + 5))
    for k, m in te_tri.items()
)
ppb = math.exp(-lb / sum(te_bi.values()))
ppt = math.exp(-lt / sum(te_tri.values()))
o = con.execute(CATALOG["evt_sequence_holdout_perplexity"].oracle).df().iloc[0]
check("pp nb", float(o.n_test_bigrams), sum(te_bi.values()), 0)
check("pp bigram", o.pp_bigram, ppb, 1e-4)
check("pp trigram", o.pp_trigram, ppt, 1e-4)
print(f"context: bigram PP {ppb:.3f} vs trigram PP {ppt:.3f} on held-out week")

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
