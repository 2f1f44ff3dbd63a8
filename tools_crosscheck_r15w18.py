#!/usr/bin/env python
"""In-wave cross-check for r15 wave 18: independent pandas/numpy social
choice machinery (float Bradley-Terry MM loop, dict Borda/Condorcet,
scipy-free Kendall W from rank sums, abs-diff footrule, brute
enumeration Shapley over the 8 coalitions) vs the DuckDB oracles.

    python tools_crosscheck_r15w18.py [sf_dir]
"""
import itertools
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("lineitem", "part", "events"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


ob = con.execute(
    "SELECT l.l_orderkey ok, p.p_brand b, "
    "SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) cents "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1,2"
).df()

# --- Bradley-Terry: float MM, 3 rounds with the same snap schedule ---
wins = {}
games = {}
for _, grp in ob.groupby("ok"):
    rows = list(grp.itertuples())
    for a, b in itertools.combinations(rows, 2):
        if a.cents == b.cents:
            continue
        w, l = (a.b, b.b) if a.cents > b.cents else (b.b, a.b)
        wins[w] = wins.get(w, 0) + 1
        key = tuple(sorted((a.b, b.b)))
        games[key] = games.get(key, 0) + 1
brands = sorted(set(ob.b))
pi = {b: 0.04 for b in brands}  # 25 brands -> 1/25 snapped
for _ in range(3):
    d = {b: 0.0 for b in brands}
    for (b1, b2), n in games.items():
        d[b1] += math.floor(n * 1e9 / (pi[b1] + pi[b2]) + 0.5) / 1e9
        d[b2] += math.floor(n * 1e9 / (pi[b1] + pi[b2]) + 0.5) / 1e9
    raw = {b: (wins.get(b, 0) / d[b]) if d[b] else 0.0 for b in brands}
    s = sum(raw.values())
    pi = {b: math.floor(raw[b] / s * 1e6 + 0.5) / 1e6 for b in brands}
o = con.execute(CATALOG["lineitem_bradley_terry_brands"].oracle).df()
for b in brands[:5] + brands[-3:]:
    check(f"bt[{b[-5:]}]", o[o.brand == b].bt_strength.iloc[0], pi[b], 2e-5)
check("bt games", float(o.n_games.sum()), 2 * sum(games.values()), 0)

# --- Borda / Condorcet ---
borda = {}
duelw = {}
for _, grp in ob.groupby("ok"):
    rows = sorted(grp.itertuples(), key=lambda r: (-r.cents, r.b))
    k = len(rows)
    for i, r in enumerate(rows):
        borda[r.b] = borda.get(r.b, 0) + (k - 1 - i)
    for a, b in itertools.combinations(rows, 2):
        if a.cents == b.cents:
            continue
        w, l = (a.b, b.b) if a.cents > b.cents else (b.b, a.b)
        duelw[(w, l)] = duelw.get((w, l), 0) + 1
o = con.execute(CATALOG["lineitem_borda_condorcet_brands"].oracle).df()
for b in brands[:4]:
    check(f"borda[{b[-5:]}]", float(o[o.brand == b].borda_points.iloc[0]),
          borda.get(b, 0), 0)
dwon = {b: 0 for b in brands}
for b1, b2 in itertools.combinations(brands, 2):
    w12, w21 = duelw.get((b1, b2), 0), duelw.get((b2, b1), 0)
    if w12 or w21:
        if w12 > w21:
            dwon[b1] += 1
        elif w21 > w12:
            dwon[b2] += 1
for b in brands[:4]:
    check(f"duels[{b[-5:]}]", float(o[o.brand == b].duels_won.iloc[0]), dwon[b], 0)

# --- Kendall W + footrule on yearly rankings ---
yb = con.execute(
    "SELECT year(l.l_shipdate) yr, p.p_brand b, "
    "SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) revc "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1,2"
).df()
ranks = {}
for yr, g in yb.groupby("yr"):
    rows = sorted(g.itertuples(), key=lambda r: (-r.revc, r.b))
    for i, r in enumerate(rows):
        ranks[(int(yr), r.b)] = i + 1
years = sorted(set(yb.yr.astype(int)))
n, m = len(brands), len(years)
rb = {b: sum(ranks[(y, b)] for y in years) for b in brands}
s_stat = sum((r - m * (n + 1) / 2) ** 2 for r in rb.values())
W = 12 * s_stat / (m * m * (n**3 - n))
o = con.execute(CATALOG["orders_kendall_w_years"].oracle).df().iloc[0]
check("kendall w", o.kendall_w, W, 1e-6)
check("friedman chi2", o.friedman_chi2, m * (n - 1) * W, 1e-6)

o = con.execute(CATALOG["orders_footrule_yearly_rankings"].oracle).df()
for y in years[:-1]:
    f = sum(abs(ranks[(y, b)] - ranks[(y + 1, b)]) for b in brands)
    check(f"footrule[{y}]", float(o[o.year_from == y].footrule.iloc[0]), f, 0)

# --- Shapley ---
ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"])
ev["d"] = ev["ts"].dt.floor("D")
u = ev.groupby(["user_id", "d"])["event_type"].agg(set)
cells = {}
for s in u:
    key = (int("view" in s), int("click" in s), int("error" in s))
    nn, cc = cells.get(key, (0, 0))
    cells[key] = (nn + 1, cc + int("purchase" in s))


def v(key):
    nn, cc = cells.get(key, (0, 0))
    return cc / nn if nn else 0.0


phis = {}
chans = ["view", "click", "error"]
for ci, ch in enumerate(chans):
    phi = 0.0
    others = [j for j in range(3) if j != ci]
    for sub in itertools.chain([()], [(others[0],), (others[1],)], [tuple(others)]):
        key_wo = [0, 0, 0]
        for j in sub:
            key_wo[j] = 1
        key_w = list(key_wo)
        key_w[ci] = 1
        wgt = (
            math.factorial(len(sub)) * math.factorial(3 - len(sub) - 1)
            / math.factorial(3)
        )
        phi += wgt * (v(tuple(key_w)) - v(tuple(key_wo)))
    phis[ch] = phi
o = con.execute(CATALOG["cust_shapley_channel_attribution"].oracle).df()
for ch in chans:
    check(f"shapley[{ch}]", o[o.channel == ch].shapley_value.iloc[0], phis[ch], 1e-5)
check("shapley eff gap", o.efficiency_gap.iloc[0] + 1.0, 1.0, 1e-6)
check(
    "shapley eff identity",
    sum(phis.values()),
    v((1, 1, 1)) - v((0, 0, 0)),
    1e-9,
)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
