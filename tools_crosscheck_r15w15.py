#!/usr/bin/env python
"""In-wave cross-check for r15 wave 15: independent pandas/numpy
survival + epidemiology machinery (float Aalen-Johansen CIF loop,
direct person-time rates, textbook Mantel-Haenszel/RBG, float Gehan
loop over the duration histogram, float direct/indirect
standardization) vs the DuckDB oracles.

    python tools_crosscheck_r15w15.py [sf_dir]
"""
import math
import sys

import duckdb
import numpy as np
import pandas as pd

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for tname in ("events", "orders", "customer"):
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")

ok = True


def check(name, got, want, tol=2e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:28s} got={got:.8f} want={want:.8f} {'OK' if good else 'FAIL'}")
    ok &= good


ev = pd.read_parquet(
    f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
)
ev["sec"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
ev = ev.sort_values(["user_id", "sec", "event_id"])

# gaps with terminating type
recs = []
for uid, g in ev.groupby("user_id"):
    s = g["sec"].to_numpy()
    et = g["event_type"].to_numpy()
    for i in range(1, len(s)):
        recs.append((s[i] - s[i - 1], et[i]))
gaps = pd.DataFrame(recs, columns=["g", "et"])
gaps["hb"] = np.minimum(gaps["g"] // 3600, 8)

# --- CIF (float Aalen-Johansen over hour bands) ---
o = con.execute(CATALOG["evt_cif_competing_hours"].oracle).df()
types = sorted(ev["event_type"].unique())
hist = gaps.groupby("hb").size()
surv = 1.0
cif = {tp: 0.0 for tp in types}
surv_at = {}
cif_at = {}
for d in range(8):
    r = int(hist[hist.index >= d].sum())
    dd = int(hist.get(d, 0))
    h = dd / r
    for tp in types:
        dk = int(((gaps["hb"] == d) & (gaps["et"] == tp)).sum())
        cif[tp] += (dk / r) * surv
    surv *= 1 - h
    surv_at[d] = surv
    cif_at[d] = dict(cif)
for tp in types:
    row = o[(o.event_type == tp) & (o.hour_band == 7)].iloc[0]
    check(f"cif[{tp}]@7", row.cif, cif_at[7][tp], 5e-5)
check("surv@7", o[o.hour_band == 7].surv.iloc[0], surv_at[7], 5e-5)
check("rows", float(len(o)), 8 * len(types), 0)

# --- person-time rates ---
o = con.execute(CATALOG["evt_person_time_rates"].oracle).df()
pt = ev.groupby("user_id")["sec"].agg(lambda s: s.max() - s.min()).sum()
first_idx = ev.groupby("user_id").head(1).index
rec_ev = ev.drop(first_idx)
for tp in types:
    c = int((rec_ev["event_type"] == tp).sum())
    row = o[o.event_type == tp].iloc[0]
    check(f"pt n[{tp}]", row.n_recurrences, c, 0)
    check(f"pt rate[{tp}]", row.rate_per_1000_days, c * 86400000 / pt, 1e-6)
    check(
        f"pt hi[{tp}]",
        row.rate_hi,
        (c + 1.959964 * math.sqrt(c)) * 86400000 / pt,
        1e-6,
    )

# --- Mantel-Haenszel OR + RBG ---
od = con.execute(
    "SELECT EXTRACT(year FROM o_orderdate) AS yr, o_orderpriority AS pr, "
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
    "FROM orders"
).df()
cents = np.sort(od["cents"].to_numpy())
n = len(cents)
m2 = (
    int(cents[n // 2 - 1] + cents[n // 2]) if n % 2 == 0 else int(2 * cents[n // 2])
)
od["urgent"] = (od["pr"] == "1-URGENT").astype(int)
od["hi"] = (2 * od["cents"] > m2).astype(int)
sr = ss = 0.0
spr = spsqr = sqs = 0.0
for yr, g in od.groupby("yr"):
    a = int(((g.urgent == 1) & (g.hi == 1)).sum())
    b = int(((g.urgent == 1) & (g.hi == 0)).sum())
    c = int(((g.urgent == 0) & (g.hi == 1)).sum())
    d = int(((g.urgent == 0) & (g.hi == 0)).sum())
    nn = a + b + c + d
    R, S = a * d / nn, b * c / nn
    P, Q = (a + d) / nn, (b + c) / nn
    sr += R
    ss += S
    spr += P * R
    spsqr += P * S + Q * R
    sqs += Q * S
or_mh = sr / ss
var = spr / (2 * sr * sr) + spsqr / (2 * sr * ss) + sqs / (2 * ss * ss)
o = con.execute(CATALOG["ml_mantel_haenszel_or"].oracle).df().iloc[0]
check("mh or", o.or_mh, or_mh, 1e-5)
check("mh se", o.rbg_se, math.sqrt(var), 1e-4)
check("mh lo", o.or_lo, math.exp(math.log(or_mh) - 1.959964 * math.sqrt(var)), 1e-4)
check("mh hi", o.or_hi, math.exp(math.log(or_mh) + 1.959964 * math.sqrt(var)), 1e-4)

# --- Gehan-Breslow-Wilcoxon ---
cu = con.execute(
    "SELECT c.c_mktsegment AS seg, "
    "date_diff('day', MIN(CAST(o.o_orderdate AS DATE)), "
    "MAX(CAST(o.o_orderdate AS DATE))) AS dur, "
    "CASE WHEN MAX(o.o_orderdate) < TIMESTAMP '2001-01-01' THEN 1 ELSE 0 END AS ev "
    "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
    "WHERE c.c_mktsegment IN ('BUILDING','AUTOMOBILE') "
    "GROUP BY c.c_custkey, c.c_mktsegment"
).df()
u_stat = 0.0
var = 0.0
for dur in sorted(cu.dur.unique()):
    at = cu[cu.dur >= dur]
    here = cu[cu.dur == dur]
    r1 = int((at.seg == "BUILDING").sum())
    r2 = int((at.seg == "AUTOMOBILE").sum())
    d1 = int(((here.seg == "BUILDING") & (here.ev == 1)).sum())
    d2 = int(((here.seg == "AUTOMOBILE") & (here.ev == 1)).sum())
    dd, rr = d1 + d2, r1 + r2
    if dd == 0 or rr <= 1:
        continue
    u_stat += rr * d1 - r1 * dd
    var += r1 * r2 * dd * (rr - dd) / (rr - 1)
o = con.execute(CATALOG["ml_gehan_wilcoxon_segments"].oracle).df().iloc[0]
check("gehan u", float(o.u_gehan), u_stat, 0)
check("gehan z", o.z, u_stat / math.sqrt(var), 1e-5)
check("gehan chi2", o.gehan_chi2, u_stat * u_stat / var, 1e-5)

# --- direct/indirect standardization ---
oc = con.execute(
    "SELECT c.c_mktsegment AS seg, EXTRACT(year FROM o.o_orderdate) AS yr, "
    "CASE WHEN o.o_orderpriority='1-URGENT' THEN 1 ELSE 0 END AS urg "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
).df()
o = con.execute(CATALOG["cust_urgent_rate_direct_std"].oracle).df()
std_pop = oc.groupby("yr").agg(ny=("urg", "size"), uy=("urg", "sum"))
nn = len(oc)
for seg in sorted(oc.seg.unique()):
    g = oc[oc.seg == seg]
    crude = g.urg.mean()
    stdr = 0.0
    expd = 0.0
    for yr, grp in g.groupby("yr"):
        stdr += grp.urg.mean() * std_pop.loc[yr, "ny"] / nn
        expd += len(grp) * std_pop.loc[yr, "uy"] / std_pop.loc[yr, "ny"]
    row = o[o.segment == seg].iloc[0]
    check(f"std crude[{seg}]", row.crude_rate, crude, 1e-6)
    check(f"std rate[{seg}]", row.std_rate, stdr, 1e-5)
    check(f"std smr[{seg}]", row.smr, g.urg.sum() / expd, 1e-5)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
