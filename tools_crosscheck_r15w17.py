#!/usr/bin/env python
"""In-wave cross-check for r15 wave 17: independent numpy point-process
machinery (dense binned series straight from np.bincount, textbook
Allan/Fano, O(n^2)-free pair counting via np.searchsorted for Ripley,
hashlib re-derivation of the thinning coin, itertools-free rank
patterns) vs the DuckDB oracles.

    python tools_crosscheck_r15w17.py [sf_dir]
"""
import hashlib
import math
import sys

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


ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_id"])
ev["sec"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
day0 = ev["ts"].min().floor("D")
t0 = int(day0.value // 1_000_000_000)
nd = int((ev["ts"].max().floor("D") - day0).days) + 1
nh = nd * 24
hours = ((ev["sec"] - t0) // 3600).to_numpy()
hc = np.bincount(hours, minlength=nh).astype(np.int64)

# --- Allan variance ---
o = con.execute(CATALOG["evt_allan_variance_hours"].oracle).df()
for tau in (1, 2, 4, 8):
    c = hc.reshape(-1, tau).sum(axis=1)
    d = np.diff(c.astype(float))
    avar = float((d * d).sum()) / (2 * (len(c) - 1))
    r = o[o.tau_hours == tau].iloc[0]
    check(f"allan[{tau}h]", r.allan_var, avar, 1e-6)
    check(f"allan n[{tau}h]", float(r.n_bins), len(c), 0)

# --- Fano ---
o = con.execute(CATALOG["evt_fano_factor_scales"].oracle).df()
for tau in (1, 6, 24):
    c = hc.reshape(-1, tau).sum(axis=1).astype(float)
    r = o[o.window_hours == tau].iloc[0]
    check(f"fano[{tau}h]", r.fano, c.var(ddof=1) / c.mean(), 1e-6)

# --- Ripley K (minute bands) ---
mins = np.sort(((ev["sec"] - t0) // 60).to_numpy())
n = len(mins)
L = nd * 1440
o = con.execute(CATALOG["evt_ripley_k_minutes"].oracle).df()
for tt in (1, 2, 5, 10):
    lo = np.searchsorted(mins, mins - tt, side="left")
    hi = np.searchsorted(mins, mins + tt, side="right")
    pairs = int((hi - lo).sum()) - n
    r = o[o.t_minutes == tt].iloc[0]
    check(f"ripley pairs[{tt}]", float(r.n_pairs), pairs, 0)
    check(f"ripley k[{tt}]", r.k_hat, L * pairs / (n * (n - 1)), 1e-6)
    check(
        f"ripley csr[{tt}]",
        r.csr_ratio,
        L * pairs / (n * (n - 1) * (2 * tt + 1)),
        1e-6,
    )

# --- thinning invariance ---
def cv2_of(df):
    gaps = []
    for uid, g in df.sort_values(["user_id", "sec", "event_id"]).groupby("user_id"):
        s = g["sec"].to_numpy()
        gaps.extend((s[1:] - s[:-1]).tolist())
    g = np.array(gaps, dtype=float)
    return len(g), g.var(ddof=1) / g.mean() ** 2


keep = ev["event_id"].map(
    lambda e: int(hashlib.sha256(f"{e}thin15".encode()).hexdigest()[:8], 16)
    < 2**31
)
k0, c0 = cv2_of(ev)
k1, c1 = cv2_of(ev[keep])
o = con.execute(CATALOG["evt_thinning_invariance_cv2"].oracle).df().iloc[0]
check("thin n full", float(o.n_gaps_full), k0, 0)
check("thin n thin", float(o.n_gaps_thinned), k1, 0)
check("thin cv2 full", o.cv2_full, c0, 1e-6)
check("thin cv2 thin", o.cv2_thinned, c1, 1e-6)
check("thin ratio", o.thinning_ratio, c1 / c0, 1e-6)

# --- permutation entropy ---
pats = {}
for i in range(nh - 2):
    x1, x2, x3 = int(hc[i]), int(hc[i + 1]), int(hc[i + 2])
    r1 = (x2 < x1) + (x3 < x1)
    r2 = (x1 <= x2) + (x3 < x2)
    r3 = (x1 <= x3) + (x2 <= x3)
    p = 100 * r1 + 10 * r2 + r3
    pats[p] = pats.get(p, 0) + 1
W = sum(pats.values())
pe = math.log(W) - sum(nk * math.log(nk) for nk in pats.values()) / W
o = con.execute(CATALOG["evt_permutation_entropy_hours"].oracle).df()
check("pe rows", float(len(o)), len(pats), 0)
for p, nk in sorted(pats.items()):
    check(f"pe n[{p}]", float(o[o.pattern == p].n_windows.iloc[0]), nk, 0)
check("pe nats", o.pe_nats.iloc[0], pe, 1e-4)
check("pe norm", o.pe_normalized.iloc[0], pe / math.log(6), 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
