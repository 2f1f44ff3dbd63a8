#!/usr/bin/env python
"""In-wave numpy cross-check for r14 wave 1 (independent
implementations, brute-force from raw samples — NOT the histogram
algebra the engines use). Compares the DuckDB oracle output (parity
already proves Spark==DuckDB) against scipy-free reference math."""
import sys

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()
x = con.execute(
    "SELECT CAST(l_quantity AS BIGINT) FROM lineitem WHERE l_returnflag='R'"
).fetchnumpy()["CAST(l_quantity AS BIGINT)"].astype(np.int64)
y = con.execute(
    "SELECT CAST(l_quantity AS BIGINT) FROM lineitem WHERE l_returnflag='N'"
).fetchnumpy()["CAST(l_quantity AS BIGINT)"].astype(np.int64)
nx, ny = len(x), len(y)
N = nx + ny
pooled = np.concatenate([x, y])
labels = np.concatenate([np.zeros(nx, bool), np.ones(ny, bool)])  # True = y


def midranks(vals):
    """Tie-averaged ranks, scipy.stats.rankdata(method='average') clone."""
    order = np.argsort(vals, kind="mergesort")
    ranks = np.empty(len(vals), dtype=float)
    sv = vals[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j + 2) / 2.0
        i = j + 1
    return ranks


def check(name, got, want, tol):
    ok = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:38s} got={got:.6f} want={want:.6f} {'OK' if ok else 'FAIL'}")
    return ok


all_ok = True

# --- Siegel-Tukey ---------------------------------------------------
# explicit alternating rank construction
st_rank_seq = np.empty(N, dtype=np.int64)  # st_rank_seq[p-1] = rank of sorted pos p
B = (N + 1) // 2
for p in range(1, N + 1):
    if p <= B:
        st_rank_seq[p - 1] = 2 * p - (1 if p % 2 == 1 else 0)
    else:
        qp = N + 1 - p
        st_rank_seq[p - 1] = 2 * qp - (1 if qp % 2 == 0 else 0)
assert sorted(st_rank_seq) == list(range(1, N + 1))
order = np.argsort(pooled, kind="mergesort")
scores = np.empty(N, dtype=float)
sv = pooled[order]
i = 0
while i < N:
    j = i
    while j + 1 < N and sv[j + 1] == sv[i]:
        j += 1
    scores[order[i : j + 1]] = st_rank_seq[i : j + 1].mean()
    i = j + 1
T = scores[~labels].sum()
E = nx * (N + 1) / 2.0
S2 = (scores**2).sum()
Var = nx * ny / (N * (N - 1.0)) * (S2 - N * ((N + 1) / 2.0) ** 2)
z_st = (T - E) / np.sqrt(Var)
row = oracle("ml_siegel_tukey_dispersion")
all_ok &= check("siegel_tukey t", row.t_stat[0], T, 1e-6)
all_ok &= check("siegel_tukey z", row.z_siegel_tukey[0], z_st, 1e-4)

# --- Conover squared ranks -------------------------------------------
ux = np.abs(x - x.mean())
uy = np.abs(y - y.mean())
u = np.concatenate([ux, uy])
r = midranks(u)
Tc = (r[:nx] ** 2).sum()
W = r**2
Ec = nx * W.sum() / N
Varc = nx * ny / (N * (N - 1.0)) * ((W**2).sum() - W.sum() ** 2 / N)
z_c = (Tc - Ec) / np.sqrt(Varc)
row = oracle("ml_conover_squared_ranks")
all_ok &= check("conover T", row.t_sq_ranks[0], Tc, 1e-9)
all_ok &= check("conover z", row.z_conover[0], z_c, 1e-6)

# --- Fligner-Policello ------------------------------------------------
ys = np.sort(y)
xs = np.sort(x)
P = np.searchsorted(ys, x, "left") + 0.5 * (
    np.searchsorted(ys, x, "right") - np.searchsorted(ys, x, "left")
)
Q = np.searchsorted(xs, y, "left") + 0.5 * (
    np.searchsorted(xs, y, "right") - np.searchsorted(xs, y, "left")
)
UP, UQ = P.sum(), Q.sum()
Vp = ((P - P.mean()) ** 2).sum()
Vq = ((Q - Q.mean()) ** 2).sum()
z_fp = (UP - UQ) / (2 * np.sqrt(Vp + Vq + P.mean() * Q.mean()))
row = oracle("ml_fligner_policello_ustat")
all_ok &= check("fligner_policello U_r", row.u_r[0], UP, 1e-9)
all_ok &= check("fligner_policello z", row.z_fligner_policello[0], z_fp, 1e-6)

# --- two-sample AD (Scholz-Stephens A2akN, midrank form) -------------
vals, cnt = np.unique(pooled, return_counts=True)
cx = np.array([(x == v).sum() for v in vals], dtype=float)
cy = np.array([(y == v).sum() for v in vals], dtype=float)
c = cx + cy
Bj = np.cumsum(c) - c / 2.0  # midpoint cumulative
Mx = np.cumsum(cx) - cx / 2.0
My = np.cumsum(cy) - cy / 2.0
den = Bj * (N - Bj) - N * c / 4.0
a2 = (
    (N - 1.0)
    / N**2
    * (
        (c * (N * Mx - nx * Bj) ** 2 / den).sum() / nx
        + (c * (N * My - ny * Bj) ** 2 / den).sum() / ny
    )
)
row = oracle("ml_ad_two_sample_stat")
all_ok &= check("ad2 a2", row.a2_stat[0], a2, 1e-5)

# --- two-sample Watson U^2 -------------------------------------------
Fx = np.cumsum(cx) / nx
Fy = np.cumsum(cy) / ny
d = Fx - Fy
dbar = (c * d).sum() / N
u2 = nx * ny / N**2 * (c * (d - dbar) ** 2).sum()
row = oracle("ml_watson_u2_two_sample")
all_ok &= check("watson u2", row.u2_watson[0], u2, 1e-6)

print("ALL OK" if all_ok else "FAILURES")
sys.exit(0 if all_ok else 1)
