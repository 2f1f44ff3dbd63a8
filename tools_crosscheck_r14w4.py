#!/usr/bin/env python
"""In-wave cross-check for r14 wave 4 (queueing): brute-force Python
simulations (direct Lindley recursion, explicit session sweep, busy
chain scan, P-K formula, Erlang-B recursion) vs the DuckDB oracles."""
import sys
from collections import defaultdict
from decimal import Decimal

import duckdb

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


rows = con.execute("""
  SELECT user_id, event_id, event_type,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
         CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS v
  FROM events ORDER BY user_id, sec, event_id
""").fetchall()

by_user = defaultdict(list)
for u, eid, et, sec, v in rows:
    by_user[u].append((sec, eid))

ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:30s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# --- Lindley ---------------------------------------------------------
tot_span = sum(u[-1][0] - u[0][0] for u in by_user.values() if len(u) > 1)
tot_m = sum(len(u) - 1 for u in by_user.values() if len(u) > 1)
S = (tot_span * 4) // (tot_m * 5)
waits = []
for u in by_user.values():
    w = 0
    waits.append(0)
    for i in range(1, len(u)):
        a = u[i][0] - u[i - 1][0]
        w = max(0, w + S - a)
        waits.append(w)
row = oracle("evt_lindley_virtual_wait")
check("lindley service_s", float(row.service_s[0]), float(S), 0)
check("lindley mean_wait", row.mean_wait_s[0], sum(waits) / len(waits))
check("lindley max_wait", float(row.max_wait_s[0]), float(max(waits)), 0)
check("lindley delayed", row.delayed_share[0], sum(1 for w in waits if w > 0) / len(waits))

# --- sessions / concurrency -----------------------------------------
ivals = []
for u in by_user.values():
    start = prev = u[0][0]
    for sec, _ in u[1:]:
        if sec - prev > 1800:
            ivals.append((start, prev))
            start = sec
        prev = sec
    ivals.append((start, prev))
hours = sorted({s // 3600 for s, e in ivals} | {e // 3600 for s, e in ivals})
best = max(
    hours,
    key=lambda H: (
        sum(1 for s, e in ivals if s // 3600 <= H) - sum(1 for s, e in ivals if e // 3600 <= H),
        -H,
    ),
)
peak = sum(1 for s, e in ivals if s // 3600 <= best) - sum(
    1 for s, e in ivals if e // 3600 <= best
)
row = oracle("evt_peak_concurrency_hours")
check("peak concurrency", float(row.open_sessions[0]), float(peak), 0)

# --- busy periods ----------------------------------------------------
bt = defaultdict(list)
for u, eid, et, sec, v in rows:
    bt[(et, sec // 86400)].append(sec)
per_type = defaultdict(lambda: [0, 0, 0, set()])  # n_busy, n_events, dur, days
for (et, day), secs in bt.items():
    secs.sort()
    start = prev = secs[0]
    cnt = 1
    per_type[et][3].add(day)
    for s in secs[1:]:
        if s - prev > 60:
            per_type[et][0] += 1
            per_type[et][1] += cnt
            per_type[et][2] += prev - start
            start, cnt = s, 0
        cnt += 1
        prev = s
    per_type[et][0] += 1
    per_type[et][1] += cnt
    per_type[et][2] += prev - start
row = oracle("evt_busy_periods_by_type_day").set_index("event_type")
for et, (nb, ne, dur, days) in sorted(per_type.items()):
    check(f"busy[{et}] n", float(row.loc[et].n_busy_periods), float(nb), 0)
    check(f"busy[{et}] mean_s", row.loc[et].mean_busy_s, dur / nb)
    check(
        f"busy[{et}] util", row.loc[et].busy_utilization, dur / (len(days) * 86400)
    )

# --- P-K -------------------------------------------------------------
agg = defaultdict(lambda: [0, None, None, Decimal(0), Decimal(0)])
for u, eid, et, sec, v in rows:
    a = agg[et]
    a[0] += 1
    a[1] = sec if a[1] is None else min(a[1], sec)
    a[2] = sec if a[2] is None else max(a[2], sec)
    a[3] += Decimal(v)
    a[4] += Decimal(v) * Decimal(v)
row = oracle("evt_pk_load_report_by_type").set_index("event_type")
for et, (n, lo, hi, sv, sv2) in sorted(agg.items()):
    lam = (n - 1) / float(hi - lo)
    es, es2 = float(sv) / n, float(sv2) / n
    rho = lam * es
    check(f"pk[{et}] rho", row.loc[et].rho, rho)
    check(f"pk[{et}] wait", row.loc[et].pk_wait_s, lam * es2 / (2 * (1 - rho)))

# --- Erlang-B --------------------------------------------------------
n_all = len(rows)
lo = min(r[3] for r in rows)
hi = max(r[3] for r in rows)
sv = sum(Decimal(r[4]) for r in rows)
E = (n_all - 1) / float(hi - lo) * (float(sv) / n_all)
B = 1.0
bs = {}
for c in range(1, 11):
    B = E * B / (c + E * B)
    bs[c] = B
row = oracle("evt_erlang_b_sweep").set_index("servers")
for c in (1, 2, 5, 10):
    check(f"erlangB c={c}", row.loc[c].blocking_prob, bs[c], 1e-4)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
