#!/usr/bin/env python
"""In-wave cross-check for r14 wave 8: brute-force Python (explicit
pair loops for the interval join, direct record scan, drawdown scan,
run-length scan, Parkinson from floats) vs the DuckDB oracles."""
import sys
from collections import defaultdict
from math import log, sqrt
from statistics import median

import duckdb

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")


def oracle(name):
    return con.execute(CATALOG[name].oracle).df()


ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:26s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


# interval join
ev = con.execute(
    "SELECT user_id, event_id, event_type, CAST(epoch_us(ts) AS BIGINT) FROM events"
).fetchall()
clicks = defaultdict(list)
buys = defaultdict(list)
for u, eid, et, us in ev:
    if et == "click":
        clicks[u].append(us)
    elif et == "purchase":
        buys[u].append(us)
pairs = []
users = set()
for u in clicks:
    for lt in clicks[u]:
        for rt in buys.get(u, []):
            if lt <= rt <= lt + 3600_000_000:
                pairs.append(rt - lt)
                users.add(u)
row = oracle("evt_stream_interval_join_now")
check("ival n_pairs", float(row.n_pairs[0]), float(len(pairs)), 0)
check("ival n_users", float(row.n_users[0]), float(len(users)), 0)
check("ival mean_gap", row.mean_gap_s[0], sum(pairs) / len(pairs) / 1e6, 1e-5)
check("ival max_gap", float(row.max_gap_us[0]), float(max(pairs)), 0)

# daily cents
cents = [
    r[0]
    for r in con.execute("""
  SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
  FROM events GROUP BY CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT)
  ORDER BY CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT)
""").fetchall()
]

# records
U = L = 0
var = 0.0
for i in range(1, len(cents)):
    prev = cents[:i]
    if cents[i] > max(prev):
        U += 1
    if cents[i] < min(prev):
        L += 1
    var += 2.0 / (i + 1)
row = oracle("evt_records_foster_stuart")
check("records U", float(row.upper_records[0]), float(U), 0)
check("records L", float(row.lower_records[0]), float(L), 0)
check("records z", row.z_records[0], (U - L) / sqrt(var), 1e-5)

# drawdown
runmax = -1
best = (-1, None)
for i, x in enumerate(cents):
    runmax = max(runmax, x)
    dd = runmax - x
    if dd > best[0]:
        best = (dd, i)
row = oracle("evt_max_drawdown_daily")
check("max_dd", row.max_drawdown[0], best[0] / 100, 1e-9)
check("trough_off", float(row.trough_day_off[0]), float(best[1]), 0)

# longest run
m2 = 2 * median(cents)
flags = [1 if 2 * x > m2 else 0 for x in cents]
runs = []
cur = flags[0]
ln_ = 1
for f in flags[1:]:
    if f == cur:
        ln_ += 1
    else:
        runs.append((cur, ln_))
        cur, ln_ = f, 1
runs.append((cur, ln_))
row = oracle("evt_longest_run_above_median")
check("n_runs", float(row.n_runs[0]), float(len(runs)), 0)
check("longest_above", float(row.longest_above[0]),
      float(max((l for f, l in runs if f == 1), default=0)), 0)
check("longest_not", float(row.longest_not_above[0]),
      float(max((l for f, l in runs if f == 0), default=0)), 0)

# parkinson
hl = con.execute("""
  SELECT dn, MAX(c), MIN(c) FROM (
    SELECT CAST(FLOOR(epoch(ts) / 3600.0) AS BIGINT) AS hn,
           CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT) AS dn,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
    FROM events GROUP BY 1, 2) GROUP BY dn
""").fetchall()
s = sum(log(h / l) ** 2 for _, h, l in hl)
pv = s / (4 * len(hl) * log(2))
row = oracle("evt_parkinson_volatility_daily")
check("parkinson var", row.parkinson_var[0], pv, 1e-5)
check("parkinson vol", row.parkinson_vol[0], sqrt(pv), 1e-5)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
