#!/usr/bin/env python
"""In-wave cross-check for r15 wave 12: independent raw-array robust
estimators (brute-force Sn over expanded samples at sf0.001, numpy
percentile-free order statistics, O(n^2)-free shorth scan) vs the
DuckDB oracles.

    python tools_crosscheck_r15w12.py [sf_dir]

Sn's brute force is O(n^2) so it only runs when n <= 20000.
"""
import statistics
import sys

import duckdb
import numpy as np

from real_estate_data_pipeline_spark.queries import CATALOG

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")

ok = True


def check(name, got, want, tol=1e-6):
    global ok
    good = abs(got - want) <= tol * max(1.0, abs(want))
    print(f"{name:26s} got={got:.6f} want={want:.6f} {'OK' if good else 'FAIL'}")
    ok &= good


q = np.sort(
    np.array(
        [r[0] for r in con.execute("SELECT CAST(l_quantity AS BIGINT) FROM lineitem").fetchall()],
        dtype=np.int64,
    )
)
n = len(q)


def med2(arr):
    """Doubled median: sum of the two middle order statistics."""
    m = len(arr)
    return int(arr[(m + 1) // 2 - 1]) + int(arr[(m + 2) // 2 - 1])


# Sn brute force
if n <= 20000:
    ms = []
    for i in range(n):
        d = np.sort(np.abs(q - q[i]))
        d = np.delete(d, np.searchsorted(d, 0))  # drop ONE self zero
        ms.append(med2(d) / 2)
    ms = np.sort(np.array(ms))
    sn_raw = med2(ms) / 2
    o = con.execute(CATALOG["ml_sn_scale_quantity"].oracle).df()
    check("sn_raw", o.sn_raw[0], sn_raw, 1e-9)
    check("sn", o.sn_scale[0], 1.1926 * sn_raw, 1e-9)
else:
    print("sn brute force skipped (n too large)")

# biweight midvariance
med = med2(q) / 2
ad = np.sort(np.abs(q - med))
mad = med2(ad) / 2
u = (q - med) / (9 * mad)
m_ = np.abs(u) < 1
num = ((q[m_] - med) ** 2 * (1 - u[m_] ** 2) ** 4).sum()
den = ((1 - u[m_] ** 2) * (1 - 5 * u[m_] ** 2)).sum()
bw = n * num / den**2
o = con.execute(CATALOG["ml_biweight_midvariance_quantity"].oracle).df()
check("bw med", o.median_q[0], med, 1e-9)
check("bw mad", o.mad_q[0], mad, 1e-9)
check("biweight", o.biweight_midvariance[0], bw, 1e-4)

# trimean / midhinge (doubled-rank convention)
def qk(k, mdiv):
    lo = q[(k * n + mdiv - 1) // mdiv - 1]
    hi = q[(k * n) // mdiv + 1 - 1]
    return int(lo) + int(hi)

q1d, q2d, q3d = qk(1, 4), qk(2, 4), qk(3, 4)
o = con.execute(CATALOG["ml_trimean_midhinge_quantity"].oracle).df()
check("trimean", o.trimean[0], (q1d + 2 * q2d + q3d) / 8)
check("midhinge", o.midhinge[0], (q1d + q3d) / 4)
check("iqr", o.iqr[0], (q3d - q1d) / 2)

# gastwirth
t1d, t2d = qk(1, 3), qk(2, 3)
m2d = med2(q)
o = con.execute(CATALOG["ml_gastwirth_estimator_quantity"].oracle).df()
check("gastwirth", o.gastwirth[0], (3 * t1d + 4 * m2d + 3 * t2d) / 20)

# shorth: scan all (lo index, lo+h-1) windows on the raw sorted array
h_ = n // 2 + 1
widths = q[h_ - 1 :] - q[: n - h_ + 1]
i = int(np.lexsort((q[: n - h_ + 1], widths))[0])
o = con.execute(CATALOG["ml_shorth_lms_quantity"].oracle).df()
check("shorth w", float(o.shorth_width[0]), float(widths[i]), 0)
check("lms", o.lms_location[0], (int(q[i]) + int(q[i + h_ - 1])) / 2, 1e-9)

print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
