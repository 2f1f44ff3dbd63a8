"""Round-13 wave 3: nonparametric trend and changepoint diagnostics on
the daily event-value series — Page's ordered-alternative trend test
(weeks x weekdays), the CUSUM-of-squares variance changepoint, the
Pettitt rank changepoint, the seasonal (per-weekday) Theil-Sen slope,
and the von Neumann successive-difference ratio.

All five reduce the raw stream to the calendar-day aggregate first
(bounded at ANY data scale) and share the _DAILY_CENTS_CTE /
_daily_cents frame; pair/grid work runs on that bounded frame only.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# The daily value series in exact cents with its day offset from the
# series start, single-sourced for the whole trend/changepoint wave:
# offset arithmetic replaces engine-specific weekday functions (the
# weekday is (offset % 7) + 1 relative to the first observed day).
_DAILY_CENTS_CTE = """dd AS (
      SELECT CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT) AS dn,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT dn - MIN(dn) OVER () AS off, cents,
             ROW_NUMBER() OVER (ORDER BY dn) AS k,
             COUNT(*) OVER () AS n
      FROM dd
    )"""


def _daily_cents(spark, sf_dir):
    """Spark twin of _DAILY_CENTS_CTE: the (off, cents, k, n) daily
    frame — exact integer cents, 0-based day offset, 1-based rank, and
    the day count on every row."""
    ev = t(spark, sf_dir, "events")
    dd = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).alias("dn")
    ).agg((F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents"))
    wall = Window.orderBy("dn").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return dd.select(
        (F.col("dn") - F.min("dn").over(wall)).alias("off"),
        "cents",
        F.row_number().over(Window.orderBy("dn")).alias("k"),
        F.count("*").over(wall).alias("n"),
    )


register(
    "evt_pages_trend_test",
    # Page's L test for an ordered (monotone) alternative across the
    # week: blocks are the 4 complete weeks, treatments the 7 weekday
    # positions, ranks within each block are tie-midranks kept exact by
    # doubling (r2 = 2*rank + eq - 1).  L = sum_j j*R_j is an exact
    # integer (halved at output); E[L] = b*k*(k+1)^2/4 and Var(L) =
    # b*k^2*(k+1)*(k^2-1)/144 close the z-score in one written-order
    # expression.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    wd AS (
      SELECT CAST(FLOOR(off / 7.0) AS BIGINT) AS blk,
             (off % 7) + 1 AS trt, cents
      FROM d WHERE off <= 27
    ),
    rk AS (
      SELECT blk, trt,
             2 * RANK() OVER (PARTITION BY blk ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY blk, cents) - 1 AS r2
      FROM wd
    ),
    lsum AS (
      SELECT CAST(SUM(trt * r2) AS BIGINT) AS l2,
             CAST(COUNT(DISTINCT blk) AS BIGINT) AS b
      FROM rk
    )
    SELECT b AS n_blocks,
           round(CAST(l2 AS DOUBLE) / 2.0, 6) AS l_stat,
           round((CAST(l2 AS DOUBLE) / 2.0 - b * 7.0 * 64.0 / 4.0)
                 / sqrt(b * 49.0 * 8.0 * 48.0 / 144.0), 6) AS z_stat
    FROM lsum
    """,
)


def _dpagestrend(spark, sf_dir):
    """Page's L: the stream reduces to the 28-day (block, treatment)
    frame; midranks come from one bounded 7-row-partition window; the
    statistic is one exact integer aggregate."""
    d = _daily_cents(spark, sf_dir)
    wd = d.filter(F.col("off") <= 27).select(
        F.floor(F.col("off") / F.lit(7.0)).alias("blk"),
        (F.col("off") % 7 + 1).alias("trt"),
        "cents",
    )
    rk = wd.select(
        "blk",
        "trt",
        (
            2 * F.rank().over(Window.partitionBy("blk").orderBy("cents"))
            + F.count("*").over(Window.partitionBy("blk", "cents"))
            - 1
        ).alias("r2"),
    )
    lsum = rk.agg(
        F.sum(F.col("trt") * F.col("r2")).cast("long").alias("l2"),
        F.countDistinct("blk").cast("long").alias("b"),
    )
    l_stat = F.col("l2").cast("double") / 2.0
    return lsum.select(
        F.col("b").alias("n_blocks"),
        F.round(l_stat, 6).alias("l_stat"),
        F.round(
            (l_stat - F.col("b") * 7.0 * 64.0 / 4.0)
            / F.sqrt(F.col("b") * 49.0 * 8.0 * 48.0 / 144.0),
            6,
        ).alias("z_stat"),
    )


CATALOG["evt_pages_trend_test"].fn = _dpagestrend


register(
    "evt_cusum_squares_variance",
    # CUSUM-of-squares variance-changepoint scan: C_k = (sum_{i<=k}
    # x_i^2)/(sum x_i^2) vs the uniform ramp k/n; the break day is the
    # argmax of |C_k - k/n|, kept exact by cross-multiplying HUGEINTs
    # (|n*Q_k - k*QT|) so the argmax is an integer decision; the one
    # division is the output statistic.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    qs AS (
      SELECT k, n,
             SUM(CAST(cents AS HUGEINT) * cents)
               OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS qk,
             SUM(CAST(cents AS HUGEINT) * cents) OVER () AS qt
      FROM d
    ),
    dev AS (
      SELECT k, n, qt, ABS(n * qk - k * qt) AS num FROM qs
    ),
    best AS (
      SELECT CAST(MIN(k) AS BIGINT) AS break_k, MAX(num) AS dnum,
             MAX(n) AS n, MAX(qt) AS qt
      FROM dev WHERE num = (SELECT MAX(num) FROM dev)
    )
    SELECT n AS n_days, break_k,
           round(CAST(dnum AS DOUBLE) / (CAST(n AS DOUBLE) * qt), 6)
             AS cusum_sq_stat
    FROM best
    """,
)


def _dcusumsq(spark, sf_dir):
    """CUSUM of squares: one running HUGEINT sum over the 30-row day
    frame, an exact integer argmax, one closing division."""
    d = _daily_cents(spark, sf_dir).localCheckpoint(eager=False)
    wcum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sq = F.col("cents").cast("decimal(38,0)") * F.col("cents")
    qs = d.select(
        "k",
        "n",
        F.sum(sq).over(wcum).alias("qk"),
        F.sum(sq).over(wall).alias("qt"),
    )
    dev = qs.select(
        "k", "n", "qt", F.abs(F.col("n") * F.col("qk") - F.col("k") * F.col("qt")).alias("num")
    )
    best = dev.join(
        F.broadcast(dev.agg(F.max("num").alias("mx"))), F.col("num") == F.col("mx")
    ).agg(
        F.min("k").cast("long").alias("break_k"),
        F.max("num").alias("dnum"),
        F.max("n").alias("n"),
        F.max("qt").alias("qt"),
    )
    return best.select(
        F.col("n").alias("n_days"),
        "break_k",
        F.round(
            F.col("dnum").cast("double") / (F.col("n").cast("double") * F.col("qt")), 6
        ).alias("cusum_sq_stat"),
    )


CATALOG["evt_cusum_squares_variance"].fn = _dcusumsq


register(
    "evt_pettitt_changepoint",
    # Pettitt rank changepoint: U_k = sum_{i<=k} sum_{j>k}
    # sign(x_j - x_i) over the daily series; K = max|U_k| and its
    # argmax day are exact integer decisions from the bounded
    # day-pair x split grid; the approximate significance
    # p ~= 2*exp(-6K^2/(n^3+n^2)) is the one libm expression, rounded
    # at 6.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    pr AS (
      SELECT a.k AS ik, b.k AS jk,
             CASE WHEN b.cents > a.cents THEN 1
                  WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sg
      FROM d a JOIN d b ON a.k < b.k
    ),
    uk AS (
      SELECT g.k AS splitk,
             CAST(SUM(CASE WHEN pr.ik <= g.k AND pr.jk > g.k THEN pr.sg
                           ELSE 0 END) AS BIGINT) AS u
      FROM (SELECT DISTINCT k FROM d WHERE k < n) g
      CROSS JOIN pr GROUP BY g.k
    ),
    best AS (
      SELECT CAST(MIN(splitk) AS BIGINT) AS tau_k, MAX(ABS(u)) AS kstat
      FROM uk WHERE ABS(u) = (SELECT MAX(ABS(u)) FROM uk)
    ),
    nn AS (SELECT MAX(n) AS n FROM d)
    SELECT nn.n AS n_days, best.tau_k,
           CAST(best.kstat AS BIGINT) AS k_stat,
           round(2.0 * exp(-6.0 * CAST(best.kstat AS DOUBLE) * best.kstat
                           / (CAST(nn.n AS DOUBLE) * nn.n * nn.n
                              + CAST(nn.n AS DOUBLE) * nn.n)), 6) AS p_approx
    FROM best CROSS JOIN nn
    """,
)


def _dpettitt(spark, sf_dir):
    """Pettitt: the day-pair sign frame (435 pairs for a month) crossed
    with the 29 candidate splits — all bounded; the statistic and its
    argmax are exact integers and the p-value approximation is one
    closing expression."""
    d = _daily_cents(spark, sf_dir).localCheckpoint(eager=False)
    a = d.select(F.col("k").alias("ik"), F.col("cents").alias("ac"))
    b = d.select(F.col("k").alias("jk"), F.col("cents").alias("bc"))
    pr = a.join(F.broadcast(b), F.col("ik") < F.col("jk")).select(
        "ik",
        "jk",
        F.when(F.col("bc") > F.col("ac"), 1)
        .when(F.col("bc") < F.col("ac"), -1)
        .otherwise(0)
        .alias("sg"),
    )
    g = d.filter(F.col("k") < F.col("n")).select(F.col("k").alias("splitk")).distinct()
    uk = (
        pr.crossJoin(F.broadcast(g))
        .groupBy("splitk")
        .agg(
            F.sum(
                F.when(
                    (F.col("ik") <= F.col("splitk")) & (F.col("jk") > F.col("splitk")),
                    F.col("sg"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("u")
        )
    )
    best = uk.join(
        F.broadcast(uk.agg(F.max(F.abs(F.col("u"))).alias("mx"))),
        F.abs(F.col("u")) == F.col("mx"),
    ).agg(
        F.min("splitk").cast("long").alias("tau_k"),
        F.max(F.abs(F.col("u"))).alias("kstat"),
    )
    nn = d.agg(F.max("n").alias("n"))
    return best.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_days"),
        "tau_k",
        F.col("kstat").cast("long").alias("k_stat"),
        F.round(
            2.0
            * F.exp(
                -6.0
                * F.col("kstat").cast("double")
                * F.col("kstat")
                / (
                    F.col("n").cast("double") * F.col("n") * F.col("n")
                    + F.col("n").cast("double") * F.col("n")
                )
            ),
            6,
        ).alias("p_approx"),
    )


CATALOG["evt_pettitt_changepoint"].fn = _dpettitt


register(
    "evt_seasonal_theil_sen_slope",
    # Seasonal Theil-Sen slope: pairwise slopes (cents_j - cents_i) /
    # (off_j - off_i) are formed ONLY within the same weekday season
    # (off % 7), pooled, and the median taken — the slope companion to
    # the seasonal Mann-Kendall test.  Each slope is one identical IEEE
    # division of exact integers; the median over the bounded pooled
    # pair frame is an exact selection (average of the two middles for
    # even counts).
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    pr AS (
      SELECT (CAST(b.cents AS DOUBLE) - a.cents) / (b.off - a.off) AS slope
      FROM d a JOIN d b ON a.off < b.off AND (a.off % 7) = (b.off % 7)
    ),
    rk AS (
      SELECT slope,
             ROW_NUMBER() OVER (ORDER BY slope) AS r,
             COUNT(*) OVER () AS m
      FROM pr
    )
    SELECT CAST(MAX(m) AS BIGINT) AS n_pairs,
           round(AVG(slope), 6) AS seasonal_sen_slope
    FROM rk WHERE r IN ((m + 1) // 2, (m + 2) // 2)
    """,
)


def _dseasonalsen(spark, sf_dir):
    """Seasonal Theil-Sen: within-weekday day pairs (bounded by the
    calendar — ~60 pairs a month at any data scale), one sort-free
    median selection via row_number over the pooled pair frame."""
    d = _daily_cents(spark, sf_dir).localCheckpoint(eager=False)
    a = d.select(F.col("off").alias("ao"), F.col("cents").alias("ac"))
    b = d.select(F.col("off").alias("bo"), F.col("cents").alias("bc"))
    pr = a.join(
        F.broadcast(b),
        (F.col("ao") < F.col("bo")) & (F.col("ao") % 7 == F.col("bo") % 7),
    ).select(
        ((F.col("bc").cast("double") - F.col("ac")) / (F.col("bo") - F.col("ao"))).alias(
            "slope"
        )
    )
    wall = Window.orderBy("slope").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rk = pr.select(
        "slope",
        F.row_number().over(Window.orderBy("slope")).alias("r"),
        F.count("*").over(wall).alias("m"),
    )
    sel = rk.filter(
        (F.col("r") == F.floor((F.col("m") + 1) / 2))
        | (F.col("r") == F.floor((F.col("m") + 2) / 2))
    )
    return sel.agg(
        F.max("m").cast("long").alias("n_pairs"),
        F.round(F.avg("slope"), 6).alias("seasonal_sen_slope"),
    )


CATALOG["evt_seasonal_theil_sen_slope"].fn = _dseasonalsen


register(
    "evt_von_neumann_ratio",
    # von Neumann successive-difference ratio on the daily series:
    # VN = sum (x_i - x_{i-1})^2 / sum (x_i - xbar)^2, kept exact by
    # cross-multiplying HUGEINT sums (num*n over n*s2 - s1^2); VN ~ 2
    # under randomness, so the centered value is reported beside it.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    df AS (
      SELECT cents, n,
             cents - LAG(cents) OVER (ORDER BY k) AS stepv
      FROM d
    ),
    agg AS (
      SELECT MAX(n) AS n,
             SUM(CAST(stepv AS HUGEINT) * stepv) AS num,
             SUM(CAST(cents AS HUGEINT) * cents) AS s2,
             SUM(CAST(cents AS HUGEINT)) AS s1
      FROM df
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(CAST(num * n AS DOUBLE) / CAST(n * s2 - s1 * s1 AS DOUBLE), 6)
             AS vn_ratio,
           round(CAST(num * n AS DOUBLE) / CAST(n * s2 - s1 * s1 AS DOUBLE) - 2.0, 6)
             AS vn_centered
    FROM agg
    """,
)


def _dvonneumann(spark, sf_dir):
    """von Neumann ratio: one lag window over the 30-row day frame,
    exact integer numerator and denominator, one closing division."""
    d = _daily_cents(spark, sf_dir)
    df = d.select(
        "cents",
        "n",
        (F.col("cents") - F.lag("cents").over(Window.orderBy("k"))).alias("stepv"),
    )
    agg = df.agg(
        F.max("n").alias("n"),
        F.sum(F.col("stepv").cast("decimal(38,0)") * F.col("stepv")).alias("num"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("s2"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
    )
    vn = (F.col("num") * F.col("n")).cast("double") / (
        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    ).cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(vn, 6).alias("vn_ratio"),
        F.round(vn - 2.0, 6).alias("vn_centered"),
    )


CATALOG["evt_von_neumann_ratio"].fn = _dvonneumann
