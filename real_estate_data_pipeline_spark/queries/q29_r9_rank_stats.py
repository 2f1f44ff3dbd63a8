"""Split from queries.py lines 20863-21209 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# ===========================================================================
# round-9 rank-statistics family: distribution tests without normality
# ===========================================================================

def _tie_cubic(c):
    """Exact x^3 - x for tie corrections: chained decimal(12,0)
    multiplication — 12 is the largest precision whose cube fits
    decimal(38,0) under Spark's (p1+p2+1) product rule — so no count
    cardinality can hit ANSI long multiplication. The DuckDB twin is
    CAST(x AS HUGEINT) * x * x - x. Single-sourced: the anchor is
    load-bearing, one drifted copy would silently reintroduce the
    asymmetric overflow-parity class the round-9 probe caught."""
    d = c.cast("decimal(12,0)")
    return d * d * d - c


# The Mann-Whitney U machinery, single-sourced: both the U test and the
# rank-biserial effect size (round 12) close over the SAME value-domain
# histogram and exact doubled-U aggregate, so the test statistic and its
# effect size can never disagree on the ranking they summarize.
_MW_U_CTES = """
    WITH x AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    vc AS (
      SELECT q,
             CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM x GROUP BY q
    ),
    cw AS (
      SELECT q, n1, n2,
             SUM(n2) OVER (ORDER BY q) - n2 AS cum2_less
      FROM vc
    ),
    agg AS (
      SELECT CAST(SUM(n1) AS BIGINT) AS nr,
             CAST(SUM(n2) AS BIGINT) AS nn,
             CAST(SUM(CAST(n1 AS HUGEINT) * (2 * cum2_less + n2)) AS DOUBLE) AS u2x,
             CAST(SUM(CAST(n1 + n2 AS HUGEINT) * (n1 + n2) * (n1 + n2)
                      - (n1 + n2)) AS DOUBLE) AS tsum
      FROM cw
    )
"""


def _mw_u_agg(spark, sf_dir):
    """Mann-Whitney U via the value-domain histogram: one grouped count
    over the 50-value quantity domain, a running sum over that 50-row
    frame (never over raw rows), one closing aggregate — returns the
    1-row (nr, nn, u2x, tsum) frame both the U test and the
    rank-biserial effect size close over (SQL twin: _MW_U_CTES)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    vc = x.groupBy("q").agg(
        F.sum(F.when(F.col("flag") == "R", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("flag") == "N", 1).otherwise(0)).cast("long").alias("n2"),
    )
    w = Window.orderBy("q")
    cw = vc.withColumn("cum2_less", F.sum("n2").over(w) - F.col("n2"))
    tt = F.col("n1") + F.col("n2")
    return cw.agg(
        F.sum("n1").cast("long").alias("nr"),
        F.sum("n2").cast("long").alias("nn"),
        F.sum(
            F.col("n1").cast("decimal(18,0)")
            * (2 * F.col("cum2_less") + F.col("n2"))
        )
        .cast("double")
        .alias("u2x"),
        F.sum(_tie_cubic(tt)).cast("double").alias("tsum"),
    )


register(
    "ml_mann_whitney_u_quantity",
    # the nonparametric two-sample test: Mann-Whitney U between the
    # returned ('R') and delivered ('N') lineitems' quantities. The
    # value domain is tiny (1..50), so U comes from per-value counts —
    # U = sum_v n1(v)*(cnt2_less(v) + n2(v)/2) — kept integer by
    # doubling (u2x), with the exact tie-corrected variance; every
    # pre-division quantity is an integer, z is one sqrt + division.
    oracle=f"""
    {_MW_U_CTES}
    SELECT nr AS n_r, nn AS n_n,
           u2x / 2.0 AS u_stat,
           nr * CAST(nn AS DOUBLE) / 2.0 AS mu_u,
           round(nr * CAST(nn AS DOUBLE) / 12.0
                 * ((nr + nn + 1)
                    - tsum
                      / ((nr + nn) * (nr + nn - 1.0))), 6) AS var_u,
           round((u2x / 2.0 - nr * CAST(nn AS DOUBLE) / 2.0)
                 / sqrt(nr * CAST(nn AS DOUBLE) / 12.0
                        * ((nr + nn + 1)
                           - tsum
                             / ((nr + nn) * (nr + nn - 1.0)))), 6) AS z
    FROM agg
    """,
)


def _dmannwhitney(spark, sf_dir):
    """Mann-Whitney U test closing over the shared _mw_u_agg frame —
    the rank-sum test at any scale for the cost of a count(*) GROUP BY."""
    agg = _mw_u_agg(spark, sf_dir)
    var_u = (
        F.col("nr")
        * F.col("nn").cast("double")
        / 12.0
        * (
            (F.col("nr") + F.col("nn") + 1)
            - F.col("tsum")
            / ((F.col("nr") + F.col("nn")) * (F.col("nr") + F.col("nn") - 1.0))
        )
    )
    mu_u = F.col("nr") * F.col("nn").cast("double") / 2.0
    return agg.select(
        F.col("nr").alias("n_r"),
        F.col("nn").alias("n_n"),
        (F.col("u2x") / 2.0).alias("u_stat"),
        mu_u.alias("mu_u"),
        F.round(var_u, 6).alias("var_u"),
        F.round((F.col("u2x") / 2.0 - mu_u) / F.sqrt(var_u), 6).alias("z"),
    )


CATALOG["ml_mann_whitney_u_quantity"].fn = _dmannwhitney

register(
    "ml_spearman_qty_discount",
    # tie-corrected Spearman rank correlation between quantity and
    # discount per return flag, exact until ONE final division: avg
    # ranks over the tiny value domains are half-integers (kept doubled
    # as integers), rho via the tie-corrected d^2 identity
    # rho = (12Sx + 12Sy - 3*sum(d2^2)) / (2*sqrt(12Sx*12Sy)) with
    # 12S = (n^3-n) - sum(t^3-t) — every term a BIGINT.
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS dc
      FROM lineitem
    ),
    qv AS (
      SELECT flag, q, CAST(COUNT(*) AS BIGINT) AS cnt,
             2 * (SUM(COUNT(*)) OVER (PARTITION BY flag ORDER BY q) - COUNT(*))
               + COUNT(*) + 1 AS r2
      FROM x GROUP BY flag, q
    ),
    dv AS (
      SELECT flag, dc, CAST(COUNT(*) AS BIGINT) AS cnt,
             2 * (SUM(COUNT(*)) OVER (PARTITION BY flag ORDER BY dc) - COUNT(*))
               + COUNT(*) + 1 AS r2
      FROM x GROUP BY flag, dc
    ),
    tx AS (
      SELECT flag, CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS DOUBLE) AS tq
      FROM qv GROUP BY flag
    ),
    ty AS (
      SELECT flag, CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS DOUBLE) AS td
      FROM dv GROUP BY flag
    ),
    rr AS (
      SELECT x.flag,
             CAST(qv.r2 - dv.r2 AS BIGINT) AS d2
      FROM x
      JOIN qv ON qv.flag = x.flag AND qv.q = x.q
      JOIN dv ON dv.flag = x.flag AND dv.dc = x.dc
    ),
    ag AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(d2 AS HUGEINT) * d2) AS DOUBLE) AS sd2
      FROM rr GROUP BY flag
    )
    SELECT ag.flag AS l_returnflag, ag.n AS n_rows,
           round((((CAST(ag.n AS DOUBLE) * ag.n * ag.n - ag.n) - tx.tq)
                  + ((CAST(ag.n AS DOUBLE) * ag.n * ag.n - ag.n) - ty.td)
                  - 3.0 * ag.sd2)
                 / (2 * sqrt(((CAST(ag.n AS DOUBLE) * ag.n * ag.n - ag.n) - tx.tq)
                             * ((CAST(ag.n AS DOUBLE) * ag.n * ag.n - ag.n) - ty.td))),
                 6) AS rho_spearman
    FROM ag JOIN tx ON tx.flag = ag.flag JOIN ty ON ty.flag = ag.flag
    ORDER BY l_returnflag
    """,
)


def _dspearman(spark, sf_dir):
    """Spearman per group via value-domain rank tables: the doubled
    average ranks live in two tiny per-group histograms (50 quantity
    values, 11 discount cents values) that broadcast back onto the
    rows; the row-level work is one d^2 aggregate. No global window,
    no per-row ranking shuffle."""
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long").alias("dc"),
    ).localCheckpoint(eager=False)

    def _ranks(col):
        w = Window.partitionBy("flag").orderBy(col)
        return (
            x.groupBy("flag", col)
            .agg(F.count("*").cast("long").alias("cnt"))
            .withColumn(
                "r2", 2 * (F.sum("cnt").over(w) - F.col("cnt")) + F.col("cnt") + 1
            )
        )

    qv = _ranks("q").localCheckpoint(eager=False)
    dv = _ranks("dc").localCheckpoint(eager=False)
    _t3 = lambda c: F.sum(_tie_cubic(c)).cast("double")  # noqa: E731
    tx = qv.groupBy("flag").agg(_t3(F.col("cnt")).alias("tq"))
    ty = dv.groupBy("flag").agg(_t3(F.col("cnt")).alias("td"))
    rr = (
        x.join(F.broadcast(qv.select("flag", "q", F.col("r2").alias("rq"))), ["flag", "q"])
        .join(F.broadcast(dv.select("flag", "dc", F.col("r2").alias("rd"))), ["flag", "dc"])
        .select("flag", (F.col("rq") - F.col("rd")).cast("long").alias("d2"))
    )
    ag = rr.groupBy("flag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("d2").cast("decimal(18,0)") * F.col("d2"))
        .cast("double")
        .alias("sd2"),
    )
    n3n = F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    sx = n3n - F.col("tq")
    sy = n3n - F.col("td")
    return (
        ag.join(F.broadcast(tx), "flag")
        .join(F.broadcast(ty), "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("n").alias("n_rows"),
            F.round(
                (sx + sy - 3.0 * F.col("sd2")) / (2 * F.sqrt(sx * sy)), 6
            ).alias("rho_spearman"),
        )
        .orderBy("l_returnflag")
    )


CATALOG["ml_spearman_qty_discount"].fn = _dspearman

register(
    "evt_runs_test_daily",
    # Wald-Wolfowitz runs test for randomness of the daily activity
    # series: each day is "above" iff count*n_days > total (an integer
    # cross-multiplication — no mean division), a run boundary is a
    # lag inequality over the ~365-row daily aggregate, and the
    # z-score against the exact run-count moments flags serial
    # dependence (weekly cycles, ramps) that a mean test misses.
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(c) AS BIGINT) AS total
      FROM daily
    ),
    s AS (
      SELECT day, CASE WHEN c * tot.nd > tot.total THEN 1 ELSE 0 END AS pos
      FROM daily CROSS JOIN tot
    ),
    r AS (
      SELECT pos, LAG(pos) OVER (ORDER BY day) AS prev FROM s
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(pos) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n2,
             CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND prev <> pos
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
      FROM r
    )
    SELECT nd AS n_days, n1 AS n_above, n2 AS n_below, n_runs,
           round(1 + 2.0 * n1 * n2 / nd, 6) AS e_runs,
           round((n_runs - (1 + 2.0 * n1 * n2 / nd))
                 / sqrt(NULLIF(2.0 * n1 * n2 * (2 * n1 * n2 - nd)
                               / (nd * nd * (nd - 1.0)), 0.0)), 6) AS z
    FROM agg
    """,
)


def _drunstest(spark, sf_dir):
    """Runs test on the daily series: the raw stream collapses to one
    day-keyed count aggregate, the sign needs only an integer compare
    against the 1-row total, and the run boundaries come from one lag
    over the bounded daily frame."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("nd"), F.sum("c").cast("long").alias("total")
    )
    s = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        F.when(F.col("c") * F.col("nd") > F.col("total"), 1).otherwise(0).alias("pos"),
    )
    r = s.withColumn("prev", F.lag("pos").over(Window.orderBy("day")))
    agg = r.agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("pos").cast("long").alias("n1"),
        (F.count("*") - F.sum("pos")).cast("long").alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("prev") != F.col("pos")), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("n_runs"),
    )
    e_runs = 1 + 2.0 * F.col("n1") * F.col("n2") / F.col("nd")
    var_r = (
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2 * F.col("n1") * F.col("n2") - F.col("nd"))
        / (F.col("nd") * F.col("nd") * (F.col("nd") - 1.0))
    )
    return agg.select(
        F.col("nd").alias("n_days"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        "n_runs",
        F.round(e_runs, 6).alias("e_runs"),
        F.round(
            (F.col("n_runs") - e_runs) / F.sqrt(F.nullif(var_r, F.lit(0.0))), 6
        ).alias("z"),
    )


CATALOG["evt_runs_test_daily"].fn = _drunstest


