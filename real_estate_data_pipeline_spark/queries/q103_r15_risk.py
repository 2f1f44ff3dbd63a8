"""Round-15 wave 23 (post-close): financial risk analytics on the
daily order-revenue series (the ~2400 calendar-bounded trading days
with orders) — historical VaR + CVaR at 95/99% of the daily
log-returns, annualized Sharpe + Sortino, the Ulcer index + Martin
ratio from running-max drawdowns of the revenue level, the Omega
gain/loss ratio + Kappa-3 downside ratio, and the Kelly fraction with
its full/half growth rates.

Exactness: returns are micro-nat integers (ln of the exact-cent
revenue ratio snapped at 6dp, consecutive PRESENT days — empty
calendar days simply don't trade); VaR is a type-1 order statistic on
the integer return ranks, CVaR an exact integer tail mean; variance /
semivariance / LPM3 ride decimal-38 sums of micro-nat squares/cubes;
drawdowns are nano-quantized rationals of exact cents; sqrt is IEEE,
the cube root goes through the 6dp ln/exp snap (the q25 precedent),
and annualization uses sqrt(252.0) (exact-rounded identically on both
engines).
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# Daily revenue (exact cents) + consecutive-trading-day micro-nat
# log-returns.
_RET_CTE = """d AS (
      SELECT CAST(o_orderdate AS DATE) AS dy,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT dy, rev,
             CAST(floor(round(ln(CAST(rev AS DOUBLE)
                                 / LAG(rev) OVER (ORDER BY dy)), 6)
                        * 1000000 + 0.5) AS BIGINT) AS r6
      FROM d
    ),
    rr AS (SELECT dy, r6 FROM r WHERE r6 IS NOT NULL)"""


def _returns(spark, sf_dir):
    """(day, rev cents, micro-nat return) over trading days."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("dy")).agg(
        F.sum((F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("rev")
    )
    w = Window.orderBy("dy")
    r = d.select(
        "dy",
        "rev",
        F.floor(
            F.round(
                F.log(F.col("rev").cast("double") / F.lag("rev").over(w)), 6
            )
            * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r6"),
    )
    return r.localCheckpoint(eager=False)


register(
    "orders_var_cvar_daily",
    # Historical VaR and CVaR (expected shortfall) at the 95% and 99%
    # levels of the daily revenue log-returns: the type-1 order
    # statistic at rank ceil(alpha n) (day tie-break) and the exact
    # integer mean of the tail at or below it, both reported as
    # positive losses.
    oracle=f"""
    WITH {_RET_CTE},
    rk AS (
      SELECT r6, ROW_NUMBER() OVER (ORDER BY r6, dy) AS rn FROM rr
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rr),
    ls(lvl) AS (VALUES (95), (99)),
    cuts AS (
      SELECT ls.lvl, ((100 - ls.lvl) * n.n + 99) // 100 AS k, n.n
      FROM ls CROSS JOIN n
    ),
    tail AS (
      SELECT cuts.lvl, cuts.k, cuts.n,
             CAST(MAX(rk.r6) AS BIGINT) AS vcut,
             CAST(SUM(rk.r6) AS BIGINT) AS tsum
      FROM cuts JOIN rk ON rk.rn <= cuts.k
      GROUP BY cuts.lvl, cuts.k, cuts.n
    )
    SELECT lvl AS level_pct, n AS n_returns, k AS n_tail,
           round(-vcut / 1e6, 6) AS var_logret,
           round(-CAST(tsum AS DOUBLE) / k / 1e6, 9) AS cvar_logret
    FROM tail ORDER BY lvl
    """,
)


def _dvarcvar(spark, sf_dir):
    """Type-1 VaR + exact tail-mean CVaR at 95/99%."""
    rr = _returns(spark, sf_dir).filter(F.col("r6").isNotNull())
    rk = rr.select(
        "r6", F.row_number().over(Window.orderBy("r6", "dy")).alias("rn")
    ).localCheckpoint(eager=False)
    n = rr.agg(F.count("*").cast("long").alias("n"))
    ls = spark.createDataFrame([(95,), (99,)], "lvl long")
    cuts = ls.crossJoin(F.broadcast(n)).select(
        "lvl", F.expr("((100 - lvl) * n + 99) div 100").alias("k"), "n"
    )
    tail = (
        rk.crossJoin(F.broadcast(cuts))
        .filter(F.col("rn") <= F.col("k"))
        .groupBy("lvl", "k", "n")
        .agg(
            F.max("r6").cast("long").alias("vcut"),
            F.sum("r6").cast("long").alias("tsum"),
        )
    )
    return tail.select(
        F.col("lvl").alias("level_pct"),
        F.col("n").alias("n_returns"),
        F.col("k").alias("n_tail"),
        F.round(-F.col("vcut") / F.lit(1e6), 6).alias("var_logret"),
        F.round(-F.col("tsum").cast("double") / F.col("k") / F.lit(1e6), 9).alias(
            "cvar_logret"
        ),
    ).orderBy("level_pct")


CATALOG["orders_var_cvar_daily"].fn = _dvarcvar


register(
    "orders_sharpe_sortino_daily",
    # Annualized Sharpe and Sortino of the daily log-returns: exact
    # micro-nat moments (mean, sample stddev via the cleared rational,
    # downside semideviation from the decimal-38 sum of negative-
    # return squares), annualized by sqrt(252.0).
    oracle=f"""
    WITH {_RET_CTE},
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r6) AS BIGINT) AS s,
             CAST(SUM(CAST(r6 AS HUGEINT) * r6) AS HUGEINT) AS s2,
             CAST(SUM(CASE WHEN r6 < 0 THEN CAST(r6 AS HUGEINT) * r6
                           ELSE 0 END) AS HUGEINT) AS sd2
      FROM rr
    )
    SELECT n AS n_returns,
           round(CAST(s AS DOUBLE) / n / 1e6, 9) AS mean_daily,
           round(sqrt(CAST(n * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (n - 1))) / 1e6, 9) AS sd_daily,
           round(sqrt(CAST(sd2 AS DOUBLE) / n) / 1e6, 9) AS downside_daily,
           round((CAST(s AS DOUBLE) / n)
                 / sqrt(CAST(n * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                        / (CAST(n AS DOUBLE) * (n - 1)))
                 * sqrt(252.0), 6) AS sharpe_annual,
           round((CAST(s AS DOUBLE) / n) / sqrt(CAST(sd2 AS DOUBLE) / n)
                 * sqrt(252.0), 6) AS sortino_annual
    FROM m
    """,
)


def _dsharpe(spark, sf_dir):
    """Sharpe/Sortino from exact micro-nat moments."""
    d38 = "decimal(38,0)"
    rr = _returns(spark, sf_dir).filter(F.col("r6").isNotNull())
    m = rr.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r6").cast("long").alias("s"),
        F.sum(F.col("r6").cast(d38) * F.col("r6")).alias("s2"),
        F.sum(
            F.when(F.col("r6") < 0, F.col("r6").cast(d38) * F.col("r6")).otherwise(
                F.lit(0).cast(d38)
            )
        ).alias("sd2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s").cast(d38) * F.col("s")).cast("double")
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    dd = F.sqrt(F.col("sd2").cast("double") / F.col("n"))
    ann = F.sqrt(F.lit(252.0))
    return m.select(
        F.col("n").alias("n_returns"),
        F.round(mean / 1e6, 9).alias("mean_daily"),
        F.round(sd / 1e6, 9).alias("sd_daily"),
        F.round(dd / 1e6, 9).alias("downside_daily"),
        F.round(mean / sd * ann, 6).alias("sharpe_annual"),
        F.round(mean / dd * ann, 6).alias("sortino_annual"),
    )


CATALOG["orders_sharpe_sortino_daily"].fn = _dsharpe


register(
    "orders_ulcer_martin_daily",
    # Ulcer index of the daily revenue level: per-day drawdown from
    # the running maximum as a nano-quantized exact-cent rational,
    # UI = sqrt(mean dd^2), Martin (UPI) = mean daily log-return /
    # UI — the pain-adjusted performance gauge that penalizes DEPTH
    # and DURATION of slumps, not just variance.
    oracle=f"""
    WITH {_RET_CTE},
    eq AS (
      SELECT dy, rev, CAST(MAX(rev) OVER (ORDER BY dy) AS BIGINT) AS peak
      FROM d
    ),
    dd AS (
      SELECT CAST(floor(CAST(peak - rev AS DOUBLE) / peak * 1e9 + 0.5)
               AS BIGINT) AS d9
      FROM eq
    ),
    u AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(d9 AS HUGEINT) * d9) AS HUGEINT) AS sq,
             CAST(SUM(CASE WHEN d9 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_underwater
      FROM dd
    ),
    mr AS (
      SELECT CAST(SUM(r6) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS k
      FROM rr
    )
    SELECT u.n AS n_days, u.n_underwater,
           round(sqrt(CAST(u.sq AS DOUBLE) / u.n) / 1e9, 9) AS ulcer_index,
           round((CAST(mr.s AS DOUBLE) / mr.k / 1e6)
                 / (sqrt(CAST(u.sq AS DOUBLE) / u.n) / 1e9), 6)
             AS martin_ratio
    FROM u CROSS JOIN mr
    """,
)


def _dulcer(spark, sf_dir):
    """Ulcer index + Martin ratio off nano-quantized drawdowns."""
    d38 = "decimal(38,0)"
    r = _returns(spark, sf_dir)
    eq = r.select(
        "dy",
        "rev",
        F.max("rev")
        .over(
            Window.orderBy("dy").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long")
        .alias("peak"),
    )
    dd = eq.select(
        F.floor(
            (F.col("peak") - F.col("rev")).cast("double") / F.col("peak")
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("d9")
    )
    u = dd.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("d9").cast(d38) * F.col("d9")).alias("sq"),
        F.sum(F.when(F.col("d9") > 0, 1).otherwise(0)).cast("long").alias(
            "n_underwater"
        ),
    )
    mr = r.filter(F.col("r6").isNotNull()).agg(
        F.sum("r6").cast("long").alias("s"), F.count("*").cast("long").alias("k")
    )
    ui = F.sqrt(F.col("sq").cast("double") / F.col("n")) / F.lit(1e9)
    return u.crossJoin(F.broadcast(mr)).select(
        F.col("n").alias("n_days"),
        "n_underwater",
        F.round(ui, 9).alias("ulcer_index"),
        F.round(
            (F.col("s").cast("double") / F.col("k") / F.lit(1e6)) / ui, 6
        ).alias("martin_ratio"),
    )


CATALOG["orders_ulcer_martin_daily"].fn = _dulcer


register(
    "orders_omega_kappa_daily",
    # Omega ratio at threshold 0 (exact integer gain/loss micro-nat
    # masses) and Kappa-3 (mean over the cube root of the third lower
    # partial moment; the cube root via the 6dp ln/exp snap) — the
    # downside-risk family beyond variance.
    oracle=f"""
    WITH {_RET_CTE},
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN r6 > 0 THEN r6 ELSE 0 END) AS BIGINT) AS g,
             CAST(SUM(CASE WHEN r6 < 0 THEN -r6 ELSE 0 END) AS BIGINT) AS l,
             CAST(SUM(CASE WHEN r6 < 0
                           THEN CAST(-r6 AS HUGEINT) * (-r6) * (-r6)
                           ELSE 0 END) AS HUGEINT) AS c3,
             CAST(SUM(r6) AS BIGINT) AS s
      FROM rr
    )
    SELECT n AS n_returns,
           round(CAST(g AS DOUBLE) / 1e6, 6) AS gain_mass,
           round(CAST(l AS DOUBLE) / 1e6, 6) AS loss_mass,
           round(CAST(g AS DOUBLE) / l, 9) AS omega_ratio,
           round((CAST(s AS DOUBLE) / n / 1e6)
                 / exp(round(ln(CAST(c3 AS DOUBLE) / n / 1e18), 6) / 3), 6)
             AS kappa_3
    FROM m
    """,
)


def _domega(spark, sf_dir):
    """Omega + Kappa-3 from exact micro-nat masses."""
    d38 = "decimal(38,0)"
    rr = _returns(spark, sf_dir).filter(F.col("r6").isNotNull())
    neg = -F.col("r6")
    m = rr.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("r6") > 0, F.col("r6")).otherwise(0))
        .cast("long")
        .alias("g"),
        F.sum(F.when(F.col("r6") < 0, neg).otherwise(0)).cast("long").alias("l"),
        F.sum(
            F.when(F.col("r6") < 0, neg.cast(d38) * neg * neg).otherwise(
                F.lit(0).cast(d38)
            )
        ).alias("c3"),
        F.sum("r6").cast("long").alias("s"),
    )
    lpm3 = F.col("c3").cast("double") / F.col("n") / F.lit(1e18)
    return m.select(
        F.col("n").alias("n_returns"),
        F.round(F.col("g").cast("double") / F.lit(1e6), 6).alias("gain_mass"),
        F.round(F.col("l").cast("double") / F.lit(1e6), 6).alias("loss_mass"),
        F.round(F.col("g").cast("double") / F.col("l"), 9).alias("omega_ratio"),
        F.round(
            (F.col("s").cast("double") / F.col("n") / F.lit(1e6))
            / F.exp(F.round(F.log(lpm3), 6) / 3),
            6,
        ).alias("kappa_3"),
    )


CATALOG["orders_omega_kappa_daily"].fn = _domega


register(
    "orders_kelly_growth_daily",
    # The Kelly fraction f* = mu/sigma^2 of the daily log-returns
    # (exact micro-nat moments, population variance) with the expected
    # growth rate g(f) = f mu - f^2 sigma^2 / 2 at full and half
    # Kelly, annualized x252 — the bet-sizing readout of the revenue
    # stream's drift/noise balance.
    oracle=f"""
    WITH {_RET_CTE},
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r6) AS BIGINT) AS s,
             CAST(SUM(CAST(r6 AS HUGEINT) * r6) AS HUGEINT) AS s2
      FROM rr
    ),
    p AS (
      SELECT n, CAST(s AS DOUBLE) / n / 1e6 AS mu,
             CAST(n * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
             / (CAST(n AS DOUBLE) * n) / 1e12 AS v
      FROM m
    )
    SELECT n AS n_returns, round(mu, 9) AS mu_daily,
           round(v, 9) AS var_daily,
           round(mu / v, 6) AS kelly_fraction,
           round(((mu / v) * mu - (mu / v) * (mu / v) * v / 2) * 252, 6)
             AS growth_full_kelly_annual,
           round(((mu / v / 2) * mu - (mu / v / 2) * (mu / v / 2) * v / 2)
                 * 252, 6) AS growth_half_kelly_annual
    FROM p
    """,
)


def _dkelly(spark, sf_dir):
    """Kelly fraction + growth at full/half Kelly."""
    d38 = "decimal(38,0)"
    rr = _returns(spark, sf_dir).filter(F.col("r6").isNotNull())
    m = rr.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r6").cast("long").alias("s"),
        F.sum(F.col("r6").cast(d38) * F.col("r6")).alias("s2"),
    )
    mu = F.col("s").cast("double") / F.col("n") / F.lit(1e6)
    v = (
        (F.col("n") * F.col("s2") - F.col("s").cast(d38) * F.col("s")).cast("double")
        / (F.col("n").cast("double") * F.col("n"))
        / F.lit(1e12)
    )
    f = mu / v
    return m.select(
        F.col("n").alias("n_returns"),
        F.round(mu, 9).alias("mu_daily"),
        F.round(v, 9).alias("var_daily"),
        F.round(f, 6).alias("kelly_fraction"),
        F.round((f * mu - f * f * v / 2) * 252, 6).alias(
            "growth_full_kelly_annual"
        ),
        F.round(((f / 2) * mu - (f / 2) * (f / 2) * v / 2) * 252, 6).alias(
            "growth_half_kelly_annual"
        ),
    )


CATALOG["orders_kelly_growth_daily"].fn = _dkelly
