"""Round-15 wave 19 (post-close): dependence + copula measures — the
empirical copula of per-customer (account balance, order revenue) on
the 5x5 quantile grid, upper/lower tail-dependence coefficients at the
90th/95th percentiles, Blomqvist's beta (median-quadrant correlation),
Hoeffding's D on the 30-day (event count, value mass) pairs via the
exact integer D1/D2/D3 sums, and Chatterjee's xi (the 2020 rank
correlation that detects ANY functional dependence) on the same daily
pairs.

Exactness: all quantile thresholds are type-1 integer order statistics
(min value whose cumulative count reaches ceil(q n)) or the exact
doubled median (2*quantile_cont of integers is exact, the Woolf/MH
precedent); every copula / tail / quadrant number is a pure integer
ratio; Hoeffding's D and Chatterjee's xi use day-index tie-breaks so
ranks are exact permutations and both statistics are integer rationals
until one closing division.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# Per-customer (acctbal cents, order revenue cents) — customers with
# at least one order.
_CUST_XY_CTE = """xy AS MATERIALIZED (
      SELECT CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y,
             c.c_custkey AS ck
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM xy)"""


def _cust_xy(spark, sf_dir):
    """(x=acctbal cents, y=revenue cents, ck) per ordering customer."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(
            F.broadcast(
                c.select(
                    "c_custkey",
                    (F.col("c_acctbal").cast(DEC) * 100).cast("long").alias("x"),
                )
            ),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "x")
        .agg(
            F.sum((F.col("o_totalprice").cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .select(F.col("c_custkey").alias("ck"), "x", "y")
        .localCheckpoint(eager=False)
    )


register(
    "ml_empirical_copula_grid",
    # The empirical copula C(u, v) of (acctbal, revenue) on the 5x5
    # grid u, v in {0.2,...,1.0}: thresholds are the type-7 quantiles
    # snapped to integer cents (floor(q+0.5), the wave-9 GPD
    # precedent — a percentile AGGREGATE, never a global rank sort,
    # so the plan scales), C is a pure integer ratio against the
    # snapped cuts, and the independence gap C - u v is the
    # dependence fingerprint.
    oracle=f"""
    WITH {_CUST_XY_CTE},
    ks(k) AS (VALUES (1), (2), (3), (4), (5)),
    qa AS (
      SELECT CAST(floor(quantile_cont(x, 0.2) + 0.5) AS BIGINT) AS xq1,
             CAST(floor(quantile_cont(x, 0.4) + 0.5) AS BIGINT) AS xq2,
             CAST(floor(quantile_cont(x, 0.6) + 0.5) AS BIGINT) AS xq3,
             CAST(floor(quantile_cont(x, 0.8) + 0.5) AS BIGINT) AS xq4,
             CAST(floor(quantile_cont(x, 1.0) + 0.5) AS BIGINT) AS xq5,
             CAST(floor(quantile_cont(y, 0.2) + 0.5) AS BIGINT) AS yq1,
             CAST(floor(quantile_cont(y, 0.4) + 0.5) AS BIGINT) AS yq2,
             CAST(floor(quantile_cont(y, 0.6) + 0.5) AS BIGINT) AS yq3,
             CAST(floor(quantile_cont(y, 0.8) + 0.5) AS BIGINT) AS yq4,
             CAST(floor(quantile_cont(y, 1.0) + 0.5) AS BIGINT) AS yq5
      FROM xy
    ),
    qx AS (
      SELECT ks.k,
             CASE ks.k WHEN 1 THEN xq1 WHEN 2 THEN xq2 WHEN 3 THEN xq3
                       WHEN 4 THEN xq4 ELSE xq5 END AS xq
      FROM ks CROSS JOIN qa
    ),
    qy AS (
      SELECT ks.k,
             CASE ks.k WHEN 1 THEN yq1 WHEN 2 THEN yq2 WHEN 3 THEN yq3
                       WHEN 4 THEN yq4 ELSE yq5 END AS yq
      FROM ks CROSS JOIN qa
    ),
    grid AS (
      SELECT qx.k AS ku, qy.k AS kv, qx.xq, qy.yq FROM qx CROSS JOIN qy
    ),
    cnt AS (
      SELECT grid.ku, grid.kv,
             CAST(SUM(CASE WHEN xy.x <= grid.xq AND xy.y <= grid.yq
                           THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM grid CROSS JOIN xy GROUP BY 1, 2
    )
    SELECT round(ku / 5.0, 1) AS u, round(kv / 5.0, 1) AS v,
           c AS n_joint,
           round(CAST(c AS DOUBLE) / n.n, 9) AS copula,
           round(CAST(c AS DOUBLE) / n.n - (ku / 5.0) * (kv / 5.0), 9)
             AS independence_gap
    FROM cnt CROSS JOIN n ORDER BY u, v
    """,
)


def _dcopulagrid(spark, sf_dir):
    """Empirical copula on the 5x5 type-1 quantile grid."""
    xy = _cust_xy(spark, sf_dir)
    n = xy.agg(F.count("*").cast("long").alias("n"))
    qagg = xy.agg(
        *[
            F.floor(F.percentile("x", k / 5.0) + 0.5).cast("long").alias(f"xq{k}")
            for k in range(1, 6)
        ],
        *[
            F.floor(F.percentile("y", k / 5.0) + 0.5).cast("long").alias(f"yq{k}")
            for k in range(1, 6)
        ],
    ).localCheckpoint(eager=False)
    ks = spark.createDataFrame([(k,) for k in range(1, 6)], "k long")
    qx = ks.crossJoin(F.broadcast(qagg)).select(
        F.col("k").alias("ku"),
        F.when(F.col("k") == 1, F.col("xq1"))
        .when(F.col("k") == 2, F.col("xq2"))
        .when(F.col("k") == 3, F.col("xq3"))
        .when(F.col("k") == 4, F.col("xq4"))
        .otherwise(F.col("xq5"))
        .alias("xq"),
    )
    qy = ks.crossJoin(F.broadcast(qagg)).select(
        F.col("k").alias("kv"),
        F.when(F.col("k") == 1, F.col("yq1"))
        .when(F.col("k") == 2, F.col("yq2"))
        .when(F.col("k") == 3, F.col("yq3"))
        .when(F.col("k") == 4, F.col("yq4"))
        .otherwise(F.col("yq5"))
        .alias("yq"),
    )
    grid = qx.crossJoin(F.broadcast(qy))
    cnt = (
        xy.crossJoin(F.broadcast(grid))
        .groupBy("ku", "kv")
        .agg(
            F.sum(
                F.when(
                    (F.col("x") <= F.col("xq")) & (F.col("y") <= F.col("yq")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("c")
        )
    )
    return (
        cnt.crossJoin(F.broadcast(n))
        .select(
            F.round(F.col("ku") / F.lit(5.0), 1).alias("u"),
            F.round(F.col("kv") / F.lit(5.0), 1).alias("v"),
            F.col("c").alias("n_joint"),
            F.round(F.col("c").cast("double") / F.col("n"), 9).alias("copula"),
            F.round(
                F.col("c").cast("double") / F.col("n")
                - (F.col("ku") / F.lit(5.0)) * (F.col("kv") / F.lit(5.0)),
                9,
            ).alias("independence_gap"),
        )
        .orderBy("u", "v")
    )


CATALOG["ml_empirical_copula_grid"].fn = _dcopulagrid


register(
    "ml_tail_dependence_customer",
    # Empirical tail-dependence coefficients of (acctbal, revenue) at
    # q = 0.90 / 0.95: lambda_U = P(Y > y_q | X > x_q) and lambda_L =
    # P(Y <= y_{1-q} | X <= x_{1-q}) — the joint-extremes gauges a
    # copula fit starts from.  Snapped type-7 percentile thresholds
    # (aggregate, never a global rank sort), pure integer conditional
    # ratios.
    oracle=f"""
    WITH {_CUST_XY_CTE},
    qs(q100) AS (VALUES (90), (95)),
    qa AS (
      SELECT CAST(floor(quantile_cont(x, 0.90) + 0.5) AS BIGINT) AS xu90,
             CAST(floor(quantile_cont(y, 0.90) + 0.5) AS BIGINT) AS yu90,
             CAST(floor(quantile_cont(x, 0.10) + 0.5) AS BIGINT) AS xl90,
             CAST(floor(quantile_cont(y, 0.10) + 0.5) AS BIGINT) AS yl90,
             CAST(floor(quantile_cont(x, 0.95) + 0.5) AS BIGINT) AS xu95,
             CAST(floor(quantile_cont(y, 0.95) + 0.5) AS BIGINT) AS yu95,
             CAST(floor(quantile_cont(x, 0.05) + 0.5) AS BIGINT) AS xl95,
             CAST(floor(quantile_cont(y, 0.05) + 0.5) AS BIGINT) AS yl95
      FROM xy
    ),
    th AS (
      SELECT qs.q100,
             CASE qs.q100 WHEN 90 THEN xu90 ELSE xu95 END AS xu,
             CASE qs.q100 WHEN 90 THEN yu90 ELSE yu95 END AS yu,
             CASE qs.q100 WHEN 90 THEN xl90 ELSE xl95 END AS xl,
             CASE qs.q100 WHEN 90 THEN yl90 ELSE yl95 END AS yl
      FROM qs CROSS JOIN qa
    ),
    cnt AS (
      SELECT th.q100,
             CAST(SUM(CASE WHEN x > xu THEN 1 ELSE 0 END) AS BIGINT) AS nxu,
             CAST(SUM(CASE WHEN x > xu AND y > yu THEN 1 ELSE 0 END) AS BIGINT)
               AS nuu,
             CAST(SUM(CASE WHEN x <= xl THEN 1 ELSE 0 END) AS BIGINT) AS nxl,
             CAST(SUM(CASE WHEN x <= xl AND y <= yl THEN 1 ELSE 0 END)
               AS BIGINT) AS nll
      FROM th CROSS JOIN xy GROUP BY th.q100
    )
    SELECT round(q100 / 100.0, 2) AS q,
           nxu AS n_x_upper, nuu AS n_joint_upper,
           round(CAST(nuu AS DOUBLE) / NULLIF(nxu, 0), 9) AS lambda_upper,
           nxl AS n_x_lower, nll AS n_joint_lower,
           round(CAST(nll AS DOUBLE) / NULLIF(nxl, 0), 9) AS lambda_lower
    FROM cnt ORDER BY q
    """,
)


def _dtaildep(spark, sf_dir):
    """Upper/lower tail dependence at the 90th/95th percentiles."""
    xy = _cust_xy(spark, sf_dir)
    snap = lambda c, q: F.floor(F.percentile(c, q) + 0.5).cast("long")  # noqa: E731
    qagg = xy.agg(
        snap("x", 0.90).alias("xu90"),
        snap("y", 0.90).alias("yu90"),
        snap("x", 0.10).alias("xl90"),
        snap("y", 0.10).alias("yl90"),
        snap("x", 0.95).alias("xu95"),
        snap("y", 0.95).alias("yu95"),
        snap("x", 0.05).alias("xl95"),
        snap("y", 0.05).alias("yl95"),
    )
    qs = spark.createDataFrame([(90,), (95,)], "q100 long")
    th = qs.crossJoin(F.broadcast(qagg)).select(
        "q100",
        F.when(F.col("q100") == 90, F.col("xu90")).otherwise(F.col("xu95")).alias("xu"),
        F.when(F.col("q100") == 90, F.col("yu90")).otherwise(F.col("yu95")).alias("yu"),
        F.when(F.col("q100") == 90, F.col("xl90")).otherwise(F.col("xl95")).alias("xl"),
        F.when(F.col("q100") == 90, F.col("yl90")).otherwise(F.col("yl95")).alias("yl"),
    )
    cnt = (
        xy.crossJoin(F.broadcast(th))
        .groupBy("q100")
        .agg(
            F.sum(F.when(F.col("x") > F.col("xu"), 1).otherwise(0))
            .cast("long")
            .alias("nxu"),
            F.sum(
                F.when((F.col("x") > F.col("xu")) & (F.col("y") > F.col("yu")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("nuu"),
            F.sum(F.when(F.col("x") <= F.col("xl"), 1).otherwise(0))
            .cast("long")
            .alias("nxl"),
            F.sum(
                F.when(
                    (F.col("x") <= F.col("xl")) & (F.col("y") <= F.col("yl")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("nll"),
        )
    )
    return cnt.select(
        F.round(F.col("q100") / F.lit(100.0), 2).alias("q"),
        F.col("nxu").alias("n_x_upper"),
        F.col("nuu").alias("n_joint_upper"),
        F.round(
            F.col("nuu").cast("double") / F.nullif(F.col("nxu"), F.lit(0)), 9
        ).alias("lambda_upper"),
        F.col("nxl").alias("n_x_lower"),
        F.col("nll").alias("n_joint_lower"),
        F.round(
            F.col("nll").cast("double") / F.nullif(F.col("nxl"), F.lit(0)), 9
        ).alias("lambda_lower"),
    ).orderBy("q")


CATALOG["ml_tail_dependence_customer"].fn = _dtaildep


register(
    "ml_blomqvist_beta_customer",
    # Blomqvist's beta (the median-quadrant correlation) of (acctbal,
    # revenue): beta = (n_agree - n_disagree) / n with quadrants cut
    # at the exact doubled medians (2*quantile_cont of integers is
    # exact — the Woolf/MH precedent; "low" = 2v <= m2).  The
    # cheapest-possible dependence screen: one scalar broadcast, one
    # conditional count.
    oracle=f"""
    WITH {_CUST_XY_CTE},
    med AS (
      SELECT CAST(2 * quantile_cont(x, 0.5) AS BIGINT) AS mx2,
             CAST(2 * quantile_cont(y, 0.5) AS BIGINT) AS my2
      FROM xy
    ),
    q AS (
      SELECT
        CAST(SUM(CASE WHEN 2 * x > mx2 AND 2 * y > my2 THEN 1 ELSE 0 END)
          AS BIGINT) AS n11,
        CAST(SUM(CASE WHEN 2 * x <= mx2 AND 2 * y <= my2 THEN 1 ELSE 0 END)
          AS BIGINT) AS n00,
        CAST(SUM(CASE WHEN 2 * x > mx2 AND 2 * y <= my2 THEN 1 ELSE 0 END)
          AS BIGINT) AS n10,
        CAST(SUM(CASE WHEN 2 * x <= mx2 AND 2 * y > my2 THEN 1 ELSE 0 END)
          AS BIGINT) AS n01
      FROM xy CROSS JOIN med
    )
    SELECT n11, n00, n10, n01,
           round(CAST(n11 + n00 - n10 - n01 AS DOUBLE)
                 / (n11 + n00 + n10 + n01), 9) AS blomqvist_beta
    FROM q
    """,
)


def _dblomqvist(spark, sf_dir):
    """Median-quadrant correlation via exact doubled medians."""
    xy = _cust_xy(spark, sf_dir)
    med = xy.agg(
        (2 * F.percentile("x", 0.5)).cast("long").alias("mx2"),
        (2 * F.percentile("y", 0.5)).cast("long").alias("my2"),
    )
    hx = 2 * F.col("x") > F.col("mx2")
    lx = 2 * F.col("x") <= F.col("mx2")
    hy = 2 * F.col("y") > F.col("my2")
    ly = 2 * F.col("y") <= F.col("my2")
    q = xy.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when(hx & hy, 1).otherwise(0)).cast("long").alias("n11"),
        F.sum(F.when(lx & ly, 1).otherwise(0)).cast("long").alias("n00"),
        F.sum(F.when(hx & ly, 1).otherwise(0)).cast("long").alias("n10"),
        F.sum(F.when(lx & hy, 1).otherwise(0)).cast("long").alias("n01"),
    )
    return q.select(
        "n11",
        "n00",
        "n10",
        "n01",
        F.round(
            (F.col("n11") + F.col("n00") - F.col("n10") - F.col("n01")).cast(
                "double"
            )
            / (F.col("n11") + F.col("n00") + F.col("n10") + F.col("n01")),
            9,
        ).alias("blomqvist_beta"),
    )


CATALOG["ml_blomqvist_beta_customer"].fn = _dblomqvist


# The 30-day (event count, value mass) pairs with day-index tie-broken
# ranks — exact permutations, so the classical rank statistics apply.
_DAILY_RANKS_CTE = """d AS (
      SELECT date_trunc('day', ts) AS dy,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    rk AS (
      SELECT dy,
             CAST(ROW_NUMBER() OVER (ORDER BY x, dy) AS BIGINT) AS r,
             CAST(ROW_NUMBER() OVER (ORDER BY y, dy) AS BIGINT) AS s
      FROM d
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rk)"""


def _daily_ranks(spark, sf_dir):
    """(day, rank-of-count, rank-of-value-mass) with day tie-breaks."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("dy")).agg(
        F.count("*").cast("long").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y"),
    )
    return d.select(
        "dy",
        F.row_number().over(Window.orderBy("x", "dy")).cast("long").alias("r"),
        F.row_number().over(Window.orderBy("y", "dy")).cast("long").alias("s"),
    ).localCheckpoint(eager=False)


register(
    "ml_hoeffding_d_daily",
    # Hoeffding's D between daily event count and daily value mass via
    # the exact integer machinery: bivariate ranks Q_i = #{j: R_j <
    # R_i, S_j < S_i} + 1 from a bounded 30x30 self-join, then D1 =
    # sum (Q-1)(Q-2), D2 = sum (R-1)(R-2)(S-1)(S-2), D3 = sum
    # (R-2)(S-2)(Q-1) and D = 30 ((n-2)(n-3) D1 + D2 - 2(n-2) D3)
    # / (n(n-1)(n-2)(n-3)(n-4)) — an integer rational, one closing
    # division.  Day-index tie-breaks make the ranks exact
    # permutations (the documented convention).
    oracle=f"""
    WITH {_DAILY_RANKS_CTE},
    q AS (
      SELECT a.r, a.s,
             CAST(1 + COALESCE(SUM(CASE WHEN b.r < a.r AND b.s < a.s
                                        THEN 1 END), 0) AS BIGINT) AS qi
      FROM rk a LEFT JOIN rk b ON b.dy <> a.dy
      GROUP BY a.dy, a.r, a.s
    ),
    sums AS (
      SELECT CAST(SUM((qi - 1) * (qi - 2)) AS BIGINT) AS d1,
             CAST(SUM((r - 1) * (r - 2) * (s - 1) * (s - 2)) AS BIGINT) AS d2,
             CAST(SUM((r - 2) * (s - 2) * (qi - 1)) AS BIGINT) AS d3
      FROM q
    )
    SELECT nn.n AS n_days, sums.d1, sums.d2, sums.d3,
           round(30.0 * ((nn.n - 2) * (nn.n - 3) * sums.d1 + sums.d2
                         - 2 * (nn.n - 2) * sums.d3)
                 / (CAST(nn.n AS DOUBLE) * (nn.n - 1) * (nn.n - 2)
                    * (nn.n - 3) * (nn.n - 4)), 9) AS hoeffding_d
    FROM sums CROSS JOIN nn
    """,
)


def _dhoeffding(spark, sf_dir):
    """Hoeffding's D off the exact integer D1/D2/D3 sums."""
    rk = _daily_ranks(spark, sf_dir)
    b = rk.select(
        F.col("dy").alias("dy2"), F.col("r").alias("rb"), F.col("s").alias("sb")
    )
    q = (
        rk.join(b, F.col("dy2") != F.col("dy"), "left")
        .groupBy("dy", "r", "s")
        .agg(
            (
                1
                + F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("rb") < F.col("r")) & (F.col("sb") < F.col("s")),
                            1,
                        )
                    ),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("qi")
        )
    )
    sums = q.agg(
        F.sum((F.col("qi") - 1) * (F.col("qi") - 2)).cast("long").alias("d1"),
        F.sum(
            (F.col("r") - 1) * (F.col("r") - 2) * (F.col("s") - 1) * (F.col("s") - 2)
        )
        .cast("long")
        .alias("d2"),
        F.sum((F.col("r") - 2) * (F.col("s") - 2) * (F.col("qi") - 1))
        .cast("long")
        .alias("d3"),
    )
    nn = rk.agg(F.count("*").cast("long").alias("n"))
    out = sums.crossJoin(F.broadcast(nn))
    n = F.col("n")
    num = 30.0 * (
        (n - 2) * (n - 3) * F.col("d1") + F.col("d2") - 2 * (n - 2) * F.col("d3")
    )
    den = n.cast("double") * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    return out.select(
        n.alias("n_days"),
        "d1",
        "d2",
        "d3",
        F.round(num / den, 9).alias("hoeffding_d"),
    )


CATALOG["ml_hoeffding_d_daily"].fn = _dhoeffding


register(
    "ml_chatterjee_xi_daily",
    # Chatterjee's xi between daily event count and daily value mass:
    # sort days by count (day tie-break), take the ranks of value mass
    # along that order, xi = 1 - 3 sum |S_(i+1) - S_(i)| / (n^2 - 1)
    # — the modern rank correlation that converges to 0 iff
    # independent and 1 iff Y is a measurable function of X.  Pure
    # integer sum, one closing division.
    oracle=f"""
    WITH {_DAILY_RANKS_CTE},
    seq AS (
      SELECT s, LEAD(s) OVER (ORDER BY r) AS s_next FROM rk
    ),
    agg AS (
      SELECT CAST(SUM(ABS(s_next - s)) AS BIGINT) AS sad
      FROM seq WHERE s_next IS NOT NULL
    )
    SELECT nn.n AS n_days, agg.sad AS sum_abs_diff,
           round(1 - 3.0 * agg.sad / (CAST(nn.n AS DOUBLE) * nn.n - 1), 9)
             AS chatterjee_xi
    FROM agg CROSS JOIN nn
    """,
)


def _dchatterjee(spark, sf_dir):
    """Chatterjee's xi via the rank-path absolute increments."""
    rk = _daily_ranks(spark, sf_dir)
    seq = rk.select(
        "s", F.lead("s").over(Window.orderBy("r")).alias("s_next")
    ).filter(F.col("s_next").isNotNull())
    agg = seq.agg(
        F.sum(F.abs(F.col("s_next") - F.col("s"))).cast("long").alias("sad")
    )
    nn = rk.agg(F.count("*").cast("long").alias("n"))
    return agg.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_days"),
        F.col("sad").alias("sum_abs_diff"),
        F.round(
            1 - 3.0 * F.col("sad") / (F.col("n").cast("double") * F.col("n") - 1),
            9,
        ).alias("chatterjee_xi"),
    )


CATALOG["ml_chatterjee_xi_daily"].fn = _dchatterjee
