"""Round-15 wave 32 (post-close): count laws + calendar structure —
Lotka's law on the customer order-count frequency-of-frequencies
(ln f_k vs ln k Cramer fit with R^2), Taylor's power law across users
(ln variance vs ln mean of per-user daily event counts — exponent 1 =
Poisson, 2 = clumped; zero days enter the moments exactly without any
densify because they add nothing to either sum while nd anchors the
denominators), price last-cent-digit forensics (10-cell chi2 vs
uniform), interpurchase-gap regularity segmentation (per-customer gap
CV as an exact cleared rational: clockwork < 0.5 <= random < 1 <=
bursty, plus the doubled-median CV), and the weekday x hour
independence chi2 of event volume on the 7x24 grid via the q84
zero-cell-free N(sum O^2/(r c) - 1) identity with Cramer's V.

Exactness: frequency and digit cells are pure integers; both power-law
fits run on 6dp micro-nat pairs with cleared Cramer moments; gap CVs
micro-quantize through the exact k(kS2-S^2)/((k-1)S^2) rational before
classification; chi2 terms pico-quantize per cell.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t


register(
    "cust_lotka_law_fit",
    # Lotka's law: f_k = #customers with exactly k orders should fall
    # as ~ k^(-alpha).  The frequency-of-frequencies is one double
    # GROUP BY; the fit is the exact Cramer line on (ln k, ln f_k)
    # micro-nat pairs with R^2 from the same cleared moments.
    oracle="""
    WITH ck AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k
      FROM orders GROUP BY o_custkey
    ),
    ff AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS f FROM ck GROUP BY k
    ),
    q AS (
      SELECT CAST(floor(round(ln(CAST(k AS DOUBLE)), 6) * 1000000 + 0.5)
               AS BIGINT) AS x6,
             CAST(floor(round(ln(CAST(f AS DOUBLE)), 6) * 1000000 + 0.5)
               AS BIGINT) AS y6
      FROM ff
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x6) AS HUGEINT) AS sx, CAST(SUM(y6) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x6 AS HUGEINT) * x6) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x6 AS HUGEINT) * y6) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(y6 AS HUGEINT) * y6) AS HUGEINT) AS syy
      FROM q
    )
    SELECT n AS n_points,
           round(-CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS lotka_exponent,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 9) AS r2
    FROM m
    """,
)


def _dlotka(spark, sf_dir):
    """Lotka exponent off the frequency-of-frequencies fit."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    ck = o.groupBy("o_custkey").agg(F.count("*").cast("long").alias("k"))
    ff = ck.groupBy("k").agg(F.count("*").cast("long").alias("f"))
    i6 = lambda c: F.floor(  # noqa: E731
        F.round(F.log(c.cast("double")), 6) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    q = ff.select(i6(F.col("k")).alias("x6"), i6(F.col("f")).alias("y6"))
    m = q.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x6").cast(d38).alias("sx"),
        F.sum("y6").cast(d38).alias("sy"),
        F.sum(F.col("x6").cast(d38) * F.col("x6")).alias("sxx"),
        F.sum(F.col("x6").cast(d38) * F.col("y6")).alias("sxy"),
        F.sum(F.col("y6").cast(d38) * F.col("y6")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").alias("n_points"),
        F.round(-num / dx, 6).alias("lotka_exponent"),
        F.round(num * num / (dx * dy), 9).alias("r2"),
    )


CATALOG["cust_lotka_law_fit"].fn = _dlotka


register(
    "evt_taylor_power_law",
    # Taylor's power law: across users, ln(var of daily counts) ~
    # a + b ln(mean) — b = 1 is Poisson, b -> 2 is clumped.  Zero
    # days need NO densify: they contribute nothing to S or S2 while
    # the calendar nd anchors both denominators, so mean = S/nd and
    # var = (nd S2 - S^2)/(nd(nd-1)) are exact with absent rows.
    # Users with zero variance are excluded (ln undefined), counted.
    oracle="""
    WITH cal AS (
      SELECT CAST(date_diff('day', date_trunc('day', MIN(ts)),
                            date_trunc('day', MAX(ts))) + 1 AS BIGINT) AS nd
      FROM events
    ),
    ud AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    um AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM ud GROUP BY user_id
    ),
    mv AS (
      SELECT um.user_id,
             CAST(um.s AS DOUBLE) / cal.nd AS mean_c,
             CAST(cal.nd * um.s2 - um.s * um.s AS DOUBLE)
             / (CAST(cal.nd AS DOUBLE) * (cal.nd - 1)) AS var_c
      FROM um CROSS JOIN cal
    ),
    q AS (
      SELECT CAST(floor(round(ln(mean_c), 6) * 1000000 + 0.5) AS BIGINT) AS x6,
             CAST(floor(round(ln(var_c), 6) * 1000000 + 0.5) AS BIGINT) AS y6
      FROM mv WHERE var_c > 0
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x6) AS HUGEINT) AS sx, CAST(SUM(y6) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x6 AS HUGEINT) * x6) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x6 AS HUGEINT) * y6) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(y6 AS HUGEINT) * y6) AS HUGEINT) AS syy
      FROM q
    )
    SELECT n AS n_users,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS taylor_exponent,
           round((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)) / n / 1e6, 6) AS ln_intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 9) AS r2
    FROM m
    """,
)


def _dtaylor(spark, sf_dir):
    """Taylor exponent across users' daily-count mean/variance."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    cal = ev.agg(
        (
            F.datediff(
                F.date_trunc("day", F.max("ts")).cast("date"),
                F.date_trunc("day", F.min("ts")).cast("date"),
            )
            + 1
        )
        .cast("long")
        .alias("nd")
    )
    ud = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    um = ud.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    mv = um.crossJoin(F.broadcast(cal)).select(
        (F.col("s").cast("double") / F.col("nd")).alias("mean_c"),
        (
            (F.col("nd") * F.col("s2") - F.col("s") * F.col("s")).cast("double")
            / (F.col("nd").cast("double") * (F.col("nd") - 1))
        ).alias("var_c"),
    )
    i6 = lambda c: F.floor(  # noqa: E731
        F.round(F.log(c), 6) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    q = mv.filter(F.col("var_c") > 0).select(
        i6(F.col("mean_c")).alias("x6"), i6(F.col("var_c")).alias("y6")
    )
    m = q.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x6").cast(d38).alias("sx"),
        F.sum("y6").cast(d38).alias("sy"),
        F.sum(F.col("x6").cast(d38) * F.col("x6")).alias("sxx"),
        F.sum(F.col("x6").cast(d38) * F.col("y6")).alias("sxy"),
        F.sum(F.col("y6").cast(d38) * F.col("y6")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    b = num / dx
    return m.select(
        F.col("n").alias("n_users"),
        F.round(b, 6).alias("taylor_exponent"),
        F.round(
            (F.col("sy").cast("double") - b * F.col("sx").cast("double"))
            / F.col("n")
            / F.lit(1e6),
            6,
        ).alias("ln_intercept"),
        F.round(num * num / (dx * dy), 9).alias("r2"),
    )


CATALOG["evt_taylor_power_law"].fn = _dtaylor


register(
    "lineitem_price_ending_digits",
    # Last-cent-digit forensics of extended prices: the 10-cell
    # distribution, each cell's share and pico-quantized chi2
    # contribution vs uniform, with the total chi2 carried on every
    # row — the pricing-forensics cousin of the Benford entries
    # (computed prices should be near-uniform; human-set ones are
    # not).
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) % 10
               AS digit
      FROM lineitem
    ),
    h AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ),
    nn AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
    terms AS (
      SELECT h.digit, h.n, nn.total,
             CAST(floor((h.n - CAST(nn.total AS DOUBLE) / 10)
                        * (h.n - CAST(nn.total AS DOUBLE) / 10)
                        / (CAST(nn.total AS DOUBLE) / 10) * 1e6 + 0.5)
               AS BIGINT) AS t6
      FROM h CROSS JOIN nn
    ),
    tot AS (SELECT CAST(SUM(t6) AS BIGINT) AS st6 FROM terms)
    SELECT digit AS last_cent_digit, n AS n_lineitems,
           round(CAST(n AS DOUBLE) / total, 9) AS share,
           round(t6 / 1e6, 6) AS chi2_contribution,
           round(tot.st6 / 1e6, 6) AS chi2_total
    FROM terms CROSS JOIN tot ORDER BY digit
    """,
)


def _dendingdigits(spark, sf_dir):
    """Last-cent-digit census with the uniform chi2."""
    li = t(spark, sf_dir, "lineitem")
    d = li.select(
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) % 10"
        ).alias("digit")
    )
    h = d.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    nn = h.agg(F.sum("n").cast("long").alias("total"))
    e = F.col("total").cast("double") / 10
    terms = h.crossJoin(F.broadcast(nn)).select(
        "digit",
        "n",
        "total",
        F.floor((F.col("n") - e) * (F.col("n") - e) / e * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("t6"),
    ).localCheckpoint(eager=False)
    tot = terms.agg(F.sum("t6").cast("long").alias("st6"))
    return terms.crossJoin(F.broadcast(tot)).select(
        F.col("digit").alias("last_cent_digit"),
        F.col("n").alias("n_lineitems"),
        F.round(F.col("n").cast("double") / F.col("total"), 9).alias("share"),
        F.round(F.col("t6") / F.lit(1e6), 6).alias("chi2_contribution"),
        F.round(F.col("st6") / F.lit(1e6), 6).alias("chi2_total"),
    ).orderBy("last_cent_digit")


CATALOG["lineitem_price_ending_digits"].fn = _dendingdigits


register(
    "cust_interpurchase_regularity",
    # Interpurchase regularity segmentation: per customer (>= 3
    # orders) the CV of consecutive order-date gaps as the exact
    # cleared rational sqrt(k(k S2 - S^2)/((k-1) S^2)), micro-
    # quantized, then the clockwork (< 0.5) / random (< 1) / bursty
    # split and the doubled-median CV — the replenishment-predictability
    # segmentation behind every reorder-reminder feature.
    oracle="""
    WITH od AS (
      SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS dy,
             o_orderkey AS okey
      FROM orders
    ),
    g AS (
      SELECT ck,
             date_diff('day', LAG(dy) OVER (PARTITION BY ck
                                            ORDER BY dy, okey), dy) AS gap
      FROM od
    ),
    cm AS (
      SELECT ck, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(gap) AS BIGINT) AS s,
             CAST(SUM(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS s2
      FROM g WHERE gap IS NOT NULL GROUP BY ck
    ),
    cv AS (
      SELECT ck,
             CAST(floor(sqrt(CAST(k * (k * s2 - CAST(s AS HUGEINT) * s)
                                  AS DOUBLE)
                             / CAST((k - 1) AS DOUBLE)
                             / (CAST(s AS DOUBLE) * s)) * 1e6 + 0.5)
               AS BIGINT) AS cv6
      FROM cm WHERE k >= 2 AND s > 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN cv6 < 500000 THEN 1 ELSE 0 END) AS BIGINT)
               AS clockwork,
             CAST(SUM(CASE WHEN cv6 >= 500000 AND cv6 < 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS random_ish,
             CAST(SUM(CASE WHEN cv6 >= 1000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS bursty,
             CAST(2 * quantile_cont(cv6, 0.5) AS BIGINT) AS med2
      FROM cv
    )
    SELECT n AS n_customers,
           round(CAST(clockwork AS DOUBLE) / n, 9) AS share_clockwork,
           round(CAST(random_ish AS DOUBLE) / n, 9) AS share_random,
           round(CAST(bursty AS DOUBLE) / n, 9) AS share_bursty,
           round(med2 / 2e6, 6) AS median_cv
    FROM agg
    """,
)


def _dregularity(spark, sf_dir):
    """Gap-CV regularity segmentation with the doubled-median CV."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    od = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").cast("date").alias("dy"),
        F.col("o_orderkey").alias("okey"),
    )
    w = Window.partitionBy("ck").orderBy("dy", "okey")
    g = od.select(
        "ck", F.datediff(F.col("dy"), F.lag("dy").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    cm = g.groupBy("ck").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("gap").cast("long").alias("s"),
        F.sum(F.col("gap").cast(d38) * F.col("gap")).alias("s2"),
    )
    cv = cm.filter((F.col("k") >= 2) & (F.col("s") > 0)).select(
        F.floor(
            F.sqrt(
                (
                    F.col("k") * (F.col("k") * F.col("s2") - F.col("s").cast(d38) * F.col("s"))
                ).cast("double")
                / (F.col("k") - 1).cast("double")
                / (F.col("s").cast("double") * F.col("s"))
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cv6")
    )
    agg = cv.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("cv6") < 500000, 1).otherwise(0))
        .cast("long")
        .alias("clockwork"),
        F.sum(
            F.when((F.col("cv6") >= 500000) & (F.col("cv6") < 1000000), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("random_ish"),
        F.sum(F.when(F.col("cv6") >= 1000000, 1).otherwise(0))
        .cast("long")
        .alias("bursty"),
        (2 * F.percentile("cv6", 0.5)).cast("long").alias("med2"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("clockwork").cast("double") / F.col("n"), 9).alias(
            "share_clockwork"
        ),
        F.round(F.col("random_ish").cast("double") / F.col("n"), 9).alias(
            "share_random"
        ),
        F.round(F.col("bursty").cast("double") / F.col("n"), 9).alias(
            "share_bursty"
        ),
        F.round(F.col("med2") / F.lit(2e6), 6).alias("median_cv"),
    )


CATALOG["cust_interpurchase_regularity"].fn = _dregularity


register(
    "evt_weekday_hour_independence",
    # Weekday x hour independence of event volume on the 7x24 grid:
    # chi2 via the q84 zero-cell-free N(sum O^2/(r c) - 1) identity
    # with pico-quantized cell terms, df = 6 x 23, and Cramer's V —
    # whether the daily rhythm itself changes by weekday (it had
    # better, or the staffing heatmap needs only one axis).
    oracle="""
    WITH e AS (
      SELECT CAST(isodow(ts) AS BIGINT) AS wd,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod
      FROM events
    ),
    cells AS (
      SELECT wd, hod, CAST(COUNT(*) AS BIGINT) AS o FROM e GROUP BY wd, hod
    ),
    rt AS (SELECT wd, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY wd),
    ct AS (SELECT hod, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY hod),
    nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT CAST(floor(CAST(cells.o AS DOUBLE) * cells.o
                        / (CAST(rt.r AS DOUBLE) * ct.c) * 1e12 + 0.5)
               AS BIGINT) AS t12
      FROM cells JOIN rt ON rt.wd = cells.wd JOIN ct ON ct.hod = cells.hod
    )
    SELECT nn.n AS n_events,
           round(CAST(nn.n AS DOUBLE) * (SUM(terms.t12) / 1e12 - 1), 6)
             AS chi2,
           CAST(6 * 23 AS BIGINT) AS df,
           round(sqrt(CAST(nn.n AS DOUBLE) * (SUM(terms.t12) / 1e12 - 1)
                      / (CAST(nn.n AS DOUBLE) * 6)), 9) AS cramers_v
    FROM terms CROSS JOIN nn GROUP BY nn.n
    """,
)


def _dwdhour(spark, sf_dir):
    """7x24 independence chi2 + Cramer's V via the q84 identity."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        (((F.dayofweek("ts") + 5) % 7) + 1).cast("long").alias("wd"),
        F.hour("ts").cast("long").alias("hod"),
    )
    cells = e.groupBy("wd", "hod").agg(F.count("*").cast("long").alias("o"))
    rt = cells.groupBy(F.col("wd").alias("wdr")).agg(
        F.sum("o").cast("long").alias("r")
    )
    ct = cells.groupBy(F.col("hod").alias("hodc")).agg(
        F.sum("o").cast("long").alias("c")
    )
    nn = cells.agg(F.sum("o").cast("long").alias("n"))
    terms = (
        cells.join(F.broadcast(rt), F.col("wd") == F.col("wdr"))
        .join(F.broadcast(ct), F.col("hod") == F.col("hodc"))
        .select(
            F.floor(
                F.col("o").cast("double") * F.col("o")
                / (F.col("r").cast("double") * F.col("c"))
                * F.lit(1e12)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t12")
        )
    )
    out = terms.crossJoin(F.broadcast(nn)).groupBy("n").agg(
        F.sum("t12").cast("long").alias("st12")
    )
    chi2 = F.col("n").cast("double") * (F.col("st12") / F.lit(1e12) - 1)
    return out.select(
        F.col("n").alias("n_events"),
        F.round(chi2, 6).alias("chi2"),
        F.lit(6 * 23).cast("long").alias("df"),
        F.round(F.sqrt(chi2 / (F.col("n").cast("double") * 6)), 9).alias(
            "cramers_v"
        ),
    )


CATALOG["evt_weekday_hour_independence"].fn = _dwdhour
