"""Round-13 wave 2: survival confidence bands and extreme-value fits —
Greenwood variance bands on the weekly Kaplan-Meier curve, a Gumbel
block-maxima fit on daily event maxima with its return-level curve, the
mean-residual-life curve over user lifetimes, and the Gini mean
difference of quantity from the value-domain histogram.

The survival queries ride the shared weekly life table
(_KM_TAB_CTES / _km_life_table); the Gumbel pair single-sources its fit
through _GUMBEL_FIT_CTES / _gumbel_fit.  Every irrational constant
(sqrt(6)/pi, the Euler-Mascheroni gamma, the per-horizon
ln(-ln(1-1/T)) values) is quantized ONCE in Python at 9 decimals and
fed to both engines verbatim.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t
from .q25_r7_inference import _KM_TAB_CTES, _km_life_table

register(
    "evt_km_greenwood_bands",
    # Greenwood variance and linear 95% confidence bands on the weekly
    # Kaplan-Meier retention curve: Var(S_w) = S_w^2 * sum_{j<=w}
    # d_j/(n_j(n_j-d_j)).  Survival uses the exact micro-nat ln-sum
    # convention the KM query proved; the Greenwood increments are
    # micro-quantized at 1e12 (their magnitude is ~1e-4) so the running
    # sum is an exact integer; bands are S +/- 1.96*se clamped to
    # [0,1].  Extinct weeks (d_j >= n_j) pin survival and both bands
    # to 0.
    oracle=f"""
    WITH {_KM_TAB_CTES},
    km AS (
      SELECT w, at_risk, deaths,
             CASE WHEN deaths >= at_risk THEN CAST(0 AS BIGINT)
                  ELSE CAST(round(round(ln(1.0 - CAST(deaths AS DOUBLE) / at_risk), 6)
                                  * 1000000) AS BIGINT) END AS t6,
             CASE WHEN deaths >= at_risk THEN CAST(0 AS BIGINT)
                  ELSE CAST(FLOOR(CAST(deaths AS DOUBLE) * 1000000000000.0
                                  / (CAST(at_risk AS DOUBLE) * (at_risk - deaths))
                                  + 0.5) AS BIGINT) END AS g12,
             CASE WHEN deaths >= at_risk THEN 1 ELSE 0 END AS ext
      FROM tab
    ),
    run AS (
      SELECT w, at_risk, deaths,
             MAX(ext) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING) AS extr,
             SUM(t6) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING) AS lsum,
             SUM(g12) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING) AS gsum
      FROM km
    )
    SELECT w AS week, at_risk, deaths,
           CASE WHEN extr = 1 THEN 0.0
                ELSE round(exp(CAST(lsum AS DOUBLE) / 1000000), 6) END AS survival,
           CASE WHEN extr = 1 THEN 0.0
                ELSE round(exp(CAST(lsum AS DOUBLE) / 1000000)
                           * sqrt(CAST(gsum AS DOUBLE) / 1000000000000.0), 6)
                END AS greenwood_se,
           CASE WHEN extr = 1 THEN 0.0
                ELSE round(GREATEST(0.0,
                       exp(CAST(lsum AS DOUBLE) / 1000000)
                       - 1.96 * exp(CAST(lsum AS DOUBLE) / 1000000)
                         * sqrt(CAST(gsum AS DOUBLE) / 1000000000000.0)), 6)
                END AS ci_lo,
           CASE WHEN extr = 1 THEN 0.0
                ELSE round(LEAST(1.0,
                       exp(CAST(lsum AS DOUBLE) / 1000000)
                       + 1.96 * exp(CAST(lsum AS DOUBLE) / 1000000)
                         * sqrt(CAST(gsum AS DOUBLE) / 1000000000000.0)), 6)
                END AS ci_hi
    FROM run
    """,
)


def _dkmgreenwood(spark, sf_dir):
    """Greenwood bands: the shared 4-row weekly life table, one
    running micro-quantized sum for the log-survival and one for the
    variance increments, and a per-row band assembly — confidence
    bands for the cost of the KM curve itself."""
    tab = _km_life_table(spark, sf_dir)
    ext_row = F.when(F.col("deaths") >= F.col("at_risk"), 1).otherwise(0)
    km = tab.select(
        "w",
        "at_risk",
        "deaths",
        F.when(F.col("deaths") >= F.col("at_risk"), F.lit(0).cast("long"))
        .otherwise(
            F.round(
                F.round(
                    F.log(F.lit(1.0) - F.col("deaths").cast("double") / F.col("at_risk")),
                    6,
                )
                * F.lit(1000000.0)
            ).cast("bigint")
        )
        .alias("t6"),
        F.when(F.col("deaths") >= F.col("at_risk"), F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                F.col("deaths").cast("double")
                * F.lit(1000000000000.0)
                / (F.col("at_risk").cast("double") * (F.col("at_risk") - F.col("deaths")))
                + F.lit(0.5)
            ).cast("long")
        )
        .alias("g12"),
        ext_row.alias("ext"),
    )
    wrun = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = km.select(
        "w",
        "at_risk",
        "deaths",
        F.max("ext").over(wrun).alias("extr"),
        F.sum("t6").over(wrun).alias("lsum"),
        F.sum("g12").over(wrun).alias("gsum"),
    )
    s = F.exp(F.col("lsum").cast("double") / F.lit(1000000))
    se = s * F.sqrt(F.col("gsum").cast("double") / F.lit(1000000000000.0))
    zero = F.col("extr") == 1
    return run.select(
        F.col("w").alias("week"),
        "at_risk",
        "deaths",
        F.when(zero, F.lit(0.0)).otherwise(F.round(s, 6)).alias("survival"),
        F.when(zero, F.lit(0.0)).otherwise(F.round(se, 6)).alias("greenwood_se"),
        F.when(zero, F.lit(0.0))
        .otherwise(F.round(F.greatest(F.lit(0.0), s - 1.96 * se), 6))
        .alias("ci_lo"),
        F.when(zero, F.lit(0.0))
        .otherwise(F.round(F.least(F.lit(1.0), s + 1.96 * se), 6))
        .alias("ci_hi"),
    )


CATALOG["evt_km_greenwood_bands"].fn = _dkmgreenwood


# The Gumbel method-of-moments fit on daily block maxima, single-sourced:
# the block-maxima fit and the return-level curve ride the SAME 1-row
# (n, mean, sd, beta, mu) frame.  sqrt(6)/pi and the Euler-Mascheroni
# constant are quantized once in Python at 9 decimals (0.779696801,
# 0.577215665) and appear verbatim in both engines.
_GUMBEL_FIT_CTES = """bm AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(MAX(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS mx
      FROM events GROUP BY 1
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(mx) AS BIGINT) AS s1,
             CAST(SUM(CAST(mx AS HUGEINT) * mx) AS DOUBLE) AS s2
      FROM bm
    ),
    fit AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / n AS mean_mx,
             sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) AS sd_mx,
             0.779696801 * sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
               AS beta,
             CAST(s1 AS DOUBLE) / n
               - 0.577215665 * (0.779696801
                 * sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))) AS mu
      FROM mom
    )"""


def _gumbel_fit(spark, sf_dir):
    """Spark twin of _GUMBEL_FIT_CTES: the 1-row Gumbel
    method-of-moments fit (n, mean_mx, sd_mx, beta, mu) on daily
    block maxima of event value in cents."""
    ev = t(spark, sf_dir, "events")
    bm = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.max(F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("mx")
    )
    mom = bm.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("mx").cast("long").alias("s1"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx"))
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    beta = F.lit(0.779696801) * sd
    return mom.select(
        "n",
        mean.alias("mean_mx"),
        sd.alias("sd_mx"),
        beta.alias("beta"),
        (mean - F.lit(0.577215665) * beta).alias("mu"),
    )


register(
    "evt_gumbel_block_maxima",
    # Gumbel (type-I extreme value) method-of-moments fit on the daily
    # maxima of event value: beta = sd * sqrt(6)/pi, mu = mean -
    # gamma_E * beta.  Blocks are calendar days, so the moment frame is
    # bounded by the calendar at any data scale; moments come from
    # exact integer/HUGEINT sums and the fit is four IEEE expressions
    # on one row.
    oracle=f"""
    WITH {_GUMBEL_FIT_CTES}
    SELECT n AS n_blocks,
           round(mean_mx, 6) AS mean_max_cents,
           round(sd_mx, 6) AS sd_max_cents,
           round(beta, 6) AS gumbel_beta,
           round(mu, 6) AS gumbel_mu
    FROM fit
    """,
)


def _dgumbelfit(spark, sf_dir):
    """Gumbel block-maxima fit: one per-day max aggregate (bounded by
    the calendar), one exact moment row, four closing expressions."""
    fit = _gumbel_fit(spark, sf_dir)
    return fit.select(
        F.col("n").alias("n_blocks"),
        F.round("mean_mx", 6).alias("mean_max_cents"),
        F.round("sd_mx", 6).alias("sd_max_cents"),
        F.round("beta", 6).alias("gumbel_beta"),
        F.round("mu", 6).alias("gumbel_mu"),
    )


CATALOG["evt_gumbel_block_maxima"].fn = _dgumbelfit


register(
    "evt_gumbel_return_levels",
    # Return levels from the shared Gumbel fit: x_T = mu - beta *
    # ln(-ln(1 - 1/T)) for horizons T in {7, 30, 365} days.  The
    # ln(-ln(.)) factors are authoring-time constants quantized at 9
    # decimals (-1.869824714, -3.384294493, -5.898525924) and inlined
    # as a 3-row literal grid — zero runtime libm beyond the fit's own
    # sqrt.
    oracle=f"""
    WITH {_GUMBEL_FIT_CTES},
    hz AS (
      SELECT * FROM (VALUES (7, -1.869824714),
                            (30, -3.384294493),
                            (365, -5.898525924)) AS v(horizon_days, lnln)
    )
    SELECT hz.horizon_days,
           round(fit.mu, 6) AS gumbel_mu,
           round(fit.beta, 6) AS gumbel_beta,
           round(fit.mu - fit.beta * hz.lnln, 6) AS return_level_cents
    FROM hz CROSS JOIN fit
    ORDER BY hz.horizon_days
    """,
)


def _dgumbelreturn(spark, sf_dir):
    """Return-level curve: the 1-row fit broadcast across a 3-row
    pinned horizon grid — one multiply-add per horizon."""
    fit = _gumbel_fit(spark, sf_dir)
    grid = spark.createDataFrame(
        [(7, -1.869824714), (30, -3.384294493), (365, -5.898525924)],
        "horizon_days INT, lnln DOUBLE",
    )
    return (
        grid.crossJoin(F.broadcast(fit))
        .select(
            "horizon_days",
            F.round("mu", 6).alias("gumbel_mu"),
            F.round("beta", 6).alias("gumbel_beta"),
            F.round(F.col("mu") - F.col("beta") * F.col("lnln"), 6).alias(
                "return_level_cents"
            ),
        )
        .orderBy("horizon_days")
    )


CATALOG["evt_gumbel_return_levels"].fn = _dgumbelreturn


register(
    "evt_mean_residual_life",
    # Mean residual life of user lifetimes at weekly thresholds w in
    # {0..3}: MRL(w) = E[wk - w | wk >= w] over the per-user lifetime-
    # in-weeks histogram (censoring status deliberately ignored — this
    # is the descriptive MRL curve beside the KM estimator, and the
    # denominator is the full at-or-beyond population).  Both moments
    # are exact integers; one division per threshold.
    oracle=f"""
    WITH {_KM_TAB_CTES},
    wkh AS (SELECT wk, CAST(SUM(c) AS BIGINT) AS c FROM g GROUP BY wk),
    mrl AS (
      SELECT w.w,
             CAST(SUM(CASE WHEN wkh.wk >= w.w THEN wkh.c ELSE 0 END) AS BIGINT)
               AS at_or_beyond,
             CAST(SUM(CASE WHEN wkh.wk >= w.w THEN (wkh.wk - w.w) * wkh.c
                           ELSE 0 END) AS BIGINT) AS resid_weeks
      FROM (SELECT unnest(generate_series(0, 3)) AS w) w
      CROSS JOIN wkh GROUP BY w.w
    )
    SELECT w AS threshold_week, at_or_beyond,
           round(CAST(resid_weeks AS DOUBLE) / NULLIF(at_or_beyond, 0), 6)
             AS mrl_weeks
    FROM mrl ORDER BY w
    """,
)


def _dmrl(spark, sf_dir):
    """MRL curve: the per-user lifetime aggregate reduces to the
    lifetime-in-weeks histogram (bounded by the calendar), a 4-row
    threshold grid crosses it, and each threshold's two moments are
    exact integer sums."""
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.min("ts").alias("fts"), F.max("ts").alias("lts"))
    wkh = (
        u.select(
            F.floor(
                (F.unix_timestamp("lts") - F.unix_timestamp("fts")) / F.lit(604800.0)
            ).alias("wk")
        )
        .groupBy("wk")
        .agg(F.count("*").cast("long").alias("c"))
    )
    grid = wkh.sparkSession.range(0, 4).select(F.col("id").alias("w"))
    mrl = (
        wkh.crossJoin(F.broadcast(grid))
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("wk") >= F.col("w"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("at_or_beyond"),
            F.sum(
                F.when(
                    F.col("wk") >= F.col("w"), (F.col("wk") - F.col("w")) * F.col("c")
                ).otherwise(0)
            )
            .cast("long")
            .alias("resid_weeks"),
        )
    )
    return mrl.select(
        F.col("w").alias("threshold_week"),
        "at_or_beyond",
        F.round(
            F.col("resid_weeks").cast("double") / F.nullif(F.col("at_or_beyond"), F.lit(0)),
            6,
        ).alias("mrl_weeks"),
    ).orderBy("threshold_week")


CATALOG["evt_mean_residual_life"].fn = _dmrl


register(
    "ml_gini_mean_difference",
    # Gini mean difference of l_quantity — the U-statistic dispersion
    # measure E|X - X'| — from the 50-value histogram: GMD =
    # sum_{j,k} c_j c_k |j - k| / (n(n-1)) (the j=k diagonal
    # contributes zero, so the full-grid sum equals the no-self-pair
    # sum).  The numerator is one exact HUGEINT sum over the bounded
    # 50x50 grid; the Gini coefficient follows as GMD/(2*mean).
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(q AS HUGEINT) * c) AS BIGINT) AS qsum
      FROM vc
    ),
    grid AS (
      SELECT CAST(SUM(CAST(a.c AS HUGEINT) * b.c * ABS(a.q - b.q)) AS DOUBLE)
               AS gsum
      FROM vc a CROSS JOIN vc b
    )
    SELECT tot.n AS n_rows,
           round(grid.gsum / (CAST(tot.n AS DOUBLE) * (tot.n - 1)), 6) AS gmd,
           round(grid.gsum / (CAST(tot.n AS DOUBLE) * (tot.n - 1))
                 / (2.0 * CAST(tot.qsum AS DOUBLE) / tot.n), 6) AS gini_from_gmd
    FROM tot CROSS JOIN grid
    """,
)


def _dgmd(spark, sf_dir):
    """Gini mean difference from the histogram: one value-count pass,
    one bounded 50x50 grid fold in exact decimals, a 1x1 closing
    join — the pairwise dispersion without a pair join."""
    li = t(spark, sf_dir, "lineitem")
    vc = (
        li.groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)  # feeds totals and both grid sides
    )
    tot = vc.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("c")).cast("long").alias("qsum"),
    )
    a = vc.select(F.col("q").alias("aq"), F.col("c").alias("ac"))
    b = vc.select(F.col("q").alias("bq"), F.col("c").alias("bc"))
    grid = a.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.col("ac").cast("decimal(38,0)")
            * F.col("bc")
            * F.abs(F.col("aq") - F.col("bq"))
        )
        .cast("double")
        .alias("gsum")
    )
    gmd = F.col("gsum") / (F.col("n").cast("double") * (F.col("n") - 1))
    return tot.crossJoin(F.broadcast(grid)).select(
        F.col("n").alias("n_rows"),
        F.round(gmd, 6).alias("gmd"),
        F.round(
            gmd / (2.0 * F.col("qsum").cast("double") / F.col("n")), 6
        ).alias("gini_from_gmd"),
    )


CATALOG["ml_gini_mean_difference"].fn = _dgmd
