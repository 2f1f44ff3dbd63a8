"""Round-14 wave 5: probabilistic forecast scoring on the daily value
series — the empirical-window CRPS (closed pair-sum form), pinball
losses at tau = 0.1/0.5/0.9 off exact 7-day order statistics, the
Winkler 80% interval score with empirical coverage, the sMAPE/MAPE/
wMAPE bundle against the seasonal-naive forecast, and a Diebold-
Mariano comparison of naive vs seasonal-naive absolute errors.

Everything rides q59's exact integer daily-cents frame (~30 rows at
any sf — the events window is a calendar month), with 7 lag columns as
the rolling empirical forecast distribution.  Exactness: CRPS clears
its denominators (49 * crps = 7 * sum|l_i - y| - sum_{i<j}|l_i - l_j|,
pure BIGINTs; the 7 + 21 absolute-difference terms are one generated
expression string shared verbatim by both engines); pinball at
tau = k/10 scales by 10, Winkler's 2/alpha = 10 is integer; only the
sMAPE/MAPE per-day ratios need picounit quantization; the DM statistic
is exact integer moments until one final assembly.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t
from .q59_r13_trend_changepoint import _DAILY_CENTS_CTE, _daily_cents

# 7-day lag frame over the daily series: y = today's cents, l1..l7 =
# the prior week's cents (the empirical forecast sample), defined for
# days k >= 8.
_LAGS = ", ".join(
    f"lag(cents, {i}) OVER (ORDER BY k) AS l{i}" for i in range(1, 8)
)
_LAG_CTE = f"""lg AS (
      SELECT k, cents AS y, {_LAGS}
      FROM d
    ),
    lf AS (SELECT * FROM lg WHERE l7 IS NOT NULL)"""

# Generated absolute-difference sums (identical text in both engines).
_SUM_LY = " + ".join(f"ABS(l{i} - y)" for i in range(1, 8))
_SUM_LL = " + ".join(
    f"ABS(l{i} - l{j})" for i in range(1, 8) for j in range(i + 1, 8)
)
_SORTED7 = "array_sort(array(l1, l2, l3, l4, l5, l6, l7))"
_SORTED7_DUCK = "list_sort([l1, l2, l3, l4, l5, l6, l7])"


def _lag_frame(spark, sf_dir):
    d = _daily_cents(spark, sf_dir)
    w = Window.orderBy("k")
    cols = [F.col("k"), F.col("cents").alias("y")] + [
        F.lag("cents", i).over(w).alias(f"l{i}") for i in range(1, 8)
    ]
    return d.select(*cols).filter(F.col("l7").isNotNull())


register(
    "evt_crps_empirical_window",
    # CRPS of the trailing-7-day empirical distribution as the
    # probabilistic forecast for each day: CRPS(F, y) = (1/7)*
    # sum|l_i - y| - (1/49)*sum_{i<j}|l_i - l_j|.  Clearing the
    # denominator, 49*CRPS = 7*sum|l_i - y| - sum_{i<j}|l_i - l_j| is
    # an exact BIGINT per day; the report divides once at the end.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    {_LAG_CTE},
    per_day AS (
      SELECT 7 * ({_SUM_LY}) - ({_SUM_LL}) AS crps49
      FROM lf
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(crps49) AS DOUBLE) / (49.0 * COUNT(*) * 100), 6)
             AS mean_crps,
           round(CAST(MAX(crps49) AS DOUBLE) / (49.0 * 100), 6) AS max_crps
    FROM per_day
    """,
)


def _dcrps(spark, sf_dir):
    """Empirical CRPS in cleared-denominator integer form."""
    lf = _lag_frame(spark, sf_dir)
    per_day = lf.select(
        (7 * F.expr(_SUM_LY) - F.expr(_SUM_LL)).alias("crps49")
    )
    return per_day.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(
            F.sum("crps49").cast("double") / (F.lit(49.0) * F.count("*") * 100), 6
        ).alias("mean_crps"),
        F.round(F.max("crps49").cast("double") / (F.lit(49.0) * 100), 6).alias(
            "max_crps"
        ),
    )


CATALOG["evt_crps_empirical_window"].fn = _dcrps


register(
    "evt_pinball_quantile_window",
    # Pinball (quantile) losses of the trailing-window order-statistic
    # forecasts: q10 = 1st, q50 = 4th, q90 = 7th smallest of the 7
    # lags (exact type-1 order statistics).  10*L_tau keeps every term
    # integer: tau = .1 -> (y-q) if y >= q else 9(q-y); .5 -> 5|y-q|;
    # .9 -> 9(y-q) / (q-y).
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    {_LAG_CTE},
    qf AS (
      SELECT y, {_SORTED7_DUCK}[1] AS q10, {_SORTED7_DUCK}[4] AS q50,
             {_SORTED7_DUCK}[7] AS q90
      FROM lf
    ),
    pl AS (
      SELECT
        CASE WHEN y >= q10 THEN (y - q10) ELSE 9 * (q10 - y) END AS p10,
        5 * ABS(y - q50) AS p50,
        CASE WHEN y >= q90 THEN 9 * (y - q90) ELSE (q90 - y) END AS p90
      FROM qf
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(p10) AS DOUBLE) / (10.0 * COUNT(*) * 100), 6)
             AS pinball_q10,
           round(CAST(SUM(p50) AS DOUBLE) / (10.0 * COUNT(*) * 100), 6)
             AS pinball_q50,
           round(CAST(SUM(p90) AS DOUBLE) / (10.0 * COUNT(*) * 100), 6)
             AS pinball_q90
    FROM pl
    """,
)


def _dpinball(spark, sf_dir):
    """Pinball losses at 10x integer scale off exact order stats."""
    lf = _lag_frame(spark, sf_dir)
    qf = lf.select(
        "y",
        F.expr(f"element_at({_SORTED7}, 1)").alias("q10"),
        F.expr(f"element_at({_SORTED7}, 4)").alias("q50"),
        F.expr(f"element_at({_SORTED7}, 7)").alias("q90"),
    )
    pl = qf.select(
        F.when(F.col("y") >= F.col("q10"), F.col("y") - F.col("q10"))
        .otherwise(9 * (F.col("q10") - F.col("y")))
        .alias("p10"),
        (5 * F.abs(F.col("y") - F.col("q50"))).alias("p50"),
        F.when(F.col("y") >= F.col("q90"), 9 * (F.col("y") - F.col("q90")))
        .otherwise(F.col("q90") - F.col("y"))
        .alias("p90"),
    )
    return pl.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.sum("p10").cast("double") / (F.lit(10.0) * F.count("*") * 100), 6)
        .alias("pinball_q10"),
        F.round(F.sum("p50").cast("double") / (F.lit(10.0) * F.count("*") * 100), 6)
        .alias("pinball_q50"),
        F.round(F.sum("p90").cast("double") / (F.lit(10.0) * F.count("*") * 100), 6)
        .alias("pinball_q90"),
    )


CATALOG["evt_pinball_quantile_window"].fn = _dpinball


register(
    "evt_winkler_interval_score",
    # Winkler score of the trailing-window 80% interval [min, max of
    # the 7 lags]: W = (u - l) + 10*(l - y) if y < l, + 10*(y - u) if
    # y > u (2/alpha = 10 exactly).  Pure integers; also reports the
    # empirical coverage of the interval.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    {_LAG_CTE},
    qf AS (
      SELECT y, {_SORTED7_DUCK}[1] AS lo, {_SORTED7_DUCK}[7] AS hi
      FROM lf
    ),
    ws AS (
      SELECT (hi - lo)
             + CASE WHEN y < lo THEN 10 * (lo - y) ELSE 0 END
             + CASE WHEN y > hi THEN 10 * (y - hi) ELSE 0 END AS w,
             CASE WHEN y >= lo AND y <= hi THEN 1 ELSE 0 END AS cov
      FROM qf
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(w) AS DOUBLE) / (COUNT(*) * 100), 6)
             AS mean_winkler,
           round(CAST(SUM(cov) AS DOUBLE) / COUNT(*), 6) AS coverage
    FROM ws
    """,
)


def _dwinkler(spark, sf_dir):
    """Winkler 80% interval score + coverage — exact integers."""
    lf = _lag_frame(spark, sf_dir)
    qf = lf.select(
        "y",
        F.expr(f"element_at({_SORTED7}, 1)").alias("lo"),
        F.expr(f"element_at({_SORTED7}, 7)").alias("hi"),
    )
    ws = qf.select(
        (
            (F.col("hi") - F.col("lo"))
            + F.when(F.col("y") < F.col("lo"), 10 * (F.col("lo") - F.col("y"))).otherwise(0)
            + F.when(F.col("y") > F.col("hi"), 10 * (F.col("y") - F.col("hi"))).otherwise(0)
        ).alias("w"),
        F.when(
            (F.col("y") >= F.col("lo")) & (F.col("y") <= F.col("hi")), 1
        )
        .otherwise(0)
        .alias("cov"),
    )
    return ws.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.sum("w").cast("double") / (F.count("*") * 100), 6).alias(
            "mean_winkler"
        ),
        F.round(F.sum("cov").cast("double") / F.count("*"), 6).alias("coverage"),
    )


CATALOG["evt_winkler_interval_score"].fn = _dwinkler


register(
    "evt_smape_bundle_seasonal",
    # Relative-error bundle against the seasonal-naive forecast
    # (value 7 days earlier): sMAPE = mean(2|y-f|/(y+f)), MAPE =
    # mean(|y-f|/y), wMAPE = sum|y-f|/sum(y).  The per-day ratios are
    # the only non-integers — picounit-quantized before the mean; the
    # wMAPE ratio is exact.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    {_LAG_CTE},
    ae AS (
      SELECT y, l7 AS f, ABS(y - l7) AS e FROM lf
    ),
    terms AS (
      SELECT e, y,
             CAST(floor(round(2 * CAST(e AS DOUBLE) / (y + f), 12)
               * 1000000000000 + 0.5) AS BIGINT) AS sm12,
             CAST(floor(round(CAST(e AS DOUBLE) / y, 12)
               * 1000000000000 + 0.5) AS BIGINT) AS mp12
      FROM ae
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(sm12) AS DOUBLE) / COUNT(*) / 1000000000000.0, 6)
             AS smape,
           round(CAST(SUM(mp12) AS DOUBLE) / COUNT(*) / 1000000000000.0, 6)
             AS mape,
           round(CAST(SUM(e) AS DOUBLE) / SUM(y), 6) AS wmape
    FROM terms
    """,
)


def _dsmape(spark, sf_dir):
    """sMAPE/MAPE/wMAPE vs seasonal naive — picounit day terms."""
    lf = _lag_frame(spark, sf_dir)
    ae = lf.select(
        "y", F.col("l7").alias("f"), F.abs(F.col("y") - F.col("l7")).alias("e")
    )
    terms = ae.select(
        "e",
        "y",
        F.floor(
            F.round(2 * F.col("e").cast("double") / (F.col("y") + F.col("f")), 12)
            * F.lit(1000000000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("sm12"),
        F.floor(
            F.round(F.col("e").cast("double") / F.col("y"), 12)
            * F.lit(1000000000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("mp12"),
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(
            F.sum("sm12").cast("double") / F.count("*") / F.lit(1000000000000.0), 6
        ).alias("smape"),
        F.round(
            F.sum("mp12").cast("double") / F.count("*") / F.lit(1000000000000.0), 6
        ).alias("mape"),
        F.round(F.sum("e").cast("double") / F.sum("y"), 6).alias("wmape"),
    )


CATALOG["evt_smape_bundle_seasonal"].fn = _dsmape


register(
    "evt_diebold_mariano_naive",
    # Diebold-Mariano comparison of naive (yesterday) vs seasonal-
    # naive (last week) forecasts under absolute-error loss: d_t =
    # |y - l1| - |y - l7|, DM = dbar / sqrt(s^2_d / n) with the sample
    # variance from exact integer sums (cleared denominators:
    # n*sum(d^2) - sum(d)^2).
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    {_LAG_CTE},
    dd2 AS (
      SELECT ABS(y - l1) - ABS(y - l7) AS dt FROM lf
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dt) AS BIGINT) AS sd,
             CAST(SUM(CAST(dt AS HUGEINT) * dt) AS HUGEINT) AS sd2
      FROM dd2
    )
    SELECT n AS n_days,
           round(CAST(sd AS DOUBLE) / (n * 100), 6) AS mean_loss_diff,
           round((CAST(sd AS DOUBLE) / n)
                 / sqrt((CAST(n AS DOUBLE) * CAST(sd2 AS DOUBLE)
                         - CAST(sd AS DOUBLE) * sd)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS dm_stat
    FROM agg
    """,
)


def _ddm(spark, sf_dir):
    """DM statistic from exact integer loss-differential moments."""
    lf = _lag_frame(spark, sf_dir)
    dd2 = lf.select(
        (
            F.abs(F.col("y") - F.col("l1")) - F.abs(F.col("y") - F.col("l7"))
        ).alias("dt")
    )
    agg = dd2.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dt").cast("long").alias("sd"),
        F.sum(F.col("dt").cast("decimal(38,0)") * F.col("dt")).alias("sd2"),
    )
    nd = F.col("n").cast("double")
    sdd = F.col("sd").cast("double")
    return agg.select(
        F.col("n").alias("n_days"),
        F.round(sdd / (F.col("n") * 100), 6).alias("mean_loss_diff"),
        F.round(
            (sdd / F.col("n"))
            / F.sqrt(
                (nd * F.col("sd2").cast("double") - sdd * F.col("sd"))
                / (nd * F.col("n") * (F.col("n") - 1))
            ),
            6,
        ).alias("dm_stat"),
    )


CATALOG["evt_diebold_mariano_naive"].fn = _ddm
