"""Round-15 wave 3: operations analytics — the newsvendor
critical-fractile stocking sweep over daily shipped demand, a
Little's-law audit (interval-integral time-average concurrency vs
lambda*W) per event type, the seasonal-naive tracking-signal forecast
monitor, process-capability indices (Cp/Cpk/Cpm) for daily order
counts against median-anchored spec limits, and a Nelson-rules
(1,2,3,4) control-chart scan of daily event counts.

Exactness: daily demands/counts are exact integers; newsvendor
quantile cuts compare 100*cum >= r*n in integers; Little's-law
clipped occupancy sums in exact MICROseconds; the Nelson rule-1 band
check clears to the all-integer inequality
(n-1)*(c*n - S)^2 > 9*n*(n*S2 - S^2); side-of-mean and run/alternation
logic use the integer sign of c*n - S so no double ever decides a
boundary; the remaining ratios are deterministic doubles of exact
sums, floor-quantized where magnitudes can exceed O(1e4).
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

register(
    "orders_newsvendor_levels",
    # Newsvendor stocking sweep: daily demand D = sum of shipped
    # quantity per l_shipdate; for critical ratios r in {.50,.80,.90,
    # .95,.99} the order-up-to level q_r = min{v : P(D<=v) >= r}
    # (integer ECDF cut), with achieved service level, expected
    # overage E[(q-D)+] and expected shortfall E[(D-q)+].
    oracle="""
    WITH daily AS (
      SELECT l_shipdate AS d, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
      FROM lineitem GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
    hist AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM daily GROUP BY v
    ),
    cum AS (
      SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS c FROM hist
    ),
    rs(r100) AS (VALUES (50), (80), (90), (95), (99)),
    levels AS (
      SELECT r100, MIN(v) AS q
      FROM rs CROSS JOIN n JOIN cum ON 100 * cum.c >= r100 * n.nd
      GROUP BY r100
    )
    SELECT l.r100,
           l.q AS stock_level,
           round(CAST((SELECT SUM(cnt) FROM cum WHERE v <= l.q) AS DOUBLE)
                 / n.nd, 9) AS achieved_service,
           round(CAST((SELECT SUM((l.q - v) * cnt) FROM cum WHERE v < l.q)
                 AS DOUBLE) / n.nd, 6) AS overage_mean,
           round(CAST((SELECT SUM((v - l.q) * cnt) FROM cum WHERE v > l.q)
                 AS DOUBLE) / n.nd, 6) AS shortfall_mean
    FROM levels l CROSS JOIN n
    ORDER BY r100
    """,
)


def _dnewsvendor(spark, sf_dir):
    """Critical-fractile sweep: bounded daily-demand histogram x 5-row
    ratio grid (broadcast literal)."""
    li = t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("v")
    )
    hist = daily.groupBy("v").agg(F.count("*").cast("long").alias("cnt"))
    nd = daily.agg(F.count("*").cast("long").alias("nd"))
    cum = hist.crossJoin(F.broadcast(nd)).select(
        "v",
        "cnt",
        "nd",
        F.sum("cnt").over(Window.orderBy("v")).alias("c"),
    )
    rs = spark.createDataFrame([(50,), (80,), (90,), (95,), (99,)], "r100 int")
    levels = (
        cum.crossJoin(F.broadcast(rs))
        .filter(100 * F.col("c") >= F.col("r100") * F.col("nd"))
        .groupBy("r100")
        .agg(F.min("v").alias("q"))
    )
    scored = cum.crossJoin(F.broadcast(levels)).groupBy("r100", "q", "nd").agg(
        F.sum(F.when(F.col("v") <= F.col("q"), F.col("cnt")).otherwise(0)).alias("le"),
        F.sum(
            F.when(F.col("v") < F.col("q"), (F.col("q") - F.col("v")) * F.col("cnt"))
            .otherwise(0)
        ).alias("over"),
        F.sum(
            F.when(F.col("v") > F.col("q"), (F.col("v") - F.col("q")) * F.col("cnt"))
            .otherwise(0)
        ).alias("short"),
    )
    return scored.select(
        "r100",
        F.col("q").alias("stock_level"),
        F.round(F.col("le").cast("double") / F.col("nd"), 9).alias("achieved_service"),
        F.round(F.col("over").cast("double") / F.col("nd"), 6).alias("overage_mean"),
        F.round(F.col("short").cast("double") / F.col("nd"), 6).alias(
            "shortfall_mean"
        ),
    ).orderBy("r100")


CATALOG["orders_newsvendor_levels"].fn = _dnewsvendor


register(
    "evt_little_law_audit",
    # Little's law audit per event type: treat each event as occupying
    # [ts, ts + value seconds]. L = integral of concurrency over the
    # observed span / span (exact clipped-microsecond sums); lambda =
    # (n-1)/span_s (the q71 convention); W = mean hold (exact decimal).
    # little_ratio = L / (lambda * W) quantifies the horizon-clipping
    # deficit — the two sides differ exactly by the mass beyond max(ts).
    oracle="""
    WITH b AS (
      SELECT event_type, epoch_us(ts) AS us,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CAST(value AS DECIMAL(18,2)) AS vdec,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
             MAX(epoch_us(ts)) OVER (PARTITION BY event_type) AS tmax
      FROM events
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(sec) - MIN(sec) AS BIGINT) AS span_s,
             CAST(SUM(LEAST(us + cents * 10000, tmax) - us) AS BIGINT) AS clip_us,
             MAX(us) - MIN(us) AS span_us,
             CAST(SUM(vdec) AS DOUBLE) AS sv
      FROM b GROUP BY event_type
    )
    SELECT event_type, n, span_s,
           round(CAST(clip_us AS DOUBLE) / span_us, 9) AS l_avg,
           round((n - 1) / CAST(span_s AS DOUBLE) * 3600, 6) AS lambda_per_hour,
           round(sv / n, 6) AS w_mean_s,
           round(CAST(clip_us AS DOUBLE) / span_us
                 / ((n - 1) / CAST(span_s AS DOUBLE) * (sv / n)), 9)
             AS little_ratio
    FROM g ORDER BY event_type
    """,
)


def _dlittle(spark, sf_dir):
    """Clipped-interval occupancy vs lambda*W, one grouped agg after a
    per-type max window (same shuffle key as the group)."""
    ev = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    wmax = Window.partitionBy("event_type")
    base = ev.select(
        "event_type",
        us.alias("us"),
        cents.alias("cents"),
        F.col("value").cast("decimal(18,2)").alias("vdec"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
    ).withColumn("tmax", F.max("us").over(wmax))
    g = base.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        (F.max("sec") - F.min("sec")).cast("long").alias("span_s"),
        F.sum(
            F.least(F.col("us") + F.col("cents") * 10000, F.col("tmax")) - F.col("us")
        ).alias("clip_us"),
        (F.max("us") - F.min("us")).alias("span_us"),
        F.sum("vdec").cast("double").alias("sv"),
    )
    lam = (F.col("n") - 1) / F.col("span_s").cast("double")
    l_avg = F.col("clip_us").cast("double") / F.col("span_us")
    w = F.col("sv") / F.col("n")
    return g.select(
        "event_type",
        "n",
        "span_s",
        F.round(l_avg, 9).alias("l_avg"),
        F.round(lam * 3600, 6).alias("lambda_per_hour"),
        F.round(w, 6).alias("w_mean_s"),
        F.round(l_avg / (lam * w), 9).alias("little_ratio"),
    ).orderBy("event_type")


CATALOG["evt_little_law_audit"].fn = _dlittle


register(
    "evt_tracking_signal_seasonal",
    # Tracking signal of the seasonal-naive forecast (c[d-7]) on daily
    # event counts: TS_d = CUSUM(e)/MAD(e) over forecast days, with
    # running MAD = mean |e|.  TS is the exact rational
    # cusum*k/sum_abs computed in double; the max-|TS| pick uses the
    # micro-quantized key.
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    f AS (
      SELECT d, c, LAG(c, 7) OVER (ORDER BY d) AS fc FROM daily
    ),
    e AS (
      SELECT d, c - fc AS err,
             ROW_NUMBER() OVER (ORDER BY d) AS k,
             SUM(c - fc) OVER (ORDER BY d) AS cusum,
             SUM(ABS(c - fc)) OVER (ORDER BY d) AS sabs
      FROM f WHERE fc IS NOT NULL
    ),
    ts AS (
      SELECT d, k, cusum, sabs,
             CAST(floor(abs(CAST(cusum AS DOUBLE) * k / sabs) * 1000000 + 0.5)
               AS BIGINT) AS a6,
             CAST(cusum AS DOUBLE) * k / sabs AS tsig
      FROM e
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_forecast_days,
           round(MAX_BY(tsig, k), 6) AS final_ts,
           round(MAX(a6) / 1e6, 6) AS max_abs_ts,
           CAST(SUM(CASE WHEN a6 > 4000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_beyond_4
    FROM ts
    """,
)


def _dtracking(spark, sf_dir):
    """Seasonal-naive tracking signal over the 30-day daily frame."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.orderBy("d")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f = daily.select("d", "c", F.lag("c", 7).over(w).alias("fc")).filter(
        F.col("fc").isNotNull()
    )
    e = f.select(
        "d",
        (F.col("c") - F.col("fc")).alias("err"),
    ).select(
        "d",
        F.row_number().over(w).alias("k"),
        F.sum("err").over(wcum).alias("cusum"),
        F.sum(F.abs(F.col("err"))).over(wcum).alias("sabs"),
    )
    tsig = F.col("cusum").cast("double") * F.col("k") / F.col("sabs")
    ts = e.select(
        "k",
        tsig.alias("tsig"),
        F.floor(F.abs(tsig) * F.lit(1000000) + F.lit(0.5)).cast("long").alias("a6"),
    )
    return ts.agg(
        F.count("*").cast("long").alias("n_forecast_days"),
        F.round(F.max_by("tsig", "k"), 6).alias("final_ts"),
        F.round(F.max("a6") / F.lit(1e6), 6).alias("max_abs_ts"),
        F.sum(F.when(F.col("a6") > 4000000, 1).otherwise(0))
        .cast("long")
        .alias("n_beyond_4"),
    )


CATALOG["evt_tracking_signal_seasonal"].fn = _dtracking


register(
    "orders_process_capability_daily",
    # Process capability of daily order counts against median-anchored
    # specs (LSL, USL) = (0.8, 1.2) * median: Cp = (USL-LSL)/6s,
    # Cpk = min(USL-mu, mu-LSL)/3s, Cpm = (USL-LSL)/(6*sqrt(s^2 +
    # (mu-T)^2)) with target T = median.  Moments from exact integer
    # sums; the median is the exact doubled-order-statistic rational.
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM daily
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
    med AS (
      -- doubled median: when nd is odd the two ranks coincide, so the
      -- middle value must count TWICE (a WHERE rn IN (...) picks it
      -- once and silently halves the median — caught by the in-wave
      -- odd-count cross-check)
      SELECT CAST(SUM(c * (CASE WHEN rn = (nd + 1) // 2 THEN 1 ELSE 0 END
                           + CASE WHEN rn = (nd + 2) // 2 THEN 1 ELSE 0 END))
             AS BIGINT) AS m2
      FROM ranked CROSS JOIN n
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(c) AS BIGINT) AS s,
             SUM(CAST(c AS HUGEINT) * c) AS s2
      FROM daily
    )
    SELECT mom.nd AS n_days,
           round(CAST(mom.s AS DOUBLE) / mom.nd, 6) AS mean_daily,
           round(med.m2 / 2.0, 1) AS median_daily,
           round((1.2 * (med.m2 / 2.0) - 0.8 * (med.m2 / 2.0))
                 / (6 * sqrt((CAST(mom.s2 AS DOUBLE)
                              - CAST(mom.s AS DOUBLE) * mom.s / mom.nd)
                             / (mom.nd - 1))), 6) AS cp,
           round(LEAST(1.2 * (med.m2 / 2.0) - CAST(mom.s AS DOUBLE) / mom.nd,
                       CAST(mom.s AS DOUBLE) / mom.nd - 0.8 * (med.m2 / 2.0))
                 / (3 * sqrt((CAST(mom.s2 AS DOUBLE)
                              - CAST(mom.s AS DOUBLE) * mom.s / mom.nd)
                             / (mom.nd - 1))), 6) AS cpk,
           round((1.2 * (med.m2 / 2.0) - 0.8 * (med.m2 / 2.0))
                 / (6 * sqrt((CAST(mom.s2 AS DOUBLE)
                              - CAST(mom.s AS DOUBLE) * mom.s / mom.nd)
                             / (mom.nd - 1)
                             + (CAST(mom.s AS DOUBLE) / mom.nd - med.m2 / 2.0)
                               * (CAST(mom.s AS DOUBLE) / mom.nd - med.m2 / 2.0)))
                 , 6) AS cpm
    FROM mom CROSS JOIN med
    """,
)


def _dcapability(spark, sf_dir):
    """Cp/Cpk/Cpm off exact daily-count moments + doubled median."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    ranked = daily.select(
        "c", F.row_number().over(Window.orderBy("c")).alias("rn")
    )
    nd = daily.agg(F.count("*").cast("long").alias("nd"))
    med = (
        ranked.crossJoin(F.broadcast(nd))
        # doubled median: both rank hits summed so an odd nd (ranks
        # coincide) counts the middle value twice
        .agg(
            F.sum(
                F.col("c")
                * (
                    (F.col("rn") == F.expr("(nd + 1) div 2")).cast("int")
                    + (F.col("rn") == F.expr("(nd + 2) div 2")).cast("int")
                )
            )
            .cast("long")
            .alias("m2")
        )
    )
    mom = daily.agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    j = mom.crossJoin(F.broadcast(med))
    mu = F.col("s").cast("double") / F.col("nd")
    sd = F.sqrt(
        (F.col("s2").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("nd"))
        / (F.col("nd") - 1)
    )
    medv = F.col("m2") / 2.0
    usl, lsl = 1.2 * medv, 0.8 * medv
    return j.select(
        F.col("nd").alias("n_days"),
        F.round(mu, 6).alias("mean_daily"),
        F.round(medv, 1).alias("median_daily"),
        F.round((usl - lsl) / (6 * sd), 6).alias("cp"),
        F.round(F.least(usl - mu, mu - lsl) / (3 * sd), 6).alias("cpk"),
        F.round(
            (usl - lsl) / (6 * F.sqrt(sd * sd + (mu - medv) * (mu - medv))), 6
        ).alias("cpm"),
    )


CATALOG["orders_process_capability_daily"].fn = _dcapability


register(
    "evt_nelson_rules_scan",
    # Nelson rules 1-4 on the daily event-count individuals chart:
    # R1 |c-mu| > 3 sigma  — cleared to the ALL-INTEGER inequality
    #    (n-1)*(c*n - S)^2 > 9*n*(n*S2 - S^2);
    # R2 nine consecutive points on one side of the mean (side =
    #    integer sign of c*n - S; a point ON the line breaks runs);
    # R3 six steadily increasing/decreasing (5 strict same-sign diffs);
    # R4 fourteen alternating points (12 consecutive sign flips of the
    #    13 diffs).  Counts of trigger positions per rule.
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
             SUM(CAST(c AS HUGEINT) * c) AS s2
      FROM daily
    ),
    x AS (
      SELECT d, c, n, s, s2,
             c * n - s AS side,
             c - LAG(c) OVER (ORDER BY d) AS diff
      FROM daily CROSS JOIN mom
    ),
    x2 AS (
      SELECT *, CASE WHEN diff * LAG(diff) OVER (ORDER BY d) < 0
                     THEN 1 ELSE 0 END AS flip
      FROM x
    ),
    y AS (
      SELECT d, c, n, s, s2, side, diff,
             SUM(CASE WHEN side > 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS 8 PRECEDING) AS pos9,
             SUM(CASE WHEN side < 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS 8 PRECEDING) AS neg9,
             SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS 4 PRECEDING) AS up5,
             SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY d ROWS 4 PRECEDING) AS dn5,
             SUM(flip) OVER (ORDER BY d ROWS 11 PRECEDING) AS alt12,
             ROW_NUMBER() OVER (ORDER BY d) AS rn
      FROM x2
    )
    SELECT MAX(n) AS n_days,
           CAST(SUM(CASE WHEN (n - 1) * CAST(side AS HUGEINT) * side
                              > 9 * n * (n * CAST(s2 AS HUGEINT)
                                         - CAST(s AS HUGEINT) * s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS r1_beyond_3sigma,
           CAST(SUM(CASE WHEN rn >= 9 AND (pos9 = 9 OR neg9 = 9)
                         THEN 1 ELSE 0 END) AS BIGINT) AS r2_nine_one_side,
           CAST(SUM(CASE WHEN rn >= 6 AND (up5 = 5 OR dn5 = 5)
                         THEN 1 ELSE 0 END) AS BIGINT) AS r3_six_trending,
           CAST(SUM(CASE WHEN rn >= 14 AND alt12 = 12
                         THEN 1 ELSE 0 END) AS BIGINT) AS r4_fourteen_alternating
    FROM y
    """,
)


def _dnelson(spark, sf_dir):
    """Nelson rules via integer side/diff logic over the 30-day frame."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    mom = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    w = Window.orderBy("d")
    x = daily.crossJoin(F.broadcast(mom)).select(
        "d",
        "c",
        "n",
        "s",
        "s2",
        (F.col("c") * F.col("n") - F.col("s")).alias("side"),
        (F.col("c") - F.lag("c").over(w)).alias("diff"),
    )
    w9 = w.rowsBetween(-8, 0)
    w5 = w.rowsBetween(-4, 0)
    w12 = w.rowsBetween(-11, 0)
    x2 = x.withColumn(
        "flip",
        F.when(F.col("diff") * F.lag("diff").over(w) < 0, 1).otherwise(0),
    )
    y = x2.select(
        "d",
        "n",
        "s",
        "s2",
        "side",
        F.sum(F.when(F.col("side") > 0, 1).otherwise(0)).over(w9).alias("pos9"),
        F.sum(F.when(F.col("side") < 0, 1).otherwise(0)).over(w9).alias("neg9"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).over(w5).alias("up5"),
        F.sum(F.when(F.col("diff") < 0, 1).otherwise(0)).over(w5).alias("dn5"),
        F.sum("flip").over(w12).alias("alt12"),
        F.row_number().over(w).alias("rn"),
    )
    d38 = "decimal(38,0)"
    r1 = (F.col("n") - 1) * F.col("side").cast(d38) * F.col("side") > 9 * F.col(
        "n"
    ) * (F.col("n") * F.col("s2") - F.col("s").cast(d38) * F.col("s"))
    return y.agg(
        F.max("n").alias("n_days"),
        F.sum(F.when(r1, 1).otherwise(0)).cast("long").alias("r1_beyond_3sigma"),
        F.sum(
            F.when((F.col("rn") >= 9) & ((F.col("pos9") == 9) | (F.col("neg9") == 9)), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("r2_nine_one_side"),
        F.sum(
            F.when((F.col("rn") >= 6) & ((F.col("up5") == 5) | (F.col("dn5") == 5)), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("r3_six_trending"),
        F.sum(F.when((F.col("rn") >= 14) & (F.col("alt12") == 12), 1).otherwise(0))
        .cast("long")
        .alias("r4_fourteen_alternating"),
    )


CATALOG["evt_nelson_rules_scan"].fn = _dnelson
