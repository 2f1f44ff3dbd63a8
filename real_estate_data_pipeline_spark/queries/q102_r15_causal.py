"""Round-15 wave 22 (post-close): causal-inference estimators +
serial-number estimation — difference-in-differences on order value
(BUILDING vs rest, pre/post 1998), interrupted time series on the
daily event counts (two exact segment lines around the day-15 cut:
level jump + slope change), a sharp regression-discontinuity estimate
at the median order price (local linear fits on both sides within a
snapped-cent bandwidth, outcome = the order's average lineitem
discount), propensity-style subclassification (the urgent-vs-not ship
-lag effect stratified on order-size quintiles, strata weights n_s/N),
and the German-tank MVUE of the customer population from a sha2 10%
sample of consecutive custkey serials (m(k+1)/k - 1 vs the moment and
ML estimators, against the in-data truth).

Exactness: every cell/segment statistic is an exact integer moment
(cents, micro-discounts via integer division, integer day lags); the
segment lines use the cleared Cramer moments of the q49 daily-trend
shape; RDD/ITS jumps assemble from those moments in one deterministic
double expression; quintile cuts snap type-7 percentiles to integer
cents (the wave-19 precedent); per-stratum ATE terms are
nano-quantized before the 5-term integer sum.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t


register(
    "ml_diff_in_diff_segments",
    # Difference-in-differences: treatment = BUILDING-segment
    # customers, pre/post = order year < 1998 vs >= 1998, outcome =
    # mean order value.  The 2x2 of exact cent sums, the four cell
    # means, and DiD = (T1 - T0) - (C1 - C0) — the parallel-trends
    # workhorse in one aggregate.
    oracle="""
    WITH x AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS tr,
             CASE WHEN EXTRACT(year FROM o.o_orderdate) >= 1998
                  THEN 1 ELSE 0 END AS post,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
      SELECT tr, post, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM x GROUP BY tr, post
    ),
    p AS (
      SELECT
        MAX(CASE WHEN tr = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS t0,
        MAX(CASE WHEN tr = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS t1,
        MAX(CASE WHEN tr = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS c0,
        MAX(CASE WHEN tr = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS c1,
        CAST(SUM(n) AS BIGINT) AS n_orders
      FROM cells
    )
    SELECT n_orders,
           round(t0 / 100, 2) AS treat_pre_mean,
           round(t1 / 100, 2) AS treat_post_mean,
           round(c0 / 100, 2) AS control_pre_mean,
           round(c1 / 100, 2) AS control_post_mean,
           round(((t1 - t0) - (c1 - c0)) / 100, 6) AS did_dollars
    FROM p
    """,
)


def _ddid(spark, sf_dir):
    """2x2 DiD of order value on the BUILDING x post-1998 split."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    x = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("tr"),
        F.when(F.year("o_orderdate") >= 1998, 1).otherwise(0).alias("post"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    )
    cells = x.groupBy("tr", "post").agg(
        F.count("*").cast("long").alias("n"), F.sum("cents").cast("long").alias("s")
    )

    def cell(tr, post):
        return F.max(
            F.when(
                (F.col("tr") == tr) & (F.col("post") == post),
                F.col("s").cast("double") / F.col("n"),
            )
        )

    p = cells.agg(
        cell(1, 0).alias("t0"),
        cell(1, 1).alias("t1"),
        cell(0, 0).alias("c0"),
        cell(0, 1).alias("c1"),
        F.sum("n").cast("long").alias("n_orders"),
    )
    return p.select(
        "n_orders",
        F.round(F.col("t0") / 100, 2).alias("treat_pre_mean"),
        F.round(F.col("t1") / 100, 2).alias("treat_post_mean"),
        F.round(F.col("c0") / 100, 2).alias("control_pre_mean"),
        F.round(F.col("c1") / 100, 2).alias("control_post_mean"),
        F.round(
            ((F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0"))) / 100, 6
        ).alias("did_dollars"),
    )


CATALOG["ml_diff_in_diff_segments"].fn = _ddid


register(
    "ml_its_segmented_daily",
    # Interrupted time series on daily event counts with the cut at
    # day offset 15: exact Cramer lines on each segment (the q49
    # daily-trend moments), reporting pre/post slopes, the slope
    # change, and the level jump at the cut (post intercept at x=15
    # minus the pre line extrapolated to 15) — the segmented-
    # regression readout of a mid-window intervention.
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS dy, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    d0 AS (SELECT MIN(dy) AS d0 FROM d),
    p AS (
      SELECT CAST(date_diff('day', d0.d0, d.dy) AS BIGINT) AS x, d.y,
             CASE WHEN date_diff('day', d0.d0, d.dy) >= 15
                  THEN 1 ELSE 0 END AS seg
      FROM d CROSS JOIN d0
    ),
    m AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM p GROUP BY seg
    ),
    fit AS (
      SELECT seg,
             CAST(k * sxy - sx * sy AS DOUBLE)
               / CAST(k * sxx - sx * sx AS DOUBLE) AS b,
             (CAST(sy AS DOUBLE)
              - CAST(k * sxy - sx * sy AS DOUBLE)
                / CAST(k * sxx - sx * sx AS DOUBLE) * sx) / k AS a
      FROM m
    ),
    w AS (
      SELECT
        MAX(CASE WHEN seg = 0 THEN b END) AS b0,
        MAX(CASE WHEN seg = 0 THEN a END) AS a0,
        MAX(CASE WHEN seg = 1 THEN b END) AS b1,
        MAX(CASE WHEN seg = 1 THEN a END) AS a1
      FROM fit
    )
    SELECT round(b0, 9) AS pre_slope, round(b1, 9) AS post_slope,
           round(b1 - b0, 9) AS slope_change,
           round((a1 + 15 * b1) - (a0 + 15 * b0), 6) AS level_jump_at_cut
    FROM w
    """,
)


def _dits(spark, sf_dir):
    """Two exact segment lines around the day-15 cut."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("dy")).agg(
        F.count("*").cast("long").alias("y")
    )
    d0 = d.agg(F.min("dy").alias("d0"))
    p = d.crossJoin(F.broadcast(d0)).select(
        F.datediff(F.col("dy").cast("date"), F.col("d0").cast("date"))
        .cast("long")
        .alias("x"),
        "y",
    ).select("x", "y", F.when(F.col("x") >= 15, 1).otherwise(0).alias("seg"))
    m = p.groupBy("seg").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    b = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    a = (F.col("sy").cast("double") - b * F.col("sx")) / F.col("k")
    fit = m.select("seg", b.alias("b"), a.alias("a"))
    w = fit.agg(
        F.max(F.when(F.col("seg") == 0, F.col("b"))).alias("b0"),
        F.max(F.when(F.col("seg") == 0, F.col("a"))).alias("a0"),
        F.max(F.when(F.col("seg") == 1, F.col("b"))).alias("b1"),
        F.max(F.when(F.col("seg") == 1, F.col("a"))).alias("a1"),
    )
    return w.select(
        F.round(F.col("b0"), 9).alias("pre_slope"),
        F.round(F.col("b1"), 9).alias("post_slope"),
        F.round(F.col("b1") - F.col("b0"), 9).alias("slope_change"),
        F.round(
            (F.col("a1") + 15 * F.col("b1")) - (F.col("a0") + 15 * F.col("b0")), 6
        ).alias("level_jump_at_cut"),
    )


CATALOG["ml_its_segmented_daily"].fn = _dits


register(
    "ml_rdd_sharp_median_price",
    # Sharp regression discontinuity at the median order price:
    # running variable = order cents minus the snapped median cutoff,
    # outcome = the order's average lineitem discount (exact
    # micro-discount integer division), bandwidth = the snapped
    # 25th-75th percentile half-width.  Local linear fits on each
    # side (cleared Cramer moments; x in cents can reach 1e7 so the
    # x-moments ride decimal-38), jump = intercept difference at the
    # cutoff.
    oracle="""
    WITH od AS MATERIALIZED (
      SELECT o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             (CAST(SUM(CAST(CAST(l.l_discount AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS BIGINT) * 10000)
               // CAST(COUNT(*) AS BIGINT) AS ymic
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    ),
    cut AS (
      SELECT CAST(floor(quantile_cont(cents, 0.5) + 0.5) AS BIGINT) AS c0,
             CAST(floor((quantile_cont(cents, 0.75)
                         - quantile_cont(cents, 0.25)) / 2 + 0.5) AS BIGINT)
               AS h
      FROM od
    ),
    win AS (
      SELECT od.cents - cut.c0 AS x, od.ymic AS y,
             CASE WHEN od.cents > cut.c0 THEN 1 ELSE 0 END AS side
      FROM od CROSS JOIN cut
      WHERE ABS(od.cents - cut.c0) <= cut.h
    ),
    m AS (
      SELECT side, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM win GROUP BY side
    ),
    fit AS (
      SELECT side,
             CAST(k * sxy - sx * sy AS DOUBLE)
               / CAST(k * sxx - sx * sx AS DOUBLE) AS b,
             (CAST(sy AS DOUBLE)
              - CAST(k * sxy - sx * sy AS DOUBLE)
                / CAST(k * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / k
               AS a,
             k
      FROM m
    ),
    w AS (
      SELECT MAX(CASE WHEN side = 0 THEN a END) AS a_lo,
             MAX(CASE WHEN side = 1 THEN a END) AS a_hi,
             MAX(CASE WHEN side = 0 THEN k END) AS n_lo,
             MAX(CASE WHEN side = 1 THEN k END) AS n_hi
      FROM fit
    )
    SELECT w.n_lo, w.n_hi,
           round(cut.c0 / 100.0, 2) AS cutoff_dollars,
           round(cut.h / 100.0, 2) AS bandwidth_dollars,
           round(w.a_lo / 1e6, 9) AS discount_at_cut_below,
           round(w.a_hi / 1e6, 9) AS discount_at_cut_above,
           round((w.a_hi - w.a_lo) / 1e6, 9) AS rdd_jump
    FROM w CROSS JOIN cut
    """,
)


def _drdd(spark, sf_dir):
    """Local linear fits on both sides of the snapped median cutoff."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    od = (
        li.join(
            o.select(
                "o_orderkey",
                (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "cents")
        .agg(
            F.expr(
                "(CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))"
                " AS BIGINT) * 10000) div count(*)"
            ).alias("ymic")
        )
        .localCheckpoint(eager=False)
    )
    cut = od.agg(
        F.floor(F.percentile("cents", 0.5) + 0.5).cast("long").alias("c0"),
        F.floor(
            (F.percentile("cents", 0.75) - F.percentile("cents", 0.25)) / 2 + 0.5
        )
        .cast("long")
        .alias("h"),
    )
    win = (
        od.crossJoin(F.broadcast(cut))
        .filter(F.abs(F.col("cents") - F.col("c0")) <= F.col("h"))
        .select(
            (F.col("cents") - F.col("c0")).alias("x"),
            F.col("ymic").alias("y"),
            F.when(F.col("cents") > F.col("c0"), 1).otherwise(0).alias("side"),
        )
    )
    m = win.groupBy("side").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    b = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / F.col("k")
    fit = m.select("side", a.alias("a"), F.col("k"))
    w = fit.agg(
        F.max(F.when(F.col("side") == 0, F.col("a"))).alias("a_lo"),
        F.max(F.when(F.col("side") == 1, F.col("a"))).alias("a_hi"),
        F.max(F.when(F.col("side") == 0, F.col("k"))).alias("n_lo"),
        F.max(F.when(F.col("side") == 1, F.col("k"))).alias("n_hi"),
    )
    return w.crossJoin(F.broadcast(cut)).select(
        "n_lo",
        "n_hi",
        F.round(F.col("c0") / F.lit(100.0), 2).alias("cutoff_dollars"),
        F.round(F.col("h") / F.lit(100.0), 2).alias("bandwidth_dollars"),
        F.round(F.col("a_lo") / F.lit(1e6), 9).alias("discount_at_cut_below"),
        F.round(F.col("a_hi") / F.lit(1e6), 9).alias("discount_at_cut_above"),
        F.round((F.col("a_hi") - F.col("a_lo")) / F.lit(1e6), 9).alias("rdd_jump"),
    )


CATALOG["ml_rdd_sharp_median_price"].fn = _drdd


register(
    "ml_propensity_strat_ate",
    # Subclassification ATE: the effect of URGENT priority on the
    # order's minimum ship lag (days), stratified on order-size
    # quintiles (snapped type-7 cuts) — the stratified estimator that
    # removes the size confound a naive T-C difference keeps.  Per-
    # stratum diffs nano-quantized before the 5-term weighted sum;
    # the naive difference is emitted for contrast.
    oracle="""
    WITH ol AS MATERIALIZED (
      SELECT o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS tr,
             CAST(MIN(date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE))) AS BIGINT) AS lag
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderpriority
    ),
    cuts AS (
      SELECT CAST(floor(quantile_cont(cents, 0.2) + 0.5) AS BIGINT) AS q1,
             CAST(floor(quantile_cont(cents, 0.4) + 0.5) AS BIGINT) AS q2,
             CAST(floor(quantile_cont(cents, 0.6) + 0.5) AS BIGINT) AS q3,
             CAST(floor(quantile_cont(cents, 0.8) + 0.5) AS BIGINT) AS q4
      FROM ol
    ),
    st AS (
      SELECT CASE WHEN cents <= q1 THEN 1 WHEN cents <= q2 THEN 2
                  WHEN cents <= q3 THEN 3 WHEN cents <= q4 THEN 4
                  ELSE 5 END AS stratum,
             tr, lag
      FROM ol CROSS JOIN cuts
    ),
    cells AS (
      SELECT stratum,
             CAST(SUM(CASE WHEN tr = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
             CAST(SUM(CASE WHEN tr = 1 THEN lag ELSE 0 END) AS BIGINT) AS st_,
             CAST(SUM(CASE WHEN tr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN tr = 0 THEN lag ELSE 0 END) AS BIGINT) AS sc,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM st GROUP BY stratum
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
    terms AS (
      SELECT CAST(floor((CAST(st_ AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc)
                        * n * 1e9 / tot.nn + 0.5) AS BIGINT) AS t9
      FROM cells CROSS JOIN tot
    ),
    naive AS (
      SELECT CAST(SUM(CASE WHEN tr = 1 THEN lag END) AS DOUBLE)
             / SUM(CASE WHEN tr = 1 THEN 1 END)
             - CAST(SUM(CASE WHEN tr = 0 THEN lag END) AS DOUBLE)
               / SUM(CASE WHEN tr = 0 THEN 1 END) AS nd
      FROM st
    )
    SELECT (SELECT nn FROM tot) AS n_orders,
           round(naive.nd, 9) AS naive_diff_days,
           round(CAST(SUM(terms.t9) AS DOUBLE) / 1e9, 9)
             AS stratified_ate_days
    FROM terms CROSS JOIN naive GROUP BY naive.nd
    """,
)


def _dpropensity(spark, sf_dir):
    """Quintile-subclassified urgent-vs-not ship-lag ATE."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    ol = (
        li.join(
            o.select(
                "o_orderkey",
                (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
                F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                .otherwise(0)
                .alias("tr"),
                "o_orderdate",
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "cents", "tr")
        .agg(
            F.min(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            )
            .cast("long")
            .alias("lag")
        )
        .localCheckpoint(eager=False)
    )
    cuts = ol.agg(
        *[
            F.floor(F.percentile("cents", q) + 0.5).cast("long").alias(f"q{i}")
            for i, q in enumerate((0.2, 0.4, 0.6, 0.8), 1)
        ]
    )
    st = ol.crossJoin(F.broadcast(cuts)).select(
        F.when(F.col("cents") <= F.col("q1"), 1)
        .when(F.col("cents") <= F.col("q2"), 2)
        .when(F.col("cents") <= F.col("q3"), 3)
        .when(F.col("cents") <= F.col("q4"), 4)
        .otherwise(5)
        .alias("stratum"),
        "tr",
        "lag",
    ).localCheckpoint(eager=False)
    cells = st.groupBy("stratum").agg(
        F.sum(F.when(F.col("tr") == 1, 1).otherwise(0)).cast("long").alias("nt"),
        F.sum(F.when(F.col("tr") == 1, F.col("lag")).otherwise(0))
        .cast("long")
        .alias("st_"),
        F.sum(F.when(F.col("tr") == 0, 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(F.col("tr") == 0, F.col("lag")).otherwise(0))
        .cast("long")
        .alias("sc"),
        F.count("*").cast("long").alias("n"),
    )
    tot = cells.agg(F.sum("n").cast("long").alias("nn"))
    terms = cells.crossJoin(F.broadcast(tot)).select(
        "nn",
        F.floor(
            (
                F.col("st_").cast("double") / F.col("nt")
                - F.col("sc").cast("double") / F.col("nc")
            )
            * F.col("n")
            * F.lit(1e9)
            / F.col("nn")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t9"),
    )
    naive = st.agg(
        (
            F.sum(F.when(F.col("tr") == 1, F.col("lag"))).cast("double")
            / F.sum(F.when(F.col("tr") == 1, 1))
            - F.sum(F.when(F.col("tr") == 0, F.col("lag"))).cast("double")
            / F.sum(F.when(F.col("tr") == 0, 1))
        ).alias("nd")
    )
    return (
        terms.groupBy("nn")
        .agg(F.sum("t9").cast("long").alias("st9"))
        .crossJoin(F.broadcast(naive))
        .select(
            F.col("nn").alias("n_orders"),
            F.round(F.col("nd"), 9).alias("naive_diff_days"),
            F.round(F.col("st9").cast("double") / F.lit(1e9), 9).alias(
                "stratified_ate_days"
            ),
        )
    )


CATALOG["ml_propensity_strat_ate"].fn = _dpropensity


register(
    "cust_german_tank_estimate",
    # The German-tank (serial-number) problem on the consecutive
    # custkey serials (s = c_custkey + 1 runs 1..N): from a
    # deterministic sha2 10% sample, estimate N by the MVUE
    # m(k+1)/k - 1, the method of moments 2 mean - 1, and the MLE m,
    # against the in-data truth — the classic order-statistics
    # estimator, exact integer rationals throughout.
    oracle="""
    WITH s AS (
      SELECT c_custkey + 1 AS serial FROM customer
      WHERE ('0x' || substr(sha256(CAST(c_custkey AS VARCHAR) || 'tank15'),
                            1, 8))::UBIGINT < 429496730
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(serial) AS BIGINT) AS m,
             CAST(SUM(serial) AS BIGINT) AS ss
      FROM s
    ),
    tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer)
    SELECT tr.n AS true_n, agg.k AS n_sample, agg.m AS sample_max,
           round(CAST(agg.m AS DOUBLE) * (agg.k + 1) / agg.k - 1, 6)
             AS mvue_estimate,
           round(2.0 * agg.ss / agg.k - 1, 6) AS moment_estimate,
           round((CAST(agg.m AS DOUBLE) * (agg.k + 1) / agg.k - 1 - tr.n)
                 / tr.n, 9) AS mvue_rel_err,
           round((2.0 * agg.ss / agg.k - 1 - tr.n) / tr.n, 9)
             AS moment_rel_err
    FROM agg CROSS JOIN tr
    """,
)


def _dtank(spark, sf_dir):
    """German-tank MVUE/moment/MLE off the sha2 custkey sample."""
    c = t(spark, sf_dir, "customer")
    hv = F.conv(
        F.substring(
            F.sha2(
                F.concat(F.col("c_custkey").cast("string"), F.lit("tank15")), 256
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    s = c.filter(hv < F.lit(429496730)).select(
        (F.col("c_custkey") + 1).alias("serial")
    )
    agg = s.agg(
        F.count("*").cast("long").alias("k"),
        F.max("serial").cast("long").alias("m"),
        F.sum("serial").cast("long").alias("ss"),
    )
    tr = c.agg(F.count("*").cast("long").alias("n"))
    mvue = F.col("m").cast("double") * (F.col("k") + 1) / F.col("k") - 1
    mom = 2.0 * F.col("ss") / F.col("k") - 1
    return agg.crossJoin(F.broadcast(tr)).select(
        F.col("n").alias("true_n"),
        F.col("k").alias("n_sample"),
        F.col("m").alias("sample_max"),
        F.round(mvue, 6).alias("mvue_estimate"),
        F.round(mom, 6).alias("moment_estimate"),
        F.round((mvue - F.col("n")) / F.col("n"), 9).alias("mvue_rel_err"),
        F.round((mom - F.col("n")) / F.col("n"), 9).alias("moment_rel_err"),
    )


CATALOG["cust_german_tank_estimate"].fn = _dtank
