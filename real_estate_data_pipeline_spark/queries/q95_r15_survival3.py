"""Round-15 wave 15 (post-close): competing risks + epidemiology
rates — the discrete-time cumulative incidence function of inter-event
gaps by terminating event type (hour bands, censored at 8h), per-type
person-time incidence rates with Wald bands, the Mantel-Haenszel
common odds ratio with the Robins-Breslow-Greenland variance across
the 7 order-year strata, the Gehan-Breslow-Wilcoxon weighted log-rank
(whose expected term is EXACTLY integer: w = r makes w*e = r1*(d1+d2)),
and direct + indirect standardization (SMR) of per-segment urgent-order
rates over the order-year structure.

Exactness: hazards are integer ratios off bounded band histograms;
ln(1-h) snapped at 6dp micro-nats, survival re-exponentiated and
snapped at 6dp (the q25 engine-exp precedent), CIF increments
pico-quantized before the per-type running sum; Mantel-Haenszel R/S
terms via exact BIGINT integer division (a*d*1e6 div n), RBG variance
terms nano-quantized per stratum; Gehan's U is a pure integer
(sum (r1+r2) d1 - sum r1 (d1+d2)); standardized rates via integer-
division rate9/weight9 products summed in decimal-38.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# Per-user consecutive gaps carrying the TERMINATING event's type
# (the "cause" of the recurrence), integer seconds.
_GAPS_T_CTE = """ev AS (
      SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
             event_id, event_type
      FROM events
    ),
    gaps AS (
      SELECT sec - LAG(sec) OVER (PARTITION BY user_id
                                  ORDER BY sec, event_id) AS g,
             event_type AS et
      FROM ev
    ),
    gp AS (SELECT LEAST(g // 3600, 8) AS hb, et FROM gaps WHERE g IS NOT NULL)"""


register(
    "evt_cif_competing_hours",
    # Discrete-time competing-risks analysis of inter-event gaps: the
    # terminating event's type is the cause, hour bands 0..7 are the
    # event times, gaps >= 8h are right-censored at band 8 (they stay
    # in every risk set, never fail).  Cause-specific hazard
    # h_k(d) = d_kd / R_d, overall survival S(d) = prod(1 - h(j)),
    # CIF_k(D) = sum_{d<=D} h_k(d) S(d-1) — the Aalen-Johansen
    # estimator at day-band granularity.  The full 8x5 grid is
    # densified so every (band, type) row exists.
    oracle=f"""
    WITH {_GAPS_T_CTE},
    hist AS (SELECT hb, CAST(COUNT(*) AS BIGINT) AS c FROM gp GROUP BY hb),
    risk AS (
      SELECT hb, CAST(SUM(c) OVER (ORDER BY hb DESC) AS BIGINT) AS r FROM hist
    ),
    dd AS (
      SELECT hb, CAST(COUNT(*) AS BIGINT) AS d FROM gp WHERE hb < 8 GROUP BY hb
    ),
    f8 AS (
      SELECT dd.hb, dd.d, risk.r,
             CAST(floor(round(ln(1 - CAST(dd.d AS DOUBLE) / risk.r), 6)
                        * 1000000 + 0.5) AS BIGINT) AS l6
      FROM dd JOIN risk USING (hb)
    ),
    sv AS (
      SELECT hb, d, r,
             CAST(floor(exp(CAST(SUM(l6) OVER (ORDER BY hb) AS DOUBLE)
                            / 1000000) * 1000000 + 0.5) AS BIGINT) AS s6
      FROM f8
    ),
    sp AS (
      SELECT hb, d, r, s6,
             LAG(s6, 1, 1000000) OVER (ORDER BY hb) AS s6p
      FROM sv
    ),
    types AS (SELECT DISTINCT event_type AS et FROM events),
    grid AS (SELECT sp.hb, sp.r, sp.s6, sp.s6p, types.et
             FROM sp CROSS JOIN types),
    kt AS (
      SELECT hb, et, CAST(COUNT(*) AS BIGINT) AS dk
      FROM gp WHERE hb < 8 GROUP BY hb, et
    ),
    j AS (
      SELECT g.hb, g.et, COALESCE(kt.dk, 0) AS dk, g.r, g.s6, g.s6p
      FROM grid g LEFT JOIN kt ON kt.hb = g.hb AND kt.et = g.et
    ),
    tt AS (
      SELECT hb, et, dk, r, s6,
             CAST(floor(CAST(dk AS DOUBLE) / r * s6p / 1e6 * 1e9 + 0.5)
               AS BIGINT) AS t9
      FROM j
    )
    SELECT hb AS hour_band, et AS event_type,
           CAST(dk AS BIGINT) AS n_events, r AS n_at_risk,
           round(s6 / 1e6, 6) AS surv,
           round(SUM(t9) OVER (PARTITION BY et ORDER BY hb) / 1e9, 9) AS cif
    FROM tt ORDER BY et, hb
    """,
)


def _gaps_typed(spark, sf_dir):
    """Per-user consecutive gaps with the terminating event's type,
    banded to LEAST(hours, 8)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    base = ev.select(
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
        "event_id",
        "event_type",
    )
    return (
        base.select(
            (F.col("sec") - F.lag("sec").over(w)).alias("g"),
            F.col("event_type").alias("et"),
        )
        .filter(F.col("g").isNotNull())
        .select(F.least(F.expr("g div 3600"), F.lit(8)).alias("hb"), "et")
    )


def _dcif(spark, sf_dir):
    """Aalen-Johansen CIF by cause over the hour-band grid."""
    gp = _gaps_typed(spark, sf_dir).localCheckpoint(eager=False)
    hist = gp.groupBy("hb").agg(F.count("*").cast("long").alias("c"))
    wdesc = Window.orderBy(F.col("hb").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = hist.select("hb", F.sum("c").over(wdesc).cast("long").alias("r"))
    dd = (
        gp.filter(F.col("hb") < 8)
        .groupBy("hb")
        .agg(F.count("*").cast("long").alias("d"))
    )
    f8 = dd.join(risk, "hb").select(
        "hb",
        "d",
        "r",
        F.floor(
            F.round(F.log(1 - F.col("d").cast("double") / F.col("r")), 6)
            * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("l6"),
    )
    wasc = Window.orderBy("hb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sv = f8.select(
        "hb",
        "d",
        "r",
        F.floor(
            F.exp(F.sum("l6").over(wasc).cast("double") / F.lit(1000000))
            * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s6"),
    )
    sp = sv.select(
        "hb",
        "d",
        "r",
        "s6",
        F.lag("s6", 1, 1000000).over(Window.orderBy("hb")).alias("s6p"),
    ).localCheckpoint(eager=False)
    types = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("et")
    ).distinct()
    grid = sp.crossJoin(F.broadcast(types)).select("hb", "r", "s6", "s6p", "et")
    kt = (
        gp.filter(F.col("hb") < 8)
        .groupBy("hb", "et")
        .agg(F.count("*").cast("long").alias("dk"))
    )
    j = grid.join(F.broadcast(kt), ["hb", "et"], "left").select(
        "hb",
        "et",
        F.coalesce(F.col("dk"), F.lit(0)).alias("dk"),
        "r",
        "s6",
        "s6p",
    )
    tt = j.select(
        "hb",
        "et",
        "dk",
        "r",
        "s6",
        F.floor(
            F.col("dk").cast("double")
            / F.col("r")
            * F.col("s6p")
            / F.lit(1e6)
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t9"),
    )
    wcif = Window.partitionBy("et").orderBy("hb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return tt.select(
        F.col("hb").alias("hour_band"),
        F.col("et").alias("event_type"),
        F.col("dk").cast("long").alias("n_events"),
        F.col("r").alias("n_at_risk"),
        F.round(F.col("s6") / F.lit(1e6), 6).alias("surv"),
        F.round(F.sum("t9").over(wcif) / F.lit(1e9), 9).alias("cif"),
    ).orderBy("event_type", "hour_band")


CATALOG["evt_cif_competing_hours"].fn = _dcif


register(
    "evt_person_time_rates",
    # Person-time incidence rates per event type: recurrences (every
    # event after a user's first) over total observed person-time
    # (sum of per-user first-to-last spans), expressed per 1000
    # user-days with the Poisson Wald band.  Numerators and the
    # person-time denominator are exact integer sums; sqrt is IEEE.
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
             event_id, event_type
      FROM events
    ),
    sp AS (
      SELECT user_id, MAX(sec) - MIN(sec) AS span FROM ev GROUP BY user_id
    ),
    pt AS (SELECT CAST(SUM(span) AS BIGINT) AS pt FROM sp),
    rk AS (
      SELECT event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY sec, event_id) AS rn
      FROM ev
    ),
    rec AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM rk WHERE rn > 1 GROUP BY event_type
    )
    SELECT event_type, c AS n_recurrences,
           round(CAST(pt AS DOUBLE) / 86400, 6) AS person_days,
           round(CAST(c AS DOUBLE) * 86400000 / pt, 9) AS rate_per_1000_days,
           round(86400000 * sqrt(CAST(c AS DOUBLE)) / pt, 9) AS rate_se,
           round((c - 1.959964 * sqrt(CAST(c AS DOUBLE))) * 86400000 / pt, 9)
             AS rate_lo,
           round((c + 1.959964 * sqrt(CAST(c AS DOUBLE))) * 86400000 / pt, 9)
             AS rate_hi
    FROM rec CROSS JOIN pt ORDER BY event_type
    """,
)


def _dptrates(spark, sf_dir):
    """Per-type recurrence rates over global person-time."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
        "event_id",
        "event_type",
    ).localCheckpoint(eager=False)
    pt = base.groupBy("user_id").agg(
        (F.max("sec") - F.min("sec")).alias("span")
    ).agg(F.sum("span").cast("long").alias("pt"))
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    rec = (
        base.select("event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") > 1)
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("c"))
    )
    cd = F.col("c").cast("double")
    return rec.crossJoin(F.broadcast(pt)).select(
        "event_type",
        F.col("c").alias("n_recurrences"),
        F.round(F.col("pt").cast("double") / F.lit(86400), 6).alias("person_days"),
        F.round(cd * 86400000 / F.col("pt"), 9).alias("rate_per_1000_days"),
        F.round(F.lit(86400000) * F.sqrt(cd) / F.col("pt"), 9).alias("rate_se"),
        F.round(
            (F.col("c") - 1.959964 * F.sqrt(cd)) * 86400000 / F.col("pt"), 9
        ).alias("rate_lo"),
        F.round(
            (F.col("c") + 1.959964 * F.sqrt(cd)) * 86400000 / F.col("pt"), 9
        ).alias("rate_hi"),
    ).orderBy("event_type")


CATALOG["evt_person_time_rates"].fn = _dptrates


# The urgent x above-global-median 2x2 per order year — the exact
# stratification ml_woolf_or_homogeneity tests for homogeneity; here
# it feeds the Mantel-Haenszel POOLED estimate.
_CMH_CELLS_CTE = """x AS MATERIALIZED (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    med AS (SELECT CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS m2 FROM x),
    cells AS (
      SELECT yr,
             CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM x CROSS JOIN med GROUP BY yr
    )"""


register(
    "ml_mantel_haenszel_or",
    # Mantel-Haenszel common odds ratio across the 7 order-year strata
    # of the urgent x above-median 2x2, with the Robins-Breslow-
    # Greenland variance of ln(OR_MH) and its 95% CI.  R_k = a d / n
    # and S_k = b c / n via EXACT BIGINT integer division at micro
    # scale; the three RBG numerator families (PR, PS+QR, QS) are
    # nano-quantized per stratum before the <=7-term integer sums.
    oracle=f"""
    WITH {_CMH_CELLS_CTE},
    q AS (SELECT a, b, c, d, a + b + c + d AS n FROM cells),
    tq AS (
      SELECT (a * d * 1000000) // n AS r6,
             (b * c * 1000000) // n AS s6,
             CAST(floor(CAST(a + d AS DOUBLE) * a * d
                        / (CAST(n AS DOUBLE) * n) * 1e9 + 0.5) AS BIGINT) AS pr9,
             CAST(floor((CAST(a + d AS DOUBLE) * b * c
                         + CAST(b + c AS DOUBLE) * a * d)
                        / (CAST(n AS DOUBLE) * n) * 1e9 + 0.5) AS BIGINT)
               AS psqr9,
             CAST(floor(CAST(b + c AS DOUBLE) * b * c
                        / (CAST(n AS DOUBLE) * n) * 1e9 + 0.5) AS BIGINT) AS qs9
      FROM q
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(r6) AS BIGINT) AS sr6, CAST(SUM(s6) AS BIGINT) AS ss6,
             CAST(SUM(pr9) AS BIGINT) AS spr9,
             CAST(SUM(psqr9) AS BIGINT) AS spsqr9,
             CAST(SUM(qs9) AS BIGINT) AS sqs9
      FROM tq
    )
    SELECT k AS k_strata,
           round(CAST(sr6 AS DOUBLE) / ss6, 9) AS or_mh,
           round(ln(CAST(sr6 AS DOUBLE) / ss6), 6) AS ln_or_mh,
           round(sqrt((spr9 / 1e9) / (2 * (sr6 / 1e6) * (sr6 / 1e6))
                      + (spsqr9 / 1e9) / (2 * (sr6 / 1e6) * (ss6 / 1e6))
                      + (sqs9 / 1e9) / (2 * (ss6 / 1e6) * (ss6 / 1e6))), 9)
             AS rbg_se,
           round(exp(round(ln(CAST(sr6 AS DOUBLE) / ss6), 6)
                     - 1.959964
                       * sqrt((spr9 / 1e9) / (2 * (sr6 / 1e6) * (sr6 / 1e6))
                              + (spsqr9 / 1e9)
                                / (2 * (sr6 / 1e6) * (ss6 / 1e6))
                              + (sqs9 / 1e9)
                                / (2 * (ss6 / 1e6) * (ss6 / 1e6)))), 6)
             AS or_lo,
           round(exp(round(ln(CAST(sr6 AS DOUBLE) / ss6), 6)
                     + 1.959964
                       * sqrt((spr9 / 1e9) / (2 * (sr6 / 1e6) * (sr6 / 1e6))
                              + (spsqr9 / 1e9)
                                / (2 * (sr6 / 1e6) * (ss6 / 1e6))
                              + (sqs9 / 1e9)
                                / (2 * (ss6 / 1e6) * (ss6 / 1e6)))), 6)
             AS or_hi
    FROM m
    """,
)


def _cmh_cells(spark, sf_dir):
    """The urgent x above-median 2x2 per order year (Woolf's strata)."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "urgent"
        ),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    med = x.agg((2 * F.percentile("cents", 0.5)).cast("long").alias("m2"))
    hi = 2 * F.col("cents") > F.col("m2")
    lo = 2 * F.col("cents") <= F.col("m2")
    return (
        x.crossJoin(F.broadcast(med))
        .groupBy("yr")
        .agg(
            F.sum(F.when((F.col("urgent") == 1) & hi, 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when((F.col("urgent") == 1) & lo, 1).otherwise(0))
            .cast("long")
            .alias("b"),
            F.sum(F.when((F.col("urgent") == 0) & hi, 1).otherwise(0))
            .cast("long")
            .alias("c"),
            F.sum(F.when((F.col("urgent") == 0) & lo, 1).otherwise(0))
            .cast("long")
            .alias("d"),
        )
    )


def _dmh(spark, sf_dir):
    """MH pooled OR + RBG variance across the year strata."""
    cells = _cmh_cells(spark, sf_dir)
    q = cells.select("a", "b", "c", "d", (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("n"))
    nd = F.col("n").cast("double") * F.col("n")
    tq = q.select(
        F.expr("(a * d * 1000000) div n").alias("r6"),
        F.expr("(b * c * 1000000) div n").alias("s6"),
        F.floor(
            (F.col("a") + F.col("d")).cast("double") * F.col("a") * F.col("d") / nd
            * F.lit(1e9) + F.lit(0.5)
        ).cast("long").alias("pr9"),
        F.floor(
            (
                (F.col("a") + F.col("d")).cast("double") * F.col("b") * F.col("c")
                + (F.col("b") + F.col("c")).cast("double") * F.col("a") * F.col("d")
            ) / nd * F.lit(1e9) + F.lit(0.5)
        ).cast("long").alias("psqr9"),
        F.floor(
            (F.col("b") + F.col("c")).cast("double") * F.col("b") * F.col("c") / nd
            * F.lit(1e9) + F.lit(0.5)
        ).cast("long").alias("qs9"),
    )
    m = tq.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("r6").cast("long").alias("sr6"),
        F.sum("s6").cast("long").alias("ss6"),
        F.sum("pr9").cast("long").alias("spr9"),
        F.sum("psqr9").cast("long").alias("spsqr9"),
        F.sum("qs9").cast("long").alias("sqs9"),
    )
    orr = F.col("sr6").cast("double") / F.col("ss6")
    lnor = F.round(F.log(orr), 6)
    var = (
        (F.col("spr9") / F.lit(1e9))
        / (2 * (F.col("sr6") / F.lit(1e6)) * (F.col("sr6") / F.lit(1e6)))
        + (F.col("spsqr9") / F.lit(1e9))
        / (2 * (F.col("sr6") / F.lit(1e6)) * (F.col("ss6") / F.lit(1e6)))
        + (F.col("sqs9") / F.lit(1e9))
        / (2 * (F.col("ss6") / F.lit(1e6)) * (F.col("ss6") / F.lit(1e6)))
    )
    se = F.sqrt(var)
    return m.select(
        F.col("k").alias("k_strata"),
        F.round(orr, 9).alias("or_mh"),
        lnor.alias("ln_or_mh"),
        F.round(se, 9).alias("rbg_se"),
        F.round(F.exp(lnor - 1.959964 * se), 6).alias("or_lo"),
        F.round(F.exp(lnor + 1.959964 * se), 6).alias("or_hi"),
    )


CATALOG["ml_mantel_haenszel_or"].fn = _dmh


register(
    "ml_gehan_wilcoxon_segments",
    # Gehan-Breslow-Wilcoxon weighted log-rank between BUILDING and
    # AUTOMOBILE customers on the q50 duration histogram (days first
    # to last order, censored at the 2001-01-01 horizon).  The weight
    # w_t = r1+r2 makes the expected term EXACTLY integer:
    # U = sum (r1+r2) d1 - sum r1 (d1+d2); only the variance needs
    # one micro-quantized division per event time (by r-1).
    oracle="""
    WITH cu AS MATERIALIZED (
      SELECT c.c_mktsegment AS seg,
             CAST(date_diff('day', MIN(CAST(o.o_orderdate AS DATE)),
                            MAX(CAST(o.o_orderdate AS DATE))) AS BIGINT) AS dur,
             CASE WHEN MAX(o.o_orderdate) < TIMESTAMP '2001-01-01'
                  THEN 1 ELSE 0 END AS ev
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      GROUP BY c.c_custkey, c.c_mktsegment
    ),
    h AS MATERIALIZED (
      SELECT dur,
             CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(SUM(CASE WHEN seg = 'BUILDING' THEN ev ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT)
               AS c2,
             CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN ev ELSE 0 END)
               AS BIGINT) AS d2
      FROM cu GROUP BY dur
    ),
    rsk AS (
      SELECT dur, d1, d2,
             CAST(SUM(c1) OVER (ORDER BY dur DESC) AS BIGINT) AS r1,
             CAST(SUM(c2) OVER (ORDER BY dur DESC) AS BIGINT) AS r2
      FROM h
    ),
    terms AS (
      SELECT (r1 + r2) * d1 AS wo, r1 * (d1 + d2) AS we,
             CAST(floor(CAST(CAST(r1 AS HUGEINT) * r2 * (d1 + d2)
                             * ((r1 + r2) - (d1 + d2)) AS DOUBLE)
                        / (r1 + r2 - 1) * 1000000 + 0.5) AS HUGEINT) AS v6
      FROM rsk WHERE d1 + d2 > 0 AND r1 + r2 > 1
    ),
    agg AS (
      SELECT CAST(SUM(wo) AS BIGINT) AS swo, CAST(SUM(we) AS BIGINT) AS swe,
             SUM(v6) AS v6s
      FROM terms
    ),
    ns AS (
      SELECT CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END)
               AS BIGINT) AS n2
      FROM cu
    )
    SELECT ns.n1, ns.n2, CAST(agg.swo - agg.swe AS BIGINT) AS u_gehan,
           round((agg.swo - agg.swe)
                 / sqrt(CAST(agg.v6s AS DOUBLE) / 1e6), 6) AS z,
           round(CAST(agg.swo - agg.swe AS DOUBLE)
                 * (agg.swo - agg.swe)
                 / (CAST(agg.v6s AS DOUBLE) / 1e6), 6) AS gehan_chi2
    FROM ns CROSS JOIN agg
    """,
)


def _dgehan(spark, sf_dir):
    """Gehan-Breslow-Wilcoxon over the duration histogram."""
    d38 = "decimal(38,0)"
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
    o = t(spark, sf_dir, "orders")
    cu = (
        o.join(
            F.broadcast(c.select("c_custkey", F.col("c_mktsegment").alias("seg"))),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "seg")
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            .cast("long")
            .alias("dur"),
            F.when(
                F.max("o_orderdate") < F.lit("2001-01-01").cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("ev"),
        )
        .localCheckpoint(eager=False)
    )
    isb = (F.col("seg") == "BUILDING").cast("long")
    isa = (F.col("seg") == "AUTOMOBILE").cast("long")
    h = cu.groupBy("dur").agg(
        F.sum(isb).cast("long").alias("c1"),
        F.sum(isb * F.col("ev")).cast("long").alias("d1"),
        F.sum(isa).cast("long").alias("c2"),
        F.sum(isa * F.col("ev")).cast("long").alias("d2"),
    )
    wdesc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rsk = h.select(
        "dur",
        "d1",
        "d2",
        F.sum("c1").over(wdesc).cast("long").alias("r1"),
        F.sum("c2").over(wdesc).cast("long").alias("r2"),
    )
    dd = F.col("d1") + F.col("d2")
    rr = F.col("r1") + F.col("r2")
    terms = rsk.filter((dd > 0) & (rr > 1)).select(
        (rr * F.col("d1")).alias("wo"),
        (F.col("r1") * dd).alias("we"),
        F.floor(
            (F.col("r1").cast(d38) * F.col("r2") * dd * (rr - dd)).cast("double")
            / (rr - 1)
            * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast(d38)
        .alias("v6"),
    )
    agg = terms.agg(
        F.sum("wo").cast("long").alias("swo"),
        F.sum("we").cast("long").alias("swe"),
        F.sum("v6").alias("v6s"),
    )
    ns = cu.agg(
        F.sum(isb).cast("long").alias("n1"),
        F.sum(isa).cast("long").alias("n2"),
    )
    u = F.col("swo") - F.col("swe")
    v = F.col("v6s").cast("double") / F.lit(1e6)
    return ns.crossJoin(F.broadcast(agg)).select(
        "n1",
        "n2",
        u.cast("long").alias("u_gehan"),
        F.round(u / F.sqrt(v), 6).alias("z"),
        F.round(u.cast("double") * u / v, 6).alias("gehan_chi2"),
    )


CATALOG["ml_gehan_wilcoxon_segments"].fn = _dgehan


register(
    "cust_urgent_rate_direct_std",
    # Direct AND indirect standardization of per-segment urgent-order
    # rates over the order-year structure: std rate = sum_y rate9_{s,y}
    # * weight9_y (both EXACT BIGINT integer divisions at nano scale,
    # products summed in decimal-38); indirect = expected urgent from
    # the overall year rates, SMR = observed/expected.  The demography
    # workhorse pair for comparing groups with different time mixes.
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT c.c_mktsegment AS seg,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urg
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cells AS (
      SELECT seg, yr, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(urg) AS BIGINT) AS u
      FROM x GROUP BY 1, 2
    ),
    std AS (
      SELECT yr, CAST(SUM(n) AS BIGINT) AS ny, CAST(SUM(u) AS BIGINT) AS uy
      FROM cells GROUP BY yr
    ),
    tot AS (SELECT CAST(SUM(ny) AS BIGINT) AS nn FROM std),
    wy AS (
      SELECT yr, ny, (uy * 1000000000) // ny AS ry9,
             (ny * 1000000000) // nn AS w9
      FROM std CROSS JOIN tot
    ),
    ds AS (
      SELECT cells.seg,
             SUM(CAST((cells.u * 1000000000) // cells.n AS HUGEINT) * wy.w9)
               AS std18,
             CAST(SUM(cells.n * wy.ry9) AS BIGINT) AS e9
      FROM cells JOIN wy USING (yr) GROUP BY cells.seg
    ),
    cr AS (
      SELECT seg, CAST(SUM(n) AS BIGINT) AS ns, CAST(SUM(u) AS BIGINT) AS us
      FROM cells GROUP BY seg
    )
    SELECT cr.seg AS segment, cr.ns AS n_orders, cr.us AS n_urgent,
           round(CAST((us * 1000000000) // ns AS DOUBLE) / 1e9, 9) AS crude_rate,
           round(CAST(std18 AS DOUBLE) / 1e18, 9) AS std_rate,
           round(CAST(e9 AS DOUBLE) / 1e9, 6) AS expected_urgent,
           round(CAST(us AS DOUBLE) * 1e9 / e9, 9) AS smr
    FROM cr JOIN ds ON ds.seg = cr.seg ORDER BY segment
    """,
)


def _ddirectstd(spark, sf_dir):
    """Direct + indirect standardized urgent rates per segment."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    x = o.join(
        F.broadcast(c.select("c_custkey", F.col("c_mktsegment").alias("seg"))),
        o["o_custkey"] == F.col("c_custkey"),
    ).select(
        "seg",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("urg"),
    )
    cells = x.groupBy("seg", "yr").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("urg").cast("long").alias("u"),
    ).localCheckpoint(eager=False)
    std = cells.groupBy("yr").agg(
        F.sum("n").cast("long").alias("ny"), F.sum("u").cast("long").alias("uy")
    )
    tot = std.agg(F.sum("ny").cast("long").alias("nn"))
    wy = std.crossJoin(F.broadcast(tot)).select(
        "yr",
        "ny",
        F.expr("(uy * 1000000000) div ny").alias("ry9"),
        F.expr("(ny * 1000000000) div nn").alias("w9"),
    )
    ds = (
        cells.join(F.broadcast(wy), "yr")
        .groupBy("seg")
        .agg(
            F.sum(
                F.expr("(u * 1000000000) div n").cast(d38) * F.col("w9")
            ).alias("std18"),
            F.sum(F.col("n") * F.col("ry9")).cast("long").alias("e9"),
        )
    )
    cr = cells.groupBy("seg").agg(
        F.sum("n").cast("long").alias("ns"), F.sum("u").cast("long").alias("us")
    )
    return cr.join(F.broadcast(ds), "seg").select(
        F.col("seg").alias("segment"),
        F.col("ns").alias("n_orders"),
        F.col("us").alias("n_urgent"),
        F.round(
            F.expr("(us * 1000000000) div ns").cast("double") / F.lit(1e9), 9
        ).alias("crude_rate"),
        F.round(F.col("std18").cast("double") / F.lit(1e18), 9).alias("std_rate"),
        F.round(F.col("e9").cast("double") / F.lit(1e9), 6).alias(
            "expected_urgent"
        ),
        F.round(F.col("us").cast("double") * F.lit(1e9) / F.col("e9"), 9).alias(
            "smr"
        ),
    ).orderBy("segment")


CATALOG["cust_urgent_rate_direct_std"].fn = _ddirectstd
