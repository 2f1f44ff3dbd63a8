"""Split from queries.py lines 32850-33425 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from .q15_curation_r3 import _events_stream_schema, _run_stream_to_memory, _stream_file_source
from .q18_r7_timeseries import _ewma_terms

# ===========================================================================
# Round-12 wave 3: monitoring / survival / robust-outlier family, plus the
# TWENTIETH streaming run. Everything reduces to calendar-bounded frames
# (day aggregates, duration histograms, gap-minute histograms) before any
# window or scalar work — the raw streams only ever see one GROUP BY.
# ===========================================================================

# EWMA control-chart width: 3*sqrt(lambda/(2-lambda)) for lambda=0.25 is
# irrational — quantized ONCE here and fed to both engines as the same
# literal (the teleport-constant lesson from the PageRank family).
_EWMACC_K = 1.133893419  # round(3*sqrt(1/7), 9)
_EWMACC_WIN = "(ORDER BY day)"
_EWMACC_NUM, _EWMACC_DEN = _ewma_terms("y", _EWMACC_WIN)

register(
    "evt_ewma_control_chart",
    # the EWMA twin of the SPC individuals chart: the 8-tap truncated
    # EWMA (alpha=0.25) of daily event counts against steady-state
    # control limits mu +- 3*sigma*sqrt(lam/(2-lam)). The daily counts
    # are exact integers, mu/sigma come from exact moments of the day
    # aggregate, the limit width constant is pinned (_EWMACC_K), and
    # the out-of-control flag compares deterministic doubles.
    oracle=f"""
    WITH d AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    mo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
             SUM(CAST(y AS HUGEINT) * y) AS q
      FROM d
    ),
    lim AS (
      SELECT CAST(s AS DOUBLE) / n AS mu,
             CAST({_EWMACC_K!r} AS DOUBLE)
               * sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) AS half
      FROM mo
    ),
    ew AS (
      SELECT day, y, (({_EWMACC_NUM}) / ({_EWMACC_DEN})) AS ewma FROM d
    )
    SELECT strftime(day, '%Y-%m-%d') AS day_s, y,
           round(ewma, 6) AS ewma8,
           round(mu + half, 6) AS ucl, round(mu - half, 6) AS lcl,
           CAST(CASE WHEN ewma > mu + half OR ewma < mu - half
                     THEN 1 ELSE 0 END AS BIGINT) AS oob
    FROM ew CROSS JOIN lim
    ORDER BY day
    """,
)


def _dewmacc(spark, sf_dir):
    """EWMA control chart: one day-keyed count aggregate, the unrolled
    8-tap filter over the bounded day frame, steady-state limits from
    one exact-moment row broadcast to every day."""
    ev = t(spark, sf_dir, "events")
    d19 = "decimal(19,0)"
    d = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("y"))
        .localCheckpoint(eager=False)
    )
    mo = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19)).alias("q"),
    )
    lim = mo.select(
        (F.col("s").cast("double") / F.col("n")).alias("mu"),
        (
            F.lit(_EWMACC_K)
            * F.sqrt(
                (F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
                / (F.col("n") - 1)
            )
        ).alias("half"),
    )
    ew = d.select(
        "day", "y", F.expr(f"(({_EWMACC_NUM}) / ({_EWMACC_DEN}))").alias("ewma")
    )
    out = ew.crossJoin(F.broadcast(lim))
    oob = (F.col("ewma") > F.col("mu") + F.col("half")) | (
        F.col("ewma") < F.col("mu") - F.col("half")
    )
    return (
        out.select(
            F.date_format("day", "yyyy-MM-dd").alias("day_s"),
            "y",
            F.round("ewma", 6).alias("ewma8"),
            F.round(F.col("mu") + F.col("half"), 6).alias("ucl"),
            F.round(F.col("mu") - F.col("half"), 6).alias("lcl"),
            F.when(oob, 1).otherwise(0).cast("long").alias("oob"),
            F.col("day"),
        )
        .orderBy("day")
        .drop("day")
    )


CATALOG["evt_ewma_control_chart"].fn = _dewmacc


register(
    "evt_hampel_outliers_daily",
    # Hampel-style robust outlier scan of the daily series: rolling
    # 7-day exact median as the local level, a GLOBAL MAD as the
    # robust scale (both medians of integer-valued frames, so the
    # doubled deviations are exact integers), and the 3-sigma-
    # equivalent threshold 3*1.4826 pinned as one literal. Flags the
    # days a z-score chart misses when the mean itself is dragged.
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT quantile_cont(y, 0.5) AS gmed FROM d
    ),
    dev AS (
      SELECT abs(2 * d.y - 2 * g.gmed) AS dev2 FROM d CROSS JOIN g
    ),
    mad AS (
      SELECT quantile_cont(dev2, 0.5) AS mad2 FROM dev
    ),
    r AS (
      SELECT day, y,
             quantile_cont(y, 0.5) OVER (
               ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS rmed
      FROM d
    )
    SELECT strftime(day, '%Y-%m-%d') AS day_s, y,
           round(rmed, 6) AS rolling_median,
           round(abs(2 * y - 2 * rmed) / 2.0, 6) AS deviation,
           round(CAST(4.4478 AS DOUBLE) * mad.mad2 / 2.0, 6) AS threshold,
           CAST(CASE WHEN abs(2 * y - 2 * rmed) > CAST(4.4478 AS DOUBLE) * mad.mad2
                     THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM r CROSS JOIN mad
    ORDER BY day
    """,
)


def _dhampel(spark, sf_dir):
    """Hampel scan over the day aggregate: one 7-row window median,
    two scalar medians, exact doubled deviations."""
    ev = t(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").cast("long").alias("y"))
        .localCheckpoint(eager=False)
    )
    g = d.agg(F.percentile("y", F.lit(0.5)).alias("gmed"))
    dev = d.crossJoin(F.broadcast(g)).select(
        F.abs(2 * F.col("y") - 2 * F.col("gmed")).alias("dev2")
    )
    mad = dev.agg(F.percentile("dev2", F.lit(0.5)).alias("mad2"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    r = d.select("day", "y", F.percentile("y", F.lit(0.5)).over(w).alias("rmed"))
    out = r.crossJoin(F.broadcast(mad))
    dev2 = F.abs(2 * F.col("y") - 2 * F.col("rmed"))
    thr = F.lit(4.4478) * F.col("mad2")
    return (
        out.select(
            F.date_format("day", "yyyy-MM-dd").alias("day_s"),
            "y",
            F.round("rmed", 6).alias("rolling_median"),
            F.round(dev2 / 2.0, 6).alias("deviation"),
            F.round(thr / 2.0, 6).alias("threshold"),
            F.when(dev2 > thr, 1).otherwise(0).cast("long").alias("is_outlier"),
            "day",
        )
        .orderBy("day")
        .drop("day")
    )


CATALOG["evt_hampel_outliers_daily"].fn = _dhampel


register(
    "ml_logrank_test_segments",
    # the log-rank test — the score test of a Cox proportional-hazards
    # model with one binary covariate — between BUILDING and AUTOMOBILE
    # customers on "days from first to last order", censored at the
    # 2001-01-01 horizon. Risk sets are suffix sums over the bounded
    # duration histogram (never raw rows); each event time's expected
    # count and variance are micro-quantized deterministic doubles, so
    # the O-E and V accumulations are exact integer sums.
    oracle="""
    WITH cu AS MATERIALIZED (
      SELECT c.c_mktsegment AS seg,
             CAST(date_diff('day', MIN(CAST(o.o_orderdate AS DATE)),
                            MAX(CAST(o.o_orderdate AS DATE))) AS BIGINT) AS dur,
             CASE WHEN MAX(o.o_orderdate) < TIMESTAMP '2001-01-01' THEN 1 ELSE 0 END AS ev
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      GROUP BY c.c_custkey, c.c_mktsegment
    ),
    h AS MATERIALIZED (
      SELECT dur,
             CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN seg = 'BUILDING' THEN ev ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN ev ELSE 0 END) AS BIGINT) AS d2
      FROM cu GROUP BY dur
    ),
    rsk AS (
      SELECT dur, d1, d2,
             CAST(SUM(c1) OVER (ORDER BY dur DESC) AS BIGINT) AS r1,
             CAST(SUM(c2) OVER (ORDER BY dur DESC) AS BIGINT) AS r2
      FROM h
    ),
    terms AS (
      SELECT d1,
             CAST(floor(CAST(r1 * (d1 + d2) AS DOUBLE) / (r1 + r2) * 1000000 + 0.5) AS BIGINT) AS e6,
             CAST(floor(CAST(r1 AS DOUBLE) * r2 * (d1 + d2) * ((r1 + r2) - (d1 + d2))
                        / (CAST(r1 + r2 AS DOUBLE) * (r1 + r2) * ((r1 + r2) - 1))
                        * 1000000 + 0.5) AS BIGINT) AS v6
      FROM rsk WHERE d1 + d2 > 0 AND r1 + r2 > 1
    ),
    agg AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(e6) AS BIGINT) AS e6s,
             CAST(SUM(v6) AS BIGINT) AS v6s
      FROM terms
    ),
    ns AS (
      SELECT CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM cu
    )
    SELECT ns.n1, ns.n2, agg.o1 AS observed_1,
           round(agg.e6s / 1000000.0, 6) AS expected_1,
           round((agg.o1 - agg.e6s / 1000000.0) * (agg.o1 - agg.e6s / 1000000.0)
                 / (agg.v6s / 1000000.0), 6) AS logrank_chi2,
           round((agg.o1 - agg.e6s / 1000000.0) / sqrt(agg.v6s / 1000000.0), 6) AS z
    FROM ns CROSS JOIN agg
    """,
)


def _dlogrank(spark, sf_dir):
    """Log-rank via the duration histogram: one per-customer rollup,
    one pivoted histogram, suffix-sum risk sets over the bounded
    frame, micro-quantized per-time terms, exact integer sums."""
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
    o = t(spark, sf_dir, "orders")
    cu = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", F.col("c_mktsegment").alias("seg"))
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            .cast("long")
            .alias("dur"),
            F.when(F.max("o_orderdate") < F.lit("2001-01-01").cast("timestamp"), 1)
            .otherwise(0)
            .alias("ev"),
        )
        .localCheckpoint(eager=False)
    )
    is1 = F.col("seg") == "BUILDING"
    is2 = F.col("seg") == "AUTOMOBILE"
    h = cu.groupBy("dur").agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(is1, F.col("ev")).otherwise(0)).cast("long").alias("d1"),
        F.sum(F.when(is2, 1).otherwise(0)).cast("long").alias("c2"),
        F.sum(F.when(is2, F.col("ev")).otherwise(0)).cast("long").alias("d2"),
    )
    wdesc = Window.orderBy(F.desc("dur"))
    rsk = h.select(
        "dur",
        "d1",
        "d2",
        F.sum("c1").over(wdesc).cast("long").alias("r1"),
        F.sum("c2").over(wdesc).cast("long").alias("r2"),
    )
    d = F.col("d1") + F.col("d2")
    r = F.col("r1") + F.col("r2")
    terms = rsk.filter((d > 0) & (r > 1)).select(
        "d1",
        F.floor((F.col("r1") * d).cast("double") / r * 1e6 + 0.5).cast("long").alias("e6"),
        F.floor(
            F.col("r1").cast("double") * F.col("r2") * d * (r - d)
            / (r.cast("double") * r * (r - 1))
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("v6"),
    )
    agg = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e6").cast("long").alias("e6s"),
        F.sum("v6").cast("long").alias("v6s"),
    )
    ns = cu.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(is2, 1).otherwise(0)).cast("long").alias("n2"),
    )
    e1 = F.col("e6s") / 1000000.0
    v1 = F.col("v6s") / 1000000.0
    return ns.crossJoin(F.broadcast(agg)).select(
        "n1",
        "n2",
        F.col("o1").alias("observed_1"),
        F.round(e1, 6).alias("expected_1"),
        F.round((F.col("o1") - e1) * (F.col("o1") - e1) / v1, 6).alias("logrank_chi2"),
        F.round((F.col("o1") - e1) / F.sqrt(v1), 6).alias("z"),
    )


CATALOG["ml_logrank_test_segments"].fn = _dlogrank


register(
    "evt_weibull_interevent_fit",
    # Weibull-plot fit of per-user inter-event gaps: median-rank
    # regression of ln(-ln(1-F)) on ln(gap_minutes) over the gap-
    # minute HISTOGRAM (bounded by the wall-clock span in minutes,
    # never raw gaps). Both lns are quantized to micro-units at the
    # histogram-row level (the log-log elasticity recipe), the OLS
    # moments are exact wide-int sums, and shape/intercept/r2 are
    # single expressions — is arrival clustering Weibull-bursty
    # (k < 1) or regular (k > 1)?
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events
    ),
    gaps AS (
      SELECT CAST(floor((sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec)) / 60.0) AS BIGINT) AS gm
      FROM e
    ),
    h AS MATERIALIZED (
      SELECT gm, CAST(COUNT(*) AS BIGINT) AS c
      FROM gaps WHERE gm IS NOT NULL AND gm >= 1 GROUP BY gm
    ),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    xy AS (
      SELECT h.c,
             CAST(floor(round(ln(CAST(h.gm AS DOUBLE)), 6) * 1000000 + 0.5) AS BIGINT) AS x6,
             CAST(floor(round(ln(-ln(1.0 - (SUM(h.c) OVER (ORDER BY h.gm)) / CAST(nn.n + 1 AS DOUBLE))), 6)
                        * 1000000 + 0.5) AS BIGINT) AS y6
      FROM h CROSS JOIN nn
    ),
    mo AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT) * x6) AS sx, SUM(CAST(c AS HUGEINT) * y6) AS sy,
             SUM(CAST(c AS HUGEINT) * x6 * x6) AS sxx,
             SUM(CAST(c AS HUGEINT) * x6 * y6) AS sxy,
             SUM(CAST(c AS HUGEINT) * y6 * y6) AS syy
      FROM xy
    )
    SELECT n AS n_gaps,
           round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS shape_k,
           round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                                       / CAST(n * sxx - sx * sx AS DOUBLE) * sx) / n / 1000000.0,
                 6) AS intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM mo
    """,
)


def _dweibull(spark, sf_dir):
    """Weibull median-rank fit over the gap-minute histogram."""
    ev = t(spark, sf_dir, "events")
    d19 = "decimal(19,0)"
    e = ev.select(
        "user_id", F.floor(F.unix_timestamp(F.col("ts").cast("timestamp"))).cast("long").alias("sec")
    )
    wu = Window.partitionBy("user_id").orderBy("sec")
    gaps = e.select(
        F.floor((F.col("sec") - F.lag("sec").over(wu)) / 60.0).cast("long").alias("gm")
    )
    h = (
        gaps.filter(F.col("gm").isNotNull() & (F.col("gm") >= 1))
        .groupBy("gm")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    nn = h.agg(F.sum("c").cast("long").alias("n"))
    wcum = Window.orderBy("gm")
    xy = (
        h.crossJoin(F.broadcast(nn))
        .select(
            "c",
            F.floor(F.round(F.log(F.col("gm").cast("double")), 6) * 1000000 + 0.5)
            .cast("long")
            .alias("x6"),
            F.floor(
                F.round(
                    F.log(
                        -F.log(
                            1.0
                            - F.sum("c").over(wcum) / (F.col("n") + 1).cast("double")
                        )
                    ),
                    6,
                )
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("y6"),
        )
    )
    mo = xy.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast(d19) * F.col("x6").cast(d19)).alias("sx"),
        F.sum(F.col("c").cast(d19) * F.col("y6").cast(d19)).alias("sy"),
        F.sum(F.col("c").cast(d19) * F.col("x6").cast(d19) * F.col("x6").cast(d19)).alias("sxx"),
        F.sum(F.col("c").cast(d19) * F.col("x6").cast(d19) * F.col("y6").cast(d19)).alias("sxy"),
        F.sum(F.col("c").cast(d19) * F.col("y6").cast(d19) * F.col("y6").cast(d19)).alias("syy"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    num = (n38 * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (n38 * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (n38 * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return mo.select(
        F.col("n").alias("n_gaps"),
        F.round(num / denx, 6).alias("shape_k"),
        F.round(
            (F.col("sy").cast("double") - num / denx * F.col("sx")) / F.col("n") / 1000000.0,
            6,
        ).alias("intercept"),
        F.round(num * num / (denx * deny), 6).alias("r2"),
    )


CATALOG["evt_weibull_interevent_fit"].fn = _dweibull


register(
    "lineitem_weighted_median_price",
    # quantity-weighted median of the extended price: running weight
    # over the price value-domain histogram (bounded by the part x
    # quantity price domain, not fact rows). Lower/upper weighted
    # medians come from integer cross-comparisons 2*cumw vs W (never a
    # fractional division), so the result is exact at any cardinality.
    oracle="""
    WITH h AS MATERIALIZED (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
      FROM lineitem GROUP BY 1
    ),
    w AS (
      SELECT cents, wt,
             CAST(SUM(wt) OVER (ORDER BY cents) AS BIGINT) AS cumw,
             CAST(SUM(wt) OVER () AS BIGINT) AS wtot
      FROM h
    ),
    med AS (
      SELECT MIN(CASE WHEN 2 * cumw >= wtot THEN cents END) AS lo,
             MIN(CASE WHEN 2 * cumw > wtot THEN cents END) AS hi,
             MAX(wtot) AS wtot
      FROM w
    )
    SELECT wtot AS total_weight,
           round(lo / 100.0, 6) AS wmedian_lower,
           round(hi / 100.0, 6) AS wmedian_upper,
           round((lo + hi) / 200.0, 6) AS wmedian_mid
    FROM med
    """,
)


def _dwmedian(spark, sf_dir):
    """Quantity-weighted median from the price histogram."""
    li = t(spark, sf_dir, "lineitem")
    h = li.groupBy(
        (F.col("l_extendedprice").cast(DEC) * 100).cast("long").alias("cents")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("wt"))
    w = h.select(
        "cents",
        "wt",
        F.sum("wt").over(Window.orderBy("cents")).cast("long").alias("cumw"),
        F.sum("wt").over(Window.partitionBy()).cast("long").alias("wtot"),
    )
    med = w.agg(
        F.min(F.when(2 * F.col("cumw") >= F.col("wtot"), F.col("cents"))).alias("lo"),
        F.min(F.when(2 * F.col("cumw") > F.col("wtot"), F.col("cents"))).alias("hi"),
        F.max("wtot").alias("wtot"),
    )
    return med.select(
        F.col("wtot").alias("total_weight"),
        F.round(F.col("lo") / 100.0, 6).alias("wmedian_lower"),
        F.round(F.col("hi") / 100.0, 6).alias("wmedian_upper"),
        F.round((F.col("lo") + F.col("hi")) / 200.0, 6).alias("wmedian_mid"),
    )


CATALOG["lineitem_weighted_median_price"].fn = _dwmedian


# Benford expected shares log10(1 + 1/d), d = 1..9: irrational — pinned
# ONCE here at 9 dp and fed to both engines as the same literals.
_BENFORD_P9 = (
    0.301029996, 0.176091259, 0.124938737, 0.096910013, 0.079181246,
    0.06694679, 0.057991947, 0.051152522, 0.045757491,
)
_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN CAST({p!r} AS DOUBLE)" for d, p in zip(range(1, 10), _BENFORD_P9)
) + " END"

register(
    "evt_stream_benford_now",
    # TWENTIETH streaming run: the Benford first-digit monitor as
    # STREAMING STATE — a 9-row complete-mode count aggregate over the
    # leading digit of the event value (the fraud/quality canary for a
    # value stream). Fully exact: digits are string heads of exact
    # floors, counts are integers, the expected shares are pinned
    # literals (_BENFORD_P9), so the batch oracle hash-matches with no
    # gate, like the streaming k-means run.
    oracle=f"""
    WITH d AS (
      SELECT substring(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1) AS digit
      FROM events WHERE value >= 1.0
    ),
    c AS MATERIALIZED (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c)
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / nt, 6) AS share,
           round({_BENFORD_CASE_SQL}, 6) AS benford_p,
           round(CAST(n AS DOUBLE) / nt - {_BENFORD_CASE_SQL}, 6) AS deviation
    FROM c CROSS JOIN tot
    ORDER BY digit
    """,
)


def _dstreambenford(spark, sf_dir):
    """Streaming Benford: the leading-digit histogram is one bounded
    (<= 9 rows) complete-mode streaming aggregate; the post-run probe
    scores the sink against the pinned expected shares."""
    schema = _events_stream_schema(ts_ntz=False)
    src = _stream_file_source(spark, sf_dir, "events.parquet", schema)
    digit = F.substring(F.floor(F.col("value")).cast("long").cast("string"), 1, 1)
    counts = (
        src.filter(F.col("value") >= 1.0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .count()
    )
    sink = _run_stream_to_memory(counts, "evt_stream_benford_sink", "complete")
    c = sink.select("digit", F.col("count").cast("long").alias("n")).localCheckpoint(
        eager=False
    )
    tot = c.agg(F.sum("n").cast("long").alias("nt"))
    bp = F.lit(None).cast("double")
    for dgt, p in zip(range(1, 10), _BENFORD_P9):
        bp = F.when(F.col("digit") == str(dgt), F.lit(p)).otherwise(bp)
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("nt"), 6).alias("share"),
            F.round(bp, 6).alias("benford_p"),
            F.round(F.col("n").cast("double") / F.col("nt") - bp, 6).alias("deviation"),
        )
        .orderBy("digit")
    )


CATALOG["evt_stream_benford_now"].fn = _dstreambenford


