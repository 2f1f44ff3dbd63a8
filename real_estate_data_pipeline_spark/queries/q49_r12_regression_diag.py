"""Split from queries.py lines 32168-32849 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t, tok_arr
from .q47_r11_econometrics import _ORDER_REG_CTES, _order_reg_resid

# ===========================================================================
# Round-12 wave 2: regression diagnostics and structural-change tests.
# The first two ride the single-sourced order-size regression
# (_ORDER_REG_CTES / _order_reg_resid), so every diagnostic scores the
# SAME micro-quantized exact-integer fitted line as Cook's distance.
# ===========================================================================

register(
    "ml_breusch_pagan_hetero",
    # Breusch-Pagan LM test for heteroskedasticity of the order-size
    # regression: the auxiliary regression of squared residuals on x.
    # Residuals are cent-rounded exact integers (e6 is exact, the
    # 1e6 de-scale is one deterministic floor), all auxiliary moments
    # are exact wide-int sums (ec^4 <= ~1e28 per row stays inside
    # HUGEINT/decimal(38,0) through 1000x SF), and BP = n*R2 combines
    # the moments in double AFTER each exact sum is cast once.
    oracle=f"""
    {_ORDER_REG_CTES},
    aux AS (
      SELECT x, CAST(floor(e6 / 1000000.0 + 0.5) AS BIGINT) AS ec FROM r
    ),
    am AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(ec * ec AS HUGEINT)) AS su,
             SUM(CAST(x AS HUGEINT) * (ec * ec)) AS sxu,
             SUM(CAST(ec * ec AS HUGEINT) * (ec * ec)) AS suu
      FROM aux
    )
    SELECT n,
           round((n * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
                 * (n * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))), 6)
               AS r2_aux,
           round(n * ((n * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
                 * (n * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (n * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)))), 6)
               AS bp_lm,
           CAST(1 AS BIGINT) AS df
    FROM am
    """,
)


def _dbreuschpagan(spark, sf_dir):
    """Breusch-Pagan over the shared _order_reg_resid frame: one
    auxiliary-moment aggregate, BP = n*R2 as a fixed expression."""
    r = _order_reg_resid(spark, sf_dir)
    d19 = "decimal(19,0)"
    ec = F.floor(F.col("e6") / 1000000.0 + 0.5).cast("long")
    aux = r.select("x", ec.alias("ec"))
    am = aux.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("sxx"),
        F.sum((F.col("ec") * F.col("ec")).cast(d19)).alias("su"),
        F.sum(F.col("x").cast(d19) * (F.col("ec") * F.col("ec")).cast(d19)).alias("sxu"),
        F.sum(
            (F.col("ec") * F.col("ec")).cast(d19) * (F.col("ec") * F.col("ec")).cast(d19)
        ).alias("suu"),
    )
    num = F.col("n") * F.col("sxu").cast("double") - F.col("sx").cast("double") * F.col(
        "su"
    ).cast("double")
    den = (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) * (
        F.col("n") * F.col("suu").cast("double")
        - F.col("su").cast("double") * F.col("su").cast("double")
    )
    r2 = num * num / den
    return am.select(
        "n",
        F.round(r2, 6).alias("r2_aux"),
        F.round(F.col("n") * r2, 6).alias("bp_lm"),
        F.lit(1).cast("long").alias("df"),
    )


CATALOG["ml_breusch_pagan_hetero"].fn = _dbreuschpagan


register(
    "ml_durbin_watson_daily",
    # Durbin-Watson serial-correlation diagnostic for the daily-volume
    # trend regression: daily order counts on the day index, the same
    # micro-quantized exact-integer line recipe as the order-size
    # regression, then DW = sum((e_t - e_{t-1})^2)/sum(e_t^2) where
    # both sums are exact wide-ints over the ~2200-row calendar-day
    # aggregate (the lag window never touches raw rows).
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM d
    ),
    beta AS (
      SELECT n, sx, sy,
             CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                        / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS s6
      FROM m
    ),
    b0 AS (
      SELECT n, s6,
             CAST(floor((CAST(sy AS HUGEINT) * 1000000 - CAST(s6 AS HUGEINT) * sx)
                        / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS i6
      FROM beta
    ),
    r AS (
      SELECT d.x, d.y * 1000000 - (b.i6 + b.s6 * d.x) AS e6
      FROM d CROSS JOIN b0 b
    ),
    lagd AS (
      SELECT e6, LAG(e6) OVER (ORDER BY x) AS pe6 FROM r
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(CAST(e6 AS HUGEINT) * e6) AS den,
             SUM(CASE WHEN pe6 IS NULL THEN CAST(0 AS HUGEINT)
                      ELSE CAST(e6 - pe6 AS HUGEINT) * (e6 - pe6) END) AS num
      FROM lagd
    )
    SELECT n_days,
           (SELECT round(s6 / 1000000.0, 6) FROM b0) AS slope,
           (SELECT round(i6 / 1000000.0, 6) FROM b0) AS intercept,
           round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS dw_stat
    FROM agg
    """,
)


def _ddurbinwatson(spark, sf_dir):
    """Durbin-Watson over the calendar-day aggregate: one grouped
    count, one moment row, a lag over the bounded day frame, exact
    wide-int numerator and denominator."""
    o = t(spark, sf_dir, "orders")
    d19 = "decimal(19,0)"
    d = (
        o.groupBy(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            .alias("x")
        )
        .agg(F.count("*").cast("long").alias("y"))
        .localCheckpoint(eager=False)
    )
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("sxx"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19)).alias("sxy"),
    )
    nn = F.col("n").cast("decimal(38,0)")
    beta = m.select(
        "n",
        "sx",
        "sy",
        F.floor(
            (nn * F.col("sxy") - F.col("sx").cast(d19) * F.col("sy").cast(d19)).cast("double")
            / (nn * F.col("sxx") - F.col("sx").cast(d19) * F.col("sx").cast(d19)).cast("double")
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("s6"),
    )
    b0 = beta.select(
        "n",
        "s6",
        F.floor(
            (F.col("sy").cast(d19) * 1000000 - F.col("s6").cast(d19) * F.col("sx")).cast("double")
            / F.col("n").cast("double")
            + 0.5
        )
        .cast("long")
        .alias("i6"),
    ).localCheckpoint(eager=False)
    r = d.crossJoin(F.broadcast(b0)).select(
        "x", (F.col("y") * 1000000 - (F.col("i6") + F.col("s6") * F.col("x"))).alias("e6")
    )
    lagd = r.select("e6", F.lag("e6").over(Window.orderBy("x")).alias("pe6"))
    agg = lagd.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.col("e6").cast(d19) * F.col("e6").cast(d19)).alias("den"),
        F.sum(
            F.when(F.col("pe6").isNull(), F.lit(0).cast(d19)).otherwise(
                (F.col("e6") - F.col("pe6")).cast(d19) * (F.col("e6") - F.col("pe6")).cast(d19)
            )
        ).alias("num"),
    )
    return agg.crossJoin(F.broadcast(b0)).select(
        "n_days",
        F.round(F.col("s6") / 1000000.0, 6).alias("slope"),
        F.round(F.col("i6") / 1000000.0, 6).alias("intercept"),
        F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6).alias("dw_stat"),
    )


CATALOG["ml_durbin_watson_daily"].fn = _ddurbinwatson


register(
    "ml_chow_structural_break",
    # Chow test for a structural break in the order-size regression at
    # 1995-07-01: separate micro-quantized exact-integer lines per
    # segment, a pooled line whose moments are the SUM of the segment
    # moments (the Simpson's-scan lesson — no second scan), exact
    # wide-int SSEs for all three fits, and the F ratio as a fixed
    # single-row expression.
    oracle="""
    WITH u AS MATERIALIZED (
      SELECT CASE WHEN o.o_orderdate < TIMESTAMP '1995-07-01' THEN 0 ELSE 1 END AS seg,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey) AS x
      FROM orders o
    ),
    gm AS MATERIALIZED (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM u GROUP BY seg
    ),
    lines AS MATERIALIZED (
      SELECT seg, n,
             CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                        / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS s6,
             sx, sy
      FROM gm
    ),
    lines2 AS MATERIALIZED (
      SELECT seg, n, s6,
             CAST(floor((CAST(sy AS HUGEINT) * 1000000 - CAST(s6 AS HUGEINT) * sx)
                        / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS i6
      FROM lines
    ),
    pm AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
             CAST(SUM(sy) AS BIGINT) AS sy,
             SUM(sxx) AS sxx, SUM(sxy) AS sxy
      FROM gm
    ),
    pline AS MATERIALIZED (
      SELECT n,
             CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                        / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS s6p,
             sx, sy
      FROM pm
    ),
    pline2 AS MATERIALIZED (
      SELECT n AS nt, s6p,
             CAST(floor((CAST(sy AS HUGEINT) * 1000000 - CAST(s6p AS HUGEINT) * sx)
                        / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS i6p
      FROM pline
    ),
    rr AS (
      SELECT u.seg,
             u.y * 1000000 - (l.i6 + l.s6 * u.x) AS e6own,
             u.y * 1000000 - (p.i6p + p.s6p * u.x) AS e6pool
      FROM u JOIN lines2 l USING (seg) CROSS JOIN pline2 p
    ),
    ss AS (
      SELECT
        SUM(CASE WHEN seg = 0 THEN CAST(e6own AS HUGEINT) * e6own ELSE CAST(0 AS HUGEINT) END) AS sse1,
        SUM(CASE WHEN seg = 1 THEN CAST(e6own AS HUGEINT) * e6own ELSE CAST(0 AS HUGEINT) END) AS sse2,
        SUM(CAST(e6pool AS HUGEINT) * e6pool) AS ssep
      FROM rr
    ),
    ns AS (
      SELECT MAX(CASE WHEN seg = 0 THEN n END) AS n1,
             MAX(CASE WHEN seg = 1 THEN n END) AS n2,
             MAX(CASE WHEN seg = 0 THEN s6 END) AS s6_1,
             MAX(CASE WHEN seg = 1 THEN s6 END) AS s6_2
      FROM lines2
    )
    SELECT ns.n1, ns.n2,
           round(ns.s6_1 / 1000000.0, 6) AS slope_pre,
           round(ns.s6_2 / 1000000.0, 6) AS slope_post,
           round(((CAST(ss.ssep AS DOUBLE) - CAST(ss.sse1 AS DOUBLE) - CAST(ss.sse2 AS DOUBLE)) / 2.0)
                 / ((CAST(ss.sse1 AS DOUBLE) + CAST(ss.sse2 AS DOUBLE)) / (ns.n1 + ns.n2 - 4)), 6)
               AS chow_f
    FROM ns CROSS JOIN ss
    """,
)


def _dchow(spark, sf_dir):
    """Chow test: one segmented unit build, per-segment moment rows,
    pooled moments as the SUM of the segment rows, one residual pass
    against both lines, exact wide-int SSEs, F from one row."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    d19 = "decimal(19,0)"
    cnt = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count("*").cast("long").alias("x")
    )
    u = (
        o.select(
            "o_orderkey",
            F.when(F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"), 0)
            .otherwise(1)
            .alias("seg"),
            (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("y"),
        )
        .join(cnt, "o_orderkey", "left")
        .select("seg", "y", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
        .localCheckpoint(eager=False)
    )
    gm = (
        u.groupBy("seg")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("sxx"),
            F.sum(F.col("x").cast(d19) * F.col("y").cast(d19)).alias("sxy"),
        )
        .localCheckpoint(eager=False)
    )

    def _line(frame, n="n", s6="s6", i6="i6"):
        nn = F.col(n).cast("decimal(38,0)")
        b = frame.withColumn(
            s6,
            F.floor(
                (nn * F.col("sxy") - F.col("sx").cast(d19) * F.col("sy").cast(d19)).cast("double")
                / (nn * F.col("sxx") - F.col("sx").cast(d19) * F.col("sx").cast(d19)).cast("double")
                * 1e6
                + 0.5
            ).cast("long"),
        )
        return b.withColumn(
            i6,
            F.floor(
                (F.col("sy").cast(d19) * 1000000 - F.col(s6).cast(d19) * F.col("sx")).cast("double")
                / F.col(n).cast("double")
                + 0.5
            ).cast("long"),
        )

    lines2 = _line(gm).select("seg", "n", "s6", "i6").localCheckpoint(eager=False)
    pm = gm.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sx").cast("long").alias("sx"),
        F.sum("sy").cast("long").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
    )
    pline2 = (
        _line(pm, s6="s6p", i6="i6p")
        .select(F.col("n").alias("nt"), "s6p", "i6p")
        .localCheckpoint(eager=False)
    )
    rr = (
        u.join(F.broadcast(lines2), "seg")
        .crossJoin(F.broadcast(pline2))
        .select(
            "seg",
            (F.col("y") * 1000000 - (F.col("i6") + F.col("s6") * F.col("x"))).alias("e6own"),
            (F.col("y") * 1000000 - (F.col("i6p") + F.col("s6p") * F.col("x"))).alias("e6pool"),
        )
    )
    zero = F.lit(0).cast(d19)
    ss = rr.agg(
        F.sum(
            F.when(F.col("seg") == 0, F.col("e6own").cast(d19) * F.col("e6own").cast(d19)).otherwise(zero)
        ).alias("sse1"),
        F.sum(
            F.when(F.col("seg") == 1, F.col("e6own").cast(d19) * F.col("e6own").cast(d19)).otherwise(zero)
        ).alias("sse2"),
        F.sum(F.col("e6pool").cast(d19) * F.col("e6pool").cast(d19)).alias("ssep"),
    )
    ns = lines2.agg(
        F.max(F.when(F.col("seg") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("seg") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("seg") == 0, F.col("s6"))).alias("s6_1"),
        F.max(F.when(F.col("seg") == 1, F.col("s6"))).alias("s6_2"),
    )
    return ns.crossJoin(F.broadcast(ss)).select(
        "n1",
        "n2",
        F.round(F.col("s6_1") / 1000000.0, 6).alias("slope_pre"),
        F.round(F.col("s6_2") / 1000000.0, 6).alias("slope_post"),
        F.round(
            (
                (
                    F.col("ssep").cast("double")
                    - F.col("sse1").cast("double")
                    - F.col("sse2").cast("double")
                )
                / 2.0
            )
            / (
                (F.col("sse1").cast("double") + F.col("sse2").cast("double"))
                / (F.col("n1") + F.col("n2") - 4)
            ),
            6,
        ).alias("chow_f"),
    )


CATALOG["ml_chow_structural_break"].fn = _dchow


register(
    "evt_changepoint_single_split",
    # single-changepoint detection on the daily event-count series:
    # for every candidate split day t, the between-segment SS gain
    # n1*n2/N*(m1-m2)^2 comes from prefix sums over the calendar-day
    # aggregate as ((N-k)*S_k - k*(S_N - S_k))^2/(k*(N-k)*N); the
    # integer numerator is exact, the gain is micro-quantized per row,
    # and the argmax is one filtered row — CUSUM's MLE sibling.
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT day, y,
             CAST(SUM(y) OVER (ORDER BY day) AS BIGINT) AS s1,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
             CAST(SUM(y) OVER () AS BIGINT) AS stot,
             CAST(COUNT(*) OVER () AS BIGINT) AS nt
      FROM d
    ),
    g AS (
      SELECT day, k AS n_pre, nt - k AS n_post, s1, stot,
             CAST(floor(CAST((nt - k) * s1 - k * (stot - s1) AS DOUBLE)
                        * CAST((nt - k) * s1 - k * (stot - s1) AS DOUBLE)
                        / (CAST(k AS DOUBLE) * (nt - k) * nt) * 1000000 + 0.5) AS BIGINT) AS g6
      FROM w WHERE k < nt
    )
    SELECT strftime(day, '%Y-%m-%d') AS split_day, n_pre, n_post,
           round(CAST(s1 AS DOUBLE) / n_pre, 6) AS mean_pre,
           round(CAST(stot - s1 AS DOUBLE) / n_post, 6) AS mean_post,
           round(g6 / 1000000.0, 6) AS gain
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY g6 DESC, day) AS rn FROM g)
    WHERE rn = 1
    """,
)


def _dchangepoint(spark, sf_dir):
    """Single changepoint from prefix sums over the day aggregate;
    the candidate scan and the argmax never leave the bounded frame."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("y")
    )
    word = Window.orderBy("day")
    wall = Window.partitionBy()
    w = d.select(
        "day",
        "y",
        F.sum("y").over(word).cast("long").alias("s1"),
        F.row_number().over(word).cast("long").alias("k"),
        F.sum("y").over(wall).cast("long").alias("stot"),
        F.count("*").over(wall).cast("long").alias("nt"),
    )
    num = (F.col("nt") - F.col("k")) * F.col("s1") - F.col("k") * (
        F.col("stot") - F.col("s1")
    )
    g = w.filter(F.col("k") < F.col("nt")).select(
        "day",
        F.col("k").alias("n_pre"),
        (F.col("nt") - F.col("k")).alias("n_post"),
        "s1",
        "stot",
        F.floor(
            num.cast("double")
            * num.cast("double")
            / (F.col("k").cast("double") * (F.col("nt") - F.col("k")) * F.col("nt"))
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("g6"),
    )
    top = g.orderBy(F.desc("g6"), "day").limit(1)
    return top.select(
        F.date_format("day", "yyyy-MM-dd").alias("split_day"),
        "n_pre",
        "n_post",
        F.round(F.col("s1").cast("double") / F.col("n_pre"), 6).alias("mean_pre"),
        F.round(
            (F.col("stot") - F.col("s1")).cast("double") / F.col("n_post"), 6
        ).alias("mean_post"),
        F.round(F.col("g6") / 1000000.0, 6).alias("gain"),
    )


CATALOG["evt_changepoint_single_split"].fn = _dchangepoint


register(
    "ml_cronbach_alpha_quality",
    # Cronbach's alpha internal-consistency of a 3-item document
    # "quality instrument": token count, distinct-token count and
    # sentence count per doc (all exact integers, all from one
    # projection — the distinct count is size(array_distinct(toks)),
    # no explode). Item and total variances come from exact BIGINT
    # sums; alpha = k/(k-1) * (1 - sum(var_i)/var_total) is a fixed
    # single-row expression.
    oracle="""
    WITH d AS (
      SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS i3
      FROM documents WHERE text IS NOT NULL
    ),
    it AS (
      SELECT CAST(len(toks) AS BIGINT) AS i1,
             CAST(len(list_distinct(toks)) AS BIGINT) AS i2,
             CAST(i3 AS BIGINT) AS i3
      FROM d
    ),
    mo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(i1) AS BIGINT) AS s1, SUM(CAST(i1 AS HUGEINT) * i1) AS q1,
             CAST(SUM(i2) AS BIGINT) AS s2, SUM(CAST(i2 AS HUGEINT) * i2) AS q2,
             CAST(SUM(i3) AS BIGINT) AS s3, SUM(CAST(i3 AS HUGEINT) * i3) AS q3,
             CAST(SUM(i1 + i2 + i3) AS BIGINT) AS st,
             SUM(CAST(i1 + i2 + i3 AS HUGEINT) * (i1 + i2 + i3)) AS qt
      FROM it
    ),
    v AS (
      SELECT n,
             CAST(q1 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS v1,
             CAST(q2 AS DOUBLE) / n - (CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n) AS v2,
             CAST(q3 AS DOUBLE) / n - (CAST(s3 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n) AS v3,
             CAST(qt AS DOUBLE) / n - (CAST(st AS DOUBLE) / n) * (CAST(st AS DOUBLE) / n) AS vt
      FROM mo
    )
    SELECT n AS n_docs,
           round(v1, 6) AS var_tokens, round(v2, 6) AS var_distinct,
           round(v3, 6) AS var_sentences, round(vt, 6) AS var_total,
           round(1.5 * (1.0 - (v1 + v2 + v3) / vt), 6) AS cronbach_alpha
    FROM v
    """,
)


def _dcronbach(spark, sf_dir):
    """Cronbach's alpha from one projection + one exact-moment row."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = tok_arr(F.col("text"))
    it = d.select(
        F.size(toks).cast("long").alias("i1"),
        F.size(F.array_distinct(toks)).cast("long").alias("i2"),
        F.greatest(F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long"), F.lit(1))
        .cast("long")
        .alias("i3"),
    )
    d19 = "decimal(19,0)"
    tot = F.col("i1") + F.col("i2") + F.col("i3")
    mo = it.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("i1").cast("long").alias("s1"),
        F.sum(F.col("i1").cast(d19) * F.col("i1").cast(d19)).alias("q1"),
        F.sum("i2").cast("long").alias("s2"),
        F.sum(F.col("i2").cast(d19) * F.col("i2").cast(d19)).alias("q2"),
        F.sum("i3").cast("long").alias("s3"),
        F.sum(F.col("i3").cast(d19) * F.col("i3").cast(d19)).alias("q3"),
        F.sum(tot).cast("long").alias("st"),
        F.sum(tot.cast(d19) * tot.cast(d19)).alias("qt"),
    )

    def _v(q, s):
        return (
            F.col(q).cast("double") / F.col("n")
            - (F.col(s).cast("double") / F.col("n")) * (F.col(s).cast("double") / F.col("n"))
        )

    v = mo.select(
        "n",
        _v("q1", "s1").alias("v1"),
        _v("q2", "s2").alias("v2"),
        _v("q3", "s3").alias("v3"),
        _v("qt", "st").alias("vt"),
    )
    return v.select(
        F.col("n").alias("n_docs"),
        F.round("v1", 6).alias("var_tokens"),
        F.round("v2", 6).alias("var_distinct"),
        F.round("v3", 6).alias("var_sentences"),
        F.round("vt", 6).alias("var_total"),
        F.round(1.5 * (1.0 - (F.col("v1") + F.col("v2") + F.col("v3")) / F.col("vt")), 6).alias(
            "cronbach_alpha"
        ),
    )


CATALOG["ml_cronbach_alpha_quality"].fn = _dcronbach


register(
    "lineitem_did_discount_returns",
    # difference-in-differences on the discount policy: treatment =
    # returned lines ('R'), control = delivered ('N'), break at
    # 1998-01-01 shipdate. The four cell means come from exact
    # DECIMAL(18,2) discount sums and BIGINT counts in ONE conditional
    # aggregate; DiD is a fixed expression over the single row.
    oracle="""
    WITH mo AS (
      SELECT
        CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_shipdate <  TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_r_pre,
        CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_r_post,
        CAST(SUM(CASE WHEN l_returnflag = 'N' AND l_shipdate <  TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_n_pre,
        CAST(SUM(CASE WHEN l_returnflag = 'N' AND l_shipdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_n_post,
        CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_shipdate <  TIMESTAMP '1998-01-01' THEN CAST(l_discount AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS s_r_pre,
        CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1998-01-01' THEN CAST(l_discount AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS s_r_post,
        CAST(SUM(CASE WHEN l_returnflag = 'N' AND l_shipdate <  TIMESTAMP '1998-01-01' THEN CAST(l_discount AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS s_n_pre,
        CAST(SUM(CASE WHEN l_returnflag = 'N' AND l_shipdate >= TIMESTAMP '1998-01-01' THEN CAST(l_discount AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS s_n_post
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    )
    SELECT n_r_pre, n_r_post, n_n_pre, n_n_post,
           round(s_r_pre / n_r_pre, 6) AS mean_r_pre,
           round(s_r_post / n_r_post, 6) AS mean_r_post,
           round(s_n_pre / n_n_pre, 6) AS mean_n_pre,
           round(s_n_post / n_n_post, 6) AS mean_n_post,
           round((s_r_post / n_r_post - s_r_pre / n_r_pre)
                 - (s_n_post / n_n_post - s_n_pre / n_n_pre), 6) AS did
    FROM mo
    """,
)


def _ddid(spark, sf_dir):
    """Difference-in-differences from one conditional-aggregate row."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    cut = F.lit("1998-01-01").cast("timestamp")
    disc = F.col("l_discount").cast(DEC)
    zero = F.lit(0).cast(DEC)
    cells = {
        "r_pre": (F.col("l_returnflag") == "R") & (F.col("l_shipdate") < cut),
        "r_post": (F.col("l_returnflag") == "R") & (F.col("l_shipdate") >= cut),
        "n_pre": (F.col("l_returnflag") == "N") & (F.col("l_shipdate") < cut),
        "n_post": (F.col("l_returnflag") == "N") & (F.col("l_shipdate") >= cut),
    }
    aggs = []
    for name, cond in cells.items():
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{name}"))
        aggs.append(F.sum(F.when(cond, disc).otherwise(zero)).cast("double").alias(f"s_{name}"))
    mo = li.agg(*aggs)

    def _mean(cell):
        return F.col(f"s_{cell}") / F.col(f"n_{cell}")

    return mo.select(
        "n_r_pre",
        "n_r_post",
        "n_n_pre",
        "n_n_post",
        F.round(_mean("r_pre"), 6).alias("mean_r_pre"),
        F.round(_mean("r_post"), 6).alias("mean_r_post"),
        F.round(_mean("n_pre"), 6).alias("mean_n_pre"),
        F.round(_mean("n_post"), 6).alias("mean_n_post"),
        F.round(
            (_mean("r_post") - _mean("r_pre")) - (_mean("n_post") - _mean("n_pre")), 6
        ).alias("did"),
    )


CATALOG["lineitem_did_discount_returns"].fn = _ddid


