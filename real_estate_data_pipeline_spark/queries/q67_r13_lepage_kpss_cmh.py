"""Round-13 wave 11: combined location-scale testing, stationarity,
inequality decomposition and stratified association — the Lepage test
(standardized Wilcoxon + Ansari-Bradley, both off the shared
doubled-midrank frame), the KPSS level-stationarity statistic on the
daily series, the between/within Theil-T decomposition of customer
revenue over market segments, the Theil-Sen slope with its rank-based
confidence interval, and the Cochran-Mantel-Haenszel stratified 2x2
test across order years.

Exactness: rank moments stay doubled integers; KPSS clears the mean by
Z = n*x - S so both sums are exact; per-group/per-stratum terms are
micro- or nano-quantized before cross-group sums; ln at 9 decimals.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from .q59_r13_trend_changepoint import _DAILY_CENTS_CTE, _daily_cents
from .q60_r13_rank_tests import _RANK2_CTES, _rank2_frame

register(
    "ml_lepage_location_scale",
    # Lepage's combined location-scale test: L = z_W^2 + z_AB^2, the
    # standardized Wilcoxon rank-sum of the N sample plus the
    # standardized (tie-adjusted) Ansari-Bradley of the R sample —
    # chi-square with 2 df under H0.  In doubled-midrank units both
    # moments are exact: E[W2] = nN(N+1), Var[W2] = nR*nN*(sum c*rc2^2
    # - N(N+1)^2)/(N(N-1)); the AB moments are the wave-4 formulas.
    oracle=f"""
    WITH {_RANK2_CTES},
    sums AS (
      SELECT MAX(nx) AS nx, MAX(ny) AS ny, MAX(nx + ny) AS nn,
             CAST(SUM(cy * rc2) AS BIGINT) AS w2,
             SUM(CAST(cx + cy AS HUGEINT) * rc2 * rc2) AS cr2sq,
             CAST(SUM(cx * LEAST(rc2, 2 * (nx + ny + 1) - rc2)) AS BIGINT) AS ab2,
             CAST(SUM((cx + cy) * LEAST(rc2, 2 * (nx + ny + 1) - rc2)) AS BIGINT)
               AS ss2,
             SUM(CAST(cx + cy AS HUGEINT)
                 * LEAST(rc2, 2 * (nx + ny + 1) - rc2)
                 * LEAST(rc2, 2 * (nx + ny + 1) - rc2)) AS ss2sq
      FROM rw
    ),
    zz AS (
      SELECT nx, ny, nn,
             (CAST(w2 AS DOUBLE) - CAST(ny AS DOUBLE) * (nn + 1))
               / sqrt(CAST(nx AS DOUBLE) * ny
                      * (CAST(cr2sq AS DOUBLE)
                         - CAST(nn AS DOUBLE) * (nn + 1) * (nn + 1))
                      / (CAST(nn AS DOUBLE) * (nn - 1))) AS zw,
             (CAST(ab2 AS DOUBLE) / 2.0 - CAST(nx AS DOUBLE) * ss2 / (2.0 * nn))
               / sqrt(CAST(nx AS DOUBLE) * ny
                      * (CAST(nn AS DOUBLE) * CAST(ss2sq AS DOUBLE)
                         - CAST(ss2 AS DOUBLE) * ss2)
                      / (4.0 * CAST(nn AS DOUBLE) * nn * (nn - 1))) AS zab
      FROM sums
    )
    SELECT CAST(nx AS BIGINT) AS n_r, CAST(ny AS BIGINT) AS n_n,
           round(zw, 6) AS z_wilcoxon,
           round(zab, 6) AS z_ansari_bradley,
           round(zw * zw + zab * zab, 6) AS lepage_l
    FROM zz
    """,
)


def _dlepage(spark, sf_dir):
    """Lepage L: one pass over the shared doubled-midrank frame yields
    both components' exact moments; the statistic is two squares."""
    rw = _rank2_frame(spark, sf_dir)
    nn = F.col("nx") + F.col("ny")
    s2 = F.least(F.col("rc2"), 2 * (nn + 1) - F.col("rc2"))
    c = F.col("cx") + F.col("cy")
    sums = rw.agg(
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
        F.max(nn).alias("nn"),
        F.sum(F.col("cy") * F.col("rc2")).cast("long").alias("w2"),
        # stays decimal: sum c*rc2^2 ~ N*(2N)^2 exceeds BIGINT at the 10x
        # probe corpus already (the probe caught the original long cast)
        F.sum(c.cast("decimal(38,0)") * F.col("rc2") * F.col("rc2")).alias("cr2sq"),
        F.sum(F.col("cx") * s2).cast("long").alias("ab2"),
        F.sum(c * s2).cast("long").alias("ss2"),
        F.sum(c.cast("decimal(38,0)") * s2 * s2).alias("ss2sq"),
    )
    nxd = F.col("nx").cast("double")
    nnd = F.col("nn").cast("double")
    zw = (F.col("w2").cast("double") - F.col("ny").cast("double") * (F.col("nn") + 1)) / F.sqrt(
        nxd
        * F.col("ny")
        * (F.col("cr2sq").cast("double") - nnd * (F.col("nn") + 1) * (F.col("nn") + 1))
        / (nnd * (F.col("nn") - 1))
    )
    zab = (
        F.col("ab2").cast("double") / 2.0 - nxd * F.col("ss2") / (2.0 * F.col("nn"))
    ) / F.sqrt(
        nxd
        * F.col("ny")
        * (nnd * F.col("ss2sq").cast("double") - F.col("ss2").cast("double") * F.col("ss2"))
        / (4.0 * nnd * F.col("nn") * (F.col("nn") - 1))
    )
    return sums.select(
        F.col("nx").cast("long").alias("n_r"),
        F.col("ny").cast("long").alias("n_n"),
        F.round(zw, 6).alias("z_wilcoxon"),
        F.round(zab, 6).alias("z_ansari_bradley"),
        F.round(zw * zw + zab * zab, 6).alias("lepage_l"),
    )


CATALOG["ml_lepage_location_scale"].fn = _dlepage


register(
    "evt_kpss_level_stat",
    # KPSS level-stationarity statistic on the daily value series with
    # the lag-0 (iid) long-run variance: eta = sum_t S_t^2 / (n *
    # sum e^2), where S_t are partial sums of the mean-centered series.
    # Z_i = n*x_i - S clears the mean exactly, so eta =
    # sum cumZ_t^2 / (n * sum Z^2) — two exact HUGEINT sums, one
    # division.  Larger eta = stronger evidence against level
    # stationarity.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    z AS (
      SELECT k, n, n * cents - SUM(cents) OVER () AS zc
      FROM d
    ),
    cz AS (
      SELECT n, zc,
             SUM(zc) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS cumz
      FROM z
    ),
    agg AS (
      SELECT MAX(n) AS n,
             SUM(CAST(cumz AS HUGEINT) * cumz) AS scum2,
             SUM(CAST(zc AS HUGEINT) * zc) AS sz2
      FROM cz
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(CAST(scum2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sz2 AS DOUBLE)),
                 6) AS kpss_eta
    FROM agg
    """,
)


def _dkpss(spark, sf_dir):
    """KPSS eta: mean cleared by integer cross-multiplication, one
    running sum over the 30-row frame, one closing division."""
    d = _daily_cents(spark, sf_dir)
    wall = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    z = d.select(
        "k", "n", (F.col("n") * F.col("cents") - F.sum("cents").over(wall)).alias("zc")
    )
    cz = z.select("n", "zc", F.sum("zc").over(wcum).alias("cumz"))
    agg = cz.agg(
        F.max("n").alias("n"),
        F.sum(F.col("cumz").cast("decimal(38,0)") * F.col("cumz")).alias("scum2"),
        F.sum(F.col("zc").cast("decimal(38,0)") * F.col("zc")).alias("sz2"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(
            F.col("scum2").cast("double")
            / (F.col("n").cast("double") * F.col("sz2").cast("double")),
            6,
        ).alias("kpss_eta"),
    )


CATALOG["evt_kpss_level_stat"].fn = _dkpss


register(
    "cust_theil_decomposition_segments",
    # Between/within decomposition of the Theil-T index of per-customer
    # revenue over market segments: T = T_between + sum_g s_g * T_g,
    # with s_g the segment's revenue share.  Per-customer x*ln(x) terms
    # use the micro-nat convention; each segment's contribution to the
    # between and within sums is nano-quantized before the 5-term
    # cross-segment sum so both engines add identical integers.
    oracle="""
    WITH cr AS (
      SELECT o.o_custkey, c.c_mktsegment AS seg,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    terms AS (
      SELECT seg, cents,
             CAST(round(round(ln(CAST(cents AS DOUBLE)), 9) * 1000000) AS BIGINT)
               AS l6
      FROM cr WHERE cents > 0
    ),
    grp AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS ng, CAST(SUM(cents) AS BIGINT) AS sg,
             SUM(CAST(cents AS HUGEINT) * l6) AS xl
      FROM terms GROUP BY seg
    ),
    tot AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
             CAST(SUM(xl) AS HUGEINT) AS xlt
      FROM grp
    ),
    gterm AS (
      SELECT t.n, t.s, t.xlt,
             CAST(FLOOR((CAST(g.sg AS DOUBLE) / t.s)
                        * (round(ln(CAST(g.sg AS DOUBLE) / g.ng), 9)
                           - round(ln(CAST(t.s AS DOUBLE) / t.n), 9))
                        * 1000000000.0 + 0.5) AS BIGINT) AS bt9,
             CAST(FLOOR((CAST(g.xl AS DOUBLE) / (1000000.0 * g.sg)
                         - round(ln(CAST(g.sg AS DOUBLE) / g.ng), 9))
                        * (CAST(g.sg AS DOUBLE) / t.s)
                        * 1000000000.0 + 0.5) AS BIGINT) AS wt9
      FROM grp g CROSS JOIN tot t
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           round(CAST(MAX(xlt) AS DOUBLE) / (1000000.0 * MAX(s))
                 - round(ln(CAST(MAX(s) AS DOUBLE) / MAX(n)), 9), 6) AS theil_t,
           round(CAST(SUM(bt9) AS DOUBLE) / 1000000000.0, 6) AS theil_between,
           round(CAST(SUM(wt9) AS DOUBLE) / 1000000000.0, 6) AS theil_within
    FROM gterm
    """,
)


def _dtheildecomp(spark, sf_dir):
    """Theil decomposition: one orders->customer join is the fact-sized
    stage; per-segment moment rows carry exact x*ln(x) masses; the
    between/within assembly is a 5-row nano-quantized fold."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cr = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == F.col("c_custkey"))
        .groupBy("o_custkey", F.col("c_mktsegment").alias("seg"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"))
    )
    terms = cr.filter(F.col("cents") > 0).select(
        "seg",
        "cents",
        F.round(F.round(F.log(F.col("cents").cast("double")), 9) * 1000000)
        .cast("long")
        .alias("l6"),
    )
    grp = terms.groupBy("seg").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("cents").cast("long").alias("sg"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("l6")).alias("xl"),
    )
    tot = grp.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("xl").alias("xlt"),
    )
    lng = F.round(F.log(F.col("sg").cast("double") / F.col("ng")), 9)
    lnt = F.round(F.log(F.col("s").cast("double") / F.col("n")), 9)
    gterm = grp.crossJoin(F.broadcast(tot)).select(
        "n",
        "s",
        "xlt",
        F.floor(
            (F.col("sg").cast("double") / F.col("s")) * (lng - lnt) * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("bt9"),
        F.floor(
            (
                F.col("xl").cast("double") / (F.lit(1000000.0) * F.col("sg"))
                - lng
            )
            * (F.col("sg").cast("double") / F.col("s"))
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("wt9"),
    )
    return gterm.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(
            F.max("xlt").cast("double") / (F.lit(1000000.0) * F.max("s"))
            - F.round(F.log(F.max("s").cast("double") / F.max("n")), 9),
            6,
        ).alias("theil_t"),
        F.round(F.sum("bt9").cast("double") / F.lit(1e9), 6).alias("theil_between"),
        F.round(F.sum("wt9").cast("double") / F.lit(1e9), 6).alias("theil_within"),
    )


CATALOG["cust_theil_decomposition_segments"].fn = _dtheildecomp


register(
    "evt_sen_slope_ci",
    # The Theil-Sen daily slope with its rank-based 95% confidence
    # interval: the M pairwise slopes are ranked once; the Kendall
    # variance (tie-corrected on the cents values, the MK formula)
    # sets C = 1.96*sqrt(Var S), and the CI endpoints are the slopes
    # at ranks floor((M-C)/2 + 0.5) and floor((M+C)/2 + 0.5) + 1
    # (clamped) — the standard Sen construction, every selection an
    # integer decision.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    pr AS (
      SELECT (CAST(b.cents AS DOUBLE) - a.cents) / (b.off - a.off) AS sl
      FROM d a JOIN d b ON a.off < b.off
    ),
    rk AS (
      SELECT sl, ROW_NUMBER() OVER (ORDER BY sl) AS r, COUNT(*) OVER () AS m
      FROM pr
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(CAST(tc AS HUGEINT) * (tc - 1) * (2 * tc + 5)), 0)
                  AS BIGINT) AS tsum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tc FROM d GROUP BY cents
            HAVING COUNT(*) > 1)
    ),
    nn AS (SELECT MAX(n) AS n FROM d),
    lim AS (
      SELECT rk.m,
             GREATEST(CAST(FLOOR((rk.m - 1.96 * sqrt((CAST(nn.n AS DOUBLE)
                 * (nn.n - 1) * (2 * nn.n + 5) - ties.tsum) / 18.0)) / 2.0 + 0.5)
                 AS BIGINT), 1) AS rlo,
             LEAST(CAST(FLOOR((rk.m + 1.96 * sqrt((CAST(nn.n AS DOUBLE)
                 * (nn.n - 1) * (2 * nn.n + 5) - ties.tsum) / 18.0)) / 2.0 + 0.5)
                 AS BIGINT) + 1, rk.m) AS rhi
      FROM (SELECT DISTINCT m FROM rk) rk CROSS JOIN ties CROSS JOIN nn
    )
    SELECT MAX(lim.m) AS n_pairs,
           round(AVG(CASE WHEN rk.r IN ((lim.m + 1) // 2, (lim.m + 2) // 2)
                          THEN rk.sl END), 6) AS sen_slope,
           round(MAX(CASE WHEN rk.r = lim.rlo THEN rk.sl END), 6) AS ci_lo,
           round(MAX(CASE WHEN rk.r = lim.rhi THEN rk.sl END), 6) AS ci_hi
    FROM rk CROSS JOIN lim
    """,
)


def _dsenslopeci(spark, sf_dir):
    """Sen slope CI: the bounded day-pair slope frame ranked once; the
    median and both CI endpoints are three integer rank selections
    sharing that one sort."""
    d = _daily_cents(spark, sf_dir).localCheckpoint(eager=False)
    a = d.select(F.col("off").alias("ao"), F.col("cents").alias("ac"))
    b = d.select(F.col("off").alias("bo"), F.col("cents").alias("bc"))
    pr = a.join(F.broadcast(b), F.col("ao") < F.col("bo")).select(
        ((F.col("bc").cast("double") - F.col("ac")) / (F.col("bo") - F.col("ao"))).alias(
            "sl"
        )
    )
    wall = Window.orderBy("sl").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rk = pr.select(
        "sl",
        F.row_number().over(Window.orderBy("sl")).alias("r"),
        F.count("*").over(wall).alias("m"),
    ).localCheckpoint(eager=False)
    t3 = F.col("tc").cast("decimal(12,0)")
    ties = (
        d.groupBy("cents")
        .agg(F.count("*").cast("long").alias("tc"))
        .filter(F.col("tc") > 1)
        .agg(
            F.coalesce(
                F.sum(t3 * (F.col("tc") - 1) * (2 * F.col("tc") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tsum")
        )
    )
    nn = d.agg(F.max("n").alias("n"))
    m1 = rk.select("m").distinct()
    ca = 1.96 * F.sqrt(
        (
            F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tsum")
        )
        / 18.0
    )
    lim = (
        m1.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(nn))
        .select(
            # rk carries its own m (the window total) — project only the
            # two rank endpoints so the crossJoin stays unambiguous
            F.greatest(
                F.floor((F.col("m") - ca) / 2.0 + F.lit(0.5)).cast("long"), F.lit(1)
            ).alias("rlo"),
            F.least(
                F.floor((F.col("m") + ca) / 2.0 + F.lit(0.5)).cast("long") + 1,
                F.col("m").cast("long"),
            ).alias("rhi"),
        )
    )
    j = rk.crossJoin(F.broadcast(lim))
    return j.agg(
        F.max(F.col("m")).alias("n_pairs"),
        F.round(
            F.avg(
                F.when(
                    (F.col("r") == F.floor((F.col("m") + 1) / 2))
                    | (F.col("r") == F.floor((F.col("m") + 2) / 2)),
                    F.col("sl"),
                )
            ),
            6,
        ).alias("sen_slope"),
        F.round(F.max(F.when(F.col("r") == F.col("rlo"), F.col("sl"))), 6).alias(
            "ci_lo"
        ),
        F.round(F.max(F.when(F.col("r") == F.col("rhi"), F.col("sl"))), 6).alias(
            "ci_hi"
        ),
    )


CATALOG["evt_sen_slope_ci"].fn = _dsenslopeci


register(
    "ml_cmh_stratified_2x2",
    # Cochran-Mantel-Haenszel test of 'urgent priority' vs 'order value
    # above the GLOBAL median', stratified by order YEAR (7 strata):
    # chi2_CMH = (|sum a_k - sum E_k| - 0.5)^2 / sum V_k with the
    # hypergeometric stratum moments, plus the Mantel-Haenszel common
    # odds ratio.  Stratum cells are exact integers; E_k, V_k and the
    # MH ratio terms are micro-quantized per stratum before the
    # 7-term sums.
    oracle="""
    WITH x AS MATERIALIZED (
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
    ),
    strat AS (
      SELECT a, a + b + c + d AS nk,
             CAST(FLOOR(CAST(CAST(a + b AS HUGEINT) * (a + c) AS DOUBLE)
                        / (a + b + c + d) * 1000000.0 + 0.5) AS BIGINT) AS e6,
             CAST(FLOOR(CAST(CAST(a + b AS HUGEINT) * (c + d) AS DOUBLE)
                        * (a + c) * (b + d)
                        / (CAST(a + b + c + d AS DOUBLE)
                           * (a + b + c + d) * (a + b + c + d - 1))
                        * 1000000.0 + 0.5) AS BIGINT) AS v6,
             CAST(FLOOR(CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                        / (a + b + c + d) * 1000000.0 + 0.5) AS BIGINT) AS ad6,
             CAST(FLOOR(CAST(CAST(b AS HUGEINT) * c AS DOUBLE)
                        / (a + b + c + d) * 1000000.0 + 0.5) AS BIGINT) AS bc6
      FROM cells
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(a) AS BIGINT) AS suma,
             CAST(SUM(e6) AS BIGINT) AS sume6,
             CAST(SUM(v6) AS BIGINT) AS sumv6,
             CAST(SUM(ad6) AS BIGINT) AS sumad6,
             CAST(SUM(bc6) AS BIGINT) AS sumbc6
      FROM strat
    )
    SELECT k AS n_strata, suma AS sum_a,
           round((ABS(CAST(suma AS DOUBLE) - CAST(sume6 AS DOUBLE) / 1000000.0)
                  - 0.5)
                 * (ABS(CAST(suma AS DOUBLE) - CAST(sume6 AS DOUBLE) / 1000000.0)
                    - 0.5)
                 / (CAST(sumv6 AS DOUBLE) / 1000000.0), 6) AS cmh_chi2,
           round(CAST(sumad6 AS DOUBLE) / sumbc6, 6) AS mh_odds_ratio
    FROM agg
    """,
)


def _dcmh(spark, sf_dir):
    """CMH: one exact-median pass, one year-stratified cell aggregate
    (7 rows), micro-quantized hypergeometric moments, two closing
    expressions."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("urgent"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    med = x.agg((2 * F.percentile("cents", 0.5)).cast("long").alias("m2"))
    hi = 2 * F.col("cents") > F.col("m2")
    lo = 2 * F.col("cents") <= F.col("m2")
    cells = (
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
    a, b, c, d = (F.col(k) for k in "abcd")
    nk = a + b + c + d
    strat = cells.select(
        "a",
        F.floor(
            ((a + b).cast("decimal(38,0)") * (a + c)).cast("double") / nk
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("e6"),
        F.floor(
            ((a + b).cast("decimal(38,0)") * (c + d)).cast("double")
            * (a + c)
            * (b + d)
            / (nk.cast("double") * nk * (nk - 1))
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("v6"),
        F.floor(
            (a.cast("decimal(38,0)") * d).cast("double") / nk * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ad6"),
        F.floor(
            (b.cast("decimal(38,0)") * c).cast("double") / nk * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("bc6"),
    )
    agg = strat.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("a").cast("long").alias("suma"),
        F.sum("e6").cast("long").alias("sume6"),
        F.sum("v6").cast("long").alias("sumv6"),
        F.sum("ad6").cast("long").alias("sumad6"),
        F.sum("bc6").cast("long").alias("sumbc6"),
    )
    dev = F.abs(
        F.col("suma").cast("double") - F.col("sume6").cast("double") / 1000000.0
    ) - 0.5
    return agg.select(
        F.col("k").alias("n_strata"),
        F.col("suma").alias("sum_a"),
        F.round(dev * dev / (F.col("sumv6").cast("double") / 1000000.0), 6).alias(
            "cmh_chi2"
        ),
        F.round(F.col("sumad6").cast("double") / F.col("sumbc6"), 6).alias(
            "mh_odds_ratio"
        ),
    )


CATALOG["ml_cmh_stratified_2x2"].fn = _dcmh
