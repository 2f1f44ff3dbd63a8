"""Round-14 wave 1: exact two-sample rank statistics beyond the r13
families — the Siegel-Tukey alternating-extreme-rank dispersion test,
Conover's squared-ranks variance test, the Fligner-Policello robust
rank-order (placement) test, the Scholz-Stephens two-sample
Anderson-Darling statistic (the ties/midrank A2akN form), and the
two-sample Watson U^2.

All five reduce the R/N lineitem quantity samples to the 50-value
histogram first, so each is ONE fact scan plus a <=100-cell assembly —
the shape that survives 100 TB (the only window runs over the bounded
value-domain frame).  Exactness: cumulative counts and doubled
midranks stay integers; Siegel-Tukey run sums use closed-form partial
sums of the alternating rank sequence (no per-position explode);
per-value rational terms are micro-quantized (1e6, or 1e9 for the
already-normalized AD contributions) BEFORE the cross-value sum; big
moment sums ride HUGEINT/decimal(38,0) (the r9/r13 overflow lesson);
the final z assembly is the only unquantized IEEE arithmetic, written
in the same operation order for both engines.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# Shared cumulative-before frame over the R/N quantity histogram:
# per value q, counts (cx, cy, c), counts strictly below (ax, ay, ab)
# and totals (nx, ny, nn).  Everything downstream is exact integer
# arithmetic on these.
_CUM2_CTES = """vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cy
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    cum AS (
      SELECT q, cx, cy, cx + cy AS c,
             SUM(cx + cy) OVER (ORDER BY q) - (cx + cy) AS ab,
             SUM(cx) OVER (ORDER BY q) - cx AS ax,
             SUM(cy) OVER (ORDER BY q) - cy AS ay,
             SUM(cx) OVER () AS nx, SUM(cy) OVER () AS ny,
             SUM(cx + cy) OVER () AS nn
      FROM vc
    )"""


def _cum2_frame(spark, sf_dir):
    """Spark twin of _CUM2_CTES."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    vc = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("cx"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("cy"),
    )
    wcum = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = F.col("cx") + F.col("cy")
    return vc.select(
        "q",
        "cx",
        "cy",
        c.alias("c"),
        (F.sum(c).over(wcum) - c).alias("ab"),
        (F.sum("cx").over(wcum) - F.col("cx")).alias("ax"),
        (F.sum("cy").over(wcum) - F.col("cy")).alias("ay"),
        F.sum("cx").over(wall).alias("nx"),
        F.sum("cy").over(wall).alias("ny"),
        F.sum(c).over(wall).alias("nn"),
    )


register(
    "ml_siegel_tukey_dispersion",
    # Siegel-Tukey: rank the pooled sample by alternating extremes
    # (1 to the smallest, 2,3 to the two largest, 4,5 to the next two
    # smallest, ...) and run a Wilcoxon rank-sum on the rearranged
    # ranks.  Position p (1-based from the bottom) gets rank
    # 2p - [p odd] while p <= ceil(N/2), else with p' = N+1-p from the
    # top, 2p' - [p' even]; a tied value's run [lo, hi] sums these in
    # closed form (arithmetic series minus an odd/even count), so ties
    # take the midrank of their run without any per-position explode.
    # T = sum of X's ST midranks; E = nx(N+1)/2; the tie-adjusted
    # variance uses the second moment of the realized midranks.
    oracle=f"""
    WITH {_CUM2_CTES},
    st AS (
      SELECT q, cx, cy, c, nx, ny, nn,
             ab + 1 AS lo, ab + c AS hi, (nn + 1) // 2 AS bb
      FROM cum
    ),
    runs AS (
      SELECT cx, c, nx, ny, nn,
             (CASE WHEN lo <= LEAST(hi, bb) THEN
                (lo + LEAST(hi, bb)) * (LEAST(hi, bb) - lo + 1)
                - ((LEAST(hi, bb) + 1) // 2 - lo // 2)
              ELSE 0 END)
             + (CASE WHEN GREATEST(lo, bb + 1) <= hi THEN
                ((nn + 1 - hi) + (nn + 1 - GREATEST(lo, bb + 1)))
                  * (hi - GREATEST(lo, bb + 1) + 1)
                - ((nn + 1 - GREATEST(lo, bb + 1)) // 2 - (nn - hi) // 2)
              ELSE 0 END) AS m
      FROM st
    ),
    terms AS (
      SELECT nx, ny, nn,
             CAST(floor(CAST(cx AS DOUBLE) / nx * (CAST(m AS DOUBLE) / c)
                        * 1e6 + 0.5) AS BIGINT) AS tbar_u,
             CAST(floor(CAST(c AS DOUBLE) / nn
                        * (CAST(m AS DOUBLE) / c * (CAST(m AS DOUBLE) / c))
                        * 1e6 + 0.5) AS BIGINT) AS s2bar_u
      FROM runs
    ),
    agg AS (
      SELECT MAX(nx) AS nx, MAX(ny) AS ny, MAX(nn) AS nn,
             CAST(SUM(CAST(tbar_u AS HUGEINT)) AS DOUBLE) / 1e6 AS tbar,
             CAST(SUM(CAST(s2bar_u AS HUGEINT)) AS DOUBLE) / 1e6 AS s2bar
      FROM terms
    )
    SELECT CAST(nx AS BIGINT) AS n_r, CAST(ny AS BIGINT) AS n_n,
           round(CAST(nx AS DOUBLE) * tbar, 3) AS t_stat,
           round(CAST(nx AS DOUBLE)
                 * (tbar - (CAST(nn AS DOUBLE) + 1) / 2)
                 / sqrt(CAST(nx AS DOUBLE) * ny
                        * (s2bar - (CAST(nn AS DOUBLE) + 1) / 2
                                   * ((CAST(nn AS DOUBLE) + 1) / 2))
                        / (CAST(nn AS DOUBLE) - 1)), 6) AS z_siegel_tukey
    FROM agg
    """,
)


def _dsiegel(spark, sf_dir):
    """Siegel-Tukey via closed-form alternating-rank run sums over the
    50-value histogram — one scan, no per-position explode."""
    st = _cum2_frame(spark, sf_dir).select(
        "cx",
        "c",
        "nx",
        "ny",
        "nn",
        (F.col("ab") + 1).alias("lo"),
        (F.col("ab") + F.col("c")).alias("hi"),
        F.expr("(nn + 1) div 2").alias("bb"),
    )
    runs = st.select(
        "cx",
        "c",
        "nx",
        "ny",
        "nn",
        (
            F.expr(
                """CASE WHEN lo <= LEAST(hi, bb) THEN
                     (lo + LEAST(hi, bb)) * (LEAST(hi, bb) - lo + 1)
                     - ((LEAST(hi, bb) + 1) div 2 - lo div 2)
                   ELSE 0 END"""
            )
            + F.expr(
                """CASE WHEN GREATEST(lo, bb + 1) <= hi THEN
                     ((nn + 1 - hi) + (nn + 1 - GREATEST(lo, bb + 1)))
                       * (hi - GREATEST(lo, bb + 1) + 1)
                     - ((nn + 1 - GREATEST(lo, bb + 1)) div 2 - (nn - hi) div 2)
                   ELSE 0 END"""
            )
        ).alias("m"),
    )
    terms = runs.select(
        "nx",
        "ny",
        "nn",
        F.floor(
            F.col("cx").cast("double")
            / F.col("nx")
            * (F.col("m").cast("double") / F.col("c"))
            * F.lit(1e6)
            + F.lit(0.5)
        ).alias("tbar_u"),
        F.floor(
            F.col("c").cast("double")
            / F.col("nn")
            * (
                F.col("m").cast("double")
                / F.col("c")
                * (F.col("m").cast("double") / F.col("c"))
            )
            * F.lit(1e6)
            + F.lit(0.5)
        ).alias("s2bar_u"),
    )
    agg = terms.agg(
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
        F.max("nn").alias("nn"),
        (F.sum(F.col("tbar_u").cast("decimal(38,0)")).cast("double") / F.lit(1e6)).alias(
            "tbar"
        ),
        (
            F.sum(F.col("s2bar_u").cast("decimal(38,0)")).cast("double") / F.lit(1e6)
        ).alias("s2bar"),
    )
    nnd = F.col("nn").cast("double")
    half = (nnd + 1) / 2
    return agg.select(
        F.col("nx").cast("long").alias("n_r"),
        F.col("ny").cast("long").alias("n_n"),
        F.round(F.col("nx").cast("double") * F.col("tbar"), 3).alias("t_stat"),
        F.round(
            F.col("nx").cast("double")
            * (F.col("tbar") - half)
            / F.sqrt(
                F.col("nx").cast("double")
                * F.col("ny")
                * (F.col("s2bar") - half * half)
                / (nnd - 1)
            ),
            6,
        ).alias("z_siegel_tukey"),
    )


CATALOG["ml_siegel_tukey_dispersion"].fn = _dsiegel


register(
    "ml_conover_squared_ranks",
    # Conover's squared-ranks test for variance equality: rank the
    # absolute deviations from each group's mean over the pooled
    # sample, T = sum of squared (mid)ranks in group X.  The deviation
    # |q - S_g/n_g| is compared across groups exactly by clearing
    # denominators: ukey = |q*n_g - S_g| * n_other (a common-
    # denominator integer), so the pooled ranking never touches a
    # float.  Doubled midranks keep T, its mean and its tie-adjusted
    # variance exact (HUGEINT fourth-moment sums).
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cy
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(cx) AS BIGINT) AS nx, CAST(SUM(cy) AS BIGINT) AS ny,
             CAST(SUM(q * cx) AS BIGINT) AS sx, CAST(SUM(q * cy) AS BIGINT) AS sy
      FROM vc
    ),
    cells AS (
      SELECT 'x' AS g, vc.cx AS cnt, ABS(vc.q * t.nx - t.sx) * t.ny AS ukey
      FROM vc CROSS JOIN tot t WHERE vc.cx > 0
      UNION ALL
      SELECT 'y', vc.cy, ABS(vc.q * t.ny - t.sy) * t.nx
      FROM vc CROSS JOIN tot t WHERE vc.cy > 0
    ),
    uh AS (SELECT ukey, CAST(SUM(cnt) AS BIGINT) AS cu FROM cells GROUP BY ukey),
    ur AS (
      SELECT ukey, 2 * (SUM(cu) OVER (ORDER BY ukey) - cu) + cu + 1 AS r2
      FROM uh
    ),
    moms AS (
      SELECT
        SUM(CASE WHEN c.g = 'x'
                 THEN CAST(c.cnt AS HUGEINT) * u.r2 * u.r2 ELSE 0 END) AS t4,
        SUM(CAST(c.cnt AS HUGEINT) * u.r2 * u.r2) AS w4,
        SUM(CAST(c.cnt AS HUGEINT) * u.r2 * u.r2 * u.r2 * u.r2) AS w16
      FROM cells c JOIN ur u USING (ukey)
    )
    SELECT CAST(t.nx AS BIGINT) AS n_r, CAST(t.ny AS BIGINT) AS n_n,
           round(CAST(m.t4 AS DOUBLE) / 4, 3) AS t_sq_ranks,
           round((CAST(m.t4 AS DOUBLE) / 4
                  - CAST(t.nx AS DOUBLE) * (CAST(m.w4 AS DOUBLE) / 4)
                    / (t.nx + t.ny))
                 / sqrt(CAST(t.nx AS DOUBLE) * t.ny
                        / (16.0 * (t.nx + t.ny) * (t.nx + t.ny - 1))
                        * (CAST(m.w16 AS DOUBLE)
                           - CAST(m.w4 AS DOUBLE) * CAST(m.w4 AS DOUBLE)
                             / (t.nx + t.ny))), 6) AS z_conover
    FROM moms m CROSS JOIN tot t
    """,
)


def _dconover(spark, sf_dir):
    """Conover squared-ranks: common-denominator integer deviation keys,
    doubled midranks, exact decimal moment sums."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    vc = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("cx"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("cy"),
    )
    tot = vc.agg(
        F.sum("cx").cast("long").alias("nx"),
        F.sum("cy").cast("long").alias("ny"),
        F.sum(F.col("q") * F.col("cx")).cast("long").alias("sx"),
        F.sum(F.col("q") * F.col("cy")).cast("long").alias("sy"),
    )
    base = vc.crossJoin(F.broadcast(tot))
    cells = (
        base.filter(F.col("cx") > 0)
        .select(
            F.lit("x").alias("g"),
            F.col("cx").alias("cnt"),
            (F.abs(F.col("q") * F.col("nx") - F.col("sx")) * F.col("ny")).alias("ukey"),
        )
        .unionAll(
            base.filter(F.col("cy") > 0).select(
                F.lit("y").alias("g"),
                F.col("cy").alias("cnt"),
                (F.abs(F.col("q") * F.col("ny") - F.col("sy")) * F.col("nx")).alias(
                    "ukey"
                ),
            )
        )
    )
    uh = cells.groupBy("ukey").agg(F.sum("cnt").cast("long").alias("cu"))
    wcum = Window.orderBy("ukey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ur = uh.select(
        "ukey", (2 * (F.sum("cu").over(wcum) - F.col("cu")) + F.col("cu") + 1).alias("r2")
    )
    r2d = F.col("r2")
    cntd = F.col("cnt").cast("decimal(38,0)")
    moms = cells.join(F.broadcast(ur), "ukey").agg(
        F.sum(F.when(F.col("g") == "x", cntd * r2d * r2d).otherwise(F.lit(0))).alias(
            "t4"
        ),
        F.sum(cntd * r2d * r2d).alias("w4"),
        F.sum(cntd * r2d * r2d * r2d * r2d).alias("w16"),
    )
    r = moms.crossJoin(F.broadcast(tot))
    nxd = F.col("nx").cast("double")
    nnl = F.col("nx") + F.col("ny")
    return r.select(
        F.col("nx").cast("long").alias("n_r"),
        F.col("ny").cast("long").alias("n_n"),
        F.round(F.col("t4").cast("double") / 4, 3).alias("t_sq_ranks"),
        F.round(
            (
                F.col("t4").cast("double") / 4
                - nxd * (F.col("w4").cast("double") / 4) / nnl
            )
            / F.sqrt(
                nxd
                * F.col("ny")
                / (F.lit(16.0) * nnl * (nnl - 1))
                * (
                    F.col("w16").cast("double")
                    - F.col("w4").cast("double") * F.col("w4").cast("double") / nnl
                )
            ),
            6,
        ).alias("z_conover"),
    )


CATALOG["ml_conover_squared_ranks"].fn = _dconover


register(
    "ml_fligner_policello_ustat",
    # Fligner-Policello robust rank-order test: placements rather than
    # pooled ranks, so unequal variances don't distort the null.  With
    # doubled placements 2p_x = 2*#[y<x] + #[y=x] everything is exact:
    # U2x = sum cx*2p_x, the squared-deviation sums clear their /nx
    # denominator (nx*SS - U^2), and the final z is assembled once in
    # IEEE order: z = (U_x - U_y) / (2*sqrt(Vx + Vy + Pbar*Qbar)).
    oracle=f"""
    WITH {_CUM2_CTES},
    pl AS (
      SELECT cx, cy, 2 * ay + cy AS px2, 2 * ax + cx AS py2, nx, ny
      FROM cum
    ),
    agg AS (
      SELECT MAX(nx) AS nx, MAX(ny) AS ny,
             SUM(CAST(cx AS HUGEINT) * px2) AS u2x,
             SUM(CAST(cy AS HUGEINT) * py2) AS u2y,
             SUM(CAST(cx AS HUGEINT) * px2 * px2) AS ssx,
             SUM(CAST(cy AS HUGEINT) * py2 * py2) AS ssy
      FROM pl
    )
    SELECT CAST(nx AS BIGINT) AS n_r, CAST(ny AS BIGINT) AS n_n,
           round(CAST(u2x AS DOUBLE) / 2, 2) AS u_r,
           round(CAST(u2y AS DOUBLE) / 2, 2) AS u_n,
           round((CAST(u2x AS DOUBLE) / 2 - CAST(u2y AS DOUBLE) / 2)
                 / (2 * sqrt(
                     CAST(nx * ssx - u2x * u2x AS DOUBLE) / (4.0 * nx)
                     + CAST(ny * ssy - u2y * u2y AS DOUBLE) / (4.0 * ny)
                     + CAST(u2x AS DOUBLE) / (2.0 * nx)
                       * (CAST(u2y AS DOUBLE) / (2.0 * ny)))), 6)
             AS z_fligner_policello
    FROM agg
    """,
)


def _dfp(spark, sf_dir):
    """Fligner-Policello via doubled placements off the cumulative
    histogram frame — exact through the final one-row assembly."""
    pl = _cum2_frame(spark, sf_dir).select(
        "cx",
        "cy",
        (2 * F.col("ay") + F.col("cy")).alias("px2"),
        (2 * F.col("ax") + F.col("cx")).alias("py2"),
        "nx",
        "ny",
    )
    agg = pl.agg(
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
        F.sum(F.col("cx").cast("decimal(38,0)") * F.col("px2")).alias("u2x"),
        F.sum(F.col("cy").cast("decimal(38,0)") * F.col("py2")).alias("u2y"),
        F.sum(F.col("cx").cast("decimal(38,0)") * F.col("px2") * F.col("px2")).alias(
            "ssx"
        ),
        F.sum(F.col("cy").cast("decimal(38,0)") * F.col("py2") * F.col("py2")).alias(
            "ssy"
        ),
    )
    u2xd = F.col("u2x").cast("double")
    u2yd = F.col("u2y").cast("double")
    return agg.select(
        F.col("nx").cast("long").alias("n_r"),
        F.col("ny").cast("long").alias("n_n"),
        F.round(u2xd / 2, 2).alias("u_r"),
        F.round(u2yd / 2, 2).alias("u_n"),
        F.round(
            (u2xd / 2 - u2yd / 2)
            / (
                2
                * F.sqrt(
                    (F.col("nx") * F.col("ssx") - F.col("u2x") * F.col("u2x")).cast(
                        "double"
                    )
                    / (F.lit(4.0) * F.col("nx"))
                    + (F.col("ny") * F.col("ssy") - F.col("u2y") * F.col("u2y")).cast(
                        "double"
                    )
                    / (F.lit(4.0) * F.col("ny"))
                    + u2xd / (F.lit(2.0) * F.col("nx")) * (u2yd / (F.lit(2.0) * F.col("ny")))
                )
            ),
            6,
        ).alias("z_fligner_policello"),
    )


CATALOG["ml_fligner_policello_ustat"].fn = _dfp


register(
    "ml_ad_two_sample_stat",
    # Scholz-Stephens k-sample Anderson-Darling (k=2), the ties/
    # midrank form A2akN: per distinct value j, with doubled midpoint
    # cumulatives B2 = 2*before + c and M2_i = 2*before_i + c_i,
    # each sample contributes c*(N*M2_i - n_i*B2)^2 /
    # (B2*(2N - B2) - N*c); A2 = (N-1)/N^2 * sum_i (1/n_i) * sum_j.
    # The per-value contribution (constants folded in) is already
    # O(1), so it is quantized at 1e9 before the cross-value sum.
    oracle=f"""
    WITH {_CUM2_CTES},
    ad AS (
      SELECT c, cx, cy, 2 * ab + c AS b2, 2 * ax + cx AS m2x, 2 * ay + cy AS m2y,
             nx, ny, nn
      FROM cum
    ),
    terms AS (
      SELECT nn, nx, ny,
             CAST(floor(
               (CAST(nn AS DOUBLE) - 1) / (CAST(nn AS DOUBLE) * nn)
               * (CAST(c AS DOUBLE)
                  * (CAST(nn * m2x - nx * b2 AS DOUBLE)
                     * (nn * m2x - nx * b2)
                     / NULLIF(b2 * (2 * nn - b2) - nn * c, 0)))
               / nx * 1e9 + 0.5) AS BIGINT) AS qx,
             CAST(floor(
               (CAST(nn AS DOUBLE) - 1) / (CAST(nn AS DOUBLE) * nn)
               * (CAST(c AS DOUBLE)
                  * (CAST(nn * m2y - ny * b2 AS DOUBLE)
                     * (nn * m2y - ny * b2)
                     / NULLIF(b2 * (2 * nn - b2) - nn * c, 0)))
               / ny * 1e9 + 0.5) AS BIGINT) AS qy
      FROM ad
    )
    SELECT CAST(MAX(nx) AS BIGINT) AS n_r, CAST(MAX(ny) AS BIGINT) AS n_n,
           round((CAST(SUM(COALESCE(qx, 0)) AS DOUBLE)
                  + CAST(SUM(COALESCE(qy, 0)) AS DOUBLE)) / 1e9, 6) AS a2_stat
    FROM terms
    """,
)


def _dad2(spark, sf_dir):
    """Two-sample Anderson-Darling (Scholz-Stephens midrank form):
    doubled cumulatives keep every ingredient integer; normalized
    per-value contributions quantize at 1e9 before the sum."""
    ad = _cum2_frame(spark, sf_dir).select(
        "c",
        "cx",
        "cy",
        (2 * F.col("ab") + F.col("c")).alias("b2"),
        (2 * F.col("ax") + F.col("cx")).alias("m2x"),
        (2 * F.col("ay") + F.col("cy")).alias("m2y"),
        "nx",
        "ny",
        "nn",
    )
    nnd = F.col("nn").cast("double")
    denom = F.nullif(
        F.col("b2") * (2 * F.col("nn") - F.col("b2")) - F.col("nn") * F.col("c"),
        F.lit(0),
    )

    def _q(m2, n_i):
        num = F.col("nn") * m2 - n_i * F.col("b2")
        return F.floor(
            (nnd - 1)
            / (nnd * F.col("nn"))
            * (F.col("c").cast("double") * (num.cast("double") * num / denom))
            / n_i
            * F.lit(1e9)
            + F.lit(0.5)
        )

    terms = ad.select(
        "nn",
        "nx",
        "ny",
        _q(F.col("m2x"), F.col("nx")).alias("qx"),
        _q(F.col("m2y"), F.col("ny")).alias("qy"),
    )
    return terms.agg(
        F.max("nx").cast("long").alias("n_r"),
        F.max("ny").cast("long").alias("n_n"),
        F.round(
            (
                F.sum(F.coalesce(F.col("qx"), F.lit(0))).cast("double")
                + F.sum(F.coalesce(F.col("qy"), F.lit(0))).cast("double")
            )
            / F.lit(1e9),
            6,
        ).alias("a2_stat"),
    )


CATALOG["ml_ad_two_sample_stat"].fn = _dad2


register(
    "ml_watson_u2_two_sample",
    # Two-sample Watson U^2 (the rotation-invariant CvM variant):
    # U^2 = (nx*ny/N^2) * sum_j c_j * (d_j - dbar)^2 with d_j =
    # Fx(j) - Fy(j).  Clearing the nx*ny denominator makes D_j =
    # cumx*ny - cumy*nx an exact integer, so both sums are exact
    # HUGEINTs and U^2 = (S_cD2 - S_cD^2/N) / (N^2 * nx * ny) in one
    # final IEEE assembly.
    oracle=f"""
    WITH {_CUM2_CTES},
    wt AS (
      SELECT c, (ax + cx) * ny - (ay + cy) * nx AS d, nx, ny, nn
      FROM cum
    ),
    agg AS (
      SELECT MAX(nx) AS nx, MAX(ny) AS ny, MAX(nn) AS nn,
             SUM(CAST(c AS HUGEINT) * d) AS scd,
             SUM(CAST(c AS HUGEINT) * d * d) AS scd2
      FROM wt
    )
    SELECT CAST(nx AS BIGINT) AS n_r, CAST(ny AS BIGINT) AS n_n,
           round((CAST(scd2 AS DOUBLE)
                  - CAST(scd AS DOUBLE) * CAST(scd AS DOUBLE) / nn)
                 / (CAST(nn AS DOUBLE) * nn * (CAST(nx AS DOUBLE) * ny)), 9)
             AS u2_watson
    FROM agg
    """,
)


def _dwatson2(spark, sf_dir):
    """Two-sample Watson U^2 off the integer CDF-difference column."""
    wt = _cum2_frame(spark, sf_dir).select(
        "c",
        (
            (F.col("ax") + F.col("cx")) * F.col("ny")
            - (F.col("ay") + F.col("cy")) * F.col("nx")
        ).alias("d"),
        "nx",
        "ny",
        "nn",
    )
    agg = wt.agg(
        F.max("nx").alias("nx"),
        F.max("ny").alias("ny"),
        F.max("nn").alias("nn"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("d")).alias("scd"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("d") * F.col("d")).alias("scd2"),
    )
    nnd = F.col("nn").cast("double")
    return agg.select(
        F.col("nx").cast("long").alias("n_r"),
        F.col("ny").cast("long").alias("n_n"),
        F.round(
            (
                F.col("scd2").cast("double")
                - F.col("scd").cast("double") * F.col("scd").cast("double") / F.col("nn")
            )
            / (nnd * F.col("nn") * (F.col("nx").cast("double") * F.col("ny"))),
            9,
        ).alias("u2_watson"),
    )


CATALOG["ml_watson_u2_two_sample"].fn = _dwatson2
