"""Round-13 wave 1: one-sample goodness-of-fit and distribution-distance
statistics over the l_quantity value-domain histogram — discrete
Anderson-Darling and Watson U² against the uniform null, and three
two-sample distances (Wasserstein-1, Hellinger/Bhattacharyya, energy
distance) between the returned (R) and delivered (N) quantity
distributions.

Every statistic reduces the fact table to the 50-value quantity
histogram first; all pair/grid work is on bounded frames (50 rows, or
the 2500-cell value x value grid for the energy distance), so the plan
cost at any data scale is one GROUP BY plus bounded-frame joins.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

register(
    "ml_anderson_darling_quantity",
    # Discrete one-sample Anderson-Darling (Choulakian-Lockhart-Stephens
    # grouped form) of l_quantity against the discrete uniform on
    # {1..50}: A2 = n * sum_{j=1..49} (F_j - j/50)^2 * (1/50)
    #                 / ((j/50)(1 - j/50)).
    # With D_j = 50*cum_j - j*n (exact BIGINT) each term is
    # D_j^2 / (50*n*j*(50-j)); terms are micro-quantized at 1e6 before
    # the cross-cell sum so both engines add identical integers.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    grid AS (
      SELECT g.j, COALESCE(vc.cnt, 0) AS cnt
      FROM (SELECT unnest(generate_series(1, 50)) AS j) g
      LEFT JOIN vc ON vc.q = g.j
    ),
    cw AS (
      SELECT j, SUM(cnt) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n
      FROM grid
    ),
    terms AS (
      SELECT n,
             CAST(FLOOR(
               CAST((50 * cum - j * n) AS DOUBLE) * (50 * cum - j * n)
               * 1000000.0 / (50.0 * n * j * (50 - j)) + 0.5) AS BIGINT) AS t6
      FROM cw WHERE j <= 49
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           round(CAST(SUM(t6) AS DOUBLE) / 1000000.0, 6) AS a2_stat
    FROM terms
    """,
)


def _dandarling(spark, sf_dir):
    """Discrete AD: the corpus collapses to the 50-value histogram, the
    ECDF is a running sum over the 50-row grid, each of the 49 terms is
    an exact-integer numerator micro-quantized before the closing sum —
    goodness-of-fit for the cost of one GROUP BY."""
    li = t(spark, sf_dir, "lineitem")
    vc = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    grid = (
        spark.range(1, 51)
        .select(F.col("id").alias("j"))
        .join(F.broadcast(vc), F.col("q") == F.col("j"), "left")
        .select("j", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    )
    wcum = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cw = grid.select(
        "j",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    d = 50 * F.col("cum") - F.col("j") * F.col("n")
    terms = cw.filter(F.col("j") <= 49).select(
        "n",
        F.floor(
            d.cast("double") * d * F.lit(1000000.0)
            / (50.0 * F.col("n") * F.col("j") * (50 - F.col("j")))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t6"),
    )
    return terms.agg(
        F.max("n").cast("long").alias("n_rows"),
        F.round(F.sum("t6").cast("double") / 1000000.0, 6).alias("a2_stat"),
    )


CATALOG["ml_anderson_darling_quantity"].fn = _dandarling


register(
    "ml_watson_u2_quantity",
    # Watson's U² — the rotation-invariant (circular) refinement of the
    # Cramér-von Mises statistic — of l_quantity against the discrete
    # uniform on {1..50}.  With D_j = 50*cum_j - j*n exact:
    #   W2 = sum(D_j^2) / (125000 * n)
    #   U2 = W2 - sum(D_j)^2 / (6250000 * n)
    # Both numerator sums are exact BIGINTs, so no per-term
    # quantization is needed at all; each engine divides the same
    # integers in the same written order.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    grid AS (
      SELECT g.j, COALESCE(vc.cnt, 0) AS cnt
      FROM (SELECT unnest(generate_series(1, 50)) AS j) g
      LEFT JOIN vc ON vc.q = g.j
    ),
    cw AS (
      SELECT j, SUM(cnt) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n
      FROM grid
    ),
    agg AS (
      SELECT MAX(n) AS n,
             CAST(SUM(CAST((50 * cum - j * n) AS HUGEINT)
                      * (50 * cum - j * n)) AS DOUBLE) AS sd2,
             CAST(SUM(50 * cum - j * n) AS DOUBLE) AS sd
      FROM cw WHERE j <= 49
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(sd2 / (125000.0 * n), 6) AS w2_stat,
           round(sd2 / (125000.0 * n) - sd * sd / (6250000.0 * n), 6) AS u2_stat
    FROM agg
    """,
)


def _dwatsonu2(spark, sf_dir):
    """Watson U²: same 50-row ECDF frame as the AD query; both
    numerator sums stay exact integers (decimal(38,0) against DuckDB's
    HUGEINT), so the two closing divisions are the only IEEE ops."""
    li = t(spark, sf_dir, "lineitem")
    vc = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    grid = (
        spark.range(1, 51)
        .select(F.col("id").alias("j"))
        .join(F.broadcast(vc), F.col("q") == F.col("j"), "left")
        .select("j", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    )
    wcum = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cw = grid.select(
        "j",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    d = 50 * F.col("cum") - F.col("j") * F.col("n")
    agg = cw.filter(F.col("j") <= 49).agg(
        F.max("n").alias("n"),
        F.sum(d.cast("decimal(38,0)") * d).cast("double").alias("sd2"),
        F.sum(d).cast("double").alias("sd"),
    )
    w2 = F.col("sd2") / (125000.0 * F.col("n"))
    return agg.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(w2, 6).alias("w2_stat"),
        F.round(
            w2 - F.col("sd") * F.col("sd") / (6250000.0 * F.col("n")), 6
        ).alias("u2_stat"),
    )


CATALOG["ml_watson_u2_quantity"].fn = _dwatsonu2


register(
    "ml_wasserstein_quantity_flags",
    # 1-D Wasserstein-1 (earth mover's) distance between the returned
    # (R) and delivered (N) l_quantity distributions: on an integer
    # support with unit spacing, W1 = sum_j |F_R(j) - F_N(j)|.  The
    # ECDF gap is kept exact by cross-multiplying cumulative counts
    # (|cumR*nN - cumN*nR|), so the whole numerator is one exact
    # HUGEINT sum and the single division is the only IEEE op.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    grid AS (
      SELECT g.j, COALESCE(vc.cr, 0) AS cr, COALESCE(vc.cn, 0) AS cn
      FROM (SELECT unnest(generate_series(1, 50)) AS j) g
      LEFT JOIN vc ON vc.q = g.j
    ),
    cw AS (
      SELECT j,
             SUM(cr) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS cumr,
             SUM(cn) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS cumn,
             SUM(cr) OVER () AS nr, SUM(cn) OVER () AS nn
      FROM grid
    ),
    agg AS (
      SELECT MAX(nr) AS nr, MAX(nn) AS nn,
             CAST(SUM(ABS(CAST(cumr AS HUGEINT) * nn
                          - CAST(cumn AS HUGEINT) * nr)) AS DOUBLE) AS sgap
      FROM cw WHERE j <= 49
    )
    SELECT CAST(nr AS BIGINT) AS n_r, CAST(nn AS BIGINT) AS n_n,
           round(sgap / (CAST(nr AS DOUBLE) * nn), 6) AS w1_distance
    FROM agg
    """,
)


def _dwasserstein(spark, sf_dir):
    """Wasserstein-1 on integer support: one two-class histogram pass,
    one running sum over the 50-row grid, one exact-integer gap sum —
    the transport distance for the cost of a GROUP BY."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    vc = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("cr"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
        .cast("long")
        .alias("cn"),
    )
    grid = (
        spark.range(1, 51)
        .select(F.col("id").alias("j"))
        .join(F.broadcast(vc), F.col("q") == F.col("j"), "left")
        .select(
            "j",
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
            F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
        )
    )
    wcum = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cw = grid.select(
        "j",
        F.sum("cr").over(wcum).alias("cumr"),
        F.sum("cn").over(wcum).alias("cumn"),
        F.sum("cr").over(wall).alias("nr"),
        F.sum("cn").over(wall).alias("nn"),
    )
    agg = cw.filter(F.col("j") <= 49).agg(
        F.max("nr").alias("nr"),
        F.max("nn").alias("nn"),
        F.sum(
            F.abs(
                F.col("cumr").cast("decimal(38,0)") * F.col("nn")
                - F.col("cumn").cast("decimal(38,0)") * F.col("nr")
            )
        )
        .cast("double")
        .alias("sgap"),
    )
    return agg.select(
        F.col("nr").cast("long").alias("n_r"),
        F.col("nn").cast("long").alias("n_n"),
        F.round(
            F.col("sgap") / (F.col("nr").cast("double") * F.col("nn")), 6
        ).alias("w1_distance"),
    )


CATALOG["ml_wasserstein_quantity_flags"].fn = _dwasserstein


register(
    "ml_hellinger_bhattacharyya_flags",
    # Bhattacharyya coefficient and Hellinger distance between the R
    # and N l_quantity distributions: BC = sum_j sqrt(p_j * q_j).  IEEE
    # sqrt is correctly rounded (bit-identical across engines), but the
    # 50-cell sum is order-sensitive, so each cell's
    # sqrt(cr_j * cn_j) is micro-quantized at 1e6 before the sum; the
    # closing normalization by sqrt(nR * nN) is one IEEE op.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    tot AS (SELECT SUM(cr) AS nr, SUM(cn) AS nn FROM vc),
    cells AS (
      SELECT CAST(FLOOR(sqrt(CAST(cr AS DOUBLE) * cn) * 1000000.0 + 0.5)
                  AS BIGINT) AS s6
      FROM vc
    ),
    agg AS (SELECT CAST(SUM(s6) AS DOUBLE) AS ssum FROM cells)
    SELECT CAST(tot.nr AS BIGINT) AS n_r, CAST(tot.nn AS BIGINT) AS n_n,
           round(agg.ssum / 1000000.0
                 / sqrt(CAST(tot.nr AS DOUBLE) * tot.nn), 6) AS bc_coefficient,
           round(sqrt(1.0 - agg.ssum / 1000000.0
                      / sqrt(CAST(tot.nr AS DOUBLE) * tot.nn)), 6) AS hellinger
    FROM tot CROSS JOIN agg
    """,
)


def _dhellinger(spark, sf_dir):
    """Hellinger/Bhattacharyya: one two-class histogram, one bounded
    per-cell sqrt (micro-quantized), one 1x1 join of the cell sum with
    the class totals."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    vc = (
        li.groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("cr"),
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
            .cast("long")
            .alias("cn"),
        )
        .localCheckpoint(eager=False)  # feeds both the totals and the cells
    )
    tot = vc.agg(F.sum("cr").alias("nr"), F.sum("cn").alias("nn"))
    agg = vc.select(
        F.floor(
            F.sqrt(F.col("cr").cast("double") * F.col("cn")) * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s6")
    ).agg(F.sum("s6").cast("double").alias("ssum"))
    bc = (
        F.col("ssum")
        / 1000000.0
        / F.sqrt(F.col("nr").cast("double") * F.col("nn"))
    )
    return tot.crossJoin(F.broadcast(agg)).select(
        F.col("nr").cast("long").alias("n_r"),
        F.col("nn").cast("long").alias("n_n"),
        F.round(bc, 6).alias("bc_coefficient"),
        F.round(F.sqrt(1.0 - bc), 6).alias("hellinger"),
    )


CATALOG["ml_hellinger_bhattacharyya_flags"].fn = _dhellinger


register(
    "ml_energy_distance_quantity",
    # Energy distance between the R and N l_quantity samples:
    # E = 2*A - B - C with A = E|X-Y|, B = E|X-X'|, C = E|Y-Y'| — all
    # three expectations computed exactly from the 50-value histogram
    # as HUGEINT sums over the bounded 50x50 value grid (cr_j*cn_k*
    # |j-k|), never a sample pair join.  The three closing divisions
    # and the assembly are the only IEEE ops.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    tot AS (SELECT SUM(cr) AS nr, SUM(cn) AS nn FROM vc),
    pairs AS (
      SELECT CAST(SUM(CAST(a.cr AS HUGEINT) * b.cn * ABS(a.q - b.q)) AS DOUBLE) AS sa,
             CAST(SUM(CAST(a.cr AS HUGEINT) * b.cr * ABS(a.q - b.q)) AS DOUBLE) AS sb,
             CAST(SUM(CAST(a.cn AS HUGEINT) * b.cn * ABS(a.q - b.q)) AS DOUBLE) AS sc
      FROM vc a CROSS JOIN vc b
    )
    SELECT CAST(tot.nr AS BIGINT) AS n_r, CAST(tot.nn AS BIGINT) AS n_n,
           round(pairs.sa / (CAST(tot.nr AS DOUBLE) * tot.nn), 6) AS a_cross,
           round(pairs.sb / (CAST(tot.nr AS DOUBLE) * tot.nr), 6) AS b_within_r,
           round(pairs.sc / (CAST(tot.nn AS DOUBLE) * tot.nn), 6) AS c_within_n,
           round(2.0 * (pairs.sa / (CAST(tot.nr AS DOUBLE) * tot.nn))
                 - pairs.sb / (CAST(tot.nr AS DOUBLE) * tot.nr)
                 - pairs.sc / (CAST(tot.nn AS DOUBLE) * tot.nn), 6)
             AS energy_distance
    FROM tot CROSS JOIN pairs
    """,
)


def _denergydist(spark, sf_dir):
    """Energy distance from histograms: the fact table reduces to one
    two-class 50-value histogram; all pairwise-|x-y| mass comes from
    the bounded 50x50 grid self-join (2500 cells at ANY data scale) in
    exact decimal(38,0); the statistic assembles from three scalars."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    vc = (
        li.groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("cr"),
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
            .cast("long")
            .alias("cn"),
        )
        .localCheckpoint(eager=False)  # feeds totals and both grid sides
    )
    tot = vc.agg(F.sum("cr").alias("nr"), F.sum("cn").alias("nn"))
    a = vc.select(
        F.col("q").alias("aq"), F.col("cr").alias("acr"), F.col("cn").alias("acn")
    )
    b = vc.select(
        F.col("q").alias("bq"), F.col("cr").alias("bcr"), F.col("cn").alias("bcn")
    )
    gap = F.abs(F.col("aq") - F.col("bq"))
    pairs = a.crossJoin(F.broadcast(b)).agg(
        F.sum(F.col("acr").cast("decimal(38,0)") * F.col("bcn") * gap)
        .cast("double")
        .alias("sa"),
        F.sum(F.col("acr").cast("decimal(38,0)") * F.col("bcr") * gap)
        .cast("double")
        .alias("sb"),
        F.sum(F.col("acn").cast("decimal(38,0)") * F.col("bcn") * gap)
        .cast("double")
        .alias("sc"),
    )
    a_cross = F.col("sa") / (F.col("nr").cast("double") * F.col("nn"))
    b_within = F.col("sb") / (F.col("nr").cast("double") * F.col("nr"))
    c_within = F.col("sc") / (F.col("nn").cast("double") * F.col("nn"))
    return tot.crossJoin(F.broadcast(pairs)).select(
        F.col("nr").cast("long").alias("n_r"),
        F.col("nn").cast("long").alias("n_n"),
        F.round(a_cross, 6).alias("a_cross"),
        F.round(b_within, 6).alias("b_within_r"),
        F.round(c_within, 6).alias("c_within_n"),
        F.round(2.0 * a_cross - b_within - c_within, 6).alias("energy_distance"),
    )


CATALOG["ml_energy_distance_quantity"].fn = _denergydist
