"""Split from queries.py lines 30895-31574 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# ===========================================================================
# round-11 wave 5: the econometrics tier — Simpson's-paradox scanning,
# log-log elasticity, negative-binomial dispersion, Cook's-distance
# influence, chi-square cell residuals, and an SPRT conversion monitor.
# ===========================================================================

register(
    "orders_simpsons_paradox_scan",
    # the aggregation trap detector: the sign of the price~quantity
    # slope computed over ALL lineitems vs within each part brand.
    # Slope sign = sign(n*Sxy - Sx*Sy) is an EXACT wide-integer
    # comparison, so "group disagrees with the aggregate" is a hard
    # boolean — the Simpson's-paradox audit every BI rollup should run
    # before trusting a trend, at GROUP BY cost.
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT p.p_brand AS brand, CAST(l.l_quantity AS BIGINT) AS q,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    g AS MATERIALIZED (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sx, CAST(SUM(cents) AS BIGINT) AS sy,
             SUM(CAST(q AS HUGEINT) * cents) AS sxy
      FROM x GROUP BY brand
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
             CAST(SUM(sy) AS BIGINT) AS sy, SUM(sxy) AS sxy
      FROM g
    ),
    osign AS (
      SELECT CASE WHEN n * sxy > CAST(sx AS HUGEINT) * sy THEN 1
                  WHEN n * sxy < CAST(sx AS HUGEINT) * sy THEN -1 ELSE 0 END
                 AS overall_sign
      FROM tot
    )
    SELECT g.brand, g.n,
           CASE WHEN g.n * g.sxy > CAST(g.sx AS HUGEINT) * g.sy THEN 1
                WHEN g.n * g.sxy < CAST(g.sx AS HUGEINT) * g.sy THEN -1 ELSE 0 END
               AS group_sign,
           o.overall_sign,
           (CASE WHEN g.n * g.sxy > CAST(g.sx AS HUGEINT) * g.sy THEN 1
                 WHEN g.n * g.sxy < CAST(g.sx AS HUGEINT) * g.sy THEN -1 ELSE 0 END)
               = o.overall_sign AS agrees
    FROM g CROSS JOIN osign o
    ORDER BY g.brand
    """,
)


def _dsimpsons(spark, sf_dir):
    """Simpson scan: one brand-keyed moment aggregate (the broadcast
    part join is the only wide stage), the overall moments are the SUM
    of the group moments (no second scan), and every sign is an exact
    integer comparison."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    d19 = "decimal(19,0)"
    x = li.join(F.broadcast(p.select("p_partkey", "p_brand")), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_extendedprice").cast(DEC) * 100).cast("long").alias("cents"),
    )
    g = x.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("sx"),
        F.sum("cents").cast("long").alias("sy"),
        F.sum(F.col("q").cast(d19) * F.col("cents").cast(d19)).alias("sxy"),
    ).localCheckpoint(eager=False)
    tot = g.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sx").cast("long").alias("sx"),
        F.sum("sy").cast("long").alias("sy"),
        F.sum("sxy").alias("sxy"),
    )

    def sign(n, sxy, sx, sy):
        lhs = n.cast("decimal(38,0)") * sxy
        rhs = sx.cast(d19) * sy.cast(d19)
        return F.when(lhs > rhs, 1).when(lhs < rhs, -1).otherwise(0)

    osign = tot.select(
        sign(F.col("n"), F.col("sxy"), F.col("sx"), F.col("sy")).alias("overall_sign")
    )
    gs = sign(F.col("n"), F.col("sxy"), F.col("sx"), F.col("sy"))
    return (
        g.crossJoin(F.broadcast(osign))
        .select(
            "brand",
            "n",
            gs.alias("group_sign"),
            "overall_sign",
            (gs == F.col("overall_sign")).alias("agrees"),
        )
        .orderBy("brand")
    )


CATALOG["orders_simpsons_paradox_scan"].fn = _dsimpsons

register(
    "lineitem_price_elasticity_loglog",
    # the econometrician's workhorse: elasticity of ordered quantity
    # w.r.t. catalog price as the slope of ln(qty) on ln(price), per
    # return flag. Both logs take exact integer inputs (quantity;
    # retail-price cents over the 100.0 literal), round to 6dp and
    # quantize to micro-units, so the OLS moments are exact integer
    # sums and slope / intercept / r^2 are single double expressions.
    oracle="""
    WITH x AS (
      SELECT l.l_returnflag AS flag,
             CAST(floor(round(ln(CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100
                                     AS BIGINT) / 100.0), 6) * 1000000 + 0.5)
                  AS BIGINT) AS lx6,
             CAST(floor(round(ln(CAST(l.l_quantity AS BIGINT)), 6) * 1000000 + 0.5)
                  AS BIGINT) AS ly6
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    m AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(lx6) AS BIGINT) AS sx, CAST(SUM(ly6) AS BIGINT) AS sy,
             SUM(CAST(lx6 AS HUGEINT) * lx6) AS sxx,
             SUM(CAST(lx6 AS HUGEINT) * ly6) AS sxy,
             SUM(CAST(ly6 AS HUGEINT) * ly6) AS syy
      FROM x GROUP BY flag
    )
    SELECT flag AS l_returnflag, n,
           round(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6)
               AS elasticity,
           round((CAST(sy AS DOUBLE) - (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)) * sx)
                 / n / 1000000.0, 6) AS intercept_ln_qty,
           round(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / (CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6)
               AS r_squared
    FROM m ORDER BY flag
    """,
)


def _delasticity(spark, sf_dir):
    """Log-log elasticity: one broadcast part join, logs quantized to
    micro-units at the row level, ONE moment aggregate per flag —
    demand-curve slopes without a single order-dependent float sum."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    d19 = "decimal(19,0)"
    price_cents = (F.col("p_retailprice").cast(DEC) * 100).cast("long")
    x = li.join(
        F.broadcast(p.select("p_partkey", "p_retailprice")), li.l_partkey == p.p_partkey
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.round(F.log(price_cents / 100.0), 6) * 1e6 + 0.5)
        .cast("long")
        .alias("lx6"),
        F.floor(F.round(F.log(F.col("l_quantity").cast("long")), 6) * 1e6 + 0.5)
        .cast("long")
        .alias("ly6"),
    )
    m = x.groupBy("flag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("lx6").cast("long").alias("sx"),
        F.sum("ly6").cast("long").alias("sy"),
        F.sum(F.col("lx6").cast(d19) * F.col("lx6").cast(d19)).alias("sxx"),
        F.sum(F.col("lx6").cast(d19) * F.col("ly6").cast(d19)).alias("sxy"),
        F.sum(F.col("ly6").cast(d19) * F.col("ly6").cast(d19)).alias("syy"),
    )
    nn = F.col("n").cast("decimal(38,0)")
    cnum = (nn * F.col("sxy") - F.col("sx").cast(d19) * F.col("sy").cast(d19)).cast(
        "double"
    )
    vx = (nn * F.col("sxx") - F.col("sx").cast(d19) * F.col("sx").cast(d19)).cast(
        "double"
    )
    vy = (nn * F.col("syy") - F.col("sy").cast(d19) * F.col("sy").cast(d19)).cast(
        "double"
    )
    return m.select(
        F.col("flag").alias("l_returnflag"),
        "n",
        F.round(cnum / vx, 6).alias("elasticity"),
        F.round(
            (F.col("sy").cast("double") - (cnum / vx) * F.col("sx")) / F.col("n") / 1e6,
            6,
        ).alias("intercept_ln_qty"),
        F.round(cnum * cnum / (vx * vy), 6).alias("r_squared"),
    ).orderBy("l_returnflag")


CATALOG["lineitem_price_elasticity_loglog"].fn = _delasticity

register(
    "cust_negative_binomial_orders_fit",
    # is per-customer order count over-dispersed? Method-of-moments
    # negative-binomial fit over ALL customers (zeros included via the
    # left join): dispersion index v/m, NB size r = m^2/(v-m) and
    # p = m/v, plus the observed zero share — every input an exact
    # integer moment, every output one double expression. The
    # count-model triage a marketing DB runs before Poisson regression.
    oracle="""
    WITH k AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS k
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(k) AS BIGINT) AS s1,
             SUM(CAST(k AS HUGEINT) * k) AS s2,
             CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
      FROM k
    )
    SELECT n, s1 AS n_orders, n_zero,
           round(CAST(n_zero AS DOUBLE) / n, 6) AS zero_share,
           round(CAST(s1 AS DOUBLE) / n, 6) AS mean_orders,
           round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                 / (n - 1), 6) AS var_orders,
           round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                  / (n - 1)) / (CAST(s1 AS DOUBLE) / n), 6) AS dispersion_index,
           round((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                 / NULLIF(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                           / (n - 1)) - CAST(s1 AS DOUBLE) / n, 0), 6) AS nb_r,
           round((CAST(s1 AS DOUBLE) / n)
                 / NULLIF((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                          / (n - 1), 0), 6) AS nb_p
    FROM m
    """,
)


def _dnegbin(spark, sf_dir):
    """NB fit: one left-join count (zeros kept — dropping them is the
    classic dispersion-estimate bug), one moment aggregate, one
    projection."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    d19 = "decimal(19,0)"
    k = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("k"))
    )
    m = k.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("s1"),
        F.sum(F.col("k").cast(d19) * F.col("k").cast(d19)).alias("s2"),
        F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).cast("long").alias("n_zero"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    return m.select(
        "n",
        F.col("s1").alias("n_orders"),
        "n_zero",
        F.round(F.col("n_zero").cast("double") / F.col("n"), 6).alias("zero_share"),
        F.round(mean, 6).alias("mean_orders"),
        F.round(var, 6).alias("var_orders"),
        F.round(var / mean, 6).alias("dispersion_index"),
        F.round(mean * mean / F.nullif(var - mean, F.lit(0.0)), 6).alias("nb_r"),
        F.round(mean / F.nullif(var, F.lit(0.0)), 6).alias("nb_p"),
    )


CATALOG["cust_negative_binomial_orders_fit"].fn = _dnegbin

# The order-size regression (totalprice cents on lineitem count),
# single-sourced: the micro-quantized EXACT-integer line and residual
# frame feed Cook's distance, the Breusch-Pagan heteroskedasticity test
# and the Durbin-Watson diagnostic family, so every diagnostic scores
# the SAME fitted line. Slope/intercept are quantized once (floor(x*1e6
# +0.5) BIGINT), so every residual e6_i = 1e6*y_i - (i6 + s6*x_i) is an
# exact integer and downstream sums are order-independent wide-ints.
_ORDER_REG_CTES = """
    WITH u AS MATERIALIZED (
      SELECT o.o_orderkey,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey) AS x
      FROM orders o
    ),
    m AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM u
    ),
    beta AS MATERIALIZED (
      SELECT n, sx, sy, sxx,
             CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                        / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS s6
      FROM m
    ),
    b0 AS MATERIALIZED (
      SELECT n, sx, sxx, s6,
             CAST(floor((CAST(sy AS HUGEINT) * 1000000 - CAST(s6 AS HUGEINT) * sx)
                        / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS i6
      FROM beta
    ),
    r AS MATERIALIZED (
      SELECT u.o_orderkey, u.x, u.y,
             u.y * 1000000 - (b.i6 + b.s6 * u.x) AS e6
      FROM u CROSS JOIN b0 b
    )
"""


def _order_reg_resid(spark, sf_dir):
    """The Spark twin of _ORDER_REG_CTES: builds the per-order unit
    frame, fixes the micro-quantized exact-integer line, and returns
    the residual frame (o_orderkey, x, y, e6) carrying the moment
    columns (n, sx, sxx) every diagnostic needs. Checkpointed — it is
    always multi-consumed."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    d19 = "decimal(19,0)"
    cnt = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count("*").cast("long").alias("x")
    )
    u = (
        o.select(
            "o_orderkey", (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("y")
        )
        .join(cnt, "o_orderkey", "left")
        .select("o_orderkey", "y", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
        .localCheckpoint(eager=False)
    )
    m = u.agg(
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
        "sxx",
        F.floor(
            (nn * F.col("sxy") - F.col("sx").cast(d19) * F.col("sy").cast(d19)).cast(
                "double"
            )
            / (nn * F.col("sxx") - F.col("sx").cast(d19) * F.col("sx").cast(d19)).cast(
                "double"
            )
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("s6"),
    )
    b0 = beta.select(
        "n",
        "sx",
        "sxx",
        "s6",
        F.floor(
            (
                F.col("sy").cast(d19) * 1000000 - F.col("s6").cast(d19) * F.col("sx")
            ).cast("double")
            / F.col("n").cast("double")
            + 0.5
        )
        .cast("long")
        .alias("i6"),
    ).localCheckpoint(eager=False)
    return u.crossJoin(F.broadcast(b0)).select(
        "o_orderkey",
        "x",
        "y",
        (F.col("y") * 1000000 - (F.col("i6") + F.col("s6") * F.col("x"))).alias("e6"),
        "n",
        "sx",
        "sxx",
    ).localCheckpoint(eager=False)


register(
    "ml_cooks_distance_topk",
    # influence diagnostics for the order-size regression (totalprice
    # on lineitem count): the top-10 orders by Cook's distance. The
    # slope and intercept are micro-quantized EXACT integers, so every
    # residual e6_i = 1e6*y_i - (i6 + s6*x_i) is an exact integer, the
    # SSE is an exact wide-int sum (no order-dependent float
    # accumulation), leverage is an exact rational, and the ranking
    # key is micro-quantized D — the refit-worthiness list that
    # can't drift. The line/residual frame is single-sourced in
    # _ORDER_REG_CTES (shared with Breusch-Pagan and Durbin-Watson).
    oracle=f"""
    {_ORDER_REG_CTES},
    sse AS (
      SELECT SUM(CAST(e6 AS HUGEINT) * e6) AS sse12 FROM r
    ),
    d AS (
      SELECT r.o_orderkey, r.x, r.y, r.e6,
             (1.0 / b.n
              + CAST((b.n * r.x - b.sx) AS DOUBLE) * (b.n * r.x - b.sx)
                / b.n / CAST(b.n * b.sxx - CAST(b.sx AS HUGEINT) * b.sx AS DOUBLE))
                 AS h,
             CAST(sse.sse12 AS DOUBLE) / (b.n - 2) AS s2_12
      FROM r CROSS JOIN b0 b CROSS JOIN sse
    ),
    scored AS (
      SELECT o_orderkey, x, y, e6, h,
             CAST(floor((CAST(e6 AS DOUBLE) * e6 / s2_12) * h / (2.0 * (1.0 - h) * (1.0 - h))
                        * 1000000 + 0.5) AS BIGINT) AS d6
      FROM d
    )
    SELECT o_orderkey, x AS n_items,
           round(y / 100.0, 6) AS totalprice,
           round(e6 / 1000000.0 / 100.0, 6) AS residual,
           round(h, 6) AS leverage,
           round(d6 / 1000000.0, 6) AS cooks_d
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY d6 DESC, o_orderkey) AS rn FROM scored)
    WHERE rn <= 10 ORDER BY cooks_d DESC, o_orderkey
    """,
)


def _dcooks(spark, sf_dir):
    """Cook's distance over the shared _order_reg_resid frame:
    residuals and leverage are projections over exact integers, and
    the top-10 is a TakeOrdered on the quantized key."""
    d19 = "decimal(19,0)"
    nn = F.col("n").cast("decimal(38,0)")
    r = _order_reg_resid(spark, sf_dir)
    sse = r.agg(F.sum(F.col("e6").cast(d19) * F.col("e6").cast(d19)).alias("sse12"))
    h = (
        1.0 / F.col("n")
        + (F.col("n") * F.col("x") - F.col("sx")).cast("double")
        * (F.col("n") * F.col("x") - F.col("sx"))
        / F.col("n")
        / (nn * F.col("sxx") - F.col("sx").cast(d19) * F.col("sx").cast(d19)).cast(
            "double"
        )
    )
    s2 = F.col("sse12").cast("double") / (F.col("n") - 2)
    scored = r.crossJoin(F.broadcast(sse)).select(
        "o_orderkey",
        "x",
        "y",
        "e6",
        h.alias("h"),
        F.floor(
            (F.col("e6").cast("double") * F.col("e6") / s2)
            * h
            / (2.0 * (1.0 - h) * (1.0 - h))
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("d6"),
    )
    top = scored.orderBy(F.desc("d6"), "o_orderkey").limit(10)
    return top.select(
        "o_orderkey",
        F.col("x").alias("n_items"),
        F.round(F.col("y") / 100.0, 6).alias("totalprice"),
        F.round(F.col("e6") / 1e6 / 100.0, 6).alias("residual"),
        F.round(F.col("h"), 6).alias("leverage"),
        F.round(F.col("d6") / 1e6, 6).alias("cooks_d"),
    ).orderBy(F.desc("cooks_d"), "o_orderkey")


CATALOG["ml_cooks_distance_topk"].fn = _dcooks

register(
    "part_brand_size_chi2_residuals",
    # cell-level diagnostics the chi-square STATISTIC hides: the
    # top-10 standardized Pearson residuals (O-E)/sqrt(E) of the
    # brand x size contingency table, ranked by the micro-
    # quantized |residual|. O is an exact count, E an exact rational
    # rb*rc/N, and the sign says over- vs under-stocked combo — the
    # actionable cells behind the independence test.
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT p_brand AS brand, CAST(p_size AS BIGINT) AS psize,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM part GROUP BY 1, 2
    ),
    rb AS (SELECT brand, CAST(SUM(o) AS BIGINT) AS nb FROM cells GROUP BY 1),
    rc AS (SELECT psize, CAST(SUM(o) AS BIGINT) AS nc FROM cells GROUP BY 1),
    nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    scored AS (
      SELECT c.brand, c.psize, c.o,
             CAST(rb.nb AS DOUBLE) * rc.nc / nn.n AS e,
             (c.o - CAST(rb.nb AS DOUBLE) * rc.nc / nn.n)
               / sqrt(CAST(rb.nb AS DOUBLE) * rc.nc / nn.n) AS resid
      FROM cells c JOIN rb USING (brand) JOIN rc USING (psize) CROSS JOIN nn
    ),
    q AS (
      SELECT brand, psize, o, e, resid,
             CAST(floor(abs(resid) * 1000000 + 0.5) AS BIGINT) AS a6
      FROM scored
    )
    SELECT brand, psize, o AS observed,
           round(e, 6) AS expected, round(resid, 6) AS std_residual
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY a6 DESC, brand, psize) AS rn
          FROM q)
    WHERE rn <= 10 ORDER BY a6 DESC, brand, psize
    """,
)


def _dchi2resid(spark, sf_dir):
    """Chi-square cell residuals: one contingency pass, marginals from
    the cell frame, a projection per cell, TakeOrdered on the
    quantized |residual|."""
    p = t(spark, sf_dir, "part")
    cells = (
        p.groupBy(
            F.col("p_brand").alias("brand"), F.col("p_size").cast("long").alias("psize")
        )
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    rb = cells.groupBy("brand").agg(F.sum("o").cast("long").alias("nb"))
    rc = cells.groupBy("psize").agg(F.sum("o").cast("long").alias("nc"))
    nn = cells.agg(F.sum("o").cast("long").alias("n"))
    e = F.col("nb").cast("double") * F.col("nc") / F.col("n")
    resid = (F.col("o") - e) / F.sqrt(e)
    scored = (
        cells.join(F.broadcast(rb), "brand")
        .join(F.broadcast(rc), "psize")
        .crossJoin(F.broadcast(nn))
        .select(
            "brand",
            "psize",
            "o",
            e.alias("e"),
            resid.alias("resid"),
            F.floor(F.abs(resid) * 1e6 + 0.5).cast("long").alias("a6"),
        )
    )
    top = scored.orderBy(F.desc("a6"), "brand", "psize").limit(10)
    return (
        top.select(
            "brand",
            "psize",
            F.col("o").alias("observed"),
            F.round("e", 6).alias("expected"),
            F.round("resid", 6).alias("std_residual"),
            "a6",
        )
        .orderBy(F.desc("a6"), "brand", "psize")
        .drop("a6")
    )


CATALOG["part_brand_size_chi2_residuals"].fn = _dchi2resid


# --- SPRT conversion monitor ----------------------------------------------
# Wald's sequential probability ratio test on the daily urgent-order
# share: H0 p=0.20 vs H1 p=0.25, alpha = beta = 0.05. The per-
# observation log-likelihood increments and the decision thresholds
# are irrational, so they are quantized to nano-units ONCE here (in
# Python, at import) and the SAME integer literals feed both engines —
# the teleport-constant lesson applied to sequential testing. The
# whole monitor is then an integer random walk.
import math as _math

_SPRT_P0, _SPRT_P1, _SPRT_ALPHA = 0.20, 0.25, 0.05
_SPRT_A9 = round(_math.log(_SPRT_P1 / _SPRT_P0) * 1e9)          # + per success
_SPRT_B9 = round(_math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1e9)  # + per failure
_SPRT_HI9 = round(_math.log((1 - _SPRT_ALPHA) / _SPRT_ALPHA) * 1e9)  # accept H1
_SPRT_LO9 = -_SPRT_HI9                                           # accept H0

register(
    "ml_sprt_conversion_monitor",
    # the sequential A/B stopping rule: cumulative LLR over calendar
    # days (daily urgent/total counts ride one aggregate; the walk is
    # LLR9 = A9*successes + B9*failures, EXACT integers), first
    # boundary crossing decides. Reports the decision, the crossing
    # day and the walk extremes — early stopping with provable error
    # rates, no peeking penalty.
    oracle=f"""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                  AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT day, s, n,
             SUM(s) OVER (ORDER BY day) AS cs,
             SUM(n - s) OVER (ORDER BY day) AS cf,
             {_SPRT_A9} * SUM(s) OVER (ORDER BY day)
             + {_SPRT_B9} * SUM(n - s) OVER (ORDER BY day) AS llr9
      FROM d
    ),
    x AS MATERIALIZED (
      SELECT day, cs, cf, llr9,
             CASE WHEN llr9 >= {_SPRT_HI9} THEN 'accept_h1'
                  WHEN llr9 <= {_SPRT_LO9} THEN 'accept_h0'
                  ELSE 'continue' END AS state
      FROM w
    ),
    cross_day AS (
      SELECT MIN(day) AS decision_day FROM x WHERE state <> 'continue'
    ),
    final AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(MAX(llr9) AS BIGINT) AS max9, CAST(MIN(llr9) AS BIGINT) AS min9
      FROM x
    )
    SELECT f.n_days,
           COALESCE((SELECT x.state FROM x JOIN cross_day c ON x.day = c.decision_day),
                    'continue') AS decision,
           COALESCE(strftime((SELECT decision_day FROM cross_day), '%Y-%m-%d'),
                    'none') AS decision_day,
           round(f.max9 / 1000000000.0, 6) AS llr_max,
           round(f.min9 / 1000000000.0, 6) AS llr_min
    FROM final f
    """,
)


def _dsprt(spark, sf_dir):
    """SPRT: one daily aggregate, one running-sum window over the
    calendar frame, the boundary test is an integer comparison and the
    decision day a MIN over crossing rows — sequential testing at
    rollup cost."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
        .cast("long")
        .alias("s"),
        F.count("*").cast("long").alias("n"),
    )
    w = Window.orderBy("day")
    x = d.select(
        "day",
        (
            F.lit(_SPRT_A9) * F.sum("s").over(w)
            + F.lit(_SPRT_B9) * F.sum(F.col("n") - F.col("s")).over(w)
        ).alias("llr9"),
    ).select(
        "day",
        "llr9",
        F.when(F.col("llr9") >= _SPRT_HI9, "accept_h1")
        .when(F.col("llr9") <= _SPRT_LO9, "accept_h0")
        .otherwise("continue")
        .alias("state"),
    ).localCheckpoint(eager=False)
    # min_by over the crossing rows: a global aggregate always returns
    # one row (nulls when no crossing), so the no-decision case needs
    # no union trick — COALESCE closes it deterministically.
    crossing = x.filter(F.col("state") != "continue").agg(
        F.min_by("state", "day").alias("__cstate"),
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("__cday"),
    )
    final = x.agg(
        F.count("*").cast("long").alias("n_days"),
        F.max("llr9").cast("long").alias("max9"),
        F.min("llr9").cast("long").alias("min9"),
    )
    return final.crossJoin(F.broadcast(crossing)).select(
        "n_days",
        F.coalesce(F.col("__cstate"), F.lit("continue")).alias("decision"),
        F.coalesce(F.col("__cday"), F.lit("none")).alias("decision_day"),
        F.round(F.col("max9") / 1e9, 6).alias("llr_max"),
        F.round(F.col("min9") / 1e9, 6).alias("llr_min"),
    )


CATALOG["ml_sprt_conversion_monitor"].fn = _dsprt


