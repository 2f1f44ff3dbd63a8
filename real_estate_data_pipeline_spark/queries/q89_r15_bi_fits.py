"""Round-15 wave 9: BI concentration + distribution fits — the BCG
growth-share matrix of brands (1995->1996 revenue growth crossed with
1996 revenue share, integer-exact quadrant cuts), the Rosenbluth /
Hall-Tideman concentration index over part revenue ranks, the
health-economics concentration index of discount mass across the
customer revenue ranking, a Generalized Pareto method-of-moments fit
of order-total excesses over the 90th percentile, and a
zero-truncated Poisson fit of lineitems-per-order via three unrolled
fixed-point steps.

Exactness: all revenue masses are exact cents integers; quadrant and
share cuts compare cross-multiplied integers (never ratios); the
fractional-rank concentration index clears to
sum y_i (2i-1) / (n * sum y) - 1 (one double division); the 90th-
percentile threshold works in deci-cents where 10*quantile_cont(0.9)
is exactly integer; ZTP fixed-point steps quantize exp at 6dp per
step (the house exp precedent) so the iterate sequence is bit-equal
on both engines.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

register(
    "part_bcg_growth_share_matrix",
    # BCG quadrants per brand: growth = 1996 vs 1995 revenue (cut at
    # zero growth: r96 > r95, integer), share = 1996 revenue vs the
    # equal-share line (25 * r96_i > total96, integer).  STAR = grew +
    # above-line, CASH_COW = shrank + above-line, QUESTION = grew +
    # below, DOG = shrank + below.
    oracle="""
    WITH br AS (
      SELECT p.p_brand AS brand,
             CAST(SUM(CASE WHEN year(l.l_shipdate) = 1995
                  THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS r95,
             CAST(SUM(CASE WHEN year(l.l_shipdate) = 1996
                  THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                            AS BIGINT) ELSE 0 END) AS BIGINT) AS r96
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(r96) AS BIGINT) AS t96,
                   CAST(COUNT(*) AS BIGINT) AS nb FROM br)
    SELECT CASE WHEN r96 > r95 AND nb * r96 > t96 THEN 'STAR'
                WHEN r96 <= r95 AND nb * r96 > t96 THEN 'CASH_COW'
                WHEN r96 > r95 THEN 'QUESTION'
                ELSE 'DOG' END AS quadrant,
           CAST(COUNT(*) AS BIGINT) AS n_brands,
           round(CAST(SUM(r96) AS DOUBLE) / 100, 2) AS revenue_1996,
           round(CAST(SUM(r96) AS DOUBLE) / MAX(t96), 9) AS share_1996
    FROM br CROSS JOIN tot
    GROUP BY 1 ORDER BY 1
    """,
)


def _dbcg(spark, sf_dir):
    """BCG matrix with integer quadrant cuts."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cents = (F.col("l_extendedprice").cast(DEC) * 100).cast("long")
    br = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")),
                li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.when(F.year("l_shipdate") == 1995, cents).otherwise(0))
            .cast("long")
            .alias("r95"),
            F.sum(F.when(F.year("l_shipdate") == 1996, cents).otherwise(0))
            .cast("long")
            .alias("r96"),
        )
    )
    tot = br.agg(
        F.sum("r96").cast("long").alias("t96"),
        F.count("*").cast("long").alias("nb"),
    )
    j = br.crossJoin(F.broadcast(tot))
    grew = F.col("r96") > F.col("r95")
    above = F.col("nb") * F.col("r96") > F.col("t96")
    quad = (
        F.when(grew & above, "STAR")
        .when(~grew & above, "CASH_COW")
        .when(grew, "QUESTION")
        .otherwise("DOG")
    )
    return (
        j.groupBy(quad.alias("quadrant"))
        .agg(
            F.count("*").cast("long").alias("n_brands"),
            F.round(F.sum("r96").cast("double") / 100, 2).alias("revenue_1996"),
            F.round(F.sum("r96").cast("double") / F.max("t96"), 9).alias(
                "share_1996"
            ),
        )
        .orderBy("quadrant")
    )


CATALOG["part_bcg_growth_share_matrix"].fn = _dbcg


register(
    "lineitem_rosenbluth_hti",
    # Rosenbluth / Hall-Tideman concentration index over part revenue
    # shares: HT = 1 / (2 * sum_i i * s_i - 1) with i the descending
    # revenue rank (custkey tie-break).  sum i*cents is one exact
    # wide-int; a single double division at the end.
    oracle="""
    WITH pr AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    rk AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents DESC, pk) AS i FROM pr
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(cents) AS BIGINT) AS tot,
             SUM(CAST(i AS HUGEINT) * cents) AS si
      FROM rk
    )
    SELECT n_parts,
           round(2 * CAST(si AS DOUBLE) / tot - 1, 9) AS weighted_rank_sum,
           round(1 / (2 * CAST(si AS DOUBLE) / tot - 1), 9) AS rosenbluth_hti
    FROM s
    """,
)


def _drosenbluth(spark, sf_dir):
    """HTI off one ranked integer dot product."""
    li = t(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum((F.col("l_extendedprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    rk = pr.select(
        "cents",
        F.row_number().over(Window.orderBy(F.desc("cents"), "pk")).alias("i"),
    )
    s = rk.agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("tot"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("si"),
    )
    wrs = 2 * F.col("si").cast("double") / F.col("tot") - 1
    return s.select(
        "n_parts",
        F.round(wrs, 9).alias("weighted_rank_sum"),
        F.round(1 / wrs, 9).alias("rosenbluth_hti"),
    )


CATALOG["lineitem_rosenbluth_hti"].fn = _drosenbluth


register(
    "cust_concentration_index_discount",
    # Health-economics concentration index: is discount mass
    # concentrated among high-revenue customers?  C = sum y_i (2i-1)
    # / (n * sum y) - 1 with i the ASCENDING revenue rank (fractional
    # ranks cleared to integers), y = per-customer discount cents.
    # C > 0 means the rich get the discounts.
    oracle="""
    WITH cm AS (
      SELECT o.o_custkey AS ck,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * CAST(l.l_discount AS DECIMAL(18,2)) * 10000
                           AS BIGINT)) AS BIGINT) AS disc
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1
    ),
    rk AS (
      SELECT disc, ROW_NUMBER() OVER (ORDER BY rev, ck) AS i FROM cm
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(disc) AS BIGINT) AS sy,
             SUM(CAST(2 * i - 1 AS HUGEINT) * disc) AS syr
      FROM rk
    )
    SELECT n AS n_customers,
           round(CAST(syr AS DOUBLE) / (CAST(n AS DOUBLE) * sy) - 1, 9)
             AS concentration_index
    FROM s
    """,
)


def _dconcentration(spark, sf_dir):
    """Concentration index off the integer rank dot product."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    rev = (F.col("l_extendedprice").cast(DEC) * 100).cast("long")
    # price*discount carries 4dp — scale by 1e4 so the cast drops NO
    # fraction (engines round truncated fractions differently)
    disc = (
        F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC) * 10000
    ).cast("long")
    cm = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(rev).cast("long").alias("rev"),
            F.sum(disc).cast("long").alias("disc"),
        )
    )
    rk = cm.select(
        "disc", F.row_number().over(Window.orderBy("rev", "ck")).alias("i")
    )
    s = rk.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("disc").cast("long").alias("sy"),
        F.sum((2 * F.col("i") - 1).cast("decimal(38,0)") * F.col("disc")).alias(
            "syr"
        ),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(
            F.col("syr").cast("double") / (F.col("n").cast("double") * F.col("sy"))
            - 1,
            9,
        ).alias("concentration_index"),
    )


CATALOG["cust_concentration_index_discount"].fn = _dconcentration


register(
    "ml_gpd_mom_excesses",
    # Generalized Pareto method-of-moments fit of order-total excesses
    # over the 90th percentile: xi = (1 - m^2/v)/2, sigma = m(m^2/v
    # + 1)/2.  The threshold works in DECI-cents: 10*quantile_cont(0.9)
    # is exactly integer (the interpolation weight is a tenth), so
    # excesses are pure integers and both moments exact.
    oracle="""
    WITH x AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM orders
    ),
    thr AS (SELECT CAST(floor(10 * quantile_cont(c, 0.9) + 0.5) AS BIGINT)
             AS u10 FROM x),
    e AS (
      SELECT 10 * c - u10 AS exc10 FROM x CROSS JOIN thr WHERE 10 * c > u10
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(exc10) AS HUGEINT) AS se,
             SUM(CAST(exc10 AS HUGEINT) * exc10) AS se2
      FROM e
    )
    SELECT k AS n_excess,
           round((SELECT u10 FROM thr) / 1000.0, 2) AS threshold,
           round(CAST(se AS DOUBLE) / k / 1000, 6) AS mean_excess,
           round((1 - (CAST(se AS DOUBLE) / k) * (CAST(se AS DOUBLE) / k)
                      / ((CAST(se2 AS DOUBLE) - CAST(se AS DOUBLE) * se / k)
                         / (k - 1))) / 2, 9) AS xi_mom,
           round((CAST(se AS DOUBLE) / k / 1000)
                 * ((CAST(se AS DOUBLE) / k) * (CAST(se AS DOUBLE) / k)
                    / ((CAST(se2 AS DOUBLE) - CAST(se AS DOUBLE) * se / k)
                       / (k - 1)) + 1) / 2, 6) AS sigma_mom
    FROM s
    """,
)


def _dgpd(spark, sf_dir):
    """GPD MoM over integer deci-cent excesses."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    thr = x.agg(
        F.floor(10 * F.percentile("c", 0.9) + F.lit(0.5)).cast("long").alias("u10")
    )
    e = (
        x.crossJoin(F.broadcast(thr))
        .filter(10 * F.col("c") > F.col("u10"))
        .select((10 * F.col("c") - F.col("u10")).alias("exc10"), "u10")
    )
    d38 = "decimal(38,0)"
    s = e.groupBy("u10").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("exc10").cast(d38).alias("se"),
        F.sum(F.col("exc10").cast(d38) * F.col("exc10")).alias("se2"),
    )
    m = F.col("se").cast("double") / F.col("k")
    v = (
        F.col("se2").cast("double")
        - F.col("se").cast("double") * F.col("se").cast("double") / F.col("k")
    ) / (F.col("k") - 1)
    return s.select(
        F.col("k").alias("n_excess"),
        F.round(F.col("u10") / F.lit(1000.0), 2).alias("threshold"),
        F.round(m / 1000, 6).alias("mean_excess"),
        F.round((1 - m * m / v) / 2, 9).alias("xi_mom"),
        F.round((m / 1000) * (m * m / v + 1) / 2, 6).alias("sigma_mom"),
    )


CATALOG["ml_gpd_mom_excesses"].fn = _dgpd


register(
    "ml_ztp_fit_order_items",
    # Zero-truncated Poisson fit of lineitems-per-order: the observed
    # mean m = lambda/(1-exp(-lambda)) inverts by three unrolled
    # fixed-point steps lambda <- m(1-exp(-lambda)) from lambda0 = m,
    # with exp snapped to 6dp per step so both engines walk the same
    # iterate sequence.  Reports the iterates and the implied
    # zero-probability mass exp(-lambda3).
    oracle="""
    WITH x AS (
      SELECT o.o_orderkey,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey) AS k
      FROM orders o
    ),
    pos AS (SELECT k FROM x WHERE k >= 1),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk
      FROM pos
    ),
    it AS (
      SELECT n, CAST(sk AS DOUBLE) / n AS m,
             CAST(sk AS DOUBLE) / n
               * (1 - round(exp(-(CAST(sk AS DOUBLE) / n)), 6)) AS l1
      FROM s
    ),
    it2 AS (SELECT n, m, l1, m * (1 - round(exp(-l1), 6)) AS l2 FROM it),
    it3 AS (SELECT n, m, l1, l2, m * (1 - round(exp(-l2), 6)) AS l3 FROM it2)
    SELECT n AS n_orders,
           round(m, 6) AS mean_items,
           round(l1, 6) AS lambda1, round(l2, 6) AS lambda2,
           round(l3, 6) AS lambda3,
           round(exp(-round(l3, 6)), 9) AS p_zero
    FROM it3
    """,
)


def _dztp(spark, sf_dir):
    """ZTP lambda via three 6dp-snapped fixed-point steps."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cnt = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count("*").cast("long").alias("k")
    )
    x = o.select("o_orderkey").join(cnt, "o_orderkey", "left").select(
        F.coalesce(F.col("k"), F.lit(0)).alias("k")
    )
    s = x.filter(F.col("k") >= 1).agg(
        F.count("*").cast("long").alias("n"), F.sum("k").cast("long").alias("sk")
    )
    m = F.col("sk").cast("double") / F.col("n")
    it = s.select("n", m.alias("m"), (m * (1 - F.round(F.exp(-m), 6))).alias("l1"))
    it2 = it.select(
        "n", "m", "l1", (F.col("m") * (1 - F.round(F.exp(-F.col("l1")), 6))).alias("l2")
    )
    it3 = it2.select(
        "n",
        "m",
        "l1",
        "l2",
        (F.col("m") * (1 - F.round(F.exp(-F.col("l2")), 6))).alias("l3"),
    )
    return it3.select(
        F.col("n").alias("n_orders"),
        F.round(F.col("m"), 6).alias("mean_items"),
        F.round(F.col("l1"), 6).alias("lambda1"),
        F.round(F.col("l2"), 6).alias("lambda2"),
        F.round(F.col("l3"), 6).alias("lambda3"),
        F.round(F.exp(-F.round(F.col("l3"), 6)), 9).alias("p_zero"),
    )


CATALOG["ml_ztp_fit_order_items"].fn = _dztp
