"""Round-15 wave 13: mixed frontier — tax-incidence style
progressivity of discounts (Kakwani = concentration index minus the
revenue Gini; Suits index via the exact trapezoid over cumulative
shares), the Fisher-z confidence interval for the quantity-discount
Pearson correlation, a third SQL-interface gate entry exercising
GROUPING SETS through spark.sql, and peak-over-threshold cluster
declustering of the daily event series.

Exactness: the Kakwani/Gini/concentration dot products are exact
rank-weighted integers on one shared ranked frame (discount mass in
the 1e-4-cent unit so no fraction is lost); the Suits trapezoid is a
pure 128-bit integer sum; Fisher z uses ln/exp at 6dp with the
1.959964 normal quantile fed as a Python literal; POT clusters are
integer islands over the 30-day frame with a type-1 integer
percentile cut.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# Shared ranked per-customer frame: revenue cents, discount mass in
# 1e-4 cents, ascending revenue rank (custkey tie-break).
_RANKED_CTE = """cm AS MATERIALIZED (
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
      SELECT rev, disc, ROW_NUMBER() OVER (ORDER BY rev, ck) AS i FROM cm
    )"""


def _ranked_cm(spark, sf_dir):
    """Spark twin of _RANKED_CTE."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    rev = (F.col("l_extendedprice").cast(DEC) * 100).cast("long")
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
    return cm.select(
        "rev", "disc", F.row_number().over(Window.orderBy("rev", "ck")).alias("i")
    )


register(
    "lineitem_kakwani_discount_progressivity",
    # Kakwani progressivity of discounts: K = C_disc - G_rev, where
    # both the concentration index and the Gini come from the SAME
    # revenue-ranked frame via sum y(2i-1)/(n sum y) - 1.  K > 0:
    # discounts are distributed more pro-rich than revenue itself.
    oracle=f"""
    WITH {_RANKED_CTE},
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(disc) AS BIGINT) AS sd,
             CAST(SUM(rev) AS BIGINT) AS sy,
             SUM(CAST(2 * i - 1 AS HUGEINT) * disc) AS sdr,
             SUM(CAST(2 * i - 1 AS HUGEINT) * rev) AS syr
      FROM rk
    )
    SELECT n AS n_customers,
           round(CAST(sdr AS DOUBLE) / (CAST(n AS DOUBLE) * sd) - 1, 9)
             AS conc_discount,
           round(CAST(syr AS DOUBLE) / (CAST(n AS DOUBLE) * sy) - 1, 9)
             AS gini_revenue,
           round(CAST(sdr AS DOUBLE) / (CAST(n AS DOUBLE) * sd)
                 - CAST(syr AS DOUBLE) / (CAST(n AS DOUBLE) * sy), 9) AS kakwani
    FROM s
    """,
)


def _dkakwani(spark, sf_dir):
    """Kakwani off two rank dot products on one shared frame."""
    d38 = "decimal(38,0)"
    rk = _ranked_cm(spark, sf_dir)
    s = rk.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("disc").cast("long").alias("sd"),
        F.sum("rev").cast("long").alias("sy"),
        F.sum((2 * F.col("i") - 1).cast(d38) * F.col("disc")).alias("sdr"),
        F.sum((2 * F.col("i") - 1).cast(d38) * F.col("rev")).alias("syr"),
    )
    cd = F.col("sdr").cast("double") / (F.col("n").cast("double") * F.col("sd"))
    gr = F.col("syr").cast("double") / (F.col("n").cast("double") * F.col("sy"))
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(cd - 1, 9).alias("conc_discount"),
        F.round(gr - 1, 9).alias("gini_revenue"),
        F.round(cd - gr, 9).alias("kakwani"),
    )


CATALOG["lineitem_kakwani_discount_progressivity"].fn = _dkakwani


register(
    "lineitem_suits_index_discount",
    # Suits index: S = 1 - 2 * area under the (revenue share ->
    # discount share) relative concentration curve, by the exact
    # trapezoid S = 1 - sum_i (T_i + T_{i-1}) * y_i / (T_n * Y_n)
    # over the revenue-ranked customers — one 128-bit integer sum.
    oracle=f"""
    WITH {_RANKED_CTE},
    cumt AS (
      SELECT rev, disc, i,
             SUM(disc) OVER (ORDER BY i) AS tc
      FROM rk
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM((2 * CAST(tc AS HUGEINT) - disc) * rev) AS trap,
             CAST(SUM(disc) AS BIGINT) AS tn,
             CAST(SUM(rev) AS BIGINT) AS yn
      FROM cumt
    )
    SELECT n AS n_customers,
           round(1 - CAST(trap AS DOUBLE) / (CAST(tn AS DOUBLE) * yn), 9)
             AS suits_index
    FROM s
    """,
)


def _dsuits(spark, sf_dir):
    """Suits trapezoid: (T_i + T_{i-1}) = 2*T_i - d_i in integers."""
    d38 = "decimal(38,0)"
    rk = _ranked_cm(spark, sf_dir)
    wcum = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cumt = rk.select("rev", "disc", "i", F.sum("disc").over(wcum).alias("tc"))
    s = cumt.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((2 * F.col("tc").cast(d38) - F.col("disc")) * F.col("rev")).alias(
            "trap"
        ),
        F.sum("disc").cast("long").alias("tn"),
        F.sum("rev").cast("long").alias("yn"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(
            1
            - F.col("trap").cast("double")
            / (F.col("tn").cast("double") * F.col("yn")),
            9,
        ).alias("suits_index"),
    )


CATALOG["lineitem_suits_index_discount"].fn = _dsuits


register(
    "ml_fisher_z_corr_ci",
    # Fisher-z 95% CI for the Pearson correlation of lineitem quantity
    # and discount: r from cleared integer moments, z = 0.5 ln((1+r)/
    # (1-r)) at 6dp, bounds z -+ 1.959964/sqrt(n-3) (the quantile a
    # Python literal), back-transformed with exp at 6dp.
    oracle="""
    WITH x AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS HUGEINT) AS sq, CAST(SUM(d) AS HUGEINT) AS sd,
             SUM(CAST(q AS HUGEINT) * q) AS sqq,
             SUM(CAST(d AS HUGEINT) * d) AS sdd,
             SUM(CAST(q AS HUGEINT) * d) AS sqd
      FROM x
    ),
    r AS (
      SELECT n,
             CAST(n * sqd - sq * sd AS DOUBLE)
             / sqrt(CAST(n * sqq - sq * sq AS DOUBLE)
                    * CAST(n * sdd - sd * sd AS DOUBLE)) AS r
      FROM s
    ),
    z AS (
      SELECT n, r,
             round(0.5 * round(ln((1 + r) / (1 - r)), 6), 6) AS z,
             1.959964 / sqrt(CAST(n - 3 AS DOUBLE)) AS hw
      FROM r
    )
    SELECT n AS n_items, round(r, 9) AS pearson_r, z AS fisher_z,
           round((round(exp(round(2 * (z - hw), 6)), 6) - 1)
                 / (round(exp(round(2 * (z - hw), 6)), 6) + 1), 9) AS r_lo,
           round((round(exp(round(2 * (z + hw), 6)), 6) - 1)
                 / (round(exp(round(2 * (z + hw), 6)), 6) + 1), 9) AS r_hi
    FROM z
    """,
)


def _dfisherz(spark, sf_dir):
    """Fisher-z CI off cleared integer moments."""
    d38 = "decimal(38,0)"
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_discount").cast(DEC) * 100).cast("long").alias("d"),
    )
    s = x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast(d38).alias("sq"),
        F.sum("d").cast(d38).alias("sd"),
        F.sum(F.col("q").cast(d38) * F.col("q")).alias("sqq"),
        F.sum(F.col("d").cast(d38) * F.col("d")).alias("sdd"),
        F.sum(F.col("q").cast(d38) * F.col("d")).alias("sqd"),
    )
    n = F.col("n")
    r = (n * F.col("sqd") - F.col("sq") * F.col("sd")).cast("double") / F.sqrt(
        (n * F.col("sqq") - F.col("sq") * F.col("sq")).cast("double")
        * (n * F.col("sdd") - F.col("sd") * F.col("sd")).cast("double")
    )
    rz = s.select("n", r.alias("r"))
    z = rz.select(
        "n",
        "r",
        F.round(0.5 * F.round(F.log((1 + F.col("r")) / (1 - F.col("r"))), 6), 6).alias(
            "z"
        ),
        (F.lit(1.959964) / F.sqrt((F.col("n") - 3).cast("double"))).alias("hw"),
    )
    back = lambda c: (  # noqa: E731
        (F.round(F.exp(F.round(2 * c, 6)), 6) - 1)
        / (F.round(F.exp(F.round(2 * c, 6)), 6) + 1)
    )
    return z.select(
        F.col("n").alias("n_items"),
        F.round(F.col("r"), 9).alias("pearson_r"),
        F.col("z").alias("fisher_z"),
        F.round(back(F.col("z") - F.col("hw")), 9).alias("r_lo"),
        F.round(back(F.col("z") + F.col("hw")), 9).alias("r_hi"),
    )


CATALOG["ml_fisher_z_corr_ci"].fn = _dfisherz


register(
    "sql_interface_grouping_sets",
    # Third SQL-interface gate entry: GROUPING SETS ((year, priority),
    # (year), (priority), ()) through spark.sql over the registered
    # views — the multi-level rollup surface, value-matched against
    # DuckDB's GROUPING SETS.  GROUPING() flags disambiguate the NULL
    # semantics on both engines.
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           o_orderpriority AS pri,
           CAST(GROUPING(EXTRACT(year FROM o_orderdate)) AS BIGINT) AS g_yr,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((EXTRACT(year FROM o_orderdate), o_orderpriority),
                            (EXTRACT(year FROM o_orderdate)),
                            (o_orderpriority), ())
    ORDER BY g_yr, g_pri, yr, pri
    """,
)


def _dsqlgroupingsets(spark, sf_dir):
    """GROUPING SETS through the raw-SQL execution path (sql.py)."""
    from ..sql import sql as run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               o_orderpriority AS pri,
               CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS g_yr,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority),
                                (year(o_orderdate)),
                                (o_orderpriority), ())
        ORDER BY g_yr, g_pri, yr, pri
        """,
    )


CATALOG["sql_interface_grouping_sets"].fn = _dsqlgroupingsets


register(
    "evt_pot_cluster_count",
    # Peak-over-threshold declustering of daily event counts: the
    # type-1 90th-percentile cut (integer 10*cum >= 9*nd), exceedance
    # days grouped into clusters of CONSECUTIVE days (gap > 1 day
    # starts a new cluster); reports cluster count, mean/max cluster
    # length and the extremal-index proxy n_clusters/n_exceedances.
    oracle="""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1992-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
    hist AS (
      SELECT c, SUM(COUNT(*)) OVER (ORDER BY c) AS cum FROM daily GROUP BY c
    ),
    thr AS (
      SELECT CAST(MIN(c) AS BIGINT) AS u
      FROM hist CROSS JOIN nd WHERE 10 * cum >= 9 * nd
    ),
    exc AS (
      SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS rn
      FROM daily CROSS JOIN thr WHERE c > u
    ),
    isl AS (
      SELECT d - rn AS grp, CAST(COUNT(*) AS BIGINT) AS len FROM exc GROUP BY 1
    )
    SELECT (SELECT u FROM thr) AS threshold,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM exc) AS n_exceedances,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           round(CAST((SELECT COUNT(*) FROM exc) AS DOUBLE)
                 / NULLIF(COUNT(*), 0), 6) AS mean_cluster_len,
           CAST(MAX(len) AS BIGINT) AS max_cluster_len,
           round(CAST(COUNT(*) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM exc), 0), 9)
             AS extremal_index_proxy
    FROM isl
    """,
)


def _dpotclusters(spark, sf_dir):
    """Exceedance islands over the 30-day frame."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("long")
        .alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    nd = daily.agg(F.count("*").cast("long").alias("nd"))
    hist = daily.groupBy("c").agg(F.count("*").alias("k")).select(
        "c", F.sum("k").over(Window.orderBy("c")).alias("cum")
    )
    thr = (
        hist.crossJoin(F.broadcast(nd))
        .filter(10 * F.col("cum") >= 9 * F.col("nd"))
        .agg(F.min("c").cast("long").alias("u"))
    )
    exc = (
        daily.crossJoin(F.broadcast(thr))
        .filter(F.col("c") > F.col("u"))
        .select("d", "u", F.row_number().over(Window.orderBy("d")).alias("rn"))
    )
    isl = exc.groupBy((F.col("d") - F.col("rn")).alias("grp")).agg(
        F.count("*").cast("long").alias("len"), F.max("u").alias("u")
    )
    ne = exc.agg(F.count("*").cast("long").alias("ne"), F.max("u").alias("u2"))
    s = isl.agg(
        F.count("*").cast("long").alias("nc"),
        F.max("len").cast("long").alias("mx"),
        F.max("u").alias("u"),
    ).crossJoin(F.broadcast(ne))
    return s.select(
        F.col("u").alias("threshold"),
        F.col("ne").alias("n_exceedances"),
        F.col("nc").alias("n_clusters"),
        F.round(F.col("ne").cast("double") / F.nullif(F.col("nc"), F.lit(0)), 6).alias(
            "mean_cluster_len"
        ),
        F.col("mx").alias("max_cluster_len"),
        F.round(
            F.col("nc").cast("double") / F.nullif(F.col("ne"), F.lit(0)), 9
        ).alias("extremal_index_proxy"),
    )


CATALOG["evt_pot_cluster_count"].fn = _dpotclusters
