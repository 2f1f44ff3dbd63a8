"""Round-15 wave 16 (post-close): actuarial development + index
numbers II + inequality decomposition — chain-ladder age-to-age
factors on the order-year x ship-lag-year revenue run-off triangle
(censored at the 2000-12-31 evaluation date so later origins are
genuinely undeveloped), the projected ultimates + IBNR per origin
year, the Törnqvist price index on the 1995-vs-2001 matched part
basket (the superlative companion to the q55 Laspeyres/Paasche/
Fisher family), Walsh + Marshall-Edgeworth price indexes on the same
basket, and the Theil T inequality index of customer revenue with its
exact between/within nation decomposition.

Exactness: the triangle is exact revenue cents; factors are snapped
at 9dp (floor of the exact-cent ratio), the per-origin factor product
goes through 6dp micro-nat ln sums re-exponentiated (the q25
precedent); Törnqvist weights are deterministic doubles of exact
integer masses with the ln(price relative) snapped at 6dp and each
term nano-quantized before the sum; Walsh/ME per-part terms are
micro-quantized (sqrt(q0*q1) is IEEE-exact on integers); Theil
per-row (x/mu) ln(x/mu) terms are nano-quantized before the
decimal-38 sums.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# The run-off triangle: origin = order year, development = ship year
# minus order year (only forward lags), both order and ship censored
# at the pinned evaluation date — cumulative revenue cents per cell.
_TRIANGLE_CTE = """tri AS MATERIALIZED (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS oy,
             CAST(EXTRACT(year FROM l.l_shipdate)
                  - EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS dev,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS revc
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate <= DATE '2000-12-31'
        AND l.l_shipdate <= DATE '2000-12-31'
        AND l.l_shipdate >= o.o_orderdate
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT oy, dev,
             CAST(SUM(revc) OVER (PARTITION BY oy ORDER BY dev) AS BIGINT) AS c
      FROM tri
    )"""


register(
    "orders_chain_ladder_factors",
    # Volume-weighted chain-ladder age-to-age factors f_j =
    # sum_i C_{i,j+1} / sum_i C_{i,j} over origins observed at both
    # development ages (oy + j + 1 <= 2000) — the loss-development
    # workhorse, here on the revenue run-off triangle.  Exact cent
    # sums; one closing division per factor.
    oracle=f"""
    WITH {_TRIANGLE_CTE},
    pairs AS (
      SELECT a.dev AS j, a.oy, a.c AS c0, b.c AS c1
      FROM cum a JOIN cum b ON b.oy = a.oy AND b.dev = a.dev + 1
      WHERE a.oy + a.dev + 1 <= 2000
    ),
    f AS (
      SELECT j, CAST(COUNT(*) AS BIGINT) AS n_origins,
             CAST(SUM(c0) AS BIGINT) AS s0, CAST(SUM(c1) AS BIGINT) AS s1
      FROM pairs GROUP BY j
    )
    SELECT j AS dev_age, n_origins,
           round(CAST(s0 AS DOUBLE) / 100, 2) AS cum_at_j,
           round(CAST(s1 AS DOUBLE) / 100, 2) AS cum_at_j1,
           round(CAST(floor(CAST(s1 AS DOUBLE) / s0 * 1e9 + 0.5) AS BIGINT)
                 / 1e9, 9) AS factor
    FROM f ORDER BY j
    """,
)


def _triangle(spark, sf_dir):
    """Cumulative revenue run-off triangle (origin year x dev year)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    tri = (
        li.join(
            o.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .filter(
            (F.col("o_orderdate") <= F.lit("2000-12-31").cast("date"))
            & (F.col("l_shipdate") <= F.lit("2000-12-31").cast("date"))
            & (F.col("l_shipdate") >= F.col("o_orderdate"))
        )
        .groupBy(
            F.year("o_orderdate").cast("long").alias("oy"),
            (F.year("l_shipdate") - F.year("o_orderdate"))
            .cast("long")
            .alias("dev"),
        )
        .agg(
            F.sum((F.col("l_extendedprice").cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("revc")
        )
    )
    w = Window.partitionBy("oy").orderBy("dev").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return tri.select(
        "oy", "dev", F.sum("revc").over(w).cast("long").alias("c")
    ).localCheckpoint(eager=False)


def _dclfactors(spark, sf_dir):
    """Chain-ladder factors off the cumulative triangle."""
    cum = _triangle(spark, sf_dir)
    a = cum.select(F.col("dev").alias("j"), "oy", F.col("c").alias("c0"))
    b = cum.select(
        (F.col("dev") - 1).alias("jb"),
        F.col("oy").alias("oy2"),
        F.col("c").alias("c1"),
    )
    pairs = a.join(
        b, (F.col("j") == F.col("jb")) & (F.col("oy") == F.col("oy2"))
    ).filter(F.col("oy") + F.col("j") + 1 <= 2000)
    f = pairs.groupBy("j").agg(
        F.count("*").cast("long").alias("n_origins"),
        F.sum("c0").cast("long").alias("s0"),
        F.sum("c1").cast("long").alias("s1"),
    )
    return f.select(
        F.col("j").alias("dev_age"),
        "n_origins",
        F.round(F.col("s0").cast("double") / 100, 2).alias("cum_at_j"),
        F.round(F.col("s1").cast("double") / 100, 2).alias("cum_at_j1"),
        F.round(
            F.floor(
                F.col("s1").cast("double") / F.col("s0") * F.lit(1e9) + F.lit(0.5)
            ).cast("long")
            / F.lit(1e9),
            9,
        ).alias("factor"),
    ).orderBy("dev_age")


CATALOG["orders_chain_ladder_factors"].fn = _dclfactors


register(
    "orders_chain_ladder_ultimates",
    # Projected ultimates + IBNR per origin year: the latest diagonal
    # C_{i, 2000-oy} developed by the product of the remaining snapped
    # factors (6dp micro-nat ln sum of the <=5 9dp factors,
    # re-exponentiated and snapped — the q25 precedent), IBNR =
    # ultimate - latest.
    oracle=f"""
    WITH {_TRIANGLE_CTE},
    pairs AS (
      SELECT a.dev AS j, a.c AS c0, b.c AS c1
      FROM cum a JOIN cum b ON b.oy = a.oy AND b.dev = a.dev + 1
      WHERE a.oy + a.dev + 1 <= 2000
    ),
    f AS (
      SELECT j,
             CAST(floor(CAST(SUM(c1) AS DOUBLE) / SUM(c0) * 1e9 + 0.5) AS BIGINT)
               AS f9
      FROM pairs GROUP BY j
    ),
    latest AS (
      SELECT oy, c AS lat FROM cum WHERE dev = 2000 - oy
    ),
    dfac AS (
      SELECT latest.oy, latest.lat,
             COALESCE(SUM(CAST(floor(round(ln(f.f9 / 1e9), 6) * 1000000 + 0.5)
                               AS BIGINT)), 0) AS l6
      FROM latest LEFT JOIN f ON f.j >= 2000 - latest.oy
      GROUP BY latest.oy, latest.lat
    ),
    u AS (
      SELECT oy, lat,
             CAST(floor(exp(CAST(l6 AS DOUBLE) / 1000000) * 1000000 + 0.5)
               AS BIGINT) AS p6
      FROM dfac
    )
    SELECT oy AS origin_year, CAST(2000 - oy AS BIGINT) AS dev_observed,
           round(lat / 100.0, 2) AS latest_cum,
           round(p6 / 1e6, 6) AS dev_factor,
           round(CAST(lat AS DOUBLE) * p6 / 1e6 / 100, 2) AS ultimate,
           round(CAST(lat AS DOUBLE) * (p6 - 1000000) / 1e6 / 100, 2) AS ibnr
    FROM u ORDER BY oy
    """,
)


def _dclult(spark, sf_dir):
    """Ultimates and IBNR from the snapped chain-ladder factors."""
    cum = _triangle(spark, sf_dir)
    a = cum.select(F.col("dev").alias("j"), "oy", F.col("c").alias("c0"))
    b = cum.select(
        (F.col("dev") - 1).alias("jb"),
        F.col("oy").alias("oy2"),
        F.col("c").alias("c1"),
    )
    pairs = a.join(
        b, (F.col("j") == F.col("jb")) & (F.col("oy") == F.col("oy2"))
    ).filter(F.col("oy") + F.col("j") + 1 <= 2000)
    f = pairs.groupBy("j").agg(
        F.floor(
            F.sum("c1").cast("double") / F.sum("c0") * F.lit(1e9) + F.lit(0.5)
        )
        .cast("long")
        .alias("f9")
    )
    latest = cum.filter(F.col("dev") == 2000 - F.col("oy")).select(
        "oy", F.col("c").alias("lat")
    )
    dfac = (
        latest.join(F.broadcast(f), f["j"] >= 2000 - latest["oy"], "left")
        .groupBy("oy", "lat")
        .agg(
            F.coalesce(
                F.sum(
                    F.floor(
                        F.round(F.log(F.col("f9") / F.lit(1e9)), 6)
                        * F.lit(1000000)
                        + F.lit(0.5)
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("l6")
        )
    )
    u = dfac.select(
        "oy",
        "lat",
        F.floor(
            F.exp(F.col("l6").cast("double") / F.lit(1000000)) * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("p6"),
    )
    return u.select(
        F.col("oy").alias("origin_year"),
        (2000 - F.col("oy")).cast("long").alias("dev_observed"),
        F.round(F.col("lat") / F.lit(100.0), 2).alias("latest_cum"),
        F.round(F.col("p6") / F.lit(1e6), 6).alias("dev_factor"),
        F.round(
            F.col("lat").cast("double") * F.col("p6") / F.lit(1e6) / F.lit(100), 2
        ).alias("ultimate"),
        F.round(
            F.col("lat").cast("double") * (F.col("p6") - 1000000)
            / F.lit(1e6)
            / F.lit(100),
            2,
        ).alias("ibnr"),
    ).orderBy("origin_year")


CATALOG["orders_chain_ladder_ultimates"].fn = _dclult


# The 1995-vs-2001 matched part basket of the q55 price-index family.
_BASKET_CTE = """py AS MATERIALIZED (
      SELECT l_partkey AS pk, year(l_shipdate) AS yr,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS revc,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem WHERE year(l_shipdate) IN (1995, 2001)
      GROUP BY 1, 2
    ),
    b AS (
      SELECT p0.pk, p0.revc AS rev0, p0.qty AS qty0,
             p1.revc AS rev1, p1.qty AS qty1
      FROM py p0 JOIN py p1 ON p0.pk = p1.pk AND p0.yr = 1995 AND p1.yr = 2001
    )"""


register(
    "lineitem_tornqvist_index",
    # The Törnqvist price index on the matched basket: ln P = sum_i
    # 0.5 (w0_i + w1_i) ln(p1_i / p0_i) with revenue-share weights —
    # the other superlative index (Fisher's sibling), exact where it
    # can be: the price relative is the exact integer rational
    # (rev1 qty0)/(rev0 qty1) with ln snapped at 6dp, weights are
    # deterministic doubles of exact cent totals, each term
    # nano-quantized before the decimal-38 sum, and the closing exp
    # snapped at 6dp.
    oracle=f"""
    WITH {_BASKET_CTE},
    tot AS (
      SELECT CAST(SUM(rev0) AS BIGINT) AS s0, CAST(SUM(rev1) AS BIGINT) AS s1,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM b
    ),
    terms AS (
      SELECT CAST(floor(0.5 * (CAST(rev0 AS DOUBLE) / s0
                               + CAST(rev1 AS DOUBLE) / s1)
                        * round(ln(CAST(CAST(rev1 AS HUGEINT) * qty0 AS DOUBLE)
                                   / CAST(CAST(rev0 AS HUGEINT) * qty1
                                          AS DOUBLE)), 6)
                        * 1e9 + 0.5) AS BIGINT) AS t9
      FROM b CROSS JOIN tot
    )
    SELECT tot.n_parts,
           round(CAST(SUM(t9) AS DOUBLE) / 1e9, 9) AS ln_tornqvist,
           round(exp(CAST(SUM(t9) AS DOUBLE) / 1e9), 6) AS tornqvist
    FROM terms CROSS JOIN tot GROUP BY tot.n_parts
    """,
)


def _basket(spark, sf_dir):
    """Matched 1995/2001 part basket with exact cent/qty masses."""
    li = t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate").isin(1995, 2001))
    py = (
        li.groupBy(F.col("l_partkey").alias("pk"), F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum((F.col("l_extendedprice").cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("revc"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
        .localCheckpoint(eager=False)
    )
    p0 = py.filter(F.col("yr") == 1995).select(
        "pk", F.col("revc").alias("rev0"), F.col("qty").alias("qty0")
    )
    p1 = py.filter(F.col("yr") == 2001).select(
        "pk", F.col("revc").alias("rev1"), F.col("qty").alias("qty1")
    )
    return p0.join(p1, "pk")


def _dtornqvist(spark, sf_dir):
    """Törnqvist index via nano-quantized weighted ln relatives."""
    d38 = "decimal(38,0)"
    b = _basket(spark, sf_dir).localCheckpoint(eager=False)
    tot = b.agg(
        F.sum("rev0").cast("long").alias("s0"),
        F.sum("rev1").cast("long").alias("s1"),
        F.count("*").cast("long").alias("n_parts"),
    )
    rel = (F.col("rev1").cast(d38) * F.col("qty0")).cast("double") / (
        F.col("rev0").cast(d38) * F.col("qty1")
    ).cast("double")
    w = 0.5 * (
        F.col("rev0").cast("double") / F.col("s0")
        + F.col("rev1").cast("double") / F.col("s1")
    )
    terms = b.crossJoin(F.broadcast(tot)).select(
        "n_parts",
        F.floor(w * F.round(F.log(rel), 6) * F.lit(1e9) + F.lit(0.5))
        .cast("long")
        .alias("t9"),
    )
    return terms.groupBy("n_parts").agg(F.sum("t9").cast("long").alias("st9")).select(
        "n_parts",
        F.round(F.col("st9").cast("double") / F.lit(1e9), 9).alias("ln_tornqvist"),
        F.round(F.exp(F.col("st9").cast("double") / F.lit(1e9)), 6).alias(
            "tornqvist"
        ),
    )


CATALOG["lineitem_tornqvist_index"].fn = _dtornqvist


register(
    "lineitem_walsh_me_indexes",
    # Walsh (sqrt(q0 q1) quantity weights — IEEE-exact on integer
    # products) and Marshall-Edgeworth ((q0+q1)/2 weights) price
    # indexes on the same matched basket: per-part numerator and
    # denominator terms micro-quantized before the exact sums, one
    # closing division each.
    oracle=f"""
    WITH {_BASKET_CTE},
    terms AS (
      SELECT
        CAST(floor(CAST(rev1 AS DOUBLE) / qty1
                   * sqrt(CAST(CAST(qty0 AS HUGEINT) * qty1 AS DOUBLE))
                   * 1000000 + 0.5) AS HUGEINT) AS wn6,
        CAST(floor(CAST(rev0 AS DOUBLE) / qty0
                   * sqrt(CAST(CAST(qty0 AS HUGEINT) * qty1 AS DOUBLE))
                   * 1000000 + 0.5) AS HUGEINT) AS wd6,
        CAST(floor(CAST(rev1 AS DOUBLE) * (qty0 + qty1) / qty1 * 1000000 + 0.5)
          AS HUGEINT) AS mn6,
        CAST(floor(CAST(rev0 AS DOUBLE) * (qty0 + qty1) / qty0 * 1000000 + 0.5)
          AS HUGEINT) AS md6
      FROM b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(CAST(SUM(wn6) AS DOUBLE) / CAST(SUM(wd6) AS DOUBLE), 9)
             AS walsh,
           round(CAST(SUM(mn6) AS DOUBLE) / CAST(SUM(md6) AS DOUBLE), 9)
             AS marshall_edgeworth
    FROM terms
    """,
)


def _dwalshme(spark, sf_dir):
    """Walsh + Marshall-Edgeworth off micro-quantized per-part terms."""
    d38 = "decimal(38,0)"
    b = _basket(spark, sf_dir)
    sq = F.sqrt((F.col("qty0").cast(d38) * F.col("qty1")).cast("double"))
    terms = b.select(
        F.floor(
            F.col("rev1").cast("double") / F.col("qty1") * sq * F.lit(1000000)
            + F.lit(0.5)
        ).cast(d38).alias("wn6"),
        F.floor(
            F.col("rev0").cast("double") / F.col("qty0") * sq * F.lit(1000000)
            + F.lit(0.5)
        ).cast(d38).alias("wd6"),
        F.floor(
            F.col("rev1").cast("double") * (F.col("qty0") + F.col("qty1"))
            / F.col("qty1") * F.lit(1000000) + F.lit(0.5)
        ).cast(d38).alias("mn6"),
        F.floor(
            F.col("rev0").cast("double") * (F.col("qty0") + F.col("qty1"))
            / F.col("qty0") * F.lit(1000000) + F.lit(0.5)
        ).cast(d38).alias("md6"),
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_parts"),
        F.round(
            F.sum("wn6").cast("double") / F.sum("wd6").cast("double"), 9
        ).alias("walsh"),
        F.round(
            F.sum("mn6").cast("double") / F.sum("md6").cast("double"), 9
        ).alias("marshall_edgeworth"),
    )


CATALOG["lineitem_walsh_me_indexes"].fn = _dwalshme


register(
    "cust_theil_inequality_decomp",
    # Theil T inequality of per-customer order revenue with the exact
    # between/within nation decomposition: T = sum (x/X) ln((x/X)/(1/N))
    # = T_between + T_within.  Per-row (x N / X) ln(x N / X) terms
    # nano-quantized before the sums; the between terms use the exact
    # integer rational (Xg N)/(X Ng); within = share-weighted group
    # Theils.  The identity gap is emitted as the self-check.
    oracle="""
    WITH cr AS MATERIALIZED (
      SELECT c.c_nationkey AS nk,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS xc
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY o.o_custkey, c.c_nationkey
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(xc) AS BIGINT) AS sx
      FROM cr
    ),
    g AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS ng, CAST(SUM(xc) AS BIGINT) AS sg
      FROM cr GROUP BY nk
    ),
    rows_t AS (
      SELECT cr.nk,
             CAST(floor((CAST(cr.xc AS DOUBLE) * tot.n / tot.sx)
                        * round(ln(CAST(cr.xc AS DOUBLE) * tot.n / tot.sx), 6)
                        * 1e9 + 0.5) AS HUGEINT) AS tg9,
             CAST(floor((CAST(cr.xc AS DOUBLE) * g.ng / g.sg)
                        * round(ln(CAST(cr.xc AS DOUBLE) * g.ng / g.sg), 6)
                        * 1e9 + 0.5) AS HUGEINT) AS tw9
      FROM cr JOIN g USING (nk) CROSS JOIN tot
    ),
    tt AS (
      SELECT CAST(SUM(tg9) AS HUGEINT) AS stg9 FROM rows_t
    ),
    gw AS (
      SELECT g.nk, g.ng, g.sg,
             CAST(SUM(rows_t.tw9) AS HUGEINT) AS sw9
      FROM g JOIN rows_t ON rows_t.nk = g.nk
      GROUP BY g.nk, g.ng, g.sg
    ),
    parts AS (
      SELECT
        CAST(floor((CAST(gw.sg AS DOUBLE) / tot.sx)
                   * round(ln((CAST(gw.sg AS DOUBLE) / tot.sx)
                              * (CAST(tot.n AS DOUBLE) / gw.ng)), 6)
                   * 1e9 + 0.5) AS BIGINT) AS tb9,
        CAST(floor((CAST(gw.sg AS DOUBLE) / tot.sx)
                   * (CAST(gw.sw9 AS DOUBLE) / gw.ng / 1e9)
                   * 1e9 + 0.5) AS BIGINT) AS twg9
      FROM gw CROSS JOIN tot
    )
    SELECT tot.n AS n_customers,
           round(CAST(tt.stg9 AS DOUBLE) / tot.n / 1e9, 9) AS theil_total,
           round(CAST(SUM(parts.tb9) AS DOUBLE) / 1e9, 9) AS theil_between,
           round(CAST(SUM(parts.twg9) AS DOUBLE) / 1e9, 9) AS theil_within,
           round(CAST(tt.stg9 AS DOUBLE) / tot.n / 1e9
                 - CAST(SUM(parts.tb9) AS DOUBLE) / 1e9
                 - CAST(SUM(parts.twg9) AS DOUBLE) / 1e9, 6) AS identity_gap
    FROM parts CROSS JOIN tot CROSS JOIN tt
    GROUP BY tot.n, tt.stg9
    """,
)


def _dtheil(spark, sf_dir):
    """Theil T + between/within nation decomposition."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cr = (
        o.join(
            F.broadcast(c.select("c_custkey", F.col("c_nationkey").alias("nk"))),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("o_custkey", "nk")
        .agg(
            F.sum((F.col("o_totalprice").cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("xc")
        )
        .localCheckpoint(eager=False)
    )
    tot = cr.agg(
        F.count("*").cast("long").alias("n"), F.sum("xc").cast("long").alias("sx")
    )
    g = cr.groupBy("nk").agg(
        F.count("*").cast("long").alias("ng"), F.sum("xc").cast("long").alias("sg")
    )
    rg = F.col("xc").cast("double") * F.col("n") / F.col("sx")
    rw = F.col("xc").cast("double") * F.col("ng") / F.col("sg")
    rows_t = (
        cr.join(F.broadcast(g), "nk")
        .crossJoin(F.broadcast(tot))
        .select(
            "nk",
            F.floor(rg * F.round(F.log(rg), 6) * F.lit(1e9) + F.lit(0.5))
            .cast(d38)
            .alias("tg9"),
            F.floor(rw * F.round(F.log(rw), 6) * F.lit(1e9) + F.lit(0.5))
            .cast(d38)
            .alias("tw9"),
        )
        .localCheckpoint(eager=False)
    )
    tt = rows_t.agg(F.sum("tg9").alias("stg9"))
    gw = rows_t.groupBy("nk").agg(F.sum("tw9").alias("sw9")).join(
        F.broadcast(g), "nk"
    )
    shr = F.col("sg").cast("double") / F.col("sx")
    parts = gw.crossJoin(F.broadcast(tot)).select(
        "n",
        F.floor(
            shr
            * F.round(
                F.log(shr * (F.col("n").cast("double") / F.col("ng"))), 6
            )
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tb9"),
        F.floor(
            shr * (F.col("sw9").cast("double") / F.col("ng") / F.lit(1e9))
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("twg9"),
    )
    tb = F.col("stb9").cast("double") / F.lit(1e9)
    tw = F.col("stw9").cast("double") / F.lit(1e9)
    ttl = F.col("stg9").cast("double") / F.col("n") / F.lit(1e9)
    return (
        parts.groupBy("n")
        .agg(
            F.sum("tb9").cast("long").alias("stb9"),
            F.sum("twg9").cast("long").alias("stw9"),
        )
        .crossJoin(F.broadcast(tt))
        .select(
            F.col("n").alias("n_customers"),
            F.round(ttl, 9).alias("theil_total"),
            F.round(tb, 9).alias("theil_between"),
            F.round(tw, 9).alias("theil_within"),
            F.round(ttl - tb - tw, 6).alias("identity_gap"),
        )
    )


CATALOG["cust_theil_inequality_decomp"].fn = _dtheil
