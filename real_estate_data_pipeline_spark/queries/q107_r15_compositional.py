"""Round-15 wave 27 (post-close): compositional data analysis
(Aitchison geometry) on the yearly order-priority mix — the total
log-ratio variance of the 5-part composition across the 7 years, the
consecutive-year Aitchison distances, the pairwise variation matrix
tau_ij = var(ln(x_i/x_j)), each year's Aitchison distance from the
compositional center, and per-part alr trends against the 5-LOW
reference — share analysis done the way shares demand (log-ratios),
where ordinary euclidean treatment of percentages is geometrically
wrong.

Exactness: clr values need no share division at all (the year total
cancels: clr_p = ln n_p - mean_p ln n_p), so everything runs on
integer 6dp micro-nats of the CELL COUNTS, cleared of the /5 and /7
denominators (c5 = 5 l6 - sum_p l6 and d5 = 7 c5 - sum_y c5 are pure
integers); variances/distances/slopes assemble from exact integer
moments with one closing division, sqrt IEEE.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# (year, priority, count, micro-nat ln(count), 5*clr micro-nats).
_COMP_CTE = """comp AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
             o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    l AS (
      SELECT y, p, n,
             CAST(floor(round(ln(CAST(n AS DOUBLE)), 6) * 1000000 + 0.5)
               AS BIGINT) AS l6
      FROM comp
    ),
    ys AS (SELECT y, CAST(SUM(l6) AS BIGINT) AS sl6 FROM l GROUP BY y),
    clr AS (
      SELECT l.y, l.p, l.n, l.l6, 5 * l.l6 - ys.sl6 AS c5
      FROM l JOIN ys ON ys.y = l.y
    )"""


def _clr(spark, sf_dir):
    """(year, priority, n, l6, c5 = 5*clr micro-nats) frame."""
    o = t(spark, sf_dir, "orders")
    comp = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.col("o_orderpriority").alias("p"),
    ).agg(F.count("*").cast("long").alias("n"))
    l = comp.select(
        "y",
        "p",
        "n",
        F.floor(
            F.round(F.log(F.col("n").cast("double")), 6) * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("l6"),
    )
    ys = l.groupBy(F.col("y").alias("y2")).agg(
        F.sum("l6").cast("long").alias("sl6")
    )
    return (
        l.join(F.broadcast(ys), F.col("y") == F.col("y2"))
        .select("y", "p", "n", "l6", (5 * F.col("l6") - F.col("sl6")).alias("c5"))
        .localCheckpoint(eager=False)
    )


register(
    "orders_clr_total_variance_priority",
    # Aitchison total variance: sum over parts of the across-years
    # variance of the clr coordinate — THE single-number dispersion
    # of a composition — plus which part moves the most.  c5 is a
    # pure integer (5 clr micro-nats); the cleared sample variance
    # (m S2 - S^2)/(m(m-1)) divides once per part.
    oracle=f"""
    WITH {_COMP_CTE},
    v AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(c5) AS BIGINT) AS s,
             CAST(SUM(CAST(c5 AS HUGEINT) * c5) AS HUGEINT) AS s2
      FROM clr GROUP BY p
    ),
    pv AS (
      SELECT p,
             CAST(m * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
               / (CAST(m AS DOUBLE) * (m - 1)) / 25e12 AS var_p
      FROM v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(SUM(var_p), 9) AS total_log_ratio_variance,
           MAX(CASE WHEN var_p = (SELECT MAX(var_p) FROM pv) THEN p END)
             AS most_variable_part
    FROM pv
    """,
)


def _dclrtotvar(spark, sf_dir):
    """Total clr variance + the most variable part."""
    d38 = "decimal(38,0)"
    clr = _clr(spark, sf_dir)
    v = clr.groupBy("p").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("c5").cast("long").alias("s"),
        F.sum(F.col("c5").cast(d38) * F.col("c5")).alias("s2"),
    )
    pv = v.select(
        "p",
        (
            (F.col("m") * F.col("s2") - F.col("s").cast(d38) * F.col("s")).cast(
                "double"
            )
            / (F.col("m").cast("double") * (F.col("m") - 1))
            / F.lit(25e12)
        ).alias("var_p"),
    ).localCheckpoint(eager=False)
    mx = pv.agg(F.max("var_p").alias("vmax"))
    return pv.crossJoin(F.broadcast(mx)).agg(
        F.count("*").cast("long").alias("n_parts"),
        F.round(F.sum("var_p"), 9).alias("total_log_ratio_variance"),
        F.max(F.when(F.col("var_p") == F.col("vmax"), F.col("p"))).alias(
            "most_variable_part"
        ),
    )


CATALOG["orders_clr_total_variance_priority"].fn = _dclrtotvar


register(
    "orders_aitchison_distance_years",
    # Consecutive-year Aitchison distances: euclidean on the clr
    # coordinates, i.e. sqrt(sum_p (c5_y - c5_{y+1})^2) / 5e6 — how
    # much the priority MIX (not the volume) moved year over year.
    # Integer squared diffs, one sqrt.
    oracle=f"""
    WITH {_COMP_CTE},
    pair AS (
      SELECT a.y AS y0, a.p, a.c5 AS ca, b.c5 AS cb
      FROM clr a JOIN clr b ON b.p = a.p AND b.y = a.y + 1
    ),
    d AS (
      SELECT y0,
             CAST(SUM(CAST(ca - cb AS HUGEINT) * (ca - cb)) AS HUGEINT) AS sq
      FROM pair GROUP BY y0
    )
    SELECT y0 AS year_from, y0 + 1 AS year_to,
           round(sqrt(CAST(sq AS DOUBLE)) / 5e6, 9) AS aitchison_distance
    FROM d ORDER BY y0
    """,
)


def _daitchdist(spark, sf_dir):
    """Year-over-year Aitchison mix shifts."""
    d38 = "decimal(38,0)"
    clr = _clr(spark, sf_dir)
    b = clr.select(
        (F.col("y") - 1).alias("yb"), F.col("p").alias("pb"), F.col("c5").alias("cb")
    )
    pair = clr.join(
        F.broadcast(b), (F.col("p") == F.col("pb")) & (F.col("y") == F.col("yb"))
    )
    diff = F.col("c5") - F.col("cb")
    d = pair.groupBy(F.col("y").alias("y0")).agg(
        F.sum(diff.cast(d38) * diff).alias("sq")
    )
    return d.select(
        F.col("y0").alias("year_from"),
        (F.col("y0") + 1).alias("year_to"),
        F.round(F.sqrt(F.col("sq").cast("double")) / F.lit(5e6), 9).alias(
            "aitchison_distance"
        ),
    ).orderBy("year_from")


CATALOG["orders_aitchison_distance_years"].fn = _daitchdist


register(
    "orders_variation_matrix_priority",
    # The Aitchison variation matrix: tau_ij = var over years of
    # ln(x_i/x_j) for all 10 unordered part pairs — near-zero tau
    # means the two parts move in lockstep (proportionality), the
    # compositional analogue of perfect correlation.  ln ratios are
    # integer micro-nat differences; cleared sample variance.
    oracle=f"""
    WITH {_COMP_CTE},
    pr AS (
      SELECT a.y, a.p AS pi, b.p AS pj, a.l6 - b.l6 AS d6
      FROM l a JOIN l b ON b.y = a.y AND a.p < b.p
    ),
    v AS (
      SELECT pi, pj, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(d6) AS BIGINT) AS s,
             CAST(SUM(CAST(d6 AS HUGEINT) * d6) AS HUGEINT) AS s2
      FROM pr GROUP BY pi, pj
    )
    SELECT pi AS part_i, pj AS part_j,
           round(CAST(m * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / (CAST(m AS DOUBLE) * (m - 1)) / 1e12, 9) AS tau
    FROM v ORDER BY pi, pj
    """,
)


def _dvariation(spark, sf_dir):
    """Pairwise log-ratio variance matrix (10 pairs)."""
    d38 = "decimal(38,0)"
    clr = _clr(spark, sf_dir)
    b = clr.select(
        F.col("y").alias("yb"), F.col("p").alias("pj"), F.col("l6").alias("l6b")
    )
    pr = clr.join(
        F.broadcast(b),
        (F.col("y") == F.col("yb")) & (F.col("p") < F.col("pj")),
    ).select(
        F.col("p").alias("pi"), "pj", (F.col("l6") - F.col("l6b")).alias("d6")
    )
    v = pr.groupBy("pi", "pj").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("d6").cast("long").alias("s"),
        F.sum(F.col("d6").cast(d38) * F.col("d6")).alias("s2"),
    )
    return v.select(
        F.col("pi").alias("part_i"),
        F.col("pj").alias("part_j"),
        F.round(
            (F.col("m") * F.col("s2") - F.col("s").cast(d38) * F.col("s")).cast(
                "double"
            )
            / (F.col("m").cast("double") * (F.col("m") - 1))
            / F.lit(1e12),
            9,
        ).alias("tau"),
    ).orderBy("part_i", "part_j")


CATALOG["orders_variation_matrix_priority"].fn = _dvariation


register(
    "orders_comp_center_distances",
    # Each year's Aitchison distance from the compositional center
    # (the closed geometric-mean composition): d5 = 7 c5 - sum_y c5
    # is a pure integer (35e6-scaled centered clr), the per-year
    # distance one sqrt — which year's MIX was the outlier.
    oracle=f"""
    WITH {_COMP_CTE},
    pm AS (SELECT p, CAST(SUM(c5) AS BIGINT) AS sc5 FROM clr GROUP BY p),
    cen AS (
      SELECT clr.y, 7 * clr.c5 - pm.sc5 AS d5
      FROM clr JOIN pm ON pm.p = clr.p
    ),
    d AS (
      SELECT y, CAST(SUM(CAST(d5 AS HUGEINT) * d5) AS HUGEINT) AS sq
      FROM cen GROUP BY y
    ),
    mx AS (SELECT MAX(sq) AS mq FROM d)
    SELECT y AS year,
           round(sqrt(CAST(sq AS DOUBLE)) / 35e6, 9) AS dist_from_center,
           CAST(CASE WHEN sq = mx.mq THEN 1 ELSE 0 END AS BIGINT)
             AS is_outlier_year
    FROM d CROSS JOIN mx ORDER BY y
    """,
)


def _dcenter(spark, sf_dir):
    """Per-year Aitchison distance from the geometric center."""
    d38 = "decimal(38,0)"
    clr = _clr(spark, sf_dir)
    pm = clr.groupBy(F.col("p").alias("pm_p")).agg(
        F.sum("c5").cast("long").alias("sc5")
    )
    cen = clr.join(F.broadcast(pm), F.col("p") == F.col("pm_p")).select(
        "y", (7 * F.col("c5") - F.col("sc5")).alias("d5")
    )
    d = cen.groupBy("y").agg(
        F.sum(F.col("d5").cast(d38) * F.col("d5")).alias("sq")
    ).localCheckpoint(eager=False)
    mx = d.agg(F.max("sq").alias("mq"))
    return d.crossJoin(F.broadcast(mx)).select(
        F.col("y").alias("year"),
        F.round(F.sqrt(F.col("sq").cast("double")) / F.lit(35e6), 9).alias(
            "dist_from_center"
        ),
        F.when(F.col("sq") == F.col("mq"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_outlier_year"),
    ).orderBy("year")


CATALOG["orders_comp_center_distances"].fn = _dcenter


register(
    "orders_alr_trend_priority",
    # alr trends against the 5-LOW reference: per non-reference part
    # the exact Cramer line of alr = ln(x_p / x_low) (integer
    # micro-nat differences) on the year index — whether the mix is
    # DRIFTING and toward which priorities, with slopes in log-ratio
    # units per year.
    oracle=f"""
    WITH {_COMP_CTE},
    ref AS (SELECT y, l6 AS r6 FROM l WHERE p = '5-LOW'),
    alr AS (
      SELECT l.p, l.y - 1995 AS x, l.l6 - ref.r6 AS a6
      FROM l JOIN ref ON ref.y = l.y WHERE l.p <> '5-LOW'
    ),
    m AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(a6) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * a6) AS BIGINT) AS sxy
      FROM alr GROUP BY p
    )
    SELECT p AS part,
           round(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE) / 1e6, 9)
             AS alr_slope_per_year,
           round((CAST(sy AS DOUBLE)
                  - CAST(k * sxy - sx * sy AS DOUBLE)
                    / CAST(k * sxx - sx * sx AS DOUBLE) * sx) / k / 1e6, 9)
             AS alr_intercept
    FROM m ORDER BY p
    """,
)


def _dalrtrend(spark, sf_dir):
    """Cramer alr trend lines vs the 5-LOW reference."""
    clr = _clr(spark, sf_dir)
    ref = clr.filter(F.col("p") == "5-LOW").select(
        F.col("y").alias("yr"), F.col("l6").alias("r6")
    )
    alr = (
        clr.filter(F.col("p") != "5-LOW")
        .join(F.broadcast(ref), F.col("y") == F.col("yr"))
        .select("p", (F.col("y") - 1995).alias("x"), (F.col("l6") - F.col("r6")).alias("a6"))
    )
    m = alr.groupBy("p").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("a6").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("a6")).cast("long").alias("sxy"),
    )
    b = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    return m.select(
        F.col("p").alias("part"),
        F.round(b / F.lit(1e6), 9).alias("alr_slope_per_year"),
        F.round(
            (F.col("sy").cast("double") - b * F.col("sx")) / F.col("k") / F.lit(1e6),
            9,
        ).alias("alr_intercept"),
    ).orderBy("part")


CATALOG["orders_alr_trend_priority"].fn = _dalrtrend
