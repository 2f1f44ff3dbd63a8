"""Split from queries.py lines 24498-25180 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t, tok_arr
from .q10_coverage_misc import _q6
from .q15_curation_r3 import _HOURLY_TYPE_CENTS_CTE, _hourly_type_cents
from .q26_r8_mixed import _BM25_TERMS, _TOK_SQL_CTES, _retrieval_wide
from .q30_r9_robust_ml import _HUBER_D6

# ===========================================================================
# round-10 wave 4: quantile regression (the tau-asymmetric sibling of
# Huber IRLS), forecast-accuracy and SPC monitors, Lorenz deciles,
# boolean OR/NOT retrieval, RAKE keyword extraction.
# ===========================================================================

register(
    "ml_quantile_irls_price_qty",
    # quantile regression (tau = 0.75) as two unrolled IRLS rounds —
    # the Huberized quantile loss: weight tau (resp. 1-tau) where the
    # residual is above (below) the line, decayed by delta/|r| outside
    # the delta band. Same exactness discipline as the Huber twin:
    # integer features, micro-quantized weights and inter-round
    # parameters, wide-int weighted sums, one double division per
    # parameter. The final share-below column should sit near tau.
    oracle=f"""
    WITH x AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS xq,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
      FROM lineitem
    ),
    s0 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(xq) AS BIGINT) AS sx,
             CAST(SUM(yc) AS BIGINT) AS sy, CAST(SUM(xq * yc) AS BIGINT) AS sxy,
             CAST(SUM(xq * xq) AS BIGINT) AS sxx
      FROM x
    ),
    p0 AS (
      SELECT n, CAST(floor(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
                                 6) * 1000000 + 0.5) AS BIGINT) AS b6,
             sx, sy
      FROM s0
    ),
    p0a AS (
      SELECT b6, CAST(floor(round((CAST(sy AS DOUBLE) - b6 * CAST(sx AS DOUBLE) / 1000000.0)
                                  / n, 6) * 1000000 + 0.5) AS BIGINT) AS a6
      FROM p0
    ),
    w1 AS (
      SELECT xq, yc,
             CASE WHEN yc * 1000000 - (a6 + b6 * xq) >= 0 THEN
               CASE WHEN yc * 1000000 - (a6 + b6 * xq) <= {_HUBER_D6}
                    THEN CAST(750000 AS BIGINT)
                    ELSE CAST(floor(round(0.75 * {_HUBER_D6}.0
                                          / (yc * 1000000 - (a6 + b6 * xq)), 6)
                                    * 1000000 + 0.5) AS BIGINT) END
             ELSE
               CASE WHEN (a6 + b6 * xq) - yc * 1000000 <= {_HUBER_D6}
                    THEN CAST(250000 AS BIGINT)
                    ELSE CAST(floor(round(0.25 * {_HUBER_D6}.0
                                          / ((a6 + b6 * xq) - yc * 1000000), 6)
                                    * 1000000 + 0.5) AS BIGINT) END
             END AS w6
      FROM x CROSS JOIN p0a
    ),
    s1 AS (
      SELECT CAST(SUM(w6) AS BIGINT) AS sw, CAST(SUM(w6 * xq) AS BIGINT) AS swx,
             CAST(SUM(CAST(w6 * yc AS HUGEINT)) AS DOUBLE) AS swy,
             CAST(SUM(CAST(w6 * xq * yc AS HUGEINT)) AS DOUBLE) AS swxy,
             CAST(SUM(CAST(w6 * xq * xq AS HUGEINT)) AS DOUBLE) AS swxx
      FROM w1
    ),
    p1 AS (
      SELECT sw, swx,
             CAST(floor(round((CAST(sw AS DOUBLE) * swxy - CAST(swx AS DOUBLE) * swy)
                              / (CAST(sw AS DOUBLE) * swxx - CAST(swx AS DOUBLE) * swx),
                              6) * 1000000 + 0.5) AS BIGINT) AS b6,
             swy
      FROM s1
    ),
    p1a AS (
      SELECT b6, CAST(floor(round((swy - b6 * CAST(swx AS DOUBLE) / 1000000.0)
                                  / sw * 1000000.0 / 1000000.0, 6) * 1000000 + 0.5)
                      AS BIGINT) AS a6
      FROM p1
    ),
    w2 AS (
      SELECT xq, yc,
             CASE WHEN yc * 1000000 - (a6 + b6 * xq) >= 0 THEN
               CASE WHEN yc * 1000000 - (a6 + b6 * xq) <= {_HUBER_D6}
                    THEN CAST(750000 AS BIGINT)
                    ELSE CAST(floor(round(0.75 * {_HUBER_D6}.0
                                          / (yc * 1000000 - (a6 + b6 * xq)), 6)
                                    * 1000000 + 0.5) AS BIGINT) END
             ELSE
               CASE WHEN (a6 + b6 * xq) - yc * 1000000 <= {_HUBER_D6}
                    THEN CAST(250000 AS BIGINT)
                    ELSE CAST(floor(round(0.25 * {_HUBER_D6}.0
                                          / ((a6 + b6 * xq) - yc * 1000000), 6)
                                    * 1000000 + 0.5) AS BIGINT) END
             END AS w6,
             CASE WHEN yc * 1000000 - (a6 + b6 * xq) < 0 THEN 1 ELSE 0 END AS below
      FROM x CROSS JOIN p1a
    ),
    s2 AS (
      SELECT CAST(SUM(w6) AS BIGINT) AS sw, CAST(SUM(w6 * xq) AS BIGINT) AS swx,
             CAST(SUM(CAST(w6 * yc AS HUGEINT)) AS DOUBLE) AS swy,
             CAST(SUM(CAST(w6 * xq * yc AS HUGEINT)) AS DOUBLE) AS swxy,
             CAST(SUM(CAST(w6 * xq * xq AS HUGEINT)) AS DOUBLE) AS swxx,
             CAST(SUM(below) AS BIGINT) AS n_below,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM w2
    ),
    p2 AS (
      SELECT n, n_below, sw,
             CAST(floor(round((CAST(sw AS DOUBLE) * swxy - CAST(swx AS DOUBLE) * swy)
                              / (CAST(sw AS DOUBLE) * swxx - CAST(swx AS DOUBLE) * swx),
                              6) * 1000000 + 0.5) AS BIGINT) AS b6,
             swx, swy
      FROM s2
    ),
    p2a AS (
      SELECT n, n_below, sw, b6,
             CAST(floor(round((swy - b6 * CAST(swx AS DOUBLE) / 1000000.0)
                              / sw * 1000000.0 / 1000000.0, 6) * 1000000 + 0.5)
                  AS BIGINT) AS a6
      FROM p2
    )
    SELECT p2a.n AS n_rows,
           round(p0a.a6 / 1000000.0, 6) AS a_ols,
           round(p0a.b6 / 1000000.0, 6) AS b_ols,
           round(p2a.a6 / 1000000.0, 6) AS a_q75,
           round(p2a.b6 / 1000000.0, 6) AS b_q75,
           round(CAST(p2a.n_below AS DOUBLE) / p2a.n, 6) AS share_below,
           p2a.sw AS w_mass6
    FROM p2a CROSS JOIN p0a
    """,
)


def _dquantileirls(spark, sf_dir):
    """Quantile (tau=0.75) regression by IRLS: the Huber round shape —
    one weighted-sums aggregate over the cached integer feature frame
    plus a 1-row parameter broadcast per round — with the asymmetric
    tau/(1-tau) weighting that pulls the line to the 75th conditional
    percentile. Constant plan depth; the final pass also counts the
    share of points below the line (the tau sanity gauge)."""
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("long").alias("xq"),
        (F.col("l_extendedprice").cast(DEC) * 100).cast("long").alias("yc"),
    ).localCheckpoint(eager=False)

    def _q6(col):
        return F.floor(F.round(col, 6) * 1e6 + 0.5).cast("long")

    s0 = x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yc")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    slope0 = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    p0 = s0.select("n", "sx", "sy", _q6(slope0).alias("b6"))
    p0a = p0.select(
        "b6",
        _q6(
            (F.col("sy").cast("double") - F.col("b6") * F.col("sx").cast("double") / 1e6)
            / F.col("n")
        ).alias("a6"),
    ).localCheckpoint(eager=False)

    def _weights(params, extra=False):
        r6 = F.col("yc") * F.lit(1000000) - (F.col("a6") + F.col("b6") * F.col("xq"))
        w6 = F.when(
            r6 >= 0,
            F.when(r6 <= F.lit(_HUBER_D6), F.lit(750000).cast("long")).otherwise(
                _q6(F.lit(0.75 * float(_HUBER_D6)) / r6)
            ),
        ).otherwise(
            F.when((-r6) <= F.lit(_HUBER_D6), F.lit(250000).cast("long")).otherwise(
                _q6(F.lit(0.25 * float(_HUBER_D6)) / (-r6))
            )
        )
        cols = ["xq", "yc", w6.alias("w6")]
        if extra:
            cols.append(F.when(r6 < 0, 1).otherwise(0).alias("below"))
        return x.crossJoin(F.broadcast(params)).select(*cols)

    def _wsums(w, extra=False):
        aggs = [
            F.sum("w6").cast("long").alias("sw"),
            F.sum(F.col("w6") * F.col("xq")).cast("long").alias("swx"),
            F.sum((F.col("w6") * F.col("yc")).cast("decimal(38,0)"))
            .cast("double")
            .alias("swy"),
            F.sum((F.col("w6") * F.col("xq") * F.col("yc")).cast("decimal(38,0)"))
            .cast("double")
            .alias("swxy"),
            F.sum((F.col("w6") * F.col("xq") * F.col("xq")).cast("decimal(38,0)"))
            .cast("double")
            .alias("swxx"),
        ]
        if extra:
            aggs += [
                F.sum("below").cast("long").alias("n_below"),
                F.count("*").cast("long").alias("n"),
            ]
        return w.agg(*aggs)

    slope_w = (
        F.col("sw").cast("double") * F.col("swxy")
        - F.col("swx").cast("double") * F.col("swy")
    ) / (
        F.col("sw").cast("double") * F.col("swxx")
        - F.col("swx").cast("double") * F.col("swx")
    )
    a_w = _q6(
        (F.col("swy") - F.col("b6") * F.col("swx").cast("double") / 1e6)
        / F.col("sw")
        * 1e6
        / 1e6
    ).alias("a6")

    s1 = _wsums(_weights(p0a))
    p1 = s1.select("sw", "swx", "swy", _q6(slope_w).alias("b6"))
    p1a = p1.select("b6", a_w).localCheckpoint(eager=False)
    s2 = _wsums(_weights(p1a, extra=True), extra=True)
    p2 = s2.select("n", "n_below", "sw", "swx", "swy", _q6(slope_w).alias("b6"))
    p2a = p2.select("n", "n_below", "sw", "b6", a_w)
    return p2a.crossJoin(
        F.broadcast(p0a.withColumnsRenamed({"a6": "a06", "b6": "b06"}))
    ).select(
        F.col("n").alias("n_rows"),
        F.round(F.col("a06") / 1e6, 6).alias("a_ols"),
        F.round(F.col("b06") / 1e6, 6).alias("b_ols"),
        F.round(F.col("a6") / 1e6, 6).alias("a_q75"),
        F.round(F.col("b6") / 1e6, 6).alias("b_q75"),
        F.round(F.col("n_below").cast("double") / F.col("n"), 6).alias("share_below"),
        F.col("sw").alias("w_mass6"),
    )


CATALOG["ml_quantile_irls_price_qty"].fn = _dquantileirls

register(
    "evt_mase_seasonal_naive",
    # forecast-accuracy baseline: MASE of the seasonal-naive forecast
    # (value 24 hours earlier) against the one-step naive (previous
    # hour) per event type, on the hourly cents series. Both MAEs are
    # exact integer sums joined on exact timestamp arithmetic (gaps
    # can't shift the season — the join is on h - 24 HOURS, not on row
    # offsets); MASE < 1 means daily seasonality is real signal.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE},
    se AS (
      SELECT a.event_type, CAST(abs(a.cents - b.cents) AS BIGINT) AS ae
      FROM obs a JOIN obs b
        ON b.event_type = a.event_type AND b.h = a.h - INTERVAL 24 HOUR
    ),
    nv AS (
      SELECT a.event_type, CAST(abs(a.cents - b.cents) AS BIGINT) AS ae
      FROM obs a JOIN obs b
        ON b.event_type = a.event_type AND b.h = a.h - INTERVAL 1 HOUR
    ),
    sa AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_s,
             CAST(SUM(ae) AS BIGINT) AS s_s
      FROM se GROUP BY 1
    ),
    na AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_n,
             CAST(SUM(ae) AS BIGINT) AS s_n
      FROM nv GROUP BY 1
    )
    SELECT sa.event_type, sa.n_s AS n_seasonal_points,
           round(CAST(sa.s_s AS DOUBLE) / sa.n_s / 100.0, 6) AS mae_seasonal,
           round(CAST(na.s_n AS DOUBLE) / na.n_n / 100.0, 6) AS mae_naive,
           round((CAST(sa.s_s AS DOUBLE) / sa.n_s)
                 / (CAST(na.s_n AS DOUBLE) / na.n_n), 6) AS mase
    FROM sa JOIN na USING (event_type)
    ORDER BY sa.event_type
    """,
)


def _dmase(spark, sf_dir):
    """MASE per event type: the corpus reduces to the hourly frame
    once, both baselines are self-joins on exact shifted timestamps
    over that bounded frame, and the report is a types-sized join —
    the 'is a model even worth training' gate for every hourly
    series."""
    obs = _hourly_type_cents(spark, sf_dir).localCheckpoint(eager=False)
    b24 = obs.select(
        F.col("event_type").alias("event_type"),
        (F.col("h") + F.expr("INTERVAL 24 HOURS")).alias("h"),
        F.col("cents").alias("__pred"),
    )
    b1 = obs.select(
        "event_type",
        (F.col("h") + F.expr("INTERVAL 1 HOURS")).alias("h"),
        F.col("cents").alias("__pred"),
    )
    sa = (
        obs.join(b24, ["event_type", "h"])
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_s"),
            F.sum(F.abs(F.col("cents") - F.col("__pred")))
            .cast("long")
            .alias("s_s"),
        )
    )
    na = (
        obs.join(b1, ["event_type", "h"])
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_n"),
            F.sum(F.abs(F.col("cents") - F.col("__pred")))
            .cast("long")
            .alias("s_n"),
        )
    )
    return (
        sa.join(na, "event_type")
        .select(
            "event_type",
            F.col("n_s").alias("n_seasonal_points"),
            F.round(F.col("s_s").cast("double") / F.col("n_s") / 100.0, 6).alias(
                "mae_seasonal"
            ),
            F.round(F.col("s_n").cast("double") / F.col("n_n") / 100.0, 6).alias(
                "mae_naive"
            ),
            F.round(
                (F.col("s_s").cast("double") / F.col("n_s"))
                / (F.col("s_n").cast("double") / F.col("n_n")),
                6,
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


CATALOG["evt_mase_seasonal_naive"].fn = _dmase

register(
    "evt_spc_individuals_chart",
    # statistical process control: the I-MR (individuals / moving
    # range) chart over the hourly cents series per event type. Center
    # lines are ratios of exact integer sums, the 2.66 factor is the
    # published 3/d2(2) constant, and out-of-control hours are counted
    # against limits computed in one shared-order expression.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE},
    mr AS (
      SELECT event_type, cents,
             abs(cents - LAG(cents) OVER (PARTITION BY event_type
                                          ORDER BY h)) AS mrv
      FROM obs
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(cents) AS BIGINT) AS sc,
             CAST(COUNT(mrv) AS BIGINT) AS n_mr,
             CAST(SUM(mrv) AS BIGINT) AS smr
      FROM mr GROUP BY event_type
    ),
    lim AS (
      SELECT event_type, n_hours, sc, n_mr, smr,
             CAST(sc AS DOUBLE) / n_hours AS cl,
             CAST(smr AS DOUBLE) / n_mr AS mrbar
      FROM g
    ),
    ooc AS (
      SELECT o.event_type,
             CAST(SUM(CASE WHEN o.cents > l.cl + 2.66 * l.mrbar
                            OR o.cents < l.cl - 2.66 * l.mrbar
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_ooc
      FROM obs o JOIN lim l USING (event_type)
      GROUP BY o.event_type
    )
    SELECT l.event_type, l.n_hours,
           round(l.cl / 100.0, 6) AS center_line,
           round(l.mrbar / 100.0, 6) AS mr_bar,
           round((l.cl + 2.66 * l.mrbar) / 100.0, 6) AS ucl,
           round((l.cl - 2.66 * l.mrbar) / 100.0, 6) AS lcl,
           ooc.n_ooc AS n_out_of_control
    FROM lim l JOIN ooc USING (event_type)
    ORDER BY l.event_type
    """,
)


def _dspc(spark, sf_dir):
    """I-MR control chart: one hourly aggregate, one lag window per
    type for the moving ranges, a types-sized limits frame broadcast
    back for the out-of-control count — the monitoring primitive that
    needs no distributional assumptions and no lookup tables beyond
    the one d2 constant."""
    obs = _hourly_type_cents(spark, sf_dir).localCheckpoint(eager=False)
    w = Window.partitionBy("event_type").orderBy("h")
    mr = obs.select(
        "event_type",
        "cents",
        F.abs(F.col("cents") - F.lag("cents").over(w)).alias("mrv"),
    )
    g = mr.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("cents").cast("long").alias("sc"),
        F.count("mrv").cast("long").alias("n_mr"),
        F.sum("mrv").cast("long").alias("smr"),
    )
    lim = g.select(
        "event_type",
        "n_hours",
        (F.col("sc").cast("double") / F.col("n_hours")).alias("cl"),
        (F.col("smr").cast("double") / F.col("n_mr")).alias("mrbar"),
    ).localCheckpoint(eager=False)
    ooc = (
        obs.join(F.broadcast(lim), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    (F.col("cents") > F.col("cl") + 2.66 * F.col("mrbar"))
                    | (F.col("cents") < F.col("cl") - 2.66 * F.col("mrbar")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_ooc")
        )
    )
    return (
        lim.join(ooc, "event_type")
        .select(
            "event_type",
            "n_hours",
            F.round(F.col("cl") / 100.0, 6).alias("center_line"),
            F.round(F.col("mrbar") / 100.0, 6).alias("mr_bar"),
            F.round((F.col("cl") + 2.66 * F.col("mrbar")) / 100.0, 6).alias("ucl"),
            F.round((F.col("cl") - 2.66 * F.col("mrbar")) / 100.0, 6).alias("lcl"),
            F.col("n_ooc").alias("n_out_of_control"),
        )
        .orderBy("event_type")
    )


CATALOG["evt_spc_individuals_chart"].fn = _dspc

register(
    "cust_lorenz_deciles",
    # the Lorenz curve behind the Gini number: customers ranked by
    # revenue into NTILE(10) deciles (deterministic ties by custkey),
    # each decile's revenue mass and the cumulative share — exact
    # integer cents until the one share division per decile row.
    oracle="""
    WITH cr AS (
      SELECT o_custkey AS ck,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                 AS cents
      FROM orders GROUP BY 1
    ),
    dc AS (
      SELECT cents, NTILE(10) OVER (ORDER BY cents, ck) AS decile FROM cr
    ),
    g AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS dcents
      FROM dc GROUP BY decile
    ),
    tot AS (SELECT CAST(SUM(dcents) AS BIGINT) AS tc FROM g)
    SELECT decile, n_customers,
           round(dcents / 100.0, 2) AS decile_revenue,
           round(CAST(SUM(dcents) OVER (ORDER BY decile) AS DOUBLE) / tot.tc, 6)
               AS cum_share
    FROM g CROSS JOIN tot
    ORDER BY decile
    """,
)


def _dlorenz(spark, sf_dir):
    """Lorenz deciles: one per-customer aggregate, an ntile over that
    aggregate (customer-cardinality, not order-cardinality), a 10-row
    rollup with a cumulative share window over 10 rows — the
    inequality curve at GROUP BY cost."""
    o = t(spark, sf_dir, "orders")
    cr = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents")
    )
    dc = cr.select(
        "cents", F.ntile(10).over(Window.orderBy("cents", "ck")).alias("decile")
    )
    g = dc.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("dcents"),
    ).localCheckpoint(eager=False)
    tot = g.agg(F.sum("dcents").cast("long").alias("tc"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.round(F.col("dcents") / 100.0, 2).alias("decile_revenue"),
            F.round(
                F.sum("dcents").over(Window.orderBy("decile")).cast("double")
                / F.col("tc"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


CATALOG["cust_lorenz_deciles"].fn = _dlorenz

register(
    "doc_boolean_retrieval_or_not",
    # the disjunction-with-exclusion companion to boolean AND: docs
    # matching (hash OR join) AND NOT stream, straight off the same
    # inverted-index tf table — OR is 'any query-term row', NOT is a
    # zero count on the excluded term, both decided inside one grouped
    # aggregate (no anti-join pass needed).
    oracle=f"""
    WITH {_TOK_SQL_CTES}
    SELECT doc_id,
           CAST(COALESCE(MAX(CASE WHEN tok = 'hash' THEN tf END), 0) AS BIGINT)
               AS tf_hash,
           CAST(COALESCE(MAX(CASE WHEN tok = 'join' THEN tf END), 0) AS BIGINT)
               AS tf_join,
           CAST(SUM(CASE WHEN tok IN ('hash', 'join') THEN tf ELSE 0 END)
                AS BIGINT) AS total_tf
    FROM qtf
    GROUP BY doc_id
    HAVING SUM(CASE WHEN tok IN ('hash', 'join') THEN 1 ELSE 0 END) >= 1
       AND SUM(CASE WHEN tok = 'stream' THEN 1 ELSE 0 END) = 0
    ORDER BY total_tf DESC, doc_id LIMIT 20
    """,
)


def _dboolornot(spark, sf_dir):
    """Boolean OR + NOT over the shared inverted index: one grouped
    aggregate per doc carries the disjunction count AND the exclusion
    count, so the whole (a OR b) AND NOT c evaluates in a single
    shuffle on doc_id — the conjunction query's exact plan shape with
    different HAVING arithmetic."""
    wide = _retrieval_wide(spark, sf_dir)
    # columnar over the wide tf frame: (hash OR join) AND NOT stream is
    # a row predicate; the unmatched-term tf is already 0, matching the
    # old COALESCE(MAX(CASE ...)), 0) pivot exactly
    h = F.col(f"__tf{_BM25_TERMS.index('hash')}")
    j = F.col(f"__tf{_BM25_TERMS.index('join')}")
    s = F.col(f"__tf{_BM25_TERMS.index('stream')}")
    return (
        wide.filter(((h > 0) | (j > 0)) & (s == 0))
        .select(
            "doc_id",
            h.cast("long").alias("tf_hash"),
            j.cast("long").alias("tf_join"),
            (h + j).cast("long").alias("total_tf"),
        )
        .orderBy(F.desc("total_tf"), "doc_id")
        .limit(20)
    )


CATALOG["doc_boolean_retrieval_or_not"].fn = _dboolornot

register(
    "doc_rake_keyword_scores",
    # RAKE keyword extraction in pure relational algebra: English docs
    # split into candidate phrases at stopword boundaries (gaps-and-
    # islands — the island id is the running stopword count), word
    # degree = sum of the lengths of phrases containing the word, and
    # score = degree/freq favors words that live in long multi-word
    # phrases. Integer counts until the one score division; top-15.
    oracle="""
    WITH tk AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS tok,
             generate_subscripts(list_filter(regexp_split_to_array(lower(trim(text)),
                                                                   '\\s+'),
                                             x -> x <> ''), 1) AS pos
      FROM documents WHERE lang = 'en'
    ),
    fl AS (
      SELECT doc_id, pos, tok,
             CASE WHEN tok IN ('the', 'and', 'of', 'to', 'in', 'a', 'is')
                  THEN 1 ELSE 0 END AS stp
      FROM tk
    ),
    isl AS (
      SELECT doc_id, tok, stp,
             SUM(stp) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM fl
    ),
    ph AS MATERIALIZED (
      SELECT doc_id, island, CAST(COUNT(*) AS BIGINT) AS plen
      FROM isl WHERE stp = 0 GROUP BY doc_id, island
    ),
    wd AS (
      SELECT i.tok,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(p.plen) AS BIGINT) AS degree
      FROM isl i JOIN ph p ON p.doc_id = i.doc_id AND p.island = i.island
      WHERE i.stp = 0
      GROUP BY i.tok
    )
    SELECT tok AS word, freq, degree,
           round(CAST(degree AS DOUBLE) / freq, 6) AS rake_score
    FROM wd
    ORDER BY rake_score DESC, word
    LIMIT 15
    """,
)


def _drake(spark, sf_dir):
    """RAKE keywords: the phrase segmentation is one per-doc running
    sum over token positions (gaps-and-islands — no regex phrase
    parser), word degree joins tokens to their own phrase lengths on
    (doc, island), and the report is a TakeOrdered top-15. Stopword
    boundaries reuse the lang-ID tier's English list."""
    from ..ops.text import LANG_STOPWORDS

    stops = LANG_STOPWORDS["en"]
    d = t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    tk = d.select("doc_id", F.posexplode(tok_arr(F.col("text"))).alias("pos", "tok"))
    fl = tk.select(
        "doc_id",
        "pos",
        "tok",
        F.when(F.col("tok").isin(*stops), 1).otherwise(0).alias("stp"),
    )
    isl = fl.select(
        "doc_id",
        "tok",
        "stp",
        F.sum("stp")
        .over(Window.partitionBy("doc_id").orderBy("pos"))
        .alias("island"),
    ).localCheckpoint(eager=False)
    ph = (
        isl.filter(F.col("stp") == 0)
        .groupBy("doc_id", "island")
        .agg(F.count("*").cast("long").alias("plen"))
    )
    wd = (
        isl.filter(F.col("stp") == 0)
        .join(ph, ["doc_id", "island"])
        .groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("degree"),
        )
    )
    return (
        wd.select(
            F.col("tok").alias("word"),
            "freq",
            "degree",
            F.round(F.col("degree").cast("double") / F.col("freq"), 6).alias(
                "rake_score"
            ),
        )
        .orderBy(F.desc("rake_score"), "word")
        .limit(15)
    )


CATALOG["doc_rake_keyword_scores"].fn = _drake


