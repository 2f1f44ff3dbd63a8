"""Split from queries.py lines 36744-38405 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t, tok_arr
from .q09_llm_dedup_text_sim import _HASH01_SQL
from .q25_r7_inference import _LANG_TOKCOUNT_CTES, _lang_tokcounts
from .q34_r10_graph_scoring import _LINKPRED_CTES, _linkpred_frames

register(
    "orders_turning_points_daily",
    # turning-points randomness test on daily order counts: T = number
    # of strict local extrema (lag/lead over the calendar-day frame),
    # E[T] = 2(n-2)/3, Var[T] = (16n-29)/90 — exact integer T against
    # closed-form rational moments, one division at the end.
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT cnt,
             LAG(cnt) OVER (ORDER BY day) AS prev,
             LEAD(cnt) OVER (ORDER BY day) AS nxt
      FROM d
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN (cnt > prev AND cnt > nxt)
                             OR (cnt < prev AND cnt < nxt) THEN 1 ELSE 0 END) AS BIGINT)
                 AS t_obs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM w WHERE prev IS NOT NULL AND nxt IS NOT NULL
    )
    SELECT n + 2 AS n_days, t_obs,
           round(2.0 * (n + 2 - 2) / 3.0, 6) AS expected_t,
           round((t_obs - 2.0 * (n + 2 - 2) / 3.0)
                 / NULLIF(sqrt((16.0 * (n + 2) - 29) / 90.0), 0.0), 6) AS z
    FROM s
    """,
)


def _dturningpoints(spark, sf_dir):
    """Turning-points test off the calendar-day order-count frame."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    wd = Window.orderBy("day")
    w = d.select(
        "cnt",
        F.lag("cnt").over(wd).alias("prev"),
        F.lead("cnt").over(wd).alias("nxt"),
    ).filter(F.col("prev").isNotNull() & F.col("nxt").isNotNull())
    tp = (
        ((F.col("cnt") > F.col("prev")) & (F.col("cnt") > F.col("nxt")))
        | ((F.col("cnt") < F.col("prev")) & (F.col("cnt") < F.col("nxt")))
    )
    s = w.agg(
        F.sum(F.when(tp, 1).otherwise(0)).cast("long").alias("t_obs"),
        F.count("*").cast("long").alias("n"),
    )
    exp_t = 2.0 * (F.col("n") + 2 - 2) / 3.0
    return s.select(
        (F.col("n") + 2).alias("n_days"),
        "t_obs",
        F.round(exp_t, 6).alias("expected_t"),
        F.round(
            (F.col("t_obs") - exp_t)
            / F.nullif(F.sqrt((16.0 * (F.col("n") + 2) - 29) / 90.0), F.lit(0.0)),
            6,
        ).alias("z"),
    )


CATALOG["orders_turning_points_daily"].fn = _dturningpoints


register(
    "evt_hurst_rs_daily",
    # rescaled-range Hurst proxy on daily event counts at block scales
    # 3/6/12 days (the events table spans ~30 calendar days): within each complete block, R*n rides the exact
    # integer cumulative deviations sum(n*x - T) (the scaled-deviation
    # trick — no float accumulation), R/S = Rn / sqrt(n*Q - T^2) is a
    # ratio of exact integers per block, micro-quantized before the
    # cross-block mean; with the three log2-scales equally spaced (step 1) the
    # regression slope collapses to (log2(rs32) - log2(rs8)) / 2 —
    # log2 rounded at 9 dp on both engines.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    r AS (SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) - 1 AS rn FROM d),
    sc AS (SELECT unnest(ARRAY[3, 6, 12]) AS scale),
    blk AS (
      SELECT sc.scale, r.rn // sc.scale AS blk, r.rn, r.x
      FROM r CROSS JOIN sc
    ),
    bt AS MATERIALIZED (
      SELECT scale, blk, CAST(SUM(x) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS m,
             SUM(CAST(x AS HUGEINT) * x) AS q
      FROM blk GROUP BY scale, blk
    ),
    cum AS (
      SELECT b.scale, b.blk,
             SUM(b.x * bt.m - bt.tot) OVER (PARTITION BY b.scale, b.blk
                                            ORDER BY b.rn) AS cdev,
             bt.m, bt.tot, bt.q
      FROM blk b JOIN bt ON b.scale = bt.scale AND b.blk = bt.blk
      WHERE bt.m = b.scale
    ),
    rs AS (
      SELECT scale,
             CAST(floor((MAX(cdev) - MIN(cdev))
                        / NULLIF(sqrt(CAST(ANY_VALUE(m) AS DOUBLE) * ANY_VALUE(q)
                                      - CAST(ANY_VALUE(tot) AS DOUBLE) * ANY_VALUE(tot)),
                                 0.0)
                        * 1000000 + 0.5) AS BIGINT) AS rs6
      FROM cum GROUP BY scale, blk
    ),
    ms AS (
      SELECT scale, CAST(SUM(rs6) AS BIGINT) AS s6, CAST(COUNT(*) AS BIGINT) AS nb
      FROM rs GROUP BY scale
    )
    SELECT
      round((SELECT CAST(s6 AS DOUBLE) / nb / 1000000 FROM ms WHERE scale = 3), 6)
          AS rs_3,
      round((SELECT CAST(s6 AS DOUBLE) / nb / 1000000 FROM ms WHERE scale = 6), 6)
          AS rs_6,
      round((SELECT CAST(s6 AS DOUBLE) / nb / 1000000 FROM ms WHERE scale = 12), 6)
          AS rs_12,
      round((round(log2(NULLIF((SELECT CAST(s6 AS DOUBLE) / nb / 1000000
                                FROM ms WHERE scale = 12), 0.0)), 9)
             - round(log2(NULLIF((SELECT CAST(s6 AS DOUBLE) / nb / 1000000
                                  FROM ms WHERE scale = 3), 0.0)), 9)) / 2.0, 6) AS hurst
    """,
)


def _dhurst(spark, sf_dir):
    """R/S Hurst proxy off the calendar-day count frame: bounded
    (scale, block) partitioned windows, exact integer deviations."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("x")
    )
    r = d.select("day", "x", (F.row_number().over(Window.orderBy("day")) - 1).alias("rn"))
    sc = spark.createDataFrame([(3,), (6,), (12,)], "scale long")
    blk = (
        r.crossJoin(F.broadcast(sc))
        .select("scale", F.expr("rn div scale").alias("blk"), "rn", "x")
        .localCheckpoint(eager=False)
    )
    d19 = "decimal(19,0)"
    bt = (
        blk.groupBy("scale", "blk")
        .agg(
            F.sum("x").cast("long").alias("tot"),
            F.count("*").cast("long").alias("m"),
            F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("q"),
        )
    )
    cum = (
        blk.join(bt, ["scale", "blk"])
        .filter(F.col("m") == F.col("scale"))
        .select(
            "scale",
            "blk",
            F.sum(F.col("x") * F.col("m") - F.col("tot"))
            .over(Window.partitionBy("scale", "blk").orderBy("rn"))
            .alias("cdev"),
            "m",
            "tot",
            "q",
        )
    )
    rs = cum.groupBy("scale", "blk").agg(
        F.floor(
            (F.max("cdev") - F.min("cdev"))
            / F.nullif(
                F.sqrt(
                    F.any_value("m").cast("double") * F.any_value("q")
                    - F.any_value("tot").cast("double") * F.any_value("tot")
                ),
                F.lit(0.0),
            )
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("rs6")
    )
    ms = (
        rs.groupBy("scale")
        .agg(F.sum("rs6").cast("long").alias("s6"), F.count("*").cast("long").alias("nb"))
        .localCheckpoint(eager=False)
    )

    def _at(scale):
        return ms.filter(F.col("scale") == scale).select(
            (F.col("s6").cast("double") / F.col("nb") / 1000000).alias(f"v{scale}")
        )

    out = _at(3).crossJoin(F.broadcast(_at(6))).crossJoin(F.broadcast(_at(12)))
    return out.select(
        F.round(F.col("v3"), 6).alias("rs_3"),
        F.round(F.col("v6"), 6).alias("rs_6"),
        F.round(F.col("v12"), 6).alias("rs_12"),
        F.round(
            (
                F.round(F.log2(F.nullif(F.col("v12"), F.lit(0.0))), 9)
                - F.round(F.log2(F.nullif(F.col("v3"), F.lit(0.0))), 9)
            )
            / 2.0,
            6,
        ).alias("hurst"),
    )


CATALOG["evt_hurst_rs_daily"].fn = _dhurst


register(
    "orders_periodogram_weekly",
    # single-frequency DFT power (Goertzel shape) of the daily order
    # counts at periods 7 and 30 days: cos/sin at d mod P come from a
    # table of constants quantized ONCE in Python at 9 dp and fed to
    # BOTH engines verbatim (the teleport-constant lesson), per-day
    # terms micro-quantized before the exact integer sum, amplitude =
    # 2*sqrt(a^2+b^2)/n. Day index is the engine-neutral integer
    # days-since-1992-01-01.
    oracle=None,  # set below — the SQL embeds the generated constant CASEs
)


def _trig_case_sql(period: int, fn: str) -> str:
    """CASE mapping (d % period) -> round(fn(2*pi*k/period), 9) — one
    generated constant table shared verbatim by both engines."""
    import math as _m

    f = _m.cos if fn == "cos" else _m.sin
    arms = " ".join(
        f"WHEN {k} THEN {round(f(2.0 * _m.pi * k / period), 9)!r}"
        for k in range(period)
    )
    return f"CASE (d % {period}) {arms} END"


_PERIODOGRAM_SQL = f"""
    WITH d AS (
      SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                  AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(x * ({_trig_case_sql(7, "cos")}) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS a7,
             CAST(SUM(CAST(floor(x * ({_trig_case_sql(7, "sin")}) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS b7,
             CAST(SUM(CAST(floor(x * ({_trig_case_sql(30, "cos")}) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS a30,
             CAST(SUM(CAST(floor(x * ({_trig_case_sql(30, "sin")}) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS b30
      FROM d
    )
    SELECT n AS n_days,
           round(2.0 * sqrt(CAST(a7 AS DOUBLE) * a7 + CAST(b7 AS DOUBLE) * b7)
                 / 1000000.0 / n, 6) AS amp_7,
           round(2.0 * sqrt(CAST(a30 AS DOUBLE) * a30 + CAST(b30 AS DOUBLE) * b30)
                 / 1000000.0 / n, 6) AS amp_30
    FROM m
    """

CATALOG["orders_periodogram_weekly"].oracle = _PERIODOGRAM_SQL


def _dperiodogram(spark, sf_dir):
    """Two-frequency periodogram off the calendar-day aggregate; the
    trig constant CASEs are parsed verbatim by Spark via F.expr."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.count("*").cast("long").alias("x"))

    def _term(period, fn):
        return (
            F.floor(F.col("x") * F.expr(_trig_case_sql(period, fn)) * 1000000 + 0.5)
            .cast("long")
        )

    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(_term(7, "cos")).cast("long").alias("a7"),
        F.sum(_term(7, "sin")).cast("long").alias("b7"),
        F.sum(_term(30, "cos")).cast("long").alias("a30"),
        F.sum(_term(30, "sin")).cast("long").alias("b30"),
    )

    def _amp(ac, bc):
        return (
            2.0
            * F.sqrt(
                F.col(ac).cast("double") * F.col(ac) + F.col(bc).cast("double") * F.col(bc)
            )
            / 1000000.0
            / F.col("n")
        )

    return m.select(
        F.col("n").alias("n_days"),
        F.round(_amp("a7", "b7"), 6).alias("amp_7"),
        F.round(_amp("a30", "b30"), 6).alias("amp_30"),
    )


CATALOG["orders_periodogram_weekly"].fn = _dperiodogram


register(
    "lineitem_price_index_laspeyres",
    # Laspeyres / Paasche / Fisher price indices between the 1995 base
    # year and 2001 (the lineitem shipdate span), over parts traded in
    # BOTH years: per part-year the
    # unit value is revenue/quantity (both exact integer masses), the
    # cross-terms p1*q0 and p0*q1 are micro-quantized per part BEFORE
    # the sums, and the own-terms p0*q0 / p1*q1 collapse to exact
    # revenue sums (the identity that keeps half of each index exact).
    # Fisher is the geometric mean, one closing sqrt.
    oracle="""
    WITH py AS MATERIALIZED (
      SELECT l_partkey AS pk, year(l_shipdate) AS yr,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS BIGINT) AS revc,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem WHERE year(l_shipdate) IN (1995, 2001)
      GROUP BY 1, 2
    ),
    b AS (
      SELECT p0.pk, p0.revc AS rev0, p0.qty AS qty0, p1.revc AS rev1, p1.qty AS qty1
      FROM py p0 JOIN py p1 ON p0.pk = p1.pk AND p0.yr = 1995 AND p1.yr = 2001
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(rev0) AS BIGINT) AS sum_p0q0,
             CAST(SUM(rev1) AS BIGINT) AS sum_p1q1,
             CAST(SUM(CAST(floor(CAST(rev1 AS DOUBLE) * qty0 / qty1 * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sum_p1q0_6,
             CAST(SUM(CAST(floor(CAST(rev0 AS DOUBLE) * qty1 / qty0 * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sum_p0q1_6
      FROM b
    )
    SELECT n_parts,
           round(CAST(sum_p1q0_6 AS DOUBLE) / 1000000.0 / sum_p0q0, 6) AS laspeyres,
           round(CAST(sum_p1q1 AS DOUBLE) * 1000000.0 / sum_p0q1_6, 6) AS paasche,
           round(sqrt((CAST(sum_p1q0_6 AS DOUBLE) / 1000000.0 / sum_p0q0)
                      * (CAST(sum_p1q1 AS DOUBLE) * 1000000.0 / sum_p0q1_6)), 6)
               AS fisher
    FROM s
    """,
)


def _dpriceindex(spark, sf_dir):
    """Laspeyres/Paasche/Fisher over parts traded in both 1995 and
    2001 — one part-year aggregate, one self-equi-join on partkey."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(1995, 2001)
    )
    py = (
        li.groupBy(
            F.col("l_partkey").alias("pk"), F.year("l_shipdate").alias("yr")
        )
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
    b = p0.join(p1, "pk")
    s = b.agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("rev0").cast("long").alias("sum_p0q0"),
        F.sum("rev1").cast("long").alias("sum_p1q1"),
        F.sum(
            F.floor(
                F.col("rev1").cast("double") * F.col("qty0") / F.col("qty1") * 1000000
                + 0.5
            ).cast("long")
        )
        .cast("long")
        .alias("sum_p1q0_6"),
        F.sum(
            F.floor(
                F.col("rev0").cast("double") * F.col("qty1") / F.col("qty0") * 1000000
                + 0.5
            ).cast("long")
        )
        .cast("long")
        .alias("sum_p0q1_6"),
    )
    lasp = F.col("sum_p1q0_6").cast("double") / 1000000.0 / F.col("sum_p0q0")
    paas = F.col("sum_p1q1").cast("double") * 1000000.0 / F.col("sum_p0q1_6")
    return s.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


CATALOG["lineitem_price_index_laspeyres"].fn = _dpriceindex


register(
    "graph_resource_allocation_pred",
    # resource-allocation link prediction over the SAME held-out-edge
    # protocol as Adamic-Adar (shared _LINKPRED_CTES /
    # _linkpred_frames): weight 1/deg(z) instead of 1/ln(deg(z)) — the
    # stronger hub discount that wins on dense community graphs.
    # Per-neighbor weights micro-quantized, per-pair score an exact
    # integer sum.
    oracle=f"""
    WITH {_LINKPRED_CTES},
    ra AS (
      SELECT e.id_a, e.id_b, e.side,
             CAST(SUM(CASE WHEN n2.dst IS NOT NULL THEN
               CAST(floor(round(1.0 / dw.dg, 6) * 1000000 + 0.5) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS ra6
      FROM ev e
      LEFT JOIN adj n1 ON n1.src = e.id_a
      LEFT JOIN adj n2 ON n2.src = e.id_b AND n2.dst = n1.dst
      LEFT JOIN deg dw ON dw.node = n1.dst
      GROUP BY e.id_a, e.id_b, e.side
    )
    SELECT side, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(ra6) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS mean_resource_alloc,
           round(CAST(SUM(CASE WHEN ra6 > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS share_with_signal
    FROM ra GROUP BY side ORDER BY side
    """,
)


def _dresourcealloc(spark, sf_dir):
    """Resource-allocation link-pred eval off the shared protocol."""
    ev, adj, deg = _linkpred_frames(spark, sf_dir)
    w6 = F.floor(F.round(1.0 / F.col("__dg"), 6) * 1e6 + 0.5).cast("long")
    n1 = adj.withColumnsRenamed({"src": "id_a", "dst": "__w"})
    n2 = adj.withColumnsRenamed({"src": "id_b", "dst": "__w"}).withColumn(
        "__hit", F.lit(1)
    )
    ra = (
        ev.join(n1, "id_a", "left")
        .join(n2, ["id_b", "__w"], "left")
        .join(F.broadcast(deg), "__w", "left")
        .groupBy("id_a", "id_b", "side")
        .agg(
            F.sum(F.when(F.col("__hit").isNotNull(), w6).otherwise(F.lit(0)))
            .cast("long")
            .alias("ra6")
        )
    )
    return (
        ra.groupBy("side")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.sum("ra6").cast("double") / F.count("*") / 1e6, 6).alias(
                "mean_resource_alloc"
            ),
            F.round(
                F.sum(F.when(F.col("ra6") > 0, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("share_with_signal"),
        )
        .orderBy("side")
    )


CATALOG["graph_resource_allocation_pred"].fn = _dresourcealloc


register(
    "graph_jaccard_link_pred",
    # neighborhood-Jaccard link prediction over the SAME protocol:
    # J = CN / (deg_a + deg_b - CN) — the normalized CN that stops
    # high-degree pairs winning on raw overlap counts. CN is an exact
    # integer per pair; endpoint degrees come from the shared degree
    # table (COALESCE 0 for isolated eval endpoints); the per-pair
    # score micro-quantizes one exact rational.
    oracle=f"""
    WITH {_LINKPRED_CTES},
    cn AS (
      SELECT e.id_a, e.id_b, e.side,
             CAST(SUM(CASE WHEN n2.dst IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS cn
      FROM ev e
      LEFT JOIN adj n1 ON n1.src = e.id_a
      LEFT JOIN adj n2 ON n2.src = e.id_b AND n2.dst = n1.dst
      GROUP BY e.id_a, e.id_b, e.side
    ),
    wj AS (
      SELECT c.side,
             CASE WHEN COALESCE(da.dg, 0) + COALESCE(db.dg, 0) - c.cn > 0
                  THEN CAST(floor(CAST(c.cn AS DOUBLE)
                                  / (COALESCE(da.dg, 0) + COALESCE(db.dg, 0) - c.cn)
                                  * 1000000 + 0.5) AS BIGINT)
                  ELSE 0 END AS j6
      FROM cn c
      LEFT JOIN deg da ON da.node = c.id_a
      LEFT JOIN deg db ON db.node = c.id_b
    )
    SELECT side, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(j6) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS mean_jaccard_lp,
           round(CAST(SUM(CASE WHEN j6 > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS share_with_signal
    FROM wj GROUP BY side ORDER BY side
    """,
)


def _djaccardlp(spark, sf_dir):
    """Neighborhood-Jaccard link-pred eval off the shared protocol."""
    ev, adj, deg = _linkpred_frames(spark, sf_dir)
    n1 = adj.withColumnsRenamed({"src": "id_a", "dst": "__w"})
    n2 = adj.withColumnsRenamed({"src": "id_b", "dst": "__w"}).withColumn(
        "__hit", F.lit(1)
    )
    cn = (
        ev.join(n1, "id_a", "left")
        .join(n2, ["id_b", "__w"], "left")
        .groupBy("id_a", "id_b", "side")
        .agg(
            F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("cn")
        )
    )
    da = F.broadcast(deg.withColumnsRenamed({"__w": "id_a", "__dg": "__dga"}))
    db = F.broadcast(deg.withColumnsRenamed({"__w": "id_b", "__dg": "__dgb"}))
    den = (
        F.coalesce(F.col("__dga"), F.lit(0))
        + F.coalesce(F.col("__dgb"), F.lit(0))
        - F.col("cn")
    )
    j6 = F.when(
        den > 0,
        F.floor(F.col("cn").cast("double") / den * 1000000 + 0.5).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    wj = cn.join(da, "id_a", "left").join(db, "id_b", "left").select(
        "side", j6.alias("j6")
    )
    return (
        wj.groupBy("side")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.sum("j6").cast("double") / F.count("*") / 1e6, 6).alias(
                "mean_jaccard_lp"
            ),
            F.round(
                F.sum(F.when(F.col("j6") > 0, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("share_with_signal"),
        )
        .orderBy("side")
    )


CATALOG["graph_jaccard_link_pred"].fn = _djaccardlp


register(
    "emb_ams_f2_sketch",
    # AMS second-moment sketch vs the exact F2 of the embedding label
    # distribution: 16 sign estimators (portable sha2-based signs over
    # '<label>_ams_<salt>' keys — both engines hash the same strings),
    # Z_s = sum of f * sign per salt is an exact integer, the
    # median-of-means over 4 groups of 4 collapses to (total - min -
    # max) / 8 since the middle-two sum of four values is total minus
    # extremes — no ordering logic, all exact until the closing
    # divisions. The F2 sibling of the CMS/KMV cardinality audits.
    oracle=f"""
    WITH lab AS MATERIALIZED (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS f FROM embeddings GROUP BY label
    ),
    salts AS (SELECT unnest(generate_series(0, 15)) AS s),
    z AS (
      SELECT s, CAST(SUM(CASE WHEN {_HASH01_SQL.format(key="CAST(label AS VARCHAR) || '_ams_' || CAST(s AS VARCHAR)")} < 0.5
                              THEN f ELSE -f END) AS BIGINT) AS z
      FROM lab CROSS JOIN salts GROUP BY s
    ),
    g AS (
      SELECT s // 4 AS grp, CAST(SUM(CAST(z AS HUGEINT) * z) AS BIGINT) AS sq
      FROM z GROUP BY s // 4
    ),
    mm AS (
      SELECT CAST(SUM(sq) AS BIGINT) AS tot, CAST(MIN(sq) AS BIGINT) AS mn,
             CAST(MAX(sq) AS BIGINT) AS mx
      FROM g
    ),
    ex AS (
      SELECT CAST(SUM(CAST(f AS HUGEINT) * f) AS BIGINT) AS f2 FROM lab
    )
    SELECT ex.f2 AS f2_exact,
           round((CAST(tot AS DOUBLE) - mn - mx) / 8.0, 6) AS f2_ams,
           round(((CAST(tot AS DOUBLE) - mn - mx) / 8.0 - ex.f2)
                 / CAST(ex.f2 AS DOUBLE), 6) AS rel_error
    FROM mm CROSS JOIN ex
    """,
)


def _damsf2(spark, sf_dir):
    """AMS F2 sketch vs exact second moment over the label histogram."""
    from ..ops.sampling import hash_uniform01

    e = t(spark, sf_dir, "embeddings")
    lab = (
        e.groupBy("label")
        .agg(F.count("*").cast("long").alias("f"))
        .localCheckpoint(eager=False)
    )
    salts = spark.range(0, 16).select(F.col("id").cast("long").alias("s"))
    key = F.concat(
        F.col("label").cast("string"), F.lit("_ams_"), F.col("s").cast("string")
    )
    z = (
        lab.crossJoin(F.broadcast(salts))
        .groupBy("s")
        .agg(
            F.sum(
                F.when(hash_uniform01(key) < 0.5, F.col("f")).otherwise(-F.col("f"))
            )
            .cast("long")
            .alias("z")
        )
    )
    d19 = "decimal(19,0)"
    g = z.groupBy(F.expr("s div 4").alias("grp")).agg(
        F.sum(F.col("z").cast(d19) * F.col("z").cast(d19)).cast("long").alias("sq")
    )
    mm = g.agg(
        F.sum("sq").cast("long").alias("tot"),
        F.min("sq").cast("long").alias("mn"),
        F.max("sq").cast("long").alias("mx"),
    )
    ex = lab.agg(
        F.sum(F.col("f").cast(d19) * F.col("f").cast(d19)).cast("long").alias("f2")
    )
    ams = (F.col("tot").cast("double") - F.col("mn") - F.col("mx")) / 8.0
    return mm.crossJoin(F.broadcast(ex)).select(
        F.col("f2").alias("f2_exact"),
        F.round(ams, 6).alias("f2_ams"),
        F.round((ams - F.col("f2")) / F.col("f2").cast("double"), 6).alias("rel_error"),
    )


CATALOG["emb_ams_f2_sketch"].fn = _damsf2


register(
    "emb_simpson_diversity_labels",
    # Simpson's diversity of the embedding label distribution: the
    # unbiased D = sum f(f-1) / (N(N-1)), its Gini-Simpson complement,
    # and the Hill-number effective label count N^2 / sum f^2 — all
    # exact integer masses off one label histogram, three closing
    # divisions. The class-balance gauge read before trusting a
    # stratified sample of the embedding corpus.
    oracle="""
    WITH lab AS MATERIALIZED (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS f FROM embeddings GROUP BY label
    ),
    g AS (
      SELECT CAST(SUM(f) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(f AS HUGEINT) * (f - 1)) AS BIGINT) AS m,
             CAST(SUM(CAST(f AS HUGEINT) * f) AS BIGINT) AS f2
      FROM lab
    )
    SELECT n AS n_rows, k AS n_labels,
           round(CAST(m AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 6) AS simpson_d,
           round(1.0 - CAST(m AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)), 6)
               AS gini_simpson,
           round(CAST(n AS DOUBLE) * n / f2, 6) AS effective_labels
    FROM g
    """,
)


def _dsimpsondiv(spark, sf_dir):
    """Simpson diversity / effective labels off the label histogram."""
    e = t(spark, sf_dir, "embeddings")
    lab = e.groupBy("label").agg(F.count("*").cast("long").alias("f"))
    d19 = "decimal(19,0)"
    g = lab.agg(
        F.sum("f").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("f").cast(d19) * (F.col("f").cast(d19) - 1)).cast("long").alias("m"),
        F.sum(F.col("f").cast(d19) * F.col("f").cast(d19)).cast("long").alias("f2"),
    )
    nd = F.col("n").cast("double")
    return g.select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_labels"),
        F.round(F.col("m").cast("double") / (nd * (F.col("n") - 1)), 6).alias("simpson_d"),
        F.round(1.0 - F.col("m").cast("double") / (nd * (F.col("n") - 1)), 6).alias(
            "gini_simpson"
        ),
        F.round(nd * F.col("n") / F.col("f2"), 6).alias("effective_labels"),
    )


CATALOG["emb_simpson_diversity_labels"].fn = _dsimpsondiv


# The syllable proxy, single-sourced: Flesch-Kincaid and SMOG (round
# 12) count the SAME vowel-group runs per token, so the two grade
# levels can never disagree on what a syllable is. max(1, runs) floors
# vowelless tokens (numbers, symbols) at one syllable.
_SYLL_LIST_SQL = (
    "list_transform(toks, x -> GREATEST(len(regexp_extract_all(x, '[aeiouy]+')), 1))"
)
_POLY_LIST_SQL = (
    "list_transform(toks, x -> CASE WHEN len(regexp_extract_all(x, '[aeiouy]+')) >= 3 "
    "THEN 1 ELSE 0 END)"
)


def _syll_col(toks):
    """Per-doc syllable mass: sum over tokens of max(1, vowel runs)."""
    return F.aggregate(
        F.transform(
            toks,
            lambda x: F.greatest(
                F.regexp_count(x, F.lit("[aeiouy]+")).cast("long"), F.lit(1).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _poly_col(toks):
    """Per-doc polysyllable count: tokens with >= 3 vowel runs."""
    return F.aggregate(
        F.transform(
            toks,
            lambda x: F.when(F.regexp_count(x, F.lit("[aeiouy]+")) >= 3, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


register(
    "doc_coleman_liau_by_source",
    # Coleman-Liau index per source: 0.0588*L - 0.296*S - 15.8 with
    # L = 100*letters/words and S = 100*sentences/words — the
    # letters-only readability twin of ARI (same word and sentence
    # masses, letter mass via one [a-z] regexp count on the lowered
    # text). Exact integer masses, rational constants, one expression.
    oracle="""
    WITH m AS (
      SELECT source,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n_words,
             len(regexp_extract_all(lower(text), '[a-z]')) AS n_letters,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents
      FROM documents WHERE text IS NOT NULL
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_letters) AS BIGINT) AS n_letters,
           CAST(SUM(sents) AS BIGINT) AS n_sentences,
           round(0.0588 * (100.0 * SUM(n_letters) / SUM(n_words))
                 - 0.296 * (100.0 * SUM(sents) / SUM(n_words)) - 15.8, 6)
               AS coleman_liau
    FROM m GROUP BY source ORDER BY source
    """,
)


def _dcolemanliau(spark, sf_dir):
    """Coleman-Liau per source off three exact integer masses."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    m = d.select(
        "source",
        F.size(tok_arr(F.col("text"))).cast("long").alias("n_words"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[a-z]")).cast("long").alias(
            "n_letters"
        ),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long"), F.lit(1)
        ).alias("sents"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_letters").cast("long").alias("n_letters"),
            F.sum("sents").cast("long").alias("n_sentences"),
            F.round(
                0.0588 * (100.0 * F.sum("n_letters") / F.sum("n_words"))
                - 0.296 * (100.0 * F.sum("sents") / F.sum("n_words"))
                - 15.8,
                6,
            ).alias("coleman_liau"),
        )
        .orderBy("source")
    )


CATALOG["doc_coleman_liau_by_source"].fn = _dcolemanliau


register(
    "doc_flesch_kincaid_by_source",
    # Flesch-Kincaid grade per source: 0.39*(words/sentences) +
    # 11.8*(syllables/words) - 15.59, syllables from the shared
    # vowel-run proxy (_SYLL_LIST_SQL / _syll_col — deterministic, no
    # dictionary). Three exact integer masses per doc, one rollup.
    oracle=f"""
    WITH d AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents
      FROM documents WHERE text IS NOT NULL
    ),
    m AS (
      SELECT source, len(toks) AS n_words,
             CAST(list_sum({_SYLL_LIST_SQL}) AS BIGINT) AS n_sylls,
             sents
      FROM d
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_sylls) AS BIGINT) AS n_syllables,
           CAST(SUM(sents) AS BIGINT) AS n_sentences,
           round(0.39 * (CAST(SUM(n_words) AS DOUBLE) / SUM(sents))
                 + 11.8 * (CAST(SUM(n_sylls) AS DOUBLE) / SUM(n_words)) - 15.59, 6)
               AS flesch_kincaid
    FROM m GROUP BY source ORDER BY source
    """,
)


def _dfleschkincaid(spark, sf_dir):
    """Flesch-Kincaid grade per source off the shared syllable proxy."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = tok_arr(F.col("text"))
    m = d.select(
        "source",
        F.size(toks).cast("long").alias("n_words"),
        _syll_col(toks).alias("n_sylls"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long"), F.lit(1)
        ).alias("sents"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_sylls").cast("long").alias("n_syllables"),
            F.sum("sents").cast("long").alias("n_sentences"),
            F.round(
                0.39 * (F.sum("n_words").cast("double") / F.sum("sents"))
                + 11.8 * (F.sum("n_sylls").cast("double") / F.sum("n_words"))
                - 15.59,
                6,
            ).alias("flesch_kincaid"),
        )
        .orderBy("source")
    )


CATALOG["doc_flesch_kincaid_by_source"].fn = _dfleschkincaid


register(
    "doc_smog_by_source",
    # SMOG grade per source: 1.043*sqrt(30*polysyllables/sentences) +
    # 3.1291, polysyllables = tokens with >= 3 vowel runs off the SAME
    # syllable proxy as Flesch-Kincaid (_POLY_LIST_SQL / _poly_col).
    # Two exact integer masses, one sqrt.
    oracle=f"""
    WITH d AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents
      FROM documents WHERE text IS NOT NULL
    ),
    m AS (
      SELECT source,
             CAST(list_sum({_POLY_LIST_SQL}) AS BIGINT) AS n_poly,
             sents
      FROM d
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_poly) AS BIGINT) AS n_polysyllables,
           CAST(SUM(sents) AS BIGINT) AS n_sentences,
           round(1.043 * sqrt(30.0 * SUM(n_poly) / SUM(sents)) + 3.1291, 6) AS smog
    FROM m GROUP BY source ORDER BY source
    """,
)


def _dsmog(spark, sf_dir):
    """SMOG grade per source off the shared polysyllable proxy."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = tok_arr(F.col("text"))
    m = d.select(
        "source",
        _poly_col(toks).alias("n_poly"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long"), F.lit(1)
        ).alias("sents"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_poly").cast("long").alias("n_polysyllables"),
            F.sum("sents").cast("long").alias("n_sentences"),
            F.round(
                1.043 * F.sqrt(30.0 * F.sum("n_poly") / F.sum("sents")) + 3.1291, 6
            ).alias("smog"),
        )
        .orderBy("source")
    )


CATALOG["doc_smog_by_source"].fn = _dsmog


register(
    "doc_brunet_sichel_by_lang",
    # the vocabulary-richness panel beyond TTR, off the SAME
    # (lang, token) count table (_LANG_TOKCOUNT_CTES /
    # _lang_tokcounts): Herdan's C = lnV/lnN (the log TTR that is
    # stable in N), Brunet's W = exp(V^-0.165 * lnN) (lower = richer),
    # Sichel's S = V2/V (dislegomena share, famously constant per
    # author). Logs quantized at 9 dp before the one exp.
    oracle=f"""
    WITH {_LANG_TOKCOUNT_CTES},
    m AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
      FROM tc GROUP BY lang
    )
    SELECT lang, n AS n_tokens, v AS n_types, v2 AS n_dislegomena,
           round(round(ln(CAST(v AS DOUBLE)), 9) / round(ln(CAST(n AS DOUBLE)), 9), 6)
               AS herdan_c,
           round(exp(round(exp(round(-0.165 * round(ln(CAST(v AS DOUBLE)), 9), 9)), 9)
                     * round(ln(CAST(n AS DOUBLE)), 9)), 6) AS brunet_w,
           round(CAST(v2 AS DOUBLE) / v, 6) AS sichel_s
    FROM m ORDER BY lang
    """,
)


def _dbrunetsichel(spark, sf_dir):
    """Herdan C / Brunet W / Sichel S off the shared vocab frame."""
    tc = _lang_tokcounts(spark, sf_dir)
    m = tc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("v2"),
    )
    ln_v = F.round(F.log(F.col("v").cast("double")), 9)
    ln_n = F.round(F.log(F.col("n").cast("double")), 9)
    vpow = F.round(F.exp(F.round(-0.165 * ln_v, 9)), 9)
    return m.select(
        "lang",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        F.col("v2").alias("n_dislegomena"),
        F.round(ln_v / ln_n, 6).alias("herdan_c"),
        F.round(F.exp(vpow * ln_n), 6).alias("brunet_w"),
        F.round(F.col("v2").cast("double") / F.col("v"), 6).alias("sichel_s"),
    ).orderBy("lang")


CATALOG["doc_brunet_sichel_by_lang"].fn = _dbrunetsichel


register(
    "doc_honore_r_by_lang",
    # Honore's R = 100*lnN / (1 - V1/V) per language — the hapax-based
    # richness statistic that diverges as every type tends to appear
    # once. Off the SAME (lang, token) count table as TTR; the
    # all-hapax degenerate corpus NULLIF-guards to NULL rather than
    # dividing by zero.
    oracle=f"""
    WITH {_LANG_TOKCOUNT_CTES},
    m AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1
      FROM tc GROUP BY lang
    )
    SELECT lang, n AS n_tokens, v AS n_types, v1 AS n_hapax,
           round(100.0 * round(ln(CAST(n AS DOUBLE)), 9)
                 / NULLIF(1.0 - CAST(v1 AS DOUBLE) / v, 0.0), 6) AS honore_r
    FROM m ORDER BY lang
    """,
)


def _dhonore(spark, sf_dir):
    """Honore's R off the shared vocab frame."""
    tc = _lang_tokcounts(spark, sf_dir)
    m = tc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("v1"),
    )
    return m.select(
        "lang",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        F.col("v1").alias("n_hapax"),
        F.round(
            100.0
            * F.round(F.log(F.col("n").cast("double")), 9)
            / F.nullif(1.0 - F.col("v1").cast("double") / F.col("v"), F.lit(0.0)),
            6,
        ).alias("honore_r"),
    ).orderBy("lang")


CATALOG["doc_honore_r_by_lang"].fn = _dhonore


register(
    "doc_punctuation_profile_sources",
    # punctuation stylometry per source: per-1k-char rates of the five
    # major punctuation classes — five JVM regexp counts and one
    # rollup, all rates exact integer ratios. The cheap authorship /
    # template-detection profile next to Burrows' Delta.
    oracle="""
    WITH m AS (
      SELECT source, CAST(length(text) AS BIGINT) AS chars,
             len(regexp_extract_all(text, ',')) AS commas,
             len(regexp_extract_all(text, '\\.')) AS periods,
             len(regexp_extract_all(text, ';')) AS semis,
             len(regexp_extract_all(text, '!')) AS bangs,
             len(regexp_extract_all(text, '\\?')) AS questions
      FROM documents WHERE text IS NOT NULL
    )
    SELECT source, CAST(SUM(chars) AS BIGINT) AS n_chars,
           round(1000.0 * SUM(commas) / SUM(chars), 6) AS commas_per_1k,
           round(1000.0 * SUM(periods) / SUM(chars), 6) AS periods_per_1k,
           round(1000.0 * SUM(semis) / SUM(chars), 6) AS semicolons_per_1k,
           round(1000.0 * SUM(bangs) / SUM(chars), 6) AS exclaims_per_1k,
           round(1000.0 * SUM(questions) / SUM(chars), 6) AS questions_per_1k
    FROM m GROUP BY source ORDER BY source
    """,
)


def _dpunctprofile(spark, sf_dir):
    """Per-source punctuation rates — five regexp counts, one rollup."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    m = d.select(
        "source",
        F.length("text").cast("long").alias("chars"),
        F.regexp_count(F.col("text"), F.lit(",")).cast("long").alias("commas"),
        F.regexp_count(F.col("text"), F.lit(r"\.")).cast("long").alias("periods"),
        F.regexp_count(F.col("text"), F.lit(";")).cast("long").alias("semis"),
        F.regexp_count(F.col("text"), F.lit("!")).cast("long").alias("bangs"),
        F.regexp_count(F.col("text"), F.lit(r"\?")).cast("long").alias("questions"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.sum("chars").cast("long").alias("n_chars"),
            F.round(1000.0 * F.sum("commas") / F.sum("chars"), 6).alias("commas_per_1k"),
            F.round(1000.0 * F.sum("periods") / F.sum("chars"), 6).alias(
                "periods_per_1k"
            ),
            F.round(1000.0 * F.sum("semis") / F.sum("chars"), 6).alias(
                "semicolons_per_1k"
            ),
            F.round(1000.0 * F.sum("bangs") / F.sum("chars"), 6).alias(
                "exclaims_per_1k"
            ),
            F.round(1000.0 * F.sum("questions") / F.sum("chars"), 6).alias(
                "questions_per_1k"
            ),
        )
        .orderBy("source")
    )


CATALOG["doc_punctuation_profile_sources"].fn = _dpunctprofile


register(
    "cust_atkinson_index",
    # Atkinson inequality index (epsilon = 0.5) over per-customer
    # revenue: A = 1 - (mean sqrt y)^2 / mean y — the welfare-weighted
    # cousin of Gini that prices in HOW unequal the bottom is. Per-
    # customer sqrt micro-quantized before the sum; everything else is
    # exact integer cents.
    oracle="""
    WITH y AS (
      SELECT o_custkey,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS sy,
             CAST(SUM(CAST(floor(sqrt(CAST(cents AS DOUBLE)) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS ss6
      FROM y
    )
    SELECT n AS n_customers,
           round(CAST(sy AS DOUBLE) / n / 100.0, 6) AS mean_revenue,
           round(1.0 - pow(CAST(ss6 AS DOUBLE) / n / 1000000.0, 2)
                       / (CAST(sy AS DOUBLE) / n), 6) AS atkinson_05
    FROM m
    """,
)


def _datkinson(spark, sf_dir):
    """Atkinson(0.5) off the per-customer revenue aggregate."""
    o = t(spark, sf_dir, "orders")
    y = o.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    m = y.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sy"),
        F.sum(
            F.floor(F.sqrt(F.col("cents").cast("double")) * 1000000 + 0.5).cast("long")
        )
        .cast("long")
        .alias("ss6"),
    )
    return m.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("sy").cast("double") / F.col("n") / 100.0, 6).alias("mean_revenue"),
        F.round(
            1.0
            - F.pow(F.col("ss6").cast("double") / F.col("n") / 1000000.0, 2)
            / (F.col("sy").cast("double") / F.col("n")),
            6,
        ).alias("atkinson_05"),
    )


CATALOG["cust_atkinson_index"].fn = _datkinson


register(
    "cust_palma_hoover_index",
    # Palma ratio (top-10% revenue share over bottom-40% share) and
    # Hoover index (the share of revenue that would have to move to
    # equalize) over per-customer revenue: the rank cuts are the exact
    # integer compares 10*rank > 9*n and 10*rank <= 4*n (the
    # quartile-CAST lesson generalized), Hoover's numerator
    # sum|n*y - Y| is an exact decimal/HUGEINT mass, and the window
    # rides the per-customer aggregate, never raw orders.
    oracle="""
    WITH y AS (
      SELECT o_custkey,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rk
      FROM y
    ),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS yt FROM y),
    s AS (
      SELECT CAST(SUM(CASE WHEN 10 * rk > 9 * g.n THEN cents ELSE 0 END) AS BIGINT)
                 AS top10,
             CAST(SUM(CASE WHEN 10 * rk <= 4 * g.n THEN cents ELSE 0 END) AS BIGINT)
                 AS bot40,
             CAST(SUM(ABS(CAST(cents AS HUGEINT) * g.n - g.yt)) AS DOUBLE) AS hnum
      FROM r CROSS JOIN g
    )
    SELECT g.n AS n_customers,
           round(CAST(top10 AS DOUBLE) / g.yt, 6) AS top10_share,
           round(CAST(bot40 AS DOUBLE) / g.yt, 6) AS bottom40_share,
           round(CAST(top10 AS DOUBLE) / NULLIF(CAST(bot40 AS DOUBLE), 0.0), 6)
               AS palma_ratio,
           round(hnum / (2.0 * g.n * g.yt), 6) AS hoover_index
    FROM s CROSS JOIN g
    """,
)


def _dpalmahoover(spark, sf_dir):
    """Palma + Hoover off the ranked per-customer revenue frame."""
    o = t(spark, sf_dir, "orders")
    y = o.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("cents")
    ).localCheckpoint(eager=False)
    r = y.select(
        "cents", F.row_number().over(Window.orderBy("cents", "o_custkey")).alias("rk")
    )
    g = y.agg(
        F.count("*").cast("long").alias("n"), F.sum("cents").cast("long").alias("yt")
    )
    d12 = "decimal(12,0)"
    s = r.crossJoin(F.broadcast(g)).agg(
        F.sum(F.when(10 * F.col("rk") > 9 * F.col("n"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("top10"),
        F.sum(F.when(10 * F.col("rk") <= 4 * F.col("n"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("bot40"),
        F.sum(F.abs(F.col("cents").cast(d12) * F.col("n").cast(d12) - F.col("yt")))
        .cast("double")
        .alias("hnum"),
    )
    return s.crossJoin(F.broadcast(g)).select(
        F.col("n").alias("n_customers"),
        F.round(F.col("top10").cast("double") / F.col("yt"), 6).alias("top10_share"),
        F.round(F.col("bot40").cast("double") / F.col("yt"), 6).alias("bottom40_share"),
        F.round(
            F.col("top10").cast("double")
            / F.nullif(F.col("bot40").cast("double"), F.lit(0.0)),
            6,
        ).alias("palma_ratio"),
        F.round(F.col("hnum") / (2.0 * F.col("n") * F.col("yt")), 6).alias(
            "hoover_index"
        ),
    )


CATALOG["cust_palma_hoover_index"].fn = _dpalmahoover


register(
    "orders_clv_discounted",
    # discounted customer lifetime value per market segment: revenue in
    # calendar month m (0 = 1995-01, the orders span) is discounted by
    # 0.95^m, with 120 monthly factors (10 years of headroom — review
    # pass 3 caught the original 1992-origin/84-arm table silently
    # NULL-dropping every month past arm 83 in BOTH engines, a bug
    # parity cannot see) generated ONCE in Python at 9 dp and
    # fed to BOTH engines verbatim (the teleport-constant lesson — no
    # cross-engine pow drift). Revenue aggregates to the bounded
    # (segment, month) cell frame BEFORE discounting, so the quantized
    # multiply touches ~420 cells, not raw orders.
    oracle=None,  # set below — embeds the generated discount CASE
)


def _clv_delta_case_sql() -> str:
    arms = " ".join(f"WHEN {m} THEN {round(0.95 ** m, 9)!r}" for m in range(120))
    return f"CASE m {arms} END"


_CLV_SQL = f"""
    WITH o AS (
      SELECT o_custkey,
             (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS m,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    cells AS (
      SELECT c.c_mktsegment AS segment, o.m,
             CAST(SUM(o.cents) AS BIGINT) AS cents
      FROM o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    seg AS (
      SELECT segment,
             CAST(SUM(cents) AS BIGINT) AS nominal_cents,
             CAST(SUM(CAST(floor(CAST(cents AS DOUBLE) * ({_clv_delta_case_sql()})
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS disc6
      FROM cells GROUP BY segment
    ),
    nc AS (
      SELECT c.c_mktsegment AS segment,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    SELECT seg.segment, nc.n_customers,
           round(CAST(nominal_cents AS DOUBLE) / 100.0, 6) AS nominal_revenue,
           round(CAST(disc6 AS DOUBLE) / 1000000.0 / 100.0, 6) AS discounted_revenue,
           round(CAST(disc6 AS DOUBLE) / 1000000.0 / nominal_cents, 6)
               AS discount_retention
    FROM seg JOIN nc ON seg.segment = nc.segment
    ORDER BY seg.segment
    """

CATALOG["orders_clv_discounted"].oracle = _CLV_SQL


def _dclv(spark, sf_dir):
    """Discounted CLV per segment off the bounded (segment, month)
    cell frame; the 84 discount constants parse verbatim via F.expr."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1).alias("m"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    oc = o.join(F.broadcast(c), "o_custkey").localCheckpoint(eager=False)
    cells = oc.groupBy("segment", "m").agg(F.sum("cents").cast("long").alias("cents"))
    disc6 = F.floor(
        F.col("cents").cast("double") * F.expr(_clv_delta_case_sql()) * 1000000 + 0.5
    ).cast("long")
    seg = cells.groupBy("segment").agg(
        F.sum("cents").cast("long").alias("nominal_cents"),
        F.sum(disc6).cast("long").alias("disc6"),
    )
    nc = oc.groupBy("segment").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_customers")
    )
    return (
        seg.join(nc, "segment")
        .select(
            "segment",
            "n_customers",
            F.round(F.col("nominal_cents").cast("double") / 100.0, 6).alias(
                "nominal_revenue"
            ),
            F.round(F.col("disc6").cast("double") / 1000000.0 / 100.0, 6).alias(
                "discounted_revenue"
            ),
            F.round(
                F.col("disc6").cast("double") / 1000000.0 / F.col("nominal_cents"), 6
            ).alias("discount_retention"),
        )
        .orderBy("segment")
    )


CATALOG["orders_clv_discounted"].fn = _dclv


register(
    "ml_winsorized_trimmed_mean",
    # robust location estimates of l_quantity off the 50-value
    # histogram: the 5% trimmed mean clips each value's count to the
    # [k, n-k] rank interval via exact integer max/min arithmetic (no
    # per-row ranking), and the winsorized mean adds back k copies of
    # the rank-(k+1) and rank-(n-k) values found by the same 2*cum-
    # style integer compares. Everything is exact until two closing
    # divisions.
    oracle="""
    WITH h AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    cw AS (SELECT q, c, SUM(c) OVER (ORDER BY q) AS cum FROM h),
    g AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) * 5 // 100 AS k
          FROM h),
    tr AS (
      SELECT CAST(SUM(GREATEST(LEAST(cum, g.n - g.k) - GREATEST(cum - c, g.k), 0) * q)
                  AS BIGINT) AS tsum
      FROM cw CROSS JOIN g
    ),
    vl AS (SELECT MIN(q) AS v_low FROM cw CROSS JOIN g WHERE cum > g.k),
    vh AS (SELECT MIN(q) AS v_high FROM cw CROSS JOIN g WHERE cum >= g.n - g.k)
    SELECT g.n AS n_rows, g.k AS k_trim,
           round(CAST(tsum AS DOUBLE) / (g.n - 2 * g.k), 6) AS trimmed_mean,
           round((CAST(tsum AS DOUBLE) + g.k * (vl.v_low + vh.v_high)) / g.n, 6)
               AS winsorized_mean
    FROM tr CROSS JOIN g CROSS JOIN vl CROSS JOIN vh
    """,
)


def _dwinsorized(spark, sf_dir):
    """5% trimmed + winsorized means via clipped histogram counts."""
    li = t(spark, sf_dir, "lineitem")
    h = (
        li.groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    cw = h.withColumn("cum", F.sum("c").over(Window.orderBy("q"))).localCheckpoint(
        eager=False
    )
    g = h.agg(
        F.sum("c").cast("long").alias("n"),
        F.expr("CAST(SUM(c) AS BIGINT) * 5 div 100").alias("k"),
    )
    tr = cw.crossJoin(F.broadcast(g)).agg(
        F.sum(
            F.greatest(
                F.least(F.col("cum"), F.col("n") - F.col("k"))
                - F.greatest(F.col("cum") - F.col("c"), F.col("k")),
                F.lit(0).cast("long"),
            )
            * F.col("q")
        )
        .cast("long")
        .alias("tsum")
    )
    vl = (
        cw.crossJoin(F.broadcast(g))
        .filter(F.col("cum") > F.col("k"))
        .agg(F.min("q").alias("v_low"))
    )
    vh = (
        cw.crossJoin(F.broadcast(g))
        .filter(F.col("cum") >= F.col("n") - F.col("k"))
        .agg(F.min("q").alias("v_high"))
    )
    return (
        tr.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(vl))
        .crossJoin(F.broadcast(vh))
        .select(
            F.col("n").alias("n_rows"),
            F.col("k").alias("k_trim"),
            F.round(
                F.col("tsum").cast("double") / (F.col("n") - 2 * F.col("k")), 6
            ).alias("trimmed_mean"),
            F.round(
                (F.col("tsum").cast("double") + F.col("k") * (F.col("v_low") + F.col("v_high")))
                / F.col("n"),
                6,
            ).alias("winsorized_mean"),
        )
    )


CATALOG["ml_winsorized_trimmed_mean"].fn = _dwinsorized


register(
    "ml_mad_robust_outliers",
    # median absolute deviation of l_quantity and the robust-z outlier
    # share: both medians (the grand one and the MAD) come from the
    # lower-median integer compare 2*cum >= n over bounded value
    # histograms, and the 0.6745*|q-med|/MAD > 3.5 outlier test
    # multiplies through to the EXACT integer compare 6745*dev >
    # 35000*MAD — no division ever happens, so there is nothing to
    # drift. The robust complement of the z-score outlier family.
    oracle="""
    WITH h AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    g AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    med AS (
      SELECT MIN(q) AS med FROM (
        SELECT q, SUM(c) OVER (ORDER BY q) AS cum FROM h
      ) CROSS JOIN g WHERE 2 * cum >= n
    ),
    dev AS (
      SELECT ABS(q - med) AS d, CAST(SUM(c) AS BIGINT) AS c
      FROM h CROSS JOIN med GROUP BY 1
    ),
    mad AS (
      SELECT MIN(d) AS mad FROM (
        SELECT d, SUM(c) OVER (ORDER BY d) AS cum FROM dev
      ) CROSS JOIN g WHERE 2 * cum >= n
    ),
    outl AS (
      SELECT CAST(SUM(CASE WHEN 6745 * d > 35000 * mad.mad THEN c ELSE 0 END)
                  AS BIGINT) AS n_out
      FROM dev CROSS JOIN mad
    )
    SELECT g.n AS n_rows, med.med AS median_q, mad.mad AS mad,
           outl.n_out AS n_outliers,
           round(CAST(outl.n_out AS DOUBLE) / g.n, 6) AS outlier_share
    FROM g CROSS JOIN med CROSS JOIN mad CROSS JOIN outl
    """,
)


def _dmadoutliers(spark, sf_dir):
    """MAD + robust-z outlier share via two histogram median passes."""
    li = t(spark, sf_dir, "lineitem")
    h = (
        li.groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    g = h.agg(F.sum("c").cast("long").alias("n"))

    def _lower_median(frame, val, cnt):
        cum = frame.withColumn("__cum", F.sum(cnt).over(Window.orderBy(val)))
        return (
            cum.crossJoin(F.broadcast(g))
            .filter(2 * F.col("__cum") >= F.col("n"))
            .agg(F.min(val).alias("__m"))
        )

    med = _lower_median(h, "q", "c").select(F.col("__m").alias("med"))
    dev = (
        h.crossJoin(F.broadcast(med))
        .groupBy(F.abs(F.col("q") - F.col("med")).alias("d"))
        .agg(F.sum("c").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    mad = _lower_median(dev, "d", "c").select(F.col("__m").alias("mad"))
    outl = (
        dev.crossJoin(F.broadcast(mad))
        .agg(
            F.sum(
                F.when(6745 * F.col("d") > 35000 * F.col("mad"), F.col("c")).otherwise(0)
            )
            .cast("long")
            .alias("n_out")
        )
    )
    return (
        g.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(outl))
        .select(
            F.col("n").alias("n_rows"),
            F.col("med").alias("median_q"),
            "mad",
            F.col("n_out").alias("n_outliers"),
            F.round(F.col("n_out").cast("double") / F.col("n"), 6).alias("outlier_share"),
        )
    )


CATALOG["ml_mad_robust_outliers"].fn = _dmadoutliers


register(
    "ml_f_test_two_variances",
    # the classical two-sample variance-ratio F test between returned
    # ('R') and delivered ('N') quantities — the F-statistic sibling of
    # Welch/Bartlett/Levene over the SAME conditional-moment shape: one
    # aggregation pass, exact integer moments, two NULLIF-guarded
    # divisions.
    oracle="""
    WITH m AS (
      SELECT CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS sr,
             CAST(SUM(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS qr,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nn,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS sn,
             CAST(SUM(CASE WHEN l_returnflag = 'N'
                           THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS qn
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    )
    SELECT nr AS n_r, nn AS n_n,
           round((CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / nr)
                 / NULLIF(nr - 1, 0), 6) AS var_r,
           round((CAST(qn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / nn)
                 / NULLIF(nn - 1, 0), 6) AS var_n,
           round(((CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / nr)
                  / NULLIF(nr - 1, 0))
                 / NULLIF((CAST(qn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / nn)
                          / NULLIF(nn - 1, 0), 0.0), 6) AS f_stat
    FROM m
    """,
)


def _dftest(spark, sf_dir):
    """Two-sample variance-ratio F off one conditional-moment pass."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    q = F.col("l_quantity").cast("long")
    isr = F.col("l_returnflag") == "R"

    def _m(cond, expr):
        return F.sum(F.when(cond, expr).otherwise(F.lit(0))).cast("long")

    m = li.agg(
        _m(isr, F.lit(1)).alias("nr"),
        _m(isr, q).alias("sr"),
        _m(isr, q * q).alias("qr"),
        _m(~isr, F.lit(1)).alias("nn"),
        _m(~isr, q).alias("sn"),
        _m(~isr, q * q).alias("qn"),
    )
    var_r = (
        F.col("qr").cast("double") - F.col("sr").cast("double") * F.col("sr") / F.col("nr")
    ) / F.nullif(F.col("nr") - 1, F.lit(0))
    var_n = (
        F.col("qn").cast("double") - F.col("sn").cast("double") * F.col("sn") / F.col("nn")
    ) / F.nullif(F.col("nn") - 1, F.lit(0))
    return m.select(
        F.col("nr").alias("n_r"),
        F.col("nn").alias("n_n"),
        F.round(var_r, 6).alias("var_r"),
        F.round(var_n, 6).alias("var_n"),
        F.round(var_r / F.nullif(var_n, F.lit(0.0)), 6).alias("f_stat"),
    )


CATALOG["ml_f_test_two_variances"].fn = _dftest


register(
    "ml_chisq_variance_test",
    # one-sample chi-square variance test of l_quantity against the
    # uniform{1..50} null variance sigma0^2 = (50^2 - 1)/12 = 208.25
    # (an exact rational, fed as the same literal to both engines):
    # chi2 = (n-1)s^2/sigma0^2 with s^2 from exact integer moments —
    # the dispersion companion of the goodness-of-fit tests.
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
             SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                 * CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem
    )
    SELECT n AS n_rows, n - 1 AS df,
           round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / NULLIF(n - 1, 0), 6)
               AS sample_var,
           round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / 208.25, 6) AS chi2
    FROM m
    """,
)


def _dchisqvar(spark, sf_dir):
    """One-sample variance chi-square vs the uniform-null 208.25."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    d19 = "decimal(19,0)"
    m = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(q).cast("long").alias("s"),
        F.sum(q.cast(d19) * q.cast(d19)).alias("q"),
    )
    ss = F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    return m.select(
        F.col("n").alias("n_rows"),
        (F.col("n") - 1).alias("df"),
        F.round(ss / F.nullif(F.col("n") - 1, F.lit(0)), 6).alias("sample_var"),
        F.round(ss / 208.25, 6).alias("chi2"),
    )


CATALOG["ml_chisq_variance_test"].fn = _dchisqvar


