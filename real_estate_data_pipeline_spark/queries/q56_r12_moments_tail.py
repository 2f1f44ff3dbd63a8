"""Split from queries.py lines 38406-40070 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t, tok_arr
from .q10_coverage_misc import _q6
from .q15_curation_r3 import _NB_CTES, _minhash_portable_oracle
from .q19_r7_graph import _DUP_EDGE_CTE, _dup_degrees, _dup_pairs_edges
from .q25_r7_inference import _KM_TAB_CTES, _km_life_table
from .q31_r9_wave2_rank_embed import _KAPPA_J_CTES, _kappa_j
from .q55_r12_readability_order import _POLY_LIST_SQL, _poly_col

register(
    "graph_degree_gini",
    # Gini coefficient of the near-dup graph's degree distribution —
    # the scale-free-ness gauge beside assortativity and rich-club,
    # over the SAME single-sourced degree table: nodes ranked by
    # (degree, node) for determinism, G = (2*sum(rk*deg) - (n+1)*
    # sum(deg)) / (n*sum(deg)) with the rank-weighted mass an exact
    # decimal/HUGEINT sum; the window rides the node-cardinality
    # degree aggregate, never edges.
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    r AS (
      SELECT deg, ROW_NUMBER() OVER (ORDER BY deg, node) AS rk FROM deg
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(deg) AS BIGINT) AS sd,
             CAST(SUM(CAST(rk AS HUGEINT) * deg) AS DOUBLE) AS srd
      FROM r
    )
    SELECT n AS n_nodes, sd AS n_halfedges,
           round((2.0 * srd - (CAST(n AS DOUBLE) + 1) * sd)
                 / NULLIF(CAST(n AS DOUBLE) * sd, 0.0), 6) AS degree_gini
    FROM g
    """,
)


def _ddegreegini(spark, sf_dir):
    """Degree-distribution Gini off the shared dup-graph degree table."""
    _pairs, edges = _dup_pairs_edges(spark, sf_dir)
    deg = _dup_degrees(edges)
    d12 = "decimal(12,0)"
    r = deg.select(
        "deg", F.row_number().over(Window.orderBy("deg", "node")).alias("rk")
    )
    g = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("deg").cast("long").alias("sd"),
        F.sum(F.col("rk").cast(d12) * F.col("deg").cast(d12)).cast("double").alias("srd"),
    )
    nd = F.col("n").cast("double")
    return g.select(
        F.col("n").alias("n_nodes"),
        F.col("sd").alias("n_halfedges"),
        F.round(
            (2.0 * F.col("srd") - (nd + 1) * F.col("sd"))
            / F.nullif(nd * F.col("sd"), F.lit(0.0)),
            6,
        ).alias("degree_gini"),
    )


CATALOG["graph_degree_gini"].fn = _ddegreegini


register(
    "evt_markov_entropy_rate",
    # plug-in entropy rate of the behavioral Markov chain: H(X2|X1) =
    # -(1/N) sum n_ij ln(n_ij/tot_i) over the bounded (src, dst)
    # transition-count frame (same user-partitioned lead as the
    # stationary-distribution query), beside the marginal entropy H(X1)
    # and the predictability share 1 - H(X2|X1)/H(X1) — how much the
    # previous event tells you about the next. Per-cell terms
    # micro-quantized after one 9dp ln, exact integer sums.
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ),
    c AS MATERIALIZED (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    r AS MATERIALIZED (SELECT src, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY src),
    nn AS (SELECT CAST(SUM(tot) AS BIGINT) AS nn FROM r),
    hc AS (
      SELECT CAST(SUM(CAST(floor(-n * round(ln(CAST(n AS DOUBLE) / r.tot), 9)
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h6
      FROM c JOIN r USING (src)
    ),
    hx AS (
      SELECT CAST(SUM(CAST(floor(-tot * round(ln(CAST(tot AS DOUBLE) / nn.nn), 9)
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS h6
      FROM r CROSS JOIN nn
    )
    SELECT nn.nn AS n_transitions,
           round(CAST(hc.h6 AS DOUBLE) / 1000000.0 / nn.nn, 6) AS entropy_rate,
           round(CAST(hx.h6 AS DOUBLE) / 1000000.0 / nn.nn, 6) AS entropy_marginal,
           round(1.0 - (CAST(hc.h6 AS DOUBLE) / 1000000.0 / nn.nn)
                       / NULLIF(CAST(hx.h6 AS DOUBLE) / 1000000.0 / nn.nn, 0.0), 6)
               AS predictability
    FROM hc CROSS JOIN hx CROSS JOIN nn
    """,
)


def _dmarkoventropy(spark, sf_dir):
    """Markov entropy rate off the bounded transition-count frame."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = (
        seq.groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    r = c.groupBy("src").agg(F.sum("n").cast("long").alias("tot")).localCheckpoint(
        eager=False
    )
    nn = r.agg(F.sum("tot").cast("long").alias("nn"))
    hc = (
        c.join(F.broadcast(r), "src")
        .select(
            F.floor(
                -F.col("n") * F.round(F.log(F.col("n").cast("double") / F.col("tot")), 9)
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("t6")
        )
        .agg(F.sum("t6").cast("long").alias("h6"))
    )
    hx = (
        r.crossJoin(F.broadcast(nn))
        .select(
            F.floor(
                -F.col("tot")
                * F.round(F.log(F.col("tot").cast("double") / F.col("nn")), 9)
                * 1000000
                + 0.5
            )
            .cast("long")
            .alias("t6")
        )
        .agg(F.sum("t6").cast("long").alias("h6"))
    )
    hrate = F.col("h6").cast("double") / 1000000.0 / F.col("nn")
    hmarg = F.col("hx6").cast("double") / 1000000.0 / F.col("nn")
    return (
        hc.crossJoin(F.broadcast(hx.withColumnsRenamed({"h6": "hx6"})))
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("nn").alias("n_transitions"),
            F.round(hrate, 6).alias("entropy_rate"),
            F.round(hmarg, 6).alias("entropy_marginal"),
            F.round(1.0 - hrate / F.nullif(hmarg, F.lit(0.0)), 6).alias("predictability"),
        )
    )


CATALOG["evt_markov_entropy_rate"].fn = _dmarkoventropy


# The (quantity, discount, tax) moment frame, single-sourced: the VIF
# and partial-correlation diagnostics (round 12) close over the SAME
# 1-row exact moment aggregate, so the collinearity panel can never
# disagree with itself about the correlation matrix it describes.
_QDT_MOMENTS_SQL = """m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(d) AS BIGINT) AS sd,
             CAST(SUM(tx) AS BIGINT) AS st,
             CAST(SUM(q * q) AS BIGINT) AS sqq, CAST(SUM(d * d) AS BIGINT) AS sdd,
             CAST(SUM(tx * tx) AS BIGINT) AS stt,
             CAST(SUM(q * d) AS BIGINT) AS sqd, CAST(SUM(q * tx) AS BIGINT) AS sqt,
             CAST(SUM(d * tx) AS BIGINT) AS sdt
      FROM (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(round(l_discount * 100) AS BIGINT) AS d,
               CAST(round(l_tax * 100) AS BIGINT) AS tx
        FROM lineitem
      )
    )"""

_CORR_SQL = (
    "((CAST(n AS HUGEINT) * s{xy} - CAST(s{x} AS HUGEINT) * s{y}) / "
    "NULLIF(sqrt((CAST(n AS HUGEINT) * s{xx} - CAST(s{x} AS HUGEINT) * s{x})"
    " * CAST(CAST(n AS HUGEINT) * s{yy} - CAST(s{y} AS HUGEINT) * s{y} AS DOUBLE)),"
    " 0.0))"
)


def _qdt_moments(spark, sf_dir):
    """Spark twin of _QDT_MOMENTS_SQL: the 1-row exact moment frame of
    the three lineitem rate columns."""
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tx"),
    )
    return x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("sq"),
        F.sum("d").cast("long").alias("sd"),
        F.sum("tx").cast("long").alias("st"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
        F.sum(F.col("tx") * F.col("tx")).cast("long").alias("stt"),
        F.sum(F.col("q") * F.col("d")).cast("long").alias("sqd"),
        F.sum(F.col("q") * F.col("tx")).cast("long").alias("sqt"),
        F.sum(F.col("d") * F.col("tx")).cast("long").alias("sdt"),
    )


def _qdt_corr(x, y):
    """Pearson r between two of (q, d, tx) from the exact moment
    columns — the Spark twin of _CORR_SQL (decimal wide-int numerators,
    one NULLIF-guarded division)."""
    d12 = "decimal(12,0)"
    names = {"q": ("sq", "sqq"), "d": ("sd", "sdd"), "tx": ("st", "stt")}
    cross = {
        frozenset(("q", "d")): "sqd",
        frozenset(("q", "tx")): "sqt",
        frozenset(("d", "tx")): "sdt",
    }
    sx, sxx = names[x]
    sy, syy = names[y]
    sxy = cross[frozenset((x, y))]
    n = F.col("n").cast(d12)
    num = (n * F.col(sxy).cast("decimal(18,0)") - F.col(sx).cast(d12) * F.col(sy).cast(d12)).cast(
        "double"
    )
    vx = (n * F.col(sxx).cast("decimal(18,0)") - F.col(sx).cast(d12) * F.col(sx).cast(d12))
    vy = (n * F.col(syy).cast("decimal(18,0)") - F.col(sy).cast(d12) * F.col(sy).cast(d12))
    return num / F.nullif(F.sqrt(vx * vy.cast("double")), F.lit(0.0))


register(
    "ml_vif_collinearity",
    # variance inflation factors of the three lineitem rate columns
    # (quantity, discount cents, tax cents) — the collinearity check
    # run before trusting any multi-predictor regression on them. With
    # two predictors per regression the R^2 has the closed form
    # (r_xy^2 + r_xz^2 - 2 r_xy r_xz r_yz)/(1 - r_yz^2), so all three
    # VIFs come from the 1-row exact moment frame in one expression —
    # no normal equations, no iteration.
    oracle=f"""
    WITH {_QDT_MOMENTS_SQL}
    SELECT n AS n_rows,
           round({_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}, 6) AS r_qd,
           round({_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}, 6) AS r_qt,
           round({_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}, 6) AS r_dt,
           round(1.0 / NULLIF(1.0 - (
             pow({_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}, 2)
             + pow({_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}, 2)
             - 2 * {_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}
                 * {_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}
                 * {_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}
           ) / NULLIF(1.0 - pow({_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}, 2), 0.0), 0.0), 6)
               AS vif_quantity,
           round(1.0 / NULLIF(1.0 - (
             pow({_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}, 2)
             + pow({_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}, 2)
             - 2 * {_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}
                 * {_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}
                 * {_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}
           ) / NULLIF(1.0 - pow({_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}, 2), 0.0), 0.0), 6)
               AS vif_discount,
           round(1.0 / NULLIF(1.0 - (
             pow({_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}, 2)
             + pow({_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}, 2)
             - 2 * {_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}
                 * {_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}
                 * {_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}
           ) / NULLIF(1.0 - pow({_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}, 2), 0.0), 0.0), 6)
               AS vif_tax
    FROM m
    """,
)


def _dvif(spark, sf_dir):
    """Three VIFs from the shared 1-row (q, d, tax) moment frame."""
    m = _qdt_moments(spark, sf_dir)
    r_qd = _qdt_corr("q", "d")
    r_qt = _qdt_corr("q", "tx")
    r_dt = _qdt_corr("d", "tx")

    def _vif(rxy, rxz, ryz):
        r2 = (F.pow(rxy, 2) + F.pow(rxz, 2) - 2 * rxy * rxz * ryz) / F.nullif(
            1.0 - F.pow(ryz, 2), F.lit(0.0)
        )
        return 1.0 / F.nullif(1.0 - r2, F.lit(0.0))

    return m.select(
        F.col("n").alias("n_rows"),
        F.round(r_qd, 6).alias("r_qd"),
        F.round(r_qt, 6).alias("r_qt"),
        F.round(r_dt, 6).alias("r_dt"),
        F.round(_vif(r_qd, r_qt, r_dt), 6).alias("vif_quantity"),
        F.round(_vif(r_qd, r_dt, r_qt), 6).alias("vif_discount"),
        F.round(_vif(r_qt, r_dt, r_qd), 6).alias("vif_tax"),
    )


CATALOG["ml_vif_collinearity"].fn = _dvif


register(
    "ml_partial_correlation_qdt",
    # first-order partial correlations of the same three columns —
    # r_xy.z = (r_xy - r_xz r_yz)/sqrt((1-r_xz^2)(1-r_yz^2)) — off the
    # SAME moment frame as the VIF panel (shared _QDT_MOMENTS_SQL /
    # _qdt_moments / _qdt_corr): does the quantity-discount association
    # survive controlling for tax?
    oracle=f"""
    WITH {_QDT_MOMENTS_SQL}
    SELECT n AS n_rows,
           round(({_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}
                  - {_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}
                    * {_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")})
                 / NULLIF(sqrt((1.0 - pow({_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}, 2))
                               * (1.0 - pow({_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}, 2))), 0.0),
                 6) AS r_qd_given_t,
           round(({_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}
                  - {_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}
                    * {_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")})
                 / NULLIF(sqrt((1.0 - pow({_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}, 2))
                               * (1.0 - pow({_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}, 2))), 0.0),
                 6) AS r_qt_given_d,
           round(({_CORR_SQL.format(xy="dt", x="d", y="t", xx="dd", yy="tt")}
                  - {_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}
                    * {_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")})
                 / NULLIF(sqrt((1.0 - pow({_CORR_SQL.format(xy="qd", x="q", y="d", xx="qq", yy="dd")}, 2))
                               * (1.0 - pow({_CORR_SQL.format(xy="qt", x="q", y="t", xx="qq", yy="tt")}, 2))), 0.0),
                 6) AS r_dt_given_q
    FROM m
    """,
)


def _dpartialcorr(spark, sf_dir):
    """First-order partial correlations off the shared moment frame."""
    m = _qdt_moments(spark, sf_dir)
    r_qd = _qdt_corr("q", "d")
    r_qt = _qdt_corr("q", "tx")
    r_dt = _qdt_corr("d", "tx")

    def _partial(rxy, rxz, ryz):
        return (rxy - rxz * ryz) / F.nullif(
            F.sqrt((1.0 - F.pow(rxz, 2)) * (1.0 - F.pow(ryz, 2))), F.lit(0.0)
        )

    return m.select(
        F.col("n").alias("n_rows"),
        F.round(_partial(r_qd, r_qt, r_dt), 6).alias("r_qd_given_t"),
        F.round(_partial(r_qt, r_qd, r_dt), 6).alias("r_qt_given_d"),
        F.round(_partial(r_dt, r_qd, r_qt), 6).alias("r_dt_given_q"),
    )


CATALOG["ml_partial_correlation_qdt"].fn = _dpartialcorr


register(
    "ml_dixon_q_daily",
    # Dixon's Q for the extreme daily order counts: Q_max = (x(n) -
    # x(n-1))/range and Q_min = (x(2) - x(1))/range, tie-aware — a
    # duplicated extreme makes its gap exactly 0 (the second order
    # STATISTIC equals the extreme), found from the bounded day-count
    # histogram with exact integer compares; one guarded division each.
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    h AS MATERIALIZED (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS f FROM d GROUP BY c
    ),
    g AS (
      SELECT MAX(c) AS mx, MIN(c) AS mn, CAST(SUM(f) AS BIGINT) AS n FROM h
    ),
    x AS (
      SELECT g.mx, g.mn, g.n,
             CASE WHEN (SELECT f FROM h WHERE c = g.mx) > 1 THEN g.mx
                  ELSE (SELECT MAX(c) FROM h WHERE c < g.mx) END AS mx2,
             CASE WHEN (SELECT f FROM h WHERE c = g.mn) > 1 THEN g.mn
                  ELSE (SELECT MIN(c) FROM h WHERE c > g.mn) END AS mn2
      FROM g
    )
    SELECT n AS n_days, mx AS max_count, mn AS min_count,
           round(CAST(mx - mx2 AS DOUBLE) / NULLIF(mx - mn, 0), 6) AS dixon_q_max,
           round(CAST(mn2 - mn AS DOUBLE) / NULLIF(mx - mn, 0), 6) AS dixon_q_min
    FROM x
    """,
)


def _ddixonq(spark, sf_dir):
    """Tie-aware Dixon's Q for both daily-count extremes."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    h = (
        d.groupBy("c")
        .agg(F.count("*").cast("long").alias("f"))
        .localCheckpoint(eager=False)
    )
    g = h.agg(
        F.max("c").alias("mx"), F.min("c").alias("mn"), F.sum("f").cast("long").alias("n")
    ).localCheckpoint(eager=False)
    fmx = h.join(F.broadcast(g), F.col("c") == F.col("mx")).select(
        F.col("f").alias("f_mx")
    )
    fmn = h.join(F.broadcast(g), F.col("c") == F.col("mn")).select(
        F.col("f").alias("f_mn")
    )
    mx2 = (
        h.crossJoin(F.broadcast(g))
        .filter(F.col("c") < F.col("mx"))
        .agg(F.max("c").alias("mx2_lt"))
    )
    mn2 = (
        h.crossJoin(F.broadcast(g))
        .filter(F.col("c") > F.col("mn"))
        .agg(F.min("c").alias("mn2_gt"))
    )
    x = (
        g.crossJoin(F.broadcast(fmx))
        .crossJoin(F.broadcast(fmn))
        .crossJoin(F.broadcast(mx2))
        .crossJoin(F.broadcast(mn2))
        .select(
            "n",
            "mx",
            "mn",
            F.when(F.col("f_mx") > 1, F.col("mx")).otherwise(F.col("mx2_lt")).alias("mx2"),
            F.when(F.col("f_mn") > 1, F.col("mn")).otherwise(F.col("mn2_gt")).alias("mn2"),
        )
    )
    rng = F.nullif((F.col("mx") - F.col("mn")).cast("double"), F.lit(0.0))
    return x.select(
        F.col("n").alias("n_days"),
        F.col("mx").alias("max_count"),
        F.col("mn").alias("min_count"),
        F.round((F.col("mx") - F.col("mx2")).cast("double") / rng, 6).alias("dixon_q_max"),
        F.round((F.col("mn2") - F.col("mn")).cast("double") / rng, 6).alias("dixon_q_min"),
    )


CATALOG["ml_dixon_q_daily"].fn = _ddixonq


register(
    "ml_cohens_h_segments",
    # Cohen's h effect size between two segments' urgent-order shares:
    # h = 2*asin(sqrt(p1)) - 2*asin(sqrt(p2)) — the arcsine-stabilized
    # difference whose detectability does not depend on where p sits.
    # Shares are exact rationals from one conditional aggregate; each
    # asin(sqrt(p)) is quantized at 9 dp before the one subtraction.
    oracle="""
    WITH x AS (
      SELECT c.c_mktsegment AS seg,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    m AS (
      SELECT CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN seg = 'BUILDING' THEN y ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN y ELSE 0 END) AS BIGINT) AS s2
      FROM x
    )
    SELECT n1 AS n_building, n2 AS n_machinery,
           round(CAST(s1 AS DOUBLE) / n1, 6) AS p_building,
           round(CAST(s2 AS DOUBLE) / n2, 6) AS p_machinery,
           round(2.0 * round(asin(sqrt(CAST(s1 AS DOUBLE) / n1)), 9)
                 - 2.0 * round(asin(sqrt(CAST(s2 AS DOUBLE) / n2)), 9), 6) AS cohens_h
    FROM m
    """,
)


def _dcohensh(spark, sf_dir):
    """Cohen's h between two segments' urgent shares."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    x = o.join(
        F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")),
        "o_custkey",
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
    )
    m = x.agg(
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("seg") == "BUILDING", F.col("y")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("seg") == "MACHINERY", 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("seg") == "MACHINERY", F.col("y")).otherwise(0))
        .cast("long")
        .alias("s2"),
    )
    p1 = F.col("s1").cast("double") / F.col("n1")
    p2 = F.col("s2").cast("double") / F.col("n2")
    return m.select(
        F.col("n1").alias("n_building"),
        F.col("n2").alias("n_machinery"),
        F.round(p1, 6).alias("p_building"),
        F.round(p2, 6).alias("p_machinery"),
        F.round(
            2.0 * F.round(F.asin(F.sqrt(p1)), 9) - 2.0 * F.round(F.asin(F.sqrt(p2)), 9),
            6,
        ).alias("cohens_h"),
    )


CATALOG["ml_cohens_h_segments"].fn = _dcohensh


register(
    "ml_tost_equivalence",
    # TOST equivalence test: are the returned and delivered mean
    # quantities equivalent within +-0.5 units? Two one-sided Welch z
    # statistics off the SAME conditional-moment shape as the F/Welch
    # family — equivalence claimed iff BOTH z_lower > 1.645 and
    # z_upper < -1.645 (the 5% TOST bounds, rational literals shared
    # by both engines). Exact integer moments, guarded divisions.
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
    ),
    d AS (
      SELECT nr, nn,
             CAST(sr AS DOUBLE) / nr - CAST(sn AS DOUBLE) / nn AS diff,
             sqrt(((CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / nr)
                   / NULLIF(nr - 1, 0)) / nr
                  + ((CAST(qn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / nn)
                     / NULLIF(nn - 1, 0)) / nn) AS se
      FROM m
    )
    SELECT nr AS n_r, nn AS n_n,
           round(diff, 6) AS mean_diff,
           round(se, 6) AS welch_se,
           round((diff + 0.5) / NULLIF(se, 0.0), 6) AS z_lower,
           round((diff - 0.5) / NULLIF(se, 0.0), 6) AS z_upper,
           CAST(CASE WHEN (diff + 0.5) / NULLIF(se, 0.0) > 1.645
                      AND (diff - 0.5) / NULLIF(se, 0.0) < -1.645
                     THEN 1 ELSE 0 END AS BIGINT) AS equivalent
    FROM d
    """,
)


def _dtost(spark, sf_dir):
    """TOST equivalence off one conditional-moment pass."""
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
    diff = F.col("sr").cast("double") / F.col("nr") - F.col("sn").cast("double") / F.col("nn")
    var_r = (
        F.col("qr").cast("double") - F.col("sr").cast("double") * F.col("sr") / F.col("nr")
    ) / F.nullif(F.col("nr") - 1, F.lit(0))
    var_n = (
        F.col("qn").cast("double") - F.col("sn").cast("double") * F.col("sn") / F.col("nn")
    ) / F.nullif(F.col("nn") - 1, F.lit(0))
    se = F.sqrt(var_r / F.col("nr") + var_n / F.col("nn"))
    zl = (diff + 0.5) / F.nullif(se, F.lit(0.0))
    zu = (diff - 0.5) / F.nullif(se, F.lit(0.0))
    return m.select(
        F.col("nr").alias("n_r"),
        F.col("nn").alias("n_n"),
        F.round(diff, 6).alias("mean_diff"),
        F.round(se, 6).alias("welch_se"),
        F.round(zl, 6).alias("z_lower"),
        F.round(zu, 6).alias("z_upper"),
        F.when((zl > 1.645) & (zu < -1.645), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("equivalent"),
    )


CATALOG["ml_tost_equivalence"].fn = _dtost


register(
    "ml_bowker_symmetry_lang",
    # Bowker's test of symmetry on the NB-vs-heuristic confusion matrix
    # (the k x k generalization of McNemar, over the SAME shared
    # _kappa_j verdict frame): chi2 = sum over unordered off-diagonal
    # pairs of (n_ij - n_ji)^2/(n_ij + n_ji) — do the two raters
    # disagree SYMMETRICALLY, or does one systematically relabel
    # specific languages as others? Exact integer cells, per-pair
    # terms micro-quantized, df = number of contributing pairs.
    oracle=f"""
    WITH {_NB_CTES},
    {_KAPPA_J_CTES},
    cf AS MATERIALIZED (
      SELECT nb_pred AS i, heur_pred AS j, CAST(COUNT(*) AS BIGINT) AS n
      FROM j WHERE nb_pred <> heur_pred GROUP BY 1, 2
    ),
    pairs AS (
      SELECT COALESCE(a.n, 0) AS nij, COALESCE(b.n, 0) AS nji
      FROM cf a FULL OUTER JOIN cf b ON a.i = b.j AND a.j = b.i
      WHERE COALESCE(a.i, b.j) < COALESCE(a.j, b.i)
    ),
    s AS (
      SELECT CAST(SUM(CAST(floor(pow(CAST(nij - nji AS DOUBLE), 2)
                                 / NULLIF(nij + nji, 0) * 1000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS t6,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM pairs
    )
    SELECT df, round(CAST(t6 AS DOUBLE) / 1000000.0, 6) AS bowker_chi2
    FROM s
    """,
)


def _dbowker(spark, sf_dir):
    """Bowker symmetry chi-square off the shared verdict frame."""
    j = _kappa_j(spark, sf_dir)
    cf = (
        j.filter(F.col("nb_pred") != F.col("heur_pred"))
        .groupBy(F.col("nb_pred").alias("i"), F.col("heur_pred").alias("j"))
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    a = cf.select(F.col("i").alias("ai"), F.col("j").alias("aj"), F.col("n").alias("an"))
    b = cf.select(F.col("j").alias("ai"), F.col("i").alias("aj"), F.col("n").alias("bn"))
    pairs = (
        a.join(b, ["ai", "aj"], "full")
        .filter(F.col("ai") < F.col("aj"))
        .select(
            F.coalesce(F.col("an"), F.lit(0)).alias("nij"),
            F.coalesce(F.col("bn"), F.lit(0)).alias("nji"),
        )
    )
    term = F.pow((F.col("nij") - F.col("nji")).cast("double"), 2) / F.nullif(
        (F.col("nij") + F.col("nji")).cast("double"), F.lit(0.0)
    )
    s = pairs.agg(
        F.sum(F.floor(term * 1000000 + 0.5).cast("long")).cast("long").alias("t6"),
        F.count("*").cast("long").alias("df"),
    )
    return s.select("df", F.round(F.col("t6") / 1000000.0, 6).alias("bowker_chi2"))


CATALOG["ml_bowker_symmetry_lang"].fn = _dbowker


register(
    "doc_gunning_fog_by_source",
    # Gunning fog index per source: 0.4 * (words/sentences +
    # 100 * complex/words) with complex words = the SAME >=3-vowel-run
    # polysyllable proxy as SMOG (_POLY_LIST_SQL / _poly_col) —
    # completing the five-index readability panel (ARI, Coleman-Liau,
    # Flesch-Kincaid, SMOG, FOG) on shared single-sourced masses.
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
             CAST(list_sum({_POLY_LIST_SQL}) AS BIGINT) AS n_poly,
             sents
      FROM d
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_poly) AS BIGINT) AS n_complex,
           CAST(SUM(sents) AS BIGINT) AS n_sentences,
           round(0.4 * (CAST(SUM(n_words) AS DOUBLE) / SUM(sents)
                        + 100.0 * SUM(n_poly) / SUM(n_words)), 6) AS gunning_fog
    FROM m GROUP BY source ORDER BY source
    """,
)


def _dgunningfog(spark, sf_dir):
    """Gunning fog per source off the shared polysyllable proxy."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = tok_arr(F.col("text"))
    m = d.select(
        "source",
        F.size(toks).cast("long").alias("n_words"),
        _poly_col(toks).alias("n_poly"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long"), F.lit(1)
        ).alias("sents"),
    )
    return (
        m.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_poly").cast("long").alias("n_complex"),
            F.sum("sents").cast("long").alias("n_sentences"),
            F.round(
                0.4
                * (
                    F.sum("n_words").cast("double") / F.sum("sents")
                    + 100.0 * F.sum("n_poly") / F.sum("n_words")
                ),
                6,
            ).alias("gunning_fog"),
        )
        .orderBy("source")
    )


CATALOG["doc_gunning_fog_by_source"].fn = _dgunningfog


register(
    "cust_zipf_rank_size_orders",
    # rank-size (Zipf) slope of customer activity: OLS of ln(order
    # count) on ln(rank) over the ranked per-customer frame — does
    # customer concentration follow a power law, and how steep? Both
    # logs quantized at 9 dp per row, every OLS moment micro-quantized
    # to an exact integer BEFORE the cross-row sums (float association
    # can't differ), slope/intercept/r^2 closed-form. The
    # customer-domain sibling of the token Zipf fit.
    oracle="""
    WITH y AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT round(ln(ROW_NUMBER() OVER (ORDER BY cnt DESC, cnt)), 9) AS x,
             round(ln(CAST(cnt AS DOUBLE)), 9) AS yv
      FROM y
    ),
    q AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sx6,
             CAST(SUM(CAST(floor(yv * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sy6,
             CAST(SUM(CAST(floor(x * yv * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sxy6,
             CAST(SUM(CAST(floor(x * x * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sxx6,
             CAST(SUM(CAST(floor(yv * yv * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS syy6
      FROM r
    )
    SELECT n AS n_customers,
           round((CAST(n AS DOUBLE) * sxy6 - CAST(sx6 AS DOUBLE) * sy6 / 1000000.0)
                 / NULLIF(CAST(n AS DOUBLE) * sxx6
                          - CAST(sx6 AS DOUBLE) * sx6 / 1000000.0, 0.0), 6)
               AS zipf_slope,
           round((CAST(sy6 AS DOUBLE) / n
                  - (CAST(n AS DOUBLE) * sxy6 - CAST(sx6 AS DOUBLE) * sy6 / 1000000.0)
                    / NULLIF(CAST(n AS DOUBLE) * sxx6
                             - CAST(sx6 AS DOUBLE) * sx6 / 1000000.0, 0.0)
                    * sx6 / n) / 1000000.0, 6) AS zipf_intercept,
           round(pow(CAST(n AS DOUBLE) * sxy6 - CAST(sx6 AS DOUBLE) * sy6 / 1000000.0, 2)
                 / NULLIF((CAST(n AS DOUBLE) * sxx6
                           - CAST(sx6 AS DOUBLE) * sx6 / 1000000.0)
                          * (CAST(n AS DOUBLE) * syy6
                             - CAST(sy6 AS DOUBLE) * sy6 / 1000000.0), 0.0), 6) AS r2
    FROM q
    """,
)


def _dzipfcust(spark, sf_dir):
    """Customer rank-size Zipf OLS off micro-quantized log moments."""
    o = t(spark, sf_dir, "orders")
    y = o.groupBy("o_custkey").agg(F.count("*").cast("long").alias("cnt"))
    r = y.select(
        F.round(F.log(F.row_number().over(Window.orderBy(F.desc("cnt"), F.col("cnt"))).cast("double")), 9).alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 9).alias("yv"),
    )

    def _q6(c):
        return F.sum(F.floor(c * 1000000 + 0.5).cast("long")).cast("long")

    q = r.agg(
        F.count("*").cast("long").alias("n"),
        _q6(F.col("x")).alias("sx6"),
        _q6(F.col("yv")).alias("sy6"),
        _q6(F.col("x") * F.col("yv")).alias("sxy6"),
        _q6(F.col("x") * F.col("x")).alias("sxx6"),
        _q6(F.col("yv") * F.col("yv")).alias("syy6"),
    )
    nd = F.col("n").cast("double")
    sxy = nd * F.col("sxy6") - F.col("sx6").cast("double") * F.col("sy6") / 1000000.0
    sxx = nd * F.col("sxx6") - F.col("sx6").cast("double") * F.col("sx6") / 1000000.0
    syy = nd * F.col("syy6") - F.col("sy6").cast("double") * F.col("sy6") / 1000000.0
    slope = sxy / F.nullif(sxx, F.lit(0.0))
    return q.select(
        F.col("n").alias("n_customers"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy6").cast("double") / F.col("n") - slope * F.col("sx6") / F.col("n"))
            / 1000000.0,
            6,
        ).alias("zipf_intercept"),
        F.round(F.pow(sxy, 2) / F.nullif(sxx * syy, F.lit(0.0)), 6).alias("r2"),
    )


CATALOG["cust_zipf_rank_size_orders"].fn = _dzipfcust


register(
    "orders_priority_transition_matrix",
    # per-customer order-priority transition matrix: for consecutive
    # orders of the same customer (date then key order, the engine-
    # neutral tiebreak), count prev -> next priority moves and each
    # row's share — do urgent customers stay urgent? A <=25-cell frame
    # off one user-partitioned lag, exact integer counts, one guarded
    # division per cell.
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS p,
             LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ),
    c AS MATERIALIZED (
      SELECT prev AS prev_priority, p AS next_priority,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT prev_priority, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
    SELECT c.prev_priority, c.next_priority, c.n,
           round(CAST(c.n AS DOUBLE) / NULLIF(r.tot, 0), 6) AS row_share
    FROM c JOIN r USING (prev_priority)
    ORDER BY c.prev_priority, c.next_priority
    """,
)


def _dprioritytrans(spark, sf_dir):
    """Priority transition matrix off one user-partitioned lag."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    s = o.select(
        F.col("o_orderpriority").alias("p"),
        F.lag("o_orderpriority").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    c = (
        s.groupBy(
            F.col("prev").alias("prev_priority"), F.col("p").alias("next_priority")
        )
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    r = c.groupBy("prev_priority").agg(F.sum("n").cast("long").alias("tot"))
    return (
        c.join(F.broadcast(r), "prev_priority")
        .select(
            "prev_priority",
            "next_priority",
            "n",
            F.round(
                F.col("n").cast("double") / F.nullif(F.col("tot"), F.lit(0)), 6
            ).alias("row_share"),
        )
        .orderBy("prev_priority", "next_priority")
    )


CATALOG["orders_priority_transition_matrix"].fn = _dprioritytrans


register(
    "part_xyz_classification",
    # XYZ demand-variability classification (the inventory-planning
    # companion of ABC): per part, the CV of monthly demand over its
    # ACTIVE months (documented convention; zero-filling the calendar
    # would need the month grid), classes X < 0.5 <= Y < 1.0 <= Z,
    # single-active-month parts honestly 'S' (CV undefined). Monthly
    # sums and CV moments are exact integers; the class cut compares
    # identical doubles on both engines.
    oracle="""
    WITH pm AS (
      SELECT l_partkey AS pk,
             (year(l_shipdate) - 1995) * 12 + month(l_shipdate) - 1 AS m,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    pv AS MATERIALIZED (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS mm,
             CAST(SUM(qty) AS BIGINT) AS s,
             SUM(CAST(qty AS HUGEINT) * qty) AS q
      FROM pm GROUP BY pk
    ),
    cl AS (
      SELECT CASE
               WHEN mm < 2 THEN 'S'
               WHEN sqrt(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / mm) / (mm - 1)))
                    / (CAST(s AS DOUBLE) / mm) < 0.5 THEN 'X'
               WHEN sqrt(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / mm) / (mm - 1)))
                    / (CAST(s AS DOUBLE) / mm) < 1.0 THEN 'Y'
               ELSE 'Z' END AS xyz_class,
             s
      FROM pv
    ),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS np, CAST(SUM(s) AS BIGINT) AS sq FROM cl)
    SELECT xyz_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(CAST(COUNT(*) AS DOUBLE) / g.np, 6) AS part_share,
           round(CAST(SUM(s) AS DOUBLE) / g.sq, 6) AS quantity_share
    FROM cl CROSS JOIN g
    GROUP BY xyz_class, g.np, g.sq
    ORDER BY xyz_class
    """,
)


def _dxyzclass(spark, sf_dir):
    """XYZ variability classes off per-part monthly demand moments."""
    li = t(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        F.col("l_partkey").alias("pk"),
        ((F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate") - 1).alias("m"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    d19 = "decimal(19,0)"
    pv = (
        pm.groupBy("pk")
        .agg(
            F.count("*").cast("long").alias("mm"),
            F.sum("qty").cast("long").alias("s"),
            F.sum(F.col("qty").cast(d19) * F.col("qty").cast(d19)).alias("q"),
        )
        .localCheckpoint(eager=False)
    )
    cv = F.sqrt(
        (F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("mm"))
        / F.nullif(F.col("mm") - 1, F.lit(0))
    ) / (F.col("s").cast("double") / F.col("mm"))
    cl = pv.select(
        F.when(F.col("mm") < 2, "S")
        .when(cv < 0.5, "X")
        .when(cv < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        "s",
    ).localCheckpoint(eager=False)
    g = cl.agg(
        F.count("*").cast("long").alias("np"), F.sum("s").cast("long").alias("sq")
    )
    return (
        cl.crossJoin(F.broadcast(g))
        .groupBy("xyz_class", "np", "sq")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.round(F.count("*").cast("double") / F.first("np"), 6).alias("part_share"),
            F.round(F.sum("s").cast("double") / F.first("sq"), 6).alias(
                "quantity_share"
            ),
        )
        .select("xyz_class", "n_parts", "part_share", "quantity_share")
        .orderBy("xyz_class")
    )


CATALOG["part_xyz_classification"].fn = _dxyzclass


register(
    "dq_benford_second_digit",
    # Benford's SECOND-digit law on order totals (the forensic
    # follow-up to the first-digit screen — fabricators who know the
    # first-digit law rarely fake the second): expected P(d) =
    # sum over k=1..9 of log10(1 + 1/(10k + d)), the ten constants
    # generated ONCE in Python at 9 dp and shared verbatim; the
    # second digit is an integer-string slice of the exact cent value;
    # per-digit chi-square terms micro-quantized before the sum.
    oracle=None,  # set below — embeds the generated expected-share CASE
)


def _benford2_case_sql() -> str:
    import math as _m

    arms = " ".join(
        f"WHEN {d} THEN {round(sum(_m.log10(1.0 + 1.0 / (10 * k + d)) for k in range(1, 10)), 9)!r}"
        for d in range(10)
    )
    return f"CASE d2 {arms} END"


_BENFORD2_SQL = f"""
    WITH x AS (
      SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS VARCHAR), 2, 1) AS BIGINT) AS d2
      FROM orders
      WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) >= 10
    ),
    h AS MATERIALIZED (
      SELECT d2, CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY d2
    ),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM h)
    SELECT h.d2 AS second_digit, h.n,
           round(CAST(h.n AS DOUBLE) / g.tot, 6) AS observed_share,
           round(({_benford2_case_sql()}), 6) AS expected_share,
           round(CAST(h.n AS DOUBLE) / g.tot - ({_benford2_case_sql()}), 6) AS deviation
    FROM h CROSS JOIN g
    ORDER BY h.d2
    """

CATALOG["dq_benford_second_digit"].oracle = _BENFORD2_SQL


def _dbenford2(spark, sf_dir):
    """Second-digit Benford screen; the expected-share CASE parses
    verbatim via F.expr."""
    o = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast(DEC) * 100).cast("long")
    x = o.filter(cents >= 10).select(
        F.substring(cents.cast("string"), 2, 1).cast("long").alias("d2")
    )
    h = x.groupBy("d2").agg(F.count("*").cast("long").alias("n")).localCheckpoint(
        eager=False
    )
    g = h.agg(F.sum("n").cast("long").alias("tot"))
    exp_share = F.expr(_benford2_case_sql()).cast("double")
    return (
        h.crossJoin(F.broadcast(g))
        .select(
            F.col("d2").alias("second_digit"),
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("observed_share"),
            F.round(exp_share, 6).alias("expected_share"),
            F.round(F.col("n").cast("double") / F.col("tot") - exp_share, 6).alias(
                "deviation"
            ),
        )
        .orderBy("second_digit")
    )


CATALOG["dq_benford_second_digit"].fn = _dbenford2


register(
    "ml_ks_uniformity_dates",
    # one-sample Kolmogorov-Smirnov test of order arrival dates against
    # uniform over the observed span: D = max over days of
    # max(|cum/n - F0(hi)|, |cumprev/n - F0(lo)|) with F0 the uniform
    # CDF evaluated at both step edges (the two-sided step-function
    # supremum), everything off the calendar-day histogram — per-day
    # deviations quantized at 9 dp (sqrt(n) amplifies D's quantization
    # into ks_stat — the Bartlett-amplification lesson, caught by the
    # in-wave numpy cross-check at 6 dp), the max an integer compare.
    oracle="""
    WITH d AS (
      SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                  AS BIGINT) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT CAST(MIN(day) AS BIGINT) AS lo, CAST(MAX(day) AS BIGINT) AS hi,
             CAST(SUM(c) AS BIGINT) AS n
      FROM d
    ),
    cw AS (
      SELECT day, c, SUM(c) OVER (ORDER BY day) AS cum FROM d
    ),
    dev AS (
      SELECT CAST(MAX(GREATEST(
               CAST(floor(abs(CAST(cum AS DOUBLE) / g.n
                              - CAST(day - g.lo + 1 AS DOUBLE) / (g.hi - g.lo + 1))
                          * 1000000000 + 0.5) AS BIGINT),
               CAST(floor(abs(CAST(cum - c AS DOUBLE) / g.n
                              - CAST(day - g.lo AS DOUBLE) / (g.hi - g.lo + 1))
                          * 1000000000 + 0.5) AS BIGINT))) AS BIGINT) AS d9
      FROM cw CROSS JOIN g
    )
    SELECT g.n AS n_orders, g.hi - g.lo + 1 AS span_days,
           round(CAST(dev.d9 AS DOUBLE) / 1000000000.0, 6) AS ks_d,
           round(CAST(dev.d9 AS DOUBLE) / 1000000000.0 * sqrt(CAST(g.n AS DOUBLE)), 6)
               AS ks_stat
    FROM g CROSS JOIN dev
    """,
)


def _dksuniform(spark, sf_dir):
    """One-sample KS against date uniformity off the day histogram."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    g = d.agg(
        F.min("day").cast("long").alias("lo"),
        F.max("day").cast("long").alias("hi"),
        F.sum("c").cast("long").alias("n"),
    )
    cw = d.withColumn("cum", F.sum("c").over(Window.orderBy("day")))
    span = (F.col("hi") - F.col("lo") + 1).cast("double")
    up = F.abs(
        F.col("cum").cast("double") / F.col("n")
        - (F.col("day") - F.col("lo") + 1).cast("double") / span
    )
    lo_dev = F.abs(
        (F.col("cum") - F.col("c")).cast("double") / F.col("n")
        - (F.col("day") - F.col("lo")).cast("double") / span
    )
    dev = cw.crossJoin(F.broadcast(g)).agg(
        F.max(
            F.greatest(
                F.floor(up * 1000000000 + 0.5).cast("long"),
                F.floor(lo_dev * 1000000000 + 0.5).cast("long"),
            )
        )
        .cast("long")
        .alias("d9")
    )
    return g.crossJoin(F.broadcast(dev)).select(
        F.col("n").alias("n_orders"),
        (F.col("hi") - F.col("lo") + 1).alias("span_days"),
        F.round(F.col("d9") / 1000000000.0, 6).alias("ks_d"),
        F.round(
            F.col("d9") / 1000000000.0 * F.sqrt(F.col("n").cast("double")), 6
        ).alias("ks_stat"),
    )


CATALOG["ml_ks_uniformity_dates"].fn = _dksuniform


register(
    "evt_type_cooccurrence_lift",
    # behavioral market-basket: for each event-type pair, the lift of
    # co-occurring in the SAME user's history vs independence —
    # P(a,b)/(P(a)P(b)) over user sets. One distinct (user, type)
    # frame, a bounded <=k^2 pair join on the user key, exact integer
    # supports, ordered pair output. The events-domain sibling of
    # basket_brand_pair_lift.
    oracle="""
    WITH ut AS MATERIALIZED (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM ut),
    s AS MATERIALIZED (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS supp FROM ut GROUP BY 1
    ),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS both_
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.both_ AS n_both,
           sa.supp AS n_a, sb.supp AS n_b,
           round(CAST(p.both_ AS DOUBLE) / nu.n, 6) AS support_both,
           round(CAST(p.both_ AS DOUBLE) * nu.n
                 / (CAST(sa.supp AS DOUBLE) * sb.supp), 6) AS lift
    FROM p
    JOIN s sa ON p.type_a = sa.event_type
    JOIN s sb ON p.type_b = sb.event_type
    CROSS JOIN nu
    ORDER BY p.type_a, p.type_b
    """,
)


def _dtypelift(spark, sf_dir):
    """Event-type co-occurrence lift off the distinct (user, type)
    frame — the pair join is user-keyed, never a type cross product."""
    ev = t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct().localCheckpoint(eager=False)
    nu = ut.agg(F.countDistinct("user_id").cast("long").alias("n"))
    s = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("supp"))
    a, b = ut.alias("a"), ut.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    sa = F.broadcast(s.withColumnsRenamed({"event_type": "type_a", "supp": "n_a"}))
    sb = F.broadcast(s.withColumnsRenamed({"event_type": "type_b", "supp": "n_b"}))
    return (
        p.join(sa, "type_a")
        .join(sb, "type_b")
        .crossJoin(F.broadcast(nu))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(F.col("n_both").cast("double") / F.col("n"), 6).alias(
                "support_both"
            ),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


CATALOG["evt_type_cooccurrence_lift"].fn = _dtypelift


register(
    "part_brand_share_drift",
    # market-share stability per brand: yearly quantity share off the
    # bounded (brand, year) cell frame, the max year-over-year share
    # swing via a lag over that frame (partitioned by brand — never
    # raw rows), and the mean share. The drift ranking behind 'which
    # brands are gaining/losing'. Shares micro-quantized to exact
    # integers per cell BEFORE the lag and the mean, so no cross-row
    # float accumulation anywhere.
    oracle="""
    WITH by_ AS (
      SELECT p.p_brand AS brand, year(l.l_shipdate) AS yr,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    yt AS (SELECT yr, CAST(SUM(qty) AS BIGINT) AS tot FROM by_ GROUP BY yr),
    sh AS (
      SELECT by_.brand, by_.yr,
             CAST(floor(CAST(by_.qty AS DOUBLE) / yt.tot * 1000000 + 0.5)
                  AS BIGINT) AS share6
      FROM by_ JOIN yt USING (yr)
    ),
    l AS (
      SELECT brand, share6,
             share6 - LAG(share6) OVER (PARTITION BY brand ORDER BY yr) AS chg6
      FROM sh
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_years,
           round(CAST(SUM(share6) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS mean_share,
           round(CAST(MAX(ABS(chg6)) AS DOUBLE) / 1000000.0, 6) AS max_share_swing
    FROM l GROUP BY brand ORDER BY brand
    """,
)


def _dbrandshift(spark, sf_dir):
    """Brand share drift off the bounded (brand, year) cell frame."""
    li = t(spark, sf_dir, "lineitem")
    pt = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    by = (
        li.join(F.broadcast(pt), "l_partkey")
        .groupBy("brand", F.year("l_shipdate").alias("yr"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
        .localCheckpoint(eager=False)
    )
    yt = by.groupBy("yr").agg(F.sum("qty").cast("long").alias("tot"))
    sh = by.join(F.broadcast(yt), "yr").select(
        "brand",
        "yr",
        F.floor(F.col("qty").cast("double") / F.col("tot") * 1000000 + 0.5)
        .cast("long")
        .alias("share6"),
    )
    l = sh.select(
        "brand",
        "share6",
        (
            F.col("share6")
            - F.lag("share6").over(Window.partitionBy("brand").orderBy("yr"))
        ).alias("chg6"),
    )
    return (
        l.groupBy("brand")
        .agg(
            F.count("*").cast("long").alias("n_years"),
            F.round(
                F.sum("share6").cast("double") / F.count("*") / 1000000.0, 6
            ).alias("mean_share"),
            F.round(F.max(F.abs(F.col("chg6"))).cast("double") / 1000000.0, 6).alias(
                "max_share_swing"
            ),
        )
        .orderBy("brand")
    )


CATALOG["part_brand_share_drift"].fn = _dbrandshift


register(
    "ml_pythagorean_means",
    # the three Pythagorean means of l_quantity (arithmetic >=
    # geometric >= harmonic, with equality only for constant data) —
    # the AM/GM gap is a classic dispersion gauge. All three ride the
    # 50-value histogram: the arithmetic mean is exact integers, the
    # geometric mean's ln and the harmonic mean's 1/q are quantized at
    # 9 dp PER VALUE and weighted by exact counts, so no per-row float
    # accumulation exists anywhere.
    oracle="""
    WITH h AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem WHERE l_quantity >= 1 GROUP BY 1
    ),
    m AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(q * c) AS BIGINT) AS s,
             CAST(SUM(c * CAST(round(ln(CAST(q AS DOUBLE)) * 1000000000) AS BIGINT))
                 AS BIGINT) AS ln9,
             CAST(SUM(c * CAST(round(1.0 / q * 1000000000) AS BIGINT)) AS BIGINT)
                 AS inv9
      FROM h
    )
    SELECT n AS n_rows,
           round(CAST(s AS DOUBLE) / n, 6) AS arithmetic_mean,
           round(exp(CAST(ln9 AS DOUBLE) / n / 1000000000.0), 6) AS geometric_mean,
           round(CAST(n AS DOUBLE) / (CAST(inv9 AS DOUBLE) / 1000000000.0), 6)
               AS harmonic_mean
    FROM m
    """,
)


def _dpythmeans(spark, sf_dir):
    """AM/GM/HM off the 50-value histogram with 9dp per-value terms."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 1)
    h = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count("*").cast("long").alias("c")
    )
    ln9 = F.round(F.log(F.col("q").cast("double")) * 1000000000).cast("long")
    inv9 = F.round(1.0 / F.col("q") * 1000000000).cast("long")
    m = h.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("q") * F.col("c")).cast("long").alias("s"),
        F.sum(F.col("c") * ln9).cast("long").alias("ln9"),
        F.sum(F.col("c") * inv9).cast("long").alias("inv9"),
    )
    return m.select(
        F.col("n").alias("n_rows"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("arithmetic_mean"),
        F.round(
            F.exp(F.col("ln9").cast("double") / F.col("n") / 1000000000.0), 6
        ).alias("geometric_mean"),
        F.round(
            F.col("n").cast("double") / (F.col("inv9").cast("double") / 1000000000.0), 6
        ).alias("harmonic_mean"),
    )


CATALOG["ml_pythagorean_means"].fn = _dpythmeans


register(
    "evt_peak_hour_mode",
    # peak-hour stability: each day's busiest hour (deterministic
    # earliest-hour tie-break via min_by on (count DESC, hour ASC)
    # encoded as one integer key), then the modal peak hour and its
    # share of days — does the daily rhythm have a reliable rush hour?
    # Exact integer counts off the bounded (day, hour) frame.
    oracle="""
    WITH dh AS (
      SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    pk AS MATERIALIZED (
      SELECT day, MIN_BY(hr, -(c * 100 - hr)) AS peak_hr
      FROM dh GROUP BY day
    ),
    md AS (
      SELECT peak_hr, CAST(COUNT(*) AS BIGINT) AS days FROM pk GROUP BY peak_hr
    ),
    g AS (SELECT CAST(SUM(days) AS BIGINT) AS n FROM md),
    top_ AS (SELECT MIN_BY(peak_hr, -(days * 100 - peak_hr)) AS modal_hr FROM md)
    SELECT g.n AS n_days, top_.modal_hr,
           (SELECT days FROM md WHERE peak_hr = top_.modal_hr) AS n_modal_days,
           round(CAST((SELECT days FROM md WHERE peak_hr = top_.modal_hr) AS DOUBLE)
                 / g.n, 6) AS modal_share
    FROM g CROSS JOIN top_
    """,
)


def _dpeakhourmode(spark, sf_dir):
    """Modal daily peak hour off the bounded (day, hour) frame."""
    ev = t(spark, sf_dir, "events")
    dh = ev.groupBy(
        F.col("ts").cast("date").alias("day"), F.hour("ts").cast("long").alias("hr")
    ).agg(F.count("*").cast("long").alias("c"))
    pk = (
        dh.groupBy("day")
        .agg(F.min_by("hr", -(F.col("c") * 100 - F.col("hr"))).alias("peak_hr"))
        .localCheckpoint(eager=False)
    )
    md = pk.groupBy("peak_hr").agg(F.count("*").cast("long").alias("days")).localCheckpoint(
        eager=False
    )
    g = md.agg(F.sum("days").cast("long").alias("n"))
    top = md.agg(
        F.min_by("peak_hr", -(F.col("days") * 100 - F.col("peak_hr"))).alias("modal_hr")
    )
    nm = (
        md.crossJoin(F.broadcast(top))
        .filter(F.col("peak_hr") == F.col("modal_hr"))
        .agg(F.sum("days").cast("long").alias("n_modal_days"))
    )
    return (
        g.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(nm))
        .select(
            F.col("n").alias("n_days"),
            "modal_hr",
            "n_modal_days",
            F.round(F.col("n_modal_days").cast("double") / F.col("n"), 6).alias(
                "modal_share"
            ),
        )
    )


CATALOG["evt_peak_hour_mode"].fn = _dpeakhourmode


register(
    "evt_nelson_aalen_weekly",
    # Nelson-Aalen cumulative hazard over the SAME weekly life table
    # as Kaplan-Meier (shared _KM_TAB_CTES / _km_life_table): H(w) =
    # sum d_j/n_j and its variance sum d_j/n_j^2 — the estimator that
    # stays finite at extinction where KM pins to zero, and the exact
    # additive hazard the -ln(KM) curve approximates. Per-week terms
    # are exact rationals quantized at 9 dp before the running sum
    # over the 4-row table.
    oracle=f"""
    WITH {_KM_TAB_CTES},
    na AS (
      SELECT w, at_risk, deaths,
             CAST(round(CAST(deaths AS DOUBLE) / NULLIF(at_risk, 0) * 1000000000)
                  AS BIGINT) AS h9,
             CAST(round(CAST(deaths AS DOUBLE) / NULLIF(CAST(at_risk AS DOUBLE)
                                                        * at_risk, 0.0)
                        * 1000000000) AS BIGINT) AS v9
      FROM tab
    )
    SELECT w AS week, at_risk, deaths,
           round(CAST(SUM(h9) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / 1000000000.0, 6) AS cum_hazard,
           round(CAST(SUM(v9) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / 1000000000.0, 6) AS hazard_var
    FROM na
    """,
)


def _dnelsonaalen(spark, sf_dir):
    """Nelson-Aalen cumulative hazard off the shared life table."""
    tab = _km_life_table(spark, sf_dir)
    h9 = F.round(
        F.col("deaths").cast("double") / F.nullif(F.col("at_risk"), F.lit(0)) * 1000000000
    ).cast("long")
    v9 = F.round(
        F.col("deaths").cast("double")
        / F.nullif(F.col("at_risk").cast("double") * F.col("at_risk"), F.lit(0.0))
        * 1000000000
    ).cast("long")
    na = tab.select("w", "at_risk", "deaths", h9.alias("h9"), v9.alias("v9"))
    wrun = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return na.select(
        F.col("w").alias("week"),
        "at_risk",
        "deaths",
        F.round(F.sum("h9").over(wrun).cast("double") / 1000000000.0, 6).alias(
            "cum_hazard"
        ),
        F.round(F.sum("v9").over(wrun).cast("double") / 1000000000.0, 6).alias(
            "hazard_var"
        ),
    )


CATALOG["evt_nelson_aalen_weekly"].fn = _dnelsonaalen


register(
    "emb_norm_shell_audit",
    # thin-shell audit of the embedding cloud: in high dimension the
    # L2 norms should concentrate around their mean (the property
    # cosine-vs-dot ANN decisions rest on). Per-vector norms via ONE
    # sequential double fold over the array (identical order in both
    # engines), quantized at 6 dp per vector; mean/CV from exact
    # integer micro-sums plus the share of vectors within +-10% of
    # the mean norm via an integer compare against the 1-row mean.
    oracle="""
    WITH nv AS MATERIALIZED (
      SELECT CAST(round(sqrt(list_sum(list_transform(embedding,
                                                     x -> CAST(x AS DOUBLE)
                                                          * CAST(x AS DOUBLE))))
                        * 1000000) AS BIGINT) AS n6
      FROM embeddings
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n6) AS BIGINT) AS s,
             SUM(CAST(n6 AS HUGEINT) * n6) AS q
      FROM nv
    ),
    sh AS (
      SELECT CAST(SUM(CASE WHEN 10 * CAST(nv.n6 AS HUGEINT) * m.n >= 9 * CAST(m.s AS HUGEINT)
                            AND 10 * CAST(nv.n6 AS HUGEINT) * m.n <= 11 * CAST(m.s AS HUGEINT)
                           THEN 1 ELSE 0 END) AS BIGINT) AS inside
      FROM nv CROSS JOIN m
    )
    SELECT m.n AS n_vectors,
           round(CAST(m.s AS DOUBLE) / m.n / 1000000.0, 6) AS mean_norm,
           round(sqrt((CAST(m.q AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n)
                      / NULLIF(m.n - 1, 0))
                 / (CAST(m.s AS DOUBLE) / m.n), 6) AS norm_cv,
           round(CAST(sh.inside AS DOUBLE) / m.n, 6) AS shell_share_10pct
    FROM m CROSS JOIN sh
    """,
)


def _dnormshell(spark, sf_dir):
    """Norm concentration audit: one JVM fold per vector, exact
    micro-integer moments, integer-compare shell membership."""
    e = t(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nv = e.select(
        F.round(F.sqrt(sq) * 1000000).cast("long").alias("n6")
    ).localCheckpoint(eager=False)
    d19 = "decimal(19,0)"
    m = nv.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n6").cast("long").alias("s"),
        F.sum(F.col("n6").cast(d19) * F.col("n6").cast(d19)).alias("q"),
    )
    d12 = "decimal(12,0)"
    inside = (
        (10 * F.col("n6").cast(d12) * F.col("n").cast(d12) >= 9 * F.col("s").cast(d12))
        & (10 * F.col("n6").cast(d12) * F.col("n").cast(d12) <= 11 * F.col("s").cast(d12))
    )
    sh = nv.crossJoin(F.broadcast(m)).agg(
        F.sum(F.when(inside, 1).otherwise(0)).cast("long").alias("inside")
    )
    nd = F.col("n").cast("double")
    return m.crossJoin(F.broadcast(sh)).select(
        F.col("n").alias("n_vectors"),
        F.round(F.col("s").cast("double") / F.col("n") / 1000000.0, 6).alias("mean_norm"),
        F.round(
            F.sqrt(
                (F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
                / F.nullif(F.col("n") - 1, F.lit(0))
            )
            / (F.col("s").cast("double") / F.col("n")),
            6,
        ).alias("norm_cv"),
        F.round(F.col("inside").cast("double") / F.col("n"), 6).alias(
            "shell_share_10pct"
        ),
    )


CATALOG["emb_norm_shell_audit"].fn = _dnormshell


register(
    "evt_hill_tail_index",
    # Hill estimator of the Pareto tail index of event values: over
    # the k = 256 largest cent values (a TakeOrdered frame — never a
    # global sort), alpha = k / sum ln(x_i / x_(k+1)) with the
    # threshold value x_(k+1) a 1-row scalar and each ln quantized at
    # 9 dp before the exact integer sum. alpha <= 2 means infinite
    # variance — the heavy-tail warning read before trusting any
    # mean-based monitor on this stream.
    oracle="""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM events
      WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
    ),
    topk AS MATERIALIZED (
      SELECT c FROM x ORDER BY c DESC LIMIT 257
    ),
    thr AS (SELECT MIN(c) AS x_k1 FROM topk),
    s AS (
      SELECT CAST(SUM(CAST(round(ln(CAST(c AS DOUBLE) / thr.x_k1) * 1000000000)
                           AS BIGINT)) AS BIGINT) AS ln9,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM topk CROSS JOIN thr WHERE c > thr.x_k1
    )
    SELECT s.k AS k_top, thr.x_k1 AS threshold_cents,
           round(CAST(s.k AS DOUBLE)
                 / NULLIF(CAST(s.ln9 AS DOUBLE) / 1000000000.0, 0.0), 6)
               AS hill_alpha
    FROM s CROSS JOIN thr
    """,
)


def _dhilltail(spark, sf_dir):
    """Hill tail-index off a 257-row TakeOrdered frame."""
    ev = t(spark, sf_dir, "events")
    cents = (F.col("value").cast(DEC) * 100).cast("long")
    x = ev.filter(cents > 0).select(cents.alias("c"))
    topk = x.orderBy(F.desc("c")).limit(257).localCheckpoint(eager=False)
    thr = topk.agg(F.min("c").alias("x_k1"))
    s = (
        topk.crossJoin(F.broadcast(thr))
        .filter(F.col("c") > F.col("x_k1"))
        .agg(
            F.sum(
                F.round(
                    F.log(F.col("c").cast("double") / F.col("x_k1")) * 1000000000
                ).cast("long")
            )
            .cast("long")
            .alias("ln9"),
            F.count("*").cast("long").alias("k"),
        )
    )
    return s.crossJoin(F.broadcast(thr)).select(
        F.col("k").alias("k_top"),
        F.col("x_k1").alias("threshold_cents"),
        F.round(
            F.col("k").cast("double")
            / F.nullif(F.col("ln9").cast("double") / 1000000000.0, F.lit(0.0)),
            6,
        ).alias("hill_alpha"),
    )


CATALOG["evt_hill_tail_index"].fn = _dhilltail

