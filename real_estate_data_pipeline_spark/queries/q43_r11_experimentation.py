"""Split from queries.py lines 28650-29577 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, similarity, t
from .q09_llm_dedup_text_sim import _EMB_BAND_SQL, _EN_NORM_SQL, _HASH01_SQL, _cos6_sql

# ===========================================================================
# round-11 wave 1: the experimentation tier — multiple-testing control
# (Benjamini-Hochberg over exact permutation p-values), CUPED variance
# reduction, and the delta-method SE for ratio metrics. Everything an
# A/B platform computes after the raw means, in exact arithmetic.
# ===========================================================================

register(
    "ml_bh_fdr_permutation",
    # Benjamini-Hochberg FDR over the full battery of segment-pair mean
    # comparisons: every one of the C(5,2)=10 mktsegment pairs gets a
    # deterministic 32-replicate permutation test (the engine-wide
    # sha2 relabel draw, exact micro-dollar replicate diffs), and the
    # step-up procedure runs on EXACT RATIONAL p-values — p_k = (1+ne)/33
    # vs critical k*alpha/m with alpha=0.10, m=10 reduces to the pure
    # integer comparison 100*(1+ne) <= 33*k, so the rejection frontier
    # can never drift by a float rounding. The transcendental-free BH:
    # multiple-testing control composes the existing permutation
    # machinery instead of needing chi-square CDFs.
    oracle=f"""
    WITH x AS MATERIALIZED (
      SELECT o.o_orderkey AS k, c.c_mktsegment AS seg,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    segs AS (SELECT DISTINCT seg FROM x),
    pairs AS MATERIALIZED (
      SELECT a.seg AS sa, b.seg AS sb, a.seg || '|' || b.seg AS pair
      FROM segs a JOIN segs b ON a.seg < b.seg
    ),
    pm AS (
      SELECT pair, sa, sa AS seg FROM pairs
      UNION ALL SELECT pair, sa, sb FROM pairs
    ),
    xp AS MATERIALIZED (
      SELECT pm.pair, pm.sa, x.seg, x.k, x.cents
      FROM x JOIN pm ON x.seg = pm.seg
    ),
    obs AS (
      SELECT pair,
             CAST(SUM(CASE WHEN seg = sa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN seg <> sa THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN seg = sa THEN cents ELSE 0 END) AS BIGINT) AS s_a,
             CAST(SUM(CASE WHEN seg <> sa THEN cents ELSE 0 END) AS BIGINT) AS s_b
      FROM xp GROUP BY pair
    ),
    obs2 AS MATERIALIZED (
      SELECT pair, n_a, n_b,
             CAST(floor(CAST(s_a AS DOUBLE) / n_a / 100.0 * 1000000 + 0.5) AS BIGINT)
             - CAST(floor(CAST(s_b AS DOUBLE) / n_b / 100.0 * 1000000 + 0.5) AS BIGINT)
                 AS obs6,
             CAST(n_a AS DOUBLE) / (n_a + n_b) AS frac_a
      FROM obs
    ),
    r AS (
      SELECT xp.pair, b.b, xp.cents,
             CASE WHEN {_HASH01_SQL.format(key="CAST(xp.k AS VARCHAR) || xp.pair || 'bh' || CAST(b.b AS VARCHAR)")}
                       < o.frac_a
                  THEN 1 ELSE 0 END AS pa
      FROM xp
      CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS b) b
      JOIN obs2 o USING (pair)
    ),
    rep AS (
      SELECT pair, b,
             CAST(floor(CAST(SUM(CASE WHEN pa = 1 THEN cents ELSE 0 END) AS DOUBLE)
                        / NULLIF(SUM(pa), 0) / 100.0 * 1000000 + 0.5) AS BIGINT)
             - CAST(floor(CAST(SUM(CASE WHEN pa = 0 THEN cents ELSE 0 END) AS DOUBLE)
                          / NULLIF(SUM(1 - pa), 0) / 100.0 * 1000000 + 0.5) AS BIGINT)
                 AS d6
      FROM r GROUP BY pair, b
    ),
    pv AS (
      SELECT o.pair, o.n_a, o.n_b, o.obs6,
             CAST(SUM(CASE WHEN abs(rep.d6) >= abs(o.obs6) THEN 1 ELSE 0 END)
                  AS BIGINT) AS ne
      FROM rep JOIN obs2 o USING (pair)
      GROUP BY o.pair, o.n_a, o.n_b, o.obs6
    ),
    ranked AS MATERIALIZED (
      SELECT pair, n_a, n_b, obs6, ne,
             CAST(ROW_NUMBER() OVER (ORDER BY ne, pair) AS BIGINT) AS k
      FROM pv
    ),
    kmax AS (
      SELECT CAST(MAX(CASE WHEN 100 * (1 + ne) <= 33 * k THEN k ELSE 0 END)
                  AS BIGINT) AS km
      FROM ranked
    )
    SELECT pair, n_a, n_b,
           round(obs6 / 1000000.0, 6) AS obs_diff,
           CAST(ne AS BIGINT) AS n_extreme,
           round((1.0 + ne) / 33.0, 6) AS p_value,
           k AS bh_rank,
           round(k * 0.01, 6) AS bh_critical,
           (k <= kmax.km) AS rejected
    FROM ranked CROSS JOIN kmax
    ORDER BY bh_rank
    """,
)


def _dbhfdr(spark, sf_dir):
    """BH step-up FDR over 10 segment-pair permutation tests: one
    order-level frame fans out 4x (each segment sits in 4 pairs) then
    32x (replicate labels) — but every shuffle after the fan-out
    carries <= 320 (pair, replicate) aggregate rows, the p-values are
    exact rationals, and the step-up frontier is an integer
    comparison. Multiple-testing control at GROUP BY cost."""
    from ..ops.sampling import hash_uniform01

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    x = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        )
        .localCheckpoint(eager=False)
    )
    segs = x.select("seg").distinct()
    pairs = (
        segs.select(F.col("seg").alias("sa"))
        .join(segs.select(F.col("seg").alias("sb")), F.col("sa") < F.col("sb"))
        .select("sa", "sb", F.concat(F.col("sa"), F.lit("|"), F.col("sb")).alias("pair"))
    )
    pm = pairs.select("pair", "sa", F.col("sa").alias("seg")).unionByName(
        pairs.select("pair", "sa", F.col("sb").alias("seg"))
    )
    xp = x.join(F.broadcast(pm), "seg").localCheckpoint(eager=False)
    is_a = F.col("seg") == F.col("sa")
    obs = xp.groupBy("pair").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, F.col("cents")).otherwise(0)).cast("long").alias("s_a"),
        F.sum(F.when(~is_a, F.col("cents")).otherwise(0)).cast("long").alias("s_b"),
    )
    obs2 = obs.select(
        "pair",
        "n_a",
        "n_b",
        (
            F.floor(F.col("s_a").cast("double") / F.col("n_a") / 100.0 * 1e6 + 0.5).cast("long")
            - F.floor(F.col("s_b").cast("double") / F.col("n_b") / 100.0 * 1e6 + 0.5).cast(
                "long"
            )
        ).alias("obs6"),
        (F.col("n_a").cast("double") / (F.col("n_a") + F.col("n_b"))).alias("frac_a"),
    ).localCheckpoint(eager=False)
    r = (
        xp.select("pair", "k", "cents", F.explode(F.sequence(F.lit(1), F.lit(32))).alias("b"))
        .join(F.broadcast(obs2.select("pair", "frac_a")), "pair")
        .select(
            "pair",
            "b",
            "cents",
            F.when(
                hash_uniform01(
                    F.concat(
                        F.col("k").cast("string"),
                        F.col("pair"),
                        F.lit("bh"),
                        F.col("b").cast("string"),
                    )
                )
                < F.col("frac_a"),
                1,
            )
            .otherwise(0)
            .alias("pa"),
        )
    )
    rep = r.groupBy("pair", "b").agg(
        (
            F.floor(
                F.sum(F.when(F.col("pa") == 1, F.col("cents")).otherwise(0)).cast("double")
                / F.nullif(F.sum("pa"), F.lit(0))
                / 100.0
                * 1e6
                + 0.5
            ).cast("long")
            - F.floor(
                F.sum(F.when(F.col("pa") == 0, F.col("cents")).otherwise(0)).cast("double")
                / F.nullif(F.sum(1 - F.col("pa")), F.lit(0))
                / 100.0
                * 1e6
                + 0.5
            ).cast("long")
        ).alias("d6")
    )
    pv = (
        rep.join(F.broadcast(obs2.select("pair", "n_a", "n_b", "obs6")), "pair")
        .groupBy("pair", "n_a", "n_b", "obs6")
        .agg(
            F.sum(F.when(F.abs(F.col("d6")) >= F.abs(F.col("obs6")), 1).otherwise(0))
            .cast("long")
            .alias("ne")
        )
    )
    ranked = pv.withColumn(
        "k", F.row_number().over(Window.orderBy("ne", "pair")).cast("long")
    ).localCheckpoint(eager=False)
    kmax = ranked.agg(
        F.max(
            F.when(100 * (1 + F.col("ne")) <= 33 * F.col("k"), F.col("k")).otherwise(0)
        )
        .cast("long")
        .alias("km")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            "pair",
            "n_a",
            "n_b",
            F.round(F.col("obs6") / 1e6, 6).alias("obs_diff"),
            F.col("ne").alias("n_extreme"),
            F.round((1.0 + F.col("ne")) / 33.0, 6).alias("p_value"),
            F.col("k").alias("bh_rank"),
            F.round(F.col("k") * 0.01, 6).alias("bh_critical"),
            (F.col("k") <= F.col("km")).alias("rejected"),
        )
        .orderBy("bh_rank")
    )


CATALOG["ml_bh_fdr_permutation"].fn = _dbhfdr

register(
    "ml_cuped_adjusted_effect",
    # CUPED variance reduction: per-customer order revenue (outcome)
    # adjusted by the pre-experiment covariate (account balance) via
    # the pooled theta = cov(Y,X)/var(X). The deterministic sha2 draw
    # assigns arms, every moment is an exact wide-integer sum of cents,
    # and the adjusted effect + variance-reduction share (= rho^2)
    # are single double expressions over those exact integers — the
    # one experimentation trick that pays for itself at any scale,
    # computed in one aggregate pass.
    oracle=f"""
    WITH u AS MATERIALIZED (
      SELECT o.o_custkey AS ck,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS y,
             CAST(CAST(MAX(c.c_acctbal) AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             CASE WHEN {_HASH01_SQL.format(key="CAST(o.o_custkey AS VARCHAR) || 'cuped'")}
                       < 0.5
                  THEN 1 ELSE 0 END AS tr
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             CAST(SUM(tr) AS BIGINT) AS nt,
             CAST(SUM(CASE WHEN tr = 1 THEN x ELSE 0 END) AS BIGINT) AS sxt,
             CAST(SUM(CASE WHEN tr = 1 THEN y ELSE 0 END) AS BIGINT) AS syt
      FROM u
    )
    SELECT n, nt, n - nt AS nc,
           round(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6) AS theta,
           round((CAST(syt AS DOUBLE) / nt
                  - CAST(sy - syt AS DOUBLE) / (n - nt)) / 100.0, 6) AS raw_diff,
           round(((CAST(syt AS DOUBLE) / nt - CAST(sy - syt AS DOUBLE) / (n - nt))
                  - (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                    * (CAST(sxt AS DOUBLE) / nt - CAST(sx - sxt AS DOUBLE) / (n - nt)))
                 / 100.0, 6) AS adjusted_diff,
           round(100.0 * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                       * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / (CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                    * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6)
               AS var_reduction_pct
    FROM m
    """,
)


def _dcuped(spark, sf_dir):
    """CUPED: the unit frame is one groupBy over the order-customer
    join, every moment lands in ONE aggregate (exact decimal sums),
    and theta / adjusted effect / rho^2 are a single-row projection —
    no second pass, no per-arm re-scan."""
    from ..ops.sampling import hash_uniform01

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    u = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("y"),
            (F.max(F.col("c_acctbal")).cast(DEC) * 100).cast("long").alias("x"),
        )
        .select(
            "ck",
            "y",
            "x",
            F.when(hash_uniform01(F.col("ck"), salt="cuped") < 0.5, 1)
            .otherwise(0)
            .alias("tr"),
        )
    )
    d19 = "decimal(19,0)"
    m = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("sxx"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19)).alias("sxy"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19)).alias("syy"),
        F.sum("tr").cast("long").alias("nt"),
        F.sum(F.when(F.col("tr") == 1, F.col("x")).otherwise(0)).cast("long").alias("sxt"),
        F.sum(F.when(F.col("tr") == 1, F.col("y")).otherwise(0)).cast("long").alias("syt"),
    )
    nn = F.col("n").cast(d19)
    cnum = (nn * F.col("sxy") - F.col("sx").cast(d19) * F.col("sy").cast(d19)).cast("double")
    vxden = (nn * F.col("sxx") - F.col("sx").cast(d19) * F.col("sx").cast(d19)).cast(
        "double"
    )
    vyden = (nn * F.col("syy") - F.col("sy").cast(d19) * F.col("sy").cast(d19)).cast(
        "double"
    )
    raw = F.col("syt").cast("double") / F.col("nt") - (
        F.col("sy") - F.col("syt")
    ).cast("double") / (F.col("n") - F.col("nt"))
    xdiff = F.col("sxt").cast("double") / F.col("nt") - (
        F.col("sx") - F.col("sxt")
    ).cast("double") / (F.col("n") - F.col("nt"))
    return m.select(
        "n",
        "nt",
        (F.col("n") - F.col("nt")).alias("nc"),
        F.round(cnum / vxden, 6).alias("theta"),
        F.round(raw / 100.0, 6).alias("raw_diff"),
        F.round((raw - (cnum / vxden) * xdiff) / 100.0, 6).alias("adjusted_diff"),
        F.round(100.0 * cnum * cnum / (vxden * vyden), 6).alias("var_reduction_pct"),
    )


CATALOG["ml_cuped_adjusted_effect"].fn = _dcuped

register(
    "ml_delta_method_ratio_se",
    # the SE every ratio metric needs: average order value per segment
    # is a RATIO of sums (revenue / orders) whose naive per-row SE is
    # wrong — the delta-method (Taylor) variance over per-customer
    # (order_count, revenue) units is the standard fix. All five
    # moments ride one exact wide-integer aggregate; R, SE and the
    # normal CI are single double expressions over them.
    oracle="""
    WITH u AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM u GROUP BY seg
    )
    SELECT seg AS c_mktsegment, n,
           CAST(sx AS BIGINT) AS n_orders,
           round(CAST(sy AS DOUBLE) / sx / 100.0, 6) AS avg_order_value,
           round(sqrt(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                       - 2.0 * (CAST(sy AS DOUBLE) / sx)
                         * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                       + (CAST(sy AS DOUBLE) / sx) * (CAST(sy AS DOUBLE) / sx)
                         * (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n))
                      / (n - 1) / n)
                 / (CAST(sx AS DOUBLE) / n) / 100.0, 6) AS se_delta,
           round(CAST(sy AS DOUBLE) / sx / 100.0
                 - 1.96 * sqrt(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                       - 2.0 * (CAST(sy AS DOUBLE) / sx)
                         * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                       + (CAST(sy AS DOUBLE) / sx) * (CAST(sy AS DOUBLE) / sx)
                         * (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n))
                      / (n - 1) / n)
                 / (CAST(sx AS DOUBLE) / n) / 100.0, 6) AS ci_lo,
           round(CAST(sy AS DOUBLE) / sx / 100.0
                 + 1.96 * sqrt(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                       - 2.0 * (CAST(sy AS DOUBLE) / sx)
                         * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                       + (CAST(sy AS DOUBLE) / sx) * (CAST(sy AS DOUBLE) / sx)
                         * (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n))
                      / (n - 1) / n)
                 / (CAST(sx AS DOUBLE) / n) / 100.0, 6) AS ci_hi
    FROM m ORDER BY seg
    """,
)


def _ddeltase(spark, sf_dir):
    """Delta-method SE for the revenue-per-order ratio, clustered at
    the customer unit: one groupBy builds the units, one aggregate
    carries all five moments per segment, the SE is a projection —
    the ratio-metric CI with zero extra passes."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    u = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.count("*").cast("long").alias("x"),
            F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("y"),
        )
    )
    d19 = "decimal(19,0)"
    m = u.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("sxx"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19)).alias("sxy"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19)).alias("syy"),
    )
    r_ = F.col("sy").cast("double") / F.col("sx")
    cyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast(
        "double"
    ) / F.col("n")
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast(
        "double"
    ) / F.col("n")
    cxx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast(
        "double"
    ) / F.col("n")
    se = (
        F.sqrt((cyy - 2.0 * r_ * cxy + r_ * r_ * cxx) / (F.col("n") - 1) / F.col("n"))
        / (F.col("sx").cast("double") / F.col("n"))
        / 100.0
    )
    return (
        m.select(
            F.col("seg").alias("c_mktsegment"),
            "n",
            F.col("sx").alias("n_orders"),
            F.round(r_ / 100.0, 6).alias("avg_order_value"),
            F.round(se, 6).alias("se_delta"),
            F.round(r_ / 100.0 - 1.96 * se, 6).alias("ci_lo"),
            F.round(r_ / 100.0 + 1.96 * se, 6).alias("ci_hi"),
        )
        .orderBy("c_mktsegment")
    )


CATALOG["ml_delta_method_ratio_se"].fn = _ddeltase

register(
    "ml_james_stein_shrinkage",
    # empirical-Bayes shrinkage of the 25 per-nation mean balances
    # toward the grand mean: the James-Stein factor B = 1 - (m-3)*vbar/S
    # uses micro-quantized group means (so S is an exact wide-integer
    # sum of squared deviations), a pooled within variance whose
    # per-group S_j^2/n_j terms are floored to integers BEFORE the
    # cross-group sum (float sums over groups are order-dependent;
    # integer sums are not), and 1/n_j quantized to picounits for the
    # same reason. The estimator that dominates per-group MLEs for
    # m >= 4 — small-area estimation in one aggregate pass.
    oracle="""
    WITH g AS MATERIALIZED (
      SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS nj,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)) * 100) AS BIGINT) AS sj,
             SUM(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
                 * CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS ssj
      FROM customer GROUP BY c_nationkey
    ),
    g2 AS MATERIALIZED (
      SELECT nk, nj, sj, ssj,
             CAST(floor(CAST(sj AS DOUBLE) / nj / 100.0 * 1000000 + 0.5) AS BIGINT) AS mj6
      FROM g
    ),
    tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(nj) AS BIGINT) AS ntot,
             SUM(ssj) AS sxx,
             CAST(SUM(CAST(floor(CAST(sj AS DOUBLE) * sj / nj + 0.5) AS BIGINT))
                  AS BIGINT) AS sb,
             CAST(SUM(CAST(floor(1000000000000.0 / nj + 0.5) AS BIGINT)) AS BIGINT)
                 AS inv12,
             CAST(floor(CAST(SUM(mj6) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS g6
      FROM g2
    ),
    s AS (
      SELECT SUM(CAST(g2.mj6 - tot.g6 AS HUGEINT) * (g2.mj6 - tot.g6)) AS s_between
      FROM g2 CROSS JOIN tot
    ),
    b AS (
      SELECT tot.m, tot.g6,
             GREATEST(0.0, 1.0 - (tot.m - 3)
                 * ((CAST(tot.sxx - tot.sb AS DOUBLE) / (tot.ntot - tot.m))
                    * (CAST(tot.inv12 AS DOUBLE) / 1000000000000.0 / tot.m)
                    * 1000000000000.0 / 10000.0)
                 / CAST(s.s_between AS DOUBLE)) AS shrink
      FROM tot CROSS JOIN s
    )
    SELECT g2.nk AS c_nationkey, g2.nj AS n,
           round(g2.mj6 / 1000000.0, 6) AS raw_mean,
           round((b.g6 + b.shrink * (g2.mj6 - b.g6)) / 1000000.0, 6) AS shrunk_mean,
           round(b.shrink, 6) AS shrink_factor
    FROM g2 CROSS JOIN b
    ORDER BY c_nationkey
    """,
)


def _djstein(spark, sf_dir):
    """James-Stein: one per-nation aggregate, one 1-row total frame,
    one 1-row between-group-SS frame, then a broadcast projection —
    every cross-group float reduction rides an exact integer, so the
    shrunk means are bit-identical at any partitioning.

    Unit bookkeeping for vbar (the average variance of a group MEAN):
    s2_pooled is in cents^2; mj6 deviations are in micro-dollars whose
    squares are 1e12/1e4 = 1e8 times cents^2, hence the single
    1e12/1e4 rescale inside the shrink factor."""
    c = t(spark, sf_dir, "customer")
    d19 = "decimal(19,0)"
    x = (F.col("c_acctbal").cast(DEC) * 100).cast("long")
    g = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").cast("long").alias("nj"),
        F.sum(x).cast("long").alias("sj"),
        F.sum(x.cast(d19) * x.cast(d19)).alias("ssj"),
    )
    g2 = g.select(
        "nk",
        "nj",
        "sj",
        "ssj",
        F.floor(F.col("sj").cast("double") / F.col("nj") / 100.0 * 1e6 + 0.5)
        .cast("long")
        .alias("mj6"),
    ).localCheckpoint(eager=False)
    tot = g2.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("nj").cast("long").alias("ntot"),
        F.sum("ssj").alias("sxx"),
        F.sum(
            F.floor(F.col("sj").cast("double") * F.col("sj") / F.col("nj") + 0.5).cast("long")
        )
        .cast("long")
        .alias("sb"),
        F.sum(F.floor(F.lit(1e12) / F.col("nj") + 0.5).cast("long"))
        .cast("long")
        .alias("inv12"),
        F.floor(F.sum("mj6").cast("double") / F.count("*") + 0.5).cast("long").alias("g6"),
    ).localCheckpoint(eager=False)
    s = (
        g2.crossJoin(F.broadcast(tot.select("g6")))
        .agg(
            F.sum(
                (F.col("mj6") - F.col("g6")).cast(d19)
                * (F.col("mj6") - F.col("g6")).cast(d19)
            ).alias("s_between")
        )
    )
    b = tot.crossJoin(F.broadcast(s)).select(
        "g6",
        F.greatest(
            F.lit(0.0),
            1.0
            - (F.col("m") - 3)
            * (
                ((F.col("sxx") - F.col("sb")).cast("double") / (F.col("ntot") - F.col("m")))
                * (F.col("inv12").cast("double") / 1e12 / F.col("m"))
                * 1e12
                / 1e4
            )
            / F.col("s_between").cast("double"),
        ).alias("shrink"),
    )
    return (
        g2.crossJoin(F.broadcast(b))
        .select(
            F.col("nk").alias("c_nationkey"),
            F.col("nj").alias("n"),
            F.round(F.col("mj6") / 1e6, 6).alias("raw_mean"),
            F.round((F.col("g6") + F.col("shrink") * (F.col("mj6") - F.col("g6"))) / 1e6, 6).alias(
                "shrunk_mean"
            ),
            F.round(F.col("shrink"), 6).alias("shrink_factor"),
        )
        .orderBy("c_nationkey")
    )


CATALOG["ml_james_stein_shrinkage"].fn = _djstein


# --- absorbing Markov chain: closed-form fundamental matrix ---------------
# The 3 transient states (view/click/error) and one absorbing state
# (purchase) give a 3x3 system (diag(r) - C) h = r whose solution is
# EXACT by Cramer's rule: four 3x3 determinants of integer matrices.
# The 6-term expansions are generated ONCE here and rendered per engine
# (HUGEINT products for DuckDB, decimal(12,0)-anchored for Spark) so the
# cofactor structure cannot drift between the two sides.

_ABS_T = ("view", "click", "error")
_ABS_D = ("view", "click", "error", "purchase")


def _det3(e, tpl: str) -> str:
    """6-term expansion of a 3x3 determinant over entry-name matrix e,
    each triple product rendered through the engine's cast template."""
    terms = [
        ("+", e[0][0], e[1][1], e[2][2]),
        ("-", e[0][0], e[1][2], e[2][1]),
        ("-", e[0][1], e[1][0], e[2][2]),
        ("+", e[0][1], e[1][2], e[2][0]),
        ("+", e[0][2], e[1][0], e[2][1]),
        ("-", e[0][2], e[1][1], e[2][0]),
    ]
    body = " ".join(f"{s} {tpl.format(a=a, b=b, c=c)}" for s, a, b, c in terms)
    return f"(0 {body})"


_M3 = [["m11", "m12", "m13"], ["m21", "m22", "m23"], ["m31", "m32", "m33"]]
_M3_R = ["rv", "rc", "re_"]


def _det3_col(i: int, tpl: str) -> str:
    """det with column i (0-based; -1 = none) replaced by the r vector."""
    e = [row[:] for row in _M3]
    if i >= 0:
        for j in range(3):
            e[j][i] = _M3_R[j]
    return _det3(e, tpl)


_DET_DUCK = "(CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT) * CAST({c} AS HUGEINT))"
_DET_SPARK = (
    "(CAST({a} AS DECIMAL(12,0)) * CAST({b} AS DECIMAL(12,0)) * CAST({c} AS DECIMAL(12,0)))"
)

_ABS_CELLS_SQL = ",\n             ".join(
    f"CAST(SUM(CASE WHEN src = '{s}' AND dst = '{d}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS c_{s[0]}{d[0]}"
    for s in _ABS_T
    for d in _ABS_D
)

register(
    "evt_absorbing_chain_expected_steps",
    # relational linear algebra: expected steps to conversion for each
    # transient state of the (view, click, error) -> purchase absorbing
    # chain. Conditioning on the 4-state sub-chain, the fundamental-
    # matrix system (diag(r) - C) h = r is ALL-INTEGER, so Cramer's
    # rule makes h exact: four 3x3 determinants of transition counts
    # (wide-int triple products), one division per state. No iterative
    # solve, no float accumulation — the funnel-depth metric closed
    # form out of a GROUP BY.
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ),
    kept AS (
      SELECT src, dst FROM seq
      WHERE src IN ('view', 'click', 'error')
        AND dst IN ('view', 'click', 'error', 'purchase')
    ),
    cnt AS (
      SELECT {_ABS_CELLS_SQL}
      FROM kept
    ),
    mm AS MATERIALIZED (
      SELECT c_vp, c_cp, c_ep,
             c_vv + c_vc + c_ve + c_vp AS rv,
             c_cv + c_cc + c_ce + c_cp AS rc,
             c_ev + c_ec + c_ee + c_ep AS re_,
             (c_vv + c_vc + c_ve + c_vp) - c_vv AS m11, -c_vc AS m12, -c_ve AS m13,
             -c_cv AS m21, (c_cv + c_cc + c_ce + c_cp) - c_cc AS m22, -c_ce AS m23,
             -c_ev AS m31, -c_ec AS m32, (c_ev + c_ec + c_ee + c_ep) - c_ee AS m33
      FROM cnt
    ),
    dets AS MATERIALIZED (
      SELECT rv, rc, re_, c_vp, c_cp, c_ep,
             {_det3_col(-1, _DET_DUCK)} AS det0,
             {_det3_col(0, _DET_DUCK)} AS det1,
             {_det3_col(1, _DET_DUCK)} AS det2,
             {_det3_col(2, _DET_DUCK)} AS det3
      FROM mm
    )
    SELECT * FROM (
      SELECT 'view' AS state, rv AS n_out,
             round(CAST(c_vp AS DOUBLE) / rv, 6) AS p_direct_purchase,
             round(CAST(det1 AS DOUBLE) / NULLIF(CAST(det0 AS DOUBLE), 0), 6)
                 AS expected_steps
      FROM dets
      UNION ALL
      SELECT 'click', rc,
             round(CAST(c_cp AS DOUBLE) / rc, 6),
             round(CAST(det2 AS DOUBLE) / NULLIF(CAST(det0 AS DOUBLE), 0), 6)
      FROM dets
      UNION ALL
      SELECT 'error', re_,
             round(CAST(c_ep AS DOUBLE) / re_, 6),
             round(CAST(det3 AS DOUBLE) / NULLIF(CAST(det0 AS DOUBLE), 0), 6)
      FROM dets
    ) ORDER BY state
    """,
)


def _dabschain(spark, sf_dir):
    """Absorbing-chain expected steps: one lead window builds the
    transitions, ONE conditional aggregate pivots all 12 cells into a
    single row, and the Cramer determinants are shared-structure
    column expressions (generated from the same expansion as the
    oracle) — the whole solve is a 1-row projection."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    kept = seq.filter(
        F.col("src").isin(*_ABS_T) & F.col("dst").isin(*_ABS_D)
    )
    cells = [
        F.sum(
            F.when((F.col("src") == s) & (F.col("dst") == d), 1).otherwise(0)
        )
        .cast("long")
        .alias(f"c_{s[0]}{d[0]}")
        for s in _ABS_T
        for d in _ABS_D
    ]
    cnt = kept.agg(*cells)
    mm = cnt.select(
        "c_vp",
        "c_cp",
        "c_ep",
        (F.col("c_vv") + F.col("c_vc") + F.col("c_ve") + F.col("c_vp")).alias("rv"),
        (F.col("c_cv") + F.col("c_cc") + F.col("c_ce") + F.col("c_cp")).alias("rc"),
        (F.col("c_ev") + F.col("c_ec") + F.col("c_ee") + F.col("c_ep")).alias("re_"),
        (F.col("c_vc") + F.col("c_ve") + F.col("c_vp")).alias("m11"),
        (-F.col("c_vc")).alias("m12"),
        (-F.col("c_ve")).alias("m13"),
        (-F.col("c_cv")).alias("m21"),
        (F.col("c_cv") + F.col("c_ce") + F.col("c_cp")).alias("m22"),
        (-F.col("c_ce")).alias("m23"),
        (-F.col("c_ev")).alias("m31"),
        (-F.col("c_ec")).alias("m32"),
        (F.col("c_ev") + F.col("c_ec") + F.col("c_ep")).alias("m33"),
    )
    dets = mm.select(
        "rv",
        "rc",
        "re_",
        "c_vp",
        "c_cp",
        "c_ep",
        F.expr(_det3_col(-1, _DET_SPARK)).alias("det0"),
        F.expr(_det3_col(0, _DET_SPARK)).alias("det1"),
        F.expr(_det3_col(1, _DET_SPARK)).alias("det2"),
        F.expr(_det3_col(2, _DET_SPARK)).alias("det3"),
    )
    rows = dets.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("state"),
                    F.col("rv").alias("n_out"),
                    F.round(F.col("c_vp").cast("double") / F.col("rv"), 6).alias(
                        "p_direct_purchase"
                    ),
                    F.round(
                        F.col("det1").cast("double")
                        / F.nullif(F.col("det0").cast("double"), F.lit(0.0)),
                        6,
                    ).alias("expected_steps"),
                ),
                F.struct(
                    F.lit("click").alias("state"),
                    F.col("rc").alias("n_out"),
                    F.round(F.col("c_cp").cast("double") / F.col("rc"), 6).alias(
                        "p_direct_purchase"
                    ),
                    F.round(
                        F.col("det2").cast("double")
                        / F.nullif(F.col("det0").cast("double"), F.lit(0.0)),
                        6,
                    ).alias("expected_steps"),
                ),
                F.struct(
                    F.lit("error").alias("state"),
                    F.col("re_").alias("n_out"),
                    F.round(F.col("c_ep").cast("double") / F.col("re_"), 6).alias(
                        "p_direct_purchase"
                    ),
                    F.round(
                        F.col("det3").cast("double")
                        / F.nullif(F.col("det0").cast("double"), F.lit(0.0)),
                        6,
                    ).alias("expected_steps"),
                ),
            )
        ).alias("r")
    )
    return rows.select("r.*").orderBy("state")


CATALOG["evt_absorbing_chain_expected_steps"].fn = _dabschain

register(
    "graph_modularity_components",
    # Newman modularity of the connected-component partition of the
    # cosine-similarity graph: with communities = components every edge
    # is intra-community, so Q = 1 - sum_c (d_c / 2m)^2 — an EXACT
    # rational of integer degree masses. One aggregate over the same
    # edges + labels emb_cosine_components already verifies; the
    # structure-concentration gauge for any dedup/ER clustering (Q near
    # 0 = one giant hairball; near 1 = many balanced clusters).
    oracle=f"""
    WITH RECURSIVE b AS (
      SELECT vec_id, embedding,
             {_EMB_BAND_SQL[0]} AS bkt0,
             {_EMB_BAND_SQL[1]} AS bkt1,
             {_EMB_BAND_SQL[2]} AS bkt2,
             {_EN_NORM_SQL} AS n
      FROM embeddings
    ),
    und AS MATERIALIZED (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b
      FROM b a JOIN b c
        ON a.vec_id < c.vec_id
       AND (a.bkt0 = c.bkt0 OR a.bkt1 = c.bkt1 OR a.bkt2 = c.bkt2)
      WHERE {_cos6_sql('a.embedding', 'c.embedding', 'a.n', 'c.n')} >= 0.35
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM und
      UNION ALL SELECT id_b, id_a FROM und
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    walk(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.src, w.lab FROM edges e JOIN walk w ON e.dst = w.id
    ),
    lab AS (SELECT id, MIN(lab) AS cluster FROM walk GROUP BY id),
    deg AS MATERIALIZED (
      SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
    ),
    dc AS MATERIALIZED (
      SELECT l.cluster, CAST(SUM(d.deg) AS BIGINT) AS d_c
      FROM deg d JOIN lab l USING (id) GROUP BY l.cluster
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           m.m AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dc) AS n_components,
           round(1.0 - CAST((SELECT SUM(CAST(d_c AS HUGEINT) * d_c) FROM dc) AS DOUBLE)
                 / (4.0 * m.m * m.m), 6) AS modularity,
           round(CAST((SELECT MAX(d_c) FROM dc) AS DOUBLE) / (2.0 * m.m), 6)
               AS top_degree_share
    FROM m
    """,
)


def _dmodularity(spark, sf_dir):
    """Component modularity: the banded-LSH verified pairs feed BOTH
    the pointer-jumping CC and the degree table (one checkpointed edge
    frame, two aggregates), cluster degree masses reduce to component
    count + exact sum of squares, and Q is a single-row projection —
    partition-quality scoring at the cost of one extra GROUP BY over
    machinery the components query already runs."""
    from ..ops import graph

    d19 = "decimal(19,0)"
    e = t(spark, sf_dir, "embeddings")
    pairs = (
        similarity.embedding_dup_pairs(e, threshold=0.35, bits=6, bands=3)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    cc = graph.connected_components(pairs, max_iter=40)
    sym = pairs.select(F.col("id_a").alias("id")).unionByName(
        pairs.select(F.col("id_b").alias("id"))
    )
    deg = sym.groupBy("id").agg(F.count("*").cast("long").alias("deg"))
    dc = (
        deg.join(cc, "id")
        .groupBy("cluster")
        .agg(F.sum("deg").cast("long").alias("d_c"))
    )
    stats = dc.agg(
        F.count("*").cast("long").alias("n_components"),
        F.sum(F.col("d_c").cast(d19) * F.col("d_c").cast(d19)).alias("sd2"),
        F.max("d_c").alias("max_dc"),
    )
    nn = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    mrow = pairs.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        nn.crossJoin(F.broadcast(mrow))
        .crossJoin(F.broadcast(stats))
        .select(
            "n_nodes",
            "n_edges",
            "n_components",
            F.round(
                1.0
                - F.col("sd2").cast("double")
                / (4.0 * F.col("n_edges").cast("double") * F.col("n_edges")),
                6,
            ).alias("modularity"),
            F.round(F.col("max_dc").cast("double") / (2.0 * F.col("n_edges")), 6).alias(
                "top_degree_share"
            ),
        )
    )


CATALOG["graph_modularity_components"].fn = _dmodularity


