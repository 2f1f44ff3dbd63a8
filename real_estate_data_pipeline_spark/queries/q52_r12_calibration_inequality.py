"""Split from queries.py lines 33940-34540 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, register, t
from .q09_llm_dedup_text_sim import _HASH01_SQL

# ===========================================================================
# Round-12 wave 5: probability-calibration and inequality tier. The three
# calibration queries share ONE band machinery (_CAL_CTES / _cal_bands):
# train/test split by order-key parity, price-decile bands from TRAIN
# edges, the train band rate as the probabilistic prediction scored on
# the TEST half — so the reliability diagram, the Brier decomposition
# and the Hosmer-Lemeshow test can never score different predictors.
# ===========================================================================

_CAL_CTES = """
    WITH x AS MATERIALIZED (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
             CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS is_tr
      FROM orders
    ),
    e AS (
      SELECT quantile_cont(cents, 0.1) AS e1, quantile_cont(cents, 0.2) AS e2,
             quantile_cont(cents, 0.3) AS e3, quantile_cont(cents, 0.4) AS e4,
             quantile_cont(cents, 0.5) AS e5, quantile_cont(cents, 0.6) AS e6,
             quantile_cont(cents, 0.7) AS e7, quantile_cont(cents, 0.8) AS e8,
             quantile_cont(cents, 0.9) AS e9
      FROM x WHERE is_tr = 1
    ),
    b AS (
      SELECT CAST(1 + (cents > e1)::INT + (cents > e2)::INT + (cents > e3)::INT
                 + (cents > e4)::INT + (cents > e5)::INT + (cents > e6)::INT
                 + (cents > e7)::INT + (cents > e8)::INT + (cents > e9)::INT
                 AS BIGINT) AS band,
             y, is_tr
      FROM x CROSS JOIN e
    ),
    bands AS MATERIALIZED (
      SELECT band,
             CAST(SUM(is_tr) AS BIGINT) AS n_tr,
             CAST(SUM(CASE WHEN is_tr = 1 THEN y ELSE 0 END) AS BIGINT) AS s_tr,
             CAST(SUM(1 - is_tr) AS BIGINT) AS n_te,
             CAST(SUM(CASE WHEN is_tr = 0 THEN y ELSE 0 END) AS BIGINT) AS s_te
      FROM b GROUP BY band
    )
"""


def _cal_bands(spark, sf_dir):
    """Spark twin of _CAL_CTES: returns the 10-row band frame
    (band, n_tr, s_tr, n_te, s_te) — checkpointed, always
    multi-consumed by the calibration family."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        "o_orderkey",
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
        F.when(F.col("o_orderkey") % 2 == 0, 1).otherwise(0).alias("is_tr"),
    ).localCheckpoint(eager=False)
    e = x.filter(F.col("is_tr") == 1).agg(
        *[F.percentile("cents", F.lit(q / 10.0)).alias(f"e{q}") for q in range(1, 10)]
    )
    binc = F.lit(1)
    for q in range(1, 10):
        binc = binc + F.when(F.col("cents") > F.col(f"e{q}"), 1).otherwise(0)
    b = x.crossJoin(F.broadcast(e)).select(binc.cast("long").alias("band"), "y", "is_tr")
    return (
        b.groupBy("band")
        .agg(
            F.sum("is_tr").cast("long").alias("n_tr"),
            F.sum(F.when(F.col("is_tr") == 1, F.col("y")).otherwise(0)).cast("long").alias("s_tr"),
            F.sum(1 - F.col("is_tr")).cast("long").alias("n_te"),
            F.sum(F.when(F.col("is_tr") == 0, F.col("y")).otherwise(0)).cast("long").alias("s_te"),
        )
        .localCheckpoint(eager=False)
    )


register(
    "ml_reliability_diagram_bands",
    # the reliability diagram behind every calibration claim: per
    # price-decile band, the TRAIN urgent rate (the model's predicted
    # probability) against the TEST rate (what actually happened),
    # with the per-band calibration gap. Every rate is an exact
    # BIGINT/BIGINT division on the shared _CAL_CTES band frame.
    oracle=f"""
    {_CAL_CTES}
    SELECT band, n_tr AS n_train, n_te AS n_test,
           round(CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0), 6) AS confidence,
           round(CAST(s_te AS DOUBLE) / NULLIF(n_te, 0), 6) AS accuracy,
           round(CAST(s_te AS DOUBLE) / NULLIF(n_te, 0) - CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0), 6) AS gap
    FROM bands ORDER BY band
    """,
)


def _dreliability(spark, sf_dir):
    """Reliability diagram over the shared calibration bands."""
    bands = _cal_bands(spark, sf_dir)
    conf = F.col("s_tr").cast("double") / F.nullif(F.col("n_tr"), F.lit(0))
    acc = F.col("s_te").cast("double") / F.nullif(F.col("n_te"), F.lit(0))
    return bands.select(
        "band",
        F.col("n_tr").alias("n_train"),
        F.col("n_te").alias("n_test"),
        F.round(conf, 6).alias("confidence"),
        F.round(acc, 6).alias("accuracy"),
        F.round(acc - conf, 6).alias("gap"),
    ).orderBy("band")


CATALOG["ml_reliability_diagram_bands"].fn = _dreliability


register(
    "ml_brier_decomposition_bands",
    # Murphy decomposition of the Brier score of the band-rate
    # predictor on the held-out half: BS = REL - RES + UNC, plus the
    # expected calibration error. Every per-band term is a
    # deterministic double micro-quantized BEFORE the cross-band sum
    # (10 bands, but the quantize-then-integer-sum discipline means
    # the reduction order can never matter), and the base rate is one
    # exact rational.
    oracle=f"""
    {_CAL_CTES},
    tot AS (
      SELECT CAST(SUM(n_te) AS BIGINT) AS nt, CAST(SUM(s_te) AS BIGINT) AS st
      FROM bands
    ),
    terms AS (
      SELECT
        CAST(floor(n_te * (CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0) - CAST(s_te AS DOUBLE) / NULLIF(n_te, 0))
                        * (CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0) - CAST(s_te AS DOUBLE) / NULLIF(n_te, 0))
                   * 1000000 + 0.5) AS BIGINT) AS rel6,
        CAST(floor(n_te * (CAST(s_te AS DOUBLE) / NULLIF(n_te, 0) - CAST(tot.st AS DOUBLE) / tot.nt)
                        * (CAST(s_te AS DOUBLE) / NULLIF(n_te, 0) - CAST(tot.st AS DOUBLE) / tot.nt)
                   * 1000000 + 0.5) AS BIGINT) AS res6,
        CAST(floor(abs(CAST(s_te AS DOUBLE) / NULLIF(n_te, 0) - CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0))
                   * n_te * 1000000 + 0.5) AS BIGINT) AS ece6,
        CAST(floor((n_te * (CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0)) * (CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0))
                    - 2.0 * (CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0)) * s_te + s_te)
                   * 1000000 + 0.5) AS BIGINT) AS bs6
      FROM bands CROSS JOIN tot
    ),
    agg AS (
      SELECT CAST(SUM(rel6) AS BIGINT) AS rel6, CAST(SUM(res6) AS BIGINT) AS res6,
             CAST(SUM(ece6) AS BIGINT) AS ece6, CAST(SUM(bs6) AS BIGINT) AS bs6
      FROM terms
    )
    SELECT tot.nt AS n_test,
           round(CAST(tot.st AS DOUBLE) / tot.nt, 6) AS base_rate,
           round(agg.bs6 / 1000000.0 / tot.nt, 6) AS brier,
           round(agg.rel6 / 1000000.0 / tot.nt, 6) AS reliability,
           round(agg.res6 / 1000000.0 / tot.nt, 6) AS resolution,
           round((CAST(tot.st AS DOUBLE) / tot.nt)
                 * (1.0 - CAST(tot.st AS DOUBLE) / tot.nt), 6) AS uncertainty,
           round(agg.ece6 / 1000000.0 / tot.nt, 6) AS ece
    FROM tot CROSS JOIN agg
    """,
)


def _dbrier(spark, sf_dir):
    """Brier/Murphy decomposition over the shared calibration bands."""
    bands = _cal_bands(spark, sf_dir)
    tot = bands.agg(
        F.sum("n_te").cast("long").alias("nt"), F.sum("s_te").cast("long").alias("st")
    )
    conf = F.col("s_tr").cast("double") / F.nullif(F.col("n_tr"), F.lit(0))
    acc = F.col("s_te").cast("double") / F.nullif(F.col("n_te"), F.lit(0))
    ybar = F.col("st").cast("double") / F.col("nt")
    terms = bands.crossJoin(F.broadcast(tot)).select(
        F.floor(F.col("n_te") * (conf - acc) * (conf - acc) * 1000000 + 0.5)
        .cast("long")
        .alias("rel6"),
        F.floor(F.col("n_te") * (acc - ybar) * (acc - ybar) * 1000000 + 0.5)
        .cast("long")
        .alias("res6"),
        F.floor(F.abs(acc - conf) * F.col("n_te") * 1000000 + 0.5).cast("long").alias("ece6"),
        F.floor(
            (F.col("n_te") * conf * conf - 2.0 * conf * F.col("s_te") + F.col("s_te"))
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("bs6"),
    )
    agg = terms.agg(
        F.sum("rel6").cast("long").alias("rel6"),
        F.sum("res6").cast("long").alias("res6"),
        F.sum("ece6").cast("long").alias("ece6"),
        F.sum("bs6").cast("long").alias("bs6"),
    )
    return tot.crossJoin(F.broadcast(agg)).select(
        F.col("nt").alias("n_test"),
        F.round(ybar, 6).alias("base_rate"),
        F.round(F.col("bs6") / 1000000.0 / F.col("nt"), 6).alias("brier"),
        F.round(F.col("rel6") / 1000000.0 / F.col("nt"), 6).alias("reliability"),
        F.round(F.col("res6") / 1000000.0 / F.col("nt"), 6).alias("resolution"),
        F.round(ybar * (1.0 - ybar), 6).alias("uncertainty"),
        F.round(F.col("ece6") / 1000000.0 / F.col("nt"), 6).alias("ece"),
    )


CATALOG["ml_brier_decomposition_bands"].fn = _dbrier


register(
    "ml_hosmer_lemeshow_bands",
    # the Hosmer-Lemeshow goodness-of-fit test of the band-rate
    # predictor on the held-out half: HL = sum_b (O_b - E_b)^2 /
    # (E_b (1 - E_b/n_b)) over the shared _CAL_CTES bands, E_b =
    # n_te * train rate. Per-band terms micro-quantized before the
    # cross-band integer sum.
    oracle=f"""
    {_CAL_CTES},
    terms AS (
      SELECT
        CAST(floor((s_te - n_te * (CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0)))
                   * (s_te - n_te * (CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0)))
                   / ((n_te * (CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0)))
                      * (1.0 - CAST(s_tr AS DOUBLE) / NULLIF(n_tr, 0)))
                   * 1000000 + 0.5) AS BIGINT) AS h6
      FROM bands
    ),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bands FROM bands)
    SELECT nb.n_bands, nb.n_bands - 2 AS df,
           round((SELECT CAST(SUM(h6) AS BIGINT) FROM terms) / 1000000.0, 6) AS hl_stat
    FROM nb
    """,
)


def _dhosmer(spark, sf_dir):
    """Hosmer-Lemeshow over the shared calibration bands."""
    bands = _cal_bands(spark, sf_dir)
    conf = F.col("s_tr").cast("double") / F.nullif(F.col("n_tr"), F.lit(0))
    eb = F.col("n_te") * conf
    terms = bands.select(
        F.floor(
            (F.col("s_te") - eb) * (F.col("s_te") - eb) / (eb * (1.0 - conf)) * 1000000
            + 0.5
        )
        .cast("long")
        .alias("h6")
    )
    hs = terms.agg(F.sum("h6").cast("long").alias("h6"))
    nb = bands.agg(F.count("*").cast("long").alias("n_bands"))
    return nb.crossJoin(F.broadcast(hs)).select(
        "n_bands",
        (F.col("n_bands") - 2).alias("df"),
        F.round(F.col("h6") / 1000000.0, 6).alias("hl_stat"),
    )


CATALOG["ml_hosmer_lemeshow_bands"].fn = _dhosmer


register(
    "ml_bca_bootstrap_components",
    # the two correction inputs of a BCa bootstrap interval for the
    # mean order value, as exact auditable components: the bias count
    # (replicates whose micro-quantized mean falls below the full-
    # sample mean; z0 = Phi^-1(count/B) needs only this integer) and
    # the jackknife acceleration — here the delete-one-GROUP (20 hash
    # buckets) jackknife, whose leave-out means are exact rationals
    # micro-quantized before the exact wide-int cube/square sums. The
    # Poisson(1) replicate weights ride the same portable sha2 draw as
    # ml_bootstrap_mean_se (salt 'bca').
    oracle=f"""
    WITH x AS MATERIALIZED (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CAST(('0x' || substr(sha256(CAST(o_orderkey AS VARCHAR) || 'bcag'), 1, 8))::UBIGINT
                  % 20 AS BIGINT) AS grp
      FROM orders
    ),
    fm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s,
             CAST(floor(CAST(SUM(cents) AS DOUBLE) / COUNT(*) * 10000 + 0.5) AS BIGINT) AS m4
      FROM x
    ),
    r AS (
      SELECT b.b, x.cents,
             {_HASH01_SQL.format(key="CAST(o_orderkey AS VARCHAR) || 'bca' || CAST(b AS VARCHAR)")} AS u
      FROM x CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS b) b
    ),
    w AS (
      SELECT b, cents,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  ELSE 5 END AS w
      FROM r
    ),
    rep AS (
      SELECT b,
             CAST(floor(CAST(SUM(CAST(w AS HUGEINT) * cents) AS DOUBLE)
                        / NULLIF(SUM(w), 0) * 10000 + 0.5) AS BIGINT) AS m4
      FROM w GROUP BY b
    ),
    z0c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
             CAST(SUM(CASE WHEN rep.m4 < fm.m4 THEN 1 ELSE 0 END) AS BIGINT) AS n_below
      FROM rep CROSS JOIN fm
    ),
    gm AS MATERIALIZED (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng, CAST(SUM(cents) AS BIGINT) AS sg
      FROM x GROUP BY grp
    ),
    jk AS (
      SELECT CAST(floor(CAST(fm.s - gm.sg AS DOUBLE) / (fm.n - gm.ng) * 10000 + 0.5) AS BIGINT) AS t4
      FROM gm CROSS JOIN fm
    ),
    jm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS g, CAST(SUM(t4) AS BIGINT) AS st FROM jk
    ),
    ac AS (
      SELECT CAST(SUM(CAST(jm.g * jk.t4 - jm.st AS HUGEINT)
                      * (jm.g * jk.t4 - jm.st)
                      * (jm.g * jk.t4 - jm.st)) AS DOUBLE) AS c3,
             CAST(SUM(CAST(jm.g * jk.t4 - jm.st AS HUGEINT)
                      * (jm.g * jk.t4 - jm.st)) AS DOUBLE) AS c2
      FROM jk CROSS JOIN jm
    )
    SELECT fm.n AS n_orders, round(fm.m4 / 10000.0 / 100.0, 6) AS mean_revenue,
           z0c.n_replicates, z0c.n_below,
           round(-c3 / (6.0 * c2 * sqrt(c2)), 6) AS acceleration
    FROM fm CROSS JOIN z0c CROSS JOIN ac
    """,
)


def _dbca(spark, sf_dir):
    """BCa components: Poisson-bootstrap bias count + delete-one-group
    jackknife acceleration, all exact until the closing divisions."""
    from ..ops.sampling import hash_uniform01

    o = t(spark, sf_dir, "orders")
    d19 = "decimal(19,0)"
    grp = (
        F.conv(
            F.substring(F.sha2(F.concat(F.col("o_orderkey").cast("string"), F.lit("bcag")), 256), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 20
    )
    x = o.select(
        "o_orderkey",
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        grp.alias("grp"),
    ).localCheckpoint(eager=False)
    fm = x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.floor(F.sum("cents").cast("double") / F.count("*") * 10000 + 0.5)
        .cast("long")
        .alias("m4"),
    ).localCheckpoint(eager=False)
    r = x.select(
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(32))).alias("b"),
        "o_orderkey",
    ).select(
        "b",
        "cents",
        hash_uniform01(
            F.concat(F.col("o_orderkey").cast("string"), F.lit("bca"), F.col("b").cast("string"))
        ).alias("u"),
    )
    w = r.select(
        "b",
        "cents",
        F.when(F.col("u") < 0.36787944117144233, 0)
        .when(F.col("u") < 0.7357588823428847, 1)
        .when(F.col("u") < 0.9196986029286058, 2)
        .when(F.col("u") < 0.9810118431238462, 3)
        .when(F.col("u") < 0.9963401531726563, 4)
        .otherwise(5)
        .alias("w"),
    )
    rep = w.groupBy("b").agg(
        F.floor(
            F.sum(F.col("w").cast(d19) * F.col("cents")).cast("double")
            / F.nullif(F.sum("w"), F.lit(0))
            * 10000
            + 0.5
        )
        .cast("long")
        .alias("m4")
    )
    z0c = rep.crossJoin(F.broadcast(fm.select(F.col("m4").alias("fm4")))).agg(
        F.count("*").cast("long").alias("n_replicates"),
        F.sum(F.when(F.col("m4") < F.col("fm4"), 1).otherwise(0)).cast("long").alias("n_below"),
    )
    gm = x.groupBy("grp").agg(
        F.count("*").cast("long").alias("ng"), F.sum("cents").cast("long").alias("sg")
    )
    jk = gm.crossJoin(F.broadcast(fm)).select(
        F.floor(
            (F.col("s") - F.col("sg")).cast("double") / (F.col("n") - F.col("ng")) * 10000 + 0.5
        )
        .cast("long")
        .alias("t4")
    ).localCheckpoint(eager=False)
    jm = jk.agg(F.count("*").cast("long").alias("g"), F.sum("t4").cast("long").alias("st"))
    dev = F.col("g") * F.col("t4") - F.col("st")
    ac = jk.crossJoin(F.broadcast(jm)).agg(
        F.sum(dev.cast(d19) * dev.cast(d19) * dev.cast(d19)).cast("double").alias("c3"),
        F.sum(dev.cast(d19) * dev.cast(d19)).cast("double").alias("c2"),
    )
    return (
        fm.crossJoin(F.broadcast(z0c))
        .crossJoin(F.broadcast(ac))
        .select(
            F.col("n").alias("n_orders"),
            F.round(F.col("m4") / 10000.0 / 100.0, 6).alias("mean_revenue"),
            "n_replicates",
            "n_below",
            F.round(
                -F.col("c3") / (6.0 * F.col("c2") * F.sqrt(F.col("c2"))), 6
            ).alias("acceleration"),
        )
    )


CATALOG["ml_bca_bootstrap_components"].fn = _dbca


register(
    "cust_theil_inequality_index",
    # Theil's T and L inequality indices of customer revenue, with the
    # between-segment T component: every share x_i*N/S is an exact
    # rational, each ln is rounded at 6 dp and the row term micro-
    # quantized BEFORE the sum, so the corpus-wide reductions are
    # exact integers. The decomposable inequality measure Gini isn't.
    oracle="""
    WITH cr AS MATERIALIZED (
      SELECT c.c_mktsegment AS seg,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey, c.c_mktsegment
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s FROM cr
    ),
    terms AS (
      SELECT
        CAST(floor((CAST(cents AS DOUBLE) * tot.n / tot.s)
                   * round(ln(CAST(cents AS DOUBLE) * tot.n / tot.s), 6)
                   * 1000000 + 0.5) AS BIGINT) AS t6,
        CAST(floor(round(ln(CAST(tot.s AS DOUBLE) / tot.n / cents), 6)
                   * 1000000 + 0.5) AS BIGINT) AS l6
      FROM cr CROSS JOIN tot
    ),
    ta AS (
      SELECT CAST(SUM(t6) AS BIGINT) AS t6, CAST(SUM(l6) AS BIGINT) AS l6 FROM terms
    ),
    sg AS MATERIALIZED (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS ng, CAST(SUM(cents) AS BIGINT) AS sgc
      FROM cr GROUP BY seg
    ),
    bt AS (
      SELECT CAST(SUM(CAST(floor((CAST(sgc AS DOUBLE) / tot.s)
                                 * round(ln((CAST(sgc AS DOUBLE) / tot.s)
                                            * (CAST(tot.n AS DOUBLE) / ng)), 6)
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS b6
      FROM sg CROSS JOIN tot
    )
    SELECT tot.n AS n_customers,
           round(ta.t6 / 1000000.0 / tot.n, 6) AS theil_t,
           round(ta.l6 / 1000000.0 / tot.n, 6) AS theil_l,
           round(bt.b6 / 1000000.0, 6) AS theil_between_segments
    FROM tot CROSS JOIN ta CROSS JOIN bt
    """,
)


def _dtheilineq(spark, sf_dir):
    """Theil T/L + between-segment component from exact revenue cents."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cr = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", F.col("c_mktsegment").alias("seg"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    tot = cr.agg(
        F.count("*").cast("long").alias("n"), F.sum("cents").cast("long").alias("s")
    ).localCheckpoint(eager=False)
    share = F.col("cents").cast("double") * F.col("n") / F.col("s")
    terms = cr.crossJoin(F.broadcast(tot)).select(
        F.floor(share * F.round(F.log(share), 6) * 1000000 + 0.5).cast("long").alias("t6"),
        F.floor(
            F.round(F.log(F.col("s").cast("double") / F.col("n") / F.col("cents")), 6) * 1000000
            + 0.5
        )
        .cast("long")
        .alias("l6"),
    )
    ta = terms.agg(F.sum("t6").cast("long").alias("t6"), F.sum("l6").cast("long").alias("l6"))
    sg = cr.groupBy("seg").agg(
        F.count("*").cast("long").alias("ng"), F.sum("cents").cast("long").alias("sgc")
    )
    gshare = F.col("sgc").cast("double") / F.col("s")
    bt = sg.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.floor(
                gshare
                * F.round(F.log(gshare * (F.col("n").cast("double") / F.col("ng"))), 6)
                * 1000000
                + 0.5
            ).cast("long")
        )
        .cast("long")
        .alias("b6")
    )
    return (
        tot.crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(bt))
        .select(
            F.col("n").alias("n_customers"),
            F.round(F.col("t6") / 1000000.0 / F.col("n"), 6).alias("theil_t"),
            F.round(F.col("l6") / 1000000.0 / F.col("n"), 6).alias("theil_l"),
            F.round(F.col("b6") / 1000000.0, 6).alias("theil_between_segments"),
        )
    )


CATALOG["cust_theil_inequality_index"].fn = _dtheilineq


register(
    "ml_two_proportion_ztest",
    # pooled two-proportion z-test: urgent-order share of BUILDING vs
    # AUTOMOBILE customers' orders. One broadcast dim join, one
    # conditional-aggregate row of exact integers, z as a fixed
    # expression (the sqrt is the only non-rational op and IEEE sqrt
    # is correctly rounded in both engines).
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ),
    mo AS (
      SELECT
        CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN seg = 'BUILDING' THEN y ELSE 0 END) AS BIGINT) AS s1,
        CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN seg = 'AUTOMOBILE' THEN y ELSE 0 END) AS BIGINT) AS s2
      FROM j
    )
    SELECT n1, n2,
           round(CAST(s1 AS DOUBLE) / n1, 6) AS p1,
           round(CAST(s2 AS DOUBLE) / n2, 6) AS p2,
           round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 / sqrt((CAST(s1 + s2 AS DOUBLE) / (n1 + n2))
                        * (1.0 - CAST(s1 + s2 AS DOUBLE) / (n1 + n2))
                        * (1.0 / n1 + 1.0 / n2)), 6) AS z
    FROM mo
    """,
)


def _dtwoprop(spark, sf_dir):
    """Two-proportion z from one conditional-aggregate row."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")), o.o_custkey == c.c_custkey
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
    )
    mo = j.agg(
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("seg") == "BUILDING", F.col("y")).otherwise(0)).cast("long").alias("s1"),
        F.sum(F.when(F.col("seg") == "AUTOMOBILE", 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("seg") == "AUTOMOBILE", F.col("y")).otherwise(0)).cast("long").alias("s2"),
    )
    p1 = F.col("s1").cast("double") / F.col("n1")
    p2 = F.col("s2").cast("double") / F.col("n2")
    pp = (F.col("s1") + F.col("s2")).cast("double") / (F.col("n1") + F.col("n2"))
    return mo.select(
        "n1",
        "n2",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(
            (p1 - p2) / F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))), 6
        ).alias("z"),
    )


CATALOG["ml_two_proportion_ztest"].fn = _dtwoprop


