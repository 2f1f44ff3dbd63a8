"""Round-15 wave 29 (post-close): ML-engineering machinery, all exact
— 5-fold cross-validation of the order-size regression with folds
assigned by the deterministic sha2 coin and TRAIN moments obtained by
subtracting fold moments from the global moments (the jackknife
identity: no per-fold re-scan), a learning curve over nested sha2
train fractions against a fixed held-out test set, drop-column
importance for the two-regressor model (exact 2x2 Cramer solve),
leave-one-out target encoding of brands with the leakage gap (naive
in-fold encoding vs the LOO identity (S - y)/(n - 1), measured as the
correlation inflation), and a banded two-sample KS drift statistic
between the pre-/post-1998 order-value distributions (pure integer
max |cum1 n2 - cum2 n1| over $1000 bands).

Exactness: every moment (including Syy and the cross moments) is an
exact integer in decimal-38; fits assemble in deterministic doubles;
encodings and KS gaps are integer rationals; fold/fraction membership
is the house sha2-first-8-hex idiom.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# Per-order (x = total quantity, y = order cents) + sha2 fold id.
_ORDER_XY_CTE = """oxy AS MATERIALIZED (
      SELECT o.o_orderkey AS ok,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS x,
             CAST(CAST(MIN(o.o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    )"""


def _order_xy(spark, sf_dir):
    """(orderkey, total quantity, order cents)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(
            o.select("o_orderkey", "o_totalprice"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_orderkey").alias("ok"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("x"),
            (F.min("o_totalprice").cast(DEC) * 100).cast("long").alias("y"),
        )
        .localCheckpoint(eager=False)
    )


def _hv(col, salt):
    return F.conv(
        F.substring(
            F.sha2(F.concat(col.cast("string"), F.lit(salt)), 256), 1, 8
        ),
        16,
        10,
    ).cast("bigint")


_HV_SQL = (
    "('0x' || substr(sha256(CAST({col} AS VARCHAR) || '{salt}'), 1, 8))::UBIGINT"
)


register(
    "ml_kfold_cv_order_model",
    # 5-fold CV of y ~ a + b x: fold = (5 * hash) >> 32, train
    # moments = global - fold (exact integer subtraction), per-fold
    # test/train MSE from the expanded SSE identity Syy + k a^2 +
    # b^2 Sxx - 2a Sy - 2b Sxy + 2ab Sx — cross-validation with ONE
    # scan and zero refits.
    oracle=f"""
    WITH {_ORDER_XY_CTE},
    fx AS (
      SELECT x, y, CAST(({_HV_SQL.format(col="ok", salt="cv15")} * 5)
                        // 4294967296 AS BIGINT) AS f
      FROM oxy
    ),
    fm AS (
      SELECT f, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM fx GROUP BY f
    ),
    g AS (
      SELECT CAST(SUM(k) AS BIGINT) AS k, CAST(SUM(sx) AS HUGEINT) AS sx,
             CAST(SUM(sy) AS HUGEINT) AS sy,
             CAST(SUM(sxx) AS HUGEINT) AS sxx,
             CAST(SUM(sxy) AS HUGEINT) AS sxy,
             CAST(SUM(syy) AS HUGEINT) AS syy
      FROM fm
    ),
    fit AS (
      SELECT fm.f, fm.k AS kte, g.k - fm.k AS ktr,
             fm.sx AS sxte, fm.sy AS syte, fm.sxx AS sxxte,
             fm.sxy AS sxyte, fm.syy AS syyte,
             g.sx - fm.sx AS sxtr, g.sy - fm.sy AS sytr,
             g.sxx - fm.sxx AS sxxtr, g.sxy - fm.sxy AS sxytr,
             g.syy - fm.syy AS syytr,
             CAST((g.k - fm.k) * (g.sxy - fm.sxy)
                  - (g.sx - fm.sx) * (g.sy - fm.sy) AS DOUBLE)
             / CAST((g.k - fm.k) * (g.sxx - fm.sxx)
                    - (g.sx - fm.sx) * (g.sx - fm.sx) AS DOUBLE) AS b
      FROM fm CROSS JOIN g
    ),
    ev AS (
      SELECT f, kte, ktr, b,
             (CAST(sytr AS DOUBLE) - b * CAST(sxtr AS DOUBLE)) / ktr AS a,
             sxte, syte, sxxte, sxyte, syyte,
             sxtr, sytr, sxxtr, sxytr, syytr
      FROM fit
    )
    SELECT f AS fold, ktr AS n_train, kte AS n_test,
           round((CAST(syyte AS DOUBLE) + kte * a * a
                  + b * b * CAST(sxxte AS DOUBLE)
                  - 2 * a * CAST(syte AS DOUBLE)
                  - 2 * b * CAST(sxyte AS DOUBLE)
                  + 2 * a * b * CAST(sxte AS DOUBLE)) / kte / 1e4, 2)
             AS test_mse_dollars2,
           round((CAST(syytr AS DOUBLE) + ktr * a * a
                  + b * b * CAST(sxxtr AS DOUBLE)
                  - 2 * a * CAST(sytr AS DOUBLE)
                  - 2 * b * CAST(sxytr AS DOUBLE)
                  + 2 * a * b * CAST(sxtr AS DOUBLE)) / ktr / 1e4, 2)
             AS train_mse_dollars2
    FROM ev ORDER BY f
    """,
)


def _dkfold(spark, sf_dir):
    """One-scan 5-fold CV via the moment-subtraction identity."""
    d38 = "decimal(38,0)"
    oxy = _order_xy(spark, sf_dir)
    fx = oxy.select(
        "x", "y", F.expr(
            "(cast(conv(substring(sha2(concat(cast(ok as string), 'cv15'),"
            " 256), 1, 8), 16, 10) as bigint) * 5) div 4294967296"
        ).alias("f"),
    )
    fm = fx.groupBy("f").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
    ).localCheckpoint(eager=False)
    g = fm.agg(
        F.sum("k").cast("long").alias("gk"),
        F.sum("sx").alias("gsx"),
        F.sum("sy").alias("gsy"),
        F.sum("sxx").alias("gsxx"),
        F.sum("sxy").alias("gsxy"),
        F.sum("syy").alias("gsyy"),
    )
    j = fm.crossJoin(F.broadcast(g))
    ktr = F.col("gk") - F.col("k")
    sxtr = F.col("gsx") - F.col("sx")
    sytr = F.col("gsy") - F.col("sy")
    sxxtr = F.col("gsxx") - F.col("sxx")
    sxytr = F.col("gsxy") - F.col("sxy")
    syytr = F.col("gsyy") - F.col("syy")
    b = (ktr * sxytr - sxtr * sytr).cast("double") / (
        ktr * sxxtr - sxtr * sxtr
    ).cast("double")
    a = (sytr.cast("double") - b * sxtr.cast("double")) / ktr

    def mse(k, sx, sy, sxx, sxy, syy):
        return (
            syy.cast("double")
            + k * a * a
            + b * b * sxx.cast("double")
            - 2 * a * sy.cast("double")
            - 2 * b * sxy.cast("double")
            + 2 * a * b * sx.cast("double")
        ) / k

    return j.select(
        F.col("f").alias("fold"),
        ktr.cast("long").alias("n_train"),
        F.col("k").alias("n_test"),
        F.round(
            mse(F.col("k"), F.col("sx"), F.col("sy"), F.col("sxx"), F.col("sxy"), F.col("syy"))
            / F.lit(1e4),
            2,
        ).alias("test_mse_dollars2"),
        F.round(mse(ktr, sxtr, sytr, sxxtr, sxytr, syytr) / F.lit(1e4), 2).alias(
            "train_mse_dollars2"
        ),
    ).orderBy("fold")


CATALOG["ml_kfold_cv_order_model"].fn = _dkfold


register(
    "ml_learning_curve_order_model",
    # The learning curve: nested sha2 train fractions 10/20/40/80% of
    # the non-test pool, evaluated on a FIXED sha2 20% test set —
    # test MSE falling (and train MSE rising) with data volume is the
    # signature that separates estimation error from model bias.
    # Exact integer moments per subset, one fit each.
    oracle=f"""
    WITH {_ORDER_XY_CTE},
    lab AS (
      SELECT x, y,
             CASE WHEN {_HV_SQL.format(col="ok", salt="lc15te")} < 858993459
                  THEN 1 ELSE 0 END AS is_test,
             {_HV_SQL.format(col="ok", salt="lc15tr")} AS htr
      FROM oxy
    ),
    te AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM lab WHERE is_test = 1
    ),
    qs(q) AS (VALUES (10), (20), (40), (80)),
    tr AS (
      SELECT qs.q, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(lab.x) AS HUGEINT) AS sx,
             CAST(SUM(lab.y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(lab.x AS HUGEINT) * lab.x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(lab.x AS HUGEINT) * lab.y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(lab.y AS HUGEINT) * lab.y) AS HUGEINT) AS syy
      FROM qs JOIN lab ON lab.is_test = 0
                      AND lab.htr < CAST(qs.q AS BIGINT) * 42949673
      GROUP BY qs.q
    ),
    fit AS (
      SELECT tr.q, tr.k AS ktr, te.k AS kte,
             CAST(tr.k * tr.sxy - tr.sx * tr.sy AS DOUBLE)
             / CAST(tr.k * tr.sxx - tr.sx * tr.sx AS DOUBLE) AS b,
             tr.sx AS sxtr, tr.sy AS sytr, tr.sxx AS sxxtr,
             tr.sxy AS sxytr, tr.syy AS syytr,
             te.sx AS sxte, te.sy AS syte, te.sxx AS sxxte,
             te.sxy AS sxyte, te.syy AS syyte
      FROM tr CROSS JOIN te
    ),
    ev AS (
      SELECT *, (CAST(sytr AS DOUBLE) - b * CAST(sxtr AS DOUBLE)) / ktr AS a
      FROM fit
    )
    SELECT q AS train_pct, ktr AS n_train, kte AS n_test,
           round((CAST(syyte AS DOUBLE) + kte * a * a
                  + b * b * CAST(sxxte AS DOUBLE)
                  - 2 * a * CAST(syte AS DOUBLE)
                  - 2 * b * CAST(sxyte AS DOUBLE)
                  + 2 * a * b * CAST(sxte AS DOUBLE)) / kte / 1e4, 2)
             AS test_mse_dollars2,
           round((CAST(syytr AS DOUBLE) + ktr * a * a
                  + b * b * CAST(sxxtr AS DOUBLE)
                  - 2 * a * CAST(sytr AS DOUBLE)
                  - 2 * b * CAST(sxytr AS DOUBLE)
                  + 2 * a * b * CAST(sxtr AS DOUBLE)) / ktr / 1e4, 2)
             AS train_mse_dollars2
    FROM ev ORDER BY q
    """,
)


def _dlearncurve(spark, sf_dir):
    """Nested-fraction learning curve against a fixed test set."""
    d38 = "decimal(38,0)"
    oxy = _order_xy(spark, sf_dir)
    lab = oxy.select(
        "x",
        "y",
        F.when(_hv(F.col("ok"), "lc15te") < 858993459, 1).otherwise(0).alias(
            "is_test"
        ),
        _hv(F.col("ok"), "lc15tr").alias("htr"),
    ).localCheckpoint(eager=False)

    def moms(df):
        return df.agg(
            F.count("*").cast("long").alias("k"),
            F.sum("x").cast(d38).alias("sx"),
            F.sum("y").cast(d38).alias("sy"),
            F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
            F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
            F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        )

    te = moms(lab.filter(F.col("is_test") == 1)).select(
        F.col("k").alias("kte"),
        F.col("sx").alias("sxte"),
        F.col("sy").alias("syte"),
        F.col("sxx").alias("sxxte"),
        F.col("sxy").alias("sxyte"),
        F.col("syy").alias("syyte"),
    )
    qs = spark.createDataFrame([(q,) for q in (10, 20, 40, 80)], "q long")
    tr = (
        lab.filter(F.col("is_test") == 0)
        .crossJoin(F.broadcast(qs))
        .filter(F.col("htr") < F.col("q") * 42949673)
        .groupBy("q")
        .agg(
            F.count("*").cast("long").alias("k"),
            F.sum("x").cast(d38).alias("sx"),
            F.sum("y").cast(d38).alias("sy"),
            F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
            F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
            F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        )
    )
    j = tr.crossJoin(F.broadcast(te))
    b = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / F.col("k")

    def mse(k, sx, sy, sxx, sxy, syy):
        return (
            syy.cast("double")
            + k * a * a
            + b * b * sxx.cast("double")
            - 2 * a * sy.cast("double")
            - 2 * b * sxy.cast("double")
            + 2 * a * b * sx.cast("double")
        ) / k

    return j.select(
        F.col("q").alias("train_pct"),
        F.col("k").alias("n_train"),
        F.col("kte").alias("n_test"),
        F.round(
            mse(
                F.col("kte"), F.col("sxte"), F.col("syte"), F.col("sxxte"),
                F.col("sxyte"), F.col("syyte"),
            )
            / F.lit(1e4),
            2,
        ).alias("test_mse_dollars2"),
        F.round(
            mse(
                F.col("k"), F.col("sx"), F.col("sy"), F.col("sxx"),
                F.col("sxy"), F.col("syy"),
            )
            / F.lit(1e4),
            2,
        ).alias("train_mse_dollars2"),
    ).orderBy("train_pct")


CATALOG["ml_learning_curve_order_model"].fn = _dlearncurve


register(
    "ml_drop_column_importance",
    # Drop-column importance for the two-regressor model y ~ qty +
    # avg discount: R^2 of the full model (exact 2x2 Cramer solve on
    # centered decimal-38 moments) minus the R^2 of each
    # single-regressor model — the honest importance that re-fits
    # without the feature instead of permuting it.
    oracle=f"""
    WITH ox AS MATERIALIZED (
      SELECT o.o_orderkey,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS x1,
             (CAST(SUM(CAST(CAST(l.l_discount AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS BIGINT) * 10000)
               // CAST(COUNT(*) AS BIGINT) AS x2,
             CAST(CAST(MIN(o.o_totalprice) AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS HUGEINT) AS s1, CAST(SUM(x2) AS HUGEINT) AS s2,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
             CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(SUM(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
             CAST(SUM(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM ox
    ),
    c AS (
      SELECT n,
             CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
             CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
             CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
             CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
             CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y,
             CAST(n * syy - sy * sy AS DOUBLE) AS cyy
      FROM m
    )
    SELECT n AS n_orders,
           round(((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * c2y
                  + (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * c1y)
                 / cyy, 9) AS r2_full,
           round(c1y * c1y / (c11 * cyy), 9) AS r2_qty_only,
           round(c2y * c2y / (c22 * cyy), 9) AS r2_disc_only,
           round(((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * c2y
                  + (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * c1y)
                 / cyy - c2y * c2y / (c22 * cyy), 9) AS importance_qty,
           round(((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * c2y
                  + (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * c1y)
                 / cyy - c1y * c1y / (c11 * cyy), 9) AS importance_disc
    FROM c
    """,
)


def _ddropcol(spark, sf_dir):
    """Exact 2x2 Cramer R^2 decomposition into drop-column importances."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    ox = (
        li.join(
            o.select("o_orderkey", "o_totalprice"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("x1"),
            F.expr(
                "(CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS"
                " BIGINT)) AS BIGINT) * 10000) div count(*)"
            ).alias("x2"),
            (F.min("o_totalprice").cast(DEC) * 100).cast("long").alias("y"),
        )
    )
    m = ox.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast(d38).alias("s1"),
        F.sum("x2").cast(d38).alias("s2"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x1").cast(d38) * F.col("x1")).alias("s11"),
        F.sum(F.col("x2").cast(d38) * F.col("x2")).alias("s22"),
        F.sum(F.col("x1").cast(d38) * F.col("x2")).alias("s12"),
        F.sum(F.col("x1").cast(d38) * F.col("y")).alias("s1y"),
        F.sum(F.col("x2").cast(d38) * F.col("y")).alias("s2y"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
    )
    c11 = (F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")).cast("double")
    c22 = (F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")).cast("double")
    c12 = (F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")).cast("double")
    c1y = (F.col("n") * F.col("s1y") - F.col("s1") * F.col("sy")).cast("double")
    c2y = (F.col("n") * F.col("s2y") - F.col("s2") * F.col("sy")).cast("double")
    cyy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    r2_full = (b2 * c2y + b1 * c1y) / cyy
    r2_1 = c1y * c1y / (c11 * cyy)
    r2_2 = c2y * c2y / (c22 * cyy)
    return m.select(
        F.col("n").alias("n_orders"),
        F.round(r2_full, 9).alias("r2_full"),
        F.round(r2_1, 9).alias("r2_qty_only"),
        F.round(r2_2, 9).alias("r2_disc_only"),
        F.round(r2_full - r2_2, 9).alias("importance_qty"),
        F.round(r2_full - r2_1, 9).alias("importance_disc"),
    )


CATALOG["ml_drop_column_importance"].fn = _ddropcol


register(
    "ml_target_encoding_loo",
    # Target encoding leakage, measured: encode p_brand by the mean
    # lineitem quantity — naively (group mean INCLUDING the row) vs
    # the leave-one-out identity (S_g - y_i)/(n_g - 1) — and compare
    # the encoded-feature/target correlations.  The naive corr is
    # inflated by construction; the gap IS the leakage.  Encodings
    # are exact BIGINT integer divisions at micro scale; Pearson from
    # cleared decimal-38 moments.
    oracle="""
    WITH lx AS MATERIALIZED (
      SELECT p.p_brand AS g, CAST(l.l_quantity AS BIGINT) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    gm AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s
      FROM lx GROUP BY g
    ),
    enc AS (
      SELECT lx.y,
             (gm.s * 1000000) // gm.n AS e_naive,
             ((gm.s - lx.y) * 1000000) // (gm.n - 1) AS e_loo
      FROM lx JOIN gm ON gm.g = lx.g
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(SUM(e_naive) AS HUGEINT) AS sa,
             CAST(SUM(CAST(e_naive AS HUGEINT) * e_naive) AS HUGEINT) AS saa,
             CAST(SUM(CAST(e_naive AS HUGEINT) * y) AS HUGEINT) AS say,
             CAST(SUM(e_loo) AS HUGEINT) AS sl,
             CAST(SUM(CAST(e_loo AS HUGEINT) * e_loo) AS HUGEINT) AS sll,
             CAST(SUM(CAST(e_loo AS HUGEINT) * y) AS HUGEINT) AS sly
      FROM enc
    )
    SELECT n AS n_lineitems,
           round(CAST(n * say - sa * sy AS DOUBLE)
                 / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 9)
             AS corr_naive,
           round(CAST(n * sly - sl * sy AS DOUBLE)
                 / sqrt(CAST(n * sll - sl * sl AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 9) AS corr_loo,
           round(CAST(n * say - sa * sy AS DOUBLE)
                 / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
                 - CAST(n * sly - sl * sy AS DOUBLE)
                   / sqrt(CAST(n * sll - sl * sl AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)), 9)
             AS leakage_gap
    FROM m
    """,
)


def _dtargetenc(spark, sf_dir):
    """Naive vs LOO brand target encoding and the leakage gap."""
    d38 = "decimal(38,0)"
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    lx = li.join(
        F.broadcast(p.select("p_partkey", F.col("p_brand").alias("g"))),
        li["l_partkey"] == F.col("p_partkey"),
    ).select("g", F.col("l_quantity").cast("long").alias("y"))
    gm = lx.groupBy(F.col("g").alias("g2")).agg(
        F.count("*").cast("long").alias("n"), F.sum("y").cast("long").alias("s")
    )
    enc = lx.join(F.broadcast(gm), F.col("g") == F.col("g2")).select(
        "y",
        F.expr("(s * 1000000) div n").alias("e_naive"),
        F.expr("((s - y) * 1000000) div (n - 1)").alias("e_loo"),
    )
    m = enc.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum("e_naive").cast(d38).alias("sa"),
        F.sum(F.col("e_naive").cast(d38) * F.col("e_naive")).alias("saa"),
        F.sum(F.col("e_naive").cast(d38) * F.col("y")).alias("say"),
        F.sum("e_loo").cast(d38).alias("sl"),
        F.sum(F.col("e_loo").cast(d38) * F.col("e_loo")).alias("sll"),
        F.sum(F.col("e_loo").cast(d38) * F.col("y")).alias("sly"),
    )

    def corr(sx, sxx, sxy):
        return (F.col("n") * sxy - sx * F.col("sy")).cast("double") / F.sqrt(
            (F.col("n") * sxx - sx * sx).cast("double")
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
        )

    cn = corr(F.col("sa"), F.col("saa"), F.col("say"))
    cl = corr(F.col("sl"), F.col("sll"), F.col("sly"))
    return m.select(
        F.col("n").alias("n_lineitems"),
        F.round(cn, 9).alias("corr_naive"),
        F.round(cl, 9).alias("corr_loo"),
        F.round(cn - cl, 9).alias("leakage_gap"),
    )


CATALOG["ml_target_encoding_loo"].fn = _dtargetenc


register(
    "ml_feature_drift_ks_banded",
    # Two-sample KS drift between pre-1998 and post-1998 order-value
    # distributions on $1000 bands: D = max |cum1 n2 - cum2 n1| /
    # (n1 n2) over the bounded band frame — pure integer until the
    # one closing division, with the band where the maximum gap
    # occurs.  The train/serve drift gate in its exact form.
    oracle="""
    WITH b AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100000 AS band,
             CASE WHEN EXTRACT(year FROM o_orderdate) < 1998
                  THEN 0 ELSE 1 END AS grp
      FROM orders
    ),
    h AS (
      SELECT band,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM b GROUP BY band
    ),
    n AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM h
    ),
    cum AS (
      SELECT band,
             CAST(SUM(c1) OVER (ORDER BY band) AS BIGINT) AS k1,
             CAST(SUM(c2) OVER (ORDER BY band) AS BIGINT) AS k2
      FROM h
    ),
    gaps AS (
      SELECT cum.band, ABS(cum.k1 * n.n2 - cum.k2 * n.n1) AS g
      FROM cum CROSS JOIN n
    ),
    mx AS (SELECT CAST(MAX(g) AS BIGINT) AS gmax FROM gaps)
    SELECT n.n1 AS n_pre, n.n2 AS n_post,
           round(CAST(mx.gmax AS DOUBLE) / (CAST(n.n1 AS DOUBLE) * n.n2), 9)
             AS ks_statistic,
           (SELECT MIN(band) FROM gaps WHERE g = mx.gmax) AS ks_band
    FROM n CROSS JOIN mx
    """,
)


def _dksdrift(spark, sf_dir):
    """Banded integer two-sample KS between the year halves."""
    o = t(spark, sf_dir, "orders")
    b = o.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " div 100000"
        ).alias("band"),
        F.when(F.year("o_orderdate") < 1998, 0).otherwise(1).alias("grp"),
    )
    h = b.groupBy("band").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("c2"),
    )
    n = h.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    w = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = h.select(
        "band",
        F.sum("c1").over(w).cast("long").alias("k1"),
        F.sum("c2").over(w).cast("long").alias("k2"),
    )
    gaps = cum.crossJoin(F.broadcast(n)).select(
        "band",
        "n1",
        "n2",
        F.abs(F.col("k1") * F.col("n2") - F.col("k2") * F.col("n1")).alias("g"),
    ).localCheckpoint(eager=False)
    mx = gaps.agg(F.max("g").alias("gmax"))
    out = gaps.crossJoin(F.broadcast(mx))
    return out.agg(
        F.first("n1").alias("n_pre"),
        F.first("n2").alias("n_post"),
        F.round(
            F.first(
                F.col("gmax").cast("double")
                / (F.col("n1").cast("double") * F.col("n2"))
            ),
            9,
        ).alias("ks_statistic"),
        F.min(F.when(F.col("g") == F.col("gmax"), F.col("band"))).alias(
            "ks_band"
        ),
    )


CATALOG["ml_feature_drift_ks_banded"].fn = _dksdrift
