"""Round-14 wave 7: categorical association and rule-mining measures —
the full market-basket interest-measure suite over part-type pairs
(confidence both ways, lift, leverage, Jaccard, Kulczynski,
conviction), Theil's uncertainty coefficients and the Goodman-Kruskal
tau (PRE measures, both directions) on the part brand x type
table, the multiclass Matthews correlation + macro-F1 of the lang-ID
heuristic against ground truth, and the Breslow-Day homogeneity test
for the stratified odds ratios that complements r13's CMH query.

Scale shape: baskets bound the pair space (the basket_brand_pair_lift
precedent), contingency tables are bounded cell frames, the BD strata
are the 7 order years.  Exactness: pure integer counting everywhere
possible; entropy terms use the picounit recipe; the BD fitted cell
solves its quadratic with one IEEE sqrt per stratum (deterministic
identical text both engines) and micro-quantizes the per-stratum
chi-square term before the 7-row sum.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from ..ops import text as _text

register(
    "basket_ptype_rule_measures",
    # Association-rule interest measures over part-part-type pairs
    # co-occurring in an order: for the top-10 pairs by support,
    # conf(A->B), conf(B->A), lift, leverage, Jaccard, Kulczynski and
    # conviction(A->B) — all from three exact counts (nA, nB, co) and
    # the basket total.
    oracle="""
    WITH items AS MATERIALIZED (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_type AS item
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
    isup AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt FROM items GROUP BY 1),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b, CAST(COUNT(*) AS BIGINT) AS co
      FROM items i1 JOIN items i2 ON i1.ok = i2.ok AND i1.item < i2.item
      GROUP BY 1, 2
    ),
    top AS (
      SELECT a, b, co FROM pairs ORDER BY co DESC, a, b LIMIT 10
    )
    SELECT t.a, t.b, t.co,
           sa.cnt AS n_a, sb.cnt AS n_b,
           round(CAST(t.co AS DOUBLE) / nb.n, 9) AS support,
           round(CAST(t.co AS DOUBLE) / sa.cnt, 6) AS conf_a_to_b,
           round(CAST(t.co AS DOUBLE) / sb.cnt, 6) AS conf_b_to_a,
           round(CAST(t.co AS DOUBLE) * nb.n
                 / (CAST(sa.cnt AS DOUBLE) * sb.cnt), 6) AS lift,
           round(CAST(t.co AS DOUBLE) / nb.n
                 - CAST(sa.cnt AS DOUBLE) * sb.cnt
                   / (CAST(nb.n AS DOUBLE) * nb.n), 9) AS leverage,
           round(CAST(t.co AS DOUBLE) / (sa.cnt + sb.cnt - t.co), 6) AS jaccard,
           round((CAST(t.co AS DOUBLE) / sa.cnt
                  + CAST(t.co AS DOUBLE) / sb.cnt) / 2, 6) AS kulczynski,
           round((1 - CAST(sb.cnt AS DOUBLE) / nb.n)
                 / NULLIF(1 - CAST(t.co AS DOUBLE) / sa.cnt, 0), 6)
             AS conviction_a_to_b
    FROM top t
    JOIN isup sa ON sa.item = t.a
    JOIN isup sb ON sb.item = t.b
    CROSS JOIN nb
    ORDER BY t.co DESC, t.a, t.b
    """,
)


def _dbasketrules(spark, sf_dir):
    """Rule measures: basket-bounded pair join, broadcast item supports."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    items = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(F.col("l_orderkey").alias("ok"), F.col("p_type").alias("item"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nb = items.agg(F.countDistinct("ok").cast("long").alias("n"))
    isup = items.groupBy("item").agg(F.count("*").cast("long").alias("cnt"))
    i1 = items.select(F.col("ok"), F.col("item").alias("a"))
    i2 = items.select(F.col("ok"), F.col("item").alias("b"))
    pairs = (
        i1.join(i2, ["ok"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("co"))
    )
    top = pairs.orderBy(F.desc("co"), "a", "b").limit(10)
    r = (
        top.join(F.broadcast(isup.withColumnRenamed("item", "a").withColumnRenamed("cnt", "n_a")), "a")
        .join(F.broadcast(isup.withColumnRenamed("item", "b").withColumnRenamed("cnt", "n_b")), "b")
        .crossJoin(F.broadcast(nb))
    )
    cod = F.col("co").cast("double")
    nad = F.col("n_a").cast("double")
    nbd = F.col("n_b").cast("double")
    nd = F.col("n").cast("double")
    return r.select(
        "a",
        "b",
        "co",
        "n_a",
        "n_b",
        F.round(cod / F.col("n"), 9).alias("support"),
        F.round(cod / F.col("n_a"), 6).alias("conf_a_to_b"),
        F.round(cod / F.col("n_b"), 6).alias("conf_b_to_a"),
        F.round(cod * F.col("n") / (nad * F.col("n_b")), 6).alias("lift"),
        F.round(cod / F.col("n") - nad * F.col("n_b") / (nd * F.col("n")), 9).alias(
            "leverage"
        ),
        F.round(cod / (F.col("n_a") + F.col("n_b") - F.col("co")), 6).alias("jaccard"),
        F.round((cod / F.col("n_a") + cod / F.col("n_b")) / 2, 6).alias("kulczynski"),
        F.round(
            (1 - nbd / F.col("n"))
            / F.nullif(1 - cod / F.col("n_a"), F.lit(0.0)),
            6,
        ).alias("conviction_a_to_b"),
    ).orderBy(F.desc("co"), "a", "b")


CATALOG["basket_ptype_rule_measures"].fn = _dbasketrules


# Shared brand x type contingency (part table; bounded cells).
_BC_CTES = """cells AS MATERIALIZED (
      SELECT p_brand AS x, p_type AS y, CAST(COUNT(*) AS BIGINT) AS c
      FROM part GROUP BY 1, 2
    ),
    mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM cells GROUP BY 1),
    my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY 1),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)"""


def _bc_frames(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    cells = p.groupBy(
        F.col("p_brand").alias("x"), F.col("p_type").alias("y")
    ).agg(F.count("*").cast("long").alias("c"))
    mx = cells.groupBy("x").agg(F.sum("c").cast("long").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("c").cast("long").alias("cy"))
    nn = cells.agg(F.sum("c").cast("long").alias("n"))
    return cells, mx, my, nn


register(
    "ml_theil_u_brand_type",
    # Theil's uncertainty coefficients between part brand and
    # type: U(X|Y) = I/H(X), U(Y|X) = I/H(Y), symmetric U =
    # 2I/(H(X)+H(Y)) — the asymmetric, entropy-based cousins of
    # Cramer's V.  Picounit entropy sums throughout.
    oracle=f"""
    WITH {_BC_CTES},
    mi AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(cells.c AS DOUBLE) / nn.n)
               * round(ln(CAST(CAST(cells.c AS HUGEINT) * nn.n AS DOUBLE)
                          / (CAST(mx.cx AS HUGEINT) * my.cy)), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi12
      FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN nn
    ),
    hx AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(cx AS DOUBLE) / nn.n)
               * round(ln(CAST(nn.n AS DOUBLE) / cx), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hx12
      FROM mx CROSS JOIN nn
    ),
    hy AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(cy AS DOUBLE) / nn.n)
               * round(ln(CAST(nn.n AS DOUBLE) / cy), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hy12
      FROM my CROSS JOIN nn
    )
    SELECT round(mi12 / 1000000000000.0, 6) AS mi_nats,
           round(CAST(mi12 AS DOUBLE) / hx12, 6) AS u_brand_given_type,
           round(CAST(mi12 AS DOUBLE) / hy12, 6) AS u_type_given_brand,
           round(2.0 * mi12 / (hx12 + hy12), 6) AS u_symmetric
    FROM mi CROSS JOIN hx CROSS JOIN hy
    """,
)


def _dtheilu(spark, sf_dir):
    """Uncertainty coefficients via picounit entropy sums."""
    cells, mx, my, nn = _bc_frames(spark, sf_dir)

    def _pico(p_num, p_den, ln_arg):
        return F.floor(
            F.round((p_num.cast("double") / p_den) * F.round(F.log(ln_arg), 6), 12)
            * F.lit(1000000000000)
            + F.lit(0.5)
        )

    joined = (
        cells.join(F.broadcast(mx), "x").join(F.broadcast(my), "y").crossJoin(
            F.broadcast(nn)
        )
    )
    mi = joined.agg(
        F.sum(
            _pico(
                F.col("c"),
                F.col("n"),
                (F.col("c").cast("decimal(38,0)") * F.col("n")).cast("double")
                / (F.col("cx").cast("decimal(38,0)") * F.col("cy")),
            )
        )
        .cast("long")
        .alias("mi12")
    )
    hx = mx.crossJoin(F.broadcast(nn)).agg(
        F.sum(_pico(F.col("cx"), F.col("n"), F.col("n").cast("double") / F.col("cx")))
        .cast("long")
        .alias("hx12")
    )
    hy = my.crossJoin(F.broadcast(nn)).agg(
        F.sum(_pico(F.col("cy"), F.col("n"), F.col("n").cast("double") / F.col("cy")))
        .cast("long")
        .alias("hy12")
    )
    r = mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    return r.select(
        F.round(F.col("mi12") / F.lit(1000000000000.0), 6).alias("mi_nats"),
        F.round(F.col("mi12").cast("double") / F.col("hx12"), 6).alias(
            "u_brand_given_type"
        ),
        F.round(F.col("mi12").cast("double") / F.col("hy12"), 6).alias(
            "u_type_given_brand"
        ),
        F.round(F.lit(2.0) * F.col("mi12") / (F.col("hx12") + F.col("hy12")), 6).alias(
            "u_symmetric"
        ),
    )


CATALOG["ml_theil_u_brand_type"].fn = _dtheilu


register(
    "ml_gk_tau_brand_type",
    # Goodman-Kruskal tau, the variance-based PRE measure (the chi2-
    # family's answer to lambda): tau(Y|X) = (A - B) / (1 - B) with
    # A = sum_xy n_xy^2/(n_x * n) and B = sum_y (n_y/n)^2 (ax pairs
    # with the PREDICTED margin's B — the y marginal).  A's cell
    # terms are rationals (floor(x*1e12 + .5) of the deterministic
    # product); B clears to exact integers.
    oracle=f"""
    WITH {_BC_CTES},
    ax AS (
      SELECT CAST(SUM(CAST(floor(CAST(cells.c AS DOUBLE) * cells.c
               / (CAST(mx.cx AS DOUBLE) * nn.n) * 1000000000000 + 0.5)
               AS HUGEINT)) AS BIGINT) AS a12
      FROM cells JOIN mx USING (x) CROSS JOIN nn
    ),
    ay AS (
      SELECT CAST(SUM(CAST(floor(CAST(cells.c AS DOUBLE) * cells.c
               / (CAST(my.cy AS DOUBLE) * nn.n) * 1000000000000 + 0.5)
               AS HUGEINT)) AS BIGINT) AS a12
      FROM cells JOIN my USING (y) CROSS JOIN nn
    ),
    bx AS (SELECT SUM(CAST(cx AS HUGEINT) * cx) AS b2 FROM mx),
    by2 AS (SELECT SUM(CAST(cy AS HUGEINT) * cy) AS b2 FROM my)
    SELECT
      round((ax.a12 / 1000000000000.0
             - CAST(by2.b2 AS DOUBLE) / (CAST(nn.n AS DOUBLE) * nn.n))
            / (1 - CAST(by2.b2 AS DOUBLE) / (CAST(nn.n AS DOUBLE) * nn.n)), 6)
        AS tau_type_given_brand,
      round((ay.a12 / 1000000000000.0
             - CAST(bx.b2 AS DOUBLE) / (CAST(nn.n AS DOUBLE) * nn.n))
            / (1 - CAST(bx.b2 AS DOUBLE) / (CAST(nn.n AS DOUBLE) * nn.n)), 6)
        AS tau_brand_given_type
    FROM ax CROSS JOIN ay CROSS JOIN bx CROSS JOIN by2 CROSS JOIN nn
    """,
)


def _dgktau(spark, sf_dir):
    """GK tau both directions — quantized cell terms, exact marginals."""
    cells, mx, my, nn = _bc_frames(spark, sf_dir)

    def _a12(margin, key, mcol):
        j = cells.join(F.broadcast(margin), key).crossJoin(F.broadcast(nn))
        return j.agg(
            F.sum(
                F.floor(
                    F.col("c").cast("double")
                    * F.col("c")
                    / (F.col(mcol).cast("double") * F.col("n"))
                    * F.lit(1000000000000)
                    + F.lit(0.5)
                ).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("a12")
        )

    ax = _a12(mx, "x", "cx").withColumnRenamed("a12", "ax12")
    ay = _a12(my, "y", "cy").withColumnRenamed("a12", "ay12")
    bx = mx.agg(F.sum(F.col("cx").cast("decimal(38,0)") * F.col("cx")).alias("bx2"))
    by2 = my.agg(F.sum(F.col("cy").cast("decimal(38,0)") * F.col("cy")).alias("by2"))
    r = (
        ax.crossJoin(F.broadcast(ay))
        .crossJoin(F.broadcast(bx))
        .crossJoin(F.broadcast(by2))
        .crossJoin(F.broadcast(nn))
    )
    nd = F.col("n").cast("double")
    by_share = F.col("by2").cast("double") / (nd * F.col("n"))
    bx_share = F.col("bx2").cast("double") / (nd * F.col("n"))
    return r.select(
        F.round(
            (F.col("ax12") / F.lit(1000000000000.0) - by_share) / (1 - by_share), 6
        ).alias("tau_type_given_brand"),
        F.round(
            (F.col("ay12") / F.lit(1000000000000.0) - bx_share) / (1 - bx_share), 6
        ).alias("tau_brand_given_type"),
    )


CATALOG["ml_gk_tau_brand_type"].fn = _dgktau


register(
    "ml_mcc_macro_f1_lang",
    # Multiclass Matthews correlation (Gorodkin's R_k) and macro-F1 of
    # the lang-ID heuristic against the true lang label: R_k =
    # (c*s - sum p_k t_k) / sqrt((s^2 - sum p^2)(s^2 - sum t^2)) from
    # exact confusion-matrix integers; per-class F1 = 2a_k/(p_k + t_k)
    # quantizes to picounits before the macro mean.
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|a|is)\\b')) AS s_en,
             len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|los|es)\\b')) AS s_es,
             len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ein|ist|nicht)\\b')) AS s_de,
             len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|un|est)\\b')) AS s_fr
      FROM documents
    ),
    cm AS MATERIALIZED (
      SELECT lang AS truth,
             CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
                  WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                  WHEN s_de >= s_fr THEN 'de'
                  ELSE 'fr' END AS pred,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM scored GROUP BY 1, 2
    ),
    diag AS (
      SELECT CAST(SUM(CASE WHEN truth = pred THEN c ELSE 0 END) AS BIGINT) AS agree,
             CAST(SUM(c) AS BIGINT) AS s
      FROM cm
    ),
    pt AS (SELECT truth AS cls, CAST(SUM(c) AS BIGINT) AS tk FROM cm GROUP BY 1),
    pp AS (SELECT pred AS cls, CAST(SUM(c) AS BIGINT) AS pk FROM cm GROUP BY 1),
    cross_m AS (
      SELECT CAST(SUM(COALESCE(pt.tk, 0) * COALESCE(pp.pk, 0)) AS HUGEINT) AS spt,
             CAST((SELECT SUM(CAST(tk AS HUGEINT) * tk) FROM pt) AS HUGEINT) AS st2,
             CAST((SELECT SUM(CAST(pk AS HUGEINT) * pk) FROM pp) AS HUGEINT) AS sp2
      FROM pt FULL OUTER JOIN pp USING (cls)
    ),
    f1 AS (
      SELECT CAST(SUM(CAST(floor(2 * CAST(COALESCE(dg.a, 0) AS DOUBLE)
               / (COALESCE(pt.tk, 0) + COALESCE(pp.pk, 0))
               * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS f12,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM pt
      FULL OUTER JOIN pp USING (cls)
      LEFT JOIN (SELECT truth AS cls, c AS a FROM cm WHERE truth = pred) dg
        USING (cls)
    )
    SELECT diag.s AS n_docs, diag.agree,
           round(CAST(diag.agree AS DOUBLE) / diag.s, 6) AS accuracy,
           round((CAST(diag.agree AS DOUBLE) * diag.s - CAST(spt AS DOUBLE))
                 / sqrt((CAST(diag.s AS DOUBLE) * diag.s - CAST(sp2 AS DOUBLE))
                        * (CAST(diag.s AS DOUBLE) * diag.s
                           - CAST(st2 AS DOUBLE))), 6) AS mcc_rk,
           round(CAST(f12 AS DOUBLE) / k / 1000000000000.0, 6) AS macro_f1,
           f1.k AS n_classes
    FROM diag CROSS JOIN cross_m CROSS JOIN f1
    """,
)


def _dmcc(spark, sf_dir):
    """Multiclass MCC + macro-F1 of the lang-ID heuristic vs truth."""
    d = t(spark, sf_dir, "documents")
    cm = (
        d.select(
            F.col("lang").alias("truth"),
            _text.lang_id(F.col("text")).alias("pred"),
        )
        .groupBy("truth", "pred")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    diag = cm.agg(
        F.sum(F.when(F.col("truth") == F.col("pred"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("agree"),
        F.sum("c").cast("long").alias("s"),
    )
    pt = cm.groupBy(F.col("truth").alias("cls")).agg(
        F.sum("c").cast("long").alias("tk")
    )
    pp = cm.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("c").cast("long").alias("pk")
    )
    both = pt.join(pp, "cls", "full").select(
        "cls",
        F.coalesce(F.col("tk"), F.lit(0)).alias("tk"),
        F.coalesce(F.col("pk"), F.lit(0)).alias("pk"),
    )
    cross_m = both.agg(
        F.sum(F.col("tk").cast("decimal(38,0)") * F.col("pk")).alias("spt"),
        F.sum(F.col("tk").cast("decimal(38,0)") * F.col("tk")).alias("st2"),
        F.sum(F.col("pk").cast("decimal(38,0)") * F.col("pk")).alias("sp2"),
    )
    dg = cm.filter(F.col("truth") == F.col("pred")).select(
        F.col("truth").alias("cls"), F.col("c").alias("a")
    )
    f1 = (
        both.join(dg, "cls", "left")
        .agg(
            F.sum(
                F.floor(
                    2
                    * F.coalesce(F.col("a"), F.lit(0)).cast("double")
                    / (F.col("tk") + F.col("pk"))
                    * F.lit(1000000000000)
                    + F.lit(0.5)
                )
            )
            .cast("long")
            .alias("f12"),
            F.count("*").cast("long").alias("k"),
        )
    )
    r = diag.crossJoin(F.broadcast(cross_m)).crossJoin(F.broadcast(f1))
    sd = F.col("s").cast("double")
    return r.select(
        F.col("s").alias("n_docs"),
        "agree",
        F.round(F.col("agree").cast("double") / F.col("s"), 6).alias("accuracy"),
        F.round(
            (F.col("agree").cast("double") * F.col("s") - F.col("spt").cast("double"))
            / F.sqrt(
                (sd * F.col("s") - F.col("sp2").cast("double"))
                * (sd * F.col("s") - F.col("st2").cast("double"))
            ),
            6,
        ).alias("mcc_rk"),
        F.round(
            F.col("f12").cast("double") / F.col("k") / F.lit(1000000000000.0), 6
        ).alias("macro_f1"),
        F.col("k").alias("n_classes"),
    )


CATALOG["ml_mcc_macro_f1_lang"].fn = _dmcc


register(
    "ml_breslow_day_homogeneity",
    # Breslow-Day test that the urgent x above-median-value odds ratio
    # is HOMOGENEOUS across the 7 order-year strata (the companion to
    # r13's CMH common-OR test): under the MH common OR psi, each
    # stratum's fitted cell a~ solves (1-psi)a^2 + ((n-r1-c1) +
    # psi(r1+c1))a - psi*r1*c1 = 0 (the root inside [max(0, r1+c1-n),
    # min(r1, c1)]), Var = 1/(1/a~ + 1/(r1-a~) + 1/(c1-a~) +
    # 1/(n-r1-c1+a~)), BD = sum (a - a~)^2 / Var.  One sqrt per
    # stratum, identical expression text in both engines; per-stratum
    # terms quantize to nanounits before the 7-row sum.
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    med AS (SELECT CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS m2 FROM x),
    cells AS (
      SELECT yr,
             CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM x CROSS JOIN med GROUP BY yr
    ),
    mh AS (
      SELECT CAST(SUM(CAST(floor(CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                     / (a + b + c + d) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS ad6,
             CAST(SUM(CAST(floor(CAST(CAST(b AS HUGEINT) * c AS DOUBLE)
                     / (a + b + c + d) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS bc6
      FROM cells
    ),
    fit AS (
      SELECT a, b, c, d,
             a + b AS r1, a + c AS c1, a + b + c + d AS n,
             CAST(ad6 AS DOUBLE) / bc6 AS psi
      FROM cells CROSS JOIN mh
    ),
    quad AS (
      SELECT a, r1, c1, n, psi,
             1 - psi AS qa,
             (n - r1 - c1) + psi * (r1 + c1) AS qb,
             -psi * (CAST(r1 AS DOUBLE) * c1) AS qc
      FROM fit
    ),
    root AS (
      SELECT a, r1, c1, n,
             CASE
               WHEN ABS(qa) < 1e-12 THEN -qc / qb
               WHEN (-qb + sqrt(qb * qb - 4 * qa * qc)) / (2 * qa)
                    >= GREATEST(0.0, CAST(r1 + c1 - n AS DOUBLE))
                AND (-qb + sqrt(qb * qb - 4 * qa * qc)) / (2 * qa)
                    <= LEAST(CAST(r1 AS DOUBLE), CAST(c1 AS DOUBLE))
                 THEN (-qb + sqrt(qb * qb - 4 * qa * qc)) / (2 * qa)
               ELSE (-qb - sqrt(qb * qb - 4 * qa * qc)) / (2 * qa)
             END AS af
      FROM quad
    ),
    terms AS (
      SELECT CAST(floor((a - af) * (a - af)
               * (1.0 / af + 1.0 / (r1 - af) + 1.0 / (c1 - af)
                  + 1.0 / (n - r1 - c1 + af))
               * 1000000000.0 + 0.5) AS BIGINT) AS t9
      FROM root
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           round(CAST(SUM(t9) AS BIGINT) / 1000000000.0, 6) AS bd_chi2
    FROM terms
    """,
)


def _dbreslowday(spark, sf_dir):
    """Breslow-Day off the shared CMH stratified cells."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "urgent"
        ),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    med = x.agg((2 * F.percentile("cents", 0.5)).cast("long").alias("m2"))
    hi = 2 * F.col("cents") > F.col("m2")
    lo = 2 * F.col("cents") <= F.col("m2")
    cells = (
        x.crossJoin(F.broadcast(med))
        .groupBy("yr")
        .agg(
            F.sum(F.when((F.col("urgent") == 1) & hi, 1).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when((F.col("urgent") == 1) & lo, 1).otherwise(0))
            .cast("long")
            .alias("b"),
            F.sum(F.when((F.col("urgent") == 0) & hi, 1).otherwise(0))
            .cast("long")
            .alias("c"),
            F.sum(F.when((F.col("urgent") == 0) & lo, 1).otherwise(0))
            .cast("long")
            .alias("d"),
        )
        .localCheckpoint(eager=False)
    )
    a, b, c, d = (F.col(k) for k in "abcd")
    nk = a + b + c + d
    mh = cells.agg(
        F.sum(
            F.floor(
                (a.cast("decimal(38,0)") * d).cast("double") / nk * F.lit(1000000.0)
                + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("ad6"),
        F.sum(
            F.floor(
                (b.cast("decimal(38,0)") * c).cast("double") / nk * F.lit(1000000.0)
                + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("bc6"),
    )
    fit = cells.crossJoin(F.broadcast(mh)).select(
        "a",
        (a + b).alias("r1"),
        (a + c).alias("c1"),
        nk.alias("n"),
        (F.col("ad6").cast("double") / F.col("bc6")).alias("psi"),
    )
    quad = fit.select(
        "a",
        "r1",
        "c1",
        "n",
        (1 - F.col("psi")).alias("qa"),
        ((F.col("n") - F.col("r1") - F.col("c1")) + F.col("psi") * (F.col("r1") + F.col("c1"))).alias("qb"),
        (-F.col("psi") * (F.col("r1").cast("double") * F.col("c1"))).alias("qc"),
    )
    disc = F.sqrt(F.col("qb") * F.col("qb") - 4 * F.col("qa") * F.col("qc"))
    root1 = (-F.col("qb") + disc) / (2 * F.col("qa"))
    root2 = (-F.col("qb") - disc) / (2 * F.col("qa"))
    lo_b = F.greatest(F.lit(0.0), (F.col("r1") + F.col("c1") - F.col("n")).cast("double"))
    hi_b = F.least(F.col("r1").cast("double"), F.col("c1").cast("double"))
    root = quad.select(
        "a",
        "r1",
        "c1",
        "n",
        F.when(F.abs(F.col("qa")) < 1e-12, -F.col("qc") / F.col("qb"))
        .when((root1 >= lo_b) & (root1 <= hi_b), root1)
        .otherwise(root2)
        .alias("af"),
    )
    af = F.col("af")
    terms = root.select(
        F.floor(
            (F.col("a") - af)
            * (F.col("a") - af)
            * (
                F.lit(1.0) / af
                + F.lit(1.0) / (F.col("r1") - af)
                + F.lit(1.0) / (F.col("c1") - af)
                + F.lit(1.0) / (F.col("n") - F.col("r1") - F.col("c1") + af)
            )
            * F.lit(1000000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t9")
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.round(F.sum("t9").cast("long") / F.lit(1000000000.0), 6).alias("bd_chi2"),
    )


CATALOG["ml_breslow_day_homogeneity"].fn = _dbreslowday
