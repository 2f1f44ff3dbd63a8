"""Round-14 wave 2: partition-agreement metrics between the two
natural document labelings (lang vs source) — the pair-counting family
(Rand / adjusted Rand, Fowlkes-Mallows) and the information-theoretic
family (normalized mutual information, V-measure), plus purity /
inverse purity with their harmonic mean.  These are the standard
cluster-vs-truth agreement scores an LLM-curation pipeline runs after
any clustering/dedup pass; here the lang x source contingency table is
the fixture.

Scale shape: ONE scan of documents into the bounded lang x source
contingency (|langs| * |sources| cells), marginals re-aggregated from
the cells — every join after the first groupBy touches only the tiny
frame.  Exactness: pair counts C(n,2) stay HUGEINT/decimal(38,0)
(n^4-scale products); entropy terms follow the established picounit
recipe — ln rounded at 6dp, the per-cell (p * ln) term rounded at 12dp
and quantized to integer picounits BEFORE the cross-cell sum
(q38 part_name_brand_mi idiom); final ratios are single IEEE
assemblies.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, t

# Shared contingency CTE: lang x source cell counts + marginals + total.
_CELLS_CTES = """cells AS MATERIALIZED (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    ml AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS a FROM cells GROUP BY 1),
    ms AS (SELECT source, CAST(SUM(c) AS BIGINT) AS b FROM cells GROUP BY 1),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)"""


def _cells_frames(spark, sf_dir):
    """Spark twin of _CELLS_CTES: (cells, ml, ms, nn) DataFrames."""
    d = t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count("*").cast("long").alias("c"))
    ml = cells.groupBy("lang").agg(F.sum("c").cast("long").alias("a"))
    ms = cells.groupBy("source").agg(F.sum("c").cast("long").alias("b"))
    nn = cells.agg(F.sum("c").cast("long").alias("n"))
    return cells, ml, ms, nn


def _c2(x):
    """C(x, 2) as an exact decimal expression (Spark side)."""
    return x.cast("decimal(38,0)") * (x - 1) / 2


register(
    "ml_adjusted_rand_lang_source",
    # Rand index and its chance-corrected form over the pair universe:
    # same-pairs-in-both = sum_ij C(n_ij,2); row/col pair masses a, b;
    # ARI = (TP - a*b/M) / ((a+b)/2 - a*b/M) with M = C(n,2).  All
    # counts exact (a*b is n^4-scale -> HUGEINT); one final assembly.
    oracle=f"""
    WITH {_CELLS_CTES},
    pc AS (
      SELECT CAST(SUM(CAST(c AS HUGEINT) * (c - 1) / 2) AS HUGEINT) AS tp
      FROM cells
    ),
    pa AS (SELECT CAST(SUM(CAST(a AS HUGEINT) * (a - 1) / 2) AS HUGEINT) AS sa FROM ml),
    pb AS (SELECT CAST(SUM(CAST(b AS HUGEINT) * (b - 1) / 2) AS HUGEINT) AS sb FROM ms)
    SELECT n AS n_docs,
           round((CAST(n AS HUGEINT) * (n - 1) / 2 - sa - sb + 2 * tp)
                 / (CAST(n AS DOUBLE) * (n - 1) / 2), 9) AS rand_index,
           round((CAST(tp AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (n - 1) / 2))
                 / ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2
                    - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (n - 1) / 2)), 9) AS ari
    FROM pc CROSS JOIN pa CROSS JOIN pb CROSS JOIN nn
    """,
)


def _dari(spark, sf_dir):
    """Adjusted Rand: exact pair-count masses, one-row assembly."""
    cells, ml, ms, nn = _cells_frames(spark, sf_dir)
    pc = cells.agg(F.sum(_c2(F.col("c"))).cast("decimal(38,0)").alias("tp"))
    pa = ml.agg(F.sum(_c2(F.col("a"))).cast("decimal(38,0)").alias("sa"))
    pb = ms.agg(F.sum(_c2(F.col("b"))).cast("decimal(38,0)").alias("sb"))
    r = (
        pc.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(pb))
        .crossJoin(F.broadcast(nn))
    )
    nd = F.col("n").cast("double")
    m = nd * (F.col("n") - 1) / 2
    sad = F.col("sa").cast("double")
    sbd = F.col("sb").cast("double")
    return r.select(
        F.col("n").alias("n_docs"),
        F.round(
            (
                (
                    F.col("n").cast("decimal(38,0)") * (F.col("n") - 1) / 2
                    - F.col("sa")
                    - F.col("sb")
                    + 2 * F.col("tp")
                )
                / m
            ),
            9,
        ).alias("rand_index"),
        F.round(
            (F.col("tp").cast("double") - sad * sbd / m)
            / ((sad + sbd) / 2 - sad * sbd / m),
            9,
        ).alias("ari"),
    )


CATALOG["ml_adjusted_rand_lang_source"].fn = _dari


register(
    "ml_fowlkes_mallows_lang_source",
    # Fowlkes-Mallows: TP / sqrt(a * b) over the pair universe, with
    # the two pair-precision/recall components reported alongside.
    # sqrt of an exact double is IEEE-exact cross-engine.
    oracle=f"""
    WITH {_CELLS_CTES},
    pc AS (
      SELECT CAST(SUM(CAST(c AS HUGEINT) * (c - 1) / 2) AS HUGEINT) AS tp
      FROM cells
    ),
    pa AS (SELECT CAST(SUM(CAST(a AS HUGEINT) * (a - 1) / 2) AS HUGEINT) AS sa FROM ml),
    pb AS (SELECT CAST(SUM(CAST(b AS HUGEINT) * (b - 1) / 2) AS HUGEINT) AS sb FROM ms)
    SELECT n AS n_docs,
           round(CAST(tp AS DOUBLE) / sa, 9) AS pair_recall_lang,
           round(CAST(tp AS DOUBLE) / sb, 9) AS pair_recall_source,
           round(CAST(tp AS DOUBLE)
                 / sqrt(CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)), 9)
             AS fowlkes_mallows
    FROM pc CROSS JOIN pa CROSS JOIN pb CROSS JOIN nn
    """,
)


def _dfm(spark, sf_dir):
    """Fowlkes-Mallows off the same exact pair-count masses."""
    cells, ml, ms, nn = _cells_frames(spark, sf_dir)
    pc = cells.agg(F.sum(_c2(F.col("c"))).cast("decimal(38,0)").alias("tp"))
    pa = ml.agg(F.sum(_c2(F.col("a"))).cast("decimal(38,0)").alias("sa"))
    pb = ms.agg(F.sum(_c2(F.col("b"))).cast("decimal(38,0)").alias("sb"))
    r = (
        pc.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(pb))
        .crossJoin(F.broadcast(nn))
    )
    tpd = F.col("tp").cast("double")
    return r.select(
        F.col("n").alias("n_docs"),
        F.round(tpd / F.col("sa"), 9).alias("pair_recall_lang"),
        F.round(tpd / F.col("sb"), 9).alias("pair_recall_source"),
        F.round(
            tpd / F.sqrt(F.col("sa").cast("double") * F.col("sb").cast("double")), 9
        ).alias("fowlkes_mallows"),
    )


CATALOG["ml_fowlkes_mallows_lang_source"].fn = _dfm


register(
    "ml_nmi_lang_source",
    # Normalized mutual information (arithmetic-mean normalization):
    # NMI = 2*I(U;V) / (H(U) + H(V)).  Every entropy/MI ingredient
    # follows the picounit recipe: ln at 6dp, per-cell (p * ln) at
    # 12dp, integer picounit sums, one final ratio.
    oracle=f"""
    WITH {_CELLS_CTES},
    mi AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(cells.c AS DOUBLE) / nn.n)
               * round(ln(CAST(CAST(cells.c AS HUGEINT) * nn.n AS DOUBLE)
                          / (CAST(ml.a AS HUGEINT) * ms.b)), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi12
      FROM cells JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN nn
    ),
    hu AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(a AS DOUBLE) / nn.n)
               * round(ln(CAST(nn.n AS DOUBLE) / a), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hu12
      FROM ml CROSS JOIN nn
    ),
    hv AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(b AS DOUBLE) / nn.n)
               * round(ln(CAST(nn.n AS DOUBLE) / b), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hv12
      FROM ms CROSS JOIN nn
    )
    SELECT (SELECT n FROM nn) AS n_docs,
           round(mi12 / 1000000000000.0, 6) AS mi_nats,
           round(hu12 / 1000000000000.0, 6) AS h_lang,
           round(hv12 / 1000000000000.0, 6) AS h_source,
           round(2.0 * mi12 / (hu12 + hv12), 6) AS nmi
    FROM mi CROSS JOIN hu CROSS JOIN hv
    """,
)


def _dnmi(spark, sf_dir):
    """NMI via picounit-quantized entropy sums over the contingency."""
    cells, ml, ms, nn = _cells_frames(spark, sf_dir)

    def _pico(p_num, p_den, ln_arg):
        return F.floor(
            F.round(
                (p_num.cast("double") / p_den) * F.round(F.log(ln_arg), 6), 12
            )
            * F.lit(1000000000000)
            + F.lit(0.5)
        )

    joined = (
        cells.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(nn))
    )
    mi = joined.agg(
        F.sum(
            _pico(
                F.col("c"),
                F.col("n"),
                (F.col("c").cast("decimal(38,0)") * F.col("n")).cast("double")
                / (F.col("a").cast("decimal(38,0)") * F.col("b")),
            )
        )
        .cast("long")
        .alias("mi12")
    )
    hu = (
        ml.crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                _pico(F.col("a"), F.col("n"), F.col("n").cast("double") / F.col("a"))
            )
            .cast("long")
            .alias("hu12")
        )
    )
    hv = (
        ms.crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                _pico(F.col("b"), F.col("n"), F.col("n").cast("double") / F.col("b"))
            )
            .cast("long")
            .alias("hv12")
        )
    )
    r = (
        mi.crossJoin(F.broadcast(hu))
        .crossJoin(F.broadcast(hv))
        .crossJoin(F.broadcast(nn))
    )
    return r.select(
        F.col("n").alias("n_docs"),
        F.round(F.col("mi12") / F.lit(1000000000000.0), 6).alias("mi_nats"),
        F.round(F.col("hu12") / F.lit(1000000000000.0), 6).alias("h_lang"),
        F.round(F.col("hv12") / F.lit(1000000000000.0), 6).alias("h_source"),
        F.round(F.lit(2.0) * F.col("mi12") / (F.col("hu12") + F.col("hv12")), 6).alias(
            "nmi"
        ),
    )


CATALOG["ml_nmi_lang_source"].fn = _dnmi


register(
    "ml_v_measure_lang_source",
    # V-measure: homogeneity h = 1 - H(U|V)/H(U), completeness
    # c = 1 - H(V|U)/H(V), V = 2hc/(h+c).  Conditional entropies come
    # from the same contingency cells with the picounit recipe:
    # H(U|V) = sum_ij (n_ij/n) ln(b_j/n_ij).
    oracle=f"""
    WITH {_CELLS_CTES},
    cond AS (
      SELECT
        CAST(SUM(CAST(floor(round((CAST(cells.c AS DOUBLE) / nn.n)
          * round(ln(CAST(ms.b AS DOUBLE) / cells.c), 6),
          12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS huv12,
        CAST(SUM(CAST(floor(round((CAST(cells.c AS DOUBLE) / nn.n)
          * round(ln(CAST(ml.a AS DOUBLE) / cells.c), 6),
          12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hvu12
      FROM cells JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN nn
    ),
    hu AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(a AS DOUBLE) / nn.n)
               * round(ln(CAST(nn.n AS DOUBLE) / a), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hu12
      FROM ml CROSS JOIN nn
    ),
    hv AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(b AS DOUBLE) / nn.n)
               * round(ln(CAST(nn.n AS DOUBLE) / b), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hv12
      FROM ms CROSS JOIN nn
    ),
    hc AS (
      SELECT (1 - CAST(huv12 AS DOUBLE) / hu12) AS h,
             (1 - CAST(hvu12 AS DOUBLE) / hv12) AS c
      FROM cond CROSS JOIN hu CROSS JOIN hv
    )
    SELECT round(h, 6) AS homogeneity, round(c, 6) AS completeness,
           round(2 * h * c / NULLIF(h + c, 0), 6) AS v_measure
    FROM hc
    """,
)


def _dvmeasure(spark, sf_dir):
    """V-measure from picounit conditional-entropy sums."""
    cells, ml, ms, nn = _cells_frames(spark, sf_dir)

    def _pico(p_num, p_den, ln_arg):
        return F.floor(
            F.round(
                (p_num.cast("double") / p_den) * F.round(F.log(ln_arg), 6), 12
            )
            * F.lit(1000000000000)
            + F.lit(0.5)
        )

    joined = (
        cells.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(nn))
    )
    cond = joined.agg(
        F.sum(
            _pico(F.col("c"), F.col("n"), F.col("b").cast("double") / F.col("c"))
        )
        .cast("long")
        .alias("huv12"),
        F.sum(
            _pico(F.col("c"), F.col("n"), F.col("a").cast("double") / F.col("c"))
        )
        .cast("long")
        .alias("hvu12"),
    )
    hu = (
        ml.crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                _pico(F.col("a"), F.col("n"), F.col("n").cast("double") / F.col("a"))
            )
            .cast("long")
            .alias("hu12")
        )
    )
    hv = (
        ms.crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                _pico(F.col("b"), F.col("n"), F.col("n").cast("double") / F.col("b"))
            )
            .cast("long")
            .alias("hv12")
        )
    )
    hc = (
        cond.crossJoin(F.broadcast(hu))
        .crossJoin(F.broadcast(hv))
        .select(
            (1 - F.col("huv12").cast("double") / F.col("hu12")).alias("h"),
            (1 - F.col("hvu12").cast("double") / F.col("hv12")).alias("c"),
        )
    )
    return hc.select(
        F.round(F.col("h"), 6).alias("homogeneity"),
        F.round(F.col("c"), 6).alias("completeness"),
        F.round(
            2 * F.col("h") * F.col("c") / F.nullif(F.col("h") + F.col("c"), F.lit(0.0)),
            6,
        ).alias("v_measure"),
    )


CATALOG["ml_v_measure_lang_source"].fn = _dvmeasure


register(
    "ml_purity_fmeasure_lang_source",
    # Purity (each source cluster claimed by its majority lang),
    # inverse purity (each lang claimed by its majority source) and
    # their harmonic mean — the cheapest agreement triple, exact
    # rationals end to end.
    oracle=f"""
    WITH {_CELLS_CTES},
    pj AS (SELECT source, MAX(c) AS mx FROM cells GROUP BY source),
    pi AS (SELECT lang, MAX(c) AS mx FROM cells GROUP BY lang),
    sums AS (
      SELECT (SELECT CAST(SUM(mx) AS BIGINT) FROM pj) AS sp,
             (SELECT CAST(SUM(mx) AS BIGINT) FROM pi) AS si,
             (SELECT n FROM nn) AS n
    )
    SELECT n AS n_docs,
           round(CAST(sp AS DOUBLE) / n, 9) AS purity,
           round(CAST(si AS DOUBLE) / n, 9) AS inverse_purity,
           round(2.0 * (CAST(sp AS DOUBLE) / n) * (CAST(si AS DOUBLE) / n)
                 / (CAST(sp AS DOUBLE) / n + CAST(si AS DOUBLE) / n), 9)
             AS f_purity
    FROM sums
    """,
)


def _dpurity(spark, sf_dir):
    """Purity / inverse purity / harmonic mean — exact rationals."""
    cells, ml, ms, nn = _cells_frames(spark, sf_dir)
    sp = cells.groupBy("source").agg(F.max("c").alias("mx")).agg(
        F.sum("mx").cast("long").alias("sp")
    )
    si = cells.groupBy("lang").agg(F.max("c").alias("mx")).agg(
        F.sum("mx").cast("long").alias("si")
    )
    r = sp.crossJoin(F.broadcast(si)).crossJoin(F.broadcast(nn))
    p = F.col("sp").cast("double") / F.col("n")
    ip = F.col("si").cast("double") / F.col("n")
    return r.select(
        F.col("n").alias("n_docs"),
        F.round(p, 9).alias("purity"),
        F.round(ip, 9).alias("inverse_purity"),
        F.round(F.lit(2.0) * p * ip / (p + ip), 9).alias("f_purity"),
    )


CATALOG["ml_purity_fmeasure_lang_source"].fn = _dpurity
