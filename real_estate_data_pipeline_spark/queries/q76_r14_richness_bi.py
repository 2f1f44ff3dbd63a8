"""Round-14 wave 9: lexical-richness estimators and three classical
BI/economics rollups — the log-based richness bundle per language
(Guiraud R, Herdan C, Dugast U, Maas a^2, Summer S), the mean
segmental type-token ratio (MSTTR, the length-robust TTR), the order
cohort-age revenue triangle, the bullwhip variance ratio
(order-demand vs shipment-flow variability), and the Fisher ideal
price/volume index decomposition extending the Laspeyres-only r12
query.

Scale shape: one tokenize/groupBy pass per text query (segments are
per-doc, so the MSTTR windowless); the BI queries are single grouped
aggregates over orders/lineitem with exact decimal moments.
Exactness: V/sqrt(N) is IEEE-exact; every ln is rounded at 6dp before
use; MSTTR is exact integers until one division; index numerators/
denominators are exact decimal sums (quantity integer-valued, prices
2dp) with one final division chain.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t, tok_arr

register(
    "doc_lexical_richness_by_lang",
    # The classical richness transforms of (N tokens, V types) per
    # language: Guiraud R = V/sqrt(N), Herdan C = lnV/lnN, Dugast U =
    # (lnN)^2/(lnN - lnV), Maas a^2 = (lnN - lnV)/(lnN)^2, Summer S =
    # ln(lnV)/ln(lnN) — the size-robust complements to the r12 Brunet/
    # Sichel/Honore family.  ln at 6dp; nested ln takes the rounded
    # inner value.
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                      '\\s+'), x -> x <> '')) AS tok
      FROM documents
    ),
    nv AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      FROM tok GROUP BY lang
    )
    SELECT lang, n AS n_tokens, v AS n_types,
           round(CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE)), 6) AS guiraud_r,
           round(round(ln(CAST(v AS DOUBLE)), 6)
                 / round(ln(CAST(n AS DOUBLE)), 6), 6) AS herdan_c,
           round(round(ln(CAST(n AS DOUBLE)), 6) * round(ln(CAST(n AS DOUBLE)), 6)
                 / NULLIF(round(ln(CAST(n AS DOUBLE)), 6)
                          - round(ln(CAST(v AS DOUBLE)), 6), 0), 6) AS dugast_u,
           round((round(ln(CAST(n AS DOUBLE)), 6)
                  - round(ln(CAST(v AS DOUBLE)), 6))
                 / (round(ln(CAST(n AS DOUBLE)), 6)
                    * round(ln(CAST(n AS DOUBLE)), 6)), 9) AS maas_a2,
           round(round(ln(round(ln(CAST(v AS DOUBLE)), 6)), 6)
                 / round(ln(round(ln(CAST(n AS DOUBLE)), 6)), 6), 6) AS summer_s
    FROM nv ORDER BY lang
    """,
)


def _drichness(spark, sf_dir):
    """Richness bundle — one token pass, per-lang (N, V) rollup."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(tok_arr(F.col("text"))).alias("tok"))
    nv = tok.groupBy("lang").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("tok").cast("long").alias("v"),
    )
    ln_n = F.round(F.log(F.col("n").cast("double")), 6)
    ln_v = F.round(F.log(F.col("v").cast("double")), 6)
    return nv.select(
        "lang",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        F.round(F.col("v").cast("double") / F.sqrt(F.col("n").cast("double")), 6).alias(
            "guiraud_r"
        ),
        F.round(ln_v / ln_n, 6).alias("herdan_c"),
        F.round(ln_n * ln_n / F.nullif(ln_n - ln_v, F.lit(0.0)), 6).alias("dugast_u"),
        F.round((ln_n - ln_v) / (ln_n * ln_n), 9).alias("maas_a2"),
        F.round(F.round(F.log(ln_v), 6) / F.round(F.log(ln_n), 6), 6).alias(
            "summer_s"
        ),
    ).orderBy("lang")


CATALOG["doc_lexical_richness_by_lang"].fn = _drichness


register(
    "doc_msttr_segmental_ttr",
    # Mean segmental TTR: each document's token stream is cut into
    # consecutive 25-token segments (full segments only — MSTTR's
    # defining guard against length bias; 25 because the corpus docs
    # run 10-99 tokens, so 100-token segments would all be partial);
    # TTR per segment is
    # distinct/25 and the report is exact integers until the final
    # divisions.
    oracle="""
    WITH tk AS (
      SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                 x -> x <> '') AS tk
      FROM documents
    ),
    pos AS (
      SELECT doc_id, i AS p, tk[i] AS tok
      FROM tk, (SELECT unnest(range(1, (SELECT MAX(len(tk)) FROM tk) + 1)) AS i) g
      WHERE i <= len(tk)
    ),
    seg AS (
      SELECT doc_id, (p - 1) // 25 AS seg,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_typ
      FROM pos GROUP BY doc_id, (p - 1) // 25
    ),
    full_seg AS (SELECT n_typ FROM seg WHERE n_tok = 25)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_segments,
           round(CAST(SUM(n_typ) AS DOUBLE) / (25.0 * COUNT(*)), 6) AS msttr,
           round(CAST(MIN(n_typ) AS DOUBLE) / 25, 6) AS min_segment_ttr,
           round(CAST(MAX(n_typ) AS DOUBLE) / 25, 6) AS max_segment_ttr
    FROM full_seg
    """,
)


def _dmsttr(spark, sf_dir):
    """MSTTR — per-doc 25-token segments, no global ordering needed."""
    d = t(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(tok_arr(F.col("text"))).alias("p0", "tok")
    )
    seg = pos.groupBy(
        "doc_id", F.expr("p0 div 25").alias("seg")
    ).agg(
        F.count("*").cast("long").alias("n_tok"),
        F.countDistinct("tok").cast("long").alias("n_typ"),
    )
    full_seg = seg.filter(F.col("n_tok") == 25)
    return full_seg.agg(
        F.count("*").cast("long").alias("n_segments"),
        F.round(
            F.sum("n_typ").cast("double") / (F.lit(25.0) * F.count("*")), 6
        ).alias("msttr"),
        F.round(F.min("n_typ").cast("double") / 25, 6).alias("min_segment_ttr"),
        F.round(F.max("n_typ").cast("double") / 25, 6).alias("max_segment_ttr"),
    )


CATALOG["doc_msttr_segmental_ttr"].fn = _dmsttr


register(
    "cust_order_cohort_triangle",
    # The order cohort-age revenue triangle: customers grouped by
    # first-order YEAR (the cohort), revenue rolled up by years since
    # first order (the age) — the orders-side counterpart of the
    # events-side evt_cohort_retention, with exact decimal revenue and
    # per-cohort share of the age-0 base.
    oracle="""
    WITH first_o AS (
      SELECT o_custkey, CAST(MIN(EXTRACT(year FROM o_orderdate)) AS BIGINT)
               AS cohort
      FROM orders GROUP BY o_custkey
    ),
    tri AS (
      SELECT f.cohort,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) - f.cohort AS age,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents,
             CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS buyers
      FROM orders o JOIN first_o f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    base AS (
      SELECT cohort, cents AS base_cents FROM tri WHERE age = 0
    )
    SELECT t.cohort, t.age, t.buyers,
           round(CAST(t.cents AS DOUBLE) / 100, 2) AS revenue,
           round(CAST(t.cents AS DOUBLE) / b.base_cents, 6) AS vs_age0
    FROM tri t JOIN base b USING (cohort)
    ORDER BY t.cohort, t.age
    """,
)


def _dcohorttri(spark, sf_dir):
    """Cohort-age triangle — two grouped passes sharing one shuffle key."""
    o = t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).cast("long").alias("cohort")
    )
    tri = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort",
            (F.year("o_orderdate").cast("long") - F.col("cohort")).alias("age"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast(DEC)) * 100)
            .cast("long")
            .alias("cents"),
            F.countDistinct("o_custkey").cast("long").alias("buyers"),
        )
    )
    base = tri.filter(F.col("age") == 0).select(
        "cohort", F.col("cents").alias("base_cents")
    )
    return (
        tri.join(F.broadcast(base), "cohort")
        .select(
            "cohort",
            "age",
            "buyers",
            F.round(F.col("cents").cast("double") / 100, 2).alias("revenue"),
            F.round(F.col("cents").cast("double") / F.col("base_cents"), 6).alias(
                "vs_age0"
            ),
        )
        .orderBy("cohort", "age")
    )


CATALOG["cust_order_cohort_triangle"].fn = _dcohorttri


register(
    "lineitem_bullwhip_variance_ratio",
    # The bullwhip effect measured across the order->shipment chain:
    # variance of monthly ORDER demand (o_totalprice by order month)
    # over variance of monthly SHIPMENT flow (extendedprice by ship
    # month), each from exact cents moments ((n*sumsq - sum^2) cleared
    # form).  Ratio > 1 = upstream amplification.
    oracle="""
    WITH om AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS m,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    sm AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS m,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    vo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS HUGEINT) AS s,
             SUM(CAST(c AS HUGEINT) * c) AS s2
      FROM om
    ),
    vs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS HUGEINT) AS s,
             SUM(CAST(c AS HUGEINT) * c) AS s2
      FROM sm
    )
    SELECT vo.n AS order_months, vs.n AS ship_months,
           round((CAST(vo.n AS DOUBLE) * CAST(vo.s2 AS DOUBLE)
                  - CAST(vo.s AS DOUBLE) * CAST(vo.s AS DOUBLE))
                 / (CAST(vo.n AS DOUBLE) * (vo.n - 1)) / 10000, 2)
             AS var_order_demand,
           round((CAST(vs.n AS DOUBLE) * CAST(vs.s2 AS DOUBLE)
                  - CAST(vs.s AS DOUBLE) * CAST(vs.s AS DOUBLE))
                 / (CAST(vs.n AS DOUBLE) * (vs.n - 1)) / 10000, 2)
             AS var_ship_flow,
           round(((CAST(vo.n AS DOUBLE) * CAST(vo.s2 AS DOUBLE)
                   - CAST(vo.s AS DOUBLE) * CAST(vo.s AS DOUBLE))
                  / (CAST(vo.n AS DOUBLE) * (vo.n - 1)))
                 / ((CAST(vs.n AS DOUBLE) * CAST(vs.s2 AS DOUBLE)
                     - CAST(vs.s AS DOUBLE) * CAST(vs.s AS DOUBLE))
                    / (CAST(vs.n AS DOUBLE) * (vs.n - 1))), 6)
             AS bullwhip_ratio
    FROM vo CROSS JOIN vs
    """,
)


def _dbullwhip(spark, sf_dir):
    """Bullwhip ratio — two monthly aggregates, exact cents moments."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    om = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m")).agg(
        (F.sum(F.col("o_totalprice").cast(DEC)) * 100).cast("long").alias("c")
    )
    sm = li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("m")).agg(
        (F.sum(F.col("l_extendedprice").cast(DEC)) * 100).cast("long").alias("c")
    )

    def _mom(df):
        return df.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("c").cast("decimal(38,0)").alias("s"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
        )

    vo = _mom(om)
    vs = _mom(sm).select(
        F.col("n").alias("n2"), F.col("s").alias("sb"), F.col("s2").alias("s2b")
    )
    r = vo.crossJoin(F.broadcast(vs))

    def _var(n, s, s2):
        nd = n.cast("double")
        return (nd * s2.cast("double") - s.cast("double") * s.cast("double")) / (
            nd * (n - 1)
        )

    var_o = _var(F.col("n"), F.col("s"), F.col("s2"))
    var_s = _var(F.col("n2"), F.col("sb"), F.col("s2b"))
    return r.select(
        F.col("n").alias("order_months"),
        F.col("n2").alias("ship_months"),
        F.round(var_o / 10000, 2).alias("var_order_demand"),
        F.round(var_s / 10000, 2).alias("var_ship_flow"),
        F.round(var_o / var_s, 6).alias("bullwhip_ratio"),
    )


CATALOG["lineitem_bullwhip_variance_ratio"].fn = _dbullwhip


register(
    "lineitem_fisher_index_decomposition",
    # Fisher ideal index decomposition between the first and last ship
    # YEAR, by part: Laspeyres and Paasche price indices, their
    # geometric mean (Fisher), the matching Fisher volume index, and
    # the identity check value_ratio = fisher_price * fisher_volume.
    # Per-part (price, qty) pairs use exact decimal/cents sums; parts
    # present in both years only (the matched basket).  Extends the
    # r12 Laspeyres-only query (lineitem_price_index_laspeyres).
    oracle="""
    WITH yr AS (
      SELECT CAST(MIN(EXTRACT(year FROM l_shipdate)) AS BIGINT) AS y0,
             CAST(MAX(EXTRACT(year FROM l_shipdate)) AS BIGINT) AS y1
      FROM lineitem
    ),
    pp AS (
      SELECT l_partkey AS pk, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS y,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem CROSS JOIN yr
      WHERE EXTRACT(year FROM l_shipdate) IN (yr.y0, yr.y1)
      GROUP BY 1, 2
    ),
    m AS (
      SELECT a.pk, a.cents AS c0, a.qty AS q0, b.cents AS c1, b.qty AS q1
      FROM (SELECT pp.* FROM pp CROSS JOIN yr WHERE y = yr.y0) a
      JOIN (SELECT pp.* FROM pp CROSS JOIN yr WHERE y = yr.y1) b USING (pk)
    ),
    sums AS (
      -- unit price p = cents/qty; cross terms p1*q0 = c1*q0/q1 etc.
      -- quantized to micro-cents before the part sum
      SELECT CAST(SUM(c0) AS HUGEINT) AS p0q0,
             CAST(SUM(c1) AS HUGEINT) AS p1q1,
             SUM(CAST(floor(CAST(c1 AS DOUBLE) / q1 * q0 * 1000000 + 0.5)
                 AS HUGEINT)) AS p1q0_6,
             SUM(CAST(floor(CAST(c0 AS DOUBLE) / q0 * q1 * 1000000 + 0.5)
                 AS HUGEINT)) AS p0q1_6,
             CAST(COUNT(*) AS BIGINT) AS parts
      FROM m
    )
    SELECT parts AS matched_parts,
           round(CAST(p1q0_6 AS DOUBLE) / 1e6 / CAST(p0q0 AS DOUBLE), 6)
             AS laspeyres_price,
           round(CAST(p1q1 AS DOUBLE) / (CAST(p0q1_6 AS DOUBLE) / 1e6), 6)
             AS paasche_price,
           round(sqrt((CAST(p1q0_6 AS DOUBLE) / 1e6 / CAST(p0q0 AS DOUBLE))
                      * (CAST(p1q1 AS DOUBLE)
                         / (CAST(p0q1_6 AS DOUBLE) / 1e6))), 6) AS fisher_price,
           round(sqrt(((CAST(p0q1_6 AS DOUBLE) / 1e6) / CAST(p0q0 AS DOUBLE))
                      * (CAST(p1q1 AS DOUBLE)
                         / (CAST(p1q0_6 AS DOUBLE) / 1e6))), 6) AS fisher_volume,
           round(CAST(p1q1 AS DOUBLE) / CAST(p0q0 AS DOUBLE), 6) AS value_ratio
    FROM sums
    """,
)


def _dfisher(spark, sf_dir):
    """Fisher decomposition — matched-basket two-year join, micro-cent
    cross terms."""
    li = t(spark, sf_dir, "lineitem")
    yr = li.agg(
        F.min(F.year("l_shipdate")).cast("long").alias("y0"),
        F.max(F.year("l_shipdate")).cast("long").alias("y1"),
    )
    ppl = (
        li.crossJoin(F.broadcast(yr))
        .filter(
            (F.year("l_shipdate") == F.col("y0"))
            | (F.year("l_shipdate") == F.col("y1"))
        )
        .groupBy(
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").cast("long").alias("y"),
            "y0",
            "y1",
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)) * 100)
            .cast("long")
            .alias("cents"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )
    a = ppl.filter(F.col("y") == F.col("y0")).select(
        "pk", F.col("cents").alias("c0"), F.col("qty").alias("q0")
    )
    b = ppl.filter(F.col("y") == F.col("y1")).select(
        "pk", F.col("cents").alias("c1"), F.col("qty").alias("q1")
    )
    m = a.join(b, "pk")
    sums = m.agg(
        F.sum("c0").cast("decimal(38,0)").alias("p0q0"),
        F.sum("c1").cast("decimal(38,0)").alias("p1q1"),
        F.sum(
            F.floor(
                F.col("c1").cast("double") / F.col("q1") * F.col("q0") * F.lit(1000000)
                + F.lit(0.5)
            ).cast("decimal(38,0)")
        ).alias("p1q0_6"),
        F.sum(
            F.floor(
                F.col("c0").cast("double") / F.col("q0") * F.col("q1") * F.lit(1000000)
                + F.lit(0.5)
            ).cast("decimal(38,0)")
        ).alias("p0q1_6"),
        F.count("*").cast("long").alias("parts"),
    )
    lp = F.col("p1q0_6").cast("double") / F.lit(1e6) / F.col("p0q0").cast("double")
    pp_ = F.col("p1q1").cast("double") / (F.col("p0q1_6").cast("double") / F.lit(1e6))
    lv = (F.col("p0q1_6").cast("double") / F.lit(1e6)) / F.col("p0q0").cast("double")
    pv = F.col("p1q1").cast("double") / (F.col("p1q0_6").cast("double") / F.lit(1e6))
    return sums.select(
        F.col("parts").alias("matched_parts"),
        F.round(lp, 6).alias("laspeyres_price"),
        F.round(pp_, 6).alias("paasche_price"),
        F.round(F.sqrt(lp * pp_), 6).alias("fisher_price"),
        F.round(F.sqrt(lv * pv), 6).alias("fisher_volume"),
        F.round(
            F.col("p1q1").cast("double") / F.col("p0q0").cast("double"), 6
        ).alias("value_ratio"),
    )


CATALOG["lineitem_fisher_index_decomposition"].fn = _dfisher
