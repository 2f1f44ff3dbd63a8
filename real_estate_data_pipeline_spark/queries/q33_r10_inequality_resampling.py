"""Split from queries.py lines 23191-23836 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t, tok_arr
from .q09_llm_dedup_text_sim import _HASH01_SQL
from .q26_r8_mixed import _SRC_TC_CTES

# ===========================================================================
# round-10 wave 2: concentration / inequality measures, resampling
# uncertainty (jackknife + block bootstrap), and the JS divergence —
# the BI-diagnostics tier extended.
# ===========================================================================

register(
    "orders_abc_classification",
    # inventory-style ABC analysis over parts: rank parts by revenue,
    # classify by cumulative share (A <= 70%, B <= 90%, C rest) and
    # report each class's size and revenue mass. The class boundary
    # compares exact integer cents (10*cum <= 7*total), so no float
    # share ever decides a boundary row.
    oracle="""
    WITH pr AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                 AS cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tc FROM pr),
    cw AS (
      SELECT cents,
             SUM(cents) OVER (ORDER BY cents DESC, pk) AS cum
      FROM pr
    ),
    cls AS (
      SELECT CASE WHEN 10 * cum <= 7 * tot.tc THEN 'A'
                  WHEN 10 * cum <= 9 * tot.tc THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents
      FROM cw CROSS JOIN tot
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS class_revenue,
           round(CAST(SUM(cents) AS BIGINT) / CAST(tot.tc AS DOUBLE), 6)
               AS revenue_share
    FROM cls CROSS JOIN tot
    GROUP BY abc_class, tot.tc
    ORDER BY abc_class
    """,
)


def _dabc(spark, sf_dir):
    """ABC classification: one grouped sum to the per-part frame, a
    ranked running total over that aggregate (part-cardinality, not
    row-cardinality), integer-cents class boundaries, a 3-row rollup.
    At 100 TB the sort runs on the aggregate — and a range-partitioned
    sort is exactly what Spark does with it."""
    li = t(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * 100).cast("long").alias("cents")
    )
    tot = pr.agg(F.sum("cents").cast("long").alias("tc"))
    w = Window.orderBy(F.desc("cents"), "pk")
    cw = pr.select("cents", F.sum("cents").over(w).alias("cum"))
    cls = cw.crossJoin(F.broadcast(tot)).select(
        F.when(10 * F.col("cum") <= 7 * F.col("tc"), "A")
        .when(10 * F.col("cum") <= 9 * F.col("tc"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "tc",
    )
    return (
        cls.groupBy("abc_class", "tc")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            (F.sum("cents").cast("long") / 100.0).alias("class_revenue"),
            F.round(
                F.sum("cents").cast("long") / F.col("tc").cast("double"), 6
            ).alias("revenue_share"),
        )
        .drop("tc")
        .orderBy("abc_class")
    )


CATALOG["orders_abc_classification"].fn = _dabc

register(
    "supplier_hhi_by_nation",
    # market-concentration audit: the Herfindahl–Hirschman index of
    # supplier revenue within each nation, plus the effective number
    # of suppliers 1/HHI. Squared shares quantize to picounits BEFORE
    # the per-nation sum (order-independent), shares themselves are
    # ratios of exact integer cents.
    oracle="""
    WITH sr AS (
      SELECT l_suppkey AS sk,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                 AS cents
      FROM lineitem GROUP BY 1
    ),
    sn AS (
      SELECT n.n_name, sr.cents
      FROM sr
      JOIN supplier s ON s.s_suppkey = sr.sk
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    ),
    ntot AS (
      SELECT n_name, CAST(SUM(cents) AS BIGINT) AS tc,
             CAST(COUNT(*) AS BIGINT) AS ns
      FROM sn GROUP BY 1
    ),
    terms AS (
      SELECT sn.n_name,
             CAST(floor(round((CAST(sn.cents AS DOUBLE) / ntot.tc)
                              * (CAST(sn.cents AS DOUBLE) / ntot.tc), 12)
                        * 1000000000000 + 0.5) AS BIGINT) AS t12
      FROM sn JOIN ntot USING (n_name)
    )
    SELECT ntot.n_name AS nation, ntot.ns AS n_suppliers,
           ntot.tc / 100.0 AS nation_revenue,
           round(SUM(t12) / 1000000000000.0, 6) AS hhi,
           round(1.0 / (SUM(t12) / 1000000000000.0), 6) AS effective_suppliers
    FROM terms JOIN ntot USING (n_name)
    GROUP BY ntot.n_name, ntot.ns, ntot.tc
    ORDER BY nation
    """,
)


def _dhhi(spark, sf_dir):
    """Per-nation HHI: the fact table reduces to one per-supplier sum
    (the only corpus-sized shuffle), dimensions broadcast, squared
    shares sum as picounit integers per nation — the concentration
    screen over any grouping at GROUP BY cost."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    sr = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * 100).cast("long").alias("cents")
    )
    sn = (
        sr.join(F.broadcast(s), sr.sk == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "cents")
        .localCheckpoint(eager=False)
    )
    ntot = sn.groupBy("n_name").agg(
        F.sum("cents").cast("long").alias("tc"),
        F.count("*").cast("long").alias("ns"),
    )
    sh = F.col("cents").cast("double") / F.col("tc")
    terms = sn.join(F.broadcast(ntot), "n_name").select(
        "n_name",
        F.floor(F.round(sh * sh, 12) * 1e12 + 0.5).cast("long").alias("t12"),
    )
    return (
        terms.join(F.broadcast(ntot), "n_name")
        .groupBy("n_name", "ns", "tc")
        .agg(
            F.round(F.sum("t12") / 1e12, 6).alias("hhi"),
            F.round(1.0 / (F.sum("t12") / 1e12), 6).alias("effective_suppliers"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("ns").alias("n_suppliers"),
            (F.col("tc") / 100.0).alias("nation_revenue"),
            "hhi",
            "effective_suppliers",
        )
        .orderBy("nation")
    )


CATALOG["supplier_hhi_by_nation"].fn = _dhhi

register(
    "doc_token_gini_concentration",
    # how head-heavy is the corpus vocabulary? The Gini coefficient of
    # the token frequency distribution via the exact rank identity
    # G = 2*sum(i*c_i)/(n*S) - (n+1)/n over counts sorted ascending
    # (ties broken by token, so the rank assignment is deterministic).
    # Every pre-division quantity is an exact wide integer.
    oracle="""
    WITH tc AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                        '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY tok
    ),
    rk AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c, tok) AS i FROM tc
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nv,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(CAST(i AS HUGEINT) * c) AS DOUBLE) AS sic
      FROM rk
    )
    SELECT nv AS n_tokens, s AS total_occurrences,
           round(2.0 * sic / (CAST(nv AS DOUBLE) * s) - (nv + 1.0) / nv, 6)
               AS token_gini
    FROM agg
    """,
)


def _dtokgini(spark, sf_dir):
    """Vocabulary Gini: one token-count pass (the corpus-sized
    shuffle), a rank over the vocab-sized aggregate, one closing
    aggregate — the inequality measure the dedup/quality tier reads
    before deciding how aggressive head-token filtering should be."""
    d = t(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(tok_arr(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    rk = tc.select("c", F.row_number().over(Window.orderBy("c", "tok")).alias("i"))
    agg = rk.agg(
        F.count("*").cast("long").alias("nv"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("i").cast("decimal(18,0)") * F.col("c")).cast("double").alias(
            "sic"
        ),
    )
    return agg.select(
        F.col("nv").alias("n_tokens"),
        F.col("s").alias("total_occurrences"),
        F.round(
            2.0 * F.col("sic") / (F.col("nv").cast("double") * F.col("s"))
            - (F.col("nv") + 1.0) / F.col("nv"),
            6,
        ).alias("token_gini"),
    )


CATALOG["doc_token_gini_concentration"].fn = _dtokgini

register(
    "ml_jackknife_ratio_se",
    # the delete-one-GROUP jackknife for a statistic the plain bootstrap
    # gets wrong to resample row-wise: the ratio estimator
    # R = sum(revenue)/sum(quantity), groups = ship months. Each
    # leave-one-month-out ratio is a ratio of exact integer
    # differences; replicate ratios quantize to micro-units, squared
    # deviations to picounits, so both jackknife moments are
    # order-independent integer sums.
    oracle="""
    WITH g AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS blk,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                 AS sc,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qn
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(sc) AS BIGINT) AS s, CAST(SUM(qn) AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS ng
      FROM g
    ),
    th AS (
      SELECT CAST(floor(round(CAST(tot.s - g.sc AS DOUBLE)
                              / (tot.q - g.qn) / 100.0, 6)
                        * 1000000 + 0.5) AS BIGINT) AS t6
      FROM g CROSS JOIN tot
    ),
    tb AS (SELECT CAST(SUM(t6) AS BIGINT) AS st6 FROM th),
    dev AS (
      SELECT CAST(floor(round((th.t6 / 1000000.0
                               - CAST(tb.st6 AS DOUBLE) / tot.ng / 1000000.0)
                              * (th.t6 / 1000000.0
                                 - CAST(tb.st6 AS DOUBLE) / tot.ng / 1000000.0),
                              12) * 1000000000000 + 0.5) AS BIGINT) AS d12
      FROM th CROSS JOIN tb CROSS JOIN tot
    )
    SELECT tot.ng AS n_groups,
           round(CAST(tot.s AS DOUBLE) / tot.q / 100.0, 6) AS ratio_full,
           round(sqrt((tot.ng - 1.0) / tot.ng
                      * (SUM(d12) / 1000000000000.0)), 6) AS jk_se,
           round((tot.ng - 1.0)
                 * (CAST(tb.st6 AS DOUBLE) / tot.ng / 1000000.0
                    - CAST(tot.s AS DOUBLE) / tot.q / 100.0), 6) AS jk_bias
    FROM dev CROSS JOIN tot CROSS JOIN tb
    GROUP BY tot.ng, tot.s, tot.q, tb.st6
    """,
)


def _djackknife(spark, sf_dir):
    """Delete-one-month jackknife: the corpus reduces to one per-month
    aggregate; every replicate statistic is derived from the SAME
    month frame and the 1-row total (no re-scan per replicate — the
    jackknife identity theta_(i) = (S-s_i)/(T-t_i) makes leave-one-out
    a broadcast subtraction)."""
    li = t(spark, sf_dir, "lineitem")
    g = (
        li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("blk"))
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC) * 100).cast("long").alias("sc"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qn"),
        )
        .localCheckpoint(eager=False)
    )
    tot = g.agg(
        F.sum("sc").cast("long").alias("s"),
        F.sum("qn").cast("long").alias("q"),
        F.count("*").cast("long").alias("ng"),
    )
    th = g.crossJoin(F.broadcast(tot)).select(
        F.floor(
            F.round(
                (F.col("s") - F.col("sc")).cast("double")
                / (F.col("q") - F.col("qn"))
                / 100.0,
                6,
            )
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("t6"),
        "s",
        "q",
        "ng",
    ).localCheckpoint(eager=False)
    tb = th.agg(F.sum("t6").cast("long").alias("st6"))
    devterm = F.col("t6") / 1e6 - F.col("st6").cast("double") / F.col("ng") / 1e6
    dev = th.crossJoin(F.broadcast(tb)).select(
        F.floor(F.round(devterm * devterm, 12) * 1e12 + 0.5)
        .cast("long")
        .alias("d12"),
        "s",
        "q",
        "ng",
        "st6",
    )
    return (
        dev.groupBy("ng", "s", "q", "st6")
        .agg(
            F.round(
                F.sqrt(
                    (F.col("ng") - 1.0) / F.col("ng") * (F.sum("d12") / 1e12)
                ),
                6,
            ).alias("jk_se")
        )
        .select(
            F.col("ng").alias("n_groups"),
            F.round(F.col("s").cast("double") / F.col("q") / 100.0, 6).alias(
                "ratio_full"
            ),
            "jk_se",
            F.round(
                (F.col("ng") - 1.0)
                * (
                    F.col("st6").cast("double") / F.col("ng") / 1e6
                    - F.col("s").cast("double") / F.col("q") / 100.0
                ),
                6,
            ).alias("jk_bias"),
        )
    )


CATALOG["ml_jackknife_ratio_se"].fn = _djackknife

register(
    "ml_block_bootstrap_se_daily",
    # the bootstrap that respects time-series dependence: resample
    # whole DAY blocks (not rows) with Poisson(1) weights over 32
    # deterministic replicates, statistic = mean event value. Rows
    # within a block always travel together, so serial correlation
    # inside a day survives the resampling; the replicate explode runs
    # on the tiny per-day aggregate, never on raw events.
    oracle=f"""
    WITH d AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sv6
      FROM events GROUP BY 1
    ),
    full_m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(sv6) AS DOUBLE) / SUM(nd) / 1000000.0 AS mean_value
      FROM d
    ),
    r AS (
      SELECT b.b, d.nd, d.sv6,
             {_HASH01_SQL.format(key="day || 'blockboot' || CAST(b AS VARCHAR)")}
                 AS u
      FROM d CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS b) b
    ),
    w AS (
      SELECT b, nd, sv6,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  ELSE 5 END AS w
      FROM r
    ),
    rep AS (
      SELECT b, CAST(SUM(CAST(w AS HUGEINT) * nd) AS BIGINT) AS nw,
             CAST(SUM(CAST(w AS HUGEINT) * sv6) AS BIGINT) AS sw6
      FROM w GROUP BY b
    ),
    mb AS (
      SELECT CAST(FLOOR(CAST(sw6 AS DOUBLE) / NULLIF(nw, 0) + 0.5) AS BIGINT) AS m
      FROM rep
    ),
    se AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
             round(sqrt((CAST(COUNT(*) AS DOUBLE)
                         * CAST(SUM(CAST(m AS HUGEINT) * m) AS DOUBLE)
                         - CAST(SUM(m) AS DOUBLE) * SUM(m))
                        / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)))
                   / 1000000, 6) AS block_boot_se
      FROM mb
    )
    SELECT f.n_days, round(f.mean_value, 6) AS mean_value,
           s.n_replicates, s.block_boot_se
    FROM full_m f, se s
    """,
)


def _dblockboot(spark, sf_dir):
    """Block bootstrap: the corpus collapses to one per-day aggregate
    (micro-unit value sums — exact), the 32-replicate explode and all
    resampling run on that ~30-row frame. Dependence-aware uncertainty
    for the cost of a GROUP BY plus constant work."""
    from ..ops.sampling import hash_uniform01

    e = t(spark, sf_dir, "events")
    d = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").cast("long").alias("nd"),
            F.sum(F.floor(F.col("value") * 1e6 + 0.5).cast("long"))
            .cast("long")
            .alias("sv6"),
        )
        .localCheckpoint(eager=False)
    )
    full_m = d.agg(
        F.count("*").cast("long").alias("n_days"),
        (F.sum("sv6").cast("double") / F.sum("nd") / 1e6).alias("mean_value"),
    )
    r = d.select(
        "day",
        "nd",
        "sv6",
        F.explode(F.sequence(F.lit(1), F.lit(32))).alias("b"),
    ).select(
        "b",
        "nd",
        "sv6",
        hash_uniform01(
            F.concat(F.col("day"), F.lit("blockboot"), F.col("b").cast("string"))
        ).alias("u"),
    )
    w = r.select(
        "b",
        "nd",
        "sv6",
        F.when(F.col("u") < 0.36787944117144233, 0)
        .when(F.col("u") < 0.7357588823428847, 1)
        .when(F.col("u") < 0.9196986029286058, 2)
        .when(F.col("u") < 0.9810118431238462, 3)
        .when(F.col("u") < 0.9963401531726563, 4)
        .otherwise(5)
        .alias("w"),
    )
    rep = w.groupBy("b").agg(
        F.sum(F.col("w").cast("decimal(18,0)") * F.col("nd"))
        .cast("long")
        .alias("nw"),
        F.sum(F.col("w").cast("decimal(18,0)") * F.col("sv6"))
        .cast("long")
        .alias("sw6"),
    )
    mb = rep.select(
        F.floor(
            F.col("sw6").cast("double") / F.nullif(F.col("nw"), F.lit(0)) + 0.5
        ).alias("m")
    )
    bd = F.count("*").cast("double")
    se = mb.agg(
        F.count("*").cast("long").alias("n_replicates"),
        F.round(
            F.sqrt(
                (
                    bd
                    * F.sum(
                        F.col("m").cast("decimal(18,0)") * F.col("m").cast("decimal(18,0)")
                    ).cast("double")
                    - F.sum("m").cast("double") * F.sum("m")
                )
                / (bd * (F.count("*") - 1))
            )
            / F.lit(1000000),
            6,
        ).alias("block_boot_se"),
    )
    return full_m.crossJoin(F.broadcast(se)).select(
        "n_days",
        F.round(F.col("mean_value"), 6).alias("mean_value"),
        "n_replicates",
        "block_boot_se",
    )


CATALOG["ml_block_bootstrap_se_daily"].fn = _dblockboot

register(
    "doc_js_divergence_sources",
    # the bounded, symmetric cousin of the pairwise KL report: Jensen–
    # Shannon divergence between every source pair over the UNION of
    # their unsmoothed unigram distributions. The log ratio
    # p/m = 2*ca*nb/(ca*nb + cb*na) is a ratio of exact wide integers
    # (so identical doubles feed the one 6dp-rounded ln), and each
    # side's p*ln(p/m) term quantizes to picounits before the
    # union-sized sum.
    oracle=f"""
    WITH {_SRC_TC_CTES},
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tc GROUP BY source),
    grid AS (
      SELECT a.source AS src_a, a.n AS na, b.source AS src_b, b.n AS nb
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    u AS (
      SELECT g.src_a, g.src_b, g.na, g.nb,
             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
      FROM grid g
      CROSS JOIN (SELECT DISTINCT tok FROM tc) t
      LEFT JOIN tc ca ON ca.source = g.src_a AND ca.tok = t.tok
      LEFT JOIN tc cb ON cb.source = g.src_b AND cb.tok = t.tok
      WHERE COALESCE(ca.c, 0) > 0 OR COALESCE(cb.c, 0) > 0
    ),
    terms AS (
      SELECT src_a, src_b,
             CAST(COUNT(*) AS BIGINT) AS n_union_tokens,
             CAST(SUM(CASE WHEN ca > 0 THEN
               CAST(floor(round((CAST(ca AS DOUBLE) / na)
                 * round(ln(CAST(2 * CAST(ca AS HUGEINT) * nb AS DOUBLE)
                            / (CAST(ca AS HUGEINT) * nb
                               + CAST(cb AS HUGEINT) * na)), 6),
                 12) * 1000000000000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS sp12,
             CAST(SUM(CASE WHEN cb > 0 THEN
               CAST(floor(round((CAST(cb AS DOUBLE) / nb)
                 * round(ln(CAST(2 * CAST(cb AS HUGEINT) * na AS DOUBLE)
                            / (CAST(cb AS HUGEINT) * na
                               + CAST(ca AS HUGEINT) * nb)), 6),
                 12) * 1000000000000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS sq12
      FROM u GROUP BY src_a, src_b
    )
    SELECT src_a, src_b, n_union_tokens,
           round((sp12 / 1000000000000.0 + sq12 / 1000000000000.0) / 2.0, 6)
               AS js_divergence
    FROM terms
    ORDER BY src_a, src_b
    """,
    bench=True,
)


def _dsrcjs(spark, sf_dir):
    """Pairwise JS divergence, same plan shape as the KL report: one
    (source, token) count pass, per-token count map, 190-row pair grid
    broadcast, picounit term sums — the mixing diagnostic that is
    bounded (<= ln 2) and symmetric, so thresholds transfer across
    corpora."""
    d = t(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(tok_arr(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = tc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    ta = tot.withColumnsRenamed({"source": "src_a", "n": "na"})
    tb = tot.withColumnsRenamed({"source": "src_b", "n": "nb"})
    grid = ta.join(tb, ta.src_a < tb.src_b)
    m = tc.groupBy("tok").agg(
        F.map_from_entries(F.collect_list(F.struct("source", "c"))).alias("cm")
    )
    u = (
        m.crossJoin(F.broadcast(grid))
        .select(
            "src_a",
            "src_b",
            "na",
            "nb",
            F.coalesce(F.element_at("cm", F.col("src_a")), F.lit(0)).alias("ca"),
            F.coalesce(F.element_at("cm", F.col("src_b")), F.lit(0)).alias("cb"),
        )
        .filter((F.col("ca") > 0) | (F.col("cb") > 0))
    )

    def _jsterm(cx, nx, cy, ny):
        # p*ln(p/m) with p = cx/nx, m = (cx/nx + cy/ny)/2: the ratio
        # inside ln is exact wide-int 2*cx*ny / (cx*ny + cy*nx)
        num = (F.lit(2).cast("decimal(19,0)") * cx * ny).cast("double")
        den = (
            cx.cast("decimal(19,0)") * ny + cy.cast("decimal(19,0)") * nx
        ).cast("double")
        return F.when(
            cx > 0,
            F.floor(
                F.round(
                    (cx.cast("double") / nx) * F.round(F.log(num / den), 6), 12
                )
                * 1e12
                + 0.5
            ).cast("long"),
        ).otherwise(F.lit(0))

    terms = u.groupBy("src_a", "src_b").agg(
        F.count("*").cast("long").alias("n_union_tokens"),
        F.sum(
            _jsterm(F.col("ca"), F.col("na"), F.col("cb"), F.col("nb"))
        )
        .cast("long")
        .alias("sp12"),
        F.sum(
            _jsterm(F.col("cb"), F.col("nb"), F.col("ca"), F.col("na"))
        )
        .cast("long")
        .alias("sq12"),
    )
    return terms.select(
        "src_a",
        "src_b",
        "n_union_tokens",
        F.round((F.col("sp12") / 1e12 + F.col("sq12") / 1e12) / 2.0, 6).alias(
            "js_divergence"
        ),
    ).orderBy("src_a", "src_b")


CATALOG["doc_js_divergence_sources"].fn = _dsrcjs


