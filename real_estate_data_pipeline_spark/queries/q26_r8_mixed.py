"""Split from queries.py lines 17856-20227 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, dedup, register, similarity, t, tok_arr
from .q09_llm_dedup_text_sim import (
    _DOT_SQL,
    _ER_PAIRS_SQL,
    _ER_TWIN_BASE_SQL,
    _HASH01_SQL,
    _NORM_SQL_E,
    _NORM_SQL_Q,
    _twin_base,
    _twin_fuzzy_pairs,
)
from .q15_curation_r3 import (
    _GRAMS3_SQL,
    _HOURLY_TYPE_CENTS_CTE,
    _KLL_QS,
    _NB_CTES,
    _events_stream_schema,
    _hourly_type_cents,
    _kll_gate,
    _kll_oracle_sql,
    _minhash_portable_oracle,
    _nb_frames,
    _run_stream_to_memory,
    _stream_file_source,
)
from .q18_r7_timeseries import _ewma_terms

# ===========================================================================
# round-8 additions: revenue analytics, inference, retrieval scoring,
# graph centrality, sketch accuracy, and dedup-quality evaluation
# ===========================================================================

register(
    "orders_new_vs_returning_revenue",
    # the growth-accounting split every revenue dashboard leads with:
    # each month's orders and revenue divided into first-ever-month
    # customers ('new') vs repeat buyers ('returning'). First month is
    # one customer-partitioned window min — no self-join.
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             date_trunc('month', o_orderdate) AS m,
             MIN(date_trunc('month', o_orderdate))
                 OVER (PARTITION BY o_custkey) AS first_m,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    )
    SELECT month,
           CASE WHEN m = first_m THEN 'new' ELSE 'returning' END AS cohort_flag,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           round(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS revenue
    FROM o GROUP BY month, cohort_flag
    """,
)


def _dnewret(spark, sf_dir):
    """New-vs-returning monthly revenue split: the first-order month is
    a customer-partitioned window MIN (shuffles once on the customer
    key), the rollup a plain grouped aggregate over exact cents — the
    whole query is two shuffles on natural keys at any scale."""
    o = t(spark, sf_dir, "orders")
    m = F.date_trunc("month", F.col("o_orderdate"))
    x = o.select(
        "o_custkey",
        F.date_format(m, "yyyy-MM").alias("month"),
        m.alias("__m"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    ).withColumn("__first", F.min("__m").over(Window.partitionBy("o_custkey")))
    return x.groupBy(
        "month",
        F.when(F.col("__m") == F.col("__first"), "new")
        .otherwise("returning")
        .alias("cohort_flag"),
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        F.round(F.sum("cents").cast("double") / 100.0, 2).alias("revenue"),
    )


CATALOG["orders_new_vs_returning_revenue"].fn = _dnewret

register(
    "cust_cohort_ltv_curve",
    # cohort lifetime-value curve: customers grouped by first-order
    # month, cumulative revenue per cohort tracked by months-since-
    # first — the curve that tells you when a cohort pays back. The
    # running sum is cohort-partitioned over the (cohort, age)
    # aggregate (bounded: months x months), never over raw orders.
    oracle="""
    WITH f AS (
      SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cm
      FROM orders GROUP BY o_custkey
    ),
    cs AS (SELECT cm, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM f GROUP BY cm),
    r AS (
      SELECT f.cm,
             CAST(date_diff('month', f.cm, date_trunc('month', o.o_orderdate))
                  AS BIGINT) AS age_months,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders o JOIN f ON f.o_custkey = o.o_custkey
    ),
    a AS (
      SELECT cm, age_months, CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM r GROUP BY cm, age_months
    ),
    c AS (
      SELECT cm, age_months,
             CAST(SUM(rev_cents) OVER (PARTITION BY cm ORDER BY age_months)
                  AS BIGINT) AS cum_cents
      FROM a
    )
    SELECT strftime(c.cm, '%Y-%m') AS cohort_month, c.age_months,
           cs.cohort_size,
           round(CAST(c.cum_cents AS DOUBLE) / 100.0, 2) AS cum_revenue,
           round(CAST(c.cum_cents AS DOUBLE) / cs.cohort_size / 100.0, 6)
               AS ltv_per_customer
    FROM c JOIN cs ON cs.cm = c.cm
    """,
)


def _dltv(spark, sf_dir):
    """Cohort LTV curve: one grouped aggregate finds each customer's
    cohort month, orders join it back on the customer key (broadcast-
    able: one row per customer), the (cohort, age) revenue table is
    months x months small, and the cumulative window is partitioned by
    cohort — at 100 TB the only big shuffles are the two customer-keyed
    ones and they reuse the same partitioning."""
    o = t(spark, sf_dir, "orders")
    m = F.date_trunc("month", F.col("o_orderdate"))
    f = o.groupBy("o_custkey").agg(F.min(m).alias("cm")).localCheckpoint(eager=False)
    cs = f.groupBy("cm").agg(F.count("*").cast("long").alias("cohort_size"))
    r = (
        o.select(
            "o_custkey",
            m.alias("__om"),
            (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        )
        .join(f, "o_custkey")
        .select(
            "cm",
            F.months_between(F.col("__om"), F.col("cm")).cast("long").alias("age_months"),
            "cents",
        )
    )
    a = r.groupBy("cm", "age_months").agg(F.sum("cents").cast("long").alias("rev_cents"))
    c = a.withColumn(
        "cum_cents",
        F.sum("rev_cents")
        .over(Window.partitionBy("cm").orderBy("age_months"))
        .cast("long"),
    )
    return c.join(cs, "cm").select(
        F.date_format("cm", "yyyy-MM").alias("cohort_month"),
        "age_months",
        "cohort_size",
        F.round(F.col("cum_cents").cast("double") / 100.0, 2).alias("cum_revenue"),
        F.round(
            F.col("cum_cents").cast("double") / F.col("cohort_size") / 100.0, 6
        ).alias("ltv_per_customer"),
    )


CATALOG["cust_cohort_ltv_curve"].fn = _dltv

register(
    "part_skyline_by_brand",
    # per-brand Pareto frontier of (min price, max size): a part is on
    # the skyline iff no same-brand part is cheaper-or-equal AND
    # bigger-or-equal with one strict. The classic dominance query
    # without any inequality self-join: group to (brand, price) ->
    # max size, then one brand-partitioned running max over the
    # strictly-cheaper prefix decides dominance.
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_brand, p_size,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM part
    ),
    g AS (
      SELECT p_brand, price_cents, MAX(p_size) AS gmax
      FROM p GROUP BY p_brand, price_cents
    ),
    w AS (
      SELECT p_brand, price_cents, gmax,
             MAX(gmax) OVER (PARTITION BY p_brand ORDER BY price_cents
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max
      FROM g
    ),
    sk AS (
      SELECT p_brand, price_cents, gmax FROM w
      WHERE prev_max IS NULL OR prev_max < gmax
    )
    SELECT p.p_brand, p.p_partkey,
           round(CAST(p.price_cents AS DOUBLE) / 100.0, 2) AS price,
           p.p_size
    FROM p JOIN sk ON sk.p_brand = p.p_brand AND sk.price_cents = p.price_cents
                   AND p.p_size = sk.gmax
    ORDER BY p.p_brand, p.price_cents, p.p_partkey
    """,
)


def _dskyline(spark, sf_dir):
    """2-D skyline (Pareto frontier) per brand via the sort-and-running-
    max identity: dominance against all strictly-cheaper parts is one
    brand-partitioned window over the (brand, price) aggregate; ties in
    price dominate only with a strictly larger size, which the
    group-max equality check encodes. No quadratic NOT EXISTS — the
    candidate table is value-domain sized, and the final join back to
    parts is equi-keyed on (brand, price)."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long").alias("price_cents"),
    )
    g = p.groupBy("p_brand", "price_cents").agg(F.max("p_size").alias("gmax"))
    w = g.withColumn(
        "prev_max",
        F.max("gmax").over(
            Window.partitionBy("p_brand")
            .orderBy("price_cents")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    sk = w.filter(F.col("prev_max").isNull() | (F.col("prev_max") < F.col("gmax"))).select(
        F.col("p_brand").alias("__b"),
        F.col("price_cents").alias("__pc"),
        F.col("gmax").alias("__gmax"),
    )
    return (
        p.join(
            sk,
            on=[
                p["p_brand"] == sk["__b"],
                p["price_cents"] == sk["__pc"],
                p["p_size"] == sk["__gmax"],
            ],
        )
        .select(
            "p_brand",
            "p_partkey",
            F.round(F.col("price_cents").cast("double") / 100.0, 2).alias("price"),
            "p_size",
        )
        .orderBy("p_brand", F.col("price"), "p_partkey")
    )


CATALOG["part_skyline_by_brand"].fn = _dskyline

register(
    "ml_permutation_test_ab",
    # distribution-free significance: a deterministic permutation test
    # of mean order value between two customer segments. Each of 32
    # replicates relabels every order by the engine-wide sha2 draw
    # (P(a) = observed segment share), replicate mean-diffs go to
    # exact micro-dollars, and the p-value is the smoothed extreme
    # share (1 + #{|perm| >= |obs|}) / (B + 1).
    oracle=f"""
    WITH x AS (
      SELECT o.o_orderkey, c.c_mktsegment AS seg,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    m AS (
      SELECT CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN seg = 'BUILDING' THEN cents ELSE 0 END) AS BIGINT) AS s_a,
             CAST(SUM(CASE WHEN seg = 'MACHINERY' THEN cents ELSE 0 END) AS BIGINT) AS s_b
      FROM x
    ),
    obs AS (
      SELECT n_a, n_b,
             CAST(floor(CAST(s_a AS DOUBLE) / n_a / 100.0 * 1000000 + 0.5) AS BIGINT) AS ma6,
             CAST(floor(CAST(s_b AS DOUBLE) / n_b / 100.0 * 1000000 + 0.5) AS BIGINT) AS mb6,
             CAST(n_a AS DOUBLE) / (n_a + n_b) AS frac_a
      FROM m
    ),
    r AS (
      SELECT b.b, x.cents,
             CASE WHEN {_HASH01_SQL.format(key="CAST(x.o_orderkey AS VARCHAR) || 'perm' || CAST(b.b AS VARCHAR)")}
                       < o.frac_a
                  THEN 'a' ELSE 'b' END AS pseg
      FROM x
      CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS b) b
      CROSS JOIN obs o
    ),
    rep AS (
      SELECT b,
             CAST(floor(CAST(SUM(CASE WHEN pseg = 'a' THEN cents ELSE 0 END) AS DOUBLE)
                        / NULLIF(SUM(CASE WHEN pseg = 'a' THEN 1 ELSE 0 END), 0)
                        / 100.0 * 1000000 + 0.5) AS BIGINT)
             - CAST(floor(CAST(SUM(CASE WHEN pseg = 'b' THEN cents ELSE 0 END) AS DOUBLE)
                          / NULLIF(SUM(CASE WHEN pseg = 'b' THEN 1 ELSE 0 END), 0)
                          / 100.0 * 1000000 + 0.5) AS BIGINT) AS d6
      FROM r GROUP BY b
    ),
    pv AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
             CAST(SUM(CASE WHEN abs(d6) >= abs(o.ma6 - o.mb6) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_extreme
      FROM rep CROSS JOIN obs o
    )
    SELECT o.n_a, o.n_b,
           round(o.ma6 / 1000000.0, 6) AS mean_a,
           round(o.mb6 / 1000000.0, 6) AS mean_b,
           round((o.ma6 - o.mb6) / 1000000.0, 6) AS obs_diff,
           p.n_replicates, p.n_extreme,
           round((1.0 + p.n_extreme) / (p.n_replicates + 1.0), 6) AS p_value
    FROM obs o CROSS JOIN pv p
    """,
)


def _dpermtest(spark, sf_dir):
    """Permutation test as a streamable plan: the observed moments are
    one aggregate, each row then fans out to 32 replicate labels
    decided by the row's hash against the observed group share (the
    label-shuffle distribution under H0, no materialized permutation),
    replicate diffs reduce to 32 rows, and the p-value is a 1x1
    broadcast join. Like the Poisson bootstrap, every shuffle after
    the fan-out carries <=32 rows."""
    from ..ops.sampling import hash_uniform01

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    x = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            F.col("c_mktsegment").alias("seg"),
            (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        )
        .localCheckpoint(eager=False)
    )
    is_a = F.col("seg") == "BUILDING"
    m = x.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, F.col("cents")).otherwise(0)).cast("long").alias("s_a"),
        F.sum(F.when(~is_a, F.col("cents")).otherwise(0)).cast("long").alias("s_b"),
    )
    obs = m.select(
        "n_a",
        "n_b",
        F.floor(F.col("s_a").cast("double") / F.col("n_a") / 100.0 * 1e6 + 0.5)
        .cast("long")
        .alias("ma6"),
        F.floor(F.col("s_b").cast("double") / F.col("n_b") / 100.0 * 1e6 + 0.5)
        .cast("long")
        .alias("mb6"),
        (F.col("n_a").cast("double") / (F.col("n_a") + F.col("n_b"))).alias("frac_a"),
    ).localCheckpoint(eager=False)
    r = (
        x.select("o_orderkey", "cents", F.explode(F.sequence(F.lit(1), F.lit(32))).alias("b"))
        .crossJoin(F.broadcast(obs.select("frac_a")))
        .select(
            "b",
            "cents",
            F.when(
                hash_uniform01(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("perm"),
                        F.col("b").cast("string"),
                    )
                )
                < F.col("frac_a"),
                "a",
            )
            .otherwise("b")
            .alias("pseg"),
        )
    )
    pa = F.col("pseg") == "a"
    rep = r.groupBy("b").agg(
        (
            F.floor(
                F.sum(F.when(pa, F.col("cents")).otherwise(0)).cast("double")
                / F.nullif(F.sum(F.when(pa, 1).otherwise(0)), F.lit(0))
                / 100.0
                * 1e6
                + 0.5
            ).cast("long")
            - F.floor(
                F.sum(F.when(~pa, F.col("cents")).otherwise(0)).cast("double")
                / F.nullif(F.sum(F.when(~pa, 1).otherwise(0)), F.lit(0))
                / 100.0
                * 1e6
                + 0.5
            ).cast("long")
        ).alias("d6")
    )
    pv = (
        rep.crossJoin(F.broadcast(obs.select("ma6", "mb6")))
        .agg(
            F.count("*").cast("long").alias("n_replicates"),
            F.sum(
                F.when(
                    F.abs(F.col("d6")) >= F.abs(F.col("ma6") - F.col("mb6")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_extreme"),
        )
    )
    return obs.crossJoin(F.broadcast(pv)).select(
        "n_a",
        "n_b",
        F.round(F.col("ma6") / 1e6, 6).alias("mean_a"),
        F.round(F.col("mb6") / 1e6, 6).alias("mean_b"),
        F.round((F.col("ma6") - F.col("mb6")) / 1e6, 6).alias("obs_diff"),
        "n_replicates",
        "n_extreme",
        F.round(
            (F.lit(1.0) + F.col("n_extreme")) / (F.col("n_replicates") + F.lit(1.0)), 6
        ).alias("p_value"),
    )


CATALOG["ml_permutation_test_ab"].fn = _dpermtest

register(
    "dq_fd_auto_histogram",
    # auto-binned distribution profile: the Freedman-Diaconis rule
    # (bin width = 2*IQR/n^(1/3)) picks the histogram granularity from
    # the data itself — the binning a profiler should default to.
    # Width snaps to whole cents (>= 1) so every bin edge is an exact
    # integer and the histogram is engine-exact.
    oracle="""
    WITH x AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(cents) AS BIGINT) AS min_c,
             quantile_cont(cents, 0.25) AS q1,
             quantile_cont(cents, 0.75) AS q3
      FROM x
    ),
    wdt AS (
      SELECT min_c,
             GREATEST(CAST(floor(2.0 * (q3 - q1) / cbrt(CAST(n AS DOUBLE)) + 0.5)
                           AS BIGINT), 1) AS w_cents
      FROM s
    )
    SELECT CAST(floor(CAST(x.cents - w.min_c AS DOUBLE) / w.w_cents) AS BIGINT) AS bin_id,
           round((w.min_c
                  + CAST(floor(CAST(x.cents - w.min_c AS DOUBLE) / w.w_cents) AS BIGINT)
                    * w.w_cents) / 100.0, 2) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM x CROSS JOIN wdt w
    GROUP BY 1, 2 ORDER BY bin_id
    """,
)


def _dfdhist(spark, sf_dir):
    """Freedman-Diaconis auto-histogram: one exact-percentile aggregate
    produces the 1-row width scalar (broadcast), binning is then a
    map-side integer expression and the histogram one grouped count —
    at scale this is a scan + scalar + count, with the IQR pass the
    only sort-y step (Spark's exact percentile aggregates per
    partition before merging)."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents")
    ).localCheckpoint(eager=False)
    s = x.agg(
        F.count("*").cast("long").alias("n"),
        F.min("cents").cast("long").alias("min_c"),
        F.percentile("cents", F.lit(0.25)).alias("q1"),
        F.percentile("cents", F.lit(0.75)).alias("q3"),
    )
    wdt = s.select(
        "min_c",
        F.greatest(
            F.floor(
                F.lit(2.0)
                * (F.col("q3") - F.col("q1"))
                / F.cbrt(F.col("n").cast("double"))
                + F.lit(0.5)
            ).cast("long"),
            F.lit(1).cast("long"),
        ).alias("w_cents"),
    )
    b = F.floor(
        (F.col("cents") - F.col("min_c")).cast("double") / F.col("w_cents")
    ).cast("long")
    return (
        x.crossJoin(F.broadcast(wdt))
        .select(
            b.alias("bin_id"),
            F.round(
                (F.col("min_c") + b * F.col("w_cents")) / 100.0, 2
            ).alias("bin_lo"),
        )
        .groupBy("bin_id", "bin_lo")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .orderBy("bin_id")
    )


CATALOG["dq_fd_auto_histogram"].fn = _dfdhist

_BM25_TERMS = ("hash", "join", "stream")

# Shared lexical-retrieval SQL chains: one tokenize pass (tk, dl) and one
# per-(doc, query-term) tf table (qtf) feed BOTH scorers — Okapi BM25
# (_BM25_SQL_CHAIN -> bscore(doc_id, n_terms, b6)) and Dirichlet-smoothed
# query likelihood (_QL_SQL_CHAIN -> qscore(doc_id, n_hits, q6)) — so the
# standalone queries and every ranker-pair diagnostic (RRF, Kendall tau,
# average overlap, MRR eval) single-source the numeric spec and cannot
# drift. MATERIALIZED because the combined oracles consume tk/dl/qtf 3+
# times (the r7/r8 review rule).
_TOK_SQL_CTES = """tk AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    dl AS MATERIALIZED (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
    qtf AS MATERIALIZED (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(tk) AS tok FROM tk)
      WHERE tok IN {terms}
      GROUP BY doc_id, tok
    )""".format(terms=repr(_BM25_TERMS))

_BM25_SQL_CHAIN = """s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM qtf GROUP BY tok),
    idf AS (
      SELECT d.tok,
             round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0), 6) AS idf
      FROM dfreq d CROSS JOIN s
    ),
    bterms AS (
      SELECT qtf.doc_id,
             CAST(floor(round(i.idf * (qtf.tf * 2.2)
                              / (qtf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)),
                              6) * 1000000 + 0.5) AS BIGINT) AS t6
      FROM qtf
      JOIN idf i ON i.tok = qtf.tok
      JOIN dl ON dl.doc_id = qtf.doc_id
      CROSS JOIN s
    ),
    bscore AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(t6) AS BIGINT) AS b6
      FROM bterms GROUP BY doc_id
    )"""

_QL_MU = 2000.0

_QL_SQL_CHAIN = """nc AS (SELECT CAST(SUM(dl) AS BIGINT) AS nc FROM dl),
    cf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf FROM qtf GROUP BY tok),
    qlterms AS (
      SELECT dl.doc_id,
             CASE WHEN qtf.tf IS NOT NULL THEN 1 ELSE 0 END AS hit,
             CAST(round(round(ln((COALESCE(qtf.tf, 0) + {mu} * cf.cf / nc.nc)
                                 / (dl.dl + {mu})), 6) * 1000000) AS BIGINT) AS t6
      FROM dl
      CROSS JOIN cf
      CROSS JOIN nc
      LEFT JOIN qtf ON qtf.doc_id = dl.doc_id AND qtf.tok = cf.tok
    ),
    qscore AS (
      SELECT doc_id,
             CAST(SUM(hit) AS BIGINT) AS n_hits,
             CAST(SUM(t6) AS BIGINT) AS q6
      FROM qlterms GROUP BY doc_id
    )""".format(mu=_QL_MU)

register(
    "doc_bm25_topk",
    # the standard lexical retrieval scorer: Okapi BM25 (k1=1.2,
    # b=0.75) of every document against a fixed query term set, top-15.
    # IDF uses the ln((N-df+0.5)/(df+0.5)+1) form; per-(doc, term)
    # score terms round to micro-units so the per-doc sum is an exact
    # integer regardless of term order.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_BM25_SQL_CHAIN}
    SELECT doc_id, n_terms,
           round(CAST(b6 AS DOUBLE) / 1000000.0, 6) AS bm25
    FROM bscore
    ORDER BY bm25 DESC, doc_id LIMIT 15
    """,
    bench=True,
)


def _retrieval_wide(spark, sf_dir):
    """Shared lexical-retrieval base, wide form: ONE corpus pass and
    ZERO shuffles. The query term set is a fixed 3-term literal, so
    each term's per-doc tf is an array expression over the token array
    (size of the equality-filtered array) — the r8 explode → groupBy →
    join-back chain carried every matching token instance through an
    exchange purely to recount what the array already knew. Columns:
    (doc_id, dl, __tf0..__tf{n-1}); multi-consumer, so it
    localCheckpoints lazily (the r8 review rule)."""
    d = t(spark, sf_dir, "documents")
    tk = tok_arr(F.col("text"))

    def _tf(i, term):
        # single-arg lambda: a two-arg lambda would be read by pyspark
        # as the (element, index) form and bind the term to the index
        return (
            F.size(F.filter("__tk", lambda x: x == F.lit(term)))
            .cast("long")
            .alias(f"__tf{i}")
        )

    return (
        d.select("doc_id", tk.alias("__tk"))
        .select(
            "doc_id",
            F.size("__tk").cast("long").alias("dl"),
            *[_tf(i, term) for i, term in enumerate(_BM25_TERMS)],
        )
        .localCheckpoint(eager=False)
    )


def _all_terms_pred():
    """Conjunction: every query term matched (tf >= 1) on the wide frame."""
    pred = F.col("__tf0") > 0
    for i in range(1, len(_BM25_TERMS)):
        pred = pred & (F.col(f"__tf{i}") > 0)
    return pred


def _rel_from_wide(wide):
    """(doc_id, flag=1) for docs matching ALL query terms — the
    boolean-AND relevance set (= the old qtf GROUP BY doc_id HAVING
    COUNT(*) = arity), as a narrow filter over the wide frame."""
    return wide.filter(_all_terms_pred()).select("doc_id", F.lit(1).alias("flag"))


def _retrieval_stats(wide):
    """Corpus stats for the scorers in ONE aggregate over the wide
    frame, collected driver-side (a |terms|-bounded model row — the
    PQ-codebook collect pattern) and memoized on the frame object so
    queries using both scorers pay one stats job. n_docs/avgdl/df feed
    BM25; nc/cf feed QL; every value is computed by the same aggregate
    expressions the r8 frame-per-stat shape used."""
    st = getattr(wide, "_r15_retrieval_stats", None)
    if st is None:
        aggs = [
            F.count("*").cast("long").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
            F.sum("dl").cast("long").alias("nc"),
        ]
        for i in range(len(_BM25_TERMS)):
            aggs.append(
                F.sum((F.col(f"__tf{i}") > 0).cast("long"))
                .cast("long")
                .alias(f"df{i}")
            )
            aggs.append(F.sum(f"__tf{i}").cast("long").alias(f"cf{i}"))
        st = wide.agg(*aggs).collect()[0]
        wide._r15_retrieval_stats = st
    return st


def _bm25_score_frame(wide):
    """(doc_id, n_terms, b6): exact integer micro-unit BM25 scores —
    the Spark twin of _BM25_SQL_CHAIN, computed columnar over the wide
    frame (per-term idf/avgdl are constant-folded literals, so catalyst
    evaluates the identical JVM double expressions the broadcast-frame
    shape did). Docs matching no term are filtered out, exactly the
    rows the old matched-only aggregate produced."""
    st = _retrieval_stats(wide)
    avgdl = F.lit(st["avgdl"])
    t6s, hits = [], []
    for i in range(len(_BM25_TERMS)):
        idf = F.round(
            F.log(
                (F.lit(st["n_docs"]) - F.lit(st[f"df{i}"]) + 0.5)
                / (F.lit(st[f"df{i}"]) + 0.5)
                + 1.0
            ),
            6,
        )
        tf = F.col(f"__tf{i}")
        t6 = F.floor(
            F.round(
                idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl)),
                6,
            )
            * 1e6
            + 0.5
        ).cast("long")
        t6s.append(F.when(tf > 0, t6).otherwise(F.lit(0).cast("long")))
        hits.append((tf > 0).cast("long"))
    n_terms = hits[0]
    for h in hits[1:]:
        n_terms = n_terms + h
    b6 = t6s[0]
    for e in t6s[1:]:
        b6 = b6 + e
    return wide.select(
        "doc_id",
        n_terms.cast("long").alias("n_terms"),
        b6.cast("long").alias("b6"),
    ).filter(F.col("n_terms") > 0)


def _ql_score_frame(wide):
    """(doc_id, n_hits, q6): Dirichlet-smoothed query-likelihood scores
    in exact integer micro-nats — the Spark twin of _QL_SQL_CHAIN.
    Unlike BM25, QL scores EVERY document (missing terms contribute the
    mu*cf/Nc background mass): one columnar pass over the wide frame,
    cf/nc as constant-folded literals instead of the dl x |query|
    crossJoin + left-join the r8 shape shuffled. A term absent from the
    whole corpus is skipped, mirroring the old cf table having no row
    for it."""
    st = _retrieval_stats(wide)
    t6s, hits = [], []
    for i in range(len(_BM25_TERMS)):
        if st[f"cf{i}"] == 0:
            continue
        tf = F.col(f"__tf{i}")
        t6 = F.round(
            F.round(
                F.log(
                    (tf + F.lit(_QL_MU) * F.lit(st[f"cf{i}"]) / F.lit(st["nc"]))
                    / (F.col("dl") + F.lit(_QL_MU))
                ),
                6,
            )
            * 1e6
        ).cast("long")
        t6s.append(t6)
        hits.append((tf > 0).cast("long"))
    if not t6s:  # no query term appears in the corpus: old shape was empty
        return wide.select(
            "doc_id",
            F.lit(0).cast("long").alias("n_hits"),
            F.lit(0).cast("long").alias("q6"),
        ).filter(F.lit(False))
    n_hits = hits[0]
    for h in hits[1:]:
        n_hits = n_hits + h
    q6 = t6s[0]
    for e in t6s[1:]:
        q6 = q6 + e
    return wide.select(
        "doc_id",
        n_hits.cast("long").alias("n_hits"),
        q6.cast("long").alias("q6"),
    )


def _dbm25(spark, sf_dir):
    """Okapi BM25 top-k over the shared retrieval frames; the final
    ranking is a TakeOrdered top-15. At 100 TB the only corpus-sized
    shuffle is the (doc, term) count — everything after is bounded by
    matches and the k of top-k."""
    wide = _retrieval_wide(spark, sf_dir)
    return (
        _bm25_score_frame(wide)
        .select(
            "doc_id",
            "n_terms",
            F.round(F.col("b6").cast("double") / 1e6, 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(15)
    )


CATALOG["doc_bm25_topk"].fn = _dbm25

# per-(source, token) counts — the shared base of the KL divergence and
# vocabulary-richness oracles. tc is MATERIALIZED because every consumer
# references it 2+ times (the KL union grid reads it 3 ways). Shared-CTE
# refactors are allowed even for live-window oracles: the driver records
# fresh evidence AFTER each session, so there is no frozen text to protect
# — the rule is simply that parity must be green at session end.
_SRC_TC_CTES = """tok AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    tc AS MATERIALIZED (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, tok
    )"""

register(
    "doc_source_kl_divergence",
    # corpus mixing diagnostics: smoothed unigram KL divergence between
    # every source pair (both directions + the symmetric Jeffreys sum).
    # The closed form (Na+V)*KL = sum over the pair's UNION tokens of
    # (ca+1)*ln((ca+1)/(cb+1)) + (Na+V)*ln((Nb+V)/(Na+V)) makes the
    # token sum an exact integer micro-nat dot product — tokens outside
    # the union contribute exactly through the closed-form remainder,
    # so this is the TRUE Laplace-smoothed KL, not a truncation.
    oracle=f"""
    WITH {_SRC_TC_CTES},
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tc GROUP BY source),
    voc AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM tc),
    grid AS (
      SELECT a.source AS src_a, a.n AS na, b.source AS src_b, b.n AS nb
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    u AS (
      SELECT g.src_a, g.src_b, g.na, g.nb, t.tok,
             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
      FROM grid g
      CROSS JOIN (SELECT DISTINCT tok FROM tc) t
      LEFT JOIN tc ca ON ca.source = g.src_a AND ca.tok = t.tok
      LEFT JOIN tc cb ON cb.source = g.src_b AND cb.tok = t.tok
      WHERE COALESCE(ca.c, 0) > 0 OR COALESCE(cb.c, 0) > 0
    ),
    terms AS (
      SELECT src_a, src_b, na, nb,
             CAST(COUNT(*) AS BIGINT) AS n_union_tokens,
             CAST(SUM((ca + 1) * CAST(round(round(ln((ca + 1.0) / (cb + 1.0)), 6)
                                            * 1000000) AS BIGINT)) AS BIGINT) AS sab6,
             CAST(SUM((cb + 1) * CAST(round(round(ln((cb + 1.0) / (ca + 1.0)), 6)
                                            * 1000000) AS BIGINT)) AS BIGINT) AS sba6
      FROM u GROUP BY src_a, src_b, na, nb
    )
    SELECT src_a, src_b, n_union_tokens,
           round(CAST(sab6 AS DOUBLE) / 1000000.0 / (na + voc.v)
                 + round(ln(CAST(nb + voc.v AS DOUBLE) / (na + voc.v)), 6), 6) AS kl_ab,
           round(CAST(sba6 AS DOUBLE) / 1000000.0 / (nb + voc.v)
                 + round(ln(CAST(na + voc.v AS DOUBLE) / (nb + voc.v)), 6), 6) AS kl_ba,
           round(CAST(sab6 AS DOUBLE) / 1000000.0 / (na + voc.v)
                 + round(ln(CAST(nb + voc.v AS DOUBLE) / (na + voc.v)), 6)
                 + CAST(sba6 AS DOUBLE) / 1000000.0 / (nb + voc.v)
                 + round(ln(CAST(na + voc.v AS DOUBLE) / (nb + voc.v)), 6), 6) AS jeffreys
    FROM terms CROSS JOIN voc
    """,
)


def _dsrckl(spark, sf_dir):
    """Pairwise source KL: the (source, token) count table groups once
    into a per-token count MAP (bounded by the source-domain size),
    the 190-row source-pair grid broadcasts against it, and each pair's
    micro-nat dot product reduces in one aggregate — the corpus is
    scanned once, the only big shuffle is token-keyed, and the pair
    space lives entirely in the vocabulary x grid frame, never in the
    document space."""
    d = t(spark, sf_dir, "documents")
    tk = tok_arr(F.col("text"))
    tc = (
        d.select("source", F.explode(tk).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = tc.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    voc = tc.agg(F.countDistinct("tok").cast("long").alias("v"))
    ta, tb = tot.withColumnsRenamed({"source": "src_a", "n": "na"}), tot.withColumnsRenamed(
        {"source": "src_b", "n": "nb"}
    )
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
    mn = lambda x, y: F.round(F.round(F.log((x + 1.0) / (y + 1.0)), 6) * 1e6).cast("long")  # noqa: E731
    terms = u.groupBy("src_a", "src_b", "na", "nb").agg(
        F.count("*").cast("long").alias("n_union_tokens"),
        F.sum((F.col("ca") + 1) * mn(F.col("ca"), F.col("cb"))).cast("long").alias("sab6"),
        F.sum((F.col("cb") + 1) * mn(F.col("cb"), F.col("ca"))).cast("long").alias("sba6"),
    )
    kl_ab = F.col("sab6").cast("double") / 1e6 / (F.col("na") + F.col("v")) + F.round(
        F.log((F.col("nb") + F.col("v")).cast("double") / (F.col("na") + F.col("v"))), 6
    )
    kl_ba = F.col("sba6").cast("double") / 1e6 / (F.col("nb") + F.col("v")) + F.round(
        F.log((F.col("na") + F.col("v")).cast("double") / (F.col("nb") + F.col("v"))), 6
    )
    return terms.crossJoin(F.broadcast(voc)).select(
        "src_a",
        "src_b",
        "n_union_tokens",
        F.round(kl_ab, 6).alias("kl_ab"),
        F.round(kl_ba, 6).alias("kl_ba"),
        F.round(kl_ab + kl_ba, 6).alias("jeffreys"),
    )


CATALOG["doc_source_kl_divergence"].fn = _dsrckl


def _hits_oracle(rounds: int = 2) -> str:
    """Oracle for unrolled HITS over the near-dup graph: edges directed
    low-id -> high-id, each round computes hub scores from authority
    scores and vice versa with L1 normalization; neighbor sums are
    micro-unit integer dot products, normalized scores round to 6 dp
    (ratio of exact integers -> identical doubles)."""
    prev_a = "a0"
    iters = []
    for r in range(1, rounds + 1):
        iters.append(f""",
    h{r}r AS (
      SELECT e.src AS node,
             CAST(SUM(CAST(floor(round(p.a, 6) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s
      FROM e JOIN {prev_a} p ON p.node = e.dst GROUP BY e.src
    ),
    h{r}t AS (SELECT CAST(SUM(s) AS BIGINT) AS tot FROM h{r}r),
    h{r} AS (
      SELECT n.node,
             round(CAST(COALESCE(h{r}r.s, 0) AS DOUBLE) / NULLIF(t.tot, 0), 6) AS h
      FROM nodes n LEFT JOIN h{r}r ON h{r}r.node = n.node CROSS JOIN h{r}t t
    ),
    a{r}r AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(floor(round(p.h, 6) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s
      FROM e JOIN h{r} p ON p.node = e.src GROUP BY e.dst
    ),
    a{r}t AS (SELECT CAST(SUM(s) AS BIGINT) AS tot FROM a{r}r),
    a{r} AS (
      SELECT n.node,
             round(CAST(COALESCE(a{r}r.s, 0) AS DOUBLE) / NULLIF(t.tot, 0), 6) AS a
      FROM nodes n LEFT JOIN a{r}r ON a{r}r.node = n.node CROSS JOIN a{r}t t
    )""")
        prev_a = f"a{r}"
    return f"""
    WITH pairs AS MATERIALIZED ({_minhash_portable_oracle()}),
    e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs),
    nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    a0 AS (SELECT node, 1.0 AS a FROM nodes){"".join(iters)}
    SELECT n.node AS doc_id, h.h AS hub, x.a AS authority
    FROM nodes n
    JOIN h{rounds} h ON h.node = n.node
    JOIN a{rounds} x ON x.node = n.node
    ORDER BY authority DESC, doc_id LIMIT 15
    """


register("graph_hits_rounds", oracle=_hits_oracle())


def _dhits(spark, sf_dir):
    """Two unrolled HITS rounds (Kleinberg hubs/authorities) over the
    near-dup graph with edges directed low-id -> high-id: the
    mutual-reinforcement counterpart to PageRank — a doc is a strong
    authority when many strong hubs point at it. Same iterative
    conventions as PageRank: the edge set is computed once and
    persisted, every round's score frame is localCheckpoint'ed so plan
    depth stays constant, neighbor sums are micro-unit integers, and
    each L1 normalization is a 1-row broadcast scalar."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dup_pairs_portable(
        d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.5
    ).select("id_a", "id_b")
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).persist()
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        a = nodes.select("node", F.lit(1.0).alias("a"))
        h = None
        for _ in range(2):
            hr = (
                e.join(a.withColumnsRenamed({"node": "dst"}), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(
                    F.sum(F.floor(F.round(F.col("a"), 6) * 1e6 + F.lit(0.5)).cast("long"))
                    .cast("long")
                    .alias("s")
                )
            )
            ht = hr.agg(F.sum("s").cast("long").alias("tot"))
            h = (
                nodes.join(hr, "node", "left")
                .crossJoin(F.broadcast(ht))
                .select(
                    "node",
                    F.round(
                        F.coalesce(F.col("s"), F.lit(0)).cast("double")
                        / F.nullif(F.col("tot"), F.lit(0)),
                        6,
                    ).alias("h"),
                )
                .localCheckpoint(eager=True)
            )
            ar = (
                e.join(h.withColumnsRenamed({"node": "src"}), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    F.sum(F.floor(F.round(F.col("h"), 6) * 1e6 + F.lit(0.5)).cast("long"))
                    .cast("long")
                    .alias("s")
                )
            )
            at = ar.agg(F.sum("s").cast("long").alias("tot"))
            a = (
                nodes.join(ar, "node", "left")
                .crossJoin(F.broadcast(at))
                .select(
                    "node",
                    F.round(
                        F.coalesce(F.col("s"), F.lit(0)).cast("double")
                        / F.nullif(F.col("tot"), F.lit(0)),
                        6,
                    ).alias("a"),
                )
                .localCheckpoint(eager=True)
            )
        return (
            nodes.join(h, "node")
            .join(a, "node")
            .select(F.col("node").alias("doc_id"), F.col("h").alias("hub"), F.col("a").alias("authority"))
            .orderBy(F.desc("authority"), "doc_id")
            .limit(15)
        )
    finally:
        e.unpersist()


CATALOG["graph_hits_rounds"].fn = _dhits

register(
    "dedup_minhash_pr_vs_exact",
    # the dedup-quality scorecard: precision/recall/F1 of the MinHash
    # near-dup decision (estimate >= 0.5) against EXACT shingle Jaccard
    # ground truth, evaluated over the union of two independent
    # candidate generators (all LSH band collisions + all same-block
    # pairs) — the standard ER evaluation universe, since exact
    # all-pairs truth is quadratic. F1 uses 2tp/(pred+truth).
    oracle=f"""
    WITH cand AS MATERIALIZED ({_minhash_portable_oracle(thr=0.0)}),
    g AS MATERIALIZED (
      SELECT doc_id, source, lang, n_chars // 100 AS lb, {_GRAMS3_SQL} AS gs
      FROM (SELECT doc_id, source, lang, n_chars,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
            FROM documents)
    ),
    be AS (
      SELECT c.id_a, c.id_b, c.jaccard_est,
             CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
               / (len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)))
               AS true_j
      FROM cand c
      JOIN g ga ON ga.doc_id = c.id_a
      JOIN g gb ON gb.doc_id = c.id_b
    ),
    bl AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
               / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) AS true_j
      FROM g a JOIN g b
        ON a.source = b.source AND a.lang = b.lang AND a.lb = b.lb
       AND a.doc_id < b.doc_id
    ),
    u AS (
      SELECT COALESCE(be.id_a, bl.id_a) AS id_a,
             COALESCE(be.true_j, bl.true_j) AS true_j,
             be.jaccard_est
      FROM be FULL OUTER JOIN bl ON be.id_a = bl.id_a AND be.id_b = bl.id_b
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_universe,
             CAST(SUM(CASE WHEN true_j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
             CAST(SUM(CASE WHEN jaccard_est >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
             CAST(SUM(CASE WHEN jaccard_est >= 0.5 AND true_j >= 0.5
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM u
    )
    SELECT n_universe, n_truth, n_pred, tp,
           round(CAST(tp AS DOUBLE) / NULLIF(n_pred, 0), 6) AS precision_at_05,
           round(CAST(tp AS DOUBLE) / NULLIF(n_truth, 0), 6) AS recall_at_05,
           round(2.0 * tp / NULLIF(n_pred + n_truth, 0), 6) AS f1_at_05
    FROM m
    """,
)


def _dmhpr(spark, sf_dir):
    """MinHash precision/recall vs exact Jaccard: the LSH candidate set
    (all band collisions, threshold 0) full-outer-joins the blocked
    exact pair set, exact truth is computed only inside that bounded
    universe, and the scorecard is one aggregate. The expensive exact
    Jaccard never touches the full pair space — candidates come from
    equi-joins on band hashes and block keys."""
    from ..ops.dedup import norm_tokens, shingles_from_tokens

    d = t(spark, sf_dir, "documents")
    cand = dedup.minhash_dup_pairs_portable(
        d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.0
    ).select("id_a", "id_b", "jaccard_est")
    g = d.select(
        "doc_id",
        "source",
        "lang",
        F.expr("n_chars div 100").alias("lb"),
        shingles_from_tokens(norm_tokens(F.col("text")), 3).alias("gs"),
    ).localCheckpoint(eager=False)

    def _exact(ga, gb):
        inter = F.size(F.array_intersect(ga, gb))
        return inter.cast("double") / (F.size(ga) + F.size(gb) - inter)

    be = (
        cand.join(g.withColumnsRenamed({"doc_id": "id_a"}).select("id_a", F.col("gs").alias("__ga")), "id_a")
        .join(g.withColumnsRenamed({"doc_id": "id_b"}).select("id_b", F.col("gs").alias("__gb")), "id_b")
        .select("id_a", "id_b", "jaccard_est", _exact(F.col("__ga"), F.col("__gb")).alias("true_j"))
    )
    ga = g.select("source", "lang", "lb", F.col("doc_id").alias("__ia"), F.col("gs").alias("__ga"))
    gb = g.select("source", "lang", "lb", F.col("doc_id").alias("__ib"), F.col("gs").alias("__gb"))
    bl = (
        ga.join(gb, ["source", "lang", "lb"])
        .filter(F.col("__ia") < F.col("__ib"))
        .select(
            F.col("__ia").alias("id_a"),
            F.col("__ib").alias("id_b"),
            _exact(F.col("__ga"), F.col("__gb")).alias("true_j"),
        )
    )
    u = be.withColumnsRenamed({"true_j": "__tj_be"}).join(
        bl.withColumnsRenamed({"true_j": "__tj_bl"}), ["id_a", "id_b"], "full"
    ).select(
        F.coalesce(F.col("__tj_be"), F.col("__tj_bl")).alias("true_j"),
        "jaccard_est",
    )
    truth = F.col("true_j") >= 0.5
    pred = F.col("jaccard_est") >= 0.5
    m = u.agg(
        F.count("*").cast("long").alias("n_universe"),
        F.sum(F.when(truth, 1).otherwise(0)).cast("long").alias("n_truth"),
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias("n_pred"),
        F.sum(F.when(pred & truth, 1).otherwise(0)).cast("long").alias("tp"),
    )
    return m.select(
        "n_universe",
        "n_truth",
        "n_pred",
        "tp",
        F.round(F.col("tp").cast("double") / F.nullif(F.col("n_pred"), F.lit(0)), 6).alias(
            "precision_at_05"
        ),
        F.round(F.col("tp").cast("double") / F.nullif(F.col("n_truth"), F.lit(0)), 6).alias(
            "recall_at_05"
        ),
        F.round(
            F.lit(2.0) * F.col("tp") / F.nullif(F.col("n_pred") + F.col("n_truth"), F.lit(0)),
            6,
        ).alias("f1_at_05"),
    )


CATALOG["dedup_minhash_pr_vs_exact"].fn = _dmhpr

register(
    "evt_markov_next_event_accuracy",
    # sequence-model evaluation in relational algebra: transition
    # counts trained on a deterministic 80% user split predict each
    # test-user transition's next event type (argmax count, ties
    # broken lexicographically); accuracy reported per current state.
    # Train/test share one lag pass — the split is a hash predicate.
    oracle=f"""
    WITH u AS (
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN {_HASH01_SQL.format(key="CAST(user_id AS VARCHAR) || 'mkv'")} < 0.8
                  THEN 1 ELSE 0 END AS is_train
      FROM events
    ),
    tr AS (
      SELECT user_id, is_train, event_type AS s,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM u
    ),
    trans AS (SELECT * FROM tr WHERE nxt IS NOT NULL),
    cnt AS (
      SELECT s, nxt, CAST(COUNT(*) AS BIGINT) AS c
      FROM trans WHERE is_train = 1 GROUP BY s, nxt
    ),
    pred AS (
      SELECT s, nxt AS pred FROM (
        SELECT s, nxt, ROW_NUMBER() OVER (PARTITION BY s ORDER BY c DESC, nxt) AS rn
        FROM cnt
      ) WHERE rn = 1
    )
    SELECT t.s AS state, p.pred AS predicted_next,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.nxt = p.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(CAST(SUM(CASE WHEN t.nxt = p.pred THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS accuracy
    FROM trans t JOIN pred p ON p.s = t.s
    WHERE t.is_train = 0
    GROUP BY t.s, p.pred
    """,
)


def _dmkvacc(spark, sf_dir):
    """Markov next-event prediction accuracy: one user-partitioned lag
    window builds every transition, the hash split sends 80% of users
    to training counts (a state-keyed aggregate over a bounded type
    domain), the argmax predictor is a tiny frame that broadcasts onto
    test transitions, and accuracy is one grouped aggregate — the
    train/eval loop of a sequence model with zero data movement beyond
    the session shuffle."""
    from ..ops.sampling import hash_uniform01

    ev = t(spark, sf_dir, "events")
    u = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        (
            hash_uniform01(F.concat(F.col("user_id").cast("string"), F.lit("mkv")))
            < 0.8
        ).alias("is_train"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        u.select(
            "is_train",
            F.col("event_type").alias("s"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .localCheckpoint(eager=False)
    )
    cnt = (
        trans.filter(F.col("is_train"))
        .groupBy("s", "nxt")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pred = (
        cnt.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("s").orderBy(F.desc("c"), "nxt")),
        )
        .filter(F.col("rn") == 1)
        .select("s", F.col("nxt").alias("pred"))
    )
    hit = F.col("nxt") == F.col("pred")
    return (
        trans.filter(~F.col("is_train"))
        .join(F.broadcast(pred), "s")
        .groupBy(F.col("s").alias("state"), F.col("pred").alias("predicted_next"))
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_correct"),
            F.round(
                F.sum(F.when(hit, 1).otherwise(0)).cast("double") / F.count("*"), 6
            ).alias("accuracy"),
        )
    )


CATALOG["evt_markov_next_event_accuracy"].fn = _dmkvacc

# Single-sourced CMS pieces: the 4x512 sketch geometry, the sha2 cell
# function and the top-20 probe are shared by the batch build AND the
# streaming-state run — changing width/depth/salt in one place keeps
# both queries (and their common oracle) in sync by construction.
_CMS_ORACLE = """
    WITH uc AS MATERIALIZED (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
    ),
    cells AS MATERIALIZED (
      SELECT u.user_id, u.c, r.r,
             ('0x' || substr(sha256(CAST(u.user_id AS VARCHAR) || 'cms'
                                    || CAST(r.r AS VARCHAR)), 1, 8))::UBIGINT % 512
                 AS cell
      FROM uc u CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) r
    ),
    sk AS (
      SELECT r, cell, CAST(SUM(c) AS BIGINT) AS total
      FROM cells GROUP BY r, cell
    ),
    top20 AS (
      SELECT user_id, c FROM uc ORDER BY c DESC, user_id LIMIT 20
    ),
    est AS (
      SELECT t.user_id, t.c AS exact_count,
             CAST(MIN(s.total) AS BIGINT) AS cms_estimate
      FROM top20 t
      JOIN cells ce ON ce.user_id = t.user_id
      JOIN sk s ON s.r = ce.r AND s.cell = ce.cell
      GROUP BY t.user_id, t.c
    )
    SELECT user_id, exact_count, cms_estimate,
           CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
    FROM est ORDER BY exact_count DESC, user_id
    """


def _cms_cell():
    """Deterministic CMS cell index for the (user_id, r) coordinate —
    the Spark twin of the sha2 expression inside _CMS_ORACLE."""
    return (
        F.conv(
            F.substring(
                F.sha2(
                    F.concat(
                        F.col("user_id").cast("string"),
                        F.lit("cms"),
                        F.col("r").cast("string"),
                    ),
                    256,
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 512
    )


def _cms_probe(uc, sk):
    """Top-20 exact counts probed against a built sketch: 4 coordinates
    per user through an equi-join, min over the rows."""
    top20 = uc.orderBy(F.desc("c"), "user_id").limit(20).select(
        "user_id", F.col("c").alias("exact_count")
    )
    coords = top20.select(
        "user_id", "exact_count", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    ).withColumn("cell", _cms_cell())
    est = (
        coords.join(sk, ["r", "cell"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("total").cast("long").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).cast("long").alias("overestimate"),
    ).orderBy(F.desc("exact_count"), "user_id")


register(
    "sketch_cms_user_counts",
    # Count-Min sketch accuracy report: a 4x512 CMS over per-user event
    # counts (cells from the portable sha2 hash family), point
    # estimates (min over the 4 rows) checked against exact counts for
    # the top-20 users. CMS never underestimates; the report shows the
    # collision overestimate the width buys at this cardinality.
    oracle=_CMS_ORACLE,
)


def _dcms(spark, sf_dir):
    """Count-Min sketch build + accuracy probe: per-user counts fan out
    to 4 deterministic (row, cell) coordinates, the sketch is one
    (row, cell)-keyed aggregate of 2048 cells (mergeable across
    partitions and days, like the HLL family), and the probe joins the
    top-20 users' coordinates back to the sketch through an equi-join
    and takes the row-wise MIN. At stream scale the sketch is the
    fixed-size state; the exact side here exists only to score it."""
    ev = t(spark, sf_dir, "events")
    uc = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    cells = uc.select(
        "user_id", "c", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    ).withColumn("cell", _cms_cell())
    sk = cells.groupBy("r", "cell").agg(F.sum("c").cast("long").alias("total"))
    return _cms_probe(uc, sk)


CATALOG["sketch_cms_user_counts"].fn = _dcms

register(
    "ml_winsorized_segment_stats",
    # robust moments: per-segment order values winsorized at the
    # within-segment exact p05/p95 (clamp bounds snap to whole cents,
    # so the clamped column is integer-exact) with raw-vs-winsorized
    # mean and the winsorized standard deviation from exact integer
    # moments — the outlier-insensitive summary a feature pipeline
    # prefers over raw means.
    oracle="""
    WITH x AS (
      SELECT c.c_mktsegment AS segment,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    q AS (
      SELECT segment,
             CAST(floor(quantile_cont(cents, 0.05) + 0.5) AS BIGINT) AS lo_c,
             CAST(floor(quantile_cont(cents, 0.95) + 0.5) AS BIGINT) AS hi_c
      FROM x GROUP BY segment
    ),
    w AS (
      SELECT x.segment, x.cents,
             LEAST(GREATEST(x.cents, q.lo_c), q.hi_c) AS wc
      FROM x JOIN q ON q.segment = x.segment
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(MIN(wc) / 100.0, 2) AS clamp_lo,
           round(MAX(wc) / 100.0, 2) AS clamp_hi,
           round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 6) AS mean_raw,
           round(CAST(SUM(wc) AS DOUBLE) / COUNT(*) / 100.0, 6) AS mean_winsorized,
           round(sqrt((CAST(COUNT(*) AS DOUBLE)
                       * CAST(SUM(CAST(wc AS HUGEINT) * wc) AS DOUBLE)
                       - CAST(SUM(wc) AS DOUBLE) * SUM(wc))
                      / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1))) / 100.0, 6)
               AS sd_winsorized
    FROM w GROUP BY segment
    """,
)


def _dwinsor(spark, sf_dir):
    """Winsorized per-segment stats: exact within-segment percentiles
    come from one grouped aggregate (a segment-count-sized frame that
    broadcasts back onto the rows), clamping is a map-side expression,
    and the robust moments are one more grouped aggregate over integer
    cents — two shuffles on the segment key, no window over raw rows."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    x = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        )
        .localCheckpoint(eager=False)
    )
    q = x.groupBy("segment").agg(
        F.floor(F.percentile("cents", F.lit(0.05)) + 0.5).cast("long").alias("lo_c"),
        F.floor(F.percentile("cents", F.lit(0.95)) + 0.5).cast("long").alias("hi_c"),
    )
    w = x.join(F.broadcast(q), "segment").select(
        "segment",
        "cents",
        F.least(F.greatest(F.col("cents"), F.col("lo_c")), F.col("hi_c")).alias("wc"),
    )
    nd = F.count("*").cast("double")
    return w.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.min("wc") / 100.0, 2).alias("clamp_lo"),
        F.round(F.max("wc") / 100.0, 2).alias("clamp_hi"),
        F.round(F.sum("cents").cast("double") / F.count("*") / 100.0, 6).alias("mean_raw"),
        F.round(F.sum("wc").cast("double") / F.count("*") / 100.0, 6).alias(
            "mean_winsorized"
        ),
        F.round(
            F.sqrt(
                (
                    nd
                    * F.sum(F.col("wc").cast("decimal(28,0)") * F.col("wc")).cast("double")
                    - F.sum("wc").cast("double") * F.sum("wc")
                )
                / (nd * (F.count("*") - 1))
            )
            / 100.0,
            6,
        ).alias("sd_winsorized"),
    )


CATALOG["ml_winsorized_segment_stats"].fn = _dwinsor

register(
    "sim_lsh_recall_vs_bits",
    # the sign-LSH tuning curve: recall@10 and candidate-set size of
    # the bucket-filtered search at 4/8/12 hyperplanes against the
    # exact cosine top-10 — more bits = smaller buckets = cheaper
    # probes = lower recall. The per-operator counterpart of the IVF
    # nprobe sweep; this is the table an ANN deployment reads before
    # picking its bit width.
    oracle=f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    exact10 AS (
      SELECT e.vec_id
      FROM embeddings e, q
      ORDER BY {_DOT_SQL} / (SQRT({_NORM_SQL_E}) * SQRT({_NORM_SQL_Q})) DESC,
               e.vec_id
      LIMIT 10
    ),
    {", ".join(f'''
    cand{bits} AS (
      SELECT e.vec_id,
             {_DOT_SQL} / (SQRT({_NORM_SQL_E}) * SQRT({_NORM_SQL_Q})) AS cs
      FROM embeddings e, q
      WHERE {similarity.sign_bucket_sql("e.embedding", bits)}
            = {similarity.sign_bucket_sql("q.embedding", bits)}
    ),
    top{bits} AS (SELECT vec_id FROM cand{bits} ORDER BY cs DESC, vec_id LIMIT 10),
    row{bits} AS (
      SELECT CAST({bits} AS BIGINT) AS bits,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{bits}) AS n_candidates,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM top{bits} t JOIN exact10 x ON x.vec_id = t.vec_id) AS n_hits
    )''' for bits in (4, 8, 12))}
    SELECT bits, n_candidates, n_hits,
           round(CAST(n_hits AS DOUBLE) / 10.0, 6) AS recall_at_10
    FROM (SELECT * FROM row4 UNION ALL SELECT * FROM row8 UNION ALL
          SELECT * FROM row12)
    ORDER BY bits
    """,
)


def _dlshsweep(spark, sf_dir):
    """Sign-LSH recall sweep: the corpus is scanned once per bit level
    with a bucket-equality predicate (at scale the bucket is the
    partition key, so each probe is a pruned scan, not a full pass);
    top-10s are TakeOrdered; hits and candidate counts are 1-row
    aggregates stitched by broadcast. Everything downstream of the
    bucket filter is k-row sized."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).agg(F.first("embedding").alias("qv"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            "qv",
            similarity.cosine(F.col("embedding"), F.col("qv")).alias("cs"),
        )
        .localCheckpoint(eager=False)
    )
    exact10 = scored.orderBy(F.desc("cs"), "vec_id").limit(10).select("vec_id")
    out = None
    for bits in (4, 8, 12):
        cand = scored.filter(
            similarity.sign_bucket(F.col("embedding"), bits)
            == similarity.sign_bucket(F.col("qv"), bits)
        )
        n_cand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
        top = cand.orderBy(F.desc("cs"), "vec_id").limit(10).select("vec_id")
        hits = top.join(exact10, "vec_id").agg(
            F.count("*").cast("long").alias("n_hits")
        )
        row = (
            n_cand.crossJoin(F.broadcast(hits))
            .select(
                F.lit(bits).cast("long").alias("bits"),
                "n_candidates",
                "n_hits",
                F.round(F.col("n_hits").cast("double") / 10.0, 6).alias("recall_at_10"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("bits")


CATALOG["sim_lsh_recall_vs_bits"].fn = _dlshsweep

_BEWMA_WIN = "(PARTITION BY event_type ORDER BY h)"
_BEWMA_NUM1, _BEWMA_DEN1 = _ewma_terms("cents", _BEWMA_WIN)
_BEWMA_NUM2, _BEWMA_DEN2 = _ewma_terms("s16", _BEWMA_WIN)

register(
    "evt_brown_double_ewma_hourly",
    # Brown's double exponential smoothing (the one-parameter linear
    # trend forecaster): the 8-tap truncated EWMA applied twice —
    # second pass over the FIRST pass's micro-unit-quantized output, so
    # both smoothing stages stay engine-exact — then level
    # a = 2*s1 - s2, trend b = (alpha/(1-alpha))*(s1 - s2), and the
    # one-step forecast a + b per event type.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE},
    s1t AS (
      SELECT event_type, h, cents,
             CAST(floor((({_BEWMA_NUM1}) / ({_BEWMA_DEN1})) * 10000 + 0.5)
                  AS BIGINT) AS s16
      FROM obs
    ),
    s2t AS (
      SELECT event_type, h, cents, s16,
             (({_BEWMA_NUM2}) / ({_BEWMA_DEN2})) / 10000.0 AS s2c
      FROM s1t
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           CAST(cents AS DOUBLE) / 100.0 AS total_value,
           round(s16 / 10000.0 / 100.0, 6) AS s1,
           round(s2c / 100.0, 6) AS s2,
           round((2.0 * (s16 / 10000.0) - s2c
                  + 0.3333333333333333 * (s16 / 10000.0 - s2c)) / 100.0, 6)
               AS forecast_next
    FROM s2t
    ORDER BY event_type, h
    """,
)


def _dbrown(spark, sf_dir):
    """Double EWMA: two stacked 8-tap windowed filters sharing ONE
    event_type-partitioned sort (the second window has the same spec,
    so Catalyst plans a single exchange+sort), the inter-stage value
    quantized to integer ten-thousandths so the second filter's input
    is bit-identical across engines. Linear work, one shuffle, the
    standard scale-out shape for recursive smoothers."""
    obs = _hourly_type_cents(spark, sf_dir)
    s1t = obs.withColumn(
        "s16",
        F.expr(
            f"CAST(floor((({_BEWMA_NUM1}) / ({_BEWMA_DEN1})) * 10000 + 0.5) AS BIGINT)"
        ),
    )
    s2t = s1t.withColumn(
        "s2c", F.expr(f"(({_BEWMA_NUM2}) / ({_BEWMA_DEN2})) / 10000.0")
    )
    return (
        s2t.select(
            "event_type",
            "h",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            (F.col("cents").cast("double") / 100.0).alias("total_value"),
            F.round(F.col("s16") / 10000.0 / 100.0, 6).alias("s1"),
            F.round(F.col("s2c") / 100.0, 6).alias("s2"),
            F.round(
                (
                    2.0 * (F.col("s16") / 10000.0)
                    - F.col("s2c")
                    + (0.25 / 0.75) * (F.col("s16") / 10000.0 - F.col("s2c"))
                )
                / 100.0,
                6,
            ).alias("forecast_next"),
        )
        .orderBy("event_type", "h")
        .drop("h")
    )


CATALOG["evt_brown_double_ewma_hourly"].fn = _dbrown

register(
    "lineitem_seasonality_index",
    # classical seasonal index per brand: each month's revenue over the
    # brand's mean monthly revenue (1.0 = an average month). Revenue in
    # exact scale-4 integer units; the index is a ratio of exact
    # integers. The window runs over the (brand, month) aggregate —
    # bounded by brands x months, partitioned by brand.
    oracle="""
    WITH r AS (
      SELECT p.p_brand,
             strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS month,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                      * 10000) AS BIGINT) AS units
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    w AS (
      SELECT p_brand, month, units,
             CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n_months,
             CAST(SUM(units) OVER (PARTITION BY p_brand) AS BIGINT) AS total_units
      FROM r
    )
    SELECT p_brand, month,
           round(CAST(units AS DOUBLE) / 10000.0, 4) AS revenue,
           round(CAST(units AS DOUBLE) * n_months / total_units, 6)
               AS seasonal_index
    FROM w
    """,
)


def _dseason(spark, sf_dir):
    """Per-brand monthly seasonal index: the join carries only
    (partkey -> brand), the aggregate reduces to brands x months rows,
    and the normalizing moments are brand-partitioned windows over
    that already-tiny frame — no scalar broadcast, no second scan of
    lineitem."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    one = F.lit(1).cast("decimal(3,2)")
    units = (
        F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC)) * 10000
    )
    r = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("month"),
        )
        .agg(F.sum(units).cast("long").alias("units"))
    )
    w = Window.partitionBy("p_brand")
    return r.select(
        "p_brand",
        "month",
        F.round(F.col("units") / 10000.0, 4).alias("revenue"),
        F.round(
            F.col("units").cast("double")
            * F.count("*").over(w).cast("long")
            / F.sum("units").over(w).cast("long"),
            6,
        ).alias("seasonal_index"),
    )


CATALOG["lineitem_seasonality_index"].fn = _dseason

register(
    "evt_stream_cms_now",
    # fifteenth streaming run: a Count-Min sketch maintained AS
    # STREAMING STATE — the (row, cell) counts aggregate is the entire
    # state (2048 rows regardless of stream length, the fixed-memory
    # promise that makes CMS the streaming frequency sketch), probed
    # after the run for the top-20 users' estimates. Same single-sourced
    # cells and algebra as the batch CMS, so the same oracle applies.
    oracle=_CMS_ORACLE,
)


def _dstreamcms(spark, sf_dir):
    """Streaming CMS: every event fans out to its 4 deterministic
    (row, cell) coordinates INSIDE the stream and the running sums are
    the streaming state (complete mode, 2048 rows — never per-user
    state). The post-run probe joins the top-20 users' coordinates to
    the sink. An unbounded-cardinality frequency question answered
    with O(1) streaming memory."""
    schema = _events_stream_schema(ts_ntz=False)
    src = _stream_file_source(spark, sf_dir, "events.parquet", schema)
    stream_cells = (
        src.select("user_id")
        .select("user_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r"))
        .withColumn("cell", _cms_cell())
        .groupBy("r", "cell")
        .agg(F.count("*").cast("long").alias("total"))
    )
    sk = _run_stream_to_memory(stream_cells, "evt_stream_cms_sink", "complete")
    ev = t(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    return _cms_probe(uc, sk)


CATALOG["evt_stream_cms_now"].fn = _dstreamcms

register(
    "evt_stream_kll_now",
    # sixteenth streaming run: a KLL quantile sketch maintained AS
    # STREAMING STATE — kll_sketch_agg_double over the event-value
    # stream in complete mode, so the sketch (k=200, bounded bytes) is
    # the entire state for any stream length: streaming percentiles
    # with O(1) memory, the quantile counterpart to the CMS frequency
    # run. Gated like the batch KLL twin: the oracle rows carry the
    # EXACT interpolated percentile (round 4dp — same q*(n-1) rule in
    # both engines) and within_bound = the sketch estimate's empirical
    # CDF position is within 0.05 of q (rank space is where KLL's
    # guarantee lives). Gate recipe single-sourced with the batch twin.
    oracle=_kll_oracle_sql("events", "value"),
)


def _dstreamkll(spark, sf_dir):
    """Streaming KLL quantiles: one global streaming aggregate holds
    the mergeable sketch (complete mode, one row of state); the
    post-run probe reads the estimates out of the sink and one batch
    pass computes the exact percentiles + the estimates' empirical
    ranks to verify the error bound. At 100 TB only the sketch side
    runs — the exact side exists to score it in the gate."""
    schema = _events_stream_schema(ts_ntz=False)
    src = _stream_file_source(spark, sf_dir, "events.parquet", schema)
    sketch = src.select(F.col("value").cast("double").alias("__v")).agg(
        F.kll_sketch_agg_double("__v").alias("__kll")
    )
    sink = _run_stream_to_memory(sketch, "evt_stream_kll_sink", "complete")
    ests = sink.select(
        *[
            F.kll_sketch_get_quantile_double("__kll", F.lit(q)).alias(f"__est{i}")
            for i, q in enumerate(_KLL_QS)
        ]
    )
    v = t(spark, sf_dir, "events").select(F.col("value").cast("double").alias("__v"))
    return _kll_gate(v, ests)


CATALOG["evt_stream_kll_now"].fn = _dstreamkll

register(
    "ml_nb_margin_calibration",
    # classifier calibration WITHOUT transcendental softmax: the NB
    # decision margin (top log-score minus runner-up, in exact
    # micro-nats) banded into 5 ranges, accuracy per band — a
    # well-calibrated classifier is more often right when its margin
    # is wide. Composes the shared _NB_CTES/_nb_frames pipeline; every
    # margin is an integer difference, so the report is engine-exact
    # with no exp() anywhere.
    oracle=f"""
    WITH {_NB_CTES},
    r AS MATERIALIZED (
      SELECT doc_id, lang, score6,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score6 DESC, lang) AS rn
      FROM scored
    ),
    top AS (SELECT doc_id, lang AS lang_pred, score6 AS s1 FROM r WHERE rn = 1),
    runner AS (SELECT doc_id, score6 AS s2 FROM r WHERE rn = 2),
    m AS (
      SELECT t.doc_id, t.lang_pred, CAST(t.s1 - ru.s2 AS BIGINT) AS m6, td.lang
      FROM top t
      JOIN runner ru ON ru.doc_id = t.doc_id
      JOIN test_docs td ON td.doc_id = t.doc_id
    )
    SELECT CASE WHEN m6 < 1000000 THEN '0: <1'
                WHEN m6 < 2000000 THEN '1: 1-2'
                WHEN m6 < 4000000 THEN '2: 2-4'
                WHEN m6 < 8000000 THEN '3: 4-8'
                ELSE '4: 8+' END AS margin_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(m6) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS mean_margin_nats,
           round(CAST(SUM(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS accuracy
    FROM m GROUP BY 1 ORDER BY 1
    """,
)


def _dnbcalib(spark, sf_dir):
    """NB margin calibration: one doc-partitioned rank window over the
    shared scored frame yields the top/runner-up pair, the margin is
    an exact integer micro-nat difference, and the report is one
    grouped aggregate over 5 bands — the reliability check every
    deployed classifier ships with, here in pure log-odds space so
    no exp() can diverge between engines."""
    test, scored = _nb_frames(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("__score6"), "lang")
    ranked = scored.withColumn("__rn", F.row_number().over(w)).localCheckpoint(
        eager=False
    )
    top = ranked.filter(F.col("__rn") == 1).select(
        "doc_id", F.col("lang").alias("lang_pred"), F.col("__score6").alias("__s1")
    )
    runner = ranked.filter(F.col("__rn") == 2).select(
        "doc_id", F.col("__score6").alias("__s2")
    )
    m = (
        top.join(runner, "doc_id")
        .join(test.select("doc_id", "lang"), "doc_id")
        .select(
            "lang",
            "lang_pred",
            (F.col("__s1") - F.col("__s2")).cast("long").alias("m6"),
        )
    )
    band = (
        F.when(F.col("m6") < 1000000, "0: <1")
        .when(F.col("m6") < 2000000, "1: 1-2")
        .when(F.col("m6") < 4000000, "2: 2-4")
        .when(F.col("m6") < 8000000, "3: 4-8")
        .otherwise("4: 8+")
    )
    hit = F.col("lang") == F.col("lang_pred")
    return (
        m.groupBy(band.alias("margin_band"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum("m6").cast("double") / F.count("*") / 1e6, 6).alias(
                "mean_margin_nats"
            ),
            F.round(
                F.sum(F.when(hit, 1).otherwise(0)).cast("double") / F.count("*"), 6
            ).alias("accuracy"),
        )
        .orderBy("margin_band")
    )


CATALOG["ml_nb_margin_calibration"].fn = _dnbcalib

register(
    "ml_lift_curve_deciles",
    # the gains/lift table — the standard targeting-model evaluation:
    # users scored by pre-period engagement (clicks+views before Jan
    # 21), outcome = purchased in the post-period; decile the scores,
    # report per-decile conversion, cumulative gain share and lift vs
    # the base rate. Model-free here (activity as the score), but the
    # evaluation harness is exactly what a propensity model plugs into.
    oracle="""
    WITH pre AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS score
      FROM events
      WHERE ts < TIMESTAMP '2024-01-21' AND event_type IN ('click', 'view')
      GROUP BY user_id
    ),
    post AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts >= TIMESTAMP '2024-01-21' AND event_type = 'purchase'
    ),
    s AS (
      SELECT p.user_id, p.score,
             CASE WHEN post.user_id IS NULL THEN 0 ELSE 1 END AS converted,
             NTILE(10) OVER (ORDER BY p.score DESC, p.user_id) AS decile
      FROM pre p LEFT JOIN post ON post.user_id = p.user_id
    ),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converters
      FROM s GROUP BY decile
    ),
    tot AS (
      SELECT CAST(SUM(n_users) AS BIGINT) AS nu,
             CAST(SUM(n_converters) AS BIGINT) AS nc
      FROM d
    )
    SELECT CAST(d.decile AS BIGINT) AS decile, d.n_users, d.n_converters,
           round(CAST(d.n_converters AS DOUBLE) / d.n_users, 6) AS conv_rate,
           round(CAST(SUM(d.n_converters) OVER (ORDER BY d.decile) AS DOUBLE)
                 / NULLIF(t.nc, 0), 6) AS cum_gain_share,
           round((CAST(d.n_converters AS DOUBLE) / d.n_users)
                 / NULLIF(CAST(t.nc AS DOUBLE) / t.nu, 0), 6) AS lift
    FROM d CROSS JOIN tot t
    ORDER BY decile
    """,
)


def _dlift(spark, sf_dir):
    """Decile gains/lift: the scored population is a per-user aggregate
    (users with pre-period activity), the decile assignment one ntile
    window over that aggregate, and the curve a 10-row frame — the
    cumulative window and the base-rate scalar both run over
    decile-cardinality data, never raw events."""
    ev = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-21")
    pre = (
        ev.filter((F.col("ts") < cut) & F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("score"))
    )
    post = (
        ev.filter((F.col("ts") >= cut) & (F.col("event_type") == "purchase"))
        .select("user_id")
        .distinct()
        .withColumn("__conv", F.lit(1))
    )
    s = (
        pre.join(post, "user_id", "left")
        .select(
            "user_id",
            "score",
            F.coalesce(F.col("__conv"), F.lit(0)).alias("converted"),
        )
        .withColumn(
            "decile", F.ntile(10).over(Window.orderBy(F.desc("score"), "user_id"))
        )
    )
    d = s.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converters"),
    ).localCheckpoint(eager=False)
    tot = d.agg(
        F.sum("n_users").cast("long").alias("nu"),
        F.sum("n_converters").cast("long").alias("nc"),
    )
    cum = F.sum("n_converters").over(Window.orderBy("decile"))
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_users",
            "n_converters",
            F.round(F.col("n_converters").cast("double") / F.col("n_users"), 6).alias(
                "conv_rate"
            ),
            F.round(
                cum.cast("double") / F.nullif(F.col("nc"), F.lit(0)), 6
            ).alias("cum_gain_share"),
            F.round(
                (F.col("n_converters").cast("double") / F.col("n_users"))
                / F.nullif(F.col("nc").cast("double") / F.col("nu"), F.lit(0.0)),
                6,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


CATALOG["ml_lift_curve_deciles"].fn = _dlift

register(
    "er_part_golden_records",
    # entity resolution END TO END — the MDM golden-record pipeline:
    # blocked Levenshtein matching over parts + planted typo twins,
    # transitive closure into entity clusters, then field-level
    # survivorship (canonical id = min pid, name from the canonical
    # row via arg_min, max size, min price) — one golden row per
    # multi-member entity. Composes fuzzy_string_pairs +
    # connected_components + a survivorship aggregate.
    oracle=f"""
    WITH RECURSIVE {_ER_TWIN_BASE_SQL},
    {_ER_PAIRS_SQL.format(max_block=dedup.DEFAULT_MAX_BLOCK)},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    walk(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.src, w.lab FROM edges e JOIN walk w ON e.dst = w.id
    ),
    lbl AS (SELECT id AS pid, MIN(lab) AS cluster FROM walk GROUP BY id),
    m AS (
      SELECT b.pid, b.p_name, b.p_brand, b.p_size, b.price_cents,
             COALESCE(l.cluster, b.pid) AS cluster
      FROM base b LEFT JOIN lbl l ON l.pid = b.pid
    )
    SELECT CAST(MIN(pid) AS BIGINT) AS canonical_id,
           arg_min(p_brand, pid) AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           arg_min(p_name, pid) AS canonical_name,
           MAX(p_size) AS max_size,
           round(CAST(MIN(price_cents) AS DOUBLE) / 100.0, 2) AS min_price
    FROM m GROUP BY cluster
    HAVING COUNT(*) >= 2
    ORDER BY canonical_id
    """,
)


def _der_golden(spark, sf_dir):
    """Golden records: the full master-data pipeline as a DAG of
    equi-joins — blocked fuzzy pairs (the pair space bounded by
    (brand, length) blocks), distributed min-label closure (bounded
    rounds, checkpointed labels), and ONE survivorship aggregate whose
    per-field rules (min_by name, max size, min price) produce the
    canonical row. Isolated records never enter the closure; the
    report carries only the merged entities a steward reviews."""
    from ..ops import graph

    base = _twin_base(spark, sf_dir).localCheckpoint(eager=False)
    pairs = _twin_fuzzy_pairs(base)
    lbl = graph.connected_components(pairs.select("id_a", "id_b"))
    m = base.join(lbl, base.pid == lbl.id, "left").select(
        "pid",
        "p_name",
        "p_brand",
        "p_size",
        "price_cents",
        F.coalesce(F.col("cluster"), F.col("pid")).alias("__cl"),
    )
    return (
        m.groupBy("__cl")
        .agg(
            F.min("pid").cast("long").alias("canonical_id"),
            F.min_by("p_brand", "pid").alias("brand"),
            F.count("*").cast("long").alias("n_members"),
            F.min_by("p_name", "pid").alias("canonical_name"),
            F.max("p_size").alias("max_size"),
            F.round(F.min("price_cents").cast("double") / 100.0, 2).alias("min_price"),
        )
        .filter(F.col("n_members") >= 2)
        .drop("__cl")
        .orderBy("canonical_id")
    )


CATALOG["er_part_golden_records"].fn = _der_golden

register(
    "evt_sliding_median_hourly",
    # robust rolling smoother: the exact 7-bucket sliding MEDIAN of
    # hourly totals per event type — the spike-resistant counterpart
    # of the centered moving average (one outlier hour shifts the mean
    # but not the median). The frame is 7 rows, so the exact
    # interpolated median stays a bounded per-row computation.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE}
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           CAST(cents AS DOUBLE) / 100.0 AS total_value,
           round(quantile_cont(cents, 0.5) OVER (
                   PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) / 100.0, 6)
               AS rolling_median
    FROM obs
    ORDER BY event_type, h
    """,
)


def _dslidemed(spark, sf_dir):
    """Sliding exact median: one event_type-partitioned window whose
    7-row frame feeds Spark's exact percentile aggregate — same single
    exchange+sort as the moving average, linear work, and the
    interpolation (mean of two middle integers on even frames) is
    exact in both engines."""
    obs = _hourly_type_cents(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-3, 3)
    )
    return (
        obs.select(
            "event_type",
            "h",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            (F.col("cents").cast("double") / 100.0).alias("total_value"),
            F.round(
                F.percentile("cents", F.lit(0.5)).over(w) / 100.0, 6
            ).alias("rolling_median"),
        )
        .orderBy("event_type", "h")
        .drop("h")
    )


CATALOG["evt_sliding_median_hourly"].fn = _dslidemed

register(
    "cust_value_quartile_migration",
    # the CRM segment-migration matrix: customers quartiled by revenue
    # within each of two adjacent half-years (deterministic ntile over
    # the per-customer aggregate), then the Q_from x Q_to transition
    # counts — customers absent from a period land in the 'none'
    # segment, so churn and acquisition appear as matrix rows/columns
    # instead of silently dropping out.
    oracle="""
    WITH r AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '1995-07-01' THEN 'h1'
                  ELSE 'h2' END AS period,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
    ),
    cr AS (
      SELECT period, o_custkey, CAST(SUM(cents) AS BIGINT) AS rev
      FROM r GROUP BY period, o_custkey
    ),
    q AS (
      SELECT period, o_custkey,
             'Q' || CAST(NTILE(4) OVER (PARTITION BY period
                                        ORDER BY rev DESC, o_custkey)
                         AS VARCHAR) AS seg
      FROM cr
    ),
    h1 AS (SELECT o_custkey, seg FROM q WHERE period = 'h1'),
    h2 AS (SELECT o_custkey, seg FROM q WHERE period = 'h2')
    SELECT COALESCE(h1.seg, 'none') AS seg_from,
           COALESCE(h2.seg, 'none') AS seg_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM h1 FULL OUTER JOIN h2 ON h2.o_custkey = h1.o_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)


def _dquartmig(spark, sf_dir):
    """Value-quartile migration: two per-period customer aggregates,
    ONE period-partitioned ntile window over that (small) frame, and a
    customer-keyed full outer join — churners and new customers
    surface as 'none' rows. At scale both heavy shuffles are on the
    customer key and the windowed frame is customers-per-period sized,
    never order-level."""
    o = t(spark, sf_dir, "orders")
    r = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    ).select(
        "o_custkey",
        F.when(F.col("o_orderdate") < F.lit("1995-07-01"), "h1")
        .otherwise("h2")
        .alias("period"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    )
    cr = r.groupBy("period", "o_custkey").agg(F.sum("cents").cast("long").alias("rev"))
    q = cr.select(
        "period",
        "o_custkey",
        F.concat(
            F.lit("Q"),
            F.ntile(4)
            .over(Window.partitionBy("period").orderBy(F.desc("rev"), "o_custkey"))
            .cast("string"),
        ).alias("seg"),
    ).localCheckpoint(eager=False)
    h1 = q.filter(F.col("period") == "h1").select("o_custkey", F.col("seg").alias("__s1"))
    h2 = q.filter(F.col("period") == "h2").select("o_custkey", F.col("seg").alias("__s2"))
    return (
        h1.join(h2, "o_custkey", "full")
        .groupBy(
            F.coalesce(F.col("__s1"), F.lit("none")).alias("seg_from"),
            F.coalesce(F.col("__s2"), F.lit("none")).alias("seg_to"),
        )
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("seg_from", "seg_to")
    )


CATALOG["cust_value_quartile_migration"].fn = _dquartmig

register(
    "graph_link_prediction_cn_eval",
    # link-prediction evaluation on the near-dup graph: hold out ~20%
    # of verified edges (deterministic pair hash), score held-out
    # positives AND the band-collision near-misses (candidates whose
    # signature agreement fell below the threshold) by COMMON-NEIGHBOR
    # count in the retained graph — if the graph has community
    # structure, true edges should out-score the near-misses. Mean CN
    # and the share with at least one common neighbor, per side.
    oracle=f"""
    WITH cand AS MATERIALIZED ({_minhash_portable_oracle(thr=0.0)}),
    pos_all AS MATERIALIZED (
      SELECT id_a, id_b,
             {_HASH01_SQL.format(key="CAST(id_a AS VARCHAR) || '_' || CAST(id_b AS VARCHAR) || 'lp'")} AS u
      FROM cand WHERE jaccard_est >= 0.5
    ),
    test AS (SELECT id_a, id_b, 'positive' AS side FROM pos_all WHERE u < 0.2),
    neg AS (
      SELECT id_a, id_b, 'negative' AS side FROM cand WHERE jaccard_est < 0.5
    ),
    ev AS (SELECT * FROM test UNION ALL SELECT * FROM neg),
    adj AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pos_all WHERE u >= 0.2
      UNION ALL
      SELECT id_b, id_a FROM pos_all WHERE u >= 0.2
    ),
    cn AS (
      SELECT e.id_a, e.id_b, e.side, CAST(COUNT(n2.dst) AS BIGINT) AS cn
      FROM ev e
      LEFT JOIN adj n1 ON n1.src = e.id_a
      LEFT JOIN adj n2 ON n2.src = e.id_b AND n2.dst = n1.dst
      GROUP BY e.id_a, e.id_b, e.side
    )
    SELECT side, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(cn) AS DOUBLE) / COUNT(*), 6) AS mean_common_neighbors,
           round(CAST(SUM(CASE WHEN cn >= 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS share_with_cn
    FROM cn GROUP BY side ORDER BY side
    """,
)


def _dlinkpred(spark, sf_dir):
    """Common-neighbor link prediction eval: the retained adjacency
    joins each evaluation pair twice on plain node keys (pair x degree
    bounded — never the full wedge space), zero-CN pairs survive
    through the left joins, and the report is one grouped aggregate.
    The train/test edge split is the same reproducible hash draw every
    sampler in the engine uses."""
    from ..ops.sampling import hash_uniform01

    d = t(spark, sf_dir, "documents")
    cand = dedup.minhash_dup_pairs_portable(
        d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.0
    ).select("id_a", "id_b", "jaccard_est").localCheckpoint(eager=False)
    u = hash_uniform01(
        F.concat(
            F.col("id_a").cast("string"), F.lit("_"), F.col("id_b").cast("string"), F.lit("lp")
        )
    )
    pos_all = cand.filter(F.col("jaccard_est") >= 0.5).select(
        "id_a", "id_b", u.alias("__u")
    ).localCheckpoint(eager=False)
    test = pos_all.filter(F.col("__u") < 0.2).select(
        "id_a", "id_b", F.lit("positive").alias("side")
    )
    neg = cand.filter(F.col("jaccard_est") < 0.5).select(
        "id_a", "id_b", F.lit("negative").alias("side")
    )
    ev = test.unionByName(neg)
    retained = pos_all.filter(F.col("__u") >= 0.2)
    adj = retained.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionByName(
        retained.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).localCheckpoint(eager=False)
    n1 = adj.withColumnsRenamed({"src": "id_a", "dst": "__w"})
    n2 = adj.withColumnsRenamed({"src": "id_b", "dst": "__w"}).withColumn(
        "__hit", F.lit(1)
    )
    cn = (
        ev.join(n1, "id_a", "left")
        .join(n2, ["id_b", "__w"], "left")
        .groupBy("id_a", "id_b", "side")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("cn"))
    )
    return cn.groupBy("side").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.sum("cn").cast("double") / F.count("*"), 6).alias(
            "mean_common_neighbors"
        ),
        F.round(
            F.sum(F.when(F.col("cn") >= 1, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("share_with_cn"),
    ).orderBy("side")


CATALOG["graph_link_prediction_cn_eval"].fn = _dlinkpred

register(
    "sketch_bloom_fpr_report",
    # Bloom-filter accuracy audit (the membership-sketch counterpart of
    # the CMS report): a 4096-bit, 3-hash Bloom built over a 70% key
    # split, probed with the held-out 30% (true negatives by
    # construction — ids are distinct), observed false-positive rate
    # vs the EXACT expected rate for the realized bit array
    # ((bits_set/m)^3 as plain multiplication — no transcendental
    # e^{-kn/m} approximation, nothing that can diverge between
    # engines).
    oracle=f"""
    WITH keys AS (
      SELECT doc_id,
             CASE WHEN {_HASH01_SQL.format(key="CAST(doc_id AS VARCHAR) || 'bl'")} < 0.7
                  THEN 1 ELSE 0 END AS is_train
      FROM documents
    ),
    cells AS (
      SELECT k.doc_id, k.is_train, r.r,
             ('0x' || substr(sha256(CAST(k.doc_id AS VARCHAR) || 'bloom'
                                    || CAST(r.r AS VARCHAR)), 1, 8))::UBIGINT % 4096
                 AS cell
      FROM keys k CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r) r
    ),
    bits AS MATERIALIZED (
      SELECT DISTINCT cell FROM cells WHERE is_train = 1
    ),
    probe AS (
      SELECT c.doc_id,
             CAST(SUM(CASE WHEN b.cell IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits
      FROM cells c LEFT JOIN bits b ON b.cell = c.cell
      WHERE c.is_train = 0
      GROUP BY c.doc_id
    ),
    m AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM keys WHERE is_train = 1) AS n_train,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_probes,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
             (SELECT CAST(SUM(CASE WHEN hits = 3 THEN 1 ELSE 0 END) AS BIGINT)
              FROM probe) AS n_false_positives
    )
    SELECT n_train, n_probes, bits_set,
           round(CAST(bits_set AS DOUBLE) / 4096.0, 6) AS fill_ratio,
           n_false_positives,
           round(CAST(n_false_positives AS DOUBLE) / n_probes, 6) AS observed_fpr,
           round((CAST(bits_set AS DOUBLE) / 4096.0)
                 * (CAST(bits_set AS DOUBLE) / 4096.0)
                 * (CAST(bits_set AS DOUBLE) / 4096.0), 6) AS expected_fpr
    FROM m
    """,
)


def _dbloomfpr(spark, sf_dir):
    """Bloom FPR audit: the bit array is a DISTINCT over the train
    keys' 3 deterministic cells (4096 rows max — the fixed-size
    membership state, mergeable like every sketch here), the probe is
    one left join + per-key hit count, and the expected rate comes
    exactly from the realized fill ratio. At stream scale this is the
    dedup/decontamination prefilter's quality gauge — the CMS tells
    you how wrong counts are, this tells you how often membership
    lies."""
    from ..ops.sampling import hash_uniform01

    d = t(spark, sf_dir, "documents")
    keys = d.select(
        "doc_id",
        (
            hash_uniform01(F.concat(F.col("doc_id").cast("string"), F.lit("bl"))) < 0.7
        ).alias("is_train"),
    )
    cell = (
        F.conv(
            F.substring(
                F.sha2(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("bloom"),
                        F.col("r").cast("string"),
                    ),
                    256,
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 4096
    )
    cells = keys.select(
        "doc_id", "is_train", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("r")
    ).withColumn("cell", cell).localCheckpoint(eager=False)
    bits = (
        cells.filter(F.col("is_train")).select("cell").distinct().localCheckpoint(eager=False)
    )
    probe = (
        cells.filter(~F.col("is_train"))
        .join(bits.withColumn("__hit", F.lit(1)), "cell", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("hits"))
    )
    n_train = keys.filter(F.col("is_train")).agg(
        F.count("*").cast("long").alias("n_train")
    )
    stats = probe.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum(F.when(F.col("hits") == 3, 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
    )
    nbits = bits.agg(F.count("*").cast("long").alias("bits_set"))
    fill = F.col("bits_set").cast("double") / 4096.0
    return (
        n_train.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(nbits))
        .select(
            "n_train",
            "n_probes",
            "bits_set",
            F.round(fill, 6).alias("fill_ratio"),
            "n_false_positives",
            F.round(
                F.col("n_false_positives").cast("double") / F.col("n_probes"), 6
            ).alias("observed_fpr"),
            F.round(fill * fill * fill, 6).alias("expected_fpr"),
        )
    )


CATALOG["sketch_bloom_fpr_report"].fn = _dbloomfpr


