"""Split from queries.py lines 27636-28127 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, dedup, register, t
from .q08_event_windows import _gap_sessions, _sess_cte
from .q14_tpch_deep import _q2
from .q15_curation_r3 import _minhash_portable_oracle

# ===========================================================================
# round-10 wave 10: k-hop BFS reachability, the Pareto cut point,
# Tukey-style pairwise contrasts, balance-quintile lift, session
# duration histogram.
# ===========================================================================


def _khop_oracle(hops: int = 3, n_seeds: int = 5) -> str:
    """Oracle for unrolled k-hop BFS reachability over the near-dup
    graph from the ``n_seeds`` highest-degree nodes: each hop is one
    join + DISTINCT, sizes are exact counts."""
    prev = "f0"
    iters = []
    for k in range(1, hops + 1):
        iters.append(f""",
    f{k} AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT node FROM {prev}
        UNION ALL
        SELECT e.dst FROM edges e JOIN {prev} p ON e.src = p.node
      )
    )""")
        prev = f"f{k}"
    sizes = ",\n           ".join(
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM f{k}) AS n_hop{k}"
        for k in range(0, hops + 1)
    )
    return f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    f0 AS MATERIALIZED (
      SELECT node FROM deg ORDER BY deg DESC, node LIMIT {n_seeds}
    )
    {"".join(iters)}
    SELECT {sizes},
           (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes
    """


register("graph_khop_reachability", oracle=_khop_oracle())


def _dkhop(spark, sf_dir):
    """k-hop BFS from the 5 highest-degree near-dup nodes: three
    unrolled frontier expansions (join + distinct, each frontier
    localCheckpointed so plan depth stays constant) — 'how much of the
    dup graph is within k links of the hubs', the blast-radius
    question a curation reviewer asks before bulk-dropping clusters."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dup_pairs_portable(
        d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.5
    ).select("id_a", "id_b")
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    frontier = (
        deg.orderBy(F.desc("deg"), "node").limit(5).select("node")
        .localCheckpoint(eager=True)
    )
    sizes = [frontier.count()]
    for _ in range(3):
        frontier = (
            frontier.unionByName(
                edges.join(
                    frontier.withColumnsRenamed({"node": "src"}), "src"
                ).select(F.col("dst").alias("node"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        sizes.append(frontier.count())
    n_nodes = deg.count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [tuple(sizes) + (n_nodes,)],
        "n_hop0 long, n_hop1 long, n_hop2 long, n_hop3 long, n_nodes long",
    )


CATALOG["graph_khop_reachability"].fn = _dkhop

register(
    "orders_pareto_cut_point",
    # the 80/20 question answered exactly: the SMALLEST number of
    # top-revenue customers whose cumulative revenue reaches 80% of
    # the total, plus the share of the customer base they represent.
    # The cut decision compares exact integer cents (10*cum >= 8*tot);
    # ties in revenue break by custkey so the rank is deterministic.
    oracle="""
    WITH cr AS (
      SELECT o_custkey AS ck,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                 AS cents
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tc,
                   CAST(COUNT(*) AS BIGINT) AS n FROM cr),
    cw AS (
      SELECT ROW_NUMBER() OVER (ORDER BY cents DESC, ck) AS rk,
             SUM(cents) OVER (ORDER BY cents DESC, ck) AS cum
      FROM cr
    )
    SELECT tot.n AS n_customers,
           CAST(MIN(CASE WHEN 10 * cw.cum >= 8 * tot.tc THEN cw.rk END)
                AS BIGINT) AS k_for_80pct,
           round(CAST(MIN(CASE WHEN 10 * cw.cum >= 8 * tot.tc THEN cw.rk END)
                      AS DOUBLE) / tot.n, 6) AS customer_share
    FROM cw CROSS JOIN tot
    GROUP BY tot.n
    """,
)


def _dparetocut(spark, sf_dir):
    """Pareto cut point: one per-customer aggregate, one ranked running
    sum over that aggregate, one argmin — the number behind every
    '80% of revenue comes from K customers' slide, exact."""
    o = t(spark, sf_dir, "orders")
    cr = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents")
    ).localCheckpoint(eager=False)
    tot = cr.agg(
        F.sum("cents").cast("long").alias("tc"),
        F.count("*").cast("long").alias("n"),
    )
    w = Window.orderBy(F.desc("cents"), "ck")
    cw = cr.select(
        F.row_number().over(w).alias("rk"),
        F.sum("cents").over(w).alias("cum"),
    )
    k = F.min(
        F.when(10 * F.col("cum") >= 8 * F.col("tc"), F.col("rk"))
    ).cast("long")
    return (
        cw.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            k.alias("k_for_80pct"),
            F.round(k.cast("double") / F.col("n"), 6).alias("customer_share"),
        )
        .select(
            F.col("n").alias("n_customers"), "k_for_80pct", "customer_share"
        )
    )


CATALOG["orders_pareto_cut_point"].fn = _dparetocut

register(
    "ml_tukey_pairwise_quantity",
    # the post-hoc step after a significant ANOVA: all pairwise
    # standardized mean differences between the three return flags,
    # q_ij = |mean_i - mean_j| / sqrt(MSW/2 * (1/n_i + 1/n_j)) — the
    # studentized-range statistic (compare to q-table critical values
    # downstream). Means and the within-group mean square come from
    # exact integer moment sums; each contrast is one shared-order
    # expression over the pivoted 1-row frame.
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q FROM lineitem
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nn,
             CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
             CAST(SUM(CASE WHEN flag = 'A' THEN q ELSE 0 END) AS BIGINT) AS sa,
             CAST(SUM(CASE WHEN flag = 'N' THEN q ELSE 0 END) AS BIGINT) AS sn,
             CAST(SUM(CASE WHEN flag = 'R' THEN q ELSE 0 END) AS BIGINT) AS sr,
             CAST(SUM(CASE WHEN flag = 'A' THEN CAST(q AS HUGEINT) * q
                           ELSE 0 END) AS DOUBLE) AS qa,
             CAST(SUM(CASE WHEN flag = 'N' THEN CAST(q AS HUGEINT) * q
                           ELSE 0 END) AS DOUBLE) AS qn,
             CAST(SUM(CASE WHEN flag = 'R' THEN CAST(q AS HUGEINT) * q
                           ELSE 0 END) AS DOUBLE) AS qr
      FROM x
    ),
    m AS (
      SELECT n, na, nn, nr,
             CAST(sa AS DOUBLE) / na AS ma,
             CAST(sn AS DOUBLE) / nn AS mn,
             CAST(sr AS DOUBLE) / nr AS mr,
             (qa - CAST(CAST(sa AS HUGEINT) * sa AS DOUBLE) / na
              + qn - CAST(CAST(sn AS HUGEINT) * sn AS DOUBLE) / nn
              + qr - CAST(CAST(sr AS HUGEINT) * sr AS DOUBLE) / nr)
             / (n - 3.0) AS msw
      FROM g
    )
    SELECT pair, n_i, n_j, round(mean_diff, 6) AS mean_diff,
           round(mean_diff / sqrt(msw / 2.0 * (1.0 / n_i + 1.0 / n_j)), 6)
               AS tukey_q
    FROM (
      SELECT 'A_vs_N' AS pair, na AS n_i, nn AS n_j, abs(ma - mn) AS mean_diff,
             msw FROM m
      UNION ALL
      SELECT 'A_vs_R', na, nr, abs(ma - mr), msw FROM m
      UNION ALL
      SELECT 'N_vs_R', nn, nr, abs(mn - mr), msw FROM m
    )
    ORDER BY pair
    """,
)


def _dtukey(spark, sf_dir):
    """Tukey pairwise contrasts: ONE conditional-moment aggregate
    pivots all three groups into a single row, the three contrasts are
    projections over that row — post-hoc comparisons for the cost of
    the ANOVA's own pass."""
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    )

    def _cnt(fl):
        return F.sum(F.when(F.col("flag") == fl, 1).otherwise(0)).cast("long")

    def _s(fl):
        return F.sum(F.when(F.col("flag") == fl, F.col("q")).otherwise(0)).cast(
            "long"
        )

    def _q2(fl):
        return F.sum(
            F.when(
                F.col("flag") == fl, F.col("q").cast("decimal(18,0)") * F.col("q")
            ).otherwise(F.lit(0).cast("decimal(18,0)"))
        ).cast("double")

    g = x.agg(
        F.count("*").cast("long").alias("n"),
        _cnt("A").alias("na"),
        _cnt("N").alias("nn"),
        _cnt("R").alias("nr"),
        _s("A").alias("sa"),
        _s("N").alias("sn"),
        _s("R").alias("sr"),
        _q2("A").alias("qa"),
        _q2("N").alias("qn"),
        _q2("R").alias("qr"),
    ).localCheckpoint(eager=False)

    def _t(s, nn_):
        return (F.col(s).cast("decimal(19,0)") * F.col(s)).cast("double") / F.col(nn_)

    m = g.select(
        "n",
        "na",
        "nn",
        "nr",
        (F.col("sa").cast("double") / F.col("na")).alias("ma"),
        (F.col("sn").cast("double") / F.col("nn")).alias("mn"),
        (F.col("sr").cast("double") / F.col("nr")).alias("mr"),
        (
            (
                F.col("qa")
                - _t("sa", "na")
                + F.col("qn")
                - _t("sn", "nn")
                + F.col("qr")
                - _t("sr", "nr")
            )
            / (F.col("n") - 3.0)
        ).alias("msw"),
    )
    rows = []
    for pair, ni, nj, mi, mj in (
        ("A_vs_N", "na", "nn", "ma", "mn"),
        ("A_vs_R", "na", "nr", "ma", "mr"),
        ("N_vs_R", "nn", "nr", "mn", "mr"),
    ):
        diff = F.abs(F.col(mi) - F.col(mj))
        rows.append(
            m.select(
                F.lit(pair).alias("pair"),
                F.col(ni).alias("n_i"),
                F.col(nj).alias("n_j"),
                F.round(diff, 6).alias("mean_diff"),
                F.round(
                    diff
                    / F.sqrt(
                        F.col("msw") / 2.0 * (1.0 / F.col(ni) + 1.0 / F.col(nj))
                    ),
                    6,
                ).alias("tukey_q"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("pair")


CATALOG["ml_tukey_pairwise_quantity"].fn = _dtukey

register(
    "cust_balance_quintile_revenue",
    # does account balance predict spend? Customers banded into exact
    # balance QUINTILES (edges QUINTUPLED — 5*(a + f*(b-a)) is an exact
    # integer for f in {.2,.4,.6,.8}, the same trick that fixed the
    # quartile CAST divergence) and each quintile's order revenue and
    # lift over the global mean reported — every boundary an integer
    # compare.
    oracle="""
    WITH cb AS MATERIALIZED (
      SELECT c_custkey AS ck,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
      FROM customer
    ),
    edges AS (
      SELECT CAST(floor(5 * quantile_cont(bal, 0.2) + 0.5) AS BIGINT) AS e1,
             CAST(floor(5 * quantile_cont(bal, 0.4) + 0.5) AS BIGINT) AS e2,
             CAST(floor(5 * quantile_cont(bal, 0.6) + 0.5) AS BIGINT) AS e3,
             CAST(floor(5 * quantile_cont(bal, 0.8) + 0.5) AS BIGINT) AS e4
      FROM cb
    ),
    q AS (
      SELECT ck, CASE WHEN 5 * bal <= e1 THEN 1
                      WHEN 5 * bal <= e2 THEN 2
                      WHEN 5 * bal <= e3 THEN 3
                      WHEN 5 * bal <= e4 THEN 4
                      ELSE 5 END AS quintile
      FROM cb CROSS JOIN edges
    ),
    r AS (
      SELECT q.quintile,
             CAST(COUNT(DISTINCT q.ck) AS BIGINT) AS n_customers,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
             CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100), 0)
                  AS BIGINT) AS cents
      FROM q LEFT JOIN orders o ON o.o_custkey = q.ck
      GROUP BY q.quintile
    ),
    tot AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS tc, CAST(SUM(n_customers) AS BIGINT)
                 AS nc
      FROM r
    )
    SELECT r.quintile, r.n_customers, r.n_orders,
           round(r.cents / 100.0, 2) AS revenue,
           round((CAST(r.cents AS DOUBLE) / r.n_customers)
                 / (CAST(tot.tc AS DOUBLE) / tot.nc), 6) AS revenue_lift
    FROM r CROSS JOIN tot
    ORDER BY r.quintile
    """,
)


def _dbalquintile(spark, sf_dir):
    """Balance-quintile revenue lift: one exact-quintile pass over the
    customer dim (quintupled edges — integer boundaries), one left
    join to orders, a 5-row rollup — the 'does this attribute segment
    spend' screen for any numeric dimension column."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cb = c.select(
        F.col("c_custkey").alias("ck"),
        (F.col("c_acctbal").cast(DEC) * 100).cast("long").alias("bal"),
    ).localCheckpoint(eager=False)
    edges = cb.agg(
        *[
            F.floor(5 * F.percentile("bal", f) + 0.5).cast("long").alias(e)
            for e, f in (("e1", 0.2), ("e2", 0.4), ("e3", 0.6), ("e4", 0.8))
        ]
    )
    quintile = (
        F.when(5 * F.col("bal") <= F.col("e1"), 1)
        .when(5 * F.col("bal") <= F.col("e2"), 2)
        .when(5 * F.col("bal") <= F.col("e3"), 3)
        .when(5 * F.col("bal") <= F.col("e4"), 4)
        .otherwise(5)
    )
    q = cb.crossJoin(F.broadcast(edges)).select("ck", quintile.alias("quintile"))
    r = (
        q.join(
            o.select(
                F.col("o_custkey").alias("ck"),
                "o_orderkey",
                (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("__c"),
            ),
            "ck",
            "left",
        )
        .groupBy("quintile")
        .agg(
            F.countDistinct("ck").cast("long").alias("n_customers"),
            F.count("o_orderkey").cast("long").alias("n_orders"),
            F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("cents"),
        )
        .localCheckpoint(eager=False)
    )
    tot = r.agg(
        F.sum("cents").cast("long").alias("tc"),
        F.sum("n_customers").cast("long").alias("nc"),
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .select(
            "quintile",
            "n_customers",
            "n_orders",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(
                (F.col("cents").cast("double") / F.col("n_customers"))
                / (F.col("tc").cast("double") / F.col("nc")),
                6,
            ).alias("revenue_lift"),
        )
        .orderBy("quintile")
    )


CATALOG["cust_balance_quintile_revenue"].fn = _dbalquintile

register(
    "evt_session_duration_histogram",
    # what do sessions actually look like? The duration distribution of
    # gap-sessionized user sessions in fixed buckets (bounce, <=1 min,
    # <=5 min, <=15 min, longer) with counts and share — integer
    # floored-second durations off the shared sessionization recipe.
    oracle=f"""
    WITH {_sess_cte()},
    s AS (
      SELECT CAST(FLOOR(epoch(MAX(ts))) - FLOOR(epoch(MIN(ts))) AS BIGINT)
                 AS dur
      FROM sess GROUP BY user_id, session_id
    ),
    b AS (
      SELECT CASE WHEN dur = 0 THEN 'a_bounce'
                  WHEN dur <= 60 THEN 'b_le_1min'
                  WHEN dur <= 300 THEN 'c_le_5min'
                  WHEN dur <= 900 THEN 'd_le_15min'
                  ELSE 'e_longer' END AS bucket
      FROM s
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           round(CAST(COUNT(*) AS DOUBLE) / tot.n, 6) AS share
    FROM b CROSS JOIN tot
    GROUP BY bucket, tot.n
    ORDER BY bucket
    """,
)


def _dsessdur(spark, sf_dir):
    """Session-duration histogram: the shared gap-sessionization (one
    user-partitioned window), one per-session aggregate, a 5-bucket
    rollup — the engagement-shape report at sessionization cost."""
    e = t(spark, sf_dir, "events")
    sess = _gap_sessions(e)
    s = sess.groupBy("user_id", "session_id").agg(
        (
            F.max("ts").cast("timestamp").cast("long")
            - F.min("ts").cast("timestamp").cast("long")
        ).alias("dur")
    )
    bucket = (
        F.when(F.col("dur") == 0, "a_bounce")
        .when(F.col("dur") <= 60, "b_le_1min")
        .when(F.col("dur") <= 300, "c_le_5min")
        .when(F.col("dur") <= 900, "d_le_15min")
        .otherwise("e_longer")
    )
    b = s.select(bucket.alias("bucket")).localCheckpoint(eager=False)
    tot = b.agg(F.count("*").cast("long").alias("n"))
    return (
        b.crossJoin(F.broadcast(tot))
        .groupBy("bucket", "n")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.round(F.count("*").cast("double") / F.col("n"), 6).alias("share"),
        )
        .drop("n")
        .orderBy("bucket")
    )


CATALOG["evt_session_duration_histogram"].fn = _dsessdur


