"""Split from queries.py lines 15122-17855 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, similarity, t, tok_arr
from .q08_event_windows import _gap_sessions, _sess_cte
from .q09_llm_dedup_text_sim import (
    _DOT_SQL,
    _EMB_BAND_SQL,
    _EN_NORM_SQL,
    _HASH01_SQL,
    _NORM_SQL_E,
    _NORM_SQL_Q,
    _cos6_sql,
)
from .q15_curation_r3 import _minhash_portable_oracle
from .q19_r7_graph import (
    _DUP_EDGE_CTE,
    _dup_degrees,
    _dup_pairs_edges,
    _label_prop_cte,
    _min_label_frames,
)

# ===========================================================================
# round-7 third wave: statistical inference in exact relational algebra
# ===========================================================================
# Chi-square independence, one-way ANOVA, a two-proportion A/B z-test,
# and a Pearson correlation matrix — the hypothesis-testing tier every
# analytics engine ships (ref data_enhancement.py's grouped stats are
# the descriptive half; these are the inferential half). Every statistic
# reduces to ratios of exact integer/decimal moments, so the oracles are
# bit-exact: counts stay BIGINT, money goes through cents, float sums
# over group terms use the floor(x+0.5) integer-unit trick, and the one
# libm call (ln) follows the 6-dp micro-nat convention.

register(
    "ml_chi_square_mktseg_priority",
    # chi-square test of independence between customer market segment
    # and order priority: observed cell counts, expected = row*col/N,
    # per-cell chi2 term. Marginals come from partitioned window sums
    # over the 25-cell aggregate; N is a 1-row broadcast scalar.
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    obs AS (
      SELECT segment, priority, CAST(COUNT(*) AS BIGINT) AS observed
      FROM j GROUP BY segment, priority
    ),
    cells AS (
      SELECT segment, priority, observed,
             CAST(SUM(observed) OVER (PARTITION BY segment) AS BIGINT) AS row_t,
             CAST(SUM(observed) OVER (PARTITION BY priority) AS BIGINT) AS col_t
      FROM obs
    ),
    tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM obs)
    SELECT segment, priority, observed,
           round(CAST(row_t AS DOUBLE) * col_t / n, 6) AS expected,
           round((observed - CAST(row_t AS DOUBLE) * col_t / n)
                 * (observed - CAST(row_t AS DOUBLE) * col_t / n)
                 / (CAST(row_t AS DOUBLE) * col_t / n), 6) AS chi2_term
    FROM cells, tot
    """,
)


def _dchisq(spark, sf_dir):
    """Chi-square independence (segment x priority): one fact-side
    aggregate to the 25-cell contingency table, marginals via window
    sums partitioned by each axis (the cell frame is |segments| x
    |priorities| — bounded), N as a 1-row broadcast. At 100 TB only
    the first groupBy touches the fact table; everything after runs on
    the tiny cell frame."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").cast("long").alias("observed"))
        .localCheckpoint(eager=False)  # feeds N + both marginal windows
    )
    tot = obs.agg(F.sum("observed").cast("long").alias("__n"))
    cells = obs.select(
        "segment",
        "priority",
        "observed",
        F.sum("observed").over(Window.partitionBy("segment")).cast("long").alias("row_t"),
        F.sum("observed").over(Window.partitionBy("priority")).cast("long").alias("col_t"),
    )
    e = F.col("row_t").cast("double") * F.col("col_t") / F.col("__n")
    return cells.crossJoin(F.broadcast(tot)).select(
        "segment",
        "priority",
        "observed",
        F.round(e, 6).alias("expected"),
        F.round((F.col("observed") - e) * (F.col("observed") - e) / e, 6).alias(
            "chi2_term"
        ),
    )


CATALOG["ml_chi_square_mktseg_priority"].fn = _dchisq

register(
    "ml_anova_price_by_segment",
    # one-way ANOVA of order value across market segments: within/
    # between sums of squares from exact cents moments (sumsq through
    # HUGEINT/DECIMAL(38)), per-group float terms rounded to integer
    # dollars-squared before the cross-group sum (order-independent),
    # F = (SSB/(k-1))/(SSW/(n-k)).
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(cents) AS BIGINT) AS s_g,
             CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS ss_g
      FROM j GROUP BY segment
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM g
    ),
    terms AS (
      SELECT CAST(FLOOR((ss_g - CAST(s_g AS DOUBLE) * s_g / n_g) / 10000.0 + 0.5)
                  AS BIGINT) AS ssw_u,
             CAST(FLOOR(n_g
                        * ((CAST(s_g AS DOUBLE) / n_g - CAST(tot.s AS DOUBLE) / tot.n) / 100.0)
                        * ((CAST(s_g AS DOUBLE) / n_g - CAST(tot.s AS DOUBLE) / tot.n) / 100.0)
                        + 0.5) AS BIGINT) AS ssb_u,
             tot.n AS n, tot.k AS k
      FROM g, tot
    )
    SELECT CAST(SUM(ssb_u) AS DOUBLE) AS ss_between,
           CAST(SUM(ssw_u) AS DOUBLE) AS ss_within,
           CAST(MAX(k) - 1 AS BIGINT) AS df_between,
           CAST(MAX(n) - MAX(k) AS BIGINT) AS df_within,
           round((CAST(SUM(ssb_u) AS DOUBLE) / (MAX(k) - 1))
                 / (CAST(SUM(ssw_u) AS DOUBLE) / (MAX(n) - MAX(k))), 6) AS f_stat
    FROM terms
    """,
)


def _danova(spark, sf_dir):
    """One-way ANOVA (order value by segment): the fact table reduces
    to one exact moment row per segment (n, sum, sumsq in cents); the
    grand totals are a second 5-row aggregate broadcast back; the
    per-group SS terms round to integer dollars-squared so the final
    cross-group sums are order-independent BIGINT adds. The only
    full-data pass is the first groupBy."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = (F.col("o_totalprice").cast(DEC) * 100).cast("long")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), cents.alias("cents")
    )
    g = j.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("cents").cast("long").alias("s_g"),
        F.sum(F.col("cents").cast("decimal(18,0)") * F.col("cents").cast("decimal(18,0)"))
        .cast("double")
        .alias("ss_g"),
    ).localCheckpoint(eager=False)  # feeds the grand totals AND the terms
    tot = g.agg(
        F.sum("n_g").cast("long").alias("__N"),
        F.sum("s_g").cast("long").alias("__S"),
        F.count("*").cast("long").alias("__K"),
    )
    dm = (
        F.col("s_g").cast("double") / F.col("n_g")
        - F.col("__S").cast("double") / F.col("__N")
    ) / F.lit(100.0)
    terms = g.crossJoin(F.broadcast(tot)).select(
        F.floor(
            (F.col("ss_g") - F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g"))
            / F.lit(10000.0)
            + 0.5
        ).alias("ssw_u"),
        F.floor(F.col("n_g") * dm * dm + 0.5).alias("ssb_u"),
        F.col("__N").alias("n"),
        F.col("__K").alias("k"),
    )
    return terms.agg(
        F.sum("ssb_u").cast("double").alias("ss_between"),
        F.sum("ssw_u").cast("double").alias("ss_within"),
        (F.max("k") - 1).cast("long").alias("df_between"),
        (F.max("n") - F.max("k")).cast("long").alias("df_within"),
        F.round(
            (F.sum("ssb_u").cast("double") / (F.max("k") - 1))
            / (F.sum("ssw_u").cast("double") / (F.max("n") - F.max("k"))),
            6,
        ).alias("f_stat"),
    )


CATALOG["ml_anova_price_by_segment"].fn = _danova

register(
    "ml_ab_conversion_ztest",
    # two-proportion z-test: users split into arms by user_id parity,
    # conversion = a purchase within 24h of the user's first activity
    # (plain "ever purchased" saturates to 1.0 on active users and the
    # pooled variance degenerates), pooled-variance z-score with a
    # NULLIF guard. The test every experimentation platform runs; one
    # per-user aggregate then a 2-row pivot — no scalar broadcast.
    oracle="""
    WITH f AS (
      SELECT user_id, ts, event_type,
             MIN(ts) OVER (PARTITION BY user_id) AS first_ts
      FROM events
    ),
    u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase'
                       AND ts <= first_ts + INTERVAL 24 HOUR
                      THEN 1 ELSE 0 END) AS conv
      FROM f GROUP BY user_id
    ),
    a AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(conv) AS BIGINT) AS n_conv
      FROM u GROUP BY arm
    ),
    p AS (
      SELECT CAST(MAX(CASE WHEN arm = 0 THEN n_users END) AS BIGINT) AS n_a,
             CAST(MAX(CASE WHEN arm = 0 THEN n_conv END) AS BIGINT) AS conv_a,
             CAST(MAX(CASE WHEN arm = 1 THEN n_users END) AS BIGINT) AS n_b,
             CAST(MAX(CASE WHEN arm = 1 THEN n_conv END) AS BIGINT) AS conv_b
      FROM a
    )
    SELECT n_a, conv_a, n_b, conv_b,
           round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           round((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
                 / sqrt(NULLIF((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                               * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                               * (1.0 / n_a + 1.0 / n_b), 0.0)), 6) AS z_score
    FROM p
    """,
)


def _dabz(spark, sf_dir):
    """Two-proportion z-test over a deterministic user split: one
    per-user shuffle (the same user_id key every per-user shape uses),
    a 2-row arm aggregate, a conditional-max pivot to one row, and
    identical IEEE arithmetic on both engines (sqrt is correctly
    rounded, so only the 6-dp display rounding is needed)."""
    ev = t(spark, sf_dir, "events")
    first_ts = F.min("ts").over(Window.partitionBy("user_id"))
    f = ev.select("user_id", "ts", "event_type", first_ts.alias("first_ts"))
    u = f.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") <= F.col("first_ts") + F.expr("INTERVAL 24 HOURS")),
                1,
            ).otherwise(0)
        ).alias("conv")
    )
    a = u.groupBy((F.col("user_id") % 2).cast("long").alias("arm")).agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_conv"),
    )
    p = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).cast("long").alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("n_conv"))).cast("long").alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).cast("long").alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("n_conv"))).cast("long").alias("conv_b"),
    )
    prate = (
        (F.col("conv_a") + F.col("conv_b")).cast("double")
        / (F.col("n_a") + F.col("n_b"))
    )
    return p.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(F.col("conv_a").cast("double") / F.col("n_a"), 6).alias("rate_a"),
        F.round(F.col("conv_b").cast("double") / F.col("n_b"), 6).alias("rate_b"),
        F.round(
            (
                F.col("conv_b").cast("double") / F.col("n_b")
                - F.col("conv_a").cast("double") / F.col("n_a")
            )
            / F.sqrt(
                F.nullif(
                    prate
                    * (F.lit(1.0) - prate)
                    * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b")),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("z_score"),
    )


CATALOG["ml_ab_conversion_ztest"].fn = _dabz


def _corr_pair_sql(a: str, b: str) -> str:
    """round(r_ab, 6) from the moment row m — identical expression text
    on both engines (see _dcorrmatrix)."""
    return (
        f"round((CAST(n AS DOUBLE) * s_{a}{b} - CAST(s_{a} AS DOUBLE) * s_{b})"
        f" / sqrt((CAST(n AS DOUBLE) * s_{a}{a} - CAST(s_{a} AS DOUBLE) * s_{a})"
        f" * (CAST(n AS DOUBLE) * s_{b}{b} - CAST(s_{b} AS DOUBLE) * s_{b})), 6)"
    )


_CORR_COLS = [("q", "quantity"), ("p", "price"), ("d", "discount"), ("t", "tax")]

register(
    "ml_corr_matrix_lineitem",
    # pairwise Pearson correlation among quantity / extendedprice /
    # discount / tax: ONE pass over the fact table collects all 14
    # exact integer moments (sums and cross-products in hundredth
    # units through HUGEINT); the 6 pair correlations unfold from that
    # single row. The feature-screening matrix before any modeling.
    oracle=f"""
    WITH c AS (
      SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS u_q,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS u_p,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS u_d,
             CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS u_t
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             {", ".join(f"CAST(SUM(u_{k}) AS DOUBLE) AS s_{k}" for k, _ in _CORR_COLS)},
             {", ".join(f"CAST(SUM(CAST(u_{a} AS HUGEINT) * u_{b}) AS DOUBLE) AS s_{a}{b}"
                        for i, (a, _) in enumerate(_CORR_COLS)
                        for b, _n in _CORR_COLS[i:])}
      FROM c
    )
    {" UNION ALL ".join(
        f"SELECT '{an}' AS col_a, '{bn}' AS col_b, {_corr_pair_sql(a, b)} AS corr FROM m"
        for i, (a, an) in enumerate(_CORR_COLS)
        for b, bn in _CORR_COLS[i + 1:]
    )}
    """,
)


def _dcorrmatrix(spark, sf_dir):
    """Pearson correlation matrix in one aggregate: all first and
    second moments of the four measures (exact hundredth-unit integers
    summed through DECIMAL(38)) collected in a single map-side-combine
    pass, the six pairwise correlations computed on the 1-row moment
    frame and unfolded with explode — no second scan, no join, no
    window. The classic two-pass corr() is one pass here."""
    li = t(spark, sf_dir, "lineitem")
    src = {"q": "l_quantity", "p": "l_extendedprice", "d": "l_discount", "t": "l_tax"}
    c = li.select(
        *[
            (F.col(col).cast(DEC) * 100).cast("long").alias(f"u_{k}")
            for k, col in src.items()
        ]
    )
    keys = [k for k, _ in _CORR_COLS]
    aggs = [F.count("*").cast("long").alias("n")]
    aggs += [
        F.sum(F.col(f"u_{k}").cast("decimal(38,0)")).cast("double").alias(f"s_{k}")
        for k in keys
    ]
    aggs += [
        F.sum(
            F.col(f"u_{a}").cast("decimal(18,0)") * F.col(f"u_{b}").cast("decimal(18,0)")
        )
        .cast("double")
        .alias(f"s_{a}{b}")
        for i, a in enumerate(keys)
        for b in keys[i:]
    ]
    m = c.agg(*aggs)

    def corr(a: str, b: str):
        num = F.col("n").cast("double") * F.col(f"s_{a}{b}") - F.col(
            f"s_{a}"
        ).cast("double") * F.col(f"s_{b}")
        den = F.sqrt(
            (
                F.col("n").cast("double") * F.col(f"s_{a}{a}")
                - F.col(f"s_{a}").cast("double") * F.col(f"s_{a}")
            )
            * (
                F.col("n").cast("double") * F.col(f"s_{b}{b}")
                - F.col(f"s_{b}").cast("double") * F.col(f"s_{b}")
            )
        )
        return F.round(num / den, 6)

    rows = F.array(
        *[
            F.struct(
                F.lit(an).alias("col_a"),
                F.lit(bn).alias("col_b"),
                corr(a, b).alias("corr"),
            )
            for i, (a, an) in enumerate(_CORR_COLS)
            for b, bn in _CORR_COLS[i + 1 :]
        ]
    )
    return m.select(F.explode(rows).alias("r")).select("r.*")


CATALOG["ml_corr_matrix_lineitem"].fn = _dcorrmatrix

register(
    "cust_revenue_gini",
    # Gini coefficient of customer revenue concentration via the exact
    # rank formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over cents —
    # pure integers until the final division. The inequality headline
    # behind every "whale customers" narrative.
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rn FROM rev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS DOUBLE) / 100 AS total_revenue,
           round(2.0 * CAST(SUM(CAST(rn AS HUGEINT) * cents) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM r
    """,
)


def _dgini(spark, sf_dir):
    """Revenue Gini: the fact table reduces to one cents row per
    customer; the rank is one ordered window over that per-customer
    aggregate (customer-cardinality frame — the agg-bounded global
    window the pareto/ntile family already uses); the coefficient
    folds into a single final aggregate, exact until one division."""
    o = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast(DEC) * 100).cast("long")
    rev = o.groupBy("o_custkey").agg(F.sum(cents).cast("long").alias("cents"))
    r = rev.select(
        "cents", F.row_number().over(Window.orderBy("cents", "o_custkey")).alias("rn")
    )
    return r.agg(
        F.count("*").cast("long").alias("n_customers"),
        (F.sum("cents").cast("double") / 100).alias("total_revenue"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("rn").cast("decimal(38,0)") * F.col("cents")).cast("double")
            / (F.count("*").cast("double") * F.sum("cents").cast("double"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
    )


CATALOG["cust_revenue_gini"].fn = _dgini

register(
    "evt_theil_sen_daily_trend",
    # Theil-Sen robust trend of daily event volume, banded: slopes are
    # taken only between days at most 14 apart, generated by an
    # explode-the-gap equi-join (never a quadratic inequality join —
    # the full pairwise estimator is O(days^2); the banded variant is
    # the scale-safe standard). Median of exact count ratios.
    oracle="""
    WITH days AS (
      SELECT CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT) AS dn,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY dn
    ),
    pairs AS (
      SELECT l.dn, k.k, l.y AS y1, r.y AS y2
      FROM days l
      CROSS JOIN (SELECT unnest(generate_series(1, 14)) AS k) k
      JOIN days r ON r.dn = l.dn + k.k
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(MEDIAN((y2 - y1) / CAST(k AS DOUBLE)), 6) AS theil_sen_slope
    FROM pairs
    """,
)


def _dtheilsen(spark, sf_dir):
    """Banded Theil-Sen: daily counts (one fact aggregate), each day
    exploded into 14 gap offsets, pairs formed by an equi-join on the
    shifted day number — candidate generation is linear in days, the
    join key is an integer, and the slope median is exact because the
    slopes are ratios of exact integers. The 14-row explode mirrors
    the DAU/WAU bounded fan-out convention."""
    ev = t(spark, sf_dir, "events")
    days = (
        ev.groupBy(F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).alias("dn"))
        .agg(F.count("*").cast("long").alias("y"))
        .localCheckpoint(eager=False)  # both sides of the gap join
    )
    left = days.select(
        F.col("dn"),
        F.col("y").alias("y1"),
        F.explode(F.sequence(F.lit(1), F.lit(14))).alias("k"),
    ).withColumn("dn2", F.col("dn") + F.col("k"))
    right = days.select(F.col("dn").alias("dn2"), F.col("y").alias("y2"))
    pairs = left.join(right, "dn2")
    return pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(
            F.median((F.col("y2") - F.col("y1")) / F.col("k").cast("double")), 6
        ).alias("theil_sen_slope"),
    )


CATALOG["evt_theil_sen_daily_trend"].fn = _dtheilsen

register(
    "basket_brand_pair_lift",
    # market-basket affinity between part brands co-occurring in one
    # order: support, confidence-free lift = P(ab)/(P(a)P(b)) from
    # exact counts, min-support pruned, top-20 by lift. Candidate
    # pairs come from the orderkey equi-join of the per-order distinct
    # brand set against itself (a < b) — baskets are small, so the
    # pair space is bounded by sum(basket^2), never |orders|^2.
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM ob),
    bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM ob GROUP BY b),
    pc AS (
      SELECT a.b AS brand_a, x.b AS brand_b, CAST(COUNT(*) AS BIGINT) AS pair_orders
      FROM ob a JOIN ob x ON x.ok = a.ok AND a.b < x.b
      GROUP BY a.b, x.b
      HAVING COUNT(*) >= 5
    )
    SELECT pc.brand_a, pc.brand_b, pc.pair_orders,
           round(CAST(pc.pair_orders AS DOUBLE) / nb.n, 6) AS support,
           round(CAST(pc.pair_orders AS DOUBLE) * nb.n
                 / (CAST(ca.c AS DOUBLE) * cb.c), 6) AS lift
    FROM pc
    JOIN bc ca ON ca.b = pc.brand_a
    JOIN bc cb ON cb.b = pc.brand_b
    CROSS JOIN nb
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
)


def _dbasketlift(spark, sf_dir):
    """Brand-pair lift: the per-order distinct brand set self-joins on
    orderkey (shuffle key is the order id; payloads are brand codes),
    min-support HAVING prunes the tail before the marginals join in,
    the order total is a 1-row broadcast, top-20 by lift is a
    TakeOrdered. The a<b predicate halves the pair space and makes
    each pair unique."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # the per-order brand set feeds the total, the marginals, and both
    # self-join sides — lazy checkpoint so the join+distinct runs once
    ob = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nb = ob.agg(F.countDistinct("ok").cast("long").alias("__n"))
    bc = ob.groupBy("b").agg(F.count("*").cast("long").alias("c"))
    a, x = ob.alias("a"), ob.alias("x")
    pc = (
        a.join(x, (F.col("x.ok") == F.col("a.ok")) & (F.col("a.b") < F.col("x.b")))
        .groupBy(F.col("a.b").alias("brand_a"), F.col("x.b").alias("brand_b"))
        .agg(F.count("*").cast("long").alias("pair_orders"))
        .filter(F.col("pair_orders") >= 5)
    )
    ca = bc.withColumnsRenamed({"b": "brand_a", "c": "__ca"})
    cb = bc.withColumnsRenamed({"b": "brand_b", "c": "__cb"})
    return (
        pc.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.round(F.col("pair_orders").cast("double") / F.col("__n"), 6).alias(
                "support"
            ),
            F.round(
                F.col("pair_orders").cast("double")
                * F.col("__n")
                / (F.col("__ca").cast("double") * F.col("__cb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(20)
    )


CATALOG["basket_brand_pair_lift"].fn = _dbasketlift

register(
    "dq_outlier_iqr_fences",
    # Tukey IQR fences per event type: exact-interpolation quartiles,
    # 1.5*IQR fences, outlier counts and share — the robust
    # complement to the z-score (m2) and MAD (evt_anomaly_mad)
    # outlier families.
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           MAX(q.q1) AS q1, MAX(q.q3) AS q3,
           MAX(q.q1 - 1.5 * (q.q3 - q.q1)) AS lo_fence,
           MAX(q.q3 + 1.5 * (q.q3 - q.q1)) AS hi_fence,
           CAST(SUM(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           round(CAST(SUM(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                                 OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS outlier_share
    FROM events e JOIN q ON q.event_type = e.event_type
    GROUP BY e.event_type
    """,
)


def _diqr(spark, sf_dir):
    """IQR fence audit: quartiles per type (one aggregate to a
    |event_types|-row frame), broadcast back onto the stream, one
    conditional-count pass. Identical interpolation on both engines
    (F.percentile == quantile_cont), identical fence arithmetic."""
    ev = t(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("__q1"),
        F.percentile("value", F.lit(0.75)).alias("__q3"),
    )
    lo = F.col("__q1") - 1.5 * (F.col("__q3") - F.col("__q1"))
    hi = F.col("__q3") + 1.5 * (F.col("__q3") - F.col("__q1"))
    out = F.when((F.col("value") < lo) | (F.col("value") > hi), 1).otherwise(0)
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("__q1").alias("q1"),
            F.max("__q3").alias("q3"),
            F.max(lo).alias("lo_fence"),
            F.max(hi).alias("hi_fence"),
            F.sum(out).cast("long").alias("n_outliers"),
            F.count("*").cast("long").alias("n_total"),
            F.round(F.sum(out).cast("double") / F.count("*"), 6).alias(
                "outlier_share"
            ),
        )
    )


CATALOG["dq_outlier_iqr_fences"].fn = _diqr

register(
    "graph_degree_assortativity",
    # degree assortativity of the near-dup graph: Pearson correlation
    # of endpoint degrees over all directed edges — positive means
    # template families clump with each other, negative means hubs
    # attach to leaves. Exact integer moments, one rounded division.
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    e2 AS (
      SELECT da.deg AS x, db.deg AS y
      FROM edges e
      JOIN deg da ON da.node = e.s
      JOIN deg db ON db.node = e.d
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM e2
    )
    SELECT n AS n_directed_edges,
           round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt(NULLIF((CAST(n AS DOUBLE) * sxx - sx * sx)
                               * (CAST(n AS DOUBLE) * syy - sy * sy), 0.0)), 6)
             AS degree_assortativity
    FROM m
    """,
)


def _dassort(spark, sf_dir):
    """Degree assortativity: the degree table joins onto both edge
    endpoints (id-keyed equi-joins, id payloads), then one moment
    aggregate — the same exact-integer Pearson recipe as the corr
    matrix, on graph structure instead of measures."""
    _, edges = _dup_pairs_edges(spark, sf_dir)
    deg = _dup_degrees(edges)  # joined onto both edge endpoints
    da = deg.withColumnsRenamed({"node": "s", "deg": "x"})
    db = deg.withColumnsRenamed({"node": "d", "deg": "y"})
    e2 = edges.join(da, "s").join(db, "d").select("x", "y")
    m = e2.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y").cast("decimal(18,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("x").cast("decimal(18,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(18,0)") * F.col("y").cast("decimal(18,0)"))
        .cast("double")
        .alias("syy"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        F.col("n").alias("n_directed_edges"),
        F.round(
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                F.nullif(
                    (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                    * (nd * F.col("syy") - F.col("sy") * F.col("sy")),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("degree_assortativity"),
    )


CATALOG["graph_degree_assortativity"].fn = _dassort


def _kcore_oracle(rounds: int = 3, k: int = 2) -> str:
    """Unrolled k-core peeling: each round drops nodes with degree < k
    and keeps only edges between survivors — fully deterministic."""
    cte = []
    prev = "e0"
    # every e{r} is consumed 3-4x (both UNION ALL arms of the next
    # degree count, the next survivor join, the final scalar counts) —
    # without MATERIALIZED DuckDB inlines the whole minhash pair
    # pipeline multiplicatively per round (~100x oracle wall time)
    for r in range(1, rounds + 1):
        cte.append(f""",
    d{r} AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM (SELECT id_a AS node FROM {prev} UNION ALL SELECT id_b FROM {prev})
      GROUP BY node
    ),
    k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.id_a, e.id_b FROM {prev} e
      JOIN k{r} a ON a.node = e.id_a
      JOIN k{r} b ON b.node = e.id_b
    )""")
        prev = f"e{r}"
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS peel_round,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM k{r}) AS nodes_ge_k,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS edges_kept"
        for r in range(1, rounds + 1)
    )
    return f"""
    WITH pairs AS MATERIALIZED ({_minhash_portable_oracle()}),
    e0 AS (SELECT id_a, id_b FROM pairs){"".join(cte)}
    {rows}
    """


register("graph_kcore_peel_rounds", oracle=_kcore_oracle())


def _dkcore(spark, sf_dir):
    """k-core decomposition (k=2, 3 peel rounds) of the near-dup
    graph: each round is one degree aggregate + two semi-join-shaped
    equi-joins onto the survivor set; the surviving edge frame is
    localCheckpoint'ed per round (the iterative-frame convention) so
    executed plan depth stays constant in the round count. The core
    sizes separate deeply-templated duplicate mass from incidental
    pairs."""
    pairs, _ = _dup_pairs_edges(spark, sf_dir)
    e = pairs
    out = []
    for r in range(1, 4):
        both = e.select(F.col("id_a").alias("node")).unionByName(
            e.select(F.col("id_b").alias("node"))
        )
        keep = (
            both.groupBy("node")
            .agg(F.count("*").cast("long").alias("__deg"))
            .filter(F.col("__deg") >= 2)
            .select("node")
            .localCheckpoint(eager=False)
        )
        e = (
            e.join(keep.withColumnRenamed("node", "id_a"), "id_a")
            .join(keep.withColumnRenamed("node", "id_b"), "id_b")
            .select("id_a", "id_b")
            .localCheckpoint(eager=False)
        )
        stats = (
            keep.agg(F.count("*").cast("long").alias("nodes_ge_k"))
            .crossJoin(
                F.broadcast(e.agg(F.count("*").cast("long").alias("edges_kept")))
            )
            .select(
                F.lit(r).cast("long").alias("peel_round"),
                "nodes_ge_k",
                "edges_kept",
            )
        )
        out.append(stats)
    res = out[0]
    for s in out[1:]:
        res = res.unionByName(s)
    return res


CATALOG["graph_kcore_peel_rounds"].fn = _dkcore

register(
    "evt_session_path_trigrams",
    # sequence-pattern mining: the 20 most common 3-step event-type
    # paths inside gap sessions (the same 30-min sessionization the
    # batch/streaming session queries use). LEAD twice within the
    # session window; NULL tails drop out via concat's NULL
    # propagation on both engines.
    oracle=f"""
    WITH {_sess_cte(", event_type")},
    tri AS (
      SELECT event_type || '>' || LEAD(event_type, 1) OVER w2
                        || '>' || LEAD(event_type, 2) OVER w2 AS path
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM tri WHERE path IS NOT NULL
    GROUP BY path ORDER BY n_paths DESC, path LIMIT 20
    """,
)


def _dpathtri(spark, sf_dir):
    """Top session path trigrams: gaps-and-islands sessionization
    (user-partitioned windows), two LEADs inside the session window,
    one count shuffle on the path string, TakeOrdered top-20 — the
    navigation-pattern miner over the same session definition the
    rest of the engine uses (_gap_sessions)."""
    e = t(spark, sf_dir, "events")
    sess = _gap_sessions(e, "event_type")
    w2 = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    path = F.concat(
        F.col("event_type"),
        F.lit(">"),
        F.lead("event_type", 1).over(w2),
        F.lit(">"),
        F.lead("event_type", 2).over(w2),
    )
    return (
        sess.select(path.alias("path"))
        .filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "path")
        .limit(20)
    )


CATALOG["evt_session_path_trigrams"].fn = _dpathtri

# The weekly life table, single-sourced: Kaplan-Meier and the
# Nelson-Aalen cumulative hazard (round 12) close over the SAME
# (week, at_risk, deaths) frame, so the survival curve and the hazard
# it integrates can never disagree on the risk sets.
_KM_TAB_CTES = """u AS (
      SELECT user_id, MIN(ts) AS fts, MAX(ts) AS lts FROM events GROUP BY user_id
    ),
    h AS (SELECT MAX(lts) AS hmax FROM u),
    lt AS (
      SELECT CAST(FLOOR((FLOOR(epoch(lts)) - FLOOR(epoch(fts))) / 604800.0)
                  AS BIGINT) AS wk,
             CASE WHEN FLOOR(epoch(hmax)) - FLOOR(epoch(lts)) < 604800
                  THEN 1 ELSE 0 END AS censored
      FROM u, h
    ),
    g AS (
      SELECT wk, censored, CAST(COUNT(*) AS BIGINT) AS c
      FROM lt GROUP BY wk, censored
    ),
    tab AS (
      SELECT w.w,
             CAST(SUM(CASE WHEN g.wk >= w.w - 1 THEN g.c ELSE 0 END) AS BIGINT)
               AS at_risk,
             CAST(SUM(CASE WHEN g.wk = w.w - 1 AND g.censored = 0 THEN g.c
                           ELSE 0 END) AS BIGINT) AS deaths
      FROM (SELECT unnest(generate_series(1, 4)) AS w) w
      CROSS JOIN g GROUP BY w.w
    )"""


def _km_life_table(spark, sf_dir):
    """Spark twin of _KM_TAB_CTES: the 4-row weekly (w, at_risk,
    deaths) life table with right-censoring — shared by the survival
    family."""
    ev = t(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("fts"), F.max("ts").alias("lts"))
        .localCheckpoint(eager=False)  # feeds the horizon AND the life table
    )
    h = u.agg(F.max("lts").alias("hmax"))
    lt = u.crossJoin(F.broadcast(h)).select(
        F.floor(
            (F.unix_timestamp("lts") - F.unix_timestamp("fts")) / F.lit(604800.0)
        ).alias("wk"),
        F.when(
            F.unix_timestamp("hmax") - F.unix_timestamp("lts") < 604800, 1
        ).otherwise(0).alias("censored"),
    )
    g = lt.groupBy("wk", "censored").agg(F.count("*").cast("long").alias("c"))
    wx = spark.range(1, 5).select(F.col("id").alias("w"))
    return (
        g.crossJoin(F.broadcast(wx))
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("wk") >= F.col("w") - 1, F.col("c")).otherwise(0))
            .cast("long")
            .alias("at_risk"),
            F.sum(
                F.when(
                    (F.col("wk") == F.col("w") - 1) & (F.col("censored") == 0),
                    F.col("c"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("deaths"),
        )
    )


register(
    "evt_survival_km_weekly",
    # Kaplan-Meier user-retention curve at weekly resolution with
    # right-censoring: lifetime = last minus first activity, censored
    # if the user was still active within 7 days of the dataset
    # horizon. S(w) = prod(1 - d_j/n_j) via the micro-nat ln-sum
    # convention; extinction (d_j = n_j) pins survival to exactly 0.
    oracle=f"""
    WITH {_KM_TAB_CTES},
    km AS (
      SELECT w, at_risk, deaths,
             CASE WHEN deaths >= at_risk THEN CAST(0 AS BIGINT)
                  ELSE CAST(round(round(ln(1.0 - CAST(deaths AS DOUBLE) / at_risk), 6)
                                  * 1000000) AS BIGINT) END AS t6,
             CASE WHEN deaths >= at_risk THEN 1 ELSE 0 END AS ext
      FROM tab
    )
    SELECT w AS week, at_risk, deaths,
           CASE WHEN MAX(ext) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING) = 1
                THEN 0.0
                ELSE round(exp(CAST(SUM(t6) OVER (ORDER BY w ROWS UNBOUNDED PRECEDING)
                                    AS DOUBLE) / 1000000), 6) END AS survival
    FROM km
    """,
)


def _dkmweekly(spark, sf_dir):
    """Weekly Kaplan-Meier retention: one per-user aggregate, a 1-row
    horizon broadcast, a grouped life table (weeks x censored — a
    bounded frame), the 4-week interval grid broadcast across it, and
    a running micro-nat sum over the 4-row table. Everything after
    the first aggregate runs on frames bounded by the calendar.
    Closes over the shared _km_life_table frame."""
    tab = _km_life_table(spark, sf_dir)
    km = tab.select(
        "w",
        "at_risk",
        "deaths",
        F.when(F.col("deaths") >= F.col("at_risk"), F.lit(0).cast("long"))
        .otherwise(
            F.round(
                F.round(
                    F.log(F.lit(1.0) - F.col("deaths").cast("double") / F.col("at_risk")),
                    6,
                )
                * F.lit(1000000.0)
            ).cast("bigint")
        )
        .alias("t6"),
        F.when(F.col("deaths") >= F.col("at_risk"), 1).otherwise(0).alias("ext"),
    )
    wrun = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return km.select(
        F.col("w").alias("week"),
        "at_risk",
        "deaths",
        F.when(F.max("ext").over(wrun) == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.sum("t6").over(wrun).cast("double") / F.lit(1000000)), 6)
        )
        .alias("survival"),
    )


CATALOG["evt_survival_km_weekly"].fn = _dkmweekly

register(
    "orders_open_by_day_sweepline",
    # concurrent open orders per day via the sweep-line trick: +1 at
    # order date, -1 the day after the last shipment, prefix-summed —
    # the interval-stabbing count WITHOUT a day-x-interval range join
    # (which is quadratic at 100 TB; the delta encoding is linear and
    # the running sum is over the bounded calendar-day aggregate).
    oracle="""
    WITH close AS (
      SELECT l_orderkey AS ok, MAX(l_shipdate) AS close_ts
      FROM lineitem GROUP BY l_orderkey
    ),
    iv AS (
      SELECT CAST(FLOOR(epoch(o.o_orderdate) / 86400.0) AS BIGINT) AS d_open,
             CAST(FLOOR(epoch(c.close_ts) / 86400.0) AS BIGINT) AS d_close
      FROM orders o JOIN close c ON c.ok = o.o_orderkey
    ),
    delta AS (
      SELECT d_open AS dn, CAST(1 AS BIGINT) AS dl FROM iv
      UNION ALL
      SELECT d_close + 1, CAST(-1 AS BIGINT) FROM iv
    ),
    daily AS (SELECT dn, CAST(SUM(dl) AS BIGINT) AS net FROM delta GROUP BY dn)
    SELECT dn AS day_num, net AS net_change,
           CAST(SUM(net) OVER (ORDER BY dn ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS open_orders
    FROM daily
    """,
)


def _dsweepline(spark, sf_dir):
    """Open orders per day, sweep-line: per-order close date (one
    lineitem aggregate), two delta rows per order, a day-keyed sum,
    and one running sum over the calendar-day frame. The classic
    interval-count rewrite that replaces an O(days x orders) range
    join with O(orders) deltas."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    close = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("close_ts")
    )
    iv = (
        o.join(close, o.o_orderkey == close.ok)
        .select(
            F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400.0)).alias("d_open"),
            F.floor(F.unix_timestamp("close_ts") / F.lit(86400.0)).alias("d_close"),
        )
        .localCheckpoint(eager=False)  # both arms of the delta union
    )
    delta = iv.select(
        F.col("d_open").alias("dn"), F.lit(1).cast("long").alias("dl")
    ).unionByName(
        iv.select((F.col("d_close") + 1).alias("dn"), F.lit(-1).cast("long").alias("dl"))
    )
    daily = delta.groupBy("dn").agg(F.sum("dl").cast("long").alias("net"))
    wrun = Window.orderBy("dn").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.col("dn").alias("day_num"),
        F.col("net").alias("net_change"),
        F.sum("net").over(wrun).cast("long").alias("open_orders"),
    )


CATALOG["orders_open_by_day_sweepline"].fn = _dsweepline

# Shared DSIR CTE body (tok -> per-doc weight table wd) — used by the
# corpus-wide top-k selection AND the per-source budgeted selection.
_DSIR_CTE = """tok AS (
      SELECT doc_id, lang,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    cnt AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY doc_id, tok
    ),
    rawc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cr FROM tok GROUP BY tok),
    tgtc AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS ct
      FROM tok WHERE lang = 'en' GROUP BY tok
    ),
    tots AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tr,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tt,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      FROM tok
    ),
    lr AS (
      SELECT r.tok,
             CAST(round(round(ln((COALESCE(t.ct, 0) + 1.0) / (tots.tt + tots.v)), 6)
                        * 1000000) AS BIGINT)
             - CAST(round(round(ln((r.cr + 1.0) / (tots.tr + tots.v)), 6)
                          * 1000000) AS BIGINT) AS lr6
      FROM rawc r LEFT JOIN tgtc t ON t.tok = r.tok, tots
    ),
    wd AS (
      SELECT c.doc_id, CAST(SUM(c.c * lr.lr6) AS BIGINT) AS w6,
             CAST(SUM(c.c) AS BIGINT) AS n_tokens
      FROM cnt c JOIN lr ON lr.tok = c.tok GROUP BY c.doc_id
    )"""

register(
    "doc_dsir_importance_weights",
    # DSIR-style importance weighting (Xie et al. 2023, "Data
    # Selection for Language Models via Importance Resampling"): score
    # every document by its unigram log-likelihood ratio under the
    # target distribution (here: the English subcorpus) vs the raw
    # distribution, both Laplace-smoothed over the shared vocabulary.
    # The per-token log ratios are micro-nat integers, so per-doc
    # weights are exact integer dot products; top-20 selection.
    oracle=f"""
    WITH {_DSIR_CTE}
    SELECT d.doc_id, d.lang, wd.n_tokens,
           round(CAST(wd.w6 AS DOUBLE) / 1000000, 6) AS dsir_weight
    FROM wd JOIN documents d ON d.doc_id = wd.doc_id
    ORDER BY dsir_weight DESC, d.doc_id LIMIT 20
    """,
    bench=True,
)


def _dsir_weight_frame(spark, sf_dir):
    """Per-doc DSIR weight frame (doc_id, w6, n_tokens): per-(doc,
    token) counts and the two corpus-level unigram tables come from
    ONE tokenize pass; the log-ratio table is token-keyed (shuffles
    carry tokens and small integers, never text); per-doc weights are
    exact BIGINT dot products via the micro-nat convention. The
    selection-scoring step of a quality-targeted pretraining
    pipeline; consumers rank globally or under per-source budgets."""
    d = t(spark, sf_dir, "documents")
    tk = tok_arr(F.col("text"))
    tok = d.select("doc_id", "lang", F.explode(tk).alias("tok"))
    # r15 opt round: the intermediate per-(doc, lang, token) count table
    # (a corpus-wide exchange of every distinct (doc, token) plus a
    # checkpoint write/read) is gone — the unigram tables partial-
    # aggregate straight from the exploded instances, and the scoring
    # pass below joins instances to the broadcast log-ratio table where
    # every doc's rows are map-local, so the per-doc sums ship ONE row
    # per document. Costs one extra tokenize scan, removes the biggest
    # shuffle of the chain; w6 = sum over instances of lr6 is the same
    # exact BIGINT total as sum c*lr6 (alternating A/B: 1.33 -> 1.13 s,
    # rows identical).
    g = (
        tok.groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("cr"),
            # coalesce (r16, ADVICE): (NULL == 'en') is NULL and a sum
            # of all-NULLs is NULL — a token whose instances all have
            # NULL lang would get lr6 = NULL and silently drop out of
            # every doc's w6. The old left-join + COALESCE shape gave 0
            # for such tokens; preserve that.
            F.sum(F.coalesce((F.col("lang") == "en").cast("long"), F.lit(0)))
            .cast("long")
            .alias("ct"),
        )
        .localCheckpoint(eager=False)  # consumers: tots scalar + lr table
    )
    # Measured rejection (r16 opt round): collecting this 1-row totals
    # frame and folding tr/tt/v in as long literals (to drop the
    # broadcast crossJoin) was job-NEUTRAL (9 vs 9 — the tots broadcast
    # build simply becomes a collect job) and wall-neutral-to-worse
    # (2/6 pairwise). Same outcome as the doc_js driver-side grid:
    # replacing a 1-row broadcast build with an explicit collect moves
    # the job, it does not remove it. Kept as the broadcast crossJoin.
    tots = g.agg(
        F.sum("cr").cast("long").alias("__tr"),
        F.sum("ct").cast("long").alias("__tt"),
        F.count("*").cast("long").alias("__v"),
    )

    def _micro(x):
        return F.round(F.round(F.log(x), 6) * F.lit(1000000.0)).cast("bigint")

    lr = g.crossJoin(F.broadcast(tots)).select(
        "tok",
        (
            _micro((F.col("ct") + F.lit(1.0)) / (F.col("__tt") + F.col("__v")))
            - _micro((F.col("cr") + F.lit(1.0)) / (F.col("__tr") + F.col("__v")))
        ).alias("lr6"),
    )
    # Scale note (r16, ADVICE): unlike the m-row codebook / n_cells
    # centroid broadcasts, lr is VOCABULARY-sized — bounded for these
    # token streams (unigram vocab plateaus ~1e5-1e6 entries of
    # (string, long), tens of MB framed) but not by a model constant.
    # If the vocabulary were unbounded (e.g. raw n-grams), drop the
    # hint and let AQE pick broadcast vs shuffle join by size.
    return (
        tok.join(F.broadcast(lr), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("lr6").cast("long").alias("w6"),
            F.count("*").cast("long").alias("n_tokens"),
        )
    )


def _ddsir(spark, sf_dir):
    """Corpus-wide DSIR selection: top-20 documents by importance
    weight (see _dsir_weight_frame), TakeOrdered with doc-id ties."""
    # the (doc_id, lang) projection broadcasts: skip the fan-out exchange
    d = t(spark, sf_dir, "documents", fan_out=False)
    wd = _dsir_weight_frame(spark, sf_dir)
    return (
        wd.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.round(F.col("w6").cast("double") / F.lit(1000000), 6).alias(
                "dsir_weight"
            ),
        )
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(20)
    )


CATALOG["doc_dsir_importance_weights"].fn = _ddsir

register(
    "doc_dsir_topk_per_source",
    # budgeted DSIR selection: the top-3 documents per crawl source by
    # importance weight — the per-domain quota shape real curation
    # uses so one high-scoring source cannot monopolize the training
    # mix. Partitioned rank over the shared weight frame; integer
    # weights make the ranking exactly reproducible.
    oracle=f"""
    WITH {_DSIR_CTE},
    ranked AS (
      SELECT d.source, d.doc_id, d.lang, wd.w6, wd.n_tokens,
             ROW_NUMBER() OVER (PARTITION BY d.source
                                ORDER BY wd.w6 DESC, d.doc_id) AS rank_in_source
      FROM wd JOIN documents d ON d.doc_id = wd.doc_id
    )
    SELECT source, CAST(rank_in_source AS BIGINT) AS rank_in_source, doc_id, lang,
           n_tokens, round(CAST(w6 AS DOUBLE) / 1000000, 6) AS dsir_weight
    FROM ranked WHERE rank_in_source <= 3
    """,
)


def _ddsirtopk(spark, sf_dir):
    """Per-source DSIR quota: one partitioned rank window over the
    weight frame joined to the documents dimension — no global sort,
    no broadcast beyond the weight pipeline's own scalars; at 100 TB
    each source ranks independently inside its shuffle partition."""
    d = t(spark, sf_dir, "documents")
    wd = _dsir_weight_frame(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.desc("w6"), "doc_id")
    return (
        wd.join(d.select("doc_id", "lang", "source"), "doc_id")
        .withColumn("rank_in_source", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_source") <= 3)
        .select(
            "source",
            "rank_in_source",
            "doc_id",
            "lang",
            "n_tokens",
            F.round(F.col("w6").cast("double") / F.lit(1000000), 6).alias(
                "dsir_weight"
            ),
        )
    )


CATALOG["doc_dsir_topk_per_source"].fn = _ddsirtopk

register(
    "doc_cluster_source_purity",
    # external validation of the near-dup communities: per community,
    # the majority source and its share — high purity means duplicate
    # families live inside one crawl source (boilerplate), low purity
    # means cross-source syndication. Composes the min-label
    # propagation frames with the documents dimension.
    oracle=f"""
    WITH {_label_prop_cte(3)[0]},
    m AS (
      SELECT l.lbl AS comm, d.source, CAST(COUNT(*) AS BIGINT) AS c
      FROM {_label_prop_cte(3)[1]} l JOIN documents d ON d.doc_id = l.node
      GROUP BY l.lbl, d.source
    ),
    tot AS (SELECT comm, CAST(SUM(c) AS BIGINT) AS n_members FROM m GROUP BY comm),
    top AS (
      SELECT comm, source, c,
             ROW_NUMBER() OVER (PARTITION BY comm ORDER BY c DESC, source) AS rn
      FROM m
    )
    SELECT CAST(t.comm AS BIGINT) AS community, tot.n_members,
           t.source AS majority_source,
           round(CAST(t.c AS DOUBLE) / tot.n_members, 6) AS purity
    FROM top t JOIN tot ON tot.comm = t.comm
    WHERE t.rn = 1
    ORDER BY tot.n_members DESC, community LIMIT 20
    """,
)


def _dclusterpurity(spark, sf_dir):
    """Cluster-source purity: the propagated label frame joins the
    documents dimension on doc id, one (community, source) count, a
    per-community argmax via the partitioned rank window, top-20 by
    community size. All shuffle keys are ids/labels."""
    d = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node"), "source"
    )
    lbl = _min_label_frames(spark, sf_dir, rounds=3)
    m = (
        lbl.join(d, "node")
        .groupBy(F.col("lbl").alias("comm"), "source")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = m.groupBy("comm").agg(F.sum("c").cast("long").alias("n_members"))
    w = Window.partitionBy("comm").orderBy(F.desc("c"), "source")
    top = m.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        top.join(tot, "comm")
        .select(
            F.col("comm").cast("long").alias("community"),
            "n_members",
            F.col("source").alias("majority_source"),
            F.round(F.col("c").cast("double") / F.col("n_members"), 6).alias(
                "purity"
            ),
        )
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


CATALOG["doc_cluster_source_purity"].fn = _dclusterpurity

# The per-(lang, token) count table, single-sourced: TTR/hapax, the
# Brunet/Sichel/Herdan panel and Honore's R (round 12) all close over
# the SAME vocabulary frame, so the richness statistics can never
# disagree on what a type is.
_LANG_TOKCOUNT_CTES = """tok AS (
      SELECT lang,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    tc AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY lang, tok)"""


def _lang_tokcounts(spark, sf_dir):
    """Spark twin of _LANG_TOKCOUNT_CTES: the (lang, token) -> count
    frame (token-keyed shuffle with map-side combine) shared by the
    vocabulary-richness family."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(tok_arr(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )


register(
    "doc_ttr_hapax_by_lang",
    # lexical diversity per language: type-token ratio and hapax
    # share from the per-(lang, token) count table — the vocabulary
    # richness panel next to the Zipf and Heaps fits.
    oracle=f"""
    WITH {_LANG_TOKCOUNT_CTES}
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS ttr,
           round(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_share
    FROM tc GROUP BY lang
    """,
)


def _dttr(spark, sf_dir):
    """Type-token ratio + hapax share: one tokenize pass to the
    (lang, token) count table (token-keyed shuffle with map-side
    combine), then a per-lang rollup — the working set after the
    first aggregate is vocabulary-sized, not corpus-sized. Closes over
    the shared _lang_tokcounts frame."""
    tc = _lang_tokcounts(spark, sf_dir)
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return tc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        hapax.cast("long").alias("n_hapax"),
        F.round(
            F.count("*").cast("double") / F.sum("c").cast("double"), 6
        ).alias("ttr"),
        F.round(hapax.cast("double") / F.count("*"), 6).alias("hapax_share"),
    )


CATALOG["doc_ttr_hapax_by_lang"].fn = _dttr

register(
    "doc_bigram_entropy_rate_by_lang",
    # conditional bigram entropy H(W2|W1) per language in exact
    # micro-nats: -(1/N) * sum over bigram instances of ln(c12/c1) —
    # the information-rate diagnostic that separates repetitive
    # template languages from diverse prose (low H = predictable).
    # Same bigram construction as the LM-scoring family.
    oracle="""
    WITH tk AS (
      SELECT lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ),
    bg AS (
      SELECT lang, tk[i] AS w1, tk[i + 1] AS w2
      FROM tk, (SELECT unnest(range(1, (SELECT MAX(len(tk)) FROM tk) + 1)) AS i) g
      WHERE i < len(tk) AND tk[i] <> '' AND tk[i + 1] <> ''
    ),
    c2 AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg
           GROUP BY lang, w1, w2),
    c1 AS (SELECT lang, w1, CAST(SUM(c) AS BIGINT) AS c FROM c2 GROUP BY lang, w1),
    terms AS (
      SELECT c2.lang,
             c2.c * CAST(round(round(ln(CAST(c2.c AS DOUBLE) / c1.c), 6) * 1000000)
                         AS BIGINT) AS t6,
             c2.c AS n_inst
      FROM c2 JOIN c1 ON c1.lang = c2.lang AND c1.w1 = c2.w1
    )
    SELECT lang,
           CAST(SUM(n_inst) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS n_bigram_types,
           round(-(CAST(SUM(t6) AS DOUBLE) / 1000000)
                 / CAST(SUM(n_inst) AS DOUBLE), 6) AS entropy_rate_nats
    FROM terms GROUP BY lang
    """,
)


def _dbgentropy(spark, sf_dir):
    """Bigram entropy rate per language: positional lead within each
    document builds bigram instances (one doc-partitioned window),
    the bigram-type count table carries the sum — each type
    contributes c12 * ln(c12/c1) as an exact micro-nat product, so
    the per-lang total never touches instance-level floats. The
    conditional count c1 rolls up from c2 (no second scan)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    bg = (
        d.select("lang", "doc_id", F.posexplode(toks).alias("__p", "__w"))
        .filter(F.col("__w") != "")
    )
    wnd = Window.partitionBy("doc_id").orderBy("__p")
    pairs = (
        bg.withColumn("__w2", F.lead("__w").over(wnd))
        .filter(F.col("__w2").isNotNull())
        .select("lang", F.col("__w").alias("w1"), F.col("__w2").alias("w2"))
    )
    c2 = pairs.groupBy("lang", "w1", "w2").agg(F.count("*").cast("long").alias("c"))
    c1 = c2.groupBy("lang", "w1").agg(F.sum("c").cast("long").alias("__c1"))
    t6 = (
        F.col("c")
        * F.round(
            F.round(F.log(F.col("c").cast("double") / F.col("__c1")), 6)
            * F.lit(1000000.0)
        ).cast("bigint")
    )
    terms = c2.join(c1, ["lang", "w1"]).select(
        "lang", t6.alias("t6"), F.col("c").alias("n_inst")
    )
    return terms.groupBy("lang").agg(
        F.sum("n_inst").cast("long").alias("n_bigrams"),
        F.count("*").cast("long").alias("n_bigram_types"),
        F.round(
            -(F.sum("t6").cast("double") / F.lit(1000000))
            / F.sum("n_inst").cast("double"),
            6,
        ).alias("entropy_rate_nats"),
    )


CATALOG["doc_bigram_entropy_rate_by_lang"].fn = _dbgentropy

register(
    "doc_dedup_token_loss_by_source",
    # curation accounting: how much token mass exact-dedup removes
    # from each source (keep = min doc id per identical text, the
    # engine-wide exact-dup convention). The per-source loss table is
    # the report that justifies — or indicts — a dedup stage.
    oracle="""
    WITH d AS (
      SELECT doc_id, source, sha256(text) AS h,
             CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    k AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS docs_total,
           CAST(SUM(CASE WHEN d.doc_id = k.keep_id THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_kept,
           CAST(SUM(d.n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN d.doc_id = k.keep_id THEN 0 ELSE d.n_tok END) AS BIGINT)
             AS tokens_removed,
           round(CAST(SUM(CASE WHEN d.doc_id = k.keep_id THEN 0 ELSE d.n_tok END)
                      AS DOUBLE) / CAST(SUM(d.n_tok) AS DOUBLE), 6) AS token_loss_share
    FROM d JOIN k ON k.h = d.h
    GROUP BY d.source
    """,
)


def _ddeduploss(spark, sf_dir):
    """Exact-dedup token-loss accounting: documents hash once (sha2 —
    the shuffle key is a digest, never the text), the keep-id table is
    one min-aggregate on the digest, and the per-source report is one
    conditional-sum pass over the back-join. Token counts ride along
    from the same single scan."""
    d = t(spark, sf_dir, "documents")
    tk = tok_arr(F.col("text"))
    # consumed by the keep-id aggregate AND the back-join: checkpoint
    # so the corpus is hashed/tokenize-counted once
    base = d.select(
        "doc_id",
        "source",
        F.sha2(F.col("text"), 256).alias("h"),
        F.size(tk).cast("long").alias("n_tok"),
    ).localCheckpoint(eager=False)
    k = base.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    j = base.join(k, "h")
    removed_tok = F.sum(
        F.when(F.col("doc_id") == F.col("keep_id"), 0).otherwise(F.col("n_tok"))
    )
    return j.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_total"),
        F.sum(F.when(F.col("doc_id") == F.col("keep_id"), 1).otherwise(0))
        .cast("long")
        .alias("docs_kept"),
        F.sum("n_tok").cast("long").alias("tokens_total"),
        removed_tok.cast("long").alias("tokens_removed"),
        F.round(
            removed_tok.cast("double") / F.sum("n_tok").cast("double"), 6
        ).alias("token_loss_share"),
    )


CATALOG["doc_dedup_token_loss_by_source"].fn = _ddeduploss

register(
    "orders_fill_rate_sla",
    # shipment SLA attainment per order priority: share of orders
    # fully shipped within 30/60/90 days of order date (close = last
    # lineitem shipment — the sweep-line query's close definition).
    # Pure integer day arithmetic, three banded conditional counts.
    oracle="""
    WITH close AS (
      SELECT l_orderkey AS ok, MAX(l_shipdate) AS close_ts
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderpriority AS priority,
             CAST(FLOOR(epoch(c.close_ts) / 86400.0) AS BIGINT)
             - CAST(FLOOR(epoch(o.o_orderdate) / 86400.0) AS BIGINT) AS days_to_ship
      FROM orders o JOIN close c ON c.ok = o.o_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN days_to_ship <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS shipped_30d,
           CAST(SUM(CASE WHEN days_to_ship <= 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS shipped_60d,
           CAST(SUM(CASE WHEN days_to_ship <= 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS shipped_90d,
           round(CAST(SUM(CASE WHEN days_to_ship <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS fill_rate_30d,
           round(CAST(SUM(CASE WHEN days_to_ship <= 90 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS fill_rate_90d
    FROM j GROUP BY priority
    """,
)


def _dfillrate(spark, sf_dir):
    """SLA fill rates: per-order close date (one lineitem aggregate
    on the orderkey the join also uses), integer day difference,
    single conditional-count pass per priority."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    close = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("close_ts")
    )
    j = o.join(close, o.o_orderkey == close.ok).select(
        F.col("o_orderpriority").alias("priority"),
        (
            F.floor(F.unix_timestamp("close_ts") / F.lit(86400.0))
            - F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400.0))
        ).alias("days_to_ship"),
    )

    def within(dth, nm):
        return (
            F.sum(F.when(F.col("days_to_ship") <= dth, 1).otherwise(0))
            .cast("long")
            .alias(nm)
        )

    return j.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_orders"),
        within(30, "shipped_30d"),
        within(60, "shipped_60d"),
        within(90, "shipped_90d"),
        F.round(
            F.sum(F.when(F.col("days_to_ship") <= 30, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("fill_rate_30d"),
        F.round(
            F.sum(F.when(F.col("days_to_ship") <= 90, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("fill_rate_90d"),
    )


CATALOG["orders_fill_rate_sla"].fn = _dfillrate

register(
    "lineitem_return_rate_wilson",
    # brand return-rate ranking by the Wilson-score lower bound
    # (z = 1.96) — the confidence-aware sort that keeps low-volume
    # brands from topping the list on noise. Worst-10 brands.
    oracle="""
    WITH b AS (
      SELECT p.p_brand AS brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returned
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    ),
    s AS (SELECT brand, n, n_returned, CAST(n_returned AS DOUBLE) / n AS p FROM b)
    SELECT brand, n, n_returned, round(p, 6) AS return_rate,
           round((p + 1.96 * 1.96 / (2 * n)
                  - 1.96 * sqrt((p * (1.0 - p) + 1.96 * 1.96 / (4 * n)) / n))
                 / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_lb
    FROM s
    ORDER BY wilson_lb DESC, brand LIMIT 10
    """,
)


def _dwilson(spark, sf_dir):
    """Wilson lower-bound return-rate ranking: one broadcast dim join,
    one conditional count per brand, identical IEEE score arithmetic
    on both engines, TakeOrdered worst-10. The ranking-by-confidence
    pattern every review/defect leaderboard needs."""
    li = t(spark, sf_dir, "lineitem")
    pt = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
        )
    )
    s = b.withColumn("p", F.col("n_returned").cast("double") / F.col("n"))
    z2 = F.lit(1.96) * F.lit(1.96)
    wilson = (
        F.col("p")
        + z2 / (2 * F.col("n"))
        - F.lit(1.96)
        * F.sqrt(
            (F.col("p") * (F.lit(1.0) - F.col("p")) + z2 / (4 * F.col("n")))
            / F.col("n")
        )
    ) / (F.lit(1.0) + z2 / F.col("n"))
    return (
        s.select(
            "brand",
            "n",
            "n_returned",
            F.round(F.col("p"), 6).alias("return_rate"),
            F.round(wilson, 6).alias("wilson_lb"),
        )
        .orderBy(F.desc("wilson_lb"), "brand")
        .limit(10)
    )


CATALOG["lineitem_return_rate_wilson"].fn = _dwilson

register(
    "emb_class_margin_audit",
    # embedding-space class separation over the banded-LSH candidate
    # pairs: cosine stats split by same-label vs cross-label — the
    # metric-learning health check (a healthy space shows a clear gap
    # between the two rows). Candidates only, like the cosine
    # histogram: the audit an index can afford at scale.
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, label,
             {_EMB_BAND_SQL[0]} AS bkt0,
             {_EMB_BAND_SQL[1]} AS bkt1,
             {_EMB_BAND_SQL[2]} AS bkt2,
             {_EN_NORM_SQL} AS n
      FROM embeddings
    ),
    pc AS (
      SELECT CAST(CASE WHEN a.label = c.label THEN 1 ELSE 0 END AS BIGINT)
               AS same_label,
             {_cos6_sql('a.embedding', 'c.embedding', 'a.n', 'c.n')} AS cos6
      FROM b a JOIN b c
        ON a.vec_id < c.vec_id
       AND (a.bkt0 = c.bkt0 OR a.bkt1 = c.bkt1 OR a.bkt2 = c.bkt2)
    )
    SELECT same_label,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(FLOOR(cos6 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000 / COUNT(*), 6) AS mean_cosine,
           round(quantile_cont(cos6, 0.10), 6) AS p10_cosine,
           round(quantile_cont(cos6, 0.90), 6) AS p90_cosine
    FROM pc GROUP BY same_label
    """,
)


def _dclassmargin(spark, sf_dir):
    """Class-margin audit: the banded pair expansion (signatures and
    norms computed once), labels equi-joined onto both endpoints by
    id, one 2-row grouped aggregate — micro-unit cosine sums so the
    means are order-independent, exact-interpolation percentiles."""
    e = t(spark, sf_dir, "embeddings")
    p = similarity.embedding_dup_pairs(e, threshold=-1.0, bits=6, bands=3)
    lab = e.select("vec_id", "label")
    la = lab.withColumnsRenamed({"vec_id": "id_a", "label": "__la"})
    lb = lab.withColumnsRenamed({"vec_id": "id_b", "label": "__lb"})
    cos6 = F.round(F.col("cosine_sim"), 6)
    pc = (
        p.join(F.broadcast(la), "id_a")
        .join(F.broadcast(lb), "id_b")
        .select(
            F.when(F.col("__la") == F.col("__lb"), 1)
            .otherwise(0)
            .cast("long")
            .alias("same_label"),
            cos6.alias("cos6"),
        )
    )
    return pc.groupBy("same_label").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.floor(F.col("cos6") * 1000000 + 0.5).cast("long")).cast("double")
            / F.lit(1000000)
            / F.count("*"),
            6,
        ).alias("mean_cosine"),
        F.round(F.percentile("cos6", F.lit(0.10)), 6).alias("p10_cosine"),
        F.round(F.percentile("cos6", F.lit(0.90)), 6).alias("p90_cosine"),
    )


CATALOG["emb_class_margin_audit"].fn = _dclassmargin

register(
    "doc_source_perplexity_rank",
    # source-level quality ranking by self-trained bigram perplexity —
    # the corpus-level rollup of the per-doc LM filter (CCNet ranks
    # whole dumps this way before any per-doc decision): micro-nat
    # instance sums per source, perplexity = exp(-avg logprob).
    oracle="""
    WITH tk AS (
      SELECT source, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ),
    bg AS (
      SELECT source, tk[i] AS w1, tk[i + 1] AS w2
      FROM tk, (SELECT unnest(range(1, (SELECT MAX(len(tk)) FROM tk) + 1)) AS i) g
      WHERE i < len(tk) AND tk[i] <> '' AND tk[i + 1] <> ''
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c FROM bg GROUP BY w1),
    terms AS (
      SELECT bg.source,
             CAST(round(round(ln(CAST(c2.c AS DOUBLE) / c1.c), 6) * 1000000)
                  AS BIGINT) AS t
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round((CAST(SUM(t) AS DOUBLE) / 1000000.0) / COUNT(*), 6) AS avg_logprob,
           round(exp(-((CAST(SUM(t) AS DOUBLE) / 1000000.0) / COUNT(*))), 6)
             AS perplexity
    FROM terms GROUP BY source
    """,
)


def _dsrcppl(spark, sf_dir):
    """Per-source bigram perplexity: the corpus-trained conditional
    counts (the same train-once artifact the per-doc scorer uses)
    join back onto the bigram stream, instance micro-nats sum per
    source — high perplexity flags sources whose text fights the
    corpus distribution (spam, wrong language, boilerplate soup)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    bg = (
        d.select("source", "doc_id", F.posexplode(toks).alias("__p", "__w"))
        .filter(F.col("__w") != "")
    )
    wnd = Window.partitionBy("doc_id").orderBy("__p")
    # bigram stream feeds the count tables AND the back-join: lazy
    # checkpoint so the tokenize/window stage runs once; c1 rolls up
    # from c2 instead of re-counting the stream
    pairs = (
        bg.withColumn("__w2", F.lead("__w").over(wnd))
        .filter(F.col("__w2").isNotNull())
        .select("source", F.col("__w").alias("w1"), F.col("__w2").alias("w2"))
        .localCheckpoint(eager=False)
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("__c2"))
    c1 = c2.groupBy("w1").agg(F.sum("__c2").alias("__c1"))
    term = (
        F.round(
            F.round(F.log(F.col("__c2").cast("double") / F.col("__c1")), 6)
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("__t")
    )
    scored = pairs.join(c2, ["w1", "w2"]).join(c1, ["w1"]).select("source", term)
    avg_lp = (F.sum("__t").cast("double") / F.lit(1000000.0)) / F.count("*")
    return scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(avg_lp, 6).alias("avg_logprob"),
        F.round(F.exp(-avg_lp), 6).alias("perplexity"),
    )


CATALOG["doc_source_perplexity_rank"].fn = _dsrcppl

register(
    "cust_nation_revenue_entropy",
    # revenue-concentration entropy per nation: H = ln(T) - sum(x ln x)/T
    # over per-customer revenue shares, in exact micro-nat products
    # (HUGEINT/DECIMAL(38) for the x*ln(x) sums); effective_customers =
    # exp(H) is the "how many customers does this market really have"
    # diversification number next to the global Gini.
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nk, o.o_custkey,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY nk, o.o_custkey
    ),
    agg AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(x) AS BIGINT) AS tot,
             CAST(SUM(CAST(x AS HUGEINT)
                      * CAST(round(round(ln(CAST(x AS DOUBLE)), 6) * 1000000)
                             AS BIGINT)) AS DOUBLE) AS s6
      FROM rev GROUP BY nk
    )
    SELECT n.n_name AS nation, a.n_customers,
           CAST(a.tot AS DOUBLE) / 100 AS total_revenue,
           round(round(ln(CAST(a.tot AS DOUBLE)), 6)
                 - (a.s6 / 1000000) / a.tot, 6) AS revenue_entropy_nats,
           round(exp(round(ln(CAST(a.tot AS DOUBLE)), 6)
                     - (a.s6 / 1000000) / a.tot), 6) AS effective_customers
    FROM agg a JOIN nation n ON n.n_nationkey = a.nk
    """,
)


def _dnatentropy(spark, sf_dir):
    """Revenue entropy per nation: per-customer exact cents (one fact
    aggregate), per-nation moment row with x*ln(x) as exact
    integer-unit products, a broadcast nation-name join. The entropy/
    effective-count pair reads concentration the way the Gini reads
    inequality — both now first-class."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = (F.col("o_totalprice").cast(DEC) * 100).cast("long")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
        .agg(F.sum(cents).cast("long").alias("x"))
    )
    micro_lnx = F.round(
        F.round(F.log(F.col("x").cast("double")), 6) * F.lit(1000000.0)
    ).cast("bigint")
    agg = rev.groupBy("nk").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("x").cast("long").alias("tot"),
        F.sum(F.col("x").cast("decimal(38,0)") * micro_lnx).cast("double").alias("s6"),
    )
    h = F.round(F.log(F.col("tot").cast("double")), 6) - (
        F.col("s6") / F.lit(1000000)
    ) / F.col("tot")
    return agg.join(F.broadcast(n), agg.nk == n.n_nationkey).select(
        F.col("n_name").alias("nation"),
        "n_customers",
        (F.col("tot").cast("double") / 100).alias("total_revenue"),
        F.round(h, 6).alias("revenue_entropy_nats"),
        F.round(F.exp(h), 6).alias("effective_customers"),
    )


CATALOG["cust_nation_revenue_entropy"].fn = _dnatentropy

register(
    "emb_centroid_separation_report",
    # per-label cluster geometry: micro-unit-exact per-dimension
    # centroids, within-label RMS distance, nearest other centroid,
    # separation ratio — the Davies-Bouldin-style compactness/
    # separation audit for a labeled embedding space. Every float sum
    # is an integer micro-unit sum, so the report is engine-exact.
    oracle="""
    WITH ex AS (
      SELECT e.label, g.i AS i, CAST(e.embedding[g.i] AS DOUBLE) AS x
      FROM embeddings e, (SELECT unnest(range(1, 65)) AS i) g
    ),
    cent AS (
      SELECT label, i, CAST(COUNT(*) AS BIGINT) AS n,
             round(CAST(SUM(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1000000.0 / COUNT(*), 6) AS c
      FROM ex GROUP BY label, i
    ),
    nv AS (SELECT label, n AS n_vecs FROM cent WHERE i = 1),
    within AS (
      SELECT ex.label,
             CAST(SUM(CAST(floor((ex.x - cent.c) * (ex.x - cent.c) * 1000000 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss
      FROM ex JOIN cent ON cent.label = ex.label AND cent.i = ex.i
      GROUP BY ex.label
    ),
    pd AS (
      SELECT a.label AS la, b.label AS lb,
             CAST(SUM(CAST(floor((a.c - b.c) * (a.c - b.c) * 1000000 + 0.5)
                           AS BIGINT)) AS DOUBLE) / 1000000.0 AS d2
      FROM cent a JOIN cent b ON b.i = a.i AND a.label < b.label
      GROUP BY a.label, b.label
    ),
    nearest AS (
      SELECT label, MIN(d2) AS nd2 FROM (
        SELECT la AS label, d2 FROM pd UNION ALL SELECT lb, d2 FROM pd
      ) GROUP BY label
    )
    SELECT nv.label, nv.n_vecs,
           round(sqrt(w.ss / nv.n_vecs), 6) AS within_rms,
           round(sqrt(nr.nd2), 6) AS nearest_centroid_dist,
           round(sqrt(nr.nd2) / sqrt(w.ss / nv.n_vecs), 6) AS separation_ratio
    FROM nv
    JOIN within w ON w.label = nv.label
    JOIN nearest nr ON nr.label = nv.label
    """,
)


def _dcentroidsep(spark, sf_dir):
    """Centroid separation report: one posexplode to (label, dim,
    value) rows, micro-unit centroid means, a back-join for within-
    label scatter, a dim-keyed centroid self-join for the 45 pairwise
    label distances — the per-dim frames are (labels x 64) rows, so
    everything after the first aggregate is broadcast-sized. cent is
    lazily checkpointed (4 consumers)."""
    e = t(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("__p", "__xf")
    ).select(
        "label", (F.col("__p") + 1).alias("i"), F.col("__xf").cast("double").alias("x")
    ).localCheckpoint(eager=False)
    cent = (
        ex.groupBy("label", "i")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.floor(F.col("x") * 1000000 + 0.5).cast("long")).cast("double")
                / F.lit(1000000.0)
                / F.count("*"),
                6,
            ).alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    nv = cent.filter(F.col("i") == 1).select("label", F.col("n").alias("n_vecs"))
    within = (
        ex.join(cent.select("label", "i", "c"), ["label", "i"])
        .groupBy("label")
        .agg(
            (
                F.sum(
                    F.floor(
                        (F.col("x") - F.col("c")) * (F.col("x") - F.col("c")) * 1000000
                        + 0.5
                    ).cast("long")
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("ss")
        )
    )
    a = cent.select(F.col("label").alias("la"), "i", F.col("c").alias("ca"))
    b = cent.select(
        F.col("label").alias("lb"), F.col("i").alias("ib"), F.col("c").alias("cb")
    )
    pd_ = (
        a.join(b, (F.col("i") == F.col("ib")) & (F.col("la") < F.col("lb")))
        .groupBy("la", "lb")
        .agg(
            (
                F.sum(
                    F.floor(
                        (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")) * 1000000
                        + 0.5
                    ).cast("long")
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("d2")
        )
    )
    nearest = (
        pd_.select(F.col("la").alias("label"), "d2")
        .unionByName(pd_.select(F.col("lb").alias("label"), "d2"))
        .groupBy("label")
        .agg(F.min("d2").alias("nd2"))
    )
    wr = F.sqrt(F.col("ss") / F.col("n_vecs"))
    return (
        nv.join(within, "label")
        .join(nearest, "label")
        .select(
            "label",
            "n_vecs",
            F.round(wr, 6).alias("within_rms"),
            F.round(F.sqrt(F.col("nd2")), 6).alias("nearest_centroid_dist"),
            F.round(F.sqrt(F.col("nd2")) / wr, 6).alias("separation_ratio"),
        )
    )


CATALOG["emb_centroid_separation_report"].fn = _dcentroidsep

register(
    "evt_transition_entropy_by_src",
    # behavioral predictability: entropy (and exp-entropy = effective
    # branching factor) of each event type's outgoing transition
    # distribution — the rollup of the Markov matrix that says which
    # states are deterministic funnels vs free-for-alls. Exact n*ln(n)
    # micro-nat products, one division.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ),
    c AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    agg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS n_dst_types,
             CAST(SUM(n) AS BIGINT) AS tot,
             CAST(SUM(CAST(n AS HUGEINT)
                      * CAST(round(round(ln(CAST(n AS DOUBLE)), 6) * 1000000)
                             AS BIGINT)) AS DOUBLE) AS s6
      FROM c GROUP BY src
    )
    SELECT src, tot AS n_transitions, n_dst_types,
           round(round(ln(CAST(tot AS DOUBLE)), 6)
                 - (s6 / 1000000) / tot, 6) AS entropy_nats,
           round(exp(round(ln(CAST(tot AS DOUBLE)), 6)
                     - (s6 / 1000000) / tot), 6) AS effective_branching
    FROM agg
    """,
)


def _dtransentropy(spark, sf_dir):
    """Transition entropy per source state: the same lead-window
    transition counts the Markov matrix uses, rolled into one moment
    row per state with exact integer n*ln(n) products — k rows out
    for k event types."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = seq.groupBy("src", "dst").agg(F.count("*").cast("long").alias("n"))
    micro_lnn = F.round(
        F.round(F.log(F.col("n").cast("double")), 6) * F.lit(1000000.0)
    ).cast("bigint")
    agg = c.groupBy("src").agg(
        F.count("*").cast("long").alias("n_dst_types"),
        F.sum("n").cast("long").alias("tot"),
        F.sum(F.col("n").cast("decimal(38,0)") * micro_lnn).cast("double").alias("s6"),
    )
    h = F.round(F.log(F.col("tot").cast("double")), 6) - (
        F.col("s6") / F.lit(1000000)
    ) / F.col("tot")
    return agg.select(
        "src",
        F.col("tot").alias("n_transitions"),
        "n_dst_types",
        F.round(h, 6).alias("entropy_nats"),
        F.round(F.exp(h), 6).alias("effective_branching"),
    )


CATALOG["evt_transition_entropy_by_src"].fn = _dtransentropy

register(
    "graph_rich_club",
    # rich-club coefficient of the near-dup graph at k in {2,4,8}:
    # phi(k) = 2*E_k / (N_k*(N_k-1)) over the subgraph of nodes with
    # degree > k — do the heavy-duplicate documents preferentially
    # duplicate EACH OTHER (template families) or spread thin?
    oracle=f"""
    WITH pairs AS MATERIALIZED ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    ks AS (SELECT unnest([2, 4, 8]) AS k),
    nk AS (
      SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM ks CROSS JOIN deg WHERE deg.deg > ks.k GROUP BY ks.k
    ),
    ek AS (
      SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_edges
      FROM ks
      CROSS JOIN pairs p
      JOIN deg da ON da.node = p.id_a
      JOIN deg db ON db.node = p.id_b
      WHERE da.deg > ks.k AND db.deg > ks.k
      GROUP BY ks.k
    )
    SELECT nk.k, nk.n_nodes, COALESCE(ek.n_edges, 0) AS n_edges,
           round(2.0 * COALESCE(ek.n_edges, 0)
                 / NULLIF(CAST(nk.n_nodes AS DOUBLE) * (nk.n_nodes - 1), 0.0), 6)
             AS rich_club_phi
    FROM nk LEFT JOIN ek ON ek.k = nk.k
    """,
)


def _drichclub(spark, sf_dir):
    """Rich-club: the degree table filters both endpoints of the pair
    set per k (a 3-row literal grid broadcast across the id-keyed
    joins), two grouped counts, one guarded division. deg is lazily
    checkpointed — it gates the node count and both endpoint joins."""
    pairs, edges = _dup_pairs_edges(spark, sf_dir)
    deg = _dup_degrees(edges)
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(4), F.lit(8))).alias("k")
    )
    nk = (
        deg.crossJoin(F.broadcast(ks))
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )
    da = deg.withColumnsRenamed({"node": "id_a", "deg": "__da"})
    db = deg.withColumnsRenamed({"node": "id_b", "deg": "__db"})
    ek = (
        pairs.join(da, "id_a")
        .join(db, "id_b")
        .crossJoin(F.broadcast(ks))
        .filter((F.col("__da") > F.col("k")) & (F.col("__db") > F.col("k")))
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_edges"))
    )
    return (
        nk.join(ek, "k", "left")
        .select(
            "k",
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0)).cast("long").alias("n_edges"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("n_edges"), F.lit(0))
                / F.nullif(
                    F.col("n_nodes").cast("double") * (F.col("n_nodes") - 1),
                    F.lit(0.0),
                ),
                6,
            ).alias("rich_club_phi"),
        )
    )


CATALOG["graph_rich_club"].fn = _drichclub

register(
    "evt_hourly_dispersion_by_type",
    # arrival-process dispersion per event type: variance-to-mean
    # ratio of hourly counts over observed hours (Poisson arrivals
    # give VMR ~ 1; bursty traffic inflates it). Exact integer
    # moments, sample variance, one rounded division each.
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(FLOOR(epoch(ts) / 3600.0) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, hr
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS mean_per_hour,
           round(((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE)
                   - CAST(SUM(y) AS DOUBLE) * SUM(y))
                  / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)))
                 / (CAST(SUM(y) AS DOUBLE) / COUNT(*)), 6) AS vmr
    FROM h GROUP BY event_type
    """,
)


def _dhourlyvmr(spark, sf_dir):
    """Hourly dispersion index: one (type, hour) count aggregate, one
    moment rollup per type — the burstiness gauge for capacity
    planning, next to the token-burstiness VMR on the text side."""
    ev = t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / F.lit(3600.0)).alias("hr"),
    ).agg(F.count("*").cast("long").alias("y"))
    nd = F.count("*").cast("double")
    var = (
        nd * F.sum(F.col("y").cast("decimal(18,0)") * F.col("y").cast("decimal(18,0)")).cast("double")
        - F.sum("y").cast("double") * F.sum("y")
    ) / (nd * (F.count("*") - 1))
    return h.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.round(F.sum("y").cast("double") / F.count("*"), 6).alias("mean_per_hour"),
        F.round(var / (F.sum("y").cast("double") / F.count("*")), 6).alias("vmr"),
    )


CATALOG["evt_hourly_dispersion_by_type"].fn = _dhourlyvmr

register(
    "evt_cusum_drift_per_user",
    # per-user CUSUM drift statistic S_t = max(0, S_{t-1} + d_t) —
    # the recursive change-detector that looks window-inexpressible,
    # computed EXACTLY in window algebra via the identity
    # S_t = P_t - min(0, min_{j<=t} P_j) over prefix sums P (so no
    # per-row recursion, no UDF, one user-partitioned shuffle).
    # Deviations are exact cents against the floored global mean;
    # alarms fire above 1000.00 of accumulated positive drift.
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    m AS (
      SELECT CAST(FLOOR(CAST(SUM(cents) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mu
      FROM x
    ),
    p AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(cents - mu) OVER w AS BIGINT) AS pre
      FROM x, m
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
      SELECT user_id,
             pre - LEAST(CAST(0 AS BIGINT), CAST(MIN(pre) OVER w AS BIGINT)) AS cu
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(cu) AS DOUBLE) / 100 AS max_cusum,
           CAST(SUM(CASE WHEN cu > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms
    FROM s GROUP BY user_id
    """,
)


def _dcusum(spark, sf_dir):
    """CUSUM per user without recursion: prefix sums and a running min
    share ONE user-partitioned sort (two stacked window functions over
    the same frame — a single shuffle), then a per-user rollup. The
    identity S_t = P_t - min(0, min_{j<=t} P_j) turns the sequential
    max(0, .) recursion into two scans any engine parallelizes; a
    property test checks it against the direct recursion."""
    ev = t(spark, sf_dir, "events")
    cents = (F.col("value").cast(DEC) * 100).cast("long")
    x = ev.select("user_id", "ts", "event_id", cents.alias("cents"))
    m = x.agg(
        F.floor(F.sum("cents").cast("double") / F.count("*"))
        .cast("long")
        .alias("__mu")
    )
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = x.crossJoin(F.broadcast(m)).select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("cents") - F.col("__mu")).over(wp).cast("long").alias("pre"),
    )
    s = p.select(
        "user_id",
        (
            F.col("pre")
            - F.least(F.lit(0).cast("long"), F.min("pre").over(wp).cast("long"))
        ).alias("cu"),
    )
    return s.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.max("cu").cast("double") / 100).alias("max_cusum"),
        F.sum(F.when(F.col("cu") > 100000, 1).otherwise(0))
        .cast("long")
        .alias("n_alarms"),
    )


CATALOG["evt_cusum_drift_per_user"].fn = _dcusum

register(
    "ml_bootstrap_mean_se",
    # uncertainty quantification at scale: the Poisson bootstrap
    # (each row enters replicate b with weight ~ Poisson(1), decided
    # by the row's hash — the streamable bootstrap, no resampled
    # copies of the data) over 32 deterministic replicates gives the
    # standard error and a 95% CI of mean order value. Replicate
    # means go to integer micro-dollars so the across-replicate
    # moments are exact.
    oracle=f"""
    WITH x AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    full_m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS mean_revenue
      FROM x
    ),
    r AS (
      SELECT b.b, x.cents,
             {_HASH01_SQL.format(key="CAST(o_orderkey AS VARCHAR) || 'boot' || CAST(b AS VARCHAR)")} AS u
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
      SELECT b, CAST(SUM(w) AS BIGINT) AS nw,
             CAST(SUM(CAST(w AS HUGEINT) * cents) AS BIGINT) AS swc
      FROM w GROUP BY b
    ),
    mb AS (
      SELECT CAST(FLOOR(CAST(swc AS DOUBLE) / NULLIF(nw, 0) / 100.0 * 1000000 + 0.5)
                  AS BIGINT) AS m
      FROM rep
    ),
    se AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
             round(sqrt((CAST(COUNT(*) AS DOUBLE)
                         * CAST(SUM(CAST(m AS HUGEINT) * m) AS DOUBLE)
                         - CAST(SUM(m) AS DOUBLE) * SUM(m))
                        / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)))
                   / 1000000, 6) AS boot_se
      FROM mb
    )
    SELECT f.n_orders, f.mean_revenue, s.n_replicates, s.boot_se,
           round(f.mean_revenue - 1.96 * s.boot_se, 6) AS ci_lo,
           round(f.mean_revenue + 1.96 * s.boot_se, 6) AS ci_hi
    FROM full_m f, se s
    """,
)


def _dbootstrap(spark, sf_dir):
    """Poisson bootstrap SE of mean order value: a 32-way replicate
    explode (map-side — no resampled data copies ever materialize),
    per-row weights from the engine-wide sha2 uniform draw mapped
    through the Poisson(1) CDF, one (replicate) aggregate, exact
    micro-dollar moments across the 32 replicate means, a 1x1 join of
    the SE row with the full-sample mean row. The streamable
    bootstrap — at 100 TB each row is touched once per replicate with
    no shuffle bigger than 32 rows after the first aggregate."""
    from ..ops.sampling import hash_uniform01

    o = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast(DEC) * 100).cast("long")
    x = o.select("o_orderkey", cents.alias("cents")).localCheckpoint(eager=False)
    full_m = x.agg(
        F.count("*").cast("long").alias("n_orders"),
        (F.sum("cents").cast("double") / F.count("*") / F.lit(100.0)).alias(
            "mean_revenue"
        ),
    )
    r = x.select(
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(32))).alias("b"),
        "o_orderkey",
    ).select(
        "b",
        "cents",
        hash_uniform01(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit("boot"),
                F.col("b").cast("string"),
            )
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
        F.sum("w").cast("long").alias("nw"),
        F.sum(F.col("w").cast("decimal(18,0)") * F.col("cents"))
        .cast("long")
        .alias("swc"),
    )
    mb = rep.select(
        F.floor(
            F.col("swc").cast("double")
            / F.nullif(F.col("nw"), F.lit(0))
            / F.lit(100.0)
            * 1000000
            + 0.5
        ).alias("m")
    )
    bd = F.count("*").cast("double")
    se = mb.agg(
        F.count("*").cast("long").alias("n_replicates"),
        F.round(
            F.sqrt(
                (
                    bd
                    * F.sum(F.col("m").cast("decimal(18,0)") * F.col("m").cast("decimal(18,0)")).cast("double")
                    - F.sum("m").cast("double") * F.sum("m")
                )
                / (bd * (F.count("*") - 1))
            )
            / F.lit(1000000),
            6,
        ).alias("boot_se"),
    )
    return full_m.crossJoin(F.broadcast(se)).select(
        "n_orders",
        "mean_revenue",
        "n_replicates",
        "boot_se",
        F.round(F.col("mean_revenue") - 1.96 * F.col("boot_se"), 6).alias("ci_lo"),
        F.round(F.col("mean_revenue") + 1.96 * F.col("boot_se"), 6).alias("ci_hi"),
    )


CATALOG["ml_bootstrap_mean_se"].fn = _dbootstrap

register(
    "evt_conversion_attribution",
    # multi-touch attribution inside gap sessions: every purchase
    # credits its preceding same-session touches — last-touch counts
    # AND linear (1/k split across distinct preceding touch types,
    # in exact micro-credit integers so the totals are
    # order-independent). The session join is (user, session)-keyed;
    # the pair space is bounded by session sizes, like baskets.
    oracle=f"""
    WITH {_sess_cte(", event_type")},
    conv AS (
      SELECT user_id, session_id, ts, event_id
      FROM sess WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT c.user_id, c.session_id, c.event_id AS conv_id,
             t.event_type AS touch_type, t.ts AS tts, t.event_id AS tid
      FROM conv c
      JOIN sess t ON t.user_id = c.user_id AND t.session_id = c.session_id
      WHERE t.event_type <> 'purchase'
        AND (t.ts < c.ts OR (t.ts = c.ts AND t.event_id < c.event_id))
    ),
    dist AS (
      SELECT DISTINCT user_id, conv_id, touch_type FROM touch
    ),
    k AS (
      SELECT user_id, conv_id, CAST(COUNT(*) AS BIGINT) AS k
      FROM dist GROUP BY user_id, conv_id
    ),
    -- last touch is the EVENT-level latest (ts, event_id) — never
    -- independent per-type maxes, which can pair a ts from one event
    -- with an id from another
    lastev AS (
      SELECT user_id, conv_id, touch_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, conv_id
                                ORDER BY tts DESC, tid DESC) AS rn
      FROM touch
    ),
    lt AS (
      SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS last_touch_conversions
      FROM lastev WHERE rn = 1 GROUP BY touch_type
    ),
    cr AS (
      SELECT d.touch_type,
             round(CAST(SUM(CAST(FLOOR(1000000.0 / k.k + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1000000, 6) AS linear_credit
      FROM dist d
      JOIN k ON k.user_id = d.user_id AND k.conv_id = d.conv_id
      GROUP BY d.touch_type
    )
    SELECT cr.touch_type,
           CAST(COALESCE(lt.last_touch_conversions, 0) AS BIGINT)
             AS last_touch_conversions,
           cr.linear_credit
    FROM cr LEFT JOIN lt ON lt.touch_type = cr.touch_type
    """,
)


def _dattribution(spark, sf_dir):
    """Conversion attribution: the engine-wide sessionization, a
    (user, session)-keyed join of purchases onto their session's
    earlier touches, per-conversion distinct touch rollup, then
    last-touch (rank window over the bounded per-conversion frame)
    and linear credits as exact micro-credit sums."""
    e = t(spark, sf_dir, "events")
    sess = _gap_sessions(e, "event_type").localCheckpoint(
        eager=False
    )  # feeds both join sides
    conv = sess.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "session_id",
        F.col("ts").alias("cts"),
        F.col("event_id").alias("conv_id"),
    )
    tch = sess.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "session_id",
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
    )
    touch = conv.join(tch, ["user_id", "session_id"]).filter(
        (F.col("tts") < F.col("cts"))
        | ((F.col("tts") == F.col("cts")) & (F.col("tid") < F.col("conv_id")))
    )
    touch = touch.localCheckpoint(eager=False)  # feeds dist + the last-touch rank
    dist = (
        touch.select("user_id", "conv_id", "touch_type")
        .distinct()
        .localCheckpoint(eager=False)  # feeds k and the credit rollup
    )
    kf = dist.groupBy("user_id", "conv_id").agg(
        F.count("*").cast("long").alias("k")
    )
    wl = Window.partitionBy("user_id", "conv_id").orderBy(
        F.desc("tts"), F.desc("tid")
    )
    lt = (
        touch.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .groupBy("touch_type")
        .agg(F.count("*").cast("long").alias("last_touch_conversions"))
    )
    cr = (
        dist.join(kf, ["user_id", "conv_id"])
        .groupBy("touch_type")
        .agg(
            F.round(
                F.sum(
                    F.floor(F.lit(1000000.0) / F.col("k") + 0.5).cast("long")
                ).cast("double")
                / F.lit(1000000),
                6,
            ).alias("linear_credit"),
        )
    )
    return cr.join(lt, "touch_type", "left").select(
        "touch_type",
        F.coalesce(F.col("last_touch_conversions"), F.lit(0))
        .cast("long")
        .alias("last_touch_conversions"),
        "linear_credit",
    )


CATALOG["evt_conversion_attribution"].fn = _dattribution


def _mmr_oracle(k: int = 5, lam: str = "0.7", mu: str = "0.3") -> str:
    """Unrolled greedy Maximal-Marginal-Relevance re-ranking: top-16
    candidates by rounded cosine, then k rounds of
    argmax(lam*rel - mu*max_sim_to_selected) with vec_id ties —
    fully deterministic because every score input is a rounded-6
    double and the argmax is an ORDER BY ... LIMIT 1."""
    ctes, rows = [], [
        f"SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel AS relevance,"
        f" round({lam} * rel, 6) AS mmr_score FROM s1"
    ]
    for r in range(2, k + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, r)
        )
        ctes.append(f""",
    u{r} AS ({prev_union}),
    ms{r} AS (
      SELECT c.vec_id, c.rel, MAX(pw.sim) AS msim
      FROM cand c
      JOIN pw ON pw.va = c.vec_id
      JOIN u{r} u ON u.vec_id = pw.vb
      WHERE c.vec_id NOT IN (SELECT vec_id FROM u{r})
      GROUP BY c.vec_id, c.rel
    ),
    s{r} AS (
      SELECT vec_id, rel, msim FROM ms{r}
      ORDER BY {lam} * rel - {mu} * msim DESC, vec_id LIMIT 1
    )""")
        rows.append(
            f"SELECT CAST({r} AS BIGINT), vec_id, rel,"
            f" round({lam} * rel - {mu} * msim, 6) FROM s{r}"
        )
    return f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    cand AS MATERIALIZED (
      -- the query vector itself is excluded: without the filter the
      -- retrieval's rank 1 is always the query document (rel = 1.0)
      -- and every later redundancy penalty against it degenerates
      SELECT e.vec_id,
             round({_DOT_SQL} / (SQRT({_NORM_SQL_E}) * SQRT({_NORM_SQL_Q})), 6) AS rel
      FROM embeddings e, q
      WHERE e.vec_id <> 0
      ORDER BY rel DESC, e.vec_id LIMIT 16
    ),
    cv AS MATERIALIZED (
      SELECT c.vec_id, c.rel, e.embedding, {_EN_NORM_SQL} AS n
      FROM cand c JOIN embeddings e USING (vec_id)
    ),
    pw AS MATERIALIZED (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             {_cos6_sql('a.embedding', 'b.embedding', 'a.n', 'b.n')} AS sim
      FROM cv a JOIN cv b ON a.vec_id <> b.vec_id
    ),
    s1 AS (SELECT vec_id, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1){"".join(ctes)}
    {" UNION ALL ".join(rows)}
    """


register("sim_mmr_diverse_topk", oracle=_mmr_oracle())


def _dmmr(spark, sf_dir):
    """MMR diversity re-ranking (the RAG retrieval step after ANN):
    brute-force top-16 candidates, a 16x16 rounded pairwise-cosine
    table, then 5 greedy rounds of lam*relevance - mu*redundancy —
    each round a left-anti + max-sim aggregate + TakeOrdered(1) over
    frames of at most 16 rows (bounded model-frame convention). At
    100 TB only the candidate generation touches the corpus; the
    re-rank runs on broadcast-sized frames."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).agg(F.first("embedding").alias("qv"))
    cand = (
        e.filter(F.col("vec_id") != 0)  # never retrieve the query itself
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.round(similarity.cosine(F.col("embedding"), F.col("qv")), 6).alias(
                "rel"
            ),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(16)
        .localCheckpoint(eager=False)
    )
    a = cand.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = cand.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pw = (
        a.join(b, F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            F.round(similarity.cosine(F.col("ea"), F.col("eb")), 6).alias("sim"),
        )
        .localCheckpoint(eager=False)
    )
    cand_slim = cand.select("vec_id", "rel")
    s1 = cand_slim.orderBy(F.desc("rel"), "vec_id").limit(1)
    out = [
        s1.select(
            F.lit(1).cast("long").alias("rank"),
            "vec_id",
            F.col("rel").alias("relevance"),
            F.round(F.lit(0.7) * F.col("rel"), 6).alias("mmr_score"),
        )
    ]
    picked = s1.select("vec_id").localCheckpoint(eager=False)
    for r in range(2, 6):
        rem = cand_slim.join(picked, "vec_id", "left_anti")
        ms = (
            rem.join(pw, rem.vec_id == pw.va)
            .join(picked.withColumnRenamed("vec_id", "vb"), "vb")
            .groupBy(rem.vec_id, "rel")
            .agg(F.max("sim").alias("msim"))
        )
        sr = ms.orderBy(
            F.desc(F.lit(0.7) * F.col("rel") - F.lit(0.3) * F.col("msim")), "vec_id"
        ).limit(1).localCheckpoint(eager=False)
        out.append(
            sr.select(
                F.lit(r).cast("long").alias("rank"),
                "vec_id",
                F.col("rel").alias("relevance"),
                F.round(
                    F.lit(0.7) * F.col("rel") - F.lit(0.3) * F.col("msim"), 6
                ).alias("mmr_score"),
            )
        )
        picked = picked.unionByName(sr.select("vec_id")).localCheckpoint(eager=False)
    res = out[0]
    for s in out[1:]:
        res = res.unionByName(s)
    return res


CATALOG["sim_mmr_diverse_topk"].fn = _dmmr


