"""Round-14 wave 6: survey sampling & estimation — Kish effective
sample size of the revenue-weighted customer panel, a stratified
Horvitz-Thompson total off the deterministic sha2 sample, Neyman
(optimal) allocation across order-priority strata, the
post-stratified mean estimator, and the cluster-sampling design
effect (one-way ANOVA ICC over customer clusters).

These are the estimators a data-curation pipeline uses to weigh,
subsample and extrapolate: every sample membership is the repo's
deterministic sha2 uniform draw (stable under re-partitioning, the
ops/sampling contract), every moment is an exact DECIMAL(18,2) sum,
and stddev/variance follow the house recipe (recompute from exact
sums, square in double once).  Per-stratum/cluster rational terms
quantize to integer micro units before cross-row sums — with a plain
floor(x*scale + 0.5), NOT round(x, 6)*scale: for O(1e4)-magnitude x
the engines' round() implementations disagree in the last ulp, while
floor of the identical deterministic product is bit-stable.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from ..ops.sampling import hash_uniform01

_HASH01_SQL = (
    "('0x' || substr(sha256(CAST({key} AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0"
)


register(
    "cust_kish_ess_revenue_weights",
    # Kish effective sample size of the customer panel weighted by
    # order revenue: ESS = (sum w)^2 / sum w^2, weight design effect
    # deff_w = n * sum w^2 / (sum w)^2.  Per-customer revenue is an
    # exact decimal; the squares are one double each.
    oracle="""
    WITH w AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS wc
      FROM orders GROUP BY o_custkey
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(wc) AS HUGEINT) AS swc,
             SUM(CAST(wc AS HUGEINT) * wc) AS swc2
      FROM w
    )
    SELECT n AS n_customers,
           round(CAST(swc AS DOUBLE) / 100 / n, 6) AS mean_weight,
           round((CAST(swc AS DOUBLE) / 100) * (CAST(swc AS DOUBLE) / 100)
                 / (CAST(swc2 AS DOUBLE) / 10000), 6) AS kish_ess,
           round(n * (CAST(swc2 AS DOUBLE) / 10000)
                 / ((CAST(swc AS DOUBLE) / 100) * (CAST(swc AS DOUBLE) / 100)), 6)
             AS deff_weights
    FROM agg
    """,
)


def _dkish(spark, sf_dir):
    """Kish ESS — exact decimal weights, one-row assembly.

    The only subtlety is summation order of the double w*w terms:
    per-customer w is exact (a decimal cast to double), and sw/sw2 ride
    Spark's float sum vs DuckDB's — both sum the identical multiset of
    doubles, but in different orders.  To stay hash-exact the weights
    are kept in cents (BIGINT) and squared into DECIMAL, so both sums
    are order-free integers."""
    o = t(spark, sf_dir, "orders")
    w = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast(DEC)) * 100).cast("long").alias("wc")
    )
    agg = w.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("wc").cast("decimal(38,0)").alias("swc"),
        F.sum(F.col("wc").cast("decimal(38,0)") * F.col("wc")).alias("swc2"),
    )
    swd = F.col("swc").cast("double") / 100
    sw2d = F.col("swc2").cast("double") / 10000
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(swd / F.col("n"), 6).alias("mean_weight"),
        F.round(swd * swd / sw2d, 6).alias("kish_ess"),
        F.round(F.col("n") * sw2d / (swd * swd), 6).alias("deff_weights"),
    )


CATALOG["cust_kish_ess_revenue_weights"].fn = _dkish


register(
    "ml_horvitz_thompson_total",
    # Stratified Horvitz-Thompson estimate of total order revenue from
    # the deterministic sha2 sample with status-dependent inclusion
    # probabilities (O: 1/10, F: 1/5, P: 1/2).  The reciprocals are
    # integers, so HT = sum(tp * {10,5,2}) is an exact decimal; the
    # report compares against the exact census total.
    oracle=f"""
    WITH ht AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CASE o_orderstatus WHEN 'O' THEN 10
                                           WHEN 'F' THEN 5 ELSE 2 END)
                  AS DOUBLE) AS est,
             CAST(COUNT(*) AS BIGINT) AS n_sampled
      FROM orders
      WHERE {_HASH01_SQL.format(key="o_orderkey")}
            < CASE o_orderstatus WHEN 'O' THEN 0.1
                                 WHEN 'F' THEN 0.2 ELSE 0.5 END
    ),
    tot AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS truth,
             CAST(COUNT(*) AS BIGINT) AS n_total
      FROM orders
    )
    SELECT n_sampled, n_total,
           round(est, 2) AS ht_estimate,
           round(truth, 2) AS census_total,
           round((est - truth) / truth, 6) AS rel_error
    FROM ht CROSS JOIN tot
    """,
)


def _dht(spark, sf_dir):
    """Stratified HT total off the sha2 deterministic sample."""
    o = t(spark, sf_dir, "orders")
    pi = (
        F.when(F.col("o_orderstatus") == "O", F.lit(0.1))
        .when(F.col("o_orderstatus") == "F", F.lit(0.2))
        .otherwise(F.lit(0.5))
    )
    inv = (
        F.when(F.col("o_orderstatus") == "O", F.lit(10))
        .when(F.col("o_orderstatus") == "F", F.lit(5))
        .otherwise(F.lit(2))
    )
    ht = o.filter(hash_uniform01(F.col("o_orderkey")) < pi).agg(
        F.sum(F.col("o_totalprice").cast(DEC) * inv).cast("double").alias("est"),
        F.count("*").cast("long").alias("n_sampled"),
    )
    tot = o.agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("truth"),
        F.count("*").cast("long").alias("n_total"),
    )
    return ht.crossJoin(F.broadcast(tot)).select(
        "n_sampled",
        "n_total",
        F.round(F.col("est"), 2).alias("ht_estimate"),
        F.round(F.col("truth"), 2).alias("census_total"),
        F.round((F.col("est") - F.col("truth")) / F.col("truth"), 6).alias(
            "rel_error"
        ),
    )


CATALOG["ml_horvitz_thompson_total"].fn = _dht


register(
    "ml_neyman_allocation",
    # Neyman-optimal allocation of a 1000-unit sample across the
    # order-priority strata: n_h proportional to N_h * S_h with S_h
    # from exact decimal sums ((sumsq - sum^2/n)/(n-1), squared in
    # double once).  Reports each stratum's optimal share next to its
    # proportional (population) share.
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS stratum,
             CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sv2
      FROM orders GROUP BY 1
    ),
    sd AS (
      SELECT stratum, nh,
             sqrt((sv2 - sv * sv / nh) / (nh - 1)) AS sh
      FROM s
    ),
    tot AS (
      SELECT CAST(SUM(nh) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(nh * sh * 1000000 + 0.5) AS HUGEINT))
               AS DOUBLE) / 1e6 AS mass
      FROM sd
    )
    SELECT sd.stratum, sd.nh, round(sd.sh, 6) AS stddev_h,
           round(CAST(sd.nh AS DOUBLE) / tot.n, 6) AS proportional_share,
           round(sd.nh * sd.sh / tot.mass, 6) AS neyman_share,
           round(1000 * sd.nh * sd.sh / tot.mass, 6) AS neyman_n_of_1000
    FROM sd CROSS JOIN tot
    ORDER BY sd.stratum
    """,
)


def _dneyman(spark, sf_dir):
    """Neyman allocation — per-stratum exact moments, 1-row mass scalar."""
    o = t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast(DEC)
    s = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count("*").cast("long").alias("nh"),
        F.sum(dec).cast("double").alias("sv"),
        F.sum(dec * dec).cast("double").alias("sv2"),
    )
    sd = s.select(
        "stratum",
        "nh",
        F.sqrt(
            (F.col("sv2") - F.col("sv") * F.col("sv") / F.col("nh"))
            / (F.col("nh") - 1)
        ).alias("sh"),
    )
    tot = sd.agg(
        F.sum("nh").cast("long").alias("n"),
        (
            F.sum(
                F.floor(
                    F.col("nh") * F.col("sh") * F.lit(1000000) + F.lit(0.5)
                ).cast("decimal(38,0)")
            ).cast("double")
            / F.lit(1e6)
        ).alias("mass"),
    )
    return (
        sd.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "nh",
            F.round(F.col("sh"), 6).alias("stddev_h"),
            F.round(F.col("nh").cast("double") / F.col("n"), 6).alias(
                "proportional_share"
            ),
            F.round(F.col("nh") * F.col("sh") / F.col("mass"), 6).alias(
                "neyman_share"
            ),
            F.round(1000 * F.col("nh") * F.col("sh") / F.col("mass"), 6).alias(
                "neyman_n_of_1000"
            ),
        )
        .orderBy("stratum")
    )


CATALOG["ml_neyman_allocation"].fn = _dneyman


register(
    "ml_poststratification_estimate",
    # Post-stratified mean: the sha2 10% sample's per-stratum means,
    # reweighted by the TRUE stratum shares (order priority), vs the
    # raw sample mean and the census mean.  Stratum means are exact
    # decimals over integer counts; the reweighting is a 5-row join.
    oracle=f"""
    WITH smp AS (
      SELECT o_orderpriority AS stratum,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS svc
      FROM orders
      WHERE {_HASH01_SQL.format(key="o_orderkey")} < 0.1
      GROUP BY 1
    ),
    pop AS (
      SELECT o_orderpriority AS stratum, CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS tvc
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(nh) AS BIGINT) AS n,
             CAST(SUM(tvc) AS DOUBLE) / 100 AS tval
      FROM pop
    ),
    ps AS (
      SELECT CAST(SUM(CAST(floor(CAST(pop.nh AS DOUBLE) / tot.n
               * (CAST(smp.svc AS DOUBLE) / 100 / smp.m) * 1000000 + 0.5)
               AS HUGEINT)) AS DOUBLE) / 1e6 AS ps_mean,
             CAST(SUM(smp.svc) AS DOUBLE) / 100 AS ssv,
             CAST(SUM(smp.m) AS BIGINT) AS sm
      FROM pop JOIN smp USING (stratum) CROSS JOIN tot
    )
    SELECT round(ps.ps_mean, 6) AS poststrat_mean,
           round(ps.ssv / ps.sm, 6) AS raw_sample_mean,
           round(tot.tval / tot.n, 6) AS census_mean,
           round((ps.ps_mean - tot.tval / tot.n) / (tot.tval / tot.n), 6)
             AS ps_rel_error,
           round((ps.ssv / ps.sm - tot.tval / tot.n) / (tot.tval / tot.n), 6)
             AS raw_rel_error
    FROM ps CROSS JOIN tot
    """,
)


def _dpoststrat(spark, sf_dir):
    """Post-stratified mean off the deterministic 10% sample."""
    o = t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast(DEC)
    smp = (
        o.filter(hash_uniform01(F.col("o_orderkey")) < F.lit(0.1))
        .groupBy(F.col("o_orderpriority").alias("stratum"))
        .agg(
            F.count("*").cast("long").alias("m"),
            (F.sum(dec) * 100).cast("long").alias("svc"),
        )
    )
    pop = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count("*").cast("long").alias("nh"),
        (F.sum(dec) * 100).cast("long").alias("tvc"),
    )
    tot = pop.agg(
        F.sum("nh").cast("long").alias("n"),
        (F.sum("tvc").cast("double") / 100).alias("tval"),
    )
    ps = (
        pop.join(smp, "stratum")
        .crossJoin(F.broadcast(tot))
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("nh").cast("double")
                        / F.col("n")
                        * (F.col("svc").cast("double") / 100 / F.col("m"))
                        * F.lit(1000000)
                        + F.lit(0.5)
                    ).cast("decimal(38,0)")
                ).cast("double")
                / F.lit(1e6)
            ).alias("ps_mean"),
            (F.sum("svc").cast("double") / 100).alias("ssv"),
            F.sum("m").cast("long").alias("sm"),
        )
    )
    r = ps.crossJoin(F.broadcast(tot))
    cm = F.col("tval") / F.col("n")
    return r.select(
        F.round(F.col("ps_mean"), 6).alias("poststrat_mean"),
        F.round(F.col("ssv") / F.col("sm"), 6).alias("raw_sample_mean"),
        F.round(cm, 6).alias("census_mean"),
        F.round((F.col("ps_mean") - cm) / cm, 6).alias("ps_rel_error"),
        F.round((F.col("ssv") / F.col("sm") - cm) / cm, 6).alias("raw_rel_error"),
    )


CATALOG["ml_poststratification_estimate"].fn = _dpoststrat


register(
    "ml_cluster_deff_icc",
    # Cluster-sampling design effect over customer clusters: one-way
    # ANOVA on order totals grouped by customer gives MSB/MSW, the
    # ANOVA intraclass correlation ICC = (MSB - MSW) / (MSB + (m0-1)*
    # MSW) with m0 = (n - sum nh^2/n)/(k-1), and deff = 1 +
    # (nbar - 1) * ICC.  Per-cluster (q - s^2/n) terms are cents^2
    # rationals quantized to micro units before the cross-cluster sum.
    oracle="""
    WITH cl AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sc,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS qc
      FROM orders GROUP BY 1
    ),
    terms AS (
      SELECT nh, sc,
             CAST(floor((CAST(qc AS DOUBLE)
               - CAST(sc AS DOUBLE) * sc / nh) / 10000 * 10000 + 0.5)
               AS HUGEINT) AS ssw4,
             CAST(floor((CAST(sc AS DOUBLE) * sc / nh) / 10000
               * 10000 + 0.5) AS HUGEINT) AS sb4
      FROM cl
    ),
    agg AS (
      SELECT CAST(SUM(nh) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(sc) AS HUGEINT) AS st,
             CAST(SUM(CAST(nh AS HUGEINT) * nh) AS HUGEINT) AS snh2,
             SUM(ssw4) AS ssw4, SUM(sb4) AS sb4
      FROM terms
    ),
    ms AS (
      SELECT n, k,
             (CAST(sb4 AS DOUBLE) / 1e4
              - (CAST(st AS DOUBLE) / 100) * (CAST(st AS DOUBLE) / 100) / n)
               / (k - 1) AS msb,
             CAST(ssw4 AS DOUBLE) / 1e4 / (n - k) AS msw,
             (CAST(n AS DOUBLE) - CAST(snh2 AS DOUBLE) / n) / (k - 1) AS m0
      FROM agg
    )
    SELECT n AS n_orders, k AS n_clusters,
           -- O(1e10)-magnitude outputs: round(x, 6) diverges in the
           -- last ulp across engines; floor(x + 0.5) of the identical
           -- double is bit-stable (whole dollars^2)
           CAST(floor(msb + 0.5) AS BIGINT) AS ms_between,
           CAST(floor(msw + 0.5) AS BIGINT) AS ms_within,
           round(m0, 6) AS m0,
           round((msb - msw) / (msb + (m0 - 1) * msw), 9) AS icc,
           round(1 + (CAST(n AS DOUBLE) / k - 1)
                     * ((msb - msw) / (msb + (m0 - 1) * msw)), 6) AS deff
    FROM ms
    """,
)


def _dicc(spark, sf_dir):
    """Cluster ICC + design effect from exact cents moments."""
    o = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast(DEC) * 100).cast("long")
    cl = o.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("nh"),
        F.sum(cents).cast("long").alias("sc"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("qc"),
    )
    terms = cl.select(
        "nh",
        "sc",
        F.floor(
            (
                F.col("qc").cast("double")
                - F.col("sc").cast("double") * F.col("sc") / F.col("nh")
            )
            / 10000
            * F.lit(10000)
            + F.lit(0.5)
        )
        .cast("decimal(38,0)")
        .alias("ssw4"),
        F.floor(
            (F.col("sc").cast("double") * F.col("sc") / F.col("nh"))
            / 10000
            * F.lit(10000)
            + F.lit(0.5)
        )
        .cast("decimal(38,0)")
        .alias("sb4"),
    )
    agg = terms.agg(
        F.sum("nh").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
        F.sum("sc").cast("decimal(38,0)").alias("st"),
        F.sum(F.col("nh").cast("decimal(38,0)") * F.col("nh")).alias("snh2"),
        F.sum("ssw4").alias("ssw4"),
        F.sum("sb4").alias("sb4"),
    )
    nd = F.col("n").cast("double")
    msb = (
        F.col("sb4").cast("double") / F.lit(1e4)
        - (F.col("st").cast("double") / 100)
        * (F.col("st").cast("double") / 100)
        / F.col("n")
    ) / (F.col("k") - 1)
    msw = F.col("ssw4").cast("double") / F.lit(1e4) / (F.col("n") - F.col("k"))
    m0 = (nd - F.col("snh2").cast("double") / F.col("n")) / (F.col("k") - 1)
    icc = (msb - msw) / (msb + (m0 - 1) * msw)
    return agg.select(
        F.col("n").alias("n_orders"),
        F.col("k").alias("n_clusters"),
        F.floor(msb + F.lit(0.5)).cast("long").alias("ms_between"),
        F.floor(msw + F.lit(0.5)).cast("long").alias("ms_within"),
        F.round(m0, 6).alias("m0"),
        F.round(icc, 9).alias("icc"),
        F.round(1 + (nd / F.col("k") - 1) * icc, 6).alias("deff"),
    )


CATALOG["ml_cluster_deff_icc"].fn = _dicc
