"""Split from queries.py lines 21210-21561 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, register, t
from .q10_coverage_misc import _q6

# ===========================================================================
# round-9 robust-ML family: isotonic calibration, Huber IRLS regression
# ===========================================================================

register(
    "ml_isotonic_urgent_rate",
    # isotonic (PAVA) calibration without the sequential pooling loop:
    # over 10 price-decile bins, the isotonic fit of the urgent-order
    # rate is the max-min formula iso(i) = max_{j<=i} min_{k>=i}
    # mean(y[j..k]) — with 10 bins the range means live in a 55-row
    # triangular frame from integer prefix sums, so the whole fit is
    # exact relational algebra (each mean is one BIGINT/BIGINT
    # division) and provably monotone.
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    e AS (
      SELECT quantile_cont(cents, 0.1) AS e1, quantile_cont(cents, 0.2) AS e2,
             quantile_cont(cents, 0.3) AS e3, quantile_cont(cents, 0.4) AS e4,
             quantile_cont(cents, 0.5) AS e5, quantile_cont(cents, 0.6) AS e6,
             quantile_cont(cents, 0.7) AS e7, quantile_cont(cents, 0.8) AS e8,
             quantile_cont(cents, 0.9) AS e9
      FROM x
    ),
    b AS (
      SELECT CAST(1 + (cents > e1)::INT + (cents > e2)::INT + (cents > e3)::INT
                 + (cents > e4)::INT + (cents > e5)::INT + (cents > e6)::INT
                 + (cents > e7)::INT + (cents > e8)::INT + (cents > e9)::INT
                 AS BIGINT) AS bin,
             y
      FROM x CROSS JOIN e
    ),
    g AS MATERIALIZED (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s
      FROM b GROUP BY bin
    ),
    p AS MATERIALIZED (
      SELECT g1.bin, CAST(SUM(g2.n) AS BIGINT) AS cp, CAST(SUM(g2.s) AS BIGINT) AS sp
      FROM g g1 JOIN g g2 ON g2.bin <= g1.bin GROUP BY g1.bin
    ),
    p0 AS (
      SELECT bin, cp, sp FROM p
      UNION ALL SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    ),
    rg AS (
      SELECT pj.bin + 1 AS j, pk.bin AS k,
             CAST(pk.sp - pj.sp AS DOUBLE) / (pk.cp - pj.cp) AS m
      FROM p0 pj JOIN p pk ON pk.bin > pj.bin
    ),
    mm AS (
      SELECT g.bin, rg.j, MIN(rg.m) AS mn
      FROM g JOIN rg ON rg.j <= g.bin AND rg.k >= g.bin
      GROUP BY g.bin, rg.j
    ),
    iso AS (SELECT bin, MAX(mn) AS iso FROM mm GROUP BY bin)
    SELECT g.bin AS bin_id, g.n AS n_orders,
           round(CAST(g.s AS DOUBLE) / g.n, 6) AS urgent_rate_raw,
           round(iso.iso, 6) AS urgent_rate_iso
    FROM g JOIN iso USING (bin) ORDER BY bin_id
    """,
)


def _disotonic(spark, sf_dir):
    """Isotonic calibration via the max-min identity: the corpus-scale
    work is one decile-edge aggregate and one 10-bin grouped count;
    everything after (prefix sums, the 55 range means, the max-min
    reduction) happens in bin-count-sized frames — PAVA's sequential
    pool-adjacent loop replaced by a closed form that distributes."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
    ).localCheckpoint(eager=False)
    e = x.agg(
        *[
            F.percentile("cents", F.lit(q / 10.0)).alias(f"e{q}")
            for q in range(1, 10)
        ]
    )
    binc = F.lit(1)
    for q in range(1, 10):
        binc = binc + F.when(F.col("cents") > F.col(f"e{q}"), 1).otherwise(0)
    b = x.crossJoin(F.broadcast(e)).select(binc.cast("long").alias("bin"), "y")
    g = (
        b.groupBy("bin")
        .agg(F.count("*").cast("long").alias("n"), F.sum("y").cast("long").alias("s"))
        .localCheckpoint(eager=False)
    )
    g2 = g.select(
        F.col("bin").alias("bin2"), F.col("n").alias("n2"), F.col("s").alias("s2")
    )
    p = (
        g.join(F.broadcast(g2), F.col("bin2") <= F.col("bin"))
        .groupBy("bin")
        .agg(F.sum("n2").cast("long").alias("cp"), F.sum("s2").cast("long").alias("sp"))
        .localCheckpoint(eager=False)
    )
    zero = spark.createDataFrame([(0, 0, 0)], "bin long, cp long, sp long")
    p0 = p.unionByName(zero).select(
        F.col("bin").alias("binj"), F.col("cp").alias("cpj"), F.col("sp").alias("spj")
    )
    pk = p.select(
        F.col("bin").alias("bink"), F.col("cp").alias("cpk"), F.col("sp").alias("spk")
    )
    rg = p0.join(F.broadcast(pk), F.col("bink") > F.col("binj")).select(
        (F.col("binj") + 1).alias("j"),
        F.col("bink").alias("k"),
        (
            (F.col("spk") - F.col("spj")).cast("double")
            / (F.col("cpk") - F.col("cpj"))
        ).alias("m"),
    )
    mm = (
        g.select("bin")
        .join(F.broadcast(rg), (F.col("j") <= F.col("bin")) & (F.col("k") >= F.col("bin")))
        .groupBy("bin", "j")
        .agg(F.min("m").alias("mn"))
    )
    iso = mm.groupBy("bin").agg(F.max("mn").alias("iso"))
    return (
        g.join(iso, "bin")
        .select(
            F.col("bin").alias("bin_id"),
            F.col("n").alias("n_orders"),
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias("urgent_rate_raw"),
            F.round(F.col("iso"), 6).alias("urgent_rate_iso"),
        )
        .orderBy("bin_id")
    )


CATALOG["ml_isotonic_urgent_rate"].fn = _disotonic

# Huber tuning constant in micro-cents: residuals within $20k keep full
# weight, beyond it w = delta/|e| (the median |OLS residual| on this
# data is ~$26k, so the split is genuinely mixed).
_HUBER_D6 = 2_000_000 * 1_000_000

register(
    "ml_irls_huber_price_qty",
    # robust regression as unrolled IRLS: two Huber reweighted
    # least-squares rounds on extendedprice-vs-quantity, starting from
    # the OLS fit. All sums are exact (BIGINT for the unweighted pass;
    # per-row BIGINT products summed in HUGEINT for the weighted
    # passes, cast to DOUBLE once), the inter-round parameters quantize
    # to integer micro-cents (the Brown-EWMA convention), and weights
    # quantize to integer micro-units — so both engines walk the exact
    # same parameter trajectory.
    oracle=f"""
    WITH x AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS xq,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
      FROM lineitem
    ),
    s0 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(xq) AS BIGINT) AS sx,
             CAST(SUM(yc) AS BIGINT) AS sy, CAST(SUM(xq * yc) AS BIGINT) AS sxy,
             CAST(SUM(xq * xq) AS BIGINT) AS sxx
      FROM x
    ),
    p0 AS (
      SELECT n, CAST(floor(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
                                 6) * 1000000 + 0.5) AS BIGINT) AS b6,
             sx, sy
      FROM s0
    ),
    p0a AS (
      SELECT b6, CAST(floor(round((CAST(sy AS DOUBLE) - b6 * CAST(sx AS DOUBLE) / 1000000.0)
                                  / n, 6) * 1000000 + 0.5) AS BIGINT) AS a6
      FROM p0
    ),
    w1 AS (
      SELECT xq, yc,
             CASE WHEN ABS(yc * 1000000 - (a6 + b6 * xq)) <= {_HUBER_D6}
                  THEN CAST(1000000 AS BIGINT)
                  ELSE CAST(floor(round({_HUBER_D6}.0
                                        / ABS(yc * 1000000 - (a6 + b6 * xq)), 6)
                                  * 1000000 + 0.5) AS BIGINT)
             END AS w6
      FROM x CROSS JOIN p0a
    ),
    s1 AS (
      SELECT CAST(SUM(w6) AS BIGINT) AS sw, CAST(SUM(w6 * xq) AS BIGINT) AS swx,
             CAST(SUM(CAST(w6 * yc AS HUGEINT)) AS DOUBLE) AS swy,
             CAST(SUM(CAST(w6 * xq * yc AS HUGEINT)) AS DOUBLE) AS swxy,
             CAST(SUM(CAST(w6 * xq * xq AS HUGEINT)) AS DOUBLE) AS swxx
      FROM w1
    ),
    p1 AS (
      SELECT sw, swx,
             CAST(floor(round((CAST(sw AS DOUBLE) * swxy - CAST(swx AS DOUBLE) * swy)
                              / (CAST(sw AS DOUBLE) * swxx - CAST(swx AS DOUBLE) * swx),
                              6) * 1000000 + 0.5) AS BIGINT) AS b6,
             swy
      FROM s1
    ),
    p1a AS (
      SELECT b6, CAST(floor(round((swy - b6 * CAST(swx AS DOUBLE) / 1000000.0)
                                  / sw * 1000000.0 / 1000000.0, 6) * 1000000 + 0.5)
                      AS BIGINT) AS a6
      FROM p1
    ),
    w2 AS (
      SELECT xq, yc,
             CASE WHEN ABS(yc * 1000000 - (a6 + b6 * xq)) <= {_HUBER_D6}
                  THEN CAST(1000000 AS BIGINT)
                  ELSE CAST(floor(round({_HUBER_D6}.0
                                        / ABS(yc * 1000000 - (a6 + b6 * xq)), 6)
                                  * 1000000 + 0.5) AS BIGINT)
             END AS w6
      FROM x CROSS JOIN p1a
    ),
    s2 AS (
      SELECT CAST(SUM(w6) AS BIGINT) AS sw, CAST(SUM(w6 * xq) AS BIGINT) AS swx,
             CAST(SUM(CAST(w6 * yc AS HUGEINT)) AS DOUBLE) AS swy,
             CAST(SUM(CAST(w6 * xq * yc AS HUGEINT)) AS DOUBLE) AS swxy,
             CAST(SUM(CAST(w6 * xq * xq AS HUGEINT)) AS DOUBLE) AS swxx,
             CAST(SUM(CASE WHEN w6 < 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_dw,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM w2
    ),
    p2 AS (
      SELECT n, n_dw, sw,
             CAST(floor(round((CAST(sw AS DOUBLE) * swxy - CAST(swx AS DOUBLE) * swy)
                              / (CAST(sw AS DOUBLE) * swxx - CAST(swx AS DOUBLE) * swx),
                              6) * 1000000 + 0.5) AS BIGINT) AS b6,
             swx, swy
      FROM s2
    ),
    p2a AS (
      SELECT n, n_dw, sw, b6,
             CAST(floor(round((swy - b6 * CAST(swx AS DOUBLE) / 1000000.0)
                              / sw * 1000000.0 / 1000000.0, 6) * 1000000 + 0.5)
                  AS BIGINT) AS a6
      FROM p2
    )
    SELECT p2a.n AS n_rows,
           round(p0a.a6 / 1000000.0, 6) AS a_ols,
           round(p0a.b6 / 1000000.0, 6) AS b_ols,
           round(p2a.a6 / 1000000.0, 6) AS a_huber,
           round(p2a.b6 / 1000000.0, 6) AS b_huber,
           p2a.n_dw AS n_downweighted,
           p2a.sw AS w_mass6
    FROM p2a CROSS JOIN p0a
    """,
)


def _dirlshuber(spark, sf_dir):
    """Huber IRLS in two unrolled rounds: each round is one weighted-
    sums aggregate over the (cached) integer feature frame plus a 1-row
    parameter broadcast — constant plan depth, no per-round corpus
    rewrite, exactly the Lloyd-rounds discipline applied to robust
    regression. Weighted sums use per-row BIGINT products summed in
    decimal(38,0) (the HUGEINT twin), cast to double once."""
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("long").alias("xq"),
        (F.col("l_extendedprice").cast(DEC) * 100).cast("long").alias("yc"),
    ).localCheckpoint(eager=False)

    def _q6(col):
        return F.floor(F.round(col, 6) * 1e6 + 0.5).cast("long")

    s0 = x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yc")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
    )
    slope0 = (
        F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    p0 = s0.select("n", "sx", "sy", _q6(slope0).alias("b6"))
    p0a = p0.select(
        "b6",
        _q6(
            (F.col("sy").cast("double") - F.col("b6") * F.col("sx").cast("double") / 1e6)
            / F.col("n")
        ).alias("a6"),
    ).localCheckpoint(eager=False)

    def _weights(params):
        e6 = F.abs(F.col("yc") * F.lit(1000000) - (F.col("a6") + F.col("b6") * F.col("xq")))
        w6 = F.when(e6 <= F.lit(_HUBER_D6), F.lit(1000000).cast("long")).otherwise(
            _q6(F.lit(float(_HUBER_D6)) / e6)
        )
        return x.crossJoin(F.broadcast(params)).select("xq", "yc", w6.alias("w6"))

    def _wsums(w, extra=False):
        aggs = [
            F.sum("w6").cast("long").alias("sw"),
            F.sum(F.col("w6") * F.col("xq")).cast("long").alias("swx"),
            F.sum((F.col("w6") * F.col("yc")).cast("decimal(38,0)"))
            .cast("double")
            .alias("swy"),
            F.sum((F.col("w6") * F.col("xq") * F.col("yc")).cast("decimal(38,0)"))
            .cast("double")
            .alias("swxy"),
            F.sum((F.col("w6") * F.col("xq") * F.col("xq")).cast("decimal(38,0)"))
            .cast("double")
            .alias("swxx"),
        ]
        if extra:
            aggs += [
                F.sum(F.when(F.col("w6") < 1000000, 1).otherwise(0))
                .cast("long")
                .alias("n_dw"),
                F.count("*").cast("long").alias("n"),
            ]
        return w.agg(*aggs)

    slope_w = (
        F.col("sw").cast("double") * F.col("swxy") - F.col("swx").cast("double") * F.col("swy")
    ) / (
        F.col("sw").cast("double") * F.col("swxx") - F.col("swx").cast("double") * F.col("swx")
    )
    a_w = _q6(
        (F.col("swy") - F.col("b6") * F.col("swx").cast("double") / 1e6)
        / F.col("sw")
        * 1e6
        / 1e6
    ).alias("a6")

    s1 = _wsums(_weights(p0a))
    p1 = s1.select("sw", "swx", "swy", _q6(slope_w).alias("b6"))
    p1a = p1.select("b6", a_w).localCheckpoint(eager=False)
    s2 = _wsums(_weights(p1a), extra=True)
    p2 = s2.select("n", "n_dw", "sw", "swx", "swy", _q6(slope_w).alias("b6"))
    p2a = p2.select("n", "n_dw", "sw", "b6", a_w)
    return p2a.crossJoin(F.broadcast(p0a.withColumnsRenamed({"a6": "a06", "b6": "b06"}))).select(
        F.col("n").alias("n_rows"),
        F.round(F.col("a06") / 1e6, 6).alias("a_ols"),
        F.round(F.col("b06") / 1e6, 6).alias("b_ols"),
        F.round(F.col("a6") / 1e6, 6).alias("a_huber"),
        F.round(F.col("b6") / 1e6, 6).alias("b_huber"),
        F.col("n_dw").alias("n_downweighted"),
        F.col("sw").alias("w_mass6"),
    )


CATALOG["ml_irls_huber_price_qty"].fn = _dirlshuber


