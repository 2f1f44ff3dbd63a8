"""Round-15 wave 17 (post-close): multi-scale point-process statistics
of the event stream — Allan variance of counts at 1/2/4/8-hour bins,
the Fano-factor curve at 1/6/24-hour windows (rising F(T) = long-range
correlation), a discretized 1-D Ripley K at 1/2/5/10-minute radii
(pair counts via an OFFSET-EXPLODED equi-join on the bounded minute
histogram — never a range join), the Poisson thinning-invariance check
(deterministic sha2 p-thinning; CV^2 of inter-event gaps before vs
after — invariant iff Poisson), and order-3 permutation entropy of the
densified hourly series (time-index tie-breaks make the rank pattern a
pure integer CASE).

Exactness: every bin series is densified over the data-driven
24*n_days calendar so empty bins count as exact zeros; Allan/Fano/
Ripley/CV^2 are integer rationals until one closing division (moments
in decimal-38 where 10x sums can pass 9e18); the thinning filter is
the house sha2-first-8-hex idiom (hv < 2^31 is exactly u < 0.5);
permutation entropy uses the exact integer n*ln(n) micro-nat products.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# Shared second-epoch + day-anchored calendar scaffolding.
_BASE_CTE = """ev AS (
      SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
             event_id, user_id
      FROM events
    ),
    cal AS (
      SELECT CAST(epoch(date_trunc('day', MIN(ts))) AS BIGINT) AS t0,
             CAST(date_diff('day', date_trunc('day', MIN(ts)),
                            date_trunc('day', MAX(ts))) + 1 AS BIGINT) AS nd
      FROM events
    )"""


def _base(spark, sf_dir):
    """(sec, event_id, user_id) + the (t0, nd) day-anchored calendar."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
        "event_id",
        "user_id",
    ).localCheckpoint(eager=False)
    cal = ev.agg(
        F.unix_timestamp(F.date_trunc("day", F.min("ts")).cast("timestamp"))
        .cast("long")
        .alias("t0"),
        (
            F.datediff(
                F.date_trunc("day", F.max("ts")).cast("date"),
                F.date_trunc("day", F.min("ts")).cast("date"),
            )
            + 1
        )
        .cast("long")
        .alias("nd"),
    )
    return base, cal


register(
    "evt_allan_variance_hours",
    # Allan variance of event counts at tau = 1/2/4/8-hour bins over
    # the densified calendar: AVAR(tau) = mean((c_{i+1} - c_i)^2) / 2
    # — the drift-robust two-sample variance clock analysts use where
    # the plain variance confounds trend with noise.  Pure integer
    # squared-diff sums; empty bins are exact zeros.
    oracle=f"""
    WITH {_BASE_CTE},
    hb AS (
      SELECT (sec - t0) // 3600 AS h FROM ev CROSS JOIN cal
    ),
    hc AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM hb GROUP BY h),
    taus(tau) AS (VALUES (1), (2), (4), (8)),
    tb AS (
      SELECT t.tau, hc.h // t.tau AS b, CAST(SUM(hc.c) AS BIGINT) AS c
      FROM hc CROSS JOIN taus t GROUP BY 1, 2
    ),
    bins AS (
      SELECT taus.tau,
             unnest(generate_series(0, (cal.nd * 24) // taus.tau - 1)) AS b
      FROM taus CROSS JOIN cal
    ),
    dense AS (
      SELECT bins.tau, bins.b, COALESCE(tb.c, 0) AS c
      FROM bins LEFT JOIN tb ON tb.tau = bins.tau AND tb.b = bins.b
    ),
    diffs AS (
      SELECT tau, c,
             c - LAG(c) OVER (PARTITION BY tau ORDER BY b) AS d
      FROM dense
    ),
    agg AS (
      SELECT tau, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(d * d) AS BIGINT) AS ssd
      FROM diffs GROUP BY tau
    )
    SELECT tau AS tau_hours, k AS n_bins,
           round(CAST(n AS DOUBLE) / k, 9) AS mean_count,
           round(CAST(ssd AS DOUBLE) / (2 * (k - 1)), 9) AS allan_var,
           round(CAST(ssd AS DOUBLE) * k / (2 * (k - 1)) / n, 9)
             AS avar_over_mean
    FROM agg ORDER BY tau
    """,
)


def _dense_bins(spark, sf_dir, widths_hours):
    """Densified (tau, bin, count) frame at the given hour widths."""
    base, cal = _base(spark, sf_dir)
    taus = spark.createDataFrame([(w,) for w in widths_hours], "tau long")
    hb = base.crossJoin(F.broadcast(cal)).select(
        F.expr("(sec - t0) div 3600").alias("h")
    )
    hc = hb.groupBy("h").agg(F.count("*").cast("long").alias("c"))
    tb = (
        hc.crossJoin(F.broadcast(taus))
        .groupBy("tau", F.expr("h div tau").alias("b"))
        .agg(F.sum("c").cast("long").alias("c"))
    )
    bins = (
        taus.crossJoin(F.broadcast(cal))
        .select(
            "tau",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.expr("(nd * 24) div tau - 1"))
            ).alias("b"),
        )
    )
    return (
        bins.join(tb, ["tau", "b"], "left")
        .select("tau", "b", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )


def _dallan(spark, sf_dir):
    """Allan variance over densified multi-width hour bins."""
    dense = _dense_bins(spark, sf_dir, [1, 2, 4, 8])
    w = Window.partitionBy("tau").orderBy("b")
    diffs = dense.select(
        "tau", "c", (F.col("c") - F.lag("c").over(w)).alias("d")
    )
    agg = diffs.groupBy("tau").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("ssd"),
    )
    return agg.select(
        F.col("tau").alias("tau_hours"),
        F.col("k").alias("n_bins"),
        F.round(F.col("n").cast("double") / F.col("k"), 9).alias("mean_count"),
        F.round(F.col("ssd").cast("double") / (2 * (F.col("k") - 1)), 9).alias(
            "allan_var"
        ),
        F.round(
            F.col("ssd").cast("double") * F.col("k") / (2 * (F.col("k") - 1))
            / F.col("n"),
            9,
        ).alias("avar_over_mean"),
    ).orderBy("tau_hours")


CATALOG["evt_allan_variance_hours"].fn = _dallan


register(
    "evt_fano_factor_scales",
    # The Fano-factor curve F(T) = Var/Mean of counts in windows of
    # T = 1/6/24 hours over the densified calendar — flat at 1 for
    # Poisson, rising with T under long-range correlation.  Exact
    # integer rational: F = (k S2 - S^2) / ((k-1) S).
    oracle=f"""
    WITH {_BASE_CTE},
    hb AS (
      SELECT (sec - t0) // 3600 AS h FROM ev CROSS JOIN cal
    ),
    hc AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM hb GROUP BY h),
    taus(tau) AS (VALUES (1), (6), (24)),
    tb AS (
      SELECT t.tau, hc.h // t.tau AS b, CAST(SUM(hc.c) AS BIGINT) AS c
      FROM hc CROSS JOIN taus t GROUP BY 1, 2
    ),
    bins AS (
      SELECT taus.tau,
             unnest(generate_series(0, (cal.nd * 24) // taus.tau - 1)) AS b
      FROM taus CROSS JOIN cal
    ),
    dense AS (
      SELECT bins.tau, COALESCE(tb.c, 0) AS c
      FROM bins LEFT JOIN tb ON tb.tau = bins.tau AND tb.b = bins.b
    ),
    agg AS (
      SELECT tau, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS HUGEINT) AS s2
      FROM dense GROUP BY tau
    )
    SELECT tau AS window_hours, k AS n_bins,
           round(CAST(s AS DOUBLE) / k, 9) AS mean_count,
           round(CAST(k * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / (CAST(k AS DOUBLE) * (k - 1)), 9) AS var_count,
           round(CAST(k * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / (CAST(k - 1 AS DOUBLE) * s), 9) AS fano
    FROM agg ORDER BY tau
    """,
)


def _dfano(spark, sf_dir):
    """Fano factors over densified 1/6/24-hour windows."""
    d38 = "decimal(38,0)"
    dense = _dense_bins(spark, sf_dir, [1, 6, 24])
    agg = dense.groupBy("tau").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast(d38).alias("s2"),
    )
    num = (F.col("k") * F.col("s2") - F.col("s").cast(d38) * F.col("s")).cast(
        "double"
    )
    return agg.select(
        F.col("tau").alias("window_hours"),
        F.col("k").alias("n_bins"),
        F.round(F.col("s").cast("double") / F.col("k"), 9).alias("mean_count"),
        F.round(num / (F.col("k").cast("double") * (F.col("k") - 1)), 9).alias(
            "var_count"
        ),
        F.round(num / ((F.col("k") - 1).cast("double") * F.col("s")), 9).alias(
            "fano"
        ),
    ).orderBy("window_hours")


CATALOG["evt_fano_factor_scales"].fn = _dfano


register(
    "evt_ripley_k_minutes",
    # Discretized 1-D Ripley K at t = 1/2/5/10 minutes: ordered pairs
    # of events within t minute-bands, counted by exploding the
    # offset window -t..t into an EQUI-join on the bounded minute
    # histogram (<= 43200 bands x 21 offsets — no range join, no
    # pairwise scan).  K_hat = L P / (n(n-1)); the CSR ratio divides
    # by the discrete expectation (2t+1)/L.  Pure integers until the
    # closing divisions.
    oracle=f"""
    WITH {_BASE_CTE},
    mb AS (
      SELECT (sec - t0) // 60 AS m FROM ev CROSS JOIN cal
    ),
    h AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM mb GROUP BY m),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    taus(t) AS (VALUES (1), (2), (5), (10)),
    offs AS (
      SELECT t, unnest(generate_series(-t, t)) AS d FROM taus
    ),
    pairs AS (
      SELECT o.t, CAST(SUM(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) AS p_incl
      FROM h a CROSS JOIN offs o JOIN h b ON b.m = a.m + o.d
      GROUP BY o.t
    )
    SELECT pairs.t AS t_minutes,
           CAST(pairs.p_incl - n.n AS BIGINT) AS n_pairs,
           round(CAST(cal.nd * 1440 AS DOUBLE) * CAST(pairs.p_incl - n.n AS DOUBLE)
                 / (CAST(n.n AS DOUBLE) * (n.n - 1)), 9) AS k_hat,
           round(CAST(cal.nd * 1440 AS DOUBLE) * CAST(pairs.p_incl - n.n AS DOUBLE)
                 / (CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * pairs.t + 1)), 9)
             AS csr_ratio
    FROM pairs CROSS JOIN n CROSS JOIN cal ORDER BY pairs.t
    """,
)


def _dripley(spark, sf_dir):
    """Ripley K via offset-exploded equi-join on the minute histogram."""
    d38 = "decimal(38,0)"
    base, cal = _base(spark, sf_dir)
    mb = base.crossJoin(F.broadcast(cal)).select(
        F.expr("(sec - t0) div 60").alias("m")
    )
    h = mb.groupBy("m").agg(F.count("*").cast("long").alias("c")).localCheckpoint(
        eager=False
    )
    n = h.agg(F.sum("c").cast("long").alias("n"))
    taus = spark.createDataFrame([(x,) for x in (1, 2, 5, 10)], "t long")
    offs = taus.select(
        "t", F.explode(F.sequence(-F.col("t"), F.col("t"))).alias("d")
    )
    b = h.select(F.col("m").alias("mb2"), F.col("c").alias("cb"))
    pairs = (
        h.crossJoin(F.broadcast(offs))
        .join(b, F.col("mb2") == F.col("m") + F.col("d"))
        .groupBy("t")
        .agg(F.sum(F.col("c").cast(d38) * F.col("cb")).alias("p_incl"))
    )
    out = pairs.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(cal))
    p = (F.col("p_incl") - F.col("n")).cast("double")
    ll = (F.col("nd") * 1440).cast("double")
    nn = F.col("n").cast("double") * (F.col("n") - 1)
    return out.select(
        F.col("t").alias("t_minutes"),
        (F.col("p_incl") - F.col("n")).cast("long").alias("n_pairs"),
        F.round(ll * p / nn, 9).alias("k_hat"),
        F.round(ll * p / (nn * (2 * F.col("t") + 1)), 9).alias("csr_ratio"),
    ).orderBy("t_minutes")


CATALOG["evt_ripley_k_minutes"].fn = _dripley


register(
    "evt_thinning_invariance_cv2",
    # The Poisson thinning-invariance check: p-thin the stream with
    # the deterministic sha2 coin (first 8 hex of sha256(event_id ||
    # 'thin15') < 2^31 is exactly u < 0.5), recompute per-user
    # consecutive-gap CV^2 on the surviving events, and compare with
    # the full stream's CV^2 — a Poisson process is invariant under
    # independent thinning, so a moving ratio exposes clustering.
    # CV^2 = k (k S2 - S^2) / ((k-1) S^2) — exact integer rational
    # with S2 in 128-bit.
    oracle=f"""
    WITH {_BASE_CTE},
    g0 AS (
      SELECT sec - LAG(sec) OVER (PARTITION BY user_id
                                  ORDER BY sec, event_id) AS g
      FROM ev
    ),
    thin AS (
      SELECT user_id, sec, event_id FROM ev
      WHERE ('0x' || substr(sha256(CAST(event_id AS VARCHAR) || 'thin15'),
                            1, 8))::UBIGINT < 2147483648
    ),
    g1 AS (
      SELECT sec - LAG(sec) OVER (PARTITION BY user_id
                                  ORDER BY sec, event_id) AS g
      FROM thin
    ),
    m0 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(g) AS HUGEINT) AS s,
             CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS s2
      FROM g0 WHERE g IS NOT NULL
    ),
    m1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(g) AS HUGEINT) AS s,
             CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS s2
      FROM g1 WHERE g IS NOT NULL
    )
    SELECT m0.k AS n_gaps_full, m1.k AS n_gaps_thinned,
           round(CAST(m0.k * (m0.k * m0.s2 - m0.s * m0.s) AS DOUBLE)
                 / CAST((m0.k - 1) * m0.s * m0.s AS DOUBLE), 9) AS cv2_full,
           round(CAST(m1.k * (m1.k * m1.s2 - m1.s * m1.s) AS DOUBLE)
                 / CAST((m1.k - 1) * m1.s * m1.s AS DOUBLE), 9) AS cv2_thinned,
           round((CAST(m1.k * (m1.k * m1.s2 - m1.s * m1.s) AS DOUBLE)
                  / CAST((m1.k - 1) * m1.s * m1.s AS DOUBLE))
                 / (CAST(m0.k * (m0.k * m0.s2 - m0.s * m0.s) AS DOUBLE)
                    / CAST((m0.k - 1) * m0.s * m0.s AS DOUBLE)), 9)
             AS thinning_ratio
    FROM m0 CROSS JOIN m1
    """,
)


def _dthinning(spark, sf_dir):
    """CV^2 before/after deterministic sha2 p-thinning."""
    d38 = "decimal(38,0)"
    base, _cal = _base(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")

    def moments(df):
        g = df.select((F.col("sec") - F.lag("sec").over(w)).alias("g")).filter(
            F.col("g").isNotNull()
        )
        return g.agg(
            F.count("*").cast("long").alias("k"),
            F.sum("g").cast(d38).alias("s"),
            F.sum(F.col("g").cast(d38) * F.col("g")).alias("s2"),
        )

    hv = F.conv(
        F.substring(
            F.sha2(F.concat(F.col("event_id").cast("string"), F.lit("thin15")), 256),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    m0 = moments(base)
    m1 = moments(base.filter(hv < F.lit(2147483648)))

    def cv2(k, s, s2):
        return (k * (k * s2 - s * s)).cast("double") / (
            (k - 1) * s * s
        ).cast("double")

    m0r = m0.select(
        F.col("k").alias("k0"), F.col("s").alias("sa0"), F.col("s2").alias("s20")
    )
    m1r = m1.select(
        F.col("k").alias("k1"), F.col("s").alias("sa1"), F.col("s2").alias("s21")
    )
    out = m0r.crossJoin(F.broadcast(m1r))
    c0 = cv2(F.col("k0"), F.col("sa0"), F.col("s20"))
    c1 = cv2(F.col("k1"), F.col("sa1"), F.col("s21"))
    return out.select(
        F.col("k0").alias("n_gaps_full"),
        F.col("k1").alias("n_gaps_thinned"),
        F.round(c0, 9).alias("cv2_full"),
        F.round(c1, 9).alias("cv2_thinned"),
        F.round(c1 / c0, 9).alias("thinning_ratio"),
    )


CATALOG["evt_thinning_invariance_cv2"].fn = _dthinning


register(
    "evt_permutation_entropy_hours",
    # Order-3 permutation entropy of the densified hourly count
    # series: each sliding triple maps to its rank pattern with
    # time-index tie-breaks (key_i < key_j iff c_i < c_j, or equal
    # and i < j — so every comparison is a pure integer CASE), the
    # 6-pattern census feeds H = ln W - (1/W) sum n ln n via exact
    # integer n * micro-nat(ln n) products, normalized by ln 6.
    oracle=f"""
    WITH {_BASE_CTE},
    hb AS (
      SELECT (sec - t0) // 3600 AS h FROM ev CROSS JOIN cal
    ),
    hc AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS c FROM hb GROUP BY h),
    bins AS (
      SELECT unnest(generate_series(0, cal.nd * 24 - 1)) AS b FROM cal
    ),
    dense AS (
      SELECT bins.b, COALESCE(hc.c, 0) AS c
      FROM bins LEFT JOIN hc ON hc.h = bins.b
    ),
    tri AS (
      SELECT c AS x1,
             LEAD(c, 1) OVER (ORDER BY b) AS x2,
             LEAD(c, 2) OVER (ORDER BY b) AS x3
      FROM dense
    ),
    pat AS (
      SELECT 100 * (CASE WHEN x2 < x1 THEN 1 ELSE 0 END
                    + CASE WHEN x3 < x1 THEN 1 ELSE 0 END)
             + 10 * (CASE WHEN x1 <= x2 THEN 1 ELSE 0 END
                     + CASE WHEN x3 < x2 THEN 1 ELSE 0 END)
             + (CASE WHEN x1 <= x3 THEN 1 ELSE 0 END
                + CASE WHEN x2 <= x3 THEN 1 ELSE 0 END) AS p
      FROM tri WHERE x3 IS NOT NULL
    ),
    pc AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM pat GROUP BY p),
    w AS (SELECT CAST(SUM(n) AS BIGINT) AS w FROM pc),
    ent AS (
      SELECT CAST(SUM(n * CAST(floor(round(ln(CAST(n AS DOUBLE)), 6) * 1000000
                                     + 0.5) AS BIGINT)) AS HUGEINT) AS snl
      FROM pc
    )
    SELECT pc.p AS pattern, pc.n AS n_windows,
           round(CAST(pc.n AS DOUBLE) / w.w, 9) AS prob,
           round((CAST(floor(round(ln(CAST(w.w AS DOUBLE)), 6) * 1000000 + 0.5)
                       AS BIGINT) * w.w - CAST(ent.snl AS DOUBLE))
                 / (CAST(w.w AS DOUBLE) * 1000000), 6) AS pe_nats,
           round((CAST(floor(round(ln(CAST(w.w AS DOUBLE)), 6) * 1000000 + 0.5)
                       AS BIGINT) * w.w - CAST(ent.snl AS DOUBLE))
                 / (CAST(w.w AS DOUBLE) * 1000000) / 1.791759469, 6)
             AS pe_normalized
    FROM pc CROSS JOIN w CROSS JOIN ent ORDER BY pc.p
    """,
)


def _dpermentropy(spark, sf_dir):
    """Order-3 permutation-pattern census + entropy on hourly counts."""
    d38 = "decimal(38,0)"
    dense = _dense_bins(spark, sf_dir, [1]).select("b", "c")
    wo = Window.orderBy("b")
    tri = dense.select(
        F.col("c").alias("x1"),
        F.lead("c", 1).over(wo).alias("x2"),
        F.lead("c", 2).over(wo).alias("x3"),
    ).filter(F.col("x3").isNotNull())
    i = lambda cond: F.when(cond, 1).otherwise(0)  # noqa: E731
    pat = tri.select(
        (
            100 * (i(F.col("x2") < F.col("x1")) + i(F.col("x3") < F.col("x1")))
            + 10 * (i(F.col("x1") <= F.col("x2")) + i(F.col("x3") < F.col("x2")))
            + (i(F.col("x1") <= F.col("x3")) + i(F.col("x2") <= F.col("x3")))
        ).alias("p")
    )
    pc = pat.groupBy("p").agg(F.count("*").cast("long").alias("n")).localCheckpoint(
        eager=False
    )
    wv = pc.agg(F.sum("n").cast("long").alias("w"))
    l6 = lambda x: F.floor(  # noqa: E731
        F.round(F.log(x.cast("double")), 6) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    ent = pc.agg(F.sum(F.col("n").cast(d38) * l6(F.col("n"))).alias("snl"))
    out = pc.crossJoin(F.broadcast(wv)).crossJoin(F.broadcast(ent))
    pe = (
        (l6(F.col("w")) * F.col("w") - F.col("snl").cast("double"))
        / (F.col("w").cast("double") * 1000000)
    )
    return out.select(
        F.col("p").alias("pattern"),
        F.col("n").alias("n_windows"),
        F.round(F.col("n").cast("double") / F.col("w"), 9).alias("prob"),
        F.round(pe, 6).alias("pe_nats"),
        F.round(pe / F.lit(1.791759469), 6).alias("pe_normalized"),
    ).orderBy("pattern")


CATALOG["evt_permutation_entropy_hours"].fn = _dpermentropy
