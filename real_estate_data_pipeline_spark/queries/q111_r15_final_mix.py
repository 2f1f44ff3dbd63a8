"""Round-15 wave 31 (post-close): final mixed frontier — Juilland's D
dispersion of the top-10 corpus tokens across the 20 sources (the
corpus-linguistics gauge of whether a frequent word is EVERYWHERE or
just loud in one place; absent sources count as exact zeros), the
entropy-production rate of the user-journey digraph (the
nonequilibrium irreversibility measure (1/2N) sum (n_ab - n_ba)
ln(n_ab/n_ba) — zero iff detailed balance holds), the
autocorrelation-adjusted effective sample size of the daily event
series (ESS = n / (1 + 2 sum rho_k), rho from the wave-8 exact
z-cleared autocovariances), Cohen's d / Hedges' g / Glass's delta for
BUILDING-vs-AUTOMOBILE order values (the exact small-sample J = 1 -
3/(4 df - 1)), and a calendar-exact month-of-year uniformity chi2
(expected counts weighted by the EXACT number of calendar days each
month contributes to the span — a densified day frame, not a 1/12
shortcut).

Exactness: token shares and flow logs are nano/micro integer
quantities; autocovariance ratios ride the integer z_t = n c_t - S
clearing; effect-size moments are exact cents in decimal-38 with the
correction factor an exact rational; the calendar day frame comes
from generate_series/sequence so days-per-month is a pure integer.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t


register(
    "doc_juilland_d_dispersion",
    # Juilland's D = 1 - CV / sqrt(k - 1) for the top-10 global
    # tokens, CV taken over the per-source relative frequencies
    # (nano-quantized exact integer divisions; sources missing the
    # token contribute exact zeros via the densified source frame).
    # D near 1 = evenly dispersed; near 0 = one source's tic.
    oracle="""
    WITH toks AS MATERIALIZED (
      SELECT source, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    tk AS (SELECT source, tok FROM toks WHERE tok <> ''),
    st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nt FROM tk
           GROUP BY source),
    top AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS gc FROM tk GROUP BY tok
      ORDER BY gc DESC, tok LIMIT 10
    ),
    cnt AS (
      SELECT tk.tok, tk.source, CAST(COUNT(*) AS BIGINT) AS c
      FROM tk JOIN top ON top.tok = tk.tok GROUP BY tk.tok, tk.source
    ),
    grid AS (
      SELECT top.tok, top.gc, st.source,
             COALESCE((cnt.c * 1000000000) // st.nt, 0) AS f9
      FROM top CROSS JOIN st
      LEFT JOIN cnt ON cnt.tok = top.tok AND cnt.source = st.source
    ),
    m AS (
      SELECT tok, gc, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(f9) AS HUGEINT) AS s,
             CAST(SUM(CAST(f9 AS HUGEINT) * f9) AS HUGEINT) AS s2
      FROM grid GROUP BY tok, gc
    )
    SELECT tok AS token, gc AS global_count,
           round(1 - sqrt(CAST(k * s2 - s * s AS DOUBLE)
                          / (CAST(k AS DOUBLE) * (k - 1)))
                     / (CAST(s AS DOUBLE) / k) / sqrt(CAST(k - 1 AS DOUBLE)),
                 9) AS juilland_d
    FROM m ORDER BY gc DESC, tok
    """,
)


def _djuilland(spark, sf_dir):
    """Juilland's D over the densified (top-token x source) grid."""
    d38 = "decimal(38,0)"
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
    ).filter(F.col("tok") != "").localCheckpoint(eager=False)
    st = tk.groupBy(F.col("source").alias("src")).agg(
        F.count("*").cast("long").alias("nt")
    )
    top = (
        tk.groupBy("tok")
        .agg(F.count("*").cast("long").alias("gc"))
        .orderBy(F.col("gc").desc(), "tok")
        .limit(10)
        .localCheckpoint(eager=False)
    )
    cnt = (
        tk.join(F.broadcast(top.select(F.col("tok").alias("tt"))), F.col("tok") == F.col("tt"))
        .groupBy("tok", "source")
        .agg(F.count("*").cast("long").alias("c"))
    )
    grid = (
        top.crossJoin(F.broadcast(st))
        .join(
            cnt.select(
                F.col("tok").alias("ct"), F.col("source").alias("cs"), "c"
            ),
            (F.col("tok") == F.col("ct")) & (F.col("src") == F.col("cs")),
            "left",
        )
        .select(
            "tok",
            "gc",
            F.coalesce(
                F.expr("(c * 1000000000) div nt"), F.lit(0).cast("long")
            ).alias("f9"),
        )
    )
    m = grid.groupBy("tok", "gc").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("f9").cast(d38).alias("s"),
        F.sum(F.col("f9").cast(d38) * F.col("f9")).alias("s2"),
    )
    sd = F.sqrt(
        (F.col("k") * F.col("s2") - F.col("s") * F.col("s")).cast("double")
        / (F.col("k").cast("double") * (F.col("k") - 1))
    )
    mean = F.col("s").cast("double") / F.col("k")
    return m.select(
        F.col("tok").alias("token"),
        F.col("gc").alias("global_count"),
        F.round(
            1 - sd / mean / F.sqrt((F.col("k") - 1).cast("double")), 9
        ).alias("juilland_d"),
    ).orderBy(F.col("global_count").desc(), "token")


CATALOG["doc_juilland_d_dispersion"].fn = _djuilland


register(
    "evt_entropy_production_rate",
    # The entropy-production rate of the journey digraph: sigma =
    # (1/2N) sum over bidirectional pairs of (n_ab - n_ba)
    # ln(n_ab/n_ba) — exactly zero iff detailed balance holds, so
    # sigma IS the thermodynamic price of the funnel's direction.
    # Integer flow diffs times micro-nat log ratios; one-sided pairs
    # (where the formula diverges) are counted, not summed.
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type AS a,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec, event_id
      FROM events
    ),
    sq AS (
      SELECT a, LEAD(a) OVER (PARTITION BY user_id
                              ORDER BY sec, event_id) AS b
      FROM ev
    ),
    bi AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM sq WHERE b IS NOT NULL AND a <> b GROUP BY a, b
    ),
    nn AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM bi),
    pair AS (
      SELECT LEAST(x.a, x.b) AS p, GREATEST(x.a, x.b) AS q,
             CAST(SUM(CASE WHEN x.a < x.b THEN x.n ELSE 0 END) AS BIGINT)
               AS fwd,
             CAST(SUM(CASE WHEN x.a > x.b THEN x.n ELSE 0 END) AS BIGINT)
               AS bwd
      FROM bi x GROUP BY 1, 2
    ),
    terms AS (
      SELECT
        CASE WHEN fwd > 0 AND bwd > 0 THEN 1 ELSE 0 END AS bidir,
        CASE WHEN fwd > 0 AND bwd > 0
             THEN (fwd - bwd)
                  * (CAST(floor(round(ln(CAST(fwd AS DOUBLE)), 6) * 1000000
                                + 0.5) AS BIGINT)
                     - CAST(floor(round(ln(CAST(bwd AS DOUBLE)), 6) * 1000000
                                  + 0.5) AS BIGINT))
             ELSE 0 END AS t6
      FROM pair
    )
    SELECT nn.tot AS n_offdiag_transitions,
           CAST(SUM(terms.bidir) AS BIGINT) AS n_bidirectional_pairs,
           CAST(SUM(1 - terms.bidir) AS BIGINT) AS n_onesided_pairs,
           round(CAST(SUM(terms.t6) AS DOUBLE) / (2.0 * nn.tot) / 1e6, 9)
             AS entropy_production_nats
    FROM terms CROSS JOIN nn GROUP BY nn.tot
    """,
)


def _dentropyprod(spark, sf_dir):
    """Flow-asymmetry entropy production over the journey digraph."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("a"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    sq = ev.select("a", F.lead("a").over(w).alias("b"))
    bi = (
        sq.filter(F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    nn = bi.agg(F.sum("n").cast("long").alias("tot"))
    pair = bi.groupBy(
        F.least("a", "b").alias("p"), F.greatest("a", "b").alias("q")
    ).agg(
        F.sum(F.when(F.col("a") < F.col("b"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("fwd"),
        F.sum(F.when(F.col("a") > F.col("b"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("bwd"),
    )
    l6 = lambda c: F.floor(  # noqa: E731
        F.round(F.log(c.cast("double")), 6) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    both = (F.col("fwd") > 0) & (F.col("bwd") > 0)
    terms = pair.select(
        F.when(both, 1).otherwise(0).alias("bidir"),
        F.when(
            both,
            (F.col("fwd") - F.col("bwd")) * (l6(F.col("fwd")) - l6(F.col("bwd"))),
        )
        .otherwise(0)
        .alias("t6"),
    )
    return terms.crossJoin(F.broadcast(nn)).groupBy("tot").agg(
        F.sum("bidir").cast("long").alias("n_bidirectional_pairs"),
        F.sum(1 - F.col("bidir")).cast("long").alias("n_onesided_pairs"),
        F.round(
            F.sum("t6").cast("double") / (2.0 * F.col("tot")) / F.lit(1e6), 9
        ).alias("entropy_production_nats"),
    ).select(
        F.col("tot").alias("n_offdiag_transitions"),
        "n_bidirectional_pairs",
        "n_onesided_pairs",
        "entropy_production_nats",
    )


CATALOG["evt_entropy_production_rate"].fn = _dentropyprod


register(
    "evt_effective_sample_size_daily",
    # The autocorrelation-adjusted effective sample size of the daily
    # event counts: ESS = n / (1 + 2 sum_{k=1..10} rho_k) with rho_k
    # from the wave-8 exact clearing z_t = n c_t - S (so every
    # autocovariance ratio is integer/integer) — how many INDEPENDENT
    # days of evidence 30 correlated days actually carry.
    # Caveat the output carries honestly: the truncated-sum estimator
    # can go NEGATIVE when the series is strongly anti-correlated
    # (sum rho < -1/2) — the standard pathology, reported as-is.
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS dy, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    d0 AS (SELECT MIN(dy) AS d0 FROM d),
    p AS (
      SELECT CAST(date_diff('day', d0.d0, d.dy) AS BIGINT) AS x, d.c
      FROM d CROSS JOIN d0
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
      FROM p
    ),
    z AS (
      SELECT p.x, m.n * p.c - m.s AS z FROM p CROSS JOIN m
    ),
    den AS (
      SELECT CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS z2 FROM z
    ),
    ks(k) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)),
    num AS (
      SELECT ks.k,
             CAST(SUM(CAST(a.z AS HUGEINT) * b.z) AS HUGEINT) AS zz
      FROM ks JOIN z a ON TRUE JOIN z b ON b.x = a.x - ks.k
      GROUP BY ks.k
    ),
    rho AS (
      SELECT CAST(SUM(CAST(floor(CAST(num.zz AS DOUBLE)
                                 / CAST(den.z2 AS DOUBLE) * 1e9 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sr9
      FROM num CROSS JOIN den
    )
    SELECT m.n AS n_days,
           round(rho.sr9 / 1e9, 9) AS sum_rho_1_10,
           round(1 + 2.0 * rho.sr9 / 1e9, 9) AS autocorr_time,
           round(m.n / (1 + 2.0 * rho.sr9 / 1e9), 6) AS effective_n
    FROM m CROSS JOIN rho
    """,
)


def _dess(spark, sf_dir):
    """ESS from nano-quantized exact autocovariance ratios."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("dy")).agg(
        F.count("*").cast("long").alias("c")
    )
    d0 = d.agg(F.min("dy").alias("d0"))
    p = d.crossJoin(F.broadcast(d0)).select(
        F.datediff(F.col("dy").cast("date"), F.col("d0").cast("date"))
        .cast("long")
        .alias("x"),
        "c",
    )
    m = p.agg(
        F.count("*").cast("long").alias("n"), F.sum("c").cast("long").alias("s")
    )
    z = p.crossJoin(F.broadcast(m)).select(
        "x", (F.col("n") * F.col("c") - F.col("s")).alias("z"), "n"
    ).localCheckpoint(eager=False)
    den = z.agg(F.sum(F.col("z").cast(d38) * F.col("z")).alias("z2"))
    ks = spark.createDataFrame([(k,) for k in range(1, 11)], "k long")
    b = z.select(F.col("x").alias("xb"), F.col("z").alias("zb"))
    num = (
        z.crossJoin(F.broadcast(ks))
        .join(F.broadcast(b), F.col("xb") == F.col("x") - F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("z").cast(d38) * F.col("zb")).alias("zz"))
    )
    rho = num.crossJoin(F.broadcast(den)).agg(
        F.sum(
            F.floor(
                F.col("zz").cast("double") / F.col("z2").cast("double")
                * F.lit(1e9)
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("sr9")
    )
    act = 1 + 2.0 * F.col("sr9") / F.lit(1e9)
    return m.crossJoin(F.broadcast(rho)).select(
        F.col("n").alias("n_days"),
        F.round(F.col("sr9") / F.lit(1e9), 9).alias("sum_rho_1_10"),
        F.round(act, 9).alias("autocorr_time"),
        F.round(F.col("n") / act, 6).alias("effective_n"),
    )


CATALOG["evt_effective_sample_size_daily"].fn = _dess


register(
    "ml_cohen_d_effect_sizes",
    # Standardized effect sizes for BUILDING vs AUTOMOBILE order
    # values: Cohen's d on the pooled SD, Hedges' g with the exact
    # small-sample rational J = 1 - 3/(4 df - 1), and Glass's delta
    # on the control (AUTOMOBILE) SD — the magnitude language that
    # p-values refuse to speak.  Exact cent moments in decimal-38.
    oracle="""
    WITH x AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ),
    g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS HUGEINT) AS s,
             CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
      FROM x GROUP BY grp
    ),
    w AS (
      SELECT
        MAX(CASE WHEN grp = 1 THEN n END) AS n1,
        MAX(CASE WHEN grp = 1 THEN CAST(s AS DOUBLE) / n END) AS m1,
        MAX(CASE WHEN grp = 1
                 THEN CAST(n * s2 - s * s AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (n - 1)) END) AS v1,
        MAX(CASE WHEN grp = 0 THEN n END) AS n2,
        MAX(CASE WHEN grp = 0 THEN CAST(s AS DOUBLE) / n END) AS m2,
        MAX(CASE WHEN grp = 0
                 THEN CAST(n * s2 - s * s AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (n - 1)) END) AS v2
      FROM g
    )
    SELECT n1 AS n_building, n2 AS n_automobile,
           round((m1 - m2) / 100, 2) AS mean_diff_dollars,
           round((m1 - m2)
                 / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)), 9)
             AS cohens_d,
           round((m1 - m2)
                 / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
                 * (1 - 3.0 / (4 * (n1 + n2 - 2) - 1)), 9) AS hedges_g,
           round((m1 - m2) / sqrt(v2), 9) AS glass_delta
    FROM w
    """,
)


def _dcohend(spark, sf_dir):
    """Cohen d / Hedges g / Glass delta from exact cent moments."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
    x = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("grp"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    )
    g = x.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast(d38).alias("s"),
        F.sum(F.col("cents").cast(d38) * F.col("cents")).alias("s2"),
    )

    def pick(grp, expr):
        return F.max(F.when(F.col("grp") == grp, expr))

    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast("double") / (
        F.col("n").cast("double") * (F.col("n") - 1)
    )
    w = g.agg(
        pick(1, F.col("n")).alias("n1"),
        pick(1, mean).alias("m1"),
        pick(1, var).alias("v1"),
        pick(0, F.col("n")).alias("n2"),
        pick(0, mean).alias("m2"),
        pick(0, var).alias("v2"),
    )
    sp = F.sqrt(
        ((F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2"))
        / (F.col("n1") + F.col("n2") - 2)
    )
    dd = (F.col("m1") - F.col("m2")) / sp
    jj = 1 - 3.0 / (4 * (F.col("n1") + F.col("n2") - 2) - 1)
    return w.select(
        F.col("n1").alias("n_building"),
        F.col("n2").alias("n_automobile"),
        F.round((F.col("m1") - F.col("m2")) / 100, 2).alias("mean_diff_dollars"),
        F.round(dd, 9).alias("cohens_d"),
        F.round(dd * jj, 9).alias("hedges_g"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(F.col("v2")), 9).alias(
            "glass_delta"
        ),
    )


CATALOG["ml_cohen_d_effect_sizes"].fn = _dcohend


register(
    "orders_month_uniformity_chi2",
    # Month-of-year uniformity of order volume with CALENDAR-EXACT
    # expectations: E_m = N * days_m / D where days_m counts the
    # actual calendar days month m contributes to the [min, max]
    # order-date span (a densified generate_series day frame — the
    # 1/12 shortcut is wrong when the span ends mid-year), chi2 over
    # the 12 cells with pico-quantized terms, and the peak month by
    # observed/expected ratio.
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS dy FROM orders
    ),
    span AS (SELECT MIN(dy) AS lo, MAX(dy) AS hi FROM d),
    cal AS (
      SELECT CAST(EXTRACT(month FROM g) AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS days_m
      FROM (SELECT unnest(generate_series(span.lo, span.hi,
                                          INTERVAL 1 DAY)) AS g
            FROM span) t
      GROUP BY 1
    ),
    dd AS (SELECT CAST(SUM(days_m) AS BIGINT) AS d_total FROM cal),
    obs AS (
      SELECT CAST(EXTRACT(month FROM dy) AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM d GROUP BY 1
    ),
    nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    terms AS (
      SELECT cal.m, COALESCE(obs.o, 0) AS o,
             CAST(nn.n AS DOUBLE) * cal.days_m / dd.d_total AS e,
             CAST(floor((COALESCE(obs.o, 0)
                         - CAST(nn.n AS DOUBLE) * cal.days_m / dd.d_total)
                        * (COALESCE(obs.o, 0)
                           - CAST(nn.n AS DOUBLE) * cal.days_m / dd.d_total)
                        / (CAST(nn.n AS DOUBLE) * cal.days_m / dd.d_total)
                        * 1e6 + 0.5) AS BIGINT) AS t6
      FROM cal LEFT JOIN obs ON obs.m = cal.m CROSS JOIN dd CROSS JOIN nn
    ),
    pk AS (
      SELECT m FROM terms ORDER BY CAST(o AS DOUBLE) / e DESC, m LIMIT 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
           round(CAST(SUM(t6) AS DOUBLE) / 1e6, 6) AS chi2,
           CAST(COUNT(*) - 1 AS BIGINT) AS df,
           (SELECT m FROM pk) AS peak_month
    FROM terms
    """,
)


def _dmonthchi2(spark, sf_dir):
    """Calendar-exact month-mix chi2 with the densified day frame."""
    o = t(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderdate").cast("date").alias("dy")).localCheckpoint(
        eager=False
    )
    span = d.agg(F.min("dy").alias("lo"), F.max("dy").alias("hi"))
    cal = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("g")
    ).groupBy(F.month("g").cast("long").alias("m")).agg(
        F.count("*").cast("long").alias("days_m")
    ).localCheckpoint(eager=False)
    dd = cal.agg(F.sum("days_m").cast("long").alias("d_total"))
    obs = d.groupBy(F.month("dy").cast("long").alias("mo")).agg(
        F.count("*").cast("long").alias("o")
    )
    nn = obs.agg(F.sum("o").cast("long").alias("n"))
    e = F.col("n").cast("double") * F.col("days_m") / F.col("d_total")
    oo = F.coalesce(F.col("o"), F.lit(0))
    terms = (
        cal.join(F.broadcast(obs), F.col("m") == F.col("mo"), "left")
        .crossJoin(F.broadcast(dd))
        .crossJoin(F.broadcast(nn))
        .select(
            "m",
            oo.alias("o"),
            e.alias("e"),
            F.floor((oo - e) * (oo - e) / e * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("t6"),
        )
        .localCheckpoint(eager=False)
    )
    pk = (
        terms.orderBy((F.col("o").cast("double") / F.col("e")).desc(), "m")
        .limit(1)
        .select(F.col("m").alias("peak"))
    )
    return terms.crossJoin(F.broadcast(pk)).agg(
        F.count("*").cast("long").alias("n_months"),
        F.round(F.sum("t6").cast("double") / F.lit(1e6), 6).alias("chi2"),
        (F.count("*") - 1).cast("long").alias("df"),
        F.first("peak").alias("peak_month"),
    )


CATALOG["orders_month_uniformity_chi2"].fn = _dmonthchi2
