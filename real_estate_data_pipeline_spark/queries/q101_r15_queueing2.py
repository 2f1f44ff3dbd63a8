"""Round-15 wave 21 (post-close): queueing theory II + model-assisted
survey estimation — Kingman's G/G/1 VUT waiting-time approximation per
event type (the arrival-variability correction the q71 M/G/1 report
can't see: ca^2 from day-bounded inter-arrival gaps, cs^2 from the
exact service moments), the Erlang-C delay sweep for c = 1..10 servers
(riding the q71 Erlang-B picounit series: C = cB/(c - a(1-B)), mean
wait, stability), the M/G/c corrected wait (Wq(M/G/c) ~ (1+cs^2)/2 *
Wq(M/M/c)) with a 30-second service-level flag, the hour-of-day
offered-workload heatmap (the staffing input), and ratio + GREG
(regression) survey estimators of total customer revenue from a
deterministic sha2 10% sample with order count as the auxiliary
(known population total) — expansion vs ratio vs GREG against the
in-data truth.

Exactness: all service moments are exact centisecond integers (value
is DECIMAL(18,2) seconds, the q71 hold-time convention); arrival-gap
CV^2 is the exact 128-bit rational k(kS2-S^2)/((k-1)S^2); the Erlang
series reuses the q71 left-associated power chain with picounit
snapping; survey estimators come from exact integer masses with one
closing division each (errors 9dp-snapped).
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

_FACT = [1, 1, 2, 6, 24, 120, 720, 5040, 40320, 362880, 3628800]
_EPOW_CASE = "CASE c WHEN 0 THEN 1.0 " + " ".join(
    f"WHEN {k} THEN {' * '.join(['e'] * k)}" for k in range(1, 11)
) + " END"
_TERM_EXPR = (
    f"CAST(floor(round(({_EPOW_CASE}) / (CASE c "
    + " ".join(f"WHEN {k} THEN {_FACT[k]}.0" for k in range(0, 11))
    + " END), 12) * 1000000000000 + 0.5) AS BIGINT)"
)

# Global arrival rate + exact service moments (q71 conventions).
_SYS_CTE = """sys AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(epoch(date_trunc('second', ts)))
                  - MIN(epoch(date_trunc('second', ts))) AS BIGINT) AS span,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS s1,
             CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                           AS HUGEINT)
                      * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS HUGEINT) AS s2
      FROM events
    )"""


def _sys(spark, sf_dir):
    """(n, span, s1, s2) system scalars — centisecond service mass."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return ev.agg(
        F.count("*").cast("long").alias("n"),
        (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts")))
        .cast("long")
        .alias("span"),
        F.sum(v100).cast("long").alias("s1"),
        F.sum(v100.cast(d38) * v100).alias("s2"),
    )


register(
    "evt_kingman_vut_by_type",
    # Kingman's VUT formula per event type: Wq ~ ((ca^2 + cs^2)/2) *
    # (rho/(1-rho)) * E[S] — the G/G/1 correction that multiplies the
    # M/M/1 wait by the measured VARIABILITY of arrivals and service.
    # ca^2 from day-bounded inter-arrival gaps (exact 128-bit
    # rational), cs^2 from exact centisecond service moments, lambda
    # = (n-1)/span per type.  The pk_wq column is the Poisson-arrival
    # M/G/1 answer for contrast.
    oracle="""
    WITH ev AS (
      SELECT event_type AS et,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
             date_trunc('day', ts) AS d, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
    ),
    gaps AS (
      SELECT et, sec - LAG(sec) OVER (PARTITION BY et, d
                                      ORDER BY sec, event_id) AS g
      FROM ev
    ),
    ga AS (
      SELECT et, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(g) AS HUGEINT) AS gs,
             CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS gs2
      FROM gaps WHERE g IS NOT NULL GROUP BY et
    ),
    sv AS (
      SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(sec) - MIN(sec) AS BIGINT) AS span,
             CAST(SUM(v) AS BIGINT) AS s1,
             CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
      FROM ev GROUP BY et
    ),
    m AS (
      SELECT sv.et,
             CAST(sv.n - 1 AS DOUBLE) / sv.span AS lam,
             CAST(sv.s1 AS DOUBLE) / sv.n / 100 AS es,
             CAST(sv.s2 AS DOUBLE) / sv.n / 10000 AS es2,
             CAST(ga.k * (ga.k * ga.gs2 - ga.gs * ga.gs) AS DOUBLE)
               / CAST((ga.k - 1) * ga.gs * ga.gs AS DOUBLE) AS ca2,
             (CAST(sv.n AS DOUBLE) * CAST(sv.s2 AS DOUBLE)
              - CAST(sv.s1 AS DOUBLE) * CAST(sv.s1 AS DOUBLE))
             / (CAST(sv.s1 AS DOUBLE) * CAST(sv.s1 AS DOUBLE)) AS cs2
      FROM sv JOIN ga ON ga.et = sv.et
    )
    SELECT et AS event_type,
           round(lam * 3600, 9) AS lambda_per_hour,
           round(ca2, 9) AS ca2, round(cs2, 9) AS cs2,
           round(lam * es, 9) AS rho,
           round((ca2 + cs2) / 2 * (lam * es / (1 - lam * es)) * es, 6)
             AS kingman_wq_s,
           round(lam * es2 / (2 * (1 - lam * es)), 6) AS pk_wq_s
    FROM m ORDER BY et
    """,
)


def _dkingman(spark, sf_dir):
    """Kingman VUT per type with exact-rational ca2/cs2."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
        F.date_trunc("day", "ts").alias("d"),
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v"),
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("et", "d").orderBy("sec", "event_id")
    ga = (
        ev.select("et", (F.col("sec") - F.lag("sec").over(w)).alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy("et")
        .agg(
            F.count("*").cast("long").alias("k"),
            F.sum("g").cast(d38).alias("gs"),
            F.sum(F.col("g").cast(d38) * F.col("g")).alias("gs2"),
        )
    )
    sv = ev.groupBy("et").agg(
        F.count("*").cast("long").alias("n"),
        (F.max("sec") - F.min("sec")).cast("long").alias("span"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v").cast(d38) * F.col("v")).alias("s2"),
    )
    m = sv.join(ga, "et")
    lam = (F.col("n") - 1).cast("double") / F.col("span")
    es = F.col("s1").cast("double") / F.col("n") / 100
    es2 = F.col("s2").cast("double") / F.col("n") / 10000
    ca2 = (F.col("k") * (F.col("k") * F.col("gs2") - F.col("gs") * F.col("gs"))).cast(
        "double"
    ) / ((F.col("k") - 1) * F.col("gs") * F.col("gs")).cast("double")
    cs2 = (
        F.col("n").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (F.col("s1").cast("double") * F.col("s1").cast("double"))
    rho = lam * es
    return m.select(
        F.col("et").alias("event_type"),
        F.round(lam * 3600, 9).alias("lambda_per_hour"),
        F.round(ca2, 9).alias("ca2"),
        F.round(cs2, 9).alias("cs2"),
        F.round(rho, 9).alias("rho"),
        F.round((ca2 + cs2) / 2 * (rho / (1 - rho)) * es, 6).alias(
            "kingman_wq_s"
        ),
        F.round(lam * es2 / (2 * (1 - rho)), 6).alias("pk_wq_s"),
    ).orderBy("event_type")


CATALOG["evt_kingman_vut_by_type"].fn = _dkingman


register(
    "evt_erlang_c_staffing",
    # Erlang-C delay sweep for c = 1..10 at the measured offered load
    # (the q71 Erlang-B picounit series extended through the exact
    # C = cB/(c - a(1-B)) identity): probability of waiting, mean
    # wait Wq = C/(c mu - lambda), stability — the staffing table.
    # Unstable rows (a >= c) emit NULL waits on both engines.
    oracle=f"""
    WITH {_SYS_CTE},
    load AS (
      SELECT CAST(n - 1 AS DOUBLE) / span
             * (CAST(s1 AS DOUBLE) / n / 100) AS e,
             CAST(n - 1 AS DOUBLE) / span AS lam,
             CAST(s1 AS DOUBLE) / n / 100 AS es
      FROM sys
    ),
    ks(c) AS (VALUES {", ".join(f"({k})" for k in range(0, 11))}),
    terms AS (
      SELECT ks.c, {_TERM_EXPR} AS t12 FROM ks CROSS JOIN load
    ),
    cum AS (
      SELECT c, t12, CAST(SUM(t12) OVER (ORDER BY c) AS BIGINT) AS d12
      FROM terms
    ),
    bc AS (
      SELECT cum.c, CAST(cum.t12 AS DOUBLE) / cum.d12 AS b, load.e, load.lam,
             load.es
      FROM cum CROSS JOIN load WHERE cum.c >= 1
    )
    SELECT c AS servers, round(e, 9) AS offered_erlangs,
           round(b, 9) AS erlang_b,
           CASE WHEN e < c
                THEN round(c * b / (c - e * (1 - b)), 9) END AS erlang_c,
           CASE WHEN e < c
                THEN round(c * b / (c - e * (1 - b)) / (c / es - lam), 6)
           END AS wq_seconds,
           CAST(CASE WHEN e < c THEN 1 ELSE 0 END AS BIGINT) AS stable
    FROM bc ORDER BY c
    """,
)


def _derlangc(spark, sf_dir):
    """Erlang-C sweep off the picounit B series."""
    sysf = _sys(spark, sf_dir)
    load = sysf.select(
        (
            (F.col("n") - 1).cast("double") / F.col("span")
            * (F.col("s1").cast("double") / F.col("n") / 100)
        ).alias("e"),
        ((F.col("n") - 1).cast("double") / F.col("span")).alias("lam"),
        (F.col("s1").cast("double") / F.col("n") / 100).alias("es"),
    )
    ks = spark.range(0, 11).select(F.col("id").cast("int").alias("c"))
    terms = ks.crossJoin(F.broadcast(load)).select(
        "c", "e", "lam", "es", F.expr(_TERM_EXPR).alias("t12")
    )
    wcum = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = terms.select(
        "c", "e", "lam", "es", "t12",
        F.sum("t12").over(wcum).cast("long").alias("d12"),
    ).filter(F.col("c") >= 1)
    b = F.col("t12").cast("double") / F.col("d12")
    ec = F.col("c") * b / (F.col("c") - F.col("e") * (1 - b))
    stable = F.col("e") < F.col("c")
    return cum.select(
        F.col("c").cast("int").alias("servers"),
        F.round(F.col("e"), 9).alias("offered_erlangs"),
        F.round(b, 9).alias("erlang_b"),
        F.when(stable, F.round(ec, 9)).alias("erlang_c"),
        F.when(
            stable,
            F.round(ec / (F.col("c") / F.col("es") - F.col("lam")), 6),
        ).alias("wq_seconds"),
        F.when(stable, 1).otherwise(0).cast("long").alias("stable"),
    ).orderBy("servers")


CATALOG["evt_erlang_c_staffing"].fn = _derlangc


register(
    "evt_mgc_wait_approx",
    # The standard M/G/c approximation: Wq(M/G/c) ~ ((1 + cs^2)/2) *
    # Wq(M/M/c) — the Erlang-C sweep corrected by the measured service
    # CV^2, with the 30-second service-level flag per staffing level
    # (the row a capacity planner actually reads).
    oracle=f"""
    WITH {_SYS_CTE},
    load AS (
      SELECT CAST(n - 1 AS DOUBLE) / span
             * (CAST(s1 AS DOUBLE) / n / 100) AS e,
             CAST(n - 1 AS DOUBLE) / span AS lam,
             CAST(s1 AS DOUBLE) / n / 100 AS es,
             (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) AS cs2
      FROM sys
    ),
    ks(c) AS (VALUES {", ".join(f"({k})" for k in range(0, 11))}),
    terms AS (
      SELECT ks.c, {_TERM_EXPR} AS t12 FROM ks CROSS JOIN load
    ),
    cum AS (
      SELECT c, t12, CAST(SUM(t12) OVER (ORDER BY c) AS BIGINT) AS d12
      FROM terms
    ),
    bc AS (
      SELECT cum.c, CAST(cum.t12 AS DOUBLE) / cum.d12 AS b,
             load.e, load.lam, load.es, load.cs2
      FROM cum CROSS JOIN load WHERE cum.c >= 1
    )
    SELECT c AS servers, round(cs2, 9) AS cs2,
           CASE WHEN e < c
                THEN round((1 + cs2) / 2
                           * (c * b / (c - e * (1 - b)))
                           / (c / es - lam), 6) END AS wq_mgc_seconds,
           CAST(CASE WHEN e < c
                     AND (1 + cs2) / 2 * (c * b / (c - e * (1 - b)))
                         / (c / es - lam) <= 30
                     THEN 1 ELSE 0 END AS BIGINT) AS meets_30s
    FROM bc ORDER BY c
    """,
)


def _dmgc(spark, sf_dir):
    """M/G/c corrected waits with the 30 s service-level flag."""
    sysf = _sys(spark, sf_dir)
    cs2e = (
        F.col("n").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (F.col("s1").cast("double") * F.col("s1").cast("double"))
    load = sysf.select(
        (
            (F.col("n") - 1).cast("double") / F.col("span")
            * (F.col("s1").cast("double") / F.col("n") / 100)
        ).alias("e"),
        ((F.col("n") - 1).cast("double") / F.col("span")).alias("lam"),
        (F.col("s1").cast("double") / F.col("n") / 100).alias("es"),
        cs2e.alias("cs2"),
    )
    ks = spark.range(0, 11).select(F.col("id").cast("int").alias("c"))
    terms = ks.crossJoin(F.broadcast(load)).select(
        "c", "e", "lam", "es", "cs2", F.expr(_TERM_EXPR).alias("t12")
    )
    wcum = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = terms.select(
        "c", "e", "lam", "es", "cs2", "t12",
        F.sum("t12").over(wcum).cast("long").alias("d12"),
    ).filter(F.col("c") >= 1)
    b = F.col("t12").cast("double") / F.col("d12")
    wq = (
        (1 + F.col("cs2"))
        / 2
        * (F.col("c") * b / (F.col("c") - F.col("e") * (1 - b)))
        / (F.col("c") / F.col("es") - F.col("lam"))
    )
    stable = F.col("e") < F.col("c")
    return cum.select(
        F.col("c").cast("int").alias("servers"),
        F.round(F.col("cs2"), 9).alias("cs2"),
        F.when(stable, F.round(wq, 6)).alias("wq_mgc_seconds"),
        F.when(stable & (wq <= 30), 1).otherwise(0).cast("long").alias(
            "meets_30s"
        ),
    ).orderBy("servers")


CATALOG["evt_mgc_wait_approx"].fn = _dmgc


register(
    "evt_workload_hourly_offered",
    # Hour-of-day offered workload: total service seconds landing in
    # each of the 24 hours over the whole window, expressed as offered
    # erlangs (busy-server-equivalents) per hour-of-day — THE staffing
    # heatmap input.  Exact centisecond masses; the peak flag joins
    # the 1-row max scalar.
    oracle="""
    WITH ev AS (
      SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
    ),
    nd AS (
      SELECT CAST(date_diff('day', date_trunc('day', MIN(ts)),
                            date_trunc('day', MAX(ts))) + 1 AS BIGINT) AS nd
      FROM events
    ),
    h AS (
      SELECT hod, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(v) AS BIGINT) AS mass
      FROM ev GROUP BY hod
    ),
    mx AS (SELECT CAST(MAX(mass) AS BIGINT) AS mmax FROM h)
    SELECT hod AS hour_of_day, n_events,
           round(CAST(mass AS DOUBLE) / 100, 2) AS service_seconds,
           round(CAST(mass AS DOUBLE) / 100 / 3600 / nd.nd, 9)
             AS offered_erlangs,
           CAST(CASE WHEN mass = mx.mmax THEN 1 ELSE 0 END AS BIGINT)
             AS is_peak
    FROM h CROSS JOIN nd CROSS JOIN mx ORDER BY hod
    """,
)


def _dworkload(spark, sf_dir):
    """24-row hour-of-day offered-erlang heatmap."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        F.hour("ts").cast("long").alias("hod"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v"),
        "ts",
    )
    nd = ev.agg(
        (
            F.datediff(
                F.date_trunc("day", F.max("ts")).cast("date"),
                F.date_trunc("day", F.min("ts")).cast("date"),
            )
            + 1
        )
        .cast("long")
        .alias("nd")
    )
    h = base.groupBy("hod").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("v").cast("long").alias("mass"),
    ).localCheckpoint(eager=False)
    mx = h.agg(F.max("mass").cast("long").alias("mmax"))
    return (
        h.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("hod").alias("hour_of_day"),
            "n_events",
            F.round(F.col("mass").cast("double") / 100, 2).alias(
                "service_seconds"
            ),
            F.round(
                F.col("mass").cast("double") / 100 / 3600 / F.col("nd"), 9
            ).alias("offered_erlangs"),
            F.when(F.col("mass") == F.col("mmax"), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_peak"),
        )
        .orderBy("hour_of_day")
    )


CATALOG["evt_workload_hourly_offered"].fn = _dworkload


register(
    "cust_ratio_greg_estimators",
    # Model-assisted survey estimation of TOTAL customer revenue from
    # a deterministic sha2 10% customer sample, with per-customer
    # order count as the auxiliary (population total known): the
    # expansion (Horvitz-Thompson) estimator N/n sum y, the ratio
    # estimator (sum y / sum x) X, and the GREG regression estimator
    # Yhat_exp + b (X - Xhat_exp) with b from exact sample Cramer
    # moments — all compared against the in-data truth.  Exact
    # integer masses; relative errors 9dp.
    oracle="""
    WITH cy AS MATERIALIZED (
      SELECT o.o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders o GROUP BY o.o_custkey
    ),
    pop AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(x) AS BIGINT) AS xx,
             CAST(SUM(y) AS BIGINT) AS yy
      FROM cy
    ),
    smp AS (
      SELECT * FROM cy
      WHERE ('0x' || substr(sha256(CAST(ck AS VARCHAR) || 'svy15'), 1, 8))
            ::UBIGINT < 429496730
    ),
    sm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS ns, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM smp
    ),
    est AS (
      SELECT pop.nn, pop.xx, pop.yy, sm.ns,
             CAST(pop.nn AS DOUBLE) / sm.ns * sm.sy AS y_exp,
             CAST(sm.sy AS DOUBLE) / sm.sx * pop.xx AS y_ratio,
             CAST(pop.nn AS DOUBLE) / sm.ns * sm.sy
             + CAST(sm.ns * sm.sxy - CAST(sm.sx AS HUGEINT) * sm.sy AS DOUBLE)
               / CAST(sm.ns * sm.sxx - CAST(sm.sx AS HUGEINT) * sm.sx
                      AS DOUBLE)
               * (pop.xx - CAST(pop.nn AS DOUBLE) / sm.ns * sm.sx) AS y_greg
      FROM pop CROSS JOIN sm
    )
    SELECT nn AS n_population, ns AS n_sample,
           round(yy / 100.0, 2) AS truth_dollars,
           round(y_exp / 100, 2) AS expansion_dollars,
           round(y_ratio / 100, 2) AS ratio_dollars,
           round(y_greg / 100, 2) AS greg_dollars,
           round((y_exp - yy) / yy, 9) AS expansion_rel_err,
           round((y_ratio - yy) / yy, 9) AS ratio_rel_err,
           round((y_greg - yy) / yy, 9) AS greg_rel_err
    FROM est
    """,
)


def _dgreg(spark, sf_dir):
    """Expansion / ratio / GREG totals off the sha2 10% sample."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    cy = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count("*").cast("long").alias("x"),
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("y"),
    ).localCheckpoint(eager=False)
    pop = cy.agg(
        F.count("*").cast("long").alias("nn"),
        F.sum("x").cast("long").alias("xx"),
        F.sum("y").cast("long").alias("yy"),
    )
    hv = F.conv(
        F.substring(
            F.sha2(F.concat(F.col("ck").cast("string"), F.lit("svy15")), 256), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    sm = cy.filter(hv < F.lit(429496730)).agg(
        F.count("*").cast("long").alias("ns"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    est = pop.crossJoin(F.broadcast(sm))
    y_exp = F.col("nn").cast("double") / F.col("ns") * F.col("sy")
    y_ratio = F.col("sy").cast("double") / F.col("sx") * F.col("xx")
    bb = (
        F.col("ns") * F.col("sxy") - F.col("sx").cast(d38) * F.col("sy")
    ).cast("double") / (
        F.col("ns") * F.col("sxx") - F.col("sx").cast(d38) * F.col("sx")
    ).cast("double")
    y_greg = y_exp + bb * (
        F.col("xx") - F.col("nn").cast("double") / F.col("ns") * F.col("sx")
    )
    return est.select(
        F.col("nn").alias("n_population"),
        F.col("ns").alias("n_sample"),
        F.round(F.col("yy") / F.lit(100.0), 2).alias("truth_dollars"),
        F.round(y_exp / 100, 2).alias("expansion_dollars"),
        F.round(y_ratio / 100, 2).alias("ratio_dollars"),
        F.round(y_greg / 100, 2).alias("greg_dollars"),
        F.round((y_exp - F.col("yy")) / F.col("yy"), 9).alias(
            "expansion_rel_err"
        ),
        F.round((y_ratio - F.col("yy")) / F.col("yy"), 9).alias("ratio_rel_err"),
        F.round((y_greg - F.col("yy")) / F.col("yy"), 9).alias("greg_rel_err"),
    )


CATALOG["cust_ratio_greg_estimators"].fn = _dgreg
