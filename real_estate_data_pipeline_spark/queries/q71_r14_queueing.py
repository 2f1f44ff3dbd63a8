"""Round-14 wave 4: queueing / operational analytics over the event
stream — the per-user Lindley virtual-wait recursion in closed prefix
form, session peak-concurrency at hour boundaries, per-(type, day)
busy-period structure, the Pollaczek-Khinchine M/G/1 load report per
event type, and an Erlang-B blocking sweep over 1..10 servers.

Scale shape: every window is partitioned (user / type-day) or runs
over a bounded derived frame (hour histogram, 11-row server series);
the only broadcasts are 1-row scalars (service time, offered load).
Exactness: epoch seconds and interarrivals are exact BIGINTs; the
Lindley service constant is a pure integer 4/5 scaling of the global
mean interarrival (no float); holding-time moments ride DECIMAL(18,2);
the Erlang-B power series builds E^k by an explicit generated
left-associated product CASE (identical text in both engines — never
libm pow) and quantizes each term to picounits before the cumulative
sum.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

_ES_SQL = """es AS (
      SELECT user_id, event_id, event_type,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
      FROM events
    )"""


def _es_frame(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )


register(
    "evt_lindley_virtual_wait",
    # Single-server FIFO queue per user: W_1 = 0, W_i = max(0,
    # W_{i-1} + S - A_i).  Closed prefix form W_i = M_i - min_{k<=i}
    # M_k with M_i = sum(S - A_k), so two partitioned windows compute
    # every wait exactly in integer seconds.  The deterministic service
    # time is S = floor(4/5 * mean interarrival) — integer arithmetic
    # on the span/arrival totals, giving utilization ~0.8 at every sf.
    oracle=f"""
    WITH {_ES_SQL},
    spans AS (
      SELECT user_id, MAX(sec) - MIN(sec) AS span,
             COUNT(*) - 1 AS m
      FROM es GROUP BY user_id
    ),
    svc AS (
      SELECT CAST(SUM(span) * 4 // (SUM(m) * 5) AS BIGINT) AS s,
             CAST(SUM(span) AS BIGINT) AS tot_span,
             CAST(SUM(m) AS BIGINT) AS tot_m
      FROM spans WHERE m > 0
    ),
    seq AS (
      SELECT e.user_id, e.sec, e.event_id, svc.s,
             e.sec - lag(e.sec) OVER (PARTITION BY e.user_id
                                      ORDER BY e.sec, e.event_id) AS a
      FROM es e CROSS JOIN svc
    ),
    lind AS (
      SELECT user_id,
             SUM(CASE WHEN a IS NULL THEN 0 ELSE s - a END)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS UNBOUNDED PRECEDING) AS cum,
             sec, event_id
      FROM seq
    ),
    waits AS (
      SELECT cum - MIN(cum) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                  ROWS UNBOUNDED PRECEDING) AS w
      FROM lind
    )
    SELECT (SELECT s FROM svc) AS service_s,
           round(CAST((SELECT s FROM svc) AS DOUBLE) * (SELECT tot_m FROM svc)
                 / (SELECT tot_span FROM svc), 6) AS utilization,
           CAST(COUNT(*) AS BIGINT) AS n_arrivals,
           round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS mean_wait_s,
           CAST(MAX(w) AS BIGINT) AS max_wait_s,
           round(CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS delayed_share
    FROM waits
    """,
)


def _dlindley(spark, sf_dir):
    """Lindley waits via the prefix-min identity — two windows on one
    user-partitioned shuffle plus a 1-row service-time broadcast."""
    es = _es_frame(spark, sf_dir)
    spans = es.groupBy("user_id").agg(
        (F.max("sec") - F.min("sec")).alias("span"),
        (F.count("*") - 1).alias("m"),
    )
    svc = spans.filter(F.col("m") > 0).agg(
        F.expr("CAST(SUM(span) * 4 div (SUM(m) * 5) AS BIGINT)").alias("s"),
        F.sum("span").cast("long").alias("tot_span"),
        F.sum("m").cast("long").alias("tot_m"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = es.crossJoin(F.broadcast(svc)).select(
        "user_id",
        "sec",
        "event_id",
        "s",
        "tot_span",
        "tot_m",
        (F.col("sec") - F.lag("sec").over(w)).alias("a"),
    )
    lind = seq.select(
        "user_id",
        "sec",
        "event_id",
        "s",
        "tot_span",
        "tot_m",
        F.sum(
            F.when(F.col("a").isNull(), 0).otherwise(F.col("s") - F.col("a"))
        )
        .over(wcum)
        .alias("cum"),
    )
    waits = lind.select(
        "s",
        "tot_span",
        "tot_m",
        (F.col("cum") - F.min("cum").over(wcum)).alias("w"),
    )
    return waits.agg(
        F.max("s").alias("service_s"),
        F.round(
            F.max("s").cast("double") * F.max("tot_m") / F.max("tot_span"), 6
        ).alias("utilization"),
        F.count("*").cast("long").alias("n_arrivals"),
        F.round(F.sum("w").cast("double") / F.count("*"), 6).alias("mean_wait_s"),
        F.max("w").cast("long").alias("max_wait_s"),
        F.round(
            F.sum(F.when(F.col("w") > 0, 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("delayed_share"),
    )


CATALOG["evt_lindley_virtual_wait"].fn = _dlindley


# 30-minute-gap sessions (the q18 sessionization recipe), reduced to
# (start_sec, end_sec) intervals — shared by the concurrency query.
_SESS_SQL = f"""{_ES_SQL},
    flagged AS (
      SELECT user_id, sec, event_id,
             CASE WHEN sec - lag(sec) OVER w > 1800 OR lag(sec) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM es
      WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sess AS (
      SELECT user_id, sec,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    ivals AS (
      SELECT user_id, sid, MIN(sec) AS start_sec, MAX(sec) AS end_sec
      FROM sess GROUP BY user_id, sid
    )"""


def _ivals_frame(spark, sf_dir):
    es = _es_frame(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = es.select(
        "user_id",
        "sec",
        "event_id",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > 1800)
            | F.lag("sec").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.select(
        "user_id", "sec", F.sum("new_sess").over(wcum).alias("sid")
    )
    return sess.groupBy("user_id", "sid").agg(
        F.min("sec").alias("start_sec"), F.max("sec").alias("end_sec")
    )


register(
    "evt_peak_concurrency_hours",
    # Sessions active at each hour boundary: open(H) = #sessions with
    # start hour <= H minus #sessions with end hour <= H, off two hour
    # histograms full-outer-joined and cumulated (concurrency only
    # changes at hours that contain a session boundary, so the
    # boundary-hour domain is exact for the maximum).  Top-5 busiest
    # boundaries.
    oracle=f"""
    WITH {_SESS_SQL},
    sh AS (
      SELECT start_sec // 3600 AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM ivals GROUP BY 1
    ),
    eh AS (
      SELECT end_sec // 3600 AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM ivals GROUP BY 1
    ),
    dom AS (
      SELECT COALESCE(sh.h, eh.h) AS h,
             COALESCE(sh.c, 0) AS cs, COALESCE(eh.c, 0) AS ce
      FROM sh FULL OUTER JOIN eh ON sh.h = eh.h
    ),
    open_h AS (
      SELECT h,
             CAST(SUM(cs) OVER (ORDER BY h) AS BIGINT)
             - CAST(SUM(ce) OVER (ORDER BY h) AS BIGINT) AS open_sessions
      FROM dom
    )
    SELECT strftime(make_timestamp(h * 3600 * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS hour_start,
           open_sessions
    FROM open_h ORDER BY open_sessions DESC, h LIMIT 5
    """,
)


def _dpeak(spark, sf_dir):
    """Peak session concurrency at hour boundaries."""
    ivals = _ivals_frame(spark, sf_dir)
    sh = ivals.groupBy(F.expr("start_sec div 3600").alias("h")).agg(
        F.count("*").cast("long").alias("cs")
    )
    eh = ivals.groupBy(F.expr("end_sec div 3600").alias("h")).agg(
        F.count("*").cast("long").alias("ce")
    )
    dom = (
        sh.join(eh, "h", "full")
        .select(
            "h",
            F.coalesce(F.col("cs"), F.lit(0)).alias("cs"),
            F.coalesce(F.col("ce"), F.lit(0)).alias("ce"),
        )
    )
    wcum = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    open_h = dom.select(
        "h",
        (
            F.sum("cs").over(wcum).cast("long") - F.sum("ce").over(wcum).cast("long")
        ).alias("open_sessions"),
    )
    return (
        open_h.select(
            F.date_format(
                F.timestamp_seconds(F.col("h") * 3600).cast("timestamp_ntz"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("hour_start"),
            "open_sessions",
        )
        .orderBy(F.desc("open_sessions"), "hour_start")
        .limit(5)
    )


CATALOG["evt_peak_concurrency_hours"].fn = _dpeak


register(
    "evt_busy_periods_by_type_day",
    # System busy-period structure per (event_type, day): maximal
    # event chains with <= 60 s internal gaps.  Per type: busy periods
    # per active day, mean events per busy period, mean busy duration,
    # and the busy-time utilization of the active days — the service
    # saturation profile, all exact integer seconds until the final
    # divisions.
    oracle=f"""
    WITH {_ES_SQL},
    ed AS (
      SELECT event_type, sec // 86400 AS day, sec, event_id FROM es
    ),
    flagged AS (
      SELECT event_type, day, sec, event_id,
             CASE WHEN sec - lag(sec) OVER w > 60 OR lag(sec) OVER w IS NULL
                  THEN 1 ELSE 0 END AS nb
      FROM ed
      WINDOW w AS (PARTITION BY event_type, day ORDER BY sec, event_id)
    ),
    marked AS (
      SELECT event_type, day, sec,
             SUM(nb) OVER (PARTITION BY event_type, day ORDER BY sec, event_id
                           ROWS UNBOUNDED PRECEDING) AS bid
      FROM flagged
    ),
    per_busy AS (
      SELECT event_type, day, bid, CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(sec) - MIN(sec) AS dur
      FROM marked GROUP BY event_type, day, bid
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_busy_periods,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS n_active_days,
           round(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT day), 6)
             AS busy_per_day,
           round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
             AS events_per_busy,
           round(CAST(SUM(dur) AS DOUBLE) / COUNT(*), 6) AS mean_busy_s,
           round(CAST(SUM(dur) AS DOUBLE) / (COUNT(DISTINCT day) * 86400), 9)
             AS busy_utilization
    FROM per_busy
    GROUP BY event_type ORDER BY event_type
    """,
)


def _dbusy(spark, sf_dir):
    """Busy periods per (type, day) — island detection on the bounded
    partition key, one grouped rollup per type."""
    es = _es_frame(spark, sf_dir)
    ed = es.select(
        "event_type", F.expr("sec div 86400").alias("day"), "sec", "event_id"
    )
    w = Window.partitionBy("event_type", "day").orderBy("sec", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ed.select(
        "event_type",
        "day",
        "sec",
        "event_id",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > 60)
            | F.lag("sec").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("nb"),
    )
    marked = flagged.select(
        "event_type", "day", "sec", F.sum("nb").over(wcum).alias("bid")
    )
    per_busy = marked.groupBy("event_type", "day", "bid").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.max("sec") - F.min("sec")).alias("dur"),
    )
    return (
        per_busy.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_busy_periods"),
            F.countDistinct("day").cast("long").alias("n_active_days"),
            F.round(F.count("*").cast("double") / F.countDistinct("day"), 6).alias(
                "busy_per_day"
            ),
            F.round(F.sum("n_events").cast("double") / F.count("*"), 6).alias(
                "events_per_busy"
            ),
            F.round(F.sum("dur").cast("double") / F.count("*"), 6).alias(
                "mean_busy_s"
            ),
            F.round(
                F.sum("dur").cast("double") / (F.countDistinct("day") * 86400), 9
            ).alias("busy_utilization"),
        )
        .orderBy("event_type")
    )


CATALOG["evt_busy_periods_by_type_day"].fn = _dbusy


register(
    "evt_pk_load_report_by_type",
    # M/G/1 load report per event type: arrival rate lambda =
    # (n-1)/span, holding-time moments E[S], E[S^2] from the DECIMAL
    # value column (seconds), utilization rho = lambda*E[S], and the
    # Pollaczek-Khinchine mean queueing delay W_q = lambda*E[S^2] /
    # (2(1 - rho)).  One grouped aggregate; exact decimal moments.
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(epoch(date_trunc('second', ts)))
                - MIN(epoch(date_trunc('second', ts))) AS BIGINT) AS span_s,
           round((COUNT(*) - 1) / CAST(MAX(epoch(date_trunc('second', ts)))
                - MIN(epoch(date_trunc('second', ts))) AS DOUBLE) * 3600, 6)
             AS lambda_per_hour,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
             AS es_mean_s,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))
                          * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS es2_mean,
           round((COUNT(*) - 1) / CAST(MAX(epoch(date_trunc('second', ts)))
                - MIN(epoch(date_trunc('second', ts))) AS DOUBLE)
                 * (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)),
                 9) AS rho,
           round((COUNT(*) - 1) / CAST(MAX(epoch(date_trunc('second', ts)))
                - MIN(epoch(date_trunc('second', ts))) AS DOUBLE)
                 * (CAST(SUM(CAST(value AS DECIMAL(18,2))
                            * CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                 / (2 * (1 - (COUNT(*) - 1)
                         / CAST(MAX(epoch(date_trunc('second', ts)))
                                - MIN(epoch(date_trunc('second', ts))) AS DOUBLE)
                         * (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                            / COUNT(*)))), 6) AS pk_wait_s
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)


def _dpk(spark, sf_dir):
    """P-K delay per type — one grouped aggregate, decimal moments."""
    ev = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        (
            F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
        ).cast("long").alias("span_s"),
        F.sum(dec).alias("sv"),
        F.sum(dec * dec).alias("sv2"),
    )
    lam = (F.col("n") - 1) / F.col("span_s").cast("double")
    es = F.col("sv").cast("double") / F.col("n")
    es2 = F.col("sv2").cast("double") / F.col("n")
    return g.select(
        "event_type",
        "n",
        "span_s",
        F.round(lam * 3600, 6).alias("lambda_per_hour"),
        F.round(es, 6).alias("es_mean_s"),
        F.round(es2, 6).alias("es2_mean"),
        F.round(lam * es, 9).alias("rho"),
        F.round(lam * es2 / (2 * (1 - lam * es)), 6).alias("pk_wait_s"),
    ).orderBy("event_type")


CATALOG["evt_pk_load_report_by_type"].fn = _dpk


# Erlang-B power series: E^k built by an explicit left-associated
# product (identical text in both engines), k! as literals.
_FACT = [1, 1, 2, 6, 24, 120, 720, 5040, 40320, 362880, 3628800]
_EPOW_CASE = "CASE c WHEN 0 THEN 1.0 " + " ".join(
    f"WHEN {k} THEN {' * '.join(['e'] * k)}" for k in range(1, 11)
) + " END"
_TERM_EXPR = (
    f"CAST(floor(round(({_EPOW_CASE}) / (CASE c "
    + " ".join(f"WHEN {k} THEN {_FACT[k]}.0" for k in range(0, 11))
    + " END), 12) * 1000000000000 + 0.5) AS BIGINT)"
)

register(
    "evt_erlang_b_sweep",
    # Erlang-B blocking probability B(c, E) for c = 1..10 servers at
    # the measured offered load E = lambda * E[hold] (hold = value
    # seconds): B(c) = (E^c/c!) / sum_{k<=c} E^k/k!.  E^k is an
    # explicit product chain (no pow), each series term quantizes to
    # picounits, and the cumulative denominator is an integer window
    # sum over the 11-row series.
    oracle=f"""
    WITH load AS (
      SELECT (COUNT(*) - 1)
             / CAST(MAX(epoch(date_trunc('second', ts)))
                    - MIN(epoch(date_trunc('second', ts))) AS DOUBLE)
             * (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS e
      FROM events
    ),
    ks(c) AS (VALUES {", ".join(f"({k})" for k in range(0, 11))}),
    terms AS (
      SELECT ks.c, {_TERM_EXPR} AS t12
      FROM ks CROSS JOIN load
    ),
    cum AS (
      SELECT c, t12,
             CAST(SUM(t12) OVER (ORDER BY c) AS BIGINT) AS d12
      FROM terms
    )
    SELECT c AS servers,
           round((SELECT e FROM load), 9) AS offered_erlangs,
           round(CAST(t12 AS DOUBLE) / d12, 9) AS blocking_prob
    FROM cum WHERE c >= 1 ORDER BY c
    """,
)


def _derlang(spark, sf_dir):
    """Erlang-B sweep: 1-row load scalar x 11-row server series."""
    ev = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    load = ev.agg(
        (
            (F.count("*") - 1)
            / (
                F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
            ).cast("double")
            * (F.sum(dec).cast("double") / F.count("*"))
        ).alias("e")
    )
    ks = spark.range(0, 11).select(F.col("id").cast("int").alias("c"))
    terms = ks.crossJoin(F.broadcast(load)).select(
        "c", "e", F.expr(_TERM_EXPR).alias("t12")
    )
    wcum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = terms.select(
        "c", "e", "t12", F.sum("t12").over(wcum).cast("long").alias("d12")
    )
    return (
        cum.filter(F.col("c") >= 1)
        .select(
            F.col("c").cast("int").alias("servers"),
            F.round(F.col("e"), 9).alias("offered_erlangs"),
            F.round(F.col("t12").cast("double") / F.col("d12"), 9).alias(
                "blocking_prob"
            ),
        )
        .orderBy("servers")
    )


CATALOG["evt_erlang_b_sweep"].fn = _derlang
