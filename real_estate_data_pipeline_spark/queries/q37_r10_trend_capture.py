"""Split from queries.py lines 25517-25858 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, dedup, register, t
from .q15_curation_r3 import _minhash_portable_oracle

# ===========================================================================
# round-10 wave 6: Mann-Kendall trend, capture-recapture dedup-coverage
# estimation, inter-event burstiness, aging buckets.
# ===========================================================================

register(
    "evt_mann_kendall_trend",
    # the nonparametric trend test that pairs with the Theil-Sen slope:
    # Mann-Kendall S = sum over day pairs of sign(x_j - x_i) on the
    # daily value series, tie-corrected variance, continuity-corrected
    # z. The pair space is the bounded calendar-day frame (never raw
    # events); every term is an exact integer until the final division.
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT)
                 AS s
      FROM d a JOIN d b ON a.day < b.day
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    ties AS (
      SELECT CAST(COALESCE(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)), 0)
                  AS BIGINT) AS tsum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY cents
            HAVING COUNT(*) > 1)
    )
    SELECT n.n AS n_days, s.s AS mk_s,
           round((CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5) - ties.tsum)
                 / 18.0, 6) AS var_s,
           round(CASE WHEN s.s > 0 THEN (s.s - 1.0) ELSE
                      CASE WHEN s.s < 0 THEN (s.s + 1.0) ELSE 0.0 END END
                 / sqrt((CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5)
                         - ties.tsum) / 18.0), 6) AS mk_z
    FROM s CROSS JOIN n CROSS JOIN ties
    """,
)


def _dmannkendall(spark, sf_dir):
    """Mann-Kendall: the corpus reduces to one per-day aggregate, the
    sign-pair sum runs on that bounded frame's self-join (435 pairs
    for a month — constant work at any data scale), tie groups come
    from one more grouped count. The monotone-trend gate run before
    fitting any slope."""
    ev = t(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg((F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    a = d.select(F.col("day").alias("ad"), F.col("cents").alias("ac"))
    b = d.select(F.col("day").alias("bd"), F.col("cents").alias("bc"))
    s = (
        a.join(F.broadcast(b), F.col("ad") < F.col("bd"))
        .agg(
            F.sum(
                F.when(F.col("bc") > F.col("ac"), 1)
                .when(F.col("bc") < F.col("ac"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    n = d.agg(F.count("*").cast("long").alias("n"))
    t3 = F.col("t").cast("decimal(12,0)")
    ties = (
        d.groupBy("cents")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(F.sum(t3 * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0))
            .cast("long")
            .alias("tsum")
        )
    )
    var_s = (
        F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tsum")
    ) / 18.0
    z = (
        F.when(F.col("s") > 0, F.col("s") - 1.0)
        .otherwise(F.when(F.col("s") < 0, F.col("s") + 1.0).otherwise(0.0))
    ) / F.sqrt(var_s)
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_days"),
            F.col("s").alias("mk_s"),
            F.round(var_s, 6).alias("var_s"),
            F.round(z, 6).alias("mk_z"),
        )
    )


CATALOG["evt_mann_kendall_trend"].fn = _dmannkendall

register(
    "dedup_capture_recapture",
    # how many near-dup pairs exist that NO detector found? Capture-
    # recapture over two independent-ish detectors — the portable
    # MinHash pairs (est >= 0.5) and the blocked exact token-Jaccard
    # pairs (>= 0.5) — gives the Lincoln-Petersen and Chapman
    # estimates of the TOTAL pair population from the overlap. The
    # ecology estimator repurposed as dedup-coverage QA; every count
    # is an exact integer, each estimate is one division.
    oracle=f"""
    WITH mh AS MATERIALIZED (
      SELECT id_a, id_b FROM ({_minhash_portable_oracle()})
    ),
    ng AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM (
        SELECT doc_id, source, lang, n_chars // 100 AS len_bucket,
               list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tk
        FROM documents
      ) a JOIN (
        SELECT doc_id, source, lang, n_chars // 100 AS len_bucket,
               list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tk
        FROM documents
      ) b
        ON a.source = b.source AND a.lang = b.lang
           AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
               / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.5
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_both
      FROM mh JOIN ng USING (id_a, id_b)
    ),
    c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM mh),
    c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM ng)
    SELECT c1.n1 AS n_minhash, c2.n2 AS n_jaccard, m.n_both AS n_overlap,
           round(CAST(CAST(c1.n1 AS HUGEINT) * c2.n2 AS DOUBLE)
                 / NULLIF(m.n_both, 0), 6) AS lincoln_petersen,
           round(CAST(CAST(c1.n1 + 1 AS HUGEINT) * (c2.n2 + 1) AS DOUBLE)
                 / (m.n_both + 1) - 1.0, 6) AS chapman_estimate
    FROM c1 CROSS JOIN c2 CROSS JOIN m
    """,
)


def _dcapturerecapture(spark, sf_dir):
    """Capture-recapture dedup coverage: both detectors already run at
    bounded pair-space cost (banded MinHash; blocked exact Jaccard),
    the overlap is one equi-join on the pair key, and the population
    estimates are single divisions — the cheapest honest answer to
    'what share of near-dups are we missing'."""
    d = t(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.expr("n_chars div 100")
    )
    mh = (
        dedup.minhash_dup_pairs_portable(
            t(spark, sf_dir, "documents"), "doc_id", "text",
            num_perm=16, bands=4, jaccard_threshold=0.5,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    ng = (
        dedup.ngram_jaccard_pairs(
            d, "doc_id", "text", ["source", "lang", "len_bucket"], threshold=0.5
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    m = mh.join(ng, ["id_a", "id_b"]).agg(
        F.count("*").cast("long").alias("n_both")
    )
    c1 = mh.agg(F.count("*").cast("long").alias("n1"))
    c2 = ng.agg(F.count("*").cast("long").alias("n2"))
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(m))
        .select(
            F.col("n1").alias("n_minhash"),
            F.col("n2").alias("n_jaccard"),
            F.col("n_both").alias("n_overlap"),
            F.round(
                (F.col("n1").cast("decimal(19,0)") * F.col("n2")).cast("double")
                / F.nullif(F.col("n_both"), F.lit(0)),
                6,
            ).alias("lincoln_petersen"),
            F.round(
                ((F.col("n1") + 1).cast("decimal(19,0)") * (F.col("n2") + 1)).cast(
                    "double"
                )
                / (F.col("n_both") + 1)
                - 1.0,
                6,
            ).alias("chapman_estimate"),
        )
    )


CATALOG["dedup_capture_recapture"].fn = _dcapturerecapture

register(
    "evt_burstiness_index",
    # is user activity bursty or Poisson-regular? Per event type (of
    # the later event), inter-event gaps on each user's timeline in
    # FLOORED seconds (the sessionization convention — Spark's
    # unix_timestamp floors), then CV = sd/mean from exact integer
    # moment sums and the Goh-Barabási burstiness B = (sd-mean)/
    # (sd+mean) in one shared-order expression. B ~ 0 is Poisson,
    # B -> 1 is bursty.
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               - CAST(FLOOR(epoch(LAG(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)))
                      AS BIGINT) AS gap
      FROM events
    ),
    a AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS s,
             CAST(SUM(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS sq
      FROM g WHERE gap IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_gaps,
           round(CAST(s AS DOUBLE) / n, 6) AS mean_gap_s,
           round(sqrt((n * sq - CAST(s AS DOUBLE) * s)
                      / (CAST(n AS DOUBLE) * (n - 1)))
                 / (CAST(s AS DOUBLE) / n), 6) AS cv,
           round((sqrt((n * sq - CAST(s AS DOUBLE) * s)
                       / (CAST(n AS DOUBLE) * (n - 1)))
                  - CAST(s AS DOUBLE) / n)
                 / (sqrt((n * sq - CAST(s AS DOUBLE) * s)
                         / (CAST(n AS DOUBLE) * (n - 1)))
                    + CAST(s AS DOUBLE) / n), 6) AS burstiness
    FROM a ORDER BY event_type
    """,
)


def _dburstiness(spark, sf_dir):
    """Burstiness per event type: one lag window per user timeline,
    one grouped moment aggregate — the dispersion diagnostic that
    tells a rate-limiter / capacity planner whether mean arrival rates
    are even meaningful."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp(F.col("ts").cast("timestamp")).cast("long")
    g = ev.select(
        "event_type",
        (sec - F.unix_timestamp(F.lag("ts").over(w).cast("timestamp")).cast("long")).alias(
            "gap"
        ),
    ).filter(F.col("gap").isNotNull())
    a = g.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("gap").cast("long").alias("s"),
        F.sum(F.col("gap").cast("decimal(18,0)") * F.col("gap"))
        .cast("double")
        .alias("sq"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("n") * F.col("sq") - F.col("s").cast("double") * F.col("s"))
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    return a.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(sd / mean, 6).alias("cv"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
    ).orderBy("event_type")


CATALOG["evt_burstiness_index"].fn = _dburstiness

register(
    "orders_aging_buckets",
    # the aging report every operations dashboard carries: open (non-
    # finished) orders bucketed by age as of the latest order date in
    # the data (a deterministic as-of), with counts and exposed value
    # per bucket. Ages are exact day differences; buckets are integer
    # boundaries.
    oracle="""
    WITH refd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
    open_o AS (
      SELECT date_diff('day', CAST(o_orderdate AS DATE), refd.d0) AS age,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders CROSS JOIN refd
      WHERE o_orderstatus <> 'F'
    )
    SELECT CASE WHEN age <= 30 THEN 'a_0_30'
                WHEN age <= 90 THEN 'b_31_90'
                WHEN age <= 365 THEN 'c_91_365'
                ELSE 'd_over_365' END AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS open_value
    FROM open_o
    GROUP BY 1 ORDER BY 1
    """,
)


def _daging(spark, sf_dir):
    """Aging buckets: one max-date scalar, one filtered scan with an
    integer datediff, one 4-row rollup — the receivables/backlog shape
    that at 100 TB is a partition-pruned scan plus a broadcast
    scalar."""
    o = t(spark, sf_dir, "orders")
    asof = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("d0"))
    open_o = (
        o.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(asof))
        .select(
            F.datediff(F.col("d0"), F.col("o_orderdate").cast("date")).alias("age"),
            (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age") <= 30, "a_0_30")
        .when(F.col("age") <= 90, "b_31_90")
        .when(F.col("age") <= 365, "c_91_365")
        .otherwise("d_over_365")
    )
    return (
        open_o.groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (F.sum("cents").cast("long") / 100.0).alias("open_value"),
        )
        .orderBy("age_bucket")
    )


CATALOG["orders_aging_buckets"].fn = _daging


