"""Split from queries.py lines 27040-27635 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t, text, tok_arr
from .q09_llm_dedup_text_sim import _LANG_CASE_SQL
from .q15_curation_r3 import _NB_CTES, _nb_frames
from .q26_r8_mixed import _SRC_TC_CTES

# ===========================================================================
# round-10 wave 9: multi-rater agreement, vocabulary overlap, PR curve,
# behavioral-profile similarity, churn cohorts, the SQL-surface window.
# ===========================================================================

# The three-rater machinery, single-sourced: Fleiss' kappa and nominal
# Krippendorff's alpha (round 12) close over the SAME per-doc category
# count frame, so the two chance-models can never see different ratings.
_FLEISS_CELLS_CTES = f"""pred AS (
      SELECT doc_id, lang AS r1 FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score6 DESC, lang) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    heur AS ({_LANG_CASE_SQL.replace("lang_pred", "r2")}),
    prior_lang AS (
      SELECT lang AS r3 FROM nd ORDER BY n DESC, lang LIMIT 1
    ),
    r AS MATERIALIZED (
      SELECT td.doc_id, p.r1, h.r2, pl.r3
      FROM test_docs td
      JOIN pred p USING (doc_id)
      JOIN heur h USING (doc_id)
      CROSS JOIN prior_lang pl
    ),
    melt AS (
      SELECT doc_id, r1 AS cat FROM r
      UNION ALL SELECT doc_id, r2 FROM r
      UNION ALL SELECT doc_id, r3 FROM r
    ),
    cells AS MATERIALIZED (
      SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS nij
      FROM melt GROUP BY doc_id, cat
    )"""


def _fleiss_cells(spark, sf_dir):
    """Spark twin of _FLEISS_CELLS_CTES: the per-(doc, category) rating
    count frame of the three language raters — checkpointed,
    multi-consumed by the k-rater agreement family."""
    from ..ops import text

    test, scored, _train, nd = _nb_frames(spark, sf_dir, with_train=True)
    w = Window.partitionBy("doc_id").orderBy(F.desc("__score6"), "lang")
    pred = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("lang").alias("r1"))
    )
    d = t(spark, sf_dir, "documents")
    heur = d.select("doc_id", text.lang_id(F.col("text")).alias("r2"))
    # constant-prior rater from the SHARED nd aggregate — no second
    # pass over the train frame and no second copy of the count logic
    # (review findings, passes 4 and 5)
    prior_lang = (
        nd.orderBy(F.desc("__n"), "lang").limit(1).select(F.col("lang").alias("r3"))
    )
    r = (
        test.select("doc_id")
        .join(pred, "doc_id")
        .join(heur, "doc_id")
        .crossJoin(F.broadcast(prior_lang))
        .localCheckpoint(eager=False)
    )
    melt = (
        r.select("doc_id", F.col("r1").alias("cat"))
        .unionByName(r.select("doc_id", F.col("r2").alias("cat")))
        .unionByName(r.select("doc_id", F.col("r3").alias("cat")))
    )
    return melt.groupBy("doc_id", "cat").agg(
        F.count("*").cast("long").alias("nij")
    ).localCheckpoint(eager=False)


register(
    "ml_fleiss_kappa_lang",
    # agreement beyond TWO raters: Fleiss' kappa over THREE language
    # raters on the NB test split — the trained NB, the stopword
    # heuristic, and the constant prior (always the most common train
    # language; the baseline every non-trivial rater must beat). With
    # n=3 ratings per doc, per-doc agreement is (sum n_ij^2 - 3)/6 and
    # everything stays exact integers until the closing divisions.
    oracle=f"""
    WITH {_NB_CTES},
    {_FLEISS_CELLS_CTES},
    perdoc AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n,
             CAST(SUM(nij * nij) AS BIGINT) AS ss
      FROM cells
    ),
    marg AS (
      SELECT CAST(SUM(CAST(cj AS HUGEINT) * cj) AS BIGINT) AS sc2
      FROM (SELECT cat, CAST(SUM(nij) AS BIGINT) AS cj FROM cells GROUP BY cat)
    )
    SELECT n AS n_docs,
           round((CAST(ss AS DOUBLE) - 3.0 * n) / (6.0 * n), 6) AS p_bar,
           round(CAST(sc2 AS DOUBLE) / (9.0 * n) / n, 6) AS p_expected,
           round(((CAST(ss AS DOUBLE) - 3.0 * n) / (6.0 * n)
                  - CAST(sc2 AS DOUBLE) / (9.0 * n) / n)
                 / (1.0 - CAST(sc2 AS DOUBLE) / (9.0 * n) / n), 6) AS fleiss_kappa
    FROM perdoc CROSS JOIN marg
    """,
)


def _dfleiss(spark, sf_dir):
    """Fleiss' kappa: the three raters' verdicts melt into one
    (doc, category) count frame (the only shuffle past the shared NB
    pipeline), per-doc agreement and pooled marginals are two
    aggregates over it — k-rater agreement at GROUP BY cost. Closes
    over the shared _fleiss_cells frame."""
    cells = _fleiss_cells(spark, sf_dir)
    perdoc = cells.agg(
        F.countDistinct("doc_id").cast("long").alias("n"),
        F.sum(F.col("nij") * F.col("nij")).cast("long").alias("ss"),
    )
    marg = (
        cells.groupBy("cat")
        .agg(F.sum("nij").cast("long").alias("cj"))
        .agg(
            F.sum(F.col("cj").cast("decimal(19,0)") * F.col("cj"))
            .cast("long")
            .alias("sc2")
        )
    )
    n = F.col("n")
    p_bar = (F.col("ss").cast("double") - 3.0 * n) / (6.0 * n)
    p_e = F.col("sc2").cast("double") / (9.0 * n) / n
    return perdoc.crossJoin(F.broadcast(marg)).select(
        n.alias("n_docs"),
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_expected"),
        F.round((p_bar - p_e) / (1.0 - p_e), 6).alias("fleiss_kappa"),
    )


CATALOG["ml_fleiss_kappa_lang"].fn = _dfleiss

register(
    "doc_vocab_overlap_sources",
    # the set-level companion to the KL/JS probability divergences:
    # vocabulary Jaccard between every source pair (shared types /
    # union types) plus each side's exclusive count — pure integer
    # set algebra over the shared (source, token) count table.
    oracle=f"""
    WITH {_SRC_TC_CTES},
    grid AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM (SELECT DISTINCT source FROM tc) a
      JOIN (SELECT DISTINCT source FROM tc) b ON a.source < b.source
    ),
    u AS (
      SELECT g.src_a, g.src_b,
             CASE WHEN ca.c IS NOT NULL THEN 1 ELSE 0 END AS ina,
             CASE WHEN cb.c IS NOT NULL THEN 1 ELSE 0 END AS inb
      FROM grid g
      CROSS JOIN (SELECT DISTINCT tok FROM tc) t
      LEFT JOIN tc ca ON ca.source = g.src_a AND ca.tok = t.tok
      LEFT JOIN tc cb ON cb.source = g.src_b AND cb.tok = t.tok
      WHERE ca.c IS NOT NULL OR cb.c IS NOT NULL
    )
    SELECT src_a, src_b,
           CAST(SUM(ina * inb) AS BIGINT) AS n_shared,
           CAST(COUNT(*) AS BIGINT) AS n_union,
           CAST(SUM(ina * (1 - inb)) AS BIGINT) AS n_only_a,
           CAST(SUM((1 - ina) * inb) AS BIGINT) AS n_only_b,
           round(CAST(SUM(ina * inb) AS DOUBLE) / COUNT(*), 6) AS vocab_jaccard
    FROM u GROUP BY src_a, src_b
    ORDER BY src_a, src_b
    """,
)


def _dvocaboverlap(spark, sf_dir):
    """Vocabulary overlap matrix: the per-token source map from the
    divergence skeleton feeds a 190-row pair grid broadcast; shared /
    exclusive / union counts reduce in one aggregate — which sources
    even speak the same language, before asking how differently."""
    d = t(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(tok_arr(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    srcs = tc.select("source").distinct()
    ta = srcs.withColumnsRenamed({"source": "src_a"})
    tb = srcs.withColumnsRenamed({"source": "src_b"})
    grid = ta.join(tb, ta.src_a < tb.src_b)
    m = tc.groupBy("tok").agg(
        F.map_from_entries(F.collect_list(F.struct("source", "c"))).alias("cm")
    )
    u = (
        m.crossJoin(F.broadcast(grid))
        .select(
            "src_a",
            "src_b",
            F.when(F.element_at("cm", F.col("src_a")).isNotNull(), 1)
            .otherwise(0)
            .alias("ina"),
            F.when(F.element_at("cm", F.col("src_b")).isNotNull(), 1)
            .otherwise(0)
            .alias("inb"),
        )
        .filter((F.col("ina") == 1) | (F.col("inb") == 1))
    )
    return (
        u.groupBy("src_a", "src_b")
        .agg(
            F.sum(F.col("ina") * F.col("inb")).cast("long").alias("n_shared"),
            F.count("*").cast("long").alias("n_union"),
            F.sum(F.col("ina") * (1 - F.col("inb"))).cast("long").alias("n_only_a"),
            F.sum((1 - F.col("ina")) * F.col("inb")).cast("long").alias("n_only_b"),
            F.round(
                F.sum(F.col("ina") * F.col("inb")).cast("double") / F.count("*"), 6
            ).alias("vocab_jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


CATALOG["doc_vocab_overlap_sources"].fn = _dvocaboverlap

# The price-band classifier machinery, single-sourced: the PR curve,
# Youden's J sweep and the MCC confusion (round 12) all read the SAME
# band histogram and class totals, so the operating points they report
# are points on the SAME curve.
_PU_VC_CTES = """x AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100000 AS band
      FROM orders
    ),
    vc AS MATERIALIZED (
      SELECT band,
             CAST(SUM(pos) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n0
      FROM x GROUP BY band
    ),
    tot AS (
      SELECT CAST(SUM(n1) AS BIGINT) AS np, CAST(SUM(n0) AS BIGINT) AS nn0 FROM vc
    )"""


def _price_urgent_vc(spark, sf_dir):
    """Spark twin of _PU_VC_CTES: returns (vc, tot) — the bounded
    price-band class histogram (checkpointed) and its 1-row class
    totals — shared by the threshold-sweep classifier family."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("pos"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000"
        ).alias("band"),
    )
    vc = x.groupBy("band").agg(
        F.sum("pos").cast("long").alias("n1"),
        (F.count("*") - F.sum("pos")).cast("long").alias("n0"),
    ).localCheckpoint(eager=False)
    tot = vc.agg(
        F.sum("n1").cast("long").alias("np"), F.sum("n0").cast("long").alias("nn0")
    )
    return vc, tot


register(
    "ml_pr_curve_price_urgent",
    # the PR curve the AUC number summarizes: precision/recall/F1 of
    # 'price band >= t' as an urgent-priority classifier at nine fixed
    # thresholds, all read off ONE cumulative pass over the same
    # bounded band histogram the AUC query builds. Exact integers until
    # the per-row divisions.
    oracle=f"""
    WITH {_PU_VC_CTES},
    thr AS (SELECT unnest(generate_series(50, 450, 50)) AS t),
    pr AS (
      SELECT thr.t,
             CAST(SUM(CASE WHEN vc.band >= thr.t THEN vc.n1 ELSE 0 END) AS BIGINT)
                 AS tp,
             CAST(SUM(CASE WHEN vc.band >= thr.t THEN vc.n0 ELSE 0 END) AS BIGINT)
                 AS fp
      FROM thr CROSS JOIN vc GROUP BY thr.t
    )
    SELECT pr.t AS threshold_band, tp AS n_true_pos, fp AS n_false_pos,
           round(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision_,
           round(CAST(tp AS DOUBLE) / tot.np, 6) AS recall_,
           round(2.0 * tp / NULLIF(tp + fp + tot.np, 0), 6) AS f1
    FROM pr CROSS JOIN tot
    ORDER BY threshold_band
    """,
)


def _dprcurve(spark, sf_dir):
    """PR curve: one histogram pass, a 9-row threshold grid broadcast
    over the ~500-row band frame, per-threshold sums — the full
    operating-point sweep for the cost of the AUC query. Closes over
    the shared _price_urgent_vc machinery."""
    vc, tot = _price_urgent_vc(spark, sf_dir)
    thr = spark.range(50, 451, 50).select(F.col("id").cast("long").alias("t"))
    pr = (
        vc.crossJoin(F.broadcast(thr))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("band") >= F.col("t"), F.col("n1")).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(F.col("band") >= F.col("t"), F.col("n0")).otherwise(0))
            .cast("long")
            .alias("fp"),
        )
    )
    return (
        pr.crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("threshold_band"),
            F.col("tp").alias("n_true_pos"),
            F.col("fp").alias("n_false_pos"),
            F.round(
                F.col("tp").cast("double")
                / F.nullif((F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0)),
                6,
            ).alias("precision_"),
            F.round(F.col("tp").cast("double") / F.col("np"), 6).alias("recall_"),
            F.round(
                2.0
                * F.col("tp")
                / F.nullif(
                    (F.col("tp") + F.col("fp") + F.col("np")).cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("f1"),
        )
        .orderBy("threshold_band")
    )


CATALOG["ml_pr_curve_price_urgent"].fn = _dprcurve

register(
    "evt_type_profile_similarity",
    # which event types share a daily rhythm? Each type's 24-hour
    # activity histogram becomes a micro-quantized share vector, and
    # every type pair gets the cosine of those vectors — integer dot
    # products over a k x 24 frame, so the similarity matrix is exact
    # and costs nothing beyond the hourly rollup.
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(date_part('hour', ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
    sh AS MATERIALIZED (
      SELECT h.event_type, h.hod,
             CAST(floor(round(CAST(h.c AS DOUBLE) / tot.n, 6) * 1000000 + 0.5)
                  AS BIGINT) AS s6
      FROM h JOIN tot USING (event_type)
    ),
    -- zero-padded cosine: the dot product over SHARED hours (missing
    -- hours contribute 0, so the inner join is exact for the dot) but
    -- each norm over the type's OWN full support — norms restricted to
    -- shared hours would score a 1-hour type against a 24-hour type as
    -- cosine 1.0 (review finding); the pair grid keeps disjoint-support
    -- pairs in the output with cosine 0.
    n2 AS MATERIALIZED (
      SELECT event_type, CAST(SUM(CAST(s6 AS HUGEINT) * s6) AS BIGINT) AS nrm2
      FROM sh GROUP BY event_type
    ),
    grid AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM n2 a JOIN n2 b ON a.event_type < b.event_type
    ),
    dots AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(SUM(CAST(a.s6 AS HUGEINT) * b.s6) AS BIGINT) AS dot
      FROM sh a JOIN sh b ON a.hod = b.hod AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT g.type_a, g.type_b,
           round(CAST(COALESCE(d.dot, 0) AS DOUBLE)
                 / sqrt(CAST(na.nrm2 AS DOUBLE))
                 / sqrt(CAST(nb.nrm2 AS DOUBLE)), 6) AS profile_cosine
    FROM grid g
    LEFT JOIN dots d ON d.type_a = g.type_a AND d.type_b = g.type_b
    JOIN n2 na ON na.event_type = g.type_a
    JOIN n2 nb ON nb.event_type = g.type_b
    ORDER BY g.type_a, g.type_b
    """,
)


def _dprofilesim(spark, sf_dir):
    """Hourly-profile cosine matrix: one hourly rollup, a self-join on
    the 24-hour key over the k x 24 share frame (bounded by the type
    domain, never by events), one aggregate per pair — behavioral
    clustering input at GROUP BY cost."""
    ev = t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hod")
    ).agg(F.count("*").cast("long").alias("c"))
    tot = h.groupBy("event_type").agg(F.sum("c").cast("long").alias("n"))
    sh = (
        h.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "hod",
            F.floor(F.round(F.col("c").cast("double") / F.col("n"), 6) * 1e6 + 0.5)
            .cast("long")
            .alias("s6"),
        )
        .localCheckpoint(eager=False)
    )
    # zero-padded cosine (review finding): dot over shared hours only
    # (zero terms vanish, so the inner join is exact), but each norm
    # over the type's FULL support, and the pair grid keeps
    # disjoint-support pairs at cosine 0.
    n2 = sh.groupBy("event_type").agg(
        F.sum(F.col("s6").cast("decimal(19,0)") * F.col("s6"))
        .cast("long")
        .alias("nrm2")
    ).localCheckpoint(eager=False)
    ga = n2.select(F.col("event_type").alias("type_a"), F.col("nrm2").alias("na2"))
    gb = n2.select(F.col("event_type").alias("type_b"), F.col("nrm2").alias("nb2"))
    grid = ga.join(gb, F.col("type_a") < F.col("type_b"))
    a = sh.withColumnsRenamed({"event_type": "type_a", "s6": "sa"})
    b = sh.withColumnsRenamed({"event_type": "type_b", "s6": "sb"})
    dots = (
        a.join(b, (a.hod == b.hod) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.col("sa").cast("decimal(19,0)") * F.col("sb"))
            .cast("long")
            .alias("dot")
        )
    )
    return (
        grid.join(dots, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0)).cast("double")
                / F.sqrt(F.col("na2").cast("double"))
                / F.sqrt(F.col("nb2").cast("double")),
                6,
            ).alias("profile_cosine"),
        )
        .orderBy("type_a", "type_b")
    )


CATALOG["evt_type_profile_similarity"].fn = _dprofilesim

register(
    "evt_churn_by_first_week",
    # retention's inverse: users grouped by first-seen ISO week, churn
    # = no activity in the final 7 days of the data (a deterministic
    # as-of from max ts). Exact counts, one division per cohort — the
    # executive churn table next to the cohort-retention matrix.
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS mts FROM events),
    u AS (
      SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort_week,
             CASE WHEN last_ts < mx.mts - INTERVAL 7 DAY THEN 1 ELSE 0 END
                 AS churned
      FROM u CROSS JOIN mx
      -- right-censoring guard (review findings, passes 4 AND 5): users
      -- first seen AT or inside the final 7 days CANNOT be classified
      -- churned (churn needs last_ts < cutoff while last_ts >= first_ts),
      -- so the guard is STRICT — at the boundary first_ts = cutoff the
      -- guaranteed-zero dilution would survive a <= guard
      WHERE first_ts < mx.mts - INTERVAL 7 DAY
    )
    SELECT cohort_week,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(churned) AS BIGINT) AS n_churned,
           round(CAST(SUM(churned) AS DOUBLE) / COUNT(*), 6) AS churn_rate
    FROM c GROUP BY cohort_week
    ORDER BY cohort_week
    """,
)


def _dchurn(spark, sf_dir):
    """Churn by first-seen week: one per-user min/max aggregate, a
    1-row as-of broadcast, a cohort rollup — the churn table at the
    cost of a GROUP BY, no per-week re-scan."""
    ev = t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mts"))
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    c = (
        u.crossJoin(F.broadcast(mx))
        # right-censoring guard: only users old enough to be classifiable
        # (STRICT: at first_ts = cutoff churn is still impossible)
        .filter(F.col("first_ts") < F.col("mts") - F.expr("INTERVAL 7 DAYS"))
        .select(
            F.date_format(F.date_trunc("week", "first_ts"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.when(
                F.col("last_ts") < F.col("mts") - F.expr("INTERVAL 7 DAYS"), 1
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    return (
        c.groupBy("cohort_week")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("churned").cast("long").alias("n_churned"),
            F.round(F.sum("churned").cast("double") / F.count("*"), 6).alias(
                "churn_rate"
            ),
        )
        .orderBy("cohort_week")
    )


CATALOG["evt_churn_by_first_week"].fn = _dchurn

register(
    "sql_interface_window",
    # the SQL-first surface exercising WINDOW functions end to end:
    # per-nation monthly revenue with a running cumulative share,
    # written as one raw SQL string through the registered temp views
    # — proving the engine's SQL dialect covers analytic functions,
    # not just star joins.
    oracle="""
    WITH r AS (
      SELECT n.n_name,
             strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                 AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, month,
           round(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
           round(CAST(SUM(cents) OVER (PARTITION BY n_name ORDER BY month)
                      AS DOUBLE)
                 / SUM(cents) OVER (PARTITION BY n_name), 6) AS cum_share
    FROM r
    ORDER BY n_name, month
    """,
)


def _dsqlwindow(spark, sf_dir):
    """SQL-string execution path with window functions: the running
    share and the nation total are two window frames over the SAME
    nation partitioning — one exchange — and the whole query is raw
    ANSI SQL through sql.register_tables."""
    from ..sql import sql as run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        WITH r AS (
          SELECT n.n_name,
                 date_format(date_trunc('month', o.o_orderdate), 'yyyy-MM')
                     AS month,
                 CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                     AS cents
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY 1, 2
        )
        SELECT n_name, month,
               round(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
               round(CAST(SUM(cents) OVER (PARTITION BY n_name ORDER BY month)
                          AS DOUBLE)
                     / SUM(cents) OVER (PARTITION BY n_name), 6) AS cum_share
        FROM r
        ORDER BY n_name, month
        """,
    )


CATALOG["sql_interface_window"].fn = _dsqlwindow


