"""Split from queries.py lines 35067-36743 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t, tok_arr
from .q15_curation_r3 import (
    _NB_CTES,
    _events_stream_schema,
    _run_stream_to_memory,
    _stream_file_source,
)
from .q31_r9_wave2_rank_embed import _KAPPA_J_CTES, _kappa_j
from .q40_r10_agreement_pr import _FLEISS_CELLS_CTES, _PU_VC_CTES, _fleiss_cells, _price_urgent_vc
from .q52_r12_calibration_inequality import _CAL_CTES, _cal_bands

# ===========================================================================
# Round-12 wave 7: stylometry, semi-structured DQ, factorial ANOVA, and
# the TWENTY-FIRST streaming run.
# ===========================================================================

register(
    "doc_burrows_delta_sources",
    # Burrows' Delta — the stylometric distance behind authorship
    # attribution — between every source pair: z-scores of the top-30
    # corpus tokens' relative frequencies (nano-quantized exact
    # rationals; per-token mean/sd across sources from exact integer
    # sums), Delta = mean |z_a - z_b| over the tokens. The full
    # 190-row source-pair grid, ordered.
    oracle="""
    WITH tf AS MATERIALIZED (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT source,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents WHERE text IS NOT NULL
      ) GROUP BY source, tok
    ),
    ns AS MATERIALIZED (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY source
    ),
    top30 AS MATERIALIZED (
      SELECT tok FROM (
        SELECT tok, CAST(SUM(c) AS BIGINT) AS ct,
               ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, tok) AS rn
        FROM tf GROUP BY tok
      ) WHERE rn <= 30
    ),
    grid AS MATERIALIZED (
      SELECT ns.source, t30.tok, ns.n,
             CAST(floor(CAST(COALESCE(tf.c, 0) AS DOUBLE) / ns.n * 1000000000 + 0.5)
                  AS BIGINT) AS f9
      FROM ns CROSS JOIN top30 t30
      LEFT JOIN tf ON tf.source = ns.source AND tf.tok = t30.tok
    ),
    zt AS MATERIALIZED (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(f9) AS BIGINT) AS sf,
             SUM(CAST(f9 AS HUGEINT) * f9) AS qf
      FROM grid GROUP BY tok
    ),
    z AS MATERIALIZED (
      SELECT g.source, g.tok,
             CASE WHEN zt.k * CAST(zt.qf AS DOUBLE) - CAST(zt.sf AS DOUBLE) * zt.sf <= 0.0
                  THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor((g.f9 - CAST(zt.sf AS DOUBLE) / zt.k)
                                  / sqrt((CAST(zt.qf AS DOUBLE)
                                          - CAST(zt.sf AS DOUBLE) * zt.sf / zt.k) / zt.k)
                                  * 1000000 + 0.5) AS BIGINT)
             END AS z6
      FROM grid g JOIN zt ON zt.tok = g.tok
    ),
    pd AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(SUM(abs(a.z6 - b.z6)) AS BIGINT) AS sad,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b,
           round(CAST(sad AS DOUBLE) / k / 1000000.0, 6) AS burrows_delta
    FROM pd ORDER BY source_a, source_b
    """,
)


def _dburrows(spark, sf_dir):
    """Burrows' Delta: one token-count shuffle, a 600-row source x
    top-token grid, per-token z-scores from exact moments, one
    token-keyed pair join over the bounded grid."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d19 = "decimal(19,0)"
    tf = (
        d.select("source", F.explode(tok_arr(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    ns = tf.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    top30 = (
        tf.groupBy("tok")
        .agg(F.sum("c").cast("long").alias("ct"))
        .orderBy(F.desc("ct"), "tok")
        .limit(30)
        .select("tok")
    )
    grid = (
        ns.crossJoin(F.broadcast(top30))
        .join(tf, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.floor(
                F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col("n") * 1000000000
                + 0.5
            )
            .cast("long")
            .alias("f9"),
        )
        .localCheckpoint(eager=False)
    )
    zt = grid.groupBy("tok").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("f9").cast("long").alias("sf"),
        F.sum(F.col("f9").cast(d19) * F.col("f9").cast(d19)).alias("qf"),
    )
    varn = F.col("k") * F.col("qf").cast("double") - F.col("sf").cast("double") * F.col("sf")
    z = (
        grid.join(F.broadcast(zt), "tok")
        .select(
            "source",
            "tok",
            F.when(varn <= 0.0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(
                    (F.col("f9") - F.col("sf").cast("double") / F.col("k"))
                    / F.sqrt(
                        (
                            F.col("qf").cast("double")
                            - F.col("sf").cast("double") * F.col("sf") / F.col("k")
                        )
                        / F.col("k")
                    )
                    * 1000000
                    + 0.5
                ).cast("long")
            )
            .alias("z6"),
        )
        .localCheckpoint(eager=False)
    )
    a = z.select(F.col("source").alias("source_a"), "tok", F.col("z6").alias("za"))
    b = z.select(F.col("source").alias("source_b"), "tok", F.col("z6").alias("zb"))
    pd = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.abs(F.col("za") - F.col("zb"))).cast("long").alias("sad"),
            F.count("*").cast("long").alias("k"),
        )
    )
    return pd.select(
        "source_a",
        "source_b",
        F.round(F.col("sad").cast("double") / F.col("k") / 1000000.0, 6).alias("burrows_delta"),
    ).orderBy("source_a", "source_b")


CATALOG["doc_burrows_delta_sources"].fn = _dburrows


register(
    "doc_trigram_compressibility_proxy",
    # repetitiveness scored WITHOUT a compressor: distinct-token-
    # trigram share per doc (the unigram-order proxy for LZ
    # compressibility — boilerplate repeats trigrams, prose doesn't).
    # Trigram arrays are built inside the row (no explode), per-doc
    # ratios are exact rationals micro-quantized before the per-source
    # rollup.
    oracle="""
    WITH d AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ),
    tg AS (
      SELECT source,
             list_transform(generate_series(1, len(toks) - 2),
                            i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS tris
      FROM d WHERE len(toks) >= 3
    ),
    r AS (
      SELECT source,
             CAST(floor(CAST(len(list_distinct(tris)) AS DOUBLE) / len(tris)
                        * 1000000 + 0.5) AS BIGINT) AS r6
      FROM tg
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(CAST(SUM(r6) AS BIGINT) / 1000000.0 / COUNT(*), 6) AS mean_distinct_share,
           round(MIN(r6) / 1000000.0, 6) AS min_distinct_share,
           round(MAX(r6) / 1000000.0, 6) AS max_distinct_share
    FROM r GROUP BY source ORDER BY source
    """,
)


def _dtrigramcompress(spark, sf_dir):
    """Trigram-distinctness compressibility proxy: all row-local JVM
    array ops, one bounded per-source rollup."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = tok_arr(F.col("text"))
    tg = d.select("source", toks.alias("t")).filter(F.size("t") >= 3).select(
        "source",
        F.expr(
            "transform(sequence(1, size(t) - 2), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1), ' ', element_at(t, i + 2)))"
        ).alias("tris"),
    )
    r = tg.select(
        "source",
        F.floor(
            F.size(F.array_distinct(F.col("tris"))).cast("double") / F.size("tris") * 1000000
            + 0.5
        )
        .cast("long")
        .alias("r6"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum("r6").cast("long") / 1000000.0 / F.count("*"), 6).alias(
                "mean_distinct_share"
            ),
            F.round(F.min("r6") / 1000000.0, 6).alias("min_distinct_share"),
            F.round(F.max("r6") / 1000000.0, 6).alias("max_distinct_share"),
        )
        .orderBy("source")
    )


CATALOG["doc_trigram_compressibility_proxy"].fn = _dtrigramcompress


register(
    "dq_props_json_profile",
    # semi-structured DQ: profile the JSON props payload per event
    # type — parse success share and the extracted integer field's
    # exact min/max/mean/distinct. One projection (JVM json path) +
    # one grouped aggregate; the audit every ingestion of a
    # string-typed JSON column needs before trusting it.
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
           CAST(MIN(k) AS BIGINT) AS k_min, CAST(MAX(k) AS BIGINT) AS k_max,
           round(CAST(SUM(k) AS DOUBLE) / COUNT(k), 6) AS k_mean,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS k_distinct
    FROM x GROUP BY event_type ORDER BY event_type
    """,
)


def _dpropsprofile(spark, sf_dir):
    """JSON props DQ profile: get_json_object + one grouped aggregate."""
    ev = t(spark, sf_dir, "events")
    x = ev.select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0)).cast("long").alias("n_parsed"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.round(F.sum("k").cast("double") / F.count("k"), 6).alias("k_mean"),
            F.countDistinct("k").cast("long").alias("k_distinct"),
        )
        .orderBy("event_type")
    )


CATALOG["dq_props_json_profile"].fn = _dpropsprofile


register(
    "evt_tod_entropy_by_type",
    # time-of-day concentration per event type: the 24-bucket
    # hour-of-day histogram's Shannon entropy (micro-quantized p*ln(p)
    # cell terms, per-type integer sums) plus the peak hour and its
    # share — bots spike, humans spread.
    oracle="""
    WITH h AS MATERIALIZED (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, hod, c,
             CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c DESC, hod) AS rn
      FROM h
    ),
    ent AS (
      SELECT event_type, MAX(n) AS n,
             CAST(SUM(CAST(floor((CAST(c AS DOUBLE) / n)
                                 * round(ln(CAST(c AS DOUBLE) / n), 6)
                                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS e6
      FROM w GROUP BY event_type
    ),
    pk AS (
      SELECT event_type, hod AS peak_hour, c AS peak_count, n FROM w WHERE rn = 1
    )
    SELECT pk.event_type, pk.n AS n_events, pk.peak_hour,
           round(CAST(pk.peak_count AS DOUBLE) / pk.n, 6) AS peak_share,
           round(-ent.e6 / 1000000.0, 6) AS entropy_nats
    FROM pk JOIN ent ON ent.event_type = pk.event_type
    ORDER BY pk.event_type
    """,
)


def _dtodentropy(spark, sf_dir):
    """Hour-of-day entropy per type from the 24-bucket histogram."""
    ev = t(spark, sf_dir, "events")
    h = (
        ev.groupBy("event_type", F.hour("ts").cast("long").alias("hod"))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    wn = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(F.desc("c"), "hod")
    w = h.select(
        "event_type",
        "hod",
        "c",
        F.sum("c").over(wn).cast("long").alias("n"),
        F.row_number().over(wr).alias("rn"),
    ).localCheckpoint(eager=False)
    p = F.col("c").cast("double") / F.col("n")
    ent = w.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.floor(p * F.round(F.log(p), 6) * 1000000 + 0.5).cast("long"))
        .cast("long")
        .alias("e6"),
    )
    pk = w.filter(F.col("rn") == 1).select(
        "event_type", F.col("hod").alias("peak_hour"), F.col("c").alias("peak_count"), "n"
    )
    return (
        pk.join(ent.select("event_type", "e6"), "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            "peak_hour",
            F.round(F.col("peak_count").cast("double") / F.col("n"), 6).alias("peak_share"),
            F.round(-F.col("e6") / 1000000.0, 6).alias("entropy_nats"),
        )
        .orderBy("event_type")
    )


CATALOG["evt_tod_entropy_by_type"].fn = _dtodentropy


register(
    "ml_anova_two_way_interaction",
    # two-way factorial ANOVA with interaction: quantity by
    # returnflag x linestatus. All sums of squares come from the
    # bounded cell-moment frame (<= 6 cells): each s^2/n term is a
    # deterministic double micro-quantized before its level's integer
    # sum, the within-SS subtracts the quantized cell mass from the
    # exact raw sum of squares, and the interaction F is one fixed
    # expression.
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT l_returnflag AS fa, l_linestatus AS fb,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    cq AS (
      SELECT CAST(SUM(CAST(floor(CAST(s AS DOUBLE) * s / n * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS cell6,
             CAST(SUM(q) AS BIGINT) AS qt,
             CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(COUNT(DISTINCT fa) AS BIGINT) AS ka,
             CAST(COUNT(DISTINCT fb) AS BIGINT) AS kb
      FROM cells
    ),
    ma AS (
      SELECT CAST(SUM(CAST(floor(CAST(s AS DOUBLE) * s / n * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS a6
      FROM (SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s
            FROM cells GROUP BY fa)
    ),
    mb AS (
      SELECT CAST(SUM(CAST(floor(CAST(s AS DOUBLE) * s / n * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS b6
      FROM (SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s
            FROM cells GROUP BY fb)
    )
    SELECT cq.nt AS n_rows, (cq.ka - 1) * (cq.kb - 1) AS df_interaction,
           cq.nt - cq.ka * cq.kb AS df_within,
           round((cq.cell6 / 1000000.0 - ma.a6 / 1000000.0 - mb.b6 / 1000000.0
                  + CAST(cq.st AS DOUBLE) * cq.st / cq.nt), 6) AS ss_interaction,
           round(cq.qt - cq.cell6 / 1000000.0, 6) AS ss_within,
           round(((cq.cell6 / 1000000.0 - ma.a6 / 1000000.0 - mb.b6 / 1000000.0
                   + CAST(cq.st AS DOUBLE) * cq.st / cq.nt)
                  / ((cq.ka - 1) * (cq.kb - 1)))
                 / ((cq.qt - cq.cell6 / 1000000.0) / (cq.nt - cq.ka * cq.kb)), 6)
               AS f_interaction
    FROM cq CROSS JOIN ma CROSS JOIN mb
    """,
)


def _danova2(spark, sf_dir):
    """Two-way ANOVA interaction F from the bounded cell-moment frame."""
    li = t(spark, sf_dir, "lineitem")
    qy = F.col("l_quantity").cast("long")
    cells = (
        li.groupBy(F.col("l_returnflag").alias("fa"), F.col("l_linestatus").alias("fb"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(qy).cast("long").alias("s"),
            F.sum(qy * qy).cast("long").alias("q"),
        )
        .localCheckpoint(eager=False)
    )
    t6 = F.floor(F.col("s").cast("double") * F.col("s") / F.col("n") * 1000000 + 0.5).cast(
        "long"
    )
    cq = cells.agg(
        F.sum(t6).cast("long").alias("cell6"),
        F.sum("q").cast("long").alias("qt"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").cast("long").alias("st"),
        F.count("*").cast("long").alias("n_cells"),
        F.countDistinct("fa").cast("long").alias("ka"),
        F.countDistinct("fb").cast("long").alias("kb"),
    )
    ma = (
        cells.groupBy("fa")
        .agg(F.sum("n").cast("long").alias("n"), F.sum("s").cast("long").alias("s"))
        .agg(F.sum(t6).cast("long").alias("a6"))
    )
    mb = (
        cells.groupBy("fb")
        .agg(F.sum("n").cast("long").alias("n"), F.sum("s").cast("long").alias("s"))
        .agg(F.sum(t6).cast("long").alias("b6"))
    )
    cf = F.col("st").cast("double") * F.col("st") / F.col("nt")
    ss_ab = (
        F.col("cell6") / 1000000.0 - F.col("a6") / 1000000.0 - F.col("b6") / 1000000.0 + cf
    )
    ss_w = F.col("qt") - F.col("cell6") / 1000000.0
    df_ab = (F.col("ka") - 1) * (F.col("kb") - 1)
    df_w = F.col("nt") - F.col("ka") * F.col("kb")
    return (
        cq.crossJoin(F.broadcast(ma))
        .crossJoin(F.broadcast(mb))
        .select(
            F.col("nt").alias("n_rows"),
            df_ab.alias("df_interaction"),
            df_w.alias("df_within"),
            F.round(ss_ab, 6).alias("ss_interaction"),
            F.round(ss_w, 6).alias("ss_within"),
            F.round((ss_ab / df_ab) / (ss_w / df_w), 6).alias("f_interaction"),
        )
    )


CATALOG["ml_anova_two_way_interaction"].fn = _danova2


register(
    "ml_gtest_weekday_uniformity",
    # G-test goodness-of-fit of order arrivals against weekday
    # uniformity: the weekday class is pure integer arithmetic
    # (days since 1992-01-01 mod 7 — no engine day-naming convention
    # involved), per-class terms O*ln(7*O/N) micro-quantized before
    # the exact integer sum; ln at 9 dp (near-uniform arrivals make G
    # a near-cancellation, the Bartlett lesson). The GOF sibling of
    # the independence G-test.
    oracle="""
    WITH d AS (
      SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 7
                  AS BIGINT) AS wd
      FROM orders
    ),
    h AS MATERIALIZED (
      SELECT wd, CAST(COUNT(*) AS BIGINT) AS o FROM d GROUP BY wd
    ),
    nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM h),
    terms AS (
      SELECT CAST(floor(o * round(ln(7.0 * o / nn.n), 9) * 1000000 + 0.5) AS BIGINT) AS t6
      FROM h CROSS JOIN nn
    )
    SELECT (SELECT n FROM nn) AS n_orders, CAST(6 AS BIGINT) AS df,
           round(2.0 * (SELECT CAST(SUM(t6) AS BIGINT) FROM terms) / 1000000, 6) AS g_stat
    """,
)


def _dgtestweekday(spark, sf_dir):
    """Weekday-uniformity G-test over the 7-row class histogram."""
    o = t(spark, sf_dir, "orders")
    h = o.groupBy(
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")) % 7
        )
        .cast("long")
        .alias("wd")
    ).agg(F.count("*").cast("long").alias("o"))
    nn = h.agg(F.sum("o").cast("long").alias("n"))
    terms = h.crossJoin(F.broadcast(nn)).select(
        F.floor(F.col("o") * F.round(F.log(7.0 * F.col("o") / F.col("n")), 9) * 1000000 + 0.5)
        .cast("long")
        .alias("t6")
    )
    ts = terms.agg(F.sum("t6").cast("long").alias("t6"))
    return nn.crossJoin(F.broadcast(ts)).select(
        F.col("n").alias("n_orders"),
        F.lit(6).cast("long").alias("df"),
        F.round(F.lit(2.0) * F.col("t6") / 1000000, 6).alias("g_stat"),
    )


CATALOG["ml_gtest_weekday_uniformity"].fn = _dgtestweekday


register(
    "evt_stream_moments_now",
    # TWENTY-FIRST streaming run: exact global moments as streaming
    # state — count, exact decimal cent sum, and exact cent-squared
    # sum of the value stream in ONE complete-mode aggregate row, so
    # the streaming dashboard's mean and variance are bit-identical to
    # the batch oracle's (no gate: decimal/integer accumulation is
    # order-independent).
    oracle="""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    mo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             SUM(CAST(cents AS HUGEINT) * cents) AS q
      FROM x
    )
    SELECT n,
           round(CAST(s AS DOUBLE) / n / 100.0, 6) AS mean_value,
           round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1) / 10000.0, 6)
               AS var_value
    FROM mo
    """,
)


def _dstreammoments(spark, sf_dir):
    """Streaming exact moments: one bounded (1-row) complete-mode
    aggregate of exact integer/decimal accumulators; the post-run
    probe assembles mean/variance from the sink row."""
    schema = _events_stream_schema(ts_ntz=False)
    src = _stream_file_source(spark, sf_dir, "events.parquet", schema)
    cents = (F.col("value").cast(DEC) * 100).cast("long")
    d19 = "decimal(19,0)"
    mo = src.select(cents.alias("cents")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast(d19) * F.col("cents").cast(d19)).alias("q"),
    )
    sink = _run_stream_to_memory(mo, "evt_stream_moments_sink", "complete")
    return sink.select(
        "n",
        F.round(F.col("s").cast("double") / F.col("n") / 100.0, 6).alias("mean_value"),
        F.round(
            (F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
            / 10000.0,
            6,
        ).alias("var_value"),
    )


CATALOG["evt_stream_moments_now"].fn = _dstreammoments


register(
    "ml_sign_test_daily_orders",
    # one-lag sign test of the daily order-count series (the
    # distribution-free cousin of Cox-Stuart / Mann-Kendall): ties
    # dropped per the classical definition, z = (n+ - n-)/sqrt(n+ + n-)
    # from exact integer sign counts over the bounded calendar-day
    # frame; the lone division is NULLIF-guarded (ANSI Spark throws
    # DIVIDE_BY_ZERO even for doubles — the round-12 DiD lesson).
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    l AS (SELECT cnt - LAG(cnt) OVER (ORDER BY day) AS diff FROM d),
    s AS (
      SELECT CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
             CAST(SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_minus
      FROM l WHERE diff IS NOT NULL
    )
    SELECT n_plus, n_minus,
           round((n_plus - n_minus) / NULLIF(sqrt(n_plus + n_minus), 0.0), 6) AS z
    FROM s
    """,
)


def _dsigntest(spark, sf_dir):
    """One-lag sign test riding the calendar-day aggregate (~2.4k rows
    at ANY data scale — the lag window never sees raw order rows)."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    diff = F.col("cnt") - F.lag("cnt").over(Window.orderBy("day"))
    l = d.select(diff.alias("diff")).filter(F.col("diff").isNotNull())
    s = l.agg(
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).cast("long").alias("n_plus"),
        F.sum(F.when(F.col("diff") < 0, 1).otherwise(0)).cast("long").alias("n_minus"),
    )
    return s.select(
        "n_plus",
        "n_minus",
        F.round(
            (F.col("n_plus") - F.col("n_minus"))
            / F.nullif(F.sqrt(F.col("n_plus") + F.col("n_minus")), F.lit(0.0)),
            6,
        ).alias("z"),
    )


CATALOG["ml_sign_test_daily_orders"].fn = _dsigntest


register(
    "ml_mood_median_test",
    # Mood's median test of l_quantity across the three return-flag
    # classes: the grand (lower) median comes from the 50-value
    # quantity histogram via the exact integer compare 2*cum >= n (no
    # engine percentile convention involved), the 2xk table from ONE
    # (flag, q) cell frame both stages re-aggregate, and each class's
    # chi-square term is micro-quantized BEFORE the 3-term sum so
    # float association can't differ across engines. Expected counts
    # NULLIF-guarded against a degenerate all-above/all-below split.
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    h AS (SELECT q, CAST(SUM(c) AS BIGINT) AS c FROM cells GROUP BY q),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    med AS (
      SELECT MIN(q) AS m FROM (
        SELECT q, SUM(c) OVER (ORDER BY q) AS cum FROM h
      ) CROSS JOIN tot WHERE 2 * cum >= n
    ),
    ct AS (
      SELECT flag,
             CAST(SUM(CASE WHEN q > m THEN c ELSE 0 END) AS BIGINT) AS n_above,
             CAST(SUM(c) AS BIGINT) AS n_tot
      FROM cells CROSS JOIN med GROUP BY flag
    ),
    mg AS (
      SELECT CAST(SUM(n_above) AS BIGINT) AS a, CAST(SUM(n_tot) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM ct
    ),
    terms AS (
      SELECT CAST(floor((
               pow(n_above - CAST(n_tot AS DOUBLE) * a / n, 2)
                 / NULLIF(CAST(n_tot AS DOUBLE) * a / n, 0.0)
               + pow((n_tot - n_above) - CAST(n_tot AS DOUBLE) * (n - a) / n, 2)
                 / NULLIF(CAST(n_tot AS DOUBLE) * (n - a) / n, 0.0)
             ) * 1000000 + 0.5) AS BIGINT) AS t6
      FROM ct CROSS JOIN mg
    )
    SELECT (SELECT m FROM med) AS grand_median,
           (SELECT n FROM mg) AS n_rows,
           (SELECT k FROM mg) - 1 AS df,
           round((SELECT CAST(SUM(t6) AS BIGINT) FROM terms) / 1000000.0, 6) AS chi2
    """,
)


def _dmoodmedian(spark, sf_dir):
    """Mood's median test: one (flag, q) cell scan feeds the grand
    median AND the 2xk table; chi-square terms micro-quantized."""
    li = t(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    h = cells.groupBy("q").agg(F.sum("c").cast("long").alias("c"))
    cum = h.withColumn("cum", F.sum("c").over(Window.orderBy("q")))
    tot = h.agg(F.sum("c").cast("long").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("q").alias("m"))
    )
    ct = (
        cells.crossJoin(F.broadcast(med))
        .groupBy("flag")
        .agg(
            F.sum(F.when(F.col("q") > F.col("m"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_above"),
            F.sum("c").cast("long").alias("n_tot"),
        )
        .localCheckpoint(eager=False)
    )
    mg = ct.agg(
        F.sum("n_above").cast("long").alias("a"),
        F.sum("n_tot").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    e_above = F.col("n_tot").cast("double") * F.col("a") / F.col("n")
    e_below = F.col("n_tot").cast("double") * (F.col("n") - F.col("a")) / F.col("n")
    term = F.pow(F.col("n_above") - e_above, 2) / F.nullif(e_above, F.lit(0.0)) + F.pow(
        (F.col("n_tot") - F.col("n_above")) - e_below, 2
    ) / F.nullif(e_below, F.lit(0.0))
    terms = ct.crossJoin(F.broadcast(mg)).select(
        F.floor(term * 1000000 + 0.5).cast("long").alias("t6")
    )
    ts = terms.agg(F.sum("t6").cast("long").alias("t6"))
    return (
        med.crossJoin(F.broadcast(mg))
        .crossJoin(F.broadcast(ts))
        .select(
            F.col("m").alias("grand_median"),
            F.col("n").alias("n_rows"),
            (F.col("k") - 1).alias("df"),
            F.round(F.col("t6") / 1000000.0, 6).alias("chi2"),
        )
    )


CATALOG["ml_mood_median_test"].fn = _dmoodmedian


register(
    "ml_cochran_armitage_trend",
    # Cochran-Armitage trend test: does the returned-item rate trend
    # with the discount level? Doses are the 11 integer cent levels
    # (round-then-cast — the truncation-parity lesson), outcome is
    # l_returnflag = 'R'; T's numerator N*sr - R*sn and the variance
    # masses are exact integer sums off the 11-row dose histogram, z is
    # ONE fixed double expression both engines share. No joins, no
    # windows — a single aggregation pass at any scale.
    oracle="""
    WITH x AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS dose,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem
    ),
    h AS (
      SELECT dose, CAST(COUNT(*) AS BIGINT) AS n_i, CAST(SUM(ret) AS BIGINT) AS r_i
      FROM x GROUP BY dose
    ),
    agg AS (
      SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(r_i) AS BIGINT) AS r,
             CAST(SUM(dose * r_i) AS BIGINT) AS sr,
             CAST(SUM(dose * n_i) AS BIGINT) AS sn,
             CAST(SUM(dose * dose * n_i) AS BIGINT) AS s2n
      FROM h
    )
    SELECT n, r,
           round((CAST(n AS DOUBLE) * sr - CAST(r AS DOUBLE) * sn)
                 / NULLIF(sqrt(CAST(r AS DOUBLE) * (n - r)
                               * ((CAST(n AS HUGEINT) * s2n
                                   - CAST(sn AS HUGEINT) * sn) / CAST(n AS DOUBLE))),
                          0.0),
                 6) AS z_trend
    FROM agg
    """,
)


def _dcochranarmitage(spark, sf_dir):
    """Cochran-Armitage trend z off the 11-row dose histogram."""
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.round(F.col("l_discount") * 100).cast("long").alias("dose"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    h = x.groupBy("dose").agg(
        F.count("*").cast("long").alias("n_i"),
        F.sum("ret").cast("long").alias("r_i"),
    )
    agg = h.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("r_i").cast("long").alias("r"),
        F.sum(F.col("dose") * F.col("r_i")).cast("long").alias("sr"),
        F.sum(F.col("dose") * F.col("n_i")).cast("long").alias("sn"),
        F.sum(F.col("dose") * F.col("dose") * F.col("n_i")).cast("long").alias("s2n"),
    )
    d12 = "decimal(12,0)"
    m2 = (
        F.col("n").cast(d12) * F.col("s2n").cast("decimal(18,0)")
        - F.col("sn").cast(d12) * F.col("sn").cast(d12)
    ).cast("double")
    num = F.col("n").cast("double") * F.col("sr") - F.col("r").cast("double") * F.col("sn")
    den = F.sqrt(F.col("r").cast("double") * (F.col("n") - F.col("r")) * (m2 / F.col("n").cast("double")))
    return agg.select(
        "n",
        "r",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("z_trend"),
    )


CATALOG["ml_cochran_armitage_trend"].fn = _dcochranarmitage


register(
    "ml_phi_coefficient_2x2",
    # phi coefficient (and its chi-square twin N*phi^2) for the 2x2
    # returned x high-discount table: the four cell counts come from
    # ONE conditional aggregate, the numerator a*d - b*c is an exact
    # decimal/HUGEINT product difference, and the margin product moves
    # to doubles only inside the closing sqrt. The binary-binary
    # association sibling of ml_cramers_v_pairs / ml_odds_ratio_2x2.
    oracle="""
    WITH x AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
             CASE WHEN CAST(round(l_discount * 100) AS BIGINT) >= 5 THEN 1 ELSE 0 END AS hi
      FROM lineitem
    ),
    ct AS (
      SELECT CAST(SUM(ret * hi) AS BIGINT) AS a,
             CAST(SUM(ret * (1 - hi)) AS BIGINT) AS b,
             CAST(SUM((1 - ret) * hi) AS BIGINT) AS c,
             CAST(SUM((1 - ret) * (1 - hi)) AS BIGINT) AS d
      FROM x
    )
    SELECT a, b, c, d,
           round(CAST(CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS DOUBLE)
                 / NULLIF(sqrt(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)), 0.0),
                 6) AS phi,
           round((a + b + c + d)
                 * pow(CAST(CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS DOUBLE)
                       / NULLIF(sqrt(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)), 0.0),
                       2),
                 6) AS chi2
    FROM ct
    """,
)


def _dphicoeff(spark, sf_dir):
    """phi coefficient from one conditional-count pass over lineitem."""
    li = t(spark, sf_dir, "lineitem")
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    hi = F.when(F.round(F.col("l_discount") * 100).cast("long") >= 5, 1).otherwise(0)
    ct = li.select(ret.alias("ret"), hi.alias("hi")).agg(
        F.sum(F.col("ret") * F.col("hi")).cast("long").alias("a"),
        F.sum(F.col("ret") * (1 - F.col("hi"))).cast("long").alias("b"),
        F.sum((1 - F.col("ret")) * F.col("hi")).cast("long").alias("c"),
        F.sum((1 - F.col("ret")) * (1 - F.col("hi"))).cast("long").alias("d"),
    )
    d12 = "decimal(12,0)"
    num = (
        F.col("a").cast(d12) * F.col("d").cast(d12)
        - F.col("b").cast(d12) * F.col("c").cast(d12)
    ).cast("double")
    den = F.sqrt(
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    )
    phi = num / F.nullif(den, F.lit(0.0))
    return ct.select(
        "a",
        "b",
        "c",
        "d",
        F.round(phi, 6).alias("phi"),
        F.round(
            (F.col("a") + F.col("b") + F.col("c") + F.col("d")) * F.pow(phi, 2), 6
        ).alias("chi2"),
    )


CATALOG["ml_phi_coefficient_2x2"].fn = _dphicoeff


# The ordinal-association machinery, single-sourced: gamma and Somers' D
# (round 12) close over the SAME <=550-cell (quantity, dose) contingency
# frame and the SAME concordant/discordant pair masses, so the two
# coefficients can never disagree on the pair ordering they summarize.
_QTY_DOSE_CELLS_SQL = """cells AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_discount * 100) AS BIGINT) AS dose,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    )"""

_CONC_DISC_SQL = """pairs AS (
      SELECT CAST(SUM(CASE WHEN b.dose > a.dose
                           THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS DOUBLE) AS conc,
             CAST(SUM(CASE WHEN b.dose < a.dose
                           THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS DOUBLE) AS disc
      FROM cells a JOIN cells b ON a.q < b.q AND a.dose <> b.dose
    )"""


def _qty_dose_cells(spark, sf_dir):
    """Spark twin of _QTY_DOSE_CELLS_SQL: the bounded (quantity, dose)
    cell frame — checkpointed, multi-consumed by the ordinal family."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_discount") * 100).cast("long").alias("dose"),
        )
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )


def _conc_disc(cells):
    """Spark twin of _CONC_DISC_SQL: 1-row (conc, disc) pair masses from
    the bounded cell-grid self-join, each unordered pair once."""
    a, b = cells.alias("a"), cells.alias("b")
    d12 = "decimal(12,0)"
    prod = F.col("a.c").cast(d12) * F.col("b.c").cast(d12)
    return a.join(
        b, (F.col("a.q") < F.col("b.q")) & (F.col("a.dose") != F.col("b.dose"))
    ).agg(
        F.sum(F.when(F.col("b.dose") > F.col("a.dose"), prod).otherwise(F.lit(0).cast(d12)))
        .cast("double")
        .alias("conc"),
        F.sum(F.when(F.col("b.dose") < F.col("a.dose"), prod).otherwise(F.lit(0).cast(d12)))
        .cast("double")
        .alias("disc"),
    )


register(
    "ml_goodman_kruskal_gamma",
    # Goodman-Kruskal gamma between the two ordinal lineitem columns
    # (quantity 1..50 x discount cents 0..10): concordant/discordant
    # pair masses from a self-join of the <=550-cell contingency frame
    # (each unordered pair counted once via qa < qb), products in exact
    # decimal/HUGEINT, gamma = (C-D)/(C+D). The bounded cell grid makes
    # the "pair join" a constant <=550x550 nested loop at ANY scale.
    oracle=f"""
    WITH {_QTY_DOSE_CELLS_SQL},
    {_CONC_DISC_SQL}
    SELECT conc AS c_pairs, disc AS d_pairs,
           round((conc - disc) / NULLIF(conc + disc, 0.0), 6) AS gamma
    FROM pairs
    """,
)


def _dgkgamma(spark, sf_dir):
    """Gamma over the bounded quantity x discount cell grid (shared
    _qty_dose_cells / _conc_disc machinery)."""
    pairs = _conc_disc(_qty_dose_cells(spark, sf_dir))
    return pairs.select(
        F.col("conc").alias("c_pairs"),
        F.col("disc").alias("d_pairs"),
        F.round(
            (F.col("conc") - F.col("disc")) / F.nullif(F.col("conc") + F.col("disc"), F.lit(0.0)),
            6,
        ).alias("gamma"),
    )


CATALOG["ml_goodman_kruskal_gamma"].fn = _dgkgamma


register(
    "ml_jonckheere_terpstra_trend",
    # Jonckheere-Terpstra ordered-alternative test: does l_quantity
    # shift upward across the three ordered discount bands (0-3c,
    # 4-6c, 7-10c)? J is the sum of between-band Mann-Whitney counts,
    # computed DOUBLED (ties count once, strict pairs twice) from a
    # self-join of the <=150-row (band, q) cell frame; the
    # tie-corrected Lehmann variance needs five exact integer masses
    # (band masses n(n-1), n(n-1)(2n+5), n(n-1)(n-2); tie masses over
    # the value histogram) accumulated in decimal/HUGEINT, combined in
    # ONE fixed double expression. The k-ordered-groups sibling of
    # ml_mann_whitney_u_quantity.
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT CASE WHEN CAST(round(l_discount * 100) AS BIGINT) <= 3 THEN 0
                  WHEN CAST(round(l_discount * 100) AS BIGINT) <= 6 THEN 1
                  ELSE 2 END AS g,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    j AS (
      SELECT CAST(SUM(CASE WHEN a.q < b.q THEN 2 * CAST(a.c AS HUGEINT) * b.c
                           ELSE CAST(a.c AS HUGEINT) * b.c END) AS DOUBLE) AS j2x
      FROM cells a JOIN cells b ON a.g < b.g AND a.q <= b.q
    ),
    gm AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(CAST(n AS HUGEINT) * n) AS DOUBLE) AS sg_sq,
             CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS DOUBLE) AS sg1,
             CAST(SUM(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5)) AS DOUBLE) AS sg2,
             CAST(SUM(CAST(n AS HUGEINT) * (n - 1) * (n - 2)) AS DOUBLE) AS sg3
      FROM (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY g)
    ),
    tm AS (
      SELECT CAST(SUM(CAST(tc AS HUGEINT) * (tc - 1)) AS DOUBLE) AS st1,
             CAST(SUM(CAST(tc AS HUGEINT) * (tc - 1) * (2 * tc + 5)) AS DOUBLE) AS st2,
             CAST(SUM(CAST(tc AS HUGEINT) * (tc - 1) * (tc - 2)) AS DOUBLE) AS st3
      FROM (SELECT q, CAST(SUM(c) AS BIGINT) AS tc FROM cells GROUP BY q)
    )
    SELECT gm.n AS n_rows,
           j.j2x / 2.0 AS j_stat,
           round((CAST(gm.n AS DOUBLE) * gm.n - gm.sg_sq) / 4.0, 6) AS mu_j,
           round((CAST(gm.n AS HUGEINT) * (gm.n - 1) * (2 * gm.n + 5) - gm.sg2 - tm.st2) / 72.0
                 + gm.sg3 * tm.st3
                   / NULLIF(36.0 * gm.n * (gm.n - 1.0) * (gm.n - 2.0), 0.0)
                 + gm.sg1 * tm.st1 / NULLIF(8.0 * gm.n * (gm.n - 1.0), 0.0),
                 6) AS var_j,
           round((j.j2x / 2.0 - (CAST(gm.n AS DOUBLE) * gm.n - gm.sg_sq) / 4.0)
                 / NULLIF(sqrt((CAST(gm.n AS HUGEINT) * (gm.n - 1) * (2 * gm.n + 5)
                                - gm.sg2 - tm.st2) / 72.0
                               + gm.sg3 * tm.st3
                                 / NULLIF(36.0 * gm.n * (gm.n - 1.0) * (gm.n - 2.0), 0.0)
                               + gm.sg1 * tm.st1 / NULLIF(8.0 * gm.n * (gm.n - 1.0), 0.0)),
                          0.0),
                 6) AS z
    FROM j CROSS JOIN gm CROSS JOIN tm
    """,
)


def _djonckheere(spark, sf_dir):
    """Jonckheere-Terpstra with Lehmann tie-corrected variance off the
    bounded (band, quantity) cell frame."""
    li = t(spark, sf_dir, "lineitem")
    dose = F.round(F.col("l_discount") * 100).cast("long")
    band = F.when(dose <= 3, 0).when(dose <= 6, 1).otherwise(2)
    cells = (
        li.groupBy(band.alias("g"), F.col("l_quantity").cast("long").alias("q"))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    d12 = "decimal(12,0)"
    a, b = cells.alias("a"), cells.alias("b")
    prod = F.col("a.c").cast(d12) * F.col("b.c").cast(d12)
    j = a.join(b, (F.col("a.g") < F.col("b.g")) & (F.col("a.q") <= F.col("b.q"))).agg(
        F.sum(F.when(F.col("a.q") < F.col("b.q"), 2 * prod).otherwise(prod))
        .cast("double")
        .alias("j2x")
    )

    def _mass(col):
        d = col.cast(d12)
        return {
            "m1": F.sum(d * (d - 1)).cast("double"),
            "m2": F.sum(d * (d - 1) * (2 * d + 5)).cast("double"),
            "m3": F.sum(d * (d - 1) * (d - 2)).cast("double"),
        }

    gn = cells.groupBy("g").agg(F.sum("c").cast("long").alias("n"))
    gmass = _mass(F.col("n"))
    gm = gn.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(F.col("n").cast(d12) * F.col("n").cast(d12)).cast("double").alias("sg_sq"),
        gmass["m1"].alias("sg1"),
        gmass["m2"].alias("sg2"),
        gmass["m3"].alias("sg3"),
    )
    tn = cells.groupBy("q").agg(F.sum("c").cast("long").alias("tc"))
    tmass = _mass(F.col("tc"))
    tm = tn.agg(
        tmass["m1"].alias("st1"), tmass["m2"].alias("st2"), tmass["m3"].alias("st3")
    )
    nd = F.col("n").cast("double")
    n12 = F.col("n").cast(d12)
    total2 = (n12 * (n12 - 1) * (2 * n12 + 5)).cast("double")
    mu = (nd * F.col("n") - F.col("sg_sq")) / 4.0
    var = (
        (total2 - F.col("sg2") - F.col("st2")) / 72.0
        + F.col("sg3") * F.col("st3") / F.nullif(36.0 * nd * (nd - 1.0) * (nd - 2.0), F.lit(0.0))
        + F.col("sg1") * F.col("st1") / F.nullif(8.0 * nd * (nd - 1.0), F.lit(0.0))
    )
    return (
        j.crossJoin(F.broadcast(gm))
        .crossJoin(F.broadcast(tm))
        .select(
            F.col("n").alias("n_rows"),
            (F.col("j2x") / 2.0).alias("j_stat"),
            F.round(mu, 6).alias("mu_j"),
            F.round(var, 6).alias("var_j"),
            F.round((F.col("j2x") / 2.0 - mu) / F.nullif(F.sqrt(var), F.lit(0.0)), 6).alias("z"),
        )
    )


CATALOG["ml_jonckheere_terpstra_trend"].fn = _djonckheere


register(
    "ml_somers_d_qty_discount",
    # Somers' D in both directions over the SAME concordant/discordant
    # pair masses as ml_goodman_kruskal_gamma (shared _qty_dose_cells /
    # _conc_disc machinery): d_yx adds the pairs tied on the response
    # (quantity) to the denominator, d_xy the pairs tied on the
    # predictor (discount). Tie masses are exact t(t-1) sums off the
    # two marginal histograms; num/den doubled so every mass stays an
    # integer.
    oracle=f"""
    WITH {_QTY_DOSE_CELLS_SQL},
    {_CONC_DISC_SQL},
    tq AS (
      SELECT CAST(SUM(CAST(tc AS HUGEINT) * (tc - 1)) AS DOUBLE) AS m
      FROM (SELECT q, CAST(SUM(c) AS BIGINT) AS tc FROM cells GROUP BY q)
    ),
    tx AS (
      SELECT CAST(SUM(CAST(uc AS HUGEINT) * (uc - 1)) AS DOUBLE) AS m
      FROM (SELECT dose, CAST(SUM(c) AS BIGINT) AS uc FROM cells GROUP BY dose)
    ),
    cc AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * (c - 1)) AS DOUBLE) AS m FROM cells)
    SELECT conc AS c_pairs, disc AS d_pairs,
           (tq.m - cc.m) / 2.0 AS ty_pairs,
           (tx.m - cc.m) / 2.0 AS tx_pairs,
           round(2.0 * (conc - disc)
                 / NULLIF(2.0 * (conc + disc) + (tq.m - cc.m), 0.0), 6) AS somers_d_yx,
           round(2.0 * (conc - disc)
                 / NULLIF(2.0 * (conc + disc) + (tx.m - cc.m), 0.0), 6) AS somers_d_xy
    FROM pairs CROSS JOIN tq CROSS JOIN tx CROSS JOIN cc
    """,
)


def _dsomersd(spark, sf_dir):
    """Somers' D (both directions) off the shared ordinal pair masses."""
    cells = _qty_dose_cells(spark, sf_dir)
    pairs = _conc_disc(cells)
    d12 = "decimal(12,0)"

    def _tie_mass(frame, col):
        d = F.col(col).cast(d12)
        return frame.agg(F.sum(d * (d - 1)).cast("double").alias("m"))

    tq = _tie_mass(cells.groupBy("q").agg(F.sum("c").cast("long").alias("tc")), "tc")
    tx = _tie_mass(cells.groupBy("dose").agg(F.sum("c").cast("long").alias("uc")), "uc")
    cc = _tie_mass(cells, "c")
    ty2x = F.col("tq_m") - F.col("cc_m")
    tx2x = F.col("tx_m") - F.col("cc_m")
    num = 2.0 * (F.col("conc") - F.col("disc"))
    cd2 = 2.0 * (F.col("conc") + F.col("disc"))
    return (
        pairs.crossJoin(F.broadcast(tq.select(F.col("m").alias("tq_m"))))
        .crossJoin(F.broadcast(tx.select(F.col("m").alias("tx_m"))))
        .crossJoin(F.broadcast(cc.select(F.col("m").alias("cc_m"))))
        .select(
            F.col("conc").alias("c_pairs"),
            F.col("disc").alias("d_pairs"),
            (ty2x / 2.0).alias("ty_pairs"),
            (tx2x / 2.0).alias("tx_pairs"),
            F.round(num / F.nullif(cd2 + ty2x, F.lit(0.0)), 6).alias("somers_d_yx"),
            F.round(num / F.nullif(cd2 + tx2x, F.lit(0.0)), 6).alias("somers_d_xy"),
        )
    )


CATALOG["ml_somers_d_qty_discount"].fn = _dsomersd


register(
    "ml_scotts_pi_lang",
    # Scott's pi over the SAME two-rater verdict frame as Cohen's kappa
    # (shared _KAPPA_J_CTES / _kappa_j): chance agreement from the
    # AVERAGED marginals instead of their product — pi = (4*n*agree -
    # S2) / (4*n*n - S2) with S2 = sum over classes of (ma+mb)^2, all
    # exact BIGINTs until the one closing division. Reported next to
    # kappa it bounds how much the two chance models disagree.
    oracle=f"""
    WITH {_NB_CTES},
    {_KAPPA_J_CTES},
    nn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN nb_pred = heur_pred THEN 1 ELSE 0 END) AS BIGINT)
                 AS agree
      FROM j
    ),
    ma AS (SELECT nb_pred AS cls, CAST(COUNT(*) AS BIGINT) AS cnt FROM j GROUP BY 1),
    mb AS (SELECT heur_pred AS cls, CAST(COUNT(*) AS BIGINT) AS cnt FROM j GROUP BY 1),
    s2 AS (
      SELECT CAST(SUM(CAST(COALESCE(ma.cnt, 0) + COALESCE(mb.cnt, 0) AS HUGEINT)
                      * (COALESCE(ma.cnt, 0) + COALESCE(mb.cnt, 0))) AS BIGINT) AS s2
      FROM ma FULL OUTER JOIN mb USING (cls)
    )
    SELECT nn.n AS n_docs, nn.agree AS n_agree, s2.s2 AS pooled_sq_sum,
           round(nn.agree / CAST(nn.n AS DOUBLE), 6) AS observed_agreement,
           round(s2.s2 / (4.0 * nn.n * nn.n), 6) AS expected_agreement,
           round((4.0 * nn.n * nn.agree - s2.s2)
                 / NULLIF(4.0 * nn.n * nn.n - s2.s2, 0.0), 6) AS scotts_pi
    FROM nn CROSS JOIN s2
    """,
)


def _dscottspi(spark, sf_dir):
    """Scott's pi off the shared _kappa_j verdict frame."""
    j = _kappa_j(spark, sf_dir)
    nn = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("nb_pred") == F.col("heur_pred"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    ma = j.groupBy(F.col("nb_pred").alias("cls")).agg(
        F.count("*").cast("long").alias("ca")
    )
    mb = j.groupBy(F.col("heur_pred").alias("cls")).agg(
        F.count("*").cast("long").alias("cb")
    )
    pooled = F.coalesce(F.col("ca"), F.lit(0)) + F.coalesce(F.col("cb"), F.lit(0))
    s2 = ma.join(mb, "cls", "full").agg(
        F.sum(pooled.cast("decimal(19,0)") * pooled).cast("long").alias("s2")
    )
    nd = F.col("n").cast("double")
    return nn.crossJoin(F.broadcast(s2)).select(
        F.col("n").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        F.col("s2").alias("pooled_sq_sum"),
        F.round(F.col("agree") / nd, 6).alias("observed_agreement"),
        F.round(F.col("s2") / (4.0 * F.col("n") * F.col("n")), 6).alias(
            "expected_agreement"
        ),
        F.round(
            (4.0 * F.col("n") * F.col("agree") - F.col("s2"))
            / F.nullif(4.0 * F.col("n") * F.col("n") - F.col("s2").cast("double"), F.lit(0.0)),
            6,
        ).alias("scotts_pi"),
    )


CATALOG["ml_scotts_pi_lang"].fn = _dscottspi


register(
    "ml_krippendorff_alpha_lang",
    # nominal Krippendorff's alpha over the SAME three-rater cell frame
    # as Fleiss' kappa (shared _FLEISS_CELLS_CTES / _fleiss_cells):
    # observed disagreement from per-doc coincidences n_uc(n_uc-1),
    # expected from pooled category totals t_c(t_c-1) over N(N-1) with
    # N = 3n — the small-sample-honest chance model Fleiss' p_e^2
    # approximates. Exact integers until the closing divisions; alpha
    # = 1 - Do/De in one fixed expression.
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
           round(1.0 - (CAST(ss AS DOUBLE) - 3.0 * n) / (6.0 * n), 6) AS d_observed,
           round(1.0 - (CAST(sc2 AS DOUBLE) - 3.0 * n)
                       / (3.0 * n * (3.0 * n - 1.0)), 6) AS d_expected,
           round(1.0 - (1.0 - (CAST(ss AS DOUBLE) - 3.0 * n) / (6.0 * n))
                       / NULLIF(1.0 - (CAST(sc2 AS DOUBLE) - 3.0 * n)
                                      / (3.0 * n * (3.0 * n - 1.0)), 0.0),
                 6) AS kripp_alpha
    FROM perdoc CROSS JOIN marg
    """,
)


def _dkrippendorff(spark, sf_dir):
    """Nominal Krippendorff's alpha off the shared _fleiss_cells frame."""
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
    d_o = 1.0 - (F.col("ss").cast("double") - 3.0 * n) / (6.0 * n)
    d_e = 1.0 - (F.col("sc2").cast("double") - 3.0 * n) / (3.0 * n * (3.0 * n - 1.0))
    return perdoc.crossJoin(F.broadcast(marg)).select(
        n.alias("n_docs"),
        F.round(d_o, 6).alias("d_observed"),
        F.round(d_e, 6).alias("d_expected"),
        F.round(1.0 - d_o / F.nullif(d_e, F.lit(0.0)), 6).alias("kripp_alpha"),
    )


CATALOG["ml_krippendorff_alpha_lang"].fn = _dkrippendorff


register(
    "ml_youden_j_price",
    # the ROC-space twin of the PR curve: TPR, FPR and Youden's J =
    # TPR - FPR at the same nine fixed thresholds, off the SAME shared
    # band histogram (_PU_VC_CTES / _price_urgent_vc) — so the optimal-
    # threshold report and the precision/recall sweep can never
    # disagree on the classifier they describe. Exact integers until
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
           round(CAST(tp AS DOUBLE) / tot.np, 6) AS tpr,
           round(CAST(fp AS DOUBLE) / tot.nn0, 6) AS fpr,
           round(CAST(tp AS DOUBLE) / tot.np - CAST(fp AS DOUBLE) / tot.nn0, 6)
               AS youden_j
    FROM pr CROSS JOIN tot
    ORDER BY threshold_band
    """,
)


def _dyoudenj(spark, sf_dir):
    """Youden's J sweep off the shared price-band histogram."""
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
    tpr = F.col("tp").cast("double") / F.col("np")
    fpr = F.col("fp").cast("double") / F.col("nn0")
    return (
        pr.crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("threshold_band"),
            F.col("tp").alias("n_true_pos"),
            F.col("fp").alias("n_false_pos"),
            F.round(tpr, 6).alias("tpr"),
            F.round(fpr, 6).alias("fpr"),
            F.round(tpr - fpr, 6).alias("youden_j"),
        )
        .orderBy("threshold_band")
    )


CATALOG["ml_youden_j_price"].fn = _dyoudenj


register(
    "ml_matthews_corr_price_urgent",
    # MCC and balanced accuracy of the band >= 250 operating point,
    # off the SAME shared band histogram as the PR/Youden sweeps: the
    # full confusion matrix comes from one pass over the bounded vc
    # frame (tp/fp summed above the threshold, fn/tn by complement
    # against the exact class totals), the a*d - b*c numerator is an
    # exact decimal/HUGEINT product difference, and the four margin
    # factors move to doubles only inside the closing sqrt.
    oracle=f"""
    WITH {_PU_VC_CTES},
    cf AS (
      SELECT CAST(SUM(CASE WHEN band >= 250 THEN n1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN band >= 250 THEN n0 ELSE 0 END) AS BIGINT) AS fp
      FROM vc
    )
    SELECT tp, fp, tot.np - tp AS fn, tot.nn0 - fp AS tn,
           round(CAST(CAST(tp AS HUGEINT) * (tot.nn0 - fp)
                      - CAST(fp AS HUGEINT) * (tot.np - tp) AS DOUBLE)
                 / NULLIF(sqrt(CAST(tp + fp AS DOUBLE) * (tot.np - tp + tot.nn0 - fp)
                               * tot.np * tot.nn0), 0.0), 6) AS mcc,
           round((CAST(tp AS DOUBLE) / tot.np + CAST(tot.nn0 - fp AS DOUBLE) / tot.nn0)
                 / 2.0, 6) AS balanced_accuracy
    FROM cf CROSS JOIN tot
    """,
)


def _dmatthews(spark, sf_dir):
    """MCC at the band>=250 point off the shared price-band histogram."""
    vc, tot = _price_urgent_vc(spark, sf_dir)
    cf = vc.agg(
        F.sum(F.when(F.col("band") >= 250, F.col("n1")).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("band") >= 250, F.col("n0")).otherwise(0))
        .cast("long")
        .alias("fp"),
    )
    d12 = "decimal(12,0)"
    fn = F.col("np") - F.col("tp")
    tn = F.col("nn0") - F.col("fp")
    num = (F.col("tp").cast(d12) * tn.cast(d12) - F.col("fp").cast(d12) * fn.cast(d12)).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("tp") + F.col("fp")).cast("double")
        * (fn + tn)
        * F.col("np")
        * F.col("nn0")
    )
    return cf.crossJoin(F.broadcast(tot)).select(
        "tp",
        "fp",
        fn.alias("fn"),
        tn.alias("tn"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("mcc"),
        F.round(
            (F.col("tp").cast("double") / F.col("np") + tn.cast("double") / F.col("nn0"))
            / 2.0,
            6,
        ).alias("balanced_accuracy"),
    )


CATALOG["ml_matthews_corr_price_urgent"].fn = _dmatthews


register(
    "ml_log_loss_price_urgent",
    # cross-entropy of the band-rate predictor on the held-out half,
    # off the SAME shared calibration band frame as the reliability /
    # Brier / Hosmer-Lemeshow family (_CAL_CTES / _cal_bands): per-band
    # Laplace-smoothed train rate p = (s_tr+1)/(n_tr+2) (no ln(0) at
    # any scale), per-band test mass terms s_te*ln(p) + (n_te-s_te)*
    # ln(1-p) with ln at 9 dp (the Bartlett near-cancellation lesson)
    # micro-quantized BEFORE the cross-band sum, plus the constant
    # predictor's loss and the skill score 1 - loss/loss0.
    oracle=f"""
    {_CAL_CTES},
    terms AS (
      SELECT CAST(floor((s_te * round(ln((s_tr + 1) / (n_tr + 2.0)), 9)
                         + (n_te - s_te) * round(ln(1.0 - (s_tr + 1) / (n_tr + 2.0)), 9))
                        * 1000000 + 0.5) AS BIGINT) AS t6
      FROM bands
    ),
    g AS (
      SELECT CAST(SUM(n_tr) AS BIGINT) AS ntr, CAST(SUM(s_tr) AS BIGINT) AS str_,
             CAST(SUM(n_te) AS BIGINT) AS nte, CAST(SUM(s_te) AS BIGINT) AS ste
      FROM bands
    )
    SELECT g.nte AS n_test,
           round(-(SELECT CAST(SUM(t6) AS BIGINT) FROM terms) / 1000000.0 / g.nte, 6)
               AS log_loss_model,
           round(-(g.ste * round(ln((g.str_ + 1) / (g.ntr + 2.0)), 9)
                   + (g.nte - g.ste) * round(ln(1.0 - (g.str_ + 1) / (g.ntr + 2.0)), 9))
                 / g.nte, 6) AS log_loss_base,
           round(1.0 - (-(SELECT CAST(SUM(t6) AS BIGINT) FROM terms) / 1000000.0 / g.nte)
                       / NULLIF(-(g.ste * round(ln((g.str_ + 1) / (g.ntr + 2.0)), 9)
                                  + (g.nte - g.ste)
                                    * round(ln(1.0 - (g.str_ + 1) / (g.ntr + 2.0)), 9))
                                / g.nte, 0.0), 6) AS skill_score
    FROM g
    """,
)


def _dlogloss(spark, sf_dir):
    """Held-out log loss + skill vs the constant predictor, off the
    shared calibration band frame."""
    bands = _cal_bands(spark, sf_dir)
    p = (F.col("s_tr") + 1) / (F.col("n_tr") + 2.0)
    lnp = F.round(F.log(p), 9)
    ln1p = F.round(F.log(1.0 - p), 9)
    terms = bands.select(
        F.floor(
            (F.col("s_te") * lnp + (F.col("n_te") - F.col("s_te")) * ln1p) * 1000000
            + 0.5
        )
        .cast("long")
        .alias("t6")
    )
    ts = terms.agg(F.sum("t6").cast("long").alias("t6"))
    g = bands.agg(
        F.sum("n_tr").cast("long").alias("ntr"),
        F.sum("s_tr").cast("long").alias("str_"),
        F.sum("n_te").cast("long").alias("nte"),
        F.sum("s_te").cast("long").alias("ste"),
    )
    p0 = (F.col("str_") + 1) / (F.col("ntr") + 2.0)
    lnp0 = F.round(F.log(p0), 9)
    ln1p0 = F.round(F.log(1.0 - p0), 9)
    loss_m = -F.col("t6") / 1000000.0 / F.col("nte")
    loss_0 = (
        -(F.col("ste") * lnp0 + (F.col("nte") - F.col("ste")) * ln1p0) / F.col("nte")
    )
    return g.crossJoin(F.broadcast(ts)).select(
        F.col("nte").alias("n_test"),
        F.round(loss_m, 6).alias("log_loss_model"),
        F.round(loss_0, 6).alias("log_loss_base"),
        F.round(1.0 - loss_m / F.nullif(loss_0, F.lit(0.0)), 6).alias("skill_score"),
    )


CATALOG["ml_log_loss_price_urgent"].fn = _dlogloss


register(
    "evt_variance_ratio_value",
    # Lo-MacKinlay variance-ratio test VR(5) on the daily event-value
    # series: if daily sums follow a random walk the variance of 5-day
    # increments is 5x the 1-day variance. Both increment families come
    # from exact integer cent sums over the calendar-day frame (1-day
    # via lag(1), 5-day via lag(5) — telescoping, no running sums), all
    # moments are exact integer aggregates, and VR / its homoskedastic
    # z use ONE fixed double expression. Day-frame windows are bounded
    # by the calendar at any data scale.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
                 AS cents
      FROM events GROUP BY 1
    ),
    l AS (
      SELECT cents - LAG(cents, 1) OVER (ORDER BY day) AS e1,
             cents - LAG(cents, 5) OVER (ORDER BY day) AS e5
      FROM d
    ),
    m AS (
      SELECT CAST(COUNT(e1) AS BIGINT) AS n1,
             CAST(SUM(e1) AS BIGINT) AS s1,
             SUM(CAST(e1 AS HUGEINT) * e1) AS q1,
             CAST(COUNT(e5) AS BIGINT) AS n5,
             CAST(SUM(e5) AS BIGINT) AS s5,
             SUM(CAST(e5 AS HUGEINT) * e5) AS q5
      FROM l
    )
    SELECT n1 AS n_days,
           round(((CAST(q5 AS DOUBLE) - CAST(s5 AS DOUBLE) * s5 / n5)
                  / NULLIF(n5 - 1, 0))
                 / NULLIF(5.0 * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                                 / NULLIF(n1 - 1, 0)), 0.0), 6) AS vr_5,
           round((((CAST(q5 AS DOUBLE) - CAST(s5 AS DOUBLE) * s5 / n5)
                   / NULLIF(n5 - 1, 0))
                  / NULLIF(5.0 * ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                                  / NULLIF(n1 - 1, 0)), 0.0) - 1.0)
                 / NULLIF(sqrt(2.0 * (2 * 5 - 1) * (5 - 1) / (3.0 * 5 * n1)), 0.0), 6)
               AS z_homosked
    FROM m
    """,
)


def _dvarratio(spark, sf_dir):
    """VR(5) off the calendar-day cent-sum aggregate."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum((F.col("value").cast(DEC) * 100).cast("long")).cast("long").alias("cents")
    )
    w = Window.orderBy("day")
    l = d.select(
        (F.col("cents") - F.lag("cents", 1).over(w)).alias("e1"),
        (F.col("cents") - F.lag("cents", 5).over(w)).alias("e5"),
    )
    d19 = "decimal(19,0)"
    m = l.agg(
        F.count("e1").cast("long").alias("n1"),
        F.sum("e1").cast("long").alias("s1"),
        F.sum(F.col("e1").cast(d19) * F.col("e1").cast(d19)).alias("q1"),
        F.count("e5").cast("long").alias("n5"),
        F.sum("e5").cast("long").alias("s5"),
        F.sum(F.col("e5").cast(d19) * F.col("e5").cast(d19)).alias("q5"),
    )
    var1 = (
        F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
    ) / F.nullif(F.col("n1") - 1, F.lit(0))
    var5 = (
        F.col("q5").cast("double") - F.col("s5").cast("double") * F.col("s5") / F.col("n5")
    ) / F.nullif(F.col("n5") - 1, F.lit(0))
    vr = var5 / F.nullif(5.0 * var1, F.lit(0.0))
    z = (vr - 1.0) / F.nullif(
        F.sqrt(2.0 * (2 * 5 - 1) * (5 - 1) / (3.0 * 5 * F.col("n1"))), F.lit(0.0)
    )
    return m.select(
        F.col("n1").alias("n_days"),
        F.round(vr, 6).alias("vr_5"),
        F.round(z, 6).alias("z_homosked"),
    )


CATALOG["evt_variance_ratio_value"].fn = _dvarratio


register(
    "evt_cox_stuart_daily",
    # Cox-Stuart trend test on daily event counts: pair day i with day
    # i + n/2 (first half vs second half, the middle day dropped when n
    # is odd), count strict sign changes — an equi-join on the computed
    # pair rank, exact integer counts, one guarded division. The
    # pairing sibling of the one-lag sign test.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY day) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM d
    ),
    p AS (
      SELECT a.cnt AS c1, b.cnt AS c2
      FROM r a JOIN r b ON b.rn = a.rn + a.n // 2 AND a.rn <= a.n // 2
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN c2 > c1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
             CAST(SUM(CASE WHEN c2 < c1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
      FROM p
    )
    SELECT n_up, n_down,
           round((n_up - n_down) / NULLIF(sqrt(n_up + n_down), 0.0), 6) AS z
    FROM s
    """,
)


def _dcoxstuart(spark, sf_dir):
    """Cox-Stuart half-pairing trend test on the calendar-day frame."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    r = d.select(
        "cnt",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    ).localCheckpoint(eager=False)
    a, b = r.alias("a"), r.alias("b")
    half = F.expr("a.n div 2")
    p = a.join(
        b,
        (F.col("b.rn") == F.col("a.rn") + half) & (F.col("a.rn") <= half),
    ).select(F.col("a.cnt").alias("c1"), F.col("b.cnt").alias("c2"))
    s = p.agg(
        F.sum(F.when(F.col("c2") > F.col("c1"), 1).otherwise(0)).cast("long").alias("n_up"),
        F.sum(F.when(F.col("c2") < F.col("c1"), 1).otherwise(0)).cast("long").alias("n_down"),
    )
    return s.select(
        "n_up",
        "n_down",
        F.round(
            (F.col("n_up") - F.col("n_down"))
            / F.nullif(F.sqrt(F.col("n_up") + F.col("n_down")), F.lit(0.0)),
            6,
        ).alias("z"),
    )


CATALOG["evt_cox_stuart_daily"].fn = _dcoxstuart


