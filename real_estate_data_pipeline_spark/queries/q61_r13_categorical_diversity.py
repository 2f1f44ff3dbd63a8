"""Round-13 wave 5: categorical-association and diversity statistics —
Duncan's dissimilarity (segregation) index of market segments across
nations, Tschuprow's T / Pearson's C beside the existing Cramér's V,
Good-Turing coverage per document source, circular (clock) statistics of
event times, and the quartile coefficient of dispersion.

The circular statistics use a 24-row cos/sin table quantized ONCE in
Python at 9 decimals into integer nano-units, so the resultant vector
is an exact BIGINT sum in both engines; atan2/sqrt close it.
"""

from __future__ import annotations

import math

from ._registry import CATALOG, F, Window, register, t

register(
    "cust_dissimilarity_index_segments",
    # Duncan's dissimilarity index of each market segment vs the rest,
    # across the nation dimension: D = 1/2 * sum_n |a_n/A - b_n/B|,
    # computed exactly as sum_n |a_n*B - b_n*A| / (2*A*B) from the
    # bounded nation x segment cell frame (the classic residential-
    # segregation measure, here measuring how unevenly a segment's
    # customers spread over nations relative to everyone else).
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment AS seg, c_nationkey AS nat,
             CAST(COUNT(*) AS BIGINT) AS a
      FROM customer GROUP BY 1, 2
    ),
    nat_tot AS (SELECT nat, CAST(SUM(a) AS BIGINT) AS tn FROM cells GROUP BY nat),
    seg_tot AS (SELECT seg, CAST(SUM(a) AS BIGINT) AS ta FROM cells GROUP BY seg),
    n_all AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT s.seg, s.ta,
             CAST(SUM(ABS(CAST(COALESCE(c.a, 0) AS HUGEINT) * (na.n - s.ta)
                          - CAST(nt.tn - COALESCE(c.a, 0) AS HUGEINT) * s.ta))
                  AS DOUBLE) AS num,
             MAX(na.n) AS n
      FROM seg_tot s
      CROSS JOIN nat_tot nt
      CROSS JOIN n_all na
      LEFT JOIN cells c ON c.seg = s.seg AND c.nat = nt.nat
      GROUP BY s.seg, s.ta
    )
    SELECT seg AS segment, ta AS seg_customers,
           round(num / (2.0 * ta * (n - ta)), 6) AS dissimilarity_index
    FROM terms ORDER BY seg
    """,
)


def _ddissim(spark, sf_dir):
    """Segregation index: one nation x segment cell aggregate (125
    cells), two margin frames, one exact integer fold per segment —
    never a customer-level pair join."""
    cu = t(spark, sf_dir, "customer")
    cells = (
        cu.groupBy(F.col("c_mktsegment").alias("seg"), F.col("c_nationkey").alias("nat"))
        .agg(F.count("*").cast("long").alias("a"))
        .localCheckpoint(eager=False)  # feeds both margins and the fold
    )
    nat_tot = cells.groupBy("nat").agg(F.sum("a").cast("long").alias("tn"))
    seg_tot = cells.groupBy("seg").agg(F.sum("a").cast("long").alias("ta"))
    n_all = cells.agg(F.sum("a").cast("long").alias("n"))
    j = (
        seg_tot.crossJoin(F.broadcast(nat_tot))
        .crossJoin(F.broadcast(n_all))
        .join(
            cells.select(
                F.col("seg").alias("cseg"), F.col("nat").alias("cnat"), "a"
            ),
            (F.col("seg") == F.col("cseg")) & (F.col("nat") == F.col("cnat")),
            "left",
        )
        .select(
            "seg",
            "ta",
            "n",
            F.coalesce(F.col("a"), F.lit(0)).alias("a0"),
            F.col("tn"),
        )
    )
    terms = j.groupBy("seg", "ta").agg(
        F.sum(
            F.abs(
                F.col("a0").cast("decimal(38,0)") * (F.col("n") - F.col("ta"))
                - (F.col("tn") - F.col("a0")).cast("decimal(38,0)") * F.col("ta")
            )
        )
        .cast("double")
        .alias("num"),
        F.max("n").alias("n"),
    )
    return terms.select(
        F.col("seg").alias("segment"),
        F.col("ta").alias("seg_customers"),
        F.round(
            F.col("num") / (2.0 * F.col("ta") * (F.col("n") - F.col("ta"))), 6
        ).alias("dissimilarity_index"),
    ).orderBy("segment")


CATALOG["cust_dissimilarity_index_segments"].fn = _ddissim


register(
    "ml_tschuprow_t_brand_size",
    # Tschuprow's T and Pearson's contingency coefficient C for the
    # p_brand x p_size table — the two classical companions of the
    # existing Cramér's V: both derive from the same chi-square, whose
    # per-cell terms (N*o - r*c)^2 / (N*r*c) are computed identically
    # in both engines and micro-quantized at 1e6 before the cell sum.
    oracle="""
    WITH cells AS (
      SELECT p_brand AS b, p_size AS s, CAST(COUNT(*) AS BIGINT) AS o
      FROM part GROUP BY 1, 2
    ),
    rm AS (SELECT b, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY b),
    cm AS (SELECT s, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY s),
    nt AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                  CAST(COUNT(DISTINCT b) AS BIGINT) AS nr,
                  CAST(COUNT(DISTINCT s) AS BIGINT) AS nc
           FROM cells),
    terms AS (
      SELECT nt.n, nt.nr, nt.nc,
             CAST(FLOOR(
               CAST((nt.n * COALESCE(cells.o, 0) - CAST(rm.r AS HUGEINT) * cm.c)
                    AS DOUBLE)
               * CAST((nt.n * COALESCE(cells.o, 0) - CAST(rm.r AS HUGEINT) * cm.c)
                      AS DOUBLE)
               * 1000000.0
               / (CAST(nt.n AS DOUBLE) * rm.r * cm.c) + 0.5) AS BIGINT) AS t6
      FROM rm CROSS JOIN cm CROSS JOIN nt
      LEFT JOIN cells ON cells.b = rm.b AND cells.s = cm.s
    ),
    chi AS (
      SELECT MAX(n) AS n, MAX(nr) AS nr, MAX(nc) AS nc,
             CAST(SUM(t6) AS DOUBLE) / 1000000.0 AS chi2
      FROM terms
    )
    SELECT CAST(n AS BIGINT) AS n_rows, round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (n * sqrt(CAST((nr - 1) AS DOUBLE) * (nc - 1)))), 6)
             AS tschuprow_t,
           round(sqrt(chi2 / (chi2 + n)), 6) AS pearson_c
    FROM chi
    """,
)


def _dtschuprow(spark, sf_dir):
    """Tschuprow/Pearson association: one brand x size cell aggregate,
    margin grids, micro-quantized chi-square cells, three closing
    expressions — the full contingency panel at GROUP-BY cost."""
    pa = t(spark, sf_dir, "part")
    cells = (
        pa.groupBy(F.col("p_brand").alias("b"), F.col("p_size").alias("s"))
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    rm = cells.groupBy("b").agg(F.sum("o").cast("long").alias("r"))
    cm = cells.groupBy("s").agg(F.sum("o").cast("long").alias("c"))
    nt = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("b").cast("long").alias("nr"),
        F.countDistinct("s").cast("long").alias("nc"),
    )
    grid = (
        rm.crossJoin(F.broadcast(cm))
        .crossJoin(F.broadcast(nt))
        .join(
            cells.select(F.col("b").alias("cb"), F.col("s").alias("cs"), "o"),
            (F.col("b") == F.col("cb")) & (F.col("s") == F.col("cs")),
            "left",
        )
    )
    dev = (
        F.col("n") * F.coalesce(F.col("o"), F.lit(0))
        - F.col("r").cast("decimal(38,0)") * F.col("c")
    ).cast("double")
    terms = grid.select(
        "n",
        "nr",
        "nc",
        F.floor(
            dev * dev * F.lit(1000000.0)
            / (F.col("n").cast("double") * F.col("r") * F.col("c"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t6"),
    )
    chi = terms.agg(
        F.max("n").alias("n"),
        F.max("nr").alias("nr"),
        F.max("nc").alias("nc"),
        (F.sum("t6").cast("double") / 1000000.0).alias("chi2"),
    )
    return chi.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * F.sqrt((F.col("nr") - 1).cast("double") * (F.col("nc") - 1))
                )
            ),
            6,
        ).alias("tschuprow_t"),
        F.round(F.sqrt(F.col("chi2") / (F.col("chi2") + F.col("n"))), 6).alias(
            "pearson_c"
        ),
    )


CATALOG["ml_tschuprow_t_brand_size"].fn = _dtschuprow


register(
    "doc_good_turing_coverage_by_source",
    # Good-Turing coverage per document source: the Turing estimate of
    # seen-mass, 1 - V1/N (V1 = hapax types, N = token mass) — the
    # standard "how much of this source's distribution have we
    # actually observed" curation gate, beside the global
    # count-of-counts and Chao1 queries.  One tokenize pass; every
    # later frame is (source, type)-bounded; all moments exact ints.
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               x -> x != '')) AS w
      FROM documents
    ),
    tf AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, w
    ),
    agg AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      FROM tf GROUP BY source
    )
    SELECT source, n_tokens, vocab, hapax,
           round(1.0 - CAST(hapax AS DOUBLE) / n_tokens, 6) AS gt_coverage
    FROM agg ORDER BY source
    """,
)


def _dgtcoverage(spark, sf_dir):
    """Good-Turing coverage: ONE tokenize/explode pass is the only
    corpus-sized stage; the (source, type) count table and the
    per-source moment row are vocabulary-bounded."""
    from ._registry import tok_arr

    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tok_arr(F.col("text"))).alias("w"))
    tf = tok.groupBy("source", "w").agg(F.count("*").cast("long").alias("c"))
    agg = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("hapax"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "vocab",
        "hapax",
        F.round(
            F.lit(1.0) - F.col("hapax").cast("double") / F.col("n_tokens"), 6
        ).alias("gt_coverage"),
    ).orderBy("source")


CATALOG["doc_good_turing_coverage_by_source"].fn = _dgtcoverage


# 24-row clock trig table in integer nano-units, quantized ONCE here
# (round(cos(2*pi*h/24) * 1e9)) and fed verbatim to both engines.
_HOUR_TRIG = [
    (h, round(math.cos(2 * math.pi * h / 24) * 1e9),
     round(math.sin(2 * math.pi * h / 24) * 1e9))
    for h in range(24)
]
_HOUR_TRIG_SQL = ", ".join(f"({h}, {c}, {s})" for h, c, s in _HOUR_TRIG)
# 24 / (2*pi), quantized once at 9 decimals: radians -> hours
_RAD_TO_HOURS = 3.819718634


register(
    "evt_circular_stats_hourly",
    # Circular (clock) statistics of event times: the resultant vector
    # over the 24-hour dial.  Hour-bucket counts weight a pinned cos/sin
    # table held in integer nano-units, so C and S are exact BIGINT
    # sums; mean resultant length Rbar = |(C,S)| / (1e9 * N), circular
    # variance 1 - Rbar, and the mean direction in hours via atan2
    # (the two libm calls, rounded at 6).
    oracle=f"""
    WITH hb AS (
      SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    trig AS (
      SELECT * FROM (VALUES {_HOUR_TRIG_SQL}) AS v(h, cos9, sin9)
    ),
    vec AS (
      SELECT CAST(SUM(hb.c) AS BIGINT) AS n,
             CAST(SUM(hb.c * trig.cos9) AS BIGINT) AS c9,
             CAST(SUM(hb.c * trig.sin9) AS BIGINT) AS s9
      FROM hb JOIN trig ON trig.h = hb.h
    )
    SELECT n AS n_events,
           round(sqrt(CAST(c9 AS DOUBLE) * c9 + CAST(s9 AS DOUBLE) * s9)
                 / (1000000000.0 * n), 6) AS resultant_length,
           round(1.0 - sqrt(CAST(c9 AS DOUBLE) * c9 + CAST(s9 AS DOUBLE) * s9)
                       / (1000000000.0 * n), 6) AS circular_variance,
           round(((atan2(CAST(s9 AS DOUBLE), CAST(c9 AS DOUBLE))
                   * {_RAD_TO_HOURS}) + 24.0) % 24.0, 6) AS mean_hour
    FROM vec
    """,
)


def _dcircular(spark, sf_dir):
    """Circular stats: the stream reduces to 24 hour buckets, the trig
    table is a pinned 24-row literal, the resultant is one exact
    integer fold — clock-seasonality at GROUP-BY cost."""
    ev = t(spark, sf_dir, "events")
    hb = ev.groupBy(F.hour("ts").cast("long").alias("h")).agg(
        F.count("*").cast("long").alias("c")
    )
    trig = ev.sparkSession.createDataFrame(
        _HOUR_TRIG, "th LONG, cos9 LONG, sin9 LONG"
    )
    vec = hb.join(F.broadcast(trig), F.col("h") == F.col("th")).agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("cos9")).cast("long").alias("c9"),
        F.sum(F.col("c") * F.col("sin9")).cast("long").alias("s9"),
    )
    rlen = F.sqrt(
        F.col("c9").cast("double") * F.col("c9")
        + F.col("s9").cast("double") * F.col("s9")
    ) / (F.lit(1000000000.0) * F.col("n"))
    return vec.select(
        F.col("n").alias("n_events"),
        F.round(rlen, 6).alias("resultant_length"),
        F.round(F.lit(1.0) - rlen, 6).alias("circular_variance"),
        F.round(
            (
                F.atan2(F.col("s9").cast("double"), F.col("c9").cast("double"))
                * F.lit(_RAD_TO_HOURS)
                + 24.0
            )
            % 24.0,
            6,
        ).alias("mean_hour"),
    )


CATALOG["evt_circular_stats_hourly"].fn = _dcircular


register(
    "ml_quartile_coef_dispersion",
    # Quartile coefficient of dispersion of l_quantity — the robust
    # scale summary (Q3 - Q1)/(Q3 + Q1) — with lower empirical (type-1)
    # quartiles taken exactly from the value-domain histogram: Q_p is
    # the smallest value whose 4x cumulative count reaches p*4*n, an
    # integer decision on the 50-row grid.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    cw AS (
      SELECT q, SUM(c) OVER (ORDER BY q) AS cum, SUM(c) OVER () AS n
      FROM vc
    ),
    qs AS (
      SELECT MAX(n) AS n,
             MIN(CASE WHEN 4 * cum >= n THEN q END) AS q1,
             MIN(CASE WHEN 2 * cum >= n THEN q END) AS q2,
             MIN(CASE WHEN 4 * cum >= 3 * n THEN q END) AS q3
      FROM cw
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS median,
           CAST(q3 AS BIGINT) AS q3,
           CAST(q3 - q1 AS BIGINT) AS iqr,
           round(CAST(q3 - q1 AS DOUBLE) / (q3 + q1), 6) AS cqv
    FROM qs
    """,
)


def _dcqv(spark, sf_dir):
    """Quartile dispersion: the 50-row histogram ECDF, three integer
    threshold selections, one closing ratio — robust spread without a
    sort or a percentile sketch."""
    li = t(spark, sf_dir, "lineitem")
    vc = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count("*").cast("long").alias("c")
    )
    wcum = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cw = vc.select(
        "q", F.sum("c").over(wcum).alias("cum"), F.sum("c").over(wall).alias("n")
    )
    qs = cw.agg(
        F.max("n").alias("n"),
        F.min(F.when(4 * F.col("cum") >= F.col("n"), F.col("q"))).alias("q1"),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("q"))).alias("q2"),
        F.min(F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("q"))).alias("q3"),
    )
    return qs.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("q1").cast("long").alias("q1"),
        F.col("q2").cast("long").alias("median"),
        F.col("q3").cast("long").alias("q3"),
        (F.col("q3") - F.col("q1")).cast("long").alias("iqr"),
        F.round(
            (F.col("q3") - F.col("q1")).cast("double") / (F.col("q3") + F.col("q1")), 6
        ).alias("cqv"),
    )


CATALOG["ml_quartile_coef_dispersion"].fn = _dcqv
