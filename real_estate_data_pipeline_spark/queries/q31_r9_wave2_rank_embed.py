"""Split from queries.py lines 21562-22337 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t, text
from .q09_llm_dedup_text_sim import _LANG_CASE_SQL
from .q15_curation_r3 import _HOURLY_TYPE_CENTS_CTE, _NB_CTES, _hourly_type_cents, _nb_frames
from .q29_r9_rank_stats import _tie_cubic

# ===========================================================================
# round-9 wave 2: k-group rank tests, dispersion, agreement, embedding QA
# ===========================================================================

register(
    "ml_kruskal_wallis_quantity",
    # the k-group extension of Mann-Whitney: Kruskal-Wallis rank ANOVA
    # of quantity across all three return flags. Combined-sample
    # average ranks come from the 50-value histogram (doubled to stay
    # integer through ties); per-group rank sums are exact BIGINTs
    # below 2^53, so every double they become is exact, and the H
    # statistic is one written-order expression both engines share;
    # the tie correction divides two exact integers.
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q FROM lineitem
    ),
    vc AS (
      SELECT q,
             CAST(SUM(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn,
             CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM x GROUP BY q
    ),
    cw AS (
      SELECT q, ca, cn, cr, cnt,
             2 * (SUM(cnt) OVER (ORDER BY q) - cnt) + cnt + 1 AS r2
      FROM vc
    ),
    agg AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cn) AS BIGINT) AS nn,
             CAST(SUM(cr) AS BIGINT) AS nr,
             CAST(SUM(CAST(ca AS HUGEINT) * r2) AS DOUBLE) AS r2a,
             CAST(SUM(CAST(cn AS HUGEINT) * r2) AS DOUBLE) AS r2n,
             CAST(SUM(CAST(cr AS HUGEINT) * r2) AS DOUBLE) AS r2r,
             CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS DOUBLE) AS tsum
      FROM cw
    )
    SELECT n AS n_total, na AS n_a, nn AS n_n, nr AS n_r,
           round(12.0 / (n * (n + 1.0))
                 * ((r2a / 2.0) * (r2a / 2.0) / na
                    + (r2n / 2.0) * (r2n / 2.0) / nn
                    + (r2r / 2.0) * (r2r / 2.0) / nr)
                 - 3.0 * (n + 1.0), 6) AS h_stat,
           round(1.0 - tsum
                       / (CAST(n AS DOUBLE) * n * n - n), 6) AS tie_correction,
           round((12.0 / (n * (n + 1.0))
                  * ((r2a / 2.0) * (r2a / 2.0) / na
                     + (r2n / 2.0) * (r2n / 2.0) / nn
                     + (r2r / 2.0) * (r2r / 2.0) / nr)
                  - 3.0 * (n + 1.0))
                 / (1.0 - tsum
                          / (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_corrected
    FROM agg
    """,
)


def _dkruskal(spark, sf_dir):
    """Kruskal-Wallis over the value-domain histogram: one grouped
    count over 50 quantity values carrying per-flag subcounts, a
    running sum over that 50-row frame, one closing aggregate — the
    k-group rank ANOVA for the cost of a GROUP BY, same skeleton the
    Mann-Whitney query proved."""
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    vc = x.groupBy("q").agg(
        F.sum(F.when(F.col("flag") == "A", 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("flag") == "N", 1).otherwise(0)).cast("long").alias("cn"),
        F.sum(F.when(F.col("flag") == "R", 1).otherwise(0)).cast("long").alias("cr"),
        F.count("*").cast("long").alias("cnt"),
    )
    w = Window.orderBy("q")
    cw = vc.withColumn(
        "r2", 2 * (F.sum("cnt").over(w) - F.col("cnt")) + F.col("cnt") + 1
    )
    agg = cw.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("ca").cast("long").alias("na"),
        F.sum("cn").cast("long").alias("nn"),
        F.sum("cr").cast("long").alias("nr"),
        F.sum(F.col("ca").cast("decimal(18,0)") * F.col("r2")).cast("double").alias("r2a"),
        F.sum(F.col("cn").cast("decimal(18,0)") * F.col("r2")).cast("double").alias("r2n"),
        F.sum(F.col("cr").cast("decimal(18,0)") * F.col("r2")).cast("double").alias("r2r"),
        F.sum(_tie_cubic(F.col("cnt"))).cast("double").alias("tsum"),
    )
    n = F.col("n")
    h = (
        12.0
        / (n * (n + 1.0))
        * (
            (F.col("r2a") / 2.0) * (F.col("r2a") / 2.0) / F.col("na")
            + (F.col("r2n") / 2.0) * (F.col("r2n") / 2.0) / F.col("nn")
            + (F.col("r2r") / 2.0) * (F.col("r2r") / 2.0) / F.col("nr")
        )
        - 3.0 * (n + 1.0)
    )
    tc = 1.0 - F.col("tsum") / (n.cast("double") * n * n - n)
    return agg.select(
        n.alias("n_total"),
        F.col("na").alias("n_a"),
        F.col("nn").alias("n_n"),
        F.col("nr").alias("n_r"),
        F.round(h, 6).alias("h_stat"),
        F.round(tc, 6).alias("tie_correction"),
        F.round(h / tc, 6).alias("h_corrected"),
    )


CATALOG["ml_kruskal_wallis_quantity"].fn = _dkruskal

register(
    "ml_ks_two_sample_quantity",
    # Kolmogorov-Smirnov two-sample test between returned and delivered
    # quantities: D = max over values of |ecdf_R - ecdf_N|, kept exact
    # by cross-multiplying the integer cumulative counts (|cum1*n2 -
    # cum2*n1|) so the max and its argmax value are integer decisions;
    # D and the scaled KS statistic are two final IEEE expressions.
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    vc AS (
      SELECT q,
             CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM x GROUP BY q
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM vc
    ),
    cw AS (
      SELECT q,
             SUM(c1) OVER (ORDER BY q) AS cum1,
             SUM(c2) OVER (ORDER BY q) AS cum2
      FROM vc
    ),
    gaps AS (
      SELECT q, ABS(CAST(cum1 AS HUGEINT) * tot.n2
                    - CAST(cum2 AS HUGEINT) * tot.n1) AS num
      FROM cw CROSS JOIN tot
    ),
    best AS (
      SELECT CAST(MIN(q) AS BIGINT) AS at_value, MAX(num) AS dnum FROM gaps
      WHERE num = (SELECT MAX(num) FROM gaps)
    )
    SELECT tot.n1 AS n_r, tot.n2 AS n_n, best.at_value,
           round(CAST(best.dnum AS DOUBLE) / (tot.n1 * CAST(tot.n2 AS DOUBLE)), 6)
               AS d_stat,
           round(CAST(best.dnum AS DOUBLE) / (tot.n1 * CAST(tot.n2 AS DOUBLE))
                 * sqrt(tot.n1 * CAST(tot.n2 AS DOUBLE) / (tot.n1 + tot.n2)), 6)
               AS ks_stat
    FROM best CROSS JOIN tot
    """,
)


def _dkstest(spark, sf_dir):
    """KS two-sample over the value-domain histogram: the ecdf gap is
    an integer cross-multiplication per histogram row, the max and its
    argmax are one aggregate over the 50-row frame — no per-row sort,
    no quantile pass over raw data."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    vc = x.groupBy("q").agg(
        F.sum(F.when(F.col("flag") == "R", 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("flag") == "N", 1).otherwise(0)).cast("long").alias("c2"),
    ).localCheckpoint(eager=False)
    tot = vc.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    w = Window.orderBy("q")
    cw = vc.select(
        "q", F.sum("c1").over(w).alias("cum1"), F.sum("c2").over(w).alias("cum2")
    )
    gaps = cw.crossJoin(F.broadcast(tot)).select(
        "q",
        "n1",
        "n2",
        F.abs(
            F.col("cum1").cast("decimal(18,0)") * F.col("n2")
            - F.col("cum2").cast("decimal(18,0)") * F.col("n1")
        ).alias("num"),
    )
    best = gaps.agg(
        F.max("num").alias("dnum"),
        F.min(F.col("n1")).alias("n1"),
        F.min(F.col("n2")).alias("n2"),
    )
    at_v = gaps.join(F.broadcast(best.select("dnum")), gaps.num == F.col("dnum")).agg(
        F.min("q").cast("long").alias("at_value")
    )
    d = F.col("dnum").cast("double") / (F.col("n1") * F.col("n2").cast("double"))
    return best.crossJoin(F.broadcast(at_v)).select(
        F.col("n1").alias("n_r"),
        F.col("n2").alias("n_n"),
        "at_value",
        F.round(d, 6).alias("d_stat"),
        F.round(
            d
            * F.sqrt(
                F.col("n1") * F.col("n2").cast("double") / (F.col("n1") + F.col("n2"))
            ),
            6,
        ).alias("ks_stat"),
    )


CATALOG["ml_ks_two_sample_quantity"].fn = _dkstest

register(
    "evt_poisson_dispersion_daily",
    # is daily traffic Poisson? The index of dispersion (variance-to-
    # mean ratio) of daily event counts plus the chi-square dispersion
    # statistic (n-1)*ID — both exact integer-sum rationals, one IEEE
    # division each. ID >> 1 means burstier-than-Poisson (overdispersed)
    # traffic, the signal that sizing on a Poisson assumption is wrong.
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s1,
             SUM(CAST(c AS HUGEINT) * c) AS s2
      FROM daily
    )
    SELECT n AS n_days, s1 AS total_events,
           round(s1 / CAST(n AS DOUBLE), 6) AS mean_daily,
           round(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                 / (n * (n - 1.0)), 6) AS var_daily,
           round(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                 / ((n - 1.0) * s1), 6) AS dispersion_index,
           round(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                 / CAST(s1 AS DOUBLE), 6) AS chi2
    FROM agg
    """,
)


def _dpoissondisp(spark, sf_dir):
    """Poisson dispersion check: the stream collapses to one day-keyed
    count, the moments to one 3-column aggregate — every statistic
    derives from (n, sum, sum-of-squares) integers."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    agg = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c").cast("decimal(18,0)") * F.col("c")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    num = (n * s2 - s1.cast("decimal(18,0)") * s1).cast("double")
    return agg.select(
        n.alias("n_days"),
        s1.alias("total_events"),
        F.round(s1 / n.cast("double"), 6).alias("mean_daily"),
        F.round(num / (n * (n - 1.0)), 6).alias("var_daily"),
        F.round(num / ((n - 1.0) * s1), 6).alias("dispersion_index"),
        F.round(num / s1.cast("double"), 6).alias("chi2"),
    )


CATALOG["evt_poisson_dispersion_daily"].fn = _dpoissondisp

# The two-rater agreement machinery, single-sourced: Cohen's kappa and
# Scott's pi (round 12) close over the SAME (nb_pred, heur_pred) verdict
# frame, so the two chance-corrections can never score different raters.
_KAPPA_J_CTES = f"""pred AS (
      SELECT doc_id, lang AS nb_pred FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score6 DESC, lang) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    heur AS ({_LANG_CASE_SQL.replace("lang_pred", "heur_pred")}),
    j AS MATERIALIZED (
      SELECT p.nb_pred, h.heur_pred
      FROM test_docs td
      JOIN pred p USING (doc_id)
      JOIN heur h USING (doc_id)
    )"""


def _kappa_j(spark, sf_dir):
    """Spark twin of _KAPPA_J_CTES: the (nb_pred, heur_pred) verdict
    frame over the NB test split — checkpointed, multi-consumed by the
    two-rater agreement family."""
    from ..ops import text

    test, scored = _nb_frames(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("__score6"), "lang")
    pred = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("lang").alias("nb_pred"))
    )
    d = t(spark, sf_dir, "documents")
    heur = d.select("doc_id", text.lang_id(F.col("text")).alias("heur_pred"))
    return (
        test.select("doc_id")
        .join(pred, "doc_id")
        .join(heur, "doc_id")
        .select("nb_pred", "heur_pred")
        .localCheckpoint(eager=False)
    )


register(
    "ml_cohens_kappa_lang",
    # inter-rater agreement between TWO real classifiers over the NB
    # test split: the trained Naive Bayes predictor vs the stopword
    # lang-ID heuristic. Cohen's kappa stays exact until one division:
    # kappa = (n*agree - S) / (n*n - S) with S = sum over classes of
    # the two raters' marginal-count products — all BIGINTs.
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
    s AS (
      SELECT CAST(SUM(COALESCE(ma.cnt, 0) * COALESCE(mb.cnt, 0)) AS BIGINT) AS s
      FROM ma FULL OUTER JOIN mb USING (cls)
    )
    SELECT nn.n AS n_docs, nn.agree AS n_agree, s.s AS marginal_product_sum,
           round(nn.agree / CAST(nn.n AS DOUBLE), 6) AS observed_agreement,
           round(s.s / (nn.n * CAST(nn.n AS DOUBLE)), 6) AS expected_agreement,
           round(CAST(nn.n * nn.agree - s.s AS DOUBLE)
                 / CAST(nn.n * nn.n - s.s AS BIGINT), 6) AS cohens_kappa
    FROM nn CROSS JOIN s
    """,
)


def _dkappa(spark, sf_dir):
    """Cohen's kappa between the NB classifier and the lang-ID
    heuristic: both raters' predictions join on the test split, the
    confusion marginals are two class-keyed counts joined full-outer,
    and kappa is exact integers until the final division — the
    label-quality audit run before trusting weak labels at scale.
    Closes over the shared _kappa_j verdict frame."""
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
    s = (
        ma.join(mb, "cls", "full")
        .agg(
            F.sum(
                F.coalesce(F.col("ca"), F.lit(0)) * F.coalesce(F.col("cb"), F.lit(0))
            )
            .cast("long")
            .alias("s")
        )
    )
    return nn.crossJoin(F.broadcast(s)).select(
        F.col("n").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        F.col("s").alias("marginal_product_sum"),
        F.round(F.col("agree") / F.col("n").cast("double"), 6).alias(
            "observed_agreement"
        ),
        F.round(F.col("s") / (F.col("n") * F.col("n").cast("double")), 6).alias(
            "expected_agreement"
        ),
        F.round(
            (F.col("n") * F.col("agree") - F.col("s")).cast("double")
            / (F.col("n") * F.col("n") - F.col("s")).cast("long"),
            6,
        ).alias("cohens_kappa"),
    )


CATALOG["ml_cohens_kappa_lang"].fn = _dkappa

register(
    "emb_silhouette_by_label",
    # embedding-space cluster quality: simplified silhouette per label
    # (a = distance to the OWN label centroid, b = distance to the
    # nearest OTHER centroid, s = (b-a)/max(a,b)). Centroid dims are
    # exact-integer means (per-element micro-unit quantization BEFORE
    # the sum, so the accumulation is order-independent in both
    # engines) snapped to 6dp, per-dim squared gaps quantize to
    # integer micro-units BEFORE summing so the 64-term sum is
    # order-independent, and per-row silhouettes aggregate as micro-unit
    # integers — the cluster-separation gauge next to the class-margin
    # audit.
    oracle="""
    WITH dims AS MATERIALIZED (
      SELECT vec_id, label,
             unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    cent AS MATERIALIZED (
      SELECT label AS clabel, pos,
             round(CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                 AS BIGINT)) AS DOUBLE)
                   / COUNT(*) / 1000000.0, 6) AS c
      FROM dims GROUP BY label, pos
    ),
    d2 AS (
      SELECT d.vec_id, d.label, ct.clabel,
             CAST(SUM(CAST(floor(round((CAST(d.x AS DOUBLE) - ct.c)
                                        * (CAST(d.x AS DOUBLE) - ct.c), 6)
                                  * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS d2_6
      FROM dims d JOIN cent ct ON ct.pos = d.pos
      GROUP BY d.vec_id, d.label, ct.clabel
    ),
    ab AS (
      SELECT vec_id, label,
             CAST(MIN(CASE WHEN clabel = label THEN d2_6 END) AS BIGINT) AS own6,
             CAST(MIN(CASE WHEN clabel <> label THEN d2_6 END) AS BIGINT) AS other6
      FROM d2 GROUP BY vec_id, label
    ),
    s AS (
      SELECT label,
             CAST(floor(round((sqrt(other6 / 1000000.0) - sqrt(own6 / 1000000.0))
                              / NULLIF(GREATEST(sqrt(own6 / 1000000.0),
                                                sqrt(other6 / 1000000.0)), 0.0),
                              6) * 1000000 + 0.5) AS BIGINT) AS s6
      FROM ab
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(CAST(SUM(s6) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS mean_silhouette,
           CAST(SUM(CASE WHEN s6 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
    FROM s GROUP BY label ORDER BY label
    """,
)


def _dsilhouette(spark, sf_dir):
    """Simplified silhouette: the 10x64 centroid table is one grouped
    average (broadcast back as arrays), each vector meets all 10
    centroids through a zip_with fold over its OWN array — no dim
    explosion on the vector side, no pairwise vector distances
    (classic silhouette is O(n^2); the centroid form is the one that
    scales) — and the per-label rollup sums integer micro-units."""
    e = t(spark, sf_dir, "embeddings").localCheckpoint(eager=False)
    cent = (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            # exact-integer mean: micro-quantize per element, sum BIGINTs
            # (order-independent), divide once — no float accumulation
            F.round(
                F.sum(
                    F.floor(F.col("x").cast("double") * 1e6 + 0.5).cast("long")
                ).cast("double")
                / F.count("*")
                / 1e6,
                6,
            ).alias("c")
        )
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("__pc")
        )
        .select(
            F.col("label").alias("clabel"),
            F.transform("__pc", lambda s: s["c"]).alias("cvec"),
        )
    )
    term = lambda x, c: F.floor(  # noqa: E731
        F.round((x.cast("double") - c) * (x.cast("double") - c), 6) * 1e6 + 0.5
    ).cast("long")
    d2 = (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            "clabel",
            F.aggregate(
                F.zip_with(F.col("embedding"), F.col("cvec"), term),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            ).alias("d2_6"),
        )
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("d2_6")))
        .cast("long")
        .alias("own6"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d2_6")))
        .cast("long")
        .alias("other6"),
    )
    a = F.sqrt(F.col("own6") / 1e6)
    b = F.sqrt(F.col("other6") / 1e6)
    s6 = F.floor(
        F.round((b - a) / F.nullif(F.greatest(a, b), F.lit(0.0)), 6) * 1e6 + 0.5
    ).cast("long")
    s = ab.select("label", s6.alias("s6"))
    return (
        s.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(F.sum("s6").cast("double") / F.count("*") / 1e6, 6).alias(
                "mean_silhouette"
            ),
            F.sum(F.when(F.col("s6") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_positive"),
        )
        .orderBy("label")
    )


CATALOG["emb_silhouette_by_label"].fn = _dsilhouette

register(
    "evt_page_hinkley_hourly",
    # the fourth member of the drift family (CUSUM, change-point, PSI —
    # and now Page-Hinkley, the sequential mean-shift detector): per
    # event_type, U_t = sum_{i<=t} (x_i - mean_i - delta) where mean_i
    # is the RUNNING prefix mean, and PH_t = U_t - min_{s<=t} U_s — the
    # same prefix-sum-minus-running-min identity that de-recursed
    # CUSUM. The running mean quantizes to floor micro-cents (one
    # double division of exact integers per row), so U is an exact
    # integer series and the argmax alarm hour is an integer decision.
    # delta = 100 cents of hourly tolerance.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE},
    idx AS (
      SELECT event_type, h, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS i,
             SUM(cents) OVER (PARTITION BY event_type ORDER BY h) AS s
      FROM obs
    ),
    dev AS (
      SELECT event_type, h,
             cents * 1000000
               - CAST(floor(s * 1000000.0 / i) AS BIGINT)
               - 100000000 AS d6
      FROM idx
    ),
    u AS (
      SELECT event_type, h,
             SUM(d6) OVER (PARTITION BY event_type ORDER BY h) AS u6
      FROM dev
    ),
    ph AS (
      SELECT event_type, h,
             u6 - MIN(u6) OVER (PARTITION BY event_type ORDER BY h) AS ph6
      FROM u
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           round(MAX(ph6) / 100000000.0, 6) AS ph_max_value,
           strftime(MIN(CASE WHEN ph6 = mx THEN h END), '%Y-%m-%d %H:%M:%S')
               AS alarm_hour,
           MAX(ph6) / 100000000.0 >= 1000.0 AS alarm
    FROM (SELECT *, MAX(ph6) OVER (PARTITION BY event_type) AS mx FROM ph)
    GROUP BY event_type ORDER BY event_type
    """,
)


def _dpagehinkley(spark, sf_dir):
    """Page-Hinkley without recursion: three windows over ONE
    (event_type)-partitioned sort — prefix sum (for the running mean),
    prefix sum of deviations, running min — then a per-type rollup.
    The plan is one exchange + one sort reused by every window; at
    100 TB the state per type is the window frame, nothing quadratic.
    Pipeline single-sourced with the streaming twin via _ph_report."""
    # Lazy import: _ph_report lives in the later r10 graph-scoring module
    # (it was a forward reference inside the original single file, legal
    # there via late global binding; across modules it must be deferred).
    from .q34_r10_graph_scoring import _ph_report

    return _ph_report(_hourly_type_cents(spark, sf_dir))


CATALOG["evt_page_hinkley_hourly"].fn = _dpagehinkley

# Shared 3-feature melt for the split-scoring family (Gini gain and
# information-gain ratio): linestatus, a 4-band quantity bucketing and
# the 11-value discount-cents domain, all against the return-flag
# target. Single-sourced (SQL text + Spark frame below) so the two
# rankings can never score different featurizations.
_SPLIT_MELT_SQL = """x AS MATERIALIZED (
      SELECT feature, val, flag FROM (
        SELECT 'linestatus' AS feature, l_linestatus AS val,
               l_returnflag AS flag
        FROM lineitem
        UNION ALL
        SELECT 'qty_band',
               CASE WHEN CAST(l_quantity AS BIGINT) <= 10 THEN 'q1_10'
                    WHEN CAST(l_quantity AS BIGINT) <= 25 THEN 'q11_25'
                    WHEN CAST(l_quantity AS BIGINT) <= 40 THEN 'q26_40'
                    ELSE 'q41_50' END,
               l_returnflag
        FROM lineitem
        UNION ALL
        SELECT 'disc_cents',
               CAST(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)
                    AS VARCHAR),
               l_returnflag
        FROM lineitem
      )
    )"""


def _split_melt(li):
    """Spark twin of _SPLIT_MELT_SQL."""
    q = F.col("l_quantity").cast("long")
    qty_band = (
        F.when(q <= 10, "q1_10")
        .when(q <= 25, "q11_25")
        .when(q <= 40, "q26_40")
        .otherwise("q41_50")
    )
    disc_cents = (
        (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long").cast("string")
    )
    return li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("linestatus").alias("feature"),
                    F.col("l_linestatus").alias("val"),
                ),
                F.struct(F.lit("qty_band").alias("feature"), qty_band.alias("val")),
                F.struct(
                    F.lit("disc_cents").alias("feature"), disc_cents.alias("val")
                ),
            )
        ).alias("fv"),
        F.col("l_returnflag").alias("flag"),
    ).select("fv.feature", "fv.val", "flag")


register(
    "ml_gini_split_ranking",
    # the decision-tree split primitive in pure relational algebra:
    # rank three candidate categorical features (linestatus, a 4-band
    # quantity bucketing, the 11-value discount-cents domain) by Gini
    # gain against the return-flag target. Per-value impurity mass
    # (n_v^2 - sum_c n_vc^2)/n_v quantizes to micro-units (exact
    # doubles below 2^53 feed ONE division), the weighted child
    # impurity is an integer sum over feature values, and the root
    # impurity is shared by construction.
    oracle=f"""
    WITH {_SPLIT_MELT_SQL},
    fvc AS (
      SELECT feature, val, flag, CAST(COUNT(*) AS BIGINT) AS c
      FROM x GROUP BY 1, 2, 3
    ),
    fv AS (
      SELECT feature, val,
             CAST(SUM(c) AS BIGINT) AS nv,
             CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS sq
      FROM fvc GROUP BY 1, 2
    ),
    vterm AS (
      SELECT feature, val, nv,
             CAST(floor(round((CAST(nv AS DOUBLE) * nv - sq) / nv, 6)
                        * 1000000 + 0.5) AS BIGINT) AS t6
      FROM fv
    ),
    root AS (
      SELECT CAST(SUM(cc) AS BIGINT) AS n,
             CAST(SUM(CAST(cc AS HUGEINT) * cc) AS DOUBLE) AS sqr
      FROM (
        SELECT flag, CAST(SUM(c) AS BIGINT) AS cc
        FROM (SELECT flag, c FROM fvc WHERE feature = 'linestatus') GROUP BY flag
      )
    ),
    agg AS (
      SELECT feature,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(t6) AS BIGINT) AS wg6
      FROM vterm GROUP BY feature
    )
    SELECT agg.feature, agg.n_values,
           round((CAST(root.n AS DOUBLE) * root.n - root.sqr)
                 / root.n / root.n, 6) AS gini_root,
           round(wg6 / 1000000.0 / root.n, 6) AS gini_weighted,
           round((CAST(root.n AS DOUBLE) * root.n - root.sqr) / root.n / root.n
                 - wg6 / 1000000.0 / root.n, 6) AS gini_gain
    FROM agg CROSS JOIN root
    ORDER BY gini_gain DESC, feature
    """,
)


def _dginisplit(spark, sf_dir):
    """Gini split ranking: the three features melt into one
    (feature, value, class) count pass (a single shuffle on a
    low-cardinality key), per-value impurity mass reduces to a
    feature-count-sized frame, and the root term is a 1-row broadcast
    — how a distributed tree learner scores candidate splits without
    ever re-scanning per feature."""
    li = t(spark, sf_dir, "lineitem")
    x = _split_melt(li)
    fvc = x.groupBy("feature", "val", "flag").agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint(eager=False)
    fv = fvc.groupBy("feature", "val").agg(
        F.sum("c").cast("long").alias("nv"),
        F.sum(F.col("c").cast("decimal(18,0)") * F.col("c")).cast("double").alias("sq"),
    )
    vterm = fv.select(
        "feature",
        "nv",
        F.floor(
            F.round(
                (F.col("nv").cast("double") * F.col("nv") - F.col("sq")) / F.col("nv"),
                6,
            )
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("t6"),
    )
    root = (
        fvc.filter(F.col("feature") == "linestatus")
        .groupBy("flag")
        .agg(F.sum("c").cast("long").alias("cc"))
        .agg(
            F.sum("cc").cast("long").alias("n"),
            F.sum(F.col("cc").cast("decimal(18,0)") * F.col("cc"))
            .cast("double")
            .alias("sqr"),
        )
    )
    agg = vterm.groupBy("feature").agg(
        F.count("*").cast("long").alias("n_values"),
        F.sum("t6").cast("long").alias("wg6"),
    )
    g_root = (
        F.col("n").cast("double") * F.col("n") - F.col("sqr")
    ) / F.col("n") / F.col("n")
    wg = F.col("wg6") / 1e6 / F.col("n")
    return (
        agg.crossJoin(F.broadcast(root))
        .select(
            "feature",
            "n_values",
            F.round(g_root, 6).alias("gini_root"),
            F.round(wg, 6).alias("gini_weighted"),
            F.round(g_root - wg, 6).alias("gini_gain"),
        )
        .orderBy(F.desc("gini_gain"), "feature")
    )


CATALOG["ml_gini_split_ranking"].fn = _dginisplit


