"""Round-15 wave 6: classifier evaluation II on the order-value
score / urgent-priority label pair — partial AUC (FPR <= 0.2, with
exact boundary interpolation), the KS separation statistic (max
|TPR - FPR| with an all-integer argmax), an F-beta / balanced-accuracy
threshold sweep at the 9 decile cuts (pure integer rationals), and
two calibration scores on the shared r12 band frame: Spiegelhalter's
Z and the Brier skill score vs the climatology baseline.

Exactness: ROC cumulative counts are integers off the $1000-band
histogram (the r10 AUC machinery); the straddling pAUC segment works
in 5*fp units so the FPR = 0.2 cut lands on the integer t0; per-
segment trapezoid terms micro-quantize into 128-bit sums; the KS
argmax key is the integer |tp*t0 - fp*t1| composite; F-beta clears
to integer numerators (x4 for beta = 1/2); the 10-band calibration
terms micro-quantize per band before the sums.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from .q52_r12_calibration_inequality import _CAL_CTES, _cal_bands

_ROC_CTES = """
    WITH x AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100000 AS band
      FROM orders
    ),
    vc AS (
      SELECT band, CAST(SUM(pos) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n0
      FROM x GROUP BY band
    ),
    tot AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
                   CAST(SUM(n0) AS BIGINT) AS t0 FROM vc),
    cw AS (
      SELECT band, n1, n0,
             SUM(n1) OVER (ORDER BY band DESC) AS tp,
             SUM(n0) OVER (ORDER BY band DESC) AS fp
      FROM vc
    )"""


def _roc_cw(spark, sf_dir):
    """Spark twin of _ROC_CTES: descending-band cumulative (tp, fp)
    with per-band increments and the 1-row totals broadcast on."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("pos"),
        ((F.col("o_totalprice").cast(DEC) * 100).cast("long") / F.lit(100000))
        .cast("long")
        .alias("band"),
    )
    vc = x.groupBy("band").agg(
        F.sum("pos").cast("long").alias("n1"),
        (F.count("*") - F.sum("pos")).cast("long").alias("n0"),
    )
    tot = vc.agg(
        F.sum("n1").cast("long").alias("t1"), F.sum("n0").cast("long").alias("t0")
    )
    wdesc = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cw = vc.select(
        "band",
        "n1",
        "n0",
        F.sum("n1").over(wdesc).alias("tp"),
        F.sum("n0").over(wdesc).alias("fp"),
    )
    return cw.crossJoin(F.broadcast(tot))


register(
    "ml_partial_auc_price_urgent",
    # pAUC over FPR <= 0.2: trapezoids between consecutive descending-
    # band ROC points, the straddling segment interpolated exactly at
    # 5*fp = t0 (so the cut is the INTEGER t0 in 5*fp units);
    # per-segment terms micro-quantized into a 128-bit sum; also the
    # normalization pauc/0.2 (the share of the admissible rectangle).
    oracle=f"""
    {_ROC_CTES},
    seg AS (
      SELECT CASE
               WHEN n0 = 0 OR 5 * (fp - n0) >= t0 THEN CAST(0 AS HUGEINT)
               ELSE CAST(floor(
                 (LEAST(5 * fp, t0) - 5 * (fp - n0))
                 * ((tp - n1) + ((tp - n1)
                    + CAST(n1 AS DOUBLE) * (LEAST(5 * fp, t0) - 5 * (fp - n0))
                      / (5 * n0)))
                 * 1000000 + 0.5) AS HUGEINT)
             END AS a6,
             t1, t0
      FROM cw CROSS JOIN tot
    )
    SELECT MAX(t1) AS n_pos, MAX(t0) AS n_neg,
           round(CAST(SUM(a6) AS DOUBLE) / 1e6
                 / (10.0 * MAX(t1) * MAX(t0)), 9) AS pauc_fpr20,
           round(CAST(SUM(a6) AS DOUBLE) / 1e6
                 / (10.0 * MAX(t1) * MAX(t0)) / 0.2, 9) AS pauc_normalized
    FROM seg
    """,
)


def _dpauc(spark, sf_dir):
    """Partial AUC off the descending-band ROC cumulative."""
    cw = _roc_cw(spark, sf_dir)
    w5lo = 5 * (F.col("fp") - F.col("n0"))
    w5hi = F.least(5 * F.col("fp"), F.col("t0"))
    width = w5hi - w5lo
    tplo = F.col("tp") - F.col("n1")
    tpcut = tplo + F.col("n1").cast("double") * width / (5 * F.col("n0"))
    a6 = (
        F.when((F.col("n0") == 0) | (w5lo >= F.col("t0")), F.lit(0).cast("decimal(38,0)"))
        .otherwise(
            F.floor(width * (tplo + tpcut) * F.lit(1000000) + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        )
    )
    seg = cw.select(a6.alias("a6"), "t1", "t0")
    pauc = (
        F.sum("a6").cast("double")
        / F.lit(1e6)
        / (F.lit(10.0) * F.max("t1") * F.max("t0"))
    )
    return seg.agg(
        F.max("t1").alias("n_pos"),
        F.max("t0").alias("n_neg"),
        F.round(pauc, 9).alias("pauc_fpr20"),
        F.round(pauc / F.lit(0.2), 9).alias("pauc_normalized"),
    )


CATALOG["ml_partial_auc_price_urgent"].fn = _dpauc


register(
    "ml_ks_separation_price_urgent",
    # Kolmogorov-Smirnov separation of the score distributions =
    # max over thresholds of |TPR - FPR| (equals max Youden J over
    # the ROC): the argmax runs on the INTEGER key |tp*t0 - fp*t1|
    # with a smallest-band tie-break.
    oracle=f"""
    {_ROC_CTES},
    d AS (
      SELECT band, tp, fp, t1, t0,
             ABS(tp * t0 - fp * t1) AS dint
      FROM cw CROSS JOIN tot
    )
    SELECT MAX(t1) AS n_pos, MAX(t0) AS n_neg,
           MAX_BY(band, dint * 100000 - band) AS band_at_max,
           round(CAST(MAX(dint) AS DOUBLE) / (MAX(t1) * CAST(MAX(t0) AS DOUBLE)),
                 9) AS ks_stat
    FROM d
    """,
)


def _dks(spark, sf_dir):
    """Integer-keyed KS separation over the ROC cumulative."""
    cw = _roc_cw(spark, sf_dir)
    d = cw.select(
        "band",
        "t1",
        "t0",
        F.abs(F.col("tp") * F.col("t0") - F.col("fp") * F.col("t1")).alias("dint"),
    )
    return d.agg(
        F.max("t1").alias("n_pos"),
        F.max("t0").alias("n_neg"),
        F.max_by("band", F.col("dint") * 100000 - F.col("band")).alias("band_at_max"),
        F.round(
            F.max("dint").cast("double") / (F.max("t1") * F.max("t0").cast("double")),
            9,
        ).alias("ks_stat"),
    )


CATALOG["ml_ks_separation_price_urgent"].fn = _dks


register(
    "ml_fbeta_threshold_sweep",
    # F0.5 / F1 / F2 and balanced accuracy at the 9 decile thresholds
    # of the band histogram (predict positive when band > t_k, t_k =
    # min band with 10*cum >= k*N): every score is an exact integer
    # rational — F0.5 = 5tp/(5tp+fn+4fp), F1 = 2tp/(2tp+fn+fp),
    # F2 = 5tp/(5tp+4fn+fp), bal.acc = (tp*t0 + tn*t1)/(2*t1*t0).
    oracle=f"""
    {_ROC_CTES},
    asc_ AS (
      SELECT band,
             SUM(n1) OVER (ORDER BY band) AS c1,
             SUM(n1 + n0) OVER (ORDER BY band) AS cn,
             SUM(n0) OVER (ORDER BY band) AS c0
      FROM vc
    ),
    ks(k) AS (VALUES (1), (2), (3), (4), (5), (6), (7), (8), (9)),
    lv AS (
      SELECT k, MIN(band) AS tk
      FROM ks CROSS JOIN tot JOIN asc_ ON 10 * asc_.cn >= k * (t1 + t0)
      GROUP BY k
    ),
    conf AS (
      SELECT lv.k, lv.tk,
             CAST(t1 - a.c1 AS BIGINT) AS tp, CAST(t0 - a.c0 AS BIGINT) AS fp,
             CAST(a.c1 AS BIGINT) AS fn, CAST(a.c0 AS BIGINT) AS tn, t1, t0
      FROM lv JOIN asc_ a ON a.band = lv.tk CROSS JOIN tot
    )
    SELECT k AS decile, tk AS threshold_band, tp, fp, fn, tn,
           round(CAST(5 * tp AS DOUBLE) / NULLIF(5 * tp + fn + 4 * fp, 0), 9)
             AS f_half,
           round(CAST(2 * tp AS DOUBLE) / NULLIF(2 * tp + fn + fp, 0), 9) AS f1,
           round(CAST(5 * tp AS DOUBLE) / NULLIF(5 * tp + 4 * fn + fp, 0), 9)
             AS f2,
           round((CAST(tp AS DOUBLE) * t0 + CAST(tn AS DOUBLE) * t1)
                 / (2.0 * t1 * t0), 9) AS balanced_acc
    FROM conf ORDER BY k
    """,
)


def _dfbeta(spark, sf_dir):
    """Decile-threshold F-beta sweep — integer confusion rationals."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("pos"),
        ((F.col("o_totalprice").cast(DEC) * 100).cast("long") / F.lit(100000))
        .cast("long")
        .alias("band"),
    )
    vc = x.groupBy("band").agg(
        F.sum("pos").cast("long").alias("n1"),
        (F.count("*") - F.sum("pos")).cast("long").alias("n0"),
    )
    tot = vc.agg(
        F.sum("n1").cast("long").alias("t1"), F.sum("n0").cast("long").alias("t0")
    )
    wasc = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    asc_ = vc.select(
        "band",
        F.sum("n1").over(wasc).alias("c1"),
        F.sum(F.col("n1") + F.col("n0")).over(wasc).alias("cn"),
        F.sum("n0").over(wasc).alias("c0"),
    ).crossJoin(F.broadcast(tot))
    ks = spark.createDataFrame([(k,) for k in range(1, 10)], "k int")
    lv = (
        asc_.crossJoin(F.broadcast(ks))
        .filter(10 * F.col("cn") >= F.col("k") * (F.col("t1") + F.col("t0")))
        .groupBy("k")
        .agg(F.min("band").alias("tk"))
    )
    conf = lv.join(
        asc_.select("band", "c1", "c0", "t1", "t0"),
        lv["tk"] == F.col("band"),
    ).select(
        "k",
        "tk",
        (F.col("t1") - F.col("c1")).alias("tp"),
        (F.col("t0") - F.col("c0")).alias("fp"),
        F.col("c1").alias("fn"),
        F.col("c0").alias("tn"),
        "t1",
        "t0",
    )
    nz = lambda c: F.nullif(c, F.lit(0))  # noqa: E731
    return conf.select(
        F.col("k").alias("decile"),
        F.col("tk").alias("threshold_band"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            (5 * F.col("tp")).cast("double") / nz(5 * F.col("tp") + F.col("fn") + 4 * F.col("fp")),
            9,
        ).alias("f_half"),
        F.round(
            (2 * F.col("tp")).cast("double") / nz(2 * F.col("tp") + F.col("fn") + F.col("fp")),
            9,
        ).alias("f1"),
        F.round(
            (5 * F.col("tp")).cast("double") / nz(5 * F.col("tp") + 4 * F.col("fn") + F.col("fp")),
            9,
        ).alias("f2"),
        F.round(
            (F.col("tp").cast("double") * F.col("t0") + F.col("tn").cast("double") * F.col("t1"))
            / (2.0 * F.col("t1") * F.col("t0")),
            9,
        ).alias("balanced_acc"),
    ).orderBy("decile")


CATALOG["ml_fbeta_threshold_sweep"].fn = _dfbeta


register(
    "ml_spiegelhalter_z_calibration",
    # Spiegelhalter's Z for the band-rate predictor on the held-out
    # half: Z = sum (y - p)(1 - 2p) / sqrt(sum p(1-p)(1-2p)^2), with
    # the band sums closed over counts: num_b = (s_te - n_te*p)(1-2p),
    # den_b = n_te*p(1-p)(1-2p)^2, p = s_tr/n_tr.  Micro-quantized
    # per band (train-empty bands skipped), 10-term integer sums.
    oracle=f"""
    {_CAL_CTES},
    terms AS (
      SELECT CAST(floor((s_te - n_te * (CAST(s_tr AS DOUBLE) / n_tr))
                        * (1 - 2 * (CAST(s_tr AS DOUBLE) / n_tr))
                        * 1000000 + 0.5) AS BIGINT) AS num6,
             CAST(floor(n_te * (CAST(s_tr AS DOUBLE) / n_tr)
                        * (1 - CAST(s_tr AS DOUBLE) / n_tr)
                        * (1 - 2 * (CAST(s_tr AS DOUBLE) / n_tr))
                        * (1 - 2 * (CAST(s_tr AS DOUBLE) / n_tr))
                        * 1000000 + 0.5) AS BIGINT) AS den6
      FROM bands WHERE n_tr > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bands,
           round(CAST(SUM(num6) AS DOUBLE) / 1e6, 6) AS z_num,
           round(CAST(SUM(den6) AS DOUBLE) / 1e6, 6) AS z_den_var,
           round(CAST(SUM(num6) AS DOUBLE) / 1e6
                 / sqrt(CAST(SUM(den6) AS DOUBLE) / 1e6), 6) AS spiegelhalter_z
    FROM terms
    """,
)


def _dspiegelhalter(spark, sf_dir):
    """Spiegelhalter Z off the shared calibration bands."""
    bands = _cal_bands(spark, sf_dir)
    p = F.col("s_tr").cast("double") / F.col("n_tr")
    num6 = F.floor(
        (F.col("s_te") - F.col("n_te") * p) * (1 - 2 * p) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    den6 = F.floor(
        F.col("n_te") * p * (1 - p) * (1 - 2 * p) * (1 - 2 * p) * F.lit(1000000)
        + F.lit(0.5)
    ).cast("long")
    terms = bands.filter(F.col("n_tr") > 0).select(
        num6.alias("num6"), den6.alias("den6")
    )
    return terms.agg(
        F.count("*").cast("long").alias("n_bands"),
        F.round(F.sum("num6").cast("double") / F.lit(1e6), 6).alias("z_num"),
        F.round(F.sum("den6").cast("double") / F.lit(1e6), 6).alias("z_den_var"),
        F.round(
            F.sum("num6").cast("double")
            / F.lit(1e6)
            / F.sqrt(F.sum("den6").cast("double") / F.lit(1e6)),
            6,
        ).alias("spiegelhalter_z"),
    )


CATALOG["ml_spiegelhalter_z_calibration"].fn = _dspiegelhalter


register(
    "ml_brier_skill_score",
    # Brier skill score of the band-rate predictor vs climatology
    # (the overall train rate) on the held-out half: BS closed over
    # band counts — bs_b = s_te(1-p)^2 + (n_te-s_te)p^2 — per-band
    # micro-quantized; BSS = 1 - BS_model/BS_clim.
    oracle=f"""
    {_CAL_CTES},
    base AS (
      SELECT CAST(SUM(s_tr) AS DOUBLE) / SUM(n_tr) AS pbar FROM bands
    ),
    terms AS (
      SELECT CAST(floor((s_te * (1 - CAST(s_tr AS DOUBLE) / n_tr)
                           * (1 - CAST(s_tr AS DOUBLE) / n_tr)
                         + (n_te - s_te) * (CAST(s_tr AS DOUBLE) / n_tr)
                           * (CAST(s_tr AS DOUBLE) / n_tr))
                        * 1000000 + 0.5) AS BIGINT) AS m6,
             CAST(floor((s_te * (1 - pbar) * (1 - pbar)
                         + (n_te - s_te) * pbar * pbar)
                        * 1000000 + 0.5) AS BIGINT) AS c6,
             n_te
      FROM bands CROSS JOIN base WHERE n_tr > 0
    )
    SELECT CAST(SUM(n_te) AS BIGINT) AS n_test,
           round(CAST(SUM(m6) AS DOUBLE) / 1e6 / SUM(n_te), 9) AS bs_model,
           round(CAST(SUM(c6) AS DOUBLE) / 1e6 / SUM(n_te), 9) AS bs_clim,
           round(1 - CAST(SUM(m6) AS DOUBLE) / CAST(SUM(c6) AS DOUBLE), 9)
             AS brier_skill
    FROM terms
    """,
)


def _dbss(spark, sf_dir):
    """Brier skill score off the shared calibration bands."""
    bands = _cal_bands(spark, sf_dir).localCheckpoint(eager=False)
    base = bands.agg(
        (F.sum("s_tr").cast("double") / F.sum("n_tr")).alias("pbar")
    )
    p = F.col("s_tr").cast("double") / F.col("n_tr")
    m6 = F.floor(
        (
            F.col("s_te") * (1 - p) * (1 - p)
            + (F.col("n_te") - F.col("s_te")) * p * p
        )
        * F.lit(1000000)
        + F.lit(0.5)
    ).cast("long")
    c6 = F.floor(
        (
            F.col("s_te") * (1 - F.col("pbar")) * (1 - F.col("pbar"))
            + (F.col("n_te") - F.col("s_te")) * F.col("pbar") * F.col("pbar")
        )
        * F.lit(1000000)
        + F.lit(0.5)
    ).cast("long")
    terms = (
        bands.crossJoin(F.broadcast(base))
        .filter(F.col("n_tr") > 0)
        .select(m6.alias("m6"), c6.alias("c6"), "n_te")
    )
    return terms.agg(
        F.sum("n_te").cast("long").alias("n_test"),
        F.round(F.sum("m6").cast("double") / F.lit(1e6) / F.sum("n_te"), 9).alias(
            "bs_model"
        ),
        F.round(F.sum("c6").cast("double") / F.lit(1e6) / F.sum("n_te"), 9).alias(
            "bs_clim"
        ),
        F.round(
            1 - F.sum("m6").cast("double") / F.sum("c6").cast("double"), 9
        ).alias("brier_skill"),
    )


CATALOG["ml_brier_skill_score"].fn = _dbss
