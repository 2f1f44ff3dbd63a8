"""Round-15 wave 10: text analytics II + forecast decomposition —
LIX/RIX readability (pure integer word/sentence/longword masses),
Flesch Reading Ease (the score sibling of the r12 FK grade, same
single-sourced syllable proxy), character-level unigram entropy per
source, Theil's U bias/variance/covariance decomposition of the
seasonal-naive forecast (an exact integer identity: UM + US + UC = 1
by construction), and the spectral entropy of the daily event series
over the 14 Fourier frequencies of the 30-day window (the q55
teleport-constant trig-table pattern, one shared (d*k mod 30) CASE).

Exactness: every mass is an exact integer; trig constants quantize
ONCE in Python at 9dp and feed both engines verbatim; per-(day,k)
DFT terms micro-quantize before the per-frequency sums; periodogram
powers are exact 128-bit integers so the spectral probabilities are
integer rationals; p*ln(p) terms nano-quantize per frequency before
the 14-term sum; the Theil decomposition clears to integers + IEEE
sqrt via m*sum(f-a)^2 = cff + caa - 2cfa + (Sf-Sa)^2.
"""

from __future__ import annotations

import math as _math

from ._registry import CATALOG, F, register, t
from .q55_r12_readability_order import _SYLL_LIST_SQL, _syll_col

register(
    "doc_lix_rix_by_source",
    # LIX = W/S + 100*LW/W, RIX = LW/S per source, LW = tokens with
    # >= 7 characters, S = the FK sentence proxy (punctuation runs,
    # floored at 1 per doc). Three integer masses, two divisions.
    oracle="""
    WITH d AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents
      FROM documents
    ),
    m AS (
      SELECT source,
             CAST(SUM(len(toks)) AS BIGINT) AS w,
             CAST(SUM(sents) AS BIGINT) AS s,
             CAST(SUM(len(list_filter(toks, x -> len(x) >= 7))) AS BIGINT) AS lw
      FROM d GROUP BY source
    )
    SELECT source, w AS n_words, s AS n_sents, lw AS n_longwords,
           round(CAST(w AS DOUBLE) / s + 100.0 * lw / w, 6) AS lix,
           round(CAST(lw AS DOUBLE) / s, 6) AS rix
    FROM m ORDER BY source
    """,
)


def _dlixrix(spark, sf_dir):
    """LIX/RIX off three integer masses per source."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != F.lit("")
    )
    sents = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")).cast("long"), F.lit(1)
    )
    base = d.select(
        "source",
        F.size(toks).cast("long").alias("w_doc"),
        sents.alias("s_doc"),
        F.size(F.filter(toks, lambda x: F.length(x) >= 7)).cast("long").alias("lw_doc"),
    )
    m = base.groupBy("source").agg(
        F.sum("w_doc").cast("long").alias("w"),
        F.sum("s_doc").cast("long").alias("s"),
        F.sum("lw_doc").cast("long").alias("lw"),
    )
    return m.select(
        "source",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sents"),
        F.col("lw").alias("n_longwords"),
        F.round(
            F.col("w").cast("double") / F.col("s") + 100.0 * F.col("lw") / F.col("w"),
            6,
        ).alias("lix"),
        F.round(F.col("lw").cast("double") / F.col("s"), 6).alias("rix"),
    ).orderBy("source")


CATALOG["doc_lix_rix_by_source"].fn = _dlixrix


register(
    "doc_flesch_reading_ease_by_source",
    # Flesch Reading Ease per source: 206.835 - 1.015*(W/S) -
    # 84.6*(SY/W) — the SCORE sibling of the r12 FK grade, on the
    # same single-sourced vowel-run syllable proxy.
    oracle=f"""
    WITH d AS (
      SELECT source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents
      FROM documents
    ),
    m AS (
      SELECT source,
             CAST(SUM(len(toks)) AS BIGINT) AS w,
             CAST(SUM(sents) AS BIGINT) AS s,
             CAST(SUM(CAST(list_sum({_SYLL_LIST_SQL}) AS BIGINT)) AS BIGINT) AS sy
      FROM d GROUP BY source
    )
    SELECT source, w AS n_words, sy AS n_sylls,
           round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                 - 84.6 * (CAST(sy AS DOUBLE) / w), 6) AS flesch_reading_ease
    FROM m ORDER BY source
    """,
)


def _dfre(spark, sf_dir):
    """FRE off the shared syllable-mass integers."""
    d = t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != F.lit("")
    )
    sents = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")).cast("long"), F.lit(1)
    )
    base = d.select(
        "source",
        F.size(toks).cast("long").alias("w_doc"),
        sents.alias("s_doc"),
        _syll_col(toks).alias("sy_doc"),
    )
    m = base.groupBy("source").agg(
        F.sum("w_doc").cast("long").alias("w"),
        F.sum("s_doc").cast("long").alias("s"),
        F.sum("sy_doc").cast("long").alias("sy"),
    )
    return m.select(
        "source",
        F.col("w").alias("n_words"),
        F.col("sy").alias("n_sylls"),
        F.round(
            206.835
            - 1.015 * (F.col("w").cast("double") / F.col("s"))
            - 84.6 * (F.col("sy").cast("double") / F.col("w")),
            6,
        ).alias("flesch_reading_ease"),
    ).orderBy("source")


CATALOG["doc_flesch_reading_ease_by_source"].fn = _dfre


register(
    "doc_char_entropy_by_source",
    # Character-level unigram entropy per source (whitespace stripped,
    # lowercased): H = ln N - (1/N) sum c ln c with per-character-type
    # micro-nat quantization — the sub-token sibling of the token
    # entropy family.
    oracle="""
    WITH ch AS (
      SELECT source,
             unnest(regexp_extract_all(regexp_replace(lower(trim(text)),
                                                      '\\s+', '', 'g'),
                                       '.')) AS c
      FROM documents
    ),
    cc AS (
      SELECT source, c, CAST(COUNT(*) AS BIGINT) AS k FROM ch GROUP BY 1, 2
    ),
    s AS (
      SELECT source, CAST(SUM(k) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(k * CAST(floor(round(ln(CAST(k AS DOUBLE)), 6) * 1000000
                                     + 0.5) AS BIGINT)) AS HUGEINT) AS st6
      FROM cc GROUP BY source
    )
    SELECT source, n AS n_chars, v AS n_char_types,
           round(round(ln(CAST(n AS DOUBLE)), 6)
                 - CAST(st6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 9)
             AS char_entropy
    FROM s ORDER BY source
    """,
)


def _dcharentropy(spark, sf_dir):
    """Char-unigram entropy per source via the c*ln6(c) idiom."""
    d = t(spark, sf_dir, "documents")
    # Spark's regexp_extract_all defaults to group 1; '.' has no
    # groups, so the index must be 0 explicitly
    chars = F.expr(
        "regexp_extract_all(regexp_replace(lower(trim(text)), '\\\\s+', ''), '.', 0)"
    )
    cc = (
        d.select("source", F.explode(chars).alias("c"))
        .groupBy("source", "c")
        .agg(F.count("*").cast("long").alias("k"))
    )
    t6 = F.col("k") * F.floor(
        F.round(F.log(F.col("k").cast("double")), 6) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    s = cc.groupBy("source").agg(
        F.sum("k").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(t6).cast("decimal(38,0)").alias("st6"),
    )
    return s.select(
        "source",
        F.col("n").alias("n_chars"),
        F.col("v").alias("n_char_types"),
        F.round(
            F.round(F.log(F.col("n").cast("double")), 6)
            - F.col("st6").cast("double") / (F.col("n").cast("double") * F.lit(1e6)),
            9,
        ).alias("char_entropy"),
    ).orderBy("source")


CATALOG["doc_char_entropy_by_source"].fn = _dcharentropy


register(
    "ml_theil_u_decomposition",
    # Theil's bias/variance/covariance decomposition of the seasonal-
    # naive forecast (f_t = c_{t-7}) on daily event counts: with
    # population moments, m*sum(f-a)^2 = cff + caa - 2cfa + (Sf-Sa)^2
    # exactly in integers, so UM = (Sf-Sa)^2 / (m*SSE), US =
    # (sqrt(cff)-sqrt(caa))^2 / (m*SSE), UC = 2(sqrt(cff*caa)-cfa) /
    # (m*SSE), and UM+US+UC = 1 identically.
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    p AS (
      SELECT c AS a, LAG(c, 7) OVER (ORDER BY d) AS f FROM daily
    ),
    u AS (SELECT a, f FROM p WHERE f IS NOT NULL),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(f) AS BIGINT) AS sf,
             SUM(CAST(a AS HUGEINT) * a) AS saa,
             SUM(CAST(f AS HUGEINT) * f) AS sff,
             SUM(CAST(f AS HUGEINT) * a) AS sfa,
             SUM(CAST(f - a AS HUGEINT) * (f - a)) AS sse
      FROM u
    ),
    c AS (
      SELECT m, sse,
             CAST(m * sff - sf * sf AS DOUBLE) AS cff,
             CAST(m * saa - sa * sa AS DOUBLE) AS caa,
             CAST(m * sfa - sf * sa AS DOUBLE) AS cfa,
             CAST((sf - sa) * (sf - sa) AS DOUBLE) AS bias2,
             CAST(m AS DOUBLE) * m * (CAST(sse AS DOUBLE) / m) AS msse
      FROM s
    )
    SELECT m AS n_pairs,
           round(CAST(sse AS DOUBLE) / m, 6) AS mse,
           round(bias2 / (m * CAST(sse AS DOUBLE)), 9) AS um_bias,
           round((sqrt(cff) - sqrt(caa)) * (sqrt(cff) - sqrt(caa))
                 / (m * CAST(sse AS DOUBLE)), 9) AS us_variance,
           round(2 * (sqrt(cff * caa) - cfa) / (m * CAST(sse AS DOUBLE)), 9)
             AS uc_covariance
    FROM c
    """,
)


def _dtheildecomp(spark, sf_dir):
    """Theil UM/US/UC off cleared integer forecast moments."""
    from pyspark.sql import Window as W

    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    p = daily.select(
        F.col("c").alias("a"), F.lag("c", 7).over(W.orderBy("d")).alias("f")
    ).filter(F.col("f").isNotNull())
    s = p.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("f").cast("long").alias("sf"),
        F.sum(F.col("a").cast(d38) * F.col("a")).alias("saa"),
        F.sum(F.col("f").cast(d38) * F.col("f")).alias("sff"),
        F.sum(F.col("f").cast(d38) * F.col("a")).alias("sfa"),
        F.sum((F.col("f") - F.col("a")).cast(d38) * (F.col("f") - F.col("a"))).alias(
            "sse"
        ),
    )
    m = F.col("m")
    cff = (m * F.col("sff") - F.col("sf").cast(d38) * F.col("sf")).cast("double")
    caa = (m * F.col("saa") - F.col("sa").cast(d38) * F.col("sa")).cast("double")
    cfa = (m * F.col("sfa") - F.col("sf").cast(d38) * F.col("sa")).cast("double")
    bias2 = ((F.col("sf") - F.col("sa")).cast(d38) * (F.col("sf") - F.col("sa"))).cast(
        "double"
    )
    msse = m * F.col("sse").cast("double")
    return s.select(
        m.alias("n_pairs"),
        F.round(F.col("sse").cast("double") / m, 6).alias("mse"),
        F.round(bias2 / msse, 9).alias("um_bias"),
        F.round(
            (F.sqrt(cff) - F.sqrt(caa)) * (F.sqrt(cff) - F.sqrt(caa)) / msse, 9
        ).alias("us_variance"),
        F.round(2 * (F.sqrt(cff * caa) - cfa) / msse, 9).alias("uc_covariance"),
    )


CATALOG["ml_theil_u_decomposition"].fn = _dtheildecomp


def _cos30_case(fn: str, arg: str) -> str:
    """CASE mapping (arg % 30) -> round(fn(2*pi*m/30), 9) — the q55
    teleport-constant pattern, one table shared by all frequencies
    via arg = d*k."""
    f = _math.cos if fn == "cos" else _math.sin
    arms = " ".join(
        f"WHEN {m} THEN {round(f(2.0 * _math.pi * m / 30.0), 9)!r}"
        for m in range(30)
    )
    return f"CASE (({arg}) % 30) {arms} END"


register(
    "evt_spectral_entropy_daily",
    oracle=None,  # set below — embeds the generated trig constant CASEs
)

_SPECTRAL_SQL = f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1992-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    ks(k) AS (VALUES {", ".join(f"({k})" for k in range(1, 15))}),
    terms AS (
      SELECT k,
             CAST(floor(x * ({_cos30_case("cos", "d * k")}) * 1000000 + 0.5)
               AS BIGINT) AS ca6,
             CAST(floor(x * ({_cos30_case("sin", "d * k")}) * 1000000 + 0.5)
               AS BIGINT) AS cb6
      FROM daily CROSS JOIN ks
    ),
    pw AS (
      SELECT k, CAST(SUM(ca6) AS HUGEINT) AS a6, CAST(SUM(cb6) AS HUGEINT) AS b6
      FROM terms GROUP BY k
    ),
    p12 AS (
      SELECT k, a6 * a6 + b6 * b6 AS p FROM pw
    ),
    tot AS (SELECT SUM(p) AS tp FROM p12),
    ent AS (
      SELECT CAST(floor((CAST(p AS DOUBLE) / CAST(tp AS DOUBLE))
                        * round(ln(CAST(p AS DOUBLE) / CAST(tp AS DOUBLE)), 6)
                        * 1000000000 + 0.5) AS BIGINT) AS t9
      FROM p12 CROSS JOIN tot WHERE p > 0
    )
    SELECT CAST(14 AS BIGINT) AS n_freqs,
           round(-CAST(SUM(t9) AS DOUBLE) / 1e9, 6) AS spectral_entropy,
           round(-CAST(SUM(t9) AS DOUBLE) / 1e9 / 2.639057, 9)
             AS spectral_entropy_norm
    FROM ent
    """

CATALOG["evt_spectral_entropy_daily"].oracle = _SPECTRAL_SQL


def _dspectral(spark, sf_dir):
    """Spectral entropy over the 14 Fourier ordinates of the 30-day
    daily series; trig constant CASEs parsed verbatim via F.expr."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1992-01-01").cast("date")
        )
        .cast("long")
        .alias("d")
    ).agg(F.count("*").cast("long").alias("x"))
    ks = spark.createDataFrame([(k,) for k in range(1, 15)], "k int")
    terms = daily.crossJoin(F.broadcast(ks)).select(
        "k",
        F.floor(
            F.col("x") * F.expr(_cos30_case("cos", "d * k")) * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ca6"),
        F.floor(
            F.col("x") * F.expr(_cos30_case("sin", "d * k")) * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cb6"),
    )
    d38 = "decimal(38,0)"
    pw = terms.groupBy("k").agg(
        F.sum("ca6").cast(d38).alias("a6"), F.sum("cb6").cast(d38).alias("b6")
    )
    p12 = pw.select(
        "k", (F.col("a6") * F.col("a6") + F.col("b6") * F.col("b6")).alias("p")
    )
    tot = p12.agg(F.sum("p").alias("tp"))
    pr = F.col("p").cast("double") / F.col("tp").cast("double")
    ent = (
        p12.crossJoin(F.broadcast(tot))
        .filter(F.col("p") > 0)
        .select(
            F.floor(pr * F.round(F.log(pr), 6) * F.lit(1000000000) + F.lit(0.5))
            .cast("long")
            .alias("t9")
        )
    )
    return ent.agg(
        F.lit(14).cast("long").alias("n_freqs"),
        F.round(-F.sum("t9").cast("double") / F.lit(1e9), 6).alias(
            "spectral_entropy"
        ),
        F.round(
            -F.sum("t9").cast("double") / F.lit(1e9) / F.lit(2.639057), 9
        ).alias("spectral_entropy_norm"),
    )


CATALOG["evt_spectral_entropy_daily"].fn = _dspectral
